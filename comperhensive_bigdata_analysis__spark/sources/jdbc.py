"""RDBMS scan/sink (SURVEY §2.1 S9/S10) — the reference's MySQL/RDS path
(``sql_utils.py:82-101`` pd.read_sql, ``sql_utils.py:141-180``
df.to_sql(if_exists='replace')) as Spark JDBC.

Scale notes baked into the defaults:
- reads partition on a numeric column when the caller provides bounds
  (``numPartitions``/``partitionColumn``) — otherwise JDBC reads are a
  single-task bottleneck;
- writes batch with rewriteBatchedStatements-style options left to the
  caller's URL; mode='overwrite' reproduces if_exists='replace'.

No JDBC driver jar ships in this container, so these are exercised by
tests only up to the option-plumbing layer; on a real cluster, add the
driver jar via spark.jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S10: ``pd.read_sql`` equivalent (sql_utils.py:82-101). ``table``
    may be a table name or a ``(SELECT ...) t`` pushdown subquery."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """S9: ``df.to_sql(..., if_exists='replace')`` equivalent
    (sql_utils.py:141-180). mode='overwrite' drops+recreates like the
    reference; 'append' for incremental loads."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
