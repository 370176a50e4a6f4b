"""Bucketed (co-located) joins — the zero-shuffle path for repeated
big-big joins (SURVEY §7.2 "bucketing for co-located joins").

Writing both fact tables bucketed+sorted on the join key pins their
physical layout so Spark's scan reports the partitioning and the
SortMergeJoin needs NO Exchange on either side. At 100 TB this converts
the dominant shuffle of every orders⋈lineitem-shaped query into a
streaming merge of pre-sorted buckets. tests/test_bucketing.py proves
the Exchange elimination on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``buckets`` should be sized so one bucket of the LARGER table fits
    an executor core's working set (~128-256 MB of parquet per bucket).
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with write_bucketed on the
    same bucket count — shuffle-free when layouts match."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
