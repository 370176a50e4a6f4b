"""Parquet table loaders for the test corpus (SURVEY §2.1 S4).

The driver corpus (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf*/``. One quirk: ``events.parquet`` stores ``ts`` as
parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), which Spark's vectorized
reader rejects outright. With ``spark.sql.legacy.parquet.nanosAsLong=true``
(set by session.apply_runtime_confs) the column arrives as a raw int64
nanosecond count; ``load_table`` converts it back to a naive timestamp
(TIMESTAMP_NTZ) so downstream code sees the intended type. The
conversion is pure column arithmetic — stays inside whole-stage codegen,
no UDF, no extra scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs

#: Canonical corpus tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_to_ntz(col_name: str):
    """int64 nanoseconds-since-epoch (naive) -> TIMESTAMP_NTZ.

    Integer DIV, not `/`: epoch-nanos (~1.7e18) exceeds double's 53-bit
    mantissa, so float division corrupts the microsecond by up to
    ~128 ns. timestamp_micros() yields an instant (TIMESTAMP_LTZ);
    casting to NTZ renders it in the session time zone, which
    apply_runtime_confs pins to UTC — naive-nanos round-trips exactly
    (sub-microsecond truncated, matching DuckDB's ns->us truncation).
    """
    return F.timestamp_micros(F.expr(f"`{col_name}` DIV 1000")).cast(
        T.TimestampNTZType()
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing known type quirks."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", _nanos_to_ntz("ts"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin fan-out for compute-heavy work over an UNSPLITTABLE
    scan (optimization guide §2.5, input skew): a parquet file is
    splittable only at row-group boundaries, so a one-file/one-row-group
    table — the 1x test corpus's layout — runs its entire scan stage
    (filter, tokenize, explode, hashing, partial aggregation, Python
    batch functions) as ONE task while the rest of the cluster idles.

    Scale-adaptive by construction, derived from the input layout
    rather than tuned to any core count: when the input already splits
    into at least half as many files as the session has slots (the
    production layout — inflated bench corpora, any Spark-written
    dataset), this is a NO-OP and no exchange is added. Only callers
    whose per-row work is heavy enough to amortize one round-robin
    shuffle of the input rows should use it (measured per plan —
    OPTIMIZATION_r13.md); results are unaffected because every such
    caller aggregates order-insensitively (exact decimal/integer sums)
    or re-sorts its output.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df  # non-file-backed relation — nothing to adapt
    if nfiles == 0 or nfiles * 2 >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (reference capability:
    one shared registered copy per table — aws_utils.py:203-220)."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
