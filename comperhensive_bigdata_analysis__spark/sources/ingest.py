"""CSV -> typed, sanitized, registered table — the reference's core pipeline.

Re-expresses the behavioral contract of the reference's ingestion path
(``helper_utils.py:27-197``, ``Main_File.py:23-67``) as one Spark job:

  read CSV (header, inferred schema)              [S1, helper_utils.py:173]
  -> sanitize column names to [A-Za-z0-9_]        [F6, helper_utils.py:27-36]
  -> drop all-NULL columns                        [helper_utils.py:88-90]
  -> eager string->timestamp coercion             [helper_utils.py:91-95]
  -> int-width minimization at +/-2**30           [helper_utils.py:105-110]
  -> write parquet + register in catalog          [S2/S5, helper_utils.py:177]

Scale notes: the all-NULL probe and int-width probe are ONE aggregate
pass each (count/min/max per column, map-side combined), not per-column
scans; timestamp coercion is a try-cast expression, not a Python loop.
At 100 TB the whole pipeline is scan -> aggregate -> scan -> write, all
whole-stage-codegen'd, no driver-side row handling.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: helper_utils.py:107 — "max for int is 2**31 but we will go with 2**30"
INT_WIDTH_BOUND = 2**30


def sanitize_name(name: str) -> str:
    """Column/table name sanitizer (reference helper_utils.py:27-36):
    every char outside [a-zA-Z0-9_] -> '_', then collapse '__' -> '_'.
    Idempotent."""
    out = re.sub(r"[^a-zA-Z0-9_]", "_", name)
    while "__" in out:
        out = out.replace("__", "_")
    return out


def table_name_for(path: str) -> str:
    """File path -> table name (reference helper_utils.py:52-66)."""
    base = os.path.basename(path)
    stem = base.rsplit(".", 1)[0] if "." in base else base
    return sanitize_name(stem).lower()


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename all columns through sanitize_name, deduplicating collisions
    with a numeric suffix (pure metadata op — no job runs)."""
    seen: dict[str, int] = {}
    new = []
    for c in df.columns:
        s = sanitize_name(c)
        if s in seen:
            seen[s] += 1
            s = f"{s}_{seen[s]}"
        seen.setdefault(s, 0)
        new.append(s)
    return df.toDF(*new)


# Timestamp shapes the reference's pd.to_datetime would accept; we
# enumerate the formats present in its data ('YYYY-MM-DD' dates,
# ISO timestamps) rather than accepting anything parseable.
_TS_PATTERNS = [
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
]


def _try_ts(col):
    expr = F.lit(None).cast("timestamp")
    for fmt in reversed(_TS_PATTERNS):
        expr = F.coalesce(F.try_to_timestamp(col, F.lit(fmt)), expr)
    return expr


def preprocess(df: DataFrame) -> DataFrame:
    """Reference preprocess_file semantics (helper_utils.py:83-95) in two
    distributed passes:

    pass 1 (one aggregate): per string column, does every non-null value
      parse as a timestamp? per any column, is it entirely NULL?
    pass 2: apply drops + coercions as column expressions.
    """
    # Spark's CSV inference may already yield `date`; the reference's
    # pandas path always lands on datetime64 -> normalize to timestamp.
    df = df.select(
        *[
            F.col(c).cast("timestamp").alias(c) if t == "date" else F.col(c)
            for c, t in df.dtypes
        ]
    )
    string_cols = [c for c, t in df.dtypes if t == "string"]
    aggs = [
        F.count(F.col(c)).alias(f"__nn_{i}") for i, c in enumerate(df.columns)
    ] + [
        F.count(F.when(_try_ts(F.col(c)).isNotNull(), 1)).alias(f"__ts_{i}")
        for i, c in enumerate(df.columns)
        if c in string_cols
    ]
    stats = df.agg(*aggs).first()

    keep, coerce = [], set()
    str_idx = {c: i for i, c in enumerate(df.columns) if c in string_cols}
    for i, c in enumerate(df.columns):
        if stats[f"__nn_{i}"] == 0:  # all-NULL column -> drop (hu:88-90)
            continue
        keep.append(c)
        if c in str_idx and stats[f"__ts_{i}"] == stats[f"__nn_{i}"]:
            coerce.add(c)  # every non-null value is a timestamp (hu:91-95)
    out = df.select(
        *[
            _try_ts(F.col(c)).alias(c) if c in coerce else F.col(c)
            for c in keep
        ]
    )
    return out


def _narrow_ints(df: DataFrame) -> DataFrame:
    """Reference int-width rule (helper_utils.py:105-110): an integral
    column entirely strictly inside +/-2**30 is `int`, anything else is
    `bigint` — in BOTH directions (a value in (2**30, 2**31) fits int32
    but the reference still declares bigint). One min/max aggregate."""
    int_cols = [c for c, t in df.dtypes if t in ("int", "bigint", "long", "smallint", "tinyint")]
    if not int_cols:
        return df
    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(int_cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(int_cols)],
    ).first()
    width = {}
    for i, c in enumerate(int_cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        narrow = mn is not None and mn > -INT_WIDTH_BOUND and mx < INT_WIDTH_BOUND
        width[c] = "int" if narrow else "bigint"
    return df.select(
        *[
            F.col(c).cast(width[c]).alias(c) if c in width else F.col(c)
            for c in df.columns
        ]
    )


def infer_sql_schema(df: DataFrame) -> list[tuple[str, str]]:
    """The reference's {table_name, columns} registry payload
    (helper_utils.py:174-181): list of (name, spark_sql_type)."""
    return df.dtypes


def ingest_csv(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    parquet_dir: str | None = None,
    register_view: bool = True,
) -> DataFrame:
    """Full single-file pipeline (reference Main_File.py:23-35 behavior)."""
    raw = spark.read.csv(path, header=True, inferSchema=True)
    df = _narrow_ints(preprocess(sanitize_columns(raw)))
    name = table or table_name_for(path)
    if parquet_dir:
        out = os.path.join(parquet_dir, name)
        df.write.mode("overwrite").parquet(out)
        df = spark.read.parquet(out)
    if register_view:
        df.createOrReplaceTempView(name)
    return df


def ingest_folder(
    spark: SparkSession,
    folder: str,
    parquet_dir: str | None = None,
    extensions: tuple[str, ...] = (".csv",),
) -> dict[str, list[tuple[str, str]]]:
    """Directory-batch ingest (reference helper_utils.py:185-197): convert
    every matching file, return {table_name: [(col, type), ...]}."""
    registry: dict[str, list[tuple[str, str]]] = {}
    for fname in sorted(os.listdir(folder)):
        if not fname.lower().endswith(extensions):
            continue
        df = ingest_csv(spark, os.path.join(folder, fname), parquet_dir=parquet_dir)
        registry[table_name_for(fname)] = infer_sql_schema(df)
    return registry


def union_evolving(dfs: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted (columns added/dropped over
    time) — the schema-evolution reality of a long-lived ingest folder.
    Name-based alignment with missing columns null-filled; the column
    order of the FIRST frame wins, later additions append in first-seen
    order. Equivalent to parquet mergeSchema at read time, but usable on
    already-transformed frames. Narrow-then-wide int drift is fine
    (Spark widens in the union); incompatible type drift raises, which
    is the correct loud failure for a corrupted folder."""
    if not dfs:
        raise ValueError("union_evolving: no frames")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def ingest_csv_audited(
    spark: SparkSession,
    path: str,
    schema: str,
    table: str | None = None,
    register_view: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced CSV ingest that QUARANTINES malformed rows
    instead of silently nulling (Spark's PERMISSIVE default) or
    dropping (DROPMALFORMED) them — the posture a 100 TB ingest needs:
    bad input is data, not noise.

    ``schema`` is a DDL string (``"a INT, b STRING"``); the corrupt
    capture column is appended internally. Returns ``(clean, rejects)``
    where ``rejects`` carries the raw offending line for replay after a
    schema fix. Both frames are lazy single-pass scans — no driver
    materialization. Generalizes the reference's sanitize-only pipeline
    (helper_utils.py:83-95), which assumes every row parses.
    """
    full = f"{schema}, _corrupt_record STRING"
    raw = spark.read.options(
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).csv(path, schema=full)
    # Spark leaves _corrupt_record null for clean rows and sets it to the
    # raw line when any field failed to parse under the declared schema.
    raw = raw.cache()  # one scan feeds both split sides
    clean = sanitize_columns(raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record"))
    rejects = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    if register_view:
        clean.createOrReplaceTempView(table or table_name_for(path))
    return clean, rejects
