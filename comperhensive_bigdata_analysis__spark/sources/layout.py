"""Table layout for scale: partitioned writes and small-file compaction.

- write_partitioned: hive-style partition directories so date/category
  predicates prune entire directories at planning time (PartitionFilters
  in the scan — proven in tests/test_layout.py). THE lever that turns a
  100 TB scan into a per-day scan.
- compact: rewrite a directory to ~target-sized files. Streaming sinks
  and incremental loads accrete small files; scans then pay per-file
  open cost and lose vectorized-read efficiency. Compaction is the
  standing maintenance job of any large table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols`` (low-cardinality
    columns only — a partition dir per distinct value tuple)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Idempotent backfill: replace ONLY the partitions present in
    ``df``, leaving all others untouched (dynamic partition overwrite).
    The standard daily-rebuild pattern — re-running a day's job rewrites
    that day's directory atomically instead of truncating the table.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` with ~target_file_mb parquet files; returns the
    file count written. Local-FS sizing (object stores: size from the
    catalog/listing instead). Rewrite goes through a temp dir then
    replaces the original (same-FS atomic-ish swap; a lakehouse table
    format would make this transactional)."""
    import shutil

    df = spark.read.parquet(path)
    n_files = max(1, _dir_bytes(path) // (target_file_mb * 1024 * 1024))
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partition by ``sort_col`` and sort within each file before
    writing — every output file covers a DISJOINT key range, so parquet
    row-group min/max statistics skip whole files for point/range
    predicates on that column (the single-column z-order-lite).

    Partition pruning (write_partitioned) only works for low-cardinality
    columns; THIS is the lever for high-cardinality keys — ids,
    timestamps, prices. repartitionByRange samples the key distribution,
    so files are balanced even under skew; the in-file sort keeps
    row-group stats tight (each row group spans a narrow slice, not the
    whole file's range).
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )
