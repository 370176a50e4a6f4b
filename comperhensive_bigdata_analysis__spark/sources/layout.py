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


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of the rank-bucketed values of
    ``cols`` (each a numeric Column already scaled to [0, 2^bits)) into
    one BIGINT sort key. Pure JVM bit arithmetic (shiftleft/bitwise OR
    folded per bit) — no UDF.

    Raises ValueError when ``bits * len(cols) > 63``: the interleaved
    key would need more than the 63 value bits of a signed BIGINT, and
    the JVM's shiftleft wraps the shift amount mod 64, silently
    aliasing high-order bits into low positions and corrupting the
    Morton ordering. Lower ``bits`` or drop columns instead.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * n} exceeds 63 — the "
            f"interleaved key overflows a signed BIGINT (JVM shiftleft "
            f"wraps shift amounts mod 64). Use bits <= {63 // n} for "
            f"{n} columns."
        )
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Multi-column data-skipping layout: bucket each column to its
    approximate rank percentile (equi-width over the observed min/max —
    rank-free, so computing the scale is one tiny agg, not a sort),
    Morton-interleave the buckets into a z-key, then range-partition and
    sort the files by it.

    Why: write_range_sorted makes ONE column's file min/max disjoint;
    z-ordering makes EVERY interleaved column's per-file range narrow
    (~n_files^(-1/len(cols)) of the domain), so parquet row-group stats
    skip files for predicates on ANY of the columns — the standard
    multi-dimensional clustering trick (same layout Delta OPTIMIZE
    ZORDER produces). Linear scale buckets are skew-sensitive; for
    heavy-tailed columns pre-transform (log/clip) or raise ``bits``.

    ``bits`` is clamped to ``63 // len(cols)`` so the interleaved key
    always fits a signed BIGINT (see zorder_key).
    """
    from pyspark.sql import functions as F

    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
                F.lit(top),
            )
        )
    zdf = df.withColumn("__zkey", zorder_key(scaled, bits))
    (
        zdf.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
