"""Columnar/row format round-trip plans: ORC and JSON-lines as REAL
source/sink paths beside the CSV/Parquet/JDBC surface (SURVEY §2.1 —
the reference moves data between formats via Hive/s3-dist-cp,
aws_utils.py; here the engine itself is the mover). The I/O goes
through sources/formats.py — the same read_table/write_table surface
tests/test_ingest.py pins — so these rows put THAT code path, not a
parallel one, under the external DuckDB oracle.

Each plan WRITES the documents table to /tmp in the target format
(mode=overwrite, path keyed on the sf dir so scales never collide),
reads it back through the format's own reader, and aggregates — so a
green row proves the full write -> read -> query path, type fidelity
included. The DuckDB oracle computes the same aggregate straight from
the source parquet: if the round trip dropped rows, mangled unicode,
or lost column types, the hash mismatches. (DuckDB cannot read ORC —
which is exactly why the oracle reads the ORIGIN, not the copy: the
check is round-trip fidelity, not a second copy of one reader.)

Scale posture: format conversion is an embarrassingly parallel
per-partition rewrite (no shuffle; file count = input partitions), and
the read side is a columnar scan with the same pushdown/pruning
machinery parquet gets (ORC supports predicate pushdown natively;
JSONL scans project only the requested fields after schema
inference). At 100 TB you'd point write_format at the warehouse path
instead of /tmp — the plan shape is unchanged.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

from ..sources.formats import read_table, write_table
from ..sources.tables import load_table
from . import plan

_FMT_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
           CAST(SUM(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_mass
    FROM documents
"""


def _roundtrip(spark, sf_dir, fmt: str):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = f"/tmp/cba_fmt_{fmt}_{os.path.basename(sf_dir.rstrip('/'))}"
    write_table(d, out, fmt)
    # An EMPTY source writes a dataset with zero data rows, leaving
    # schema inference nothing to read — depending on the layout Spark
    # either raises UNABLE_TO_INFER_SCHEMA or returns a zero-column
    # relation whose projection would fail later. Retry with the
    # writer's own schema so the roundtrip degrades to the oracle's
    # empty-input answer instead of crashing; a read the explicit
    # schema ALSO can't satisfy (path gone, files unreadable) is a
    # genuine failure and propagates instead of masquerading as
    # n_docs=0. A populated-but-corrupt dataset is unaffected: it
    # still infers its columns, and the hash check catches the
    # corruption.
    try:
        back = read_table(spark, out, fmt)
        if not {"doc_id", "lang", "text"} <= set(back.columns):
            back = read_table(spark, out, fmt, schema=d.schema)
    except AnalysisException:
        back = read_table(spark, out, fmt, schema=d.schema)
    if fmt == "json":
        # JSONL carries no schema; inference reads doc_id as long and
        # keeps strings — pin the projection order and types explicitly
        back = back.select(
            F.col("doc_id").cast("long"), F.col("lang"), F.col("text")
        )
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length("text").cast("long")).alias("chars"),
        F.sum(F.col("doc_id").cast("long")).alias("id_mass"),
    )


@plan("orc_roundtrip_stats", _FMT_ORACLE)
def orc_roundtrip_stats(spark, sf_dir):
    """documents -> ORC files -> ORC scan -> aggregate, hash-checked
    against the same aggregate over the origin parquet."""
    return _roundtrip(spark, sf_dir, "orc")


@plan("jsonl_roundtrip_stats", _FMT_ORACLE)
def jsonl_roundtrip_stats(spark, sf_dir):
    """documents -> JSON-lines -> schema-inferred scan -> aggregate,
    hash-checked against the origin parquet (unicode escaping and
    numeric re-inference are the classic silent-corruption spots)."""
    return _roundtrip(spark, sf_dir, "json")


@plan("csv_roundtrip_stats", _FMT_ORACLE)
def csv_roundtrip_stats(spark, sf_dir):
    """documents -> headered CSV -> inferred scan -> aggregate. CSV is
    the reference's native landing format (SURVEY §2.1 S1) and the
    most corruption-prone of the four (quoting, embedded newlines,
    numeric re-inference) — the hash check against the origin parquet
    covers exactly those failure modes end-to-end."""
    return _roundtrip(spark, sf_dir, "csv")
