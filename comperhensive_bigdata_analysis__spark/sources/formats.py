"""Uniform read/write across Spark's built-in file formats.

The reference's storage story is CSV-in, Parquet-out (SURVEY §2.1); a
complete engine also meets pipelines that land JSONL (API exports,
event dumps) and ORC (Hive estates). Parquet stays the default and the
recommendation — columnar, statistics, pushdown — the others are
interchange formats at the edges.

Scale notes: JSONL scans parallelize per file-split like CSV but carry
schema-inference cost — always pass/capture an explicit schema in
production (`spark.read.schema(s).json(...)`); a schema-less call here
is for exploration. Avro needs the external spark-avro package, absent
in this environment — listed so callers get a clear error, gated at
call time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Formats bundled with Spark itself (no extra jars).
BUILTIN_FORMATS = ("parquet", "csv", "json", "orc")
#: Formats needing external packages (kept explicit for the error path).
EXTERNAL_FORMATS = ("avro",)


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Write with sane per-format defaults (CSV/JSON get headers &
    explicit nulls; everything mode=overwrite for idempotent re-runs)."""
    if fmt in EXTERNAL_FORMATS:
        raise ValueError(f"format {fmt!r} requires an external Spark package")
    if fmt not in BUILTIN_FORMATS:
        raise ValueError(f"unknown format {fmt!r}; use one of {BUILTIN_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
        # NULL must stay distinguishable from '' through a roundtrip:
        # the default writes both as an empty field. The Hive-style \N
        # sentinel keeps NULL explicit; read_table reverses it.
        w = w.option("nullValue", "\\N")
        # Spark's CSV WRITER (unlike its reader) defaults to Java-trim
        # on every field, stripping leading/trailing chars <= U+0020 —
        # spaces, tabs, \x01-style control bytes (torture-corpus
        # finding). Emit fields verbatim.
        w = w.option("ignoreLeadingWhiteSpace", "false")
        w = w.option("ignoreTrailingWhiteSpace", "false")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    if fmt in EXTERNAL_FORMATS:
        raise ValueError(f"format {fmt!r} requires an external Spark package")
    if fmt not in BUILTIN_FORMATS:
        raise ValueError(f"unknown format {fmt!r}; use one of {BUILTIN_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        # header consumption is independent of schema source — without
        # this, an explicit-schema read parses the header line as a row
        r = r.option("header", "true")
        # the writer quotes embedded newlines (RFC 4180); without
        # multiLine the reader treats every physical line as a record
        # and a quoted field spanning lines misparses into the wrong
        # columns (caught by the torture corpus: 'line\nbreak\ttab'
        # put 'break\ttab' in doc_id). Scale note: multiLine parses
        # whole files, sacrificing intra-file split parallelism — fine
        # for CSV's role here as an edge interchange format; bulk
        # splittable ingestion that guarantees newline-free fields can
        # override with multiLine="false" via **options.
        r = r.option("multiLine", "true")
        # lossless text fields (torture-corpus findings): the default
        # nullValue conflates '' with NULL (the writer's \N sentinel
        # reverses it); maxCharsPerColumn bounds giant single tokens.
        r = r.option("nullValue", "\\N")
        r = r.option("emptyValue", "")
        r = r.option("maxCharsPerColumn", "-1")
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
