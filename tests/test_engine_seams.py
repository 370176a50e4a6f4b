"""Characterization of the two documented cross-engine seams
(plans/__init__ docstring, r12 torture-corpus audit). These tests pin
BOTH engines' behaviors so the seams stay intentional and visible: if
either engine changes (a Spark collation default, a DuckDB utf8proc
upgrade), the corresponding pin breaks and the seam must be
re-adjudicated rather than silently drifting.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# --- seam 1: Unicode case mapping (full vs simple) -------------------


def test_spark_lower_full_unicode_mapping(spark):
    df = spark.createDataFrame([("İstanbul", "ΤΕΛΟΣ")], "t string, g string")
    r = df.select(
        F.lower("t").alias("t"),
        F.length(F.lower("t")).alias("tn"),
        F.lower("g").alias("g"),
    ).first()
    # JVM full mapping: İ -> i + U+0307 (length grows), final Σ -> ς
    assert r["t"] == "i̇stanbul" and r["tn"] == 9
    assert r["g"] == "τελος" and r["g"].endswith("ς")


def test_duckdb_lower_simple_mapping():
    t, tn, g = duckdb.sql(
        "SELECT lower('İstanbul'), length(lower('İstanbul')), lower('ΤΕΛΟΣ')"
    ).fetchone()
    # utf8proc simple mapping: İ -> plain i (length preserved), Σ -> σ
    assert t == "istanbul" and tn == 8
    assert g == "τελοσ" and g.endswith("σ")


# --- seam 2: decimal-exact casts bound the value domain --------------


def test_both_engines_raise_on_decimal_overflow(spark):
    from pyspark.errors import ArithmeticException

    df = spark.createDataFrame([(1e308,)], "v double")
    with pytest.raises(ArithmeticException):
        df.select(F.col("v").cast("decimal(18,6)")).collect()
    with pytest.raises(duckdb.ConversionException):
        duckdb.sql("SELECT CAST(1e308 AS DECIMAL(18,6))").fetchall()


def test_duckdb_double_divide_by_zero_is_null_like_try_divide(spark):
    """The premise behind every r12 try_divide fix: DuckDB returns NULL
    where Spark ANSI `/` throws, and try_divide returns the same NULL."""
    a, b = duckdb.sql(
        "SELECT CAST(1 AS DOUBLE)/CAST(0 AS DOUBLE), "
        "CAST(0 AS DOUBLE)/CAST(0 AS DOUBLE)"
    ).fetchone()
    assert a is None and b is None
    r = spark.range(1).select(
        F.try_divide(F.lit(1.0), F.lit(0.0)).alias("a"),
        F.try_divide(F.lit(0.0), F.lit(0.0)).alias("b"),
    ).first()
    assert r["a"] is None and r["b"] is None
