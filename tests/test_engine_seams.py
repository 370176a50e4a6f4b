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


# --- seam 3: grouping sets on EMPTY input (r13 empty-value sweep) ----


def test_spark_grouping_sets_omit_grand_total_row_on_empty(spark):
    """ANSI (and DuckDB) emit ONE zero-count row for the () grouping
    set over empty input; Spark emits NOTHING, in every spelling
    (DataFrame rollup/cube and SQL GROUPING SETS) — because grouping
    sets compile to Expand + a KEYED aggregate on the grouping id, and
    a keyed aggregate over no rows has no groups. The grouping-sets
    oracles state this engine contract with HAVING COUNT(*) > 0,
    which drops exactly that row (every real group has >= 1 row)."""
    e = spark.createDataFrame([], "a string, x long")
    e.createOrReplaceTempView("__seam3_e")
    assert e.rollup("a").agg(F.count(F.lit(1))).collect() == []
    assert e.cube("a").agg(F.count(F.lit(1))).collect() == []
    assert (
        spark.sql(
            "SELECT a, count(*) FROM __seam3_e GROUP BY GROUPING SETS ((a), ())"
        ).collect()
        == []
    )
    # the keyless global aggregate is NOT part of the seam: 1 row
    assert e.agg(F.count(F.lit(1))).collect()[0][0] == 0


def test_duckdb_grouping_sets_emit_grand_total_row_on_empty():
    rows = duckdb.sql(
        "SELECT a, count(*) FROM (SELECT 'x' AS a WHERE false) "
        "GROUP BY ROLLUP (a) ORDER BY a"
    ).fetchall()
    assert rows == [(None, 0)]
    # and HAVING count(*) > 0 drops exactly that row
    rows = duckdb.sql(
        "SELECT a, count(*) FROM (SELECT 'x' AS a WHERE false) "
        "GROUP BY ROLLUP (a) HAVING count(*) > 0"
    ).fetchall()
    assert rows == []


# --- seam 4: decimal->double conversion rounding (r13 dup sweep) ------

# The exact decimal the r13 dup-corpus sweep caught revenue_by_nation
# on: unscaled 149574383635230000 > 2^53, correctly-rounded double is
# float('1495743836.3523').
_SEAM4_DEC = "1495743836.35230000"


def test_duckdb_decimal_to_double_double_rounds_past_2_53():
    """DuckDB's direct decimal->double cast converts the hugeint
    unscaled value to double (rounds once when it exceeds 2^53), then
    divides by the scale (rounds again) — one ulp off the correctly
    rounded value for this input. The via-VARCHAR hop is exact then
    correctly rounded. This is why disc_price_sum / DISC_PRICE_SQL
    spell their final cast through a string."""
    direct, via_str = duckdb.sql(
        f"SELECT CAST(CAST('{_SEAM4_DEC}' AS DECIMAL(38,8)) AS DOUBLE), "
        f"CAST(CAST(CAST('{_SEAM4_DEC}' AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()
    correct = float(_SEAM4_DEC)
    assert via_str == correct
    assert direct != correct  # the seam: one ulp high


def test_spark_decimal_to_double_rounds_correctly(spark):
    r = spark.sql(
        f"SELECT CAST(CAST('{_SEAM4_DEC}' AS DECIMAL(38,8)) AS DOUBLE) AS d, "
        f"CAST(CAST(CAST('{_SEAM4_DEC}' AS DECIMAL(38,8)) AS STRING) AS DOUBLE) AS s"
    ).first()
    correct = float(_SEAM4_DEC)
    assert r["d"] == correct and r["s"] == correct


# --- seam 5: default NULL ordering (r13 mixed-corpus sweep) ----------


def test_spark_default_null_ordering_is_nulls_first_on_asc(spark):
    """Spark sorts NULLs FIRST on ascending order (and LAST on
    descending); DuckDB defaults NULLS LAST in both directions. Any
    plan that ranks/sequences a nullable column therefore cannot rely
    on either engine's default: the repo's contract (r13) is to state
    which rows participate — quantile-family ops rank KNOWN values
    only, time-ordered ops exclude NULL event times (the streaming
    contract), retrievers rank only documents they can score — so no
    oracle ever depends on where an engine parks its NULLs."""
    df = spark.createDataFrame([(2,), (None,), (1,)], "x int")
    asc = [r["x"] for r in df.orderBy("x").collect()]
    desc = [r["x"] for r in df.orderBy(F.col("x").desc()).collect()]
    assert asc == [None, 1, 2]   # NULLS FIRST on ASC
    assert desc == [2, 1, None]  # NULLS LAST on DESC


def test_duckdb_default_null_ordering_is_nulls_last_both_ways():
    asc = [r[0] for r in duckdb.sql(
        "SELECT x FROM (VALUES (2), (NULL), (1)) v(x) ORDER BY x"
    ).fetchall()]
    desc = [r[0] for r in duckdb.sql(
        "SELECT x FROM (VALUES (2), (NULL), (1)) v(x) ORDER BY x DESC"
    ).fetchall()]
    assert asc == [1, 2, None]
    assert desc == [2, 1, None]
