"""Cross-engine determinism regressions for the r1 hash-fail classes.

Each test pins one divergence class from VERDICT r1 ("What's wrong")
by running the exact Spark expression AND the exact DuckDB oracle
spelling over adversarial inputs and asserting equality — so a future
JVM/DuckDB version bump that re-opens the gap fails loudly here, not
in the driver's hash gate.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.functions.text import (
    SQL_STOPWORD_COUNT,
    stopword_count,
)

# Doubles whose shortest round-trip string and bit-exact decimal
# expansion disagree in the rendered tail — the checksum_orders class.
ADVERSARIAL_PRICES = [
    0.1,
    7293.1,
    0.30000000000000004,
    123456.785,  # half-way-looking at 2 decimals
    99999.995,
    2.675,  # classic: stored as 2.67499999999999982...
    1e15 + 0.5,
    -0.07,
]


def test_price_cents_rendering_matches_duckdb(spark):
    """FLOOR(price*100) cents must render identically on both engines
    for doubles where shortest-string and bit-exact decimal disagree
    (checksum_orders r1 hash-fail class)."""
    sdf = spark.createDataFrame([(p,) for p in ADVERSARIAL_PRICES], "p double")
    got = [
        r["s"]
        for r in sdf.select(
            F.floor(F.col("p") * 100).cast("bigint").cast("string").alias("s")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(CAST(FLOOR(CAST(? AS DOUBLE) * 100) AS BIGINT) AS VARCHAR)",
            [p],
        ).fetchone()[0]
        for p in ADVERSARIAL_PRICES
    ]
    assert got == want


@pytest.mark.parametrize(
    "max_cnt,n_keys,n_rows",
    [
        (3, 3, 9),  # exact integer ratio: floor boundary
        (1, 7, 7),  # ratio exactly 1
        (49, 999983, 2999949),  # large prime-ish: irrational-ish ratio
        (10**12, 10**6, 10**12 + 1),  # wide numerator, 1-ulp-sensitive
    ],
)
def test_skew_ratio_integer_div_matches_duckdb(spark, max_cnt, n_keys, n_rows):
    """skew_ratio's FLOOR must run on an exact wide-integer division —
    a double multiply can land 1 ulp either side of the boundary
    (join_key_skew r1 hash-fail class)."""
    row = spark.sql(
        f"SELECT cast(cast({max_cnt} as decimal(38,0)) * {n_keys} * 1000000 "
        f"div {n_rows} as double) / 1e6 AS r"
    ).first()
    want = duckdb.sql(
        f"SELECT CAST((CAST({max_cnt} AS HUGEINT) * {n_keys} * 1000000) "
        f"// {n_rows} AS DOUBLE) / 1e6 AS r"
    ).fetchone()[0]
    assert row["r"] == want
    # and it equals the exact rational floor
    assert row["r"] == (max_cnt * n_keys * 1_000_000) // n_rows / 1e6


# Non-ASCII letters adjacent to stopwords: Java \b and RE2 \b disagree
# here — the lang_id_stats class. The tokenize-and-compare contract
# must agree on every engine.
ADVERSARIAL_TEXTS = [
    "the café is naïve",
    "théory of détente in Zürich",  # stopword glued to non-ASCII letters
    "aé the‐dash a‐b the",  # U+2010 hyphen
    "Ĉthe the Ĉ aé",
    "тест the из a б",  # cyrillic neighbours
    "the,and.of;to",
    "_the_ and_ _of",  # underscore: word char for \b, split char for us
    "",
    "   ",
]


def test_stopword_count_matches_duckdb_on_non_ascii(spark):
    sdf = spark.createDataFrame([(t,) for t in ADVERSARIAL_TEXTS], "text string")
    got = [
        r["n"]
        for r in sdf.select(stopword_count(F.col("text")).alias("n")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {SQL_STOPWORD_COUNT.replace('lower(text)', 'lower(?)')}",
            [t],
        ).fetchone()[0]
        for t in ADVERSARIAL_TEXTS
    ]
    assert got == want
