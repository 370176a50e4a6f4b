"""exact_quantile_disc vs brute-force sorted rank — equality at every
probed q, including tie-heavy columns (l_quantity has 50 distinct
values over tens of thousands of rows)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.operators.quantile import (
    exact_quantile_disc,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def _brute(df, col, q):
    vals = sorted(r[0] for r in df.select(F.col(col).cast("double")).collect())
    return vals[max(1, math.ceil(q * len(vals))) - 1]


@pytest.mark.parametrize("q", [0.01, 0.25, 0.5, 0.9, 0.99, 1.0])
def test_quantile_continuous_column(spark, sf_dir, q):
    o = load_table(spark, sf_dir, "orders")
    assert exact_quantile_disc(o, "o_totalprice", q) == _brute(o, "o_totalprice", q)


@pytest.mark.parametrize("q", [0.1, 0.5, 0.95])
def test_quantile_tie_heavy_column(spark, sf_dir, q):
    """Massive ties: the stuck-bucket early exit must still be exact."""
    l = load_table(spark, sf_dir, "lineitem")
    assert exact_quantile_disc(l, "l_quantity", q, buckets=16) == _brute(
        l, "l_quantity", q
    )


def test_quantile_small_bucket_count_still_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    assert exact_quantile_disc(o, "o_totalprice", 0.5, buckets=8, max_refine=6) == _brute(
        o, "o_totalprice", 0.5
    )


def test_quantile_rejects_bad_q(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        exact_quantile_disc(o, "o_totalprice", 0.0)


def _brute_grouped(df, key, col, q):
    from collections import defaultdict

    groups = defaultdict(list)
    for r in df.select(key, F.col(col).cast("double")).collect():
        groups[r[0]].append(r[1])
    return {
        k: sorted(vs)[max(1, math.ceil(q * len(vs))) - 1] for k, vs in groups.items()
    }


@pytest.mark.parametrize("q", [0.25, 0.5, 0.9, 0.99])
def test_grouped_quantile_continuous(spark, sf_dir, q):
    from comperhensive_bigdata_analysis__spark.operators.quantile import (
        grouped_exact_quantile_disc,
    )

    o = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderpriority"]: r["value"]
        for r in grouped_exact_quantile_disc(
            o, "o_orderpriority", "o_totalprice", q
        ).collect()
    }
    assert got == _brute_grouped(o, "o_orderpriority", "o_totalprice", q)


@pytest.mark.parametrize("q", [0.1, 0.5, 0.95])
def test_grouped_quantile_tie_heavy(spark, sf_dir, q):
    """50 distinct values across thousands of rows per group: freezing
    keys must come out exact."""
    from comperhensive_bigdata_analysis__spark.operators.quantile import (
        grouped_exact_quantile_disc,
    )

    l = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["value"]
        for r in grouped_exact_quantile_disc(
            l, "l_returnflag", "l_quantity", q, buckets=16, rounds=3
        ).collect()
    }
    assert got == _brute_grouped(l, "l_returnflag", "l_quantity", q)


def test_grouped_quantile_single_row_groups(spark):
    from comperhensive_bigdata_analysis__spark.operators.quantile import (
        grouped_exact_quantile_disc,
    )

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 7.0), ("c", 1.0)], "k string, x double"
    )
    got = {
        r["k"]: r["value"]
        for r in grouped_exact_quantile_disc(df, "k", "x", 0.5).collect()
    }
    assert got == {"a": 5.0, "b": 7.0, "c": 1.0}


def test_quantile_ignores_nan(spark):
    """NaN must be filtered with NULL: Spark's max ranks NaN above every
    double, so an unfiltered NaN poisons hi/width and kills the
    histogram loop (ADVICE r1)."""
    df = spark.createDataFrame(
        [(float("nan"),), (1.0,), (2.0,), (3.0,), (None,)], "x double"
    )
    assert exact_quantile_disc(df, "x", 0.5) == 2.0


def test_grouped_quantile_ignores_nan(spark):
    from comperhensive_bigdata_analysis__spark.operators.quantile import (
        grouped_exact_quantile_disc,
    )

    df = spark.createDataFrame(
        [("a", float("nan")), ("a", 1.0), ("a", 3.0), ("b", float("nan"))],
        "k string, x double",
    )
    got = {
        r["k"]: r["value"]
        for r in grouped_exact_quantile_disc(df, "k", "x", 0.5).collect()
    }
    # 'b' has only NaN -> no non-NaN values -> key absent, not wrong
    assert got == {"a": 1.0}
