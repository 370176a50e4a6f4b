"""Semantic invariants of the statistical-audit plans — properties the
oracle hash-match can't express (it proves cross-engine equality, not
that the statistics make sense)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark import plans
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def test_benford_shares_partition_unity(spark, sf_dir):
    rows = plans.QUERIES["benford_digit_audit"](spark, sf_dir).collect()
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-12
    # expected column carries the Benford constants
    assert abs(sum(r["expected"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert abs(r["deviation"] - (r["observed"] - r["expected"])) < 1e-15


def test_drift_shares_partition_unity(spark, sf_dir):
    rows = plans.QUERIES["price_drift_buckets"](spark, sf_dir).collect()
    assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["q"] for r in rows) - 1.0) < 1e-12


def test_chi2_nonnegative_and_dof_consistent(spark, sf_dir):
    r = plans.QUERIES["chi2_priority_status"](spark, sf_dir).collect()[0]
    assert r["chi2"] >= 0.0
    assert r["dof"] == (r["n_rows"] - 1) * (r["n_cols"] - 1)


def test_ab_arms_partition_users(spark, sf_dir):
    r = plans.QUERIES["ab_conversion_z"](spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert r["n0"] + r["n1"] == n_users
    assert 0 <= r["c0"] <= r["n0"] and 0 <= r["c1"] <= r["n1"]
    assert math.isfinite(r["z"])


def test_rfm_cells_partition_customers(spark, sf_dir):
    rows = plans.QUERIES["rfm_segments"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert r["r_score"] in (1, 2, 3)
        assert r["f_score"] in (1, 2, 3)
        assert r["m_score"] in (1, 2, 3)


def test_attribution_models_credit_same_purchases(spark, sf_dir):
    """Last-touch credits every purchase exactly once; time-decay's
    credit per channel never exceeds its raw credit count."""
    lt = plans.QUERIES["last_touch_attribution"](spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_purch = e.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in lt) == n_purch
    td = plans.QUERIES["time_decay_attribution"](spark, sf_dir).collect()
    for r in td:
        assert 0.0 < r["credit"] <= r["n_credits"]


def test_rolling_zscore_warmup_is_null(spark, sf_dir):
    rows = plans.QUERIES["rolling_zscore_days"](spark, sf_dir).collect()
    assert all(r["z"] is None for r in rows[:9])
    assert any(r["z"] is not None for r in rows[10:])
