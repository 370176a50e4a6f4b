"""Generic funnel operator: parity with the fixed plans + bounded-window
semantics on a hand-built stream."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_funnel_counts_matches_plan(spark, sf_dir):
    """The generic operator reproduces the fixed 3-step plan's counts."""
    from comperhensive_bigdata_analysis__spark import plans
    from comperhensive_bigdata_analysis__spark.operators.relational import (
        funnel_counts,
    )
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    plan_row = plans.QUERIES["funnel_view_click_purchase"](spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(e, ["view", "click", "purchase"]).collect()
    }
    assert got["view"] == plan_row["n_viewed"]
    assert got["click"] == plan_row["n_clicked"]
    assert got["purchase"] == plan_row["n_purchased"]


def test_funnel_counts_within_bound(spark):
    """Hand-built stream: the deadline measures from the FIRST step."""
    from comperhensive_bigdata_analysis__spark.operators.relational import (
        funnel_counts,
    )

    rows = [
        # user 1 completes a->b->c within 100s
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 00:00:30"),
        (1, "c", "2024-01-01 00:01:00"),
        # user 2 reaches b late (beyond 100s from its first a)
        (2, "a", "2024-01-01 00:00:00"),
        (2, "b", "2024-01-01 00:10:00"),
        # user 3 has b before a: b must not count
        (3, "b", "2024-01-01 00:00:00"),
        (3, "a", "2024-01-01 00:00:10"),
    ]
    e = spark.createDataFrame(rows, "user_id int, event_type string, ts string").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(e, ["a", "b", "c"], within_seconds=100).collect()
    }
    assert got == {"a": 3, "b": 1, "c": 1}
