"""Runtime re-planning (AQE) actually engages — the 100 TB posture
assumes it (coalesced shuffle reads, runtime broadcast conversion), so a
config regression that silently disables it must fail CI, not surface as
a production slowdown."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def _final_plan(df) -> str:
    df.collect()  # materialize so the adaptive plan is final
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_aqe_finalizes_and_coalesces_small_shuffles(spark, sf_dir):
    """A 32-partition shuffle over a small aggregate must be coalesced by
    AQE at runtime (AQEShuffleRead), and the plan must report itself as
    the FINAL adaptive plan — proof AQE is live, not just configured."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    ex = _final_plan(agg)
    assert "AdaptiveSparkPlan" in ex
    assert "isFinalPlan=true" in ex
    assert "AQEShuffleRead" in ex


def test_aqe_runtime_broadcast_after_selective_filter(spark, sf_dir):
    """A join side that static stats call big but a filter makes tiny
    must end up broadcast in the FINAL adaptive plan — the runtime
    SMJ-to-BHJ conversion the engine leans on when filters are more
    selective than the optimizer's scan-size estimate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    tiny = o.filter(F.col("o_orderkey") % 997 == 0)  # ~0.1% of orders
    joined = li.join(tiny, li.l_orderkey == tiny.o_orderkey).agg(
        F.count(F.lit(1)).alias("n")
    )
    ex = _final_plan(joined)
    assert "isFinalPlan=true" in ex
    assert "BroadcastHashJoin" in ex
