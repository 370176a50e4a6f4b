"""Runtime bloom-filter injection — the shuffle-pruning lever for
selective fact joins whose dimension side is too big to broadcast (the
100 TB case: a filtered dim still above the broadcast threshold). Spark
builds a bloom filter from the creation side and applies might_contain
on the application side BEFORE its shuffle, cutting the shuffled volume
to ~the join's selectivity. Pinned here so a conf regression (or an
upstream default flip) fails CI rather than surfacing as a 10x shuffle
at scale."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.sources.tables import load_table


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _selective_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_enabled_by_default(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )


def test_bloom_filter_injected_into_shuffle_join(spark, sf_dir):
    """With the size gates lowered to what a 100 TB fact scan would
    satisfy naturally, the optimizer must inject bloom_filter_agg on the
    filtered dim and might_contain on the fact side of a shuffle join."""
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = _selective_join(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("extended")
        ex = buf.getvalue()
        assert "bloom_filter_agg" in ex
        assert "might_contain" in ex
        filtered = {(r.o_orderpriority, r.n) for r in df.collect()}
    plain = {(r.o_orderpriority, r.n) for r in _selective_join(spark, sf_dir).collect()}
    assert filtered == plain  # pruning is advisory, never changes results
