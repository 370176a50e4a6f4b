"""pandas_udf tiers must agree with their JVM expression twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.functions.udfs import (
    bpe_ish_token_count_jvm,
    bpe_ish_token_count_py,
    geo_mean_jvm,
    geo_mean_py,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def test_bpe_ish_scalar_udf_matches_jvm(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    both = d.select(
        "doc_id",
        bpe_ish_token_count_jvm("text").alias("jvm"),
        bpe_ish_token_count_py("text").alias("py"),
    )
    mismatches = both.filter(F.col("jvm") != F.col("py")).count()
    assert mismatches == 0
    assert both.agg(F.sum("jvm")).first()[0] > 0


def test_geo_mean_grouped_agg_matches_jvm(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    jvm = {
        r["event_type"]: r["g"]
        for r in e.groupBy("event_type").agg(geo_mean_jvm("value").alias("g")).collect()
    }
    py = {
        r["event_type"]: r["g"]
        for r in e.groupBy("event_type").agg(geo_mean_py("value").alias("g")).collect()
    }
    assert set(jvm) == set(py)
    for k in jvm:
        assert abs(jvm[k] - py[k]) / abs(jvm[k]) < 1e-9
