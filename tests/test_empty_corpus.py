"""Empty-input robustness (round-12 audit): a 100 TB pipeline hits
empty inputs routinely — an upstream filter that matches nothing, a
fresh partition, a dry incremental batch — and a plan that CRASHES on
empty is a production bug the populated-corpus oracle gate cannot see.

The r12 audit ran all 234 registered plans against a schema-correct
zero-row corpus: 232 survived; the two that did not are fixed and
pinned here (exact_quantile_disc raised on empty instead of returning
SQL percentile_disc's NULL; the JSONL roundtrip hit Spark's
UNABLE_TO_INFER_SCHEMA because an empty write leaves no data files to
infer from). A representative cross-family subset of plans stays
under regression so new plan shapes keep the property.
"""

from __future__ import annotations

import os

import pytest

from comperhensive_bigdata_analysis__spark import plans
from comperhensive_bigdata_analysis__spark.sources.tables import load_table

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


# One plan per family: relational agg/join/window, SQL front door,
# dedup (exact + minhash + census persist), ANN, text/training
# (incl. the distributed_scan shapes), media, formats, pipeline — plus
# the two plans the audit actually caught.
REPRESENTATIVES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "window_top_orders",
    "sql_date_literal_filter",
    "exact_dedup_docs",
    "minhash_lsh_dedup",
    "exact_substr_spans",
    "winnowing_fingerprint_pairs",
    "domain_cap_census",
    "knn_bruteforce",
    "ivf_recall_eval",
    "ccnet_quality_buckets",
    "pack_context_windows",
    "dsir_importance_weights",
    "unigram_lm_surprisal",
    "jpeg_pixel_stats_np",
    "wav_audio_stats",
    "csv_roundtrip_stats",
    "corpus_clean_pipeline",
    "grouped_exact_median",
    # the two r12 audit catches:
    "orders_above_exact_p99",
    "jsonl_roundtrip_stats",
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_plan_survives_empty_corpus(spark, empty_dir, name):
    rows = plans.QUERIES[name](spark, empty_dir).collect()
    assert isinstance(rows, list)  # no crash; content checked below


def test_exact_quantile_disc_returns_none_on_empty(spark):
    from comperhensive_bigdata_analysis__spark.operators.quantile import (
        exact_quantile_disc,
    )

    df = spark.createDataFrame([], "v double")
    assert exact_quantile_disc(df, "v", 0.99) is None
    # all-NULL/NaN input is empty AFTER filtering — same contract
    df2 = spark.createDataFrame([(None,), (float("nan"),)], "v double")
    assert exact_quantile_disc(df2, "v", 0.5) is None


def test_p99_plan_matches_oracle_shape_on_empty(spark, empty_dir):
    rows = plans.QUERIES["orders_above_exact_p99"](spark, empty_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["p99"] is None and r["n_tail"] == 0 and r["tail_revenue"] is None


def test_jsonl_roundtrip_empty_matches_oracle_shape(spark, empty_dir):
    rows = plans.QUERIES["jsonl_roundtrip_stats"](spark, empty_dir).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 0
