"""Executed-scan regression pins for the r13 catalog-tail fusions
(VERDICT r13 ask #6).

The r13 wide scan audit (tools/scan_audit_wide.py) cut the
divergent-filter re-scan disease on four catalog queries; those
verdicts were one-shot audit output. These tests make them standing:
each pin executes the plan at sf0.001, reads the FINAL adaptive plan,
and asserts the data-scaling table's executed scan count — failing if
any fusion regresses to per-leg re-scans.

Counting rule: raw ``<table>.parquet`` occurrences in the final-plan
section. For plans whose fusion is a lifecycle cache
(register_plan_cache), every InMemoryTableScan reference re-renders
the cached subtree's scan in the explain text, so the pin instead
asserts that every raw occurrence sits under an InMemoryRelation
rendering (occurrences == InMemoryRelation count) — i.e. the table is
only ever read through the one cache build.
"""

from __future__ import annotations

import contextlib
import io

from comperhensive_bigdata_analysis__spark import plans
from comperhensive_bigdata_analysis__spark.cache import release_plan_caches


def _final_plan(spark, sf_dir, name: str) -> str:
    release_plan_caches()
    df = plans.QUERIES[name](spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    release_plan_caches()
    return buf.getvalue().split("== Initial Plan ==")[0]


def test_bm25_top_docs_single_tokenize_scan(spark, sf_dir):
    """r13 fusion: one groupBy(doc_id) serves dl + per-term tf +
    scalars + dfreq — exactly ONE documents scan (was 4)."""
    final = _final_plan(spark, sf_dir, "bm25_top_docs")
    assert final.count("documents.parquet") == 1, final


def test_corpus_report_card_two_corpus_passes(spark, sf_dir):
    """r13 fusion: digest census + cached token relation — at most two
    distinct documents passes (was 3). The cached tokenize leg renders
    once per InMemoryTableScan reference; the invariant is that the
    RAW (non-cached) scans stay at <= 2 - i.e. occurrences beyond the
    cache renderings never exceed the digest + tokenize-build passes."""
    final = _final_plan(spark, sf_dir, "corpus_report_card")
    raw = final.count("documents.parquet") - final.count("InMemoryRelation")
    assert raw <= 2, final


def test_churn_hazard_single_events_scan(spark, sf_dir):
    """r13 fusion: the per-user span census is cached and serves all
    three legs — every events access goes through the cache (raw
    occurrences == InMemoryRelation renderings, each rendering the one
    cache-build scan)."""
    final = _final_plan(spark, sf_dir, "churn_hazard_table")
    assert final.count("InMemoryTableScan") >= 1, final
    assert final.count("events.parquet") == final.count("InMemoryRelation"), final


def test_unigram_surprisal_single_tokenize(spark, sf_dir):
    """q17's three tf legs dedup at runtime via ReusedExchange: the
    final adaptive plan executes ONE documents scan and ONE tokenize
    explode (VERDICT r13 ask #5 — the @8x anomaly was adjudicated as
    host noise; this pins the structural property that made it noise)."""
    final = _final_plan(spark, sf_dir, "unigram_lm_surprisal")
    assert final.count("documents.parquet") == 1, final
    assert final.count("Generate explode") == 1, final


def test_seasonal_forecast_single_events_scan(spark, sf_dir):
    """r13 fusion: the _daily_xy census is cached at this call site
    only — all three legs (train fit, dow offsets, test scoring) read
    the cache; no raw events scan outside it."""
    final = _final_plan(spark, sf_dir, "seasonal_forecast_mape")
    assert final.count("InMemoryTableScan") >= 1, final
    assert final.count("events.parquet") == final.count("InMemoryRelation"), final
