"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real code lives in the ``comperhensive_bigdata_analysis__spark``
package; this module only adapts its plan registry to the driver's
calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from comperhensive_bigdata_analysis__spark import plans as _plans

#: The driver samples the FIRST 50 entries of ``queries()`` for its
#: correctness gate, so the head of the dict is deliberately a cross-
#: family window. Round-5 rotation (VERDICT r4 ask #8): the 16
#: relational flagships stay as stable anchors; the other 34 slots go
#: to plans that have NEVER had a driver row (r1-r4 artifacts checked)
#: — behavior, audit, sketch, stream-parity, windows, training, text,
#: multimodal (incl. the new WAV audio tier), vector, ANN, dedup,
#: sqldoor — so driver coverage ratchets instead of re-proving the
#: same 50. Every window plan is oracled (strong hash check, never
#: rows-only) and green in CORRECTNESS_FULL.json (pinned by
#: tests/test_oracle_correctness.py). The full catalog (178 plans) is
#: still returned; the local gate covers everything the window doesn't.
_DRIVER_WINDOW = [
    # relational flagships (16, stable anchors)
    "pricing_summary", "revenue_by_nation", "filter_project_arith",
    "top_customers", "window_top_orders", "semi_join_region_customers",
    "left_join_nation_region", "distinct_status_priority",
    "group_by_expr_nation", "table_counts", "rollup_returnflag",
    "full_outer_customer_orders", "daily_events", "checksum_orders",
    "grouped_exact_median", "prorate_order_cents",
    # sql front door (3)
    "sql_date_col_groupby", "sql_null_order_limit",
    "sql_having_scalar_subquery",
    # behavior analytics (5)
    "cohort_retention", "funnel_within_1h", "rfm_segments",
    "last_touch_attribution", "churn_hazard_table",
    # audit / statistics (4)
    "benford_digit_audit", "price_drift_buckets", "ab_conversion_z",
    "chi2_priority_status",
    # sketch / pivot (3)
    "bitmap_distinct_users", "pivot_daily_values",
    "argmax_event_per_user",
    # streaming batch-parity (2)
    "sliding_value_sums_30m", "session_window_stats",
    # windows / intervals (4)
    "merge_event_intervals", "running_user_totals", "range_join_pairs",
    "cube_orders",
    # LLM training-data ops (5)
    "train_test_split", "doc_chunks", "bpe_pair_counts",
    "training_shard_manifest", "tokenizer_vocab_coverage",
    # text analysis (2)
    "gopher_quality_flags", "blocklist_redact_stats",
    # multimodal (2) — wav_audio_stats is the new real-audio tier
    "wav_audio_stats", "media_real_decode_census",
    # vector / ANN / dedup (4)
    "embedding_dim_moments", "ann_recall_matrix", "ngram_jaccard_dedup",
    "bloom_filter_probe",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_WINDOW if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    return _plans.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2)."""
    return _ordered(dict(_plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per plan (omitted => rows-only check)."""
    return _ordered(dict(_plans.ORACLES))
