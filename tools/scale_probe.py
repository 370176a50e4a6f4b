"""Empirical scale probe (VERDICT r1 #6): run the catalog's three
shuffle-heaviest plans at the bench scale AND on an N-fold
key-disjoint inflation of their input tables, then compare wall-clock
growth against the linear-ish growth the SCALE_AUDIT ledger claims
structurally. Writes SCALE_PROBE.md.

Inflation machinery is shared with bench.py's large-scale tier:
comperhensive_bigdata_analysis__spark/sources/inflate.py (key-disjoint
per-copy transforms; both corpora written by the same Spark writer at
the same file count so the ratio isolates data VOLUME).

Run: python tools/scale_probe.py   (env: PROBE_COPIES, SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

# The planted-skew section records PER-TASK skew (max/p50 task runtime
# per stage) via the UI REST API — wall-clock at fixed cores cannot
# price a single-task colocation (a hot key shifts constants, not
# ratios), but task metrics can. get_spark reads SPARK_UI at call time.
os.environ.setdefault("SPARK_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comperhensive_bigdata_analysis__spark import plans  # noqa: E402
from comperhensive_bigdata_analysis__spark.session import get_spark  # noqa: E402
from comperhensive_bigdata_analysis__spark.sources.inflate import (  # noqa: E402
    inflate_corpus,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("PROBE_COPIES", "8"))
OUT_1X = "/tmp/scale_probe_data_1x"
OUT_NX = "/tmp/scale_probe_data_nx"
SKEW_1X = "/tmp/scale_probe_skew_1x"
SKEW_NX = "/tmp/scale_probe_skew_nx"
DOCSKEW_1X = "/tmp/scale_probe_docskew_1x"
DOCSKEW_NX = "/tmp/scale_probe_docskew_nx"

#: The three highest-exchange plans in SCALE_AUDIT.md and the one
#: inflated table each one's hot path consumes.
PROBES = {
    "copurchase_triangles": "lineitem",
    "lsh_band_pairs": "embeddings",
    "corpus_similarity_matrix": "documents",
}


def _minhash_k64(spark, sf_dir):
    """The K=64/16-band production dedup tier (VERDICT r2 ask #5) —
    same callable shape as bench.py's q15 headliner."""
    from comperhensive_bigdata_analysis__spark.operators.dedup import (
        MINHASH_BANDS_PROD,
        MINHASH_K_PROD,
        minhash_lsh_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3,
        k=MINHASH_K_PROD, bands=MINHASH_BANDS_PROD,
        min_est=0.25, hash_fn="xxhash64",
    )


#: Dedup-family probes (VERDICT r2 ask #5): not plain registry lookups —
#: minhash runs the production-parameter tier; contamination comes from
#: the registry but is listed here so the probe set is explicit.
EXTRA_PROBES: dict = {
    "minhash_lsh_dedup[K=64]": _minhash_k64,
}

#: Round-3 additions probed straight from the registry: the PQ
#: declarative tier (its (vec, subspace, codeword) distance combine is
#: the catalog's widest explode-join) and the bloom membership probe
#: (constant-size sketch — should be flat-ish, the probe proves it).
#: Round-5 additions (VERDICT r4 ask #6): the two heaviest eval plans
#: by SCALE_AUDIT exchange count — grouped_exact_median (iterative
#: histogram refinement, 8 exchanges) and ann_recall_matrix (4 ANN
#: legs + recall join, 18 exchanges).
#: Round-6 additions (VERDICT r5 ask #7): the two r5-new plans —
#: hash_embed_topk (broadcast query vector -> one doc_id shuffle ->
#: TakeOrderedAndProject) and zorder_skipping_stats (arithmetic
#: range-bucket file ids from a broadcast 1-row max; the global-NTILE
#: scale-killer was designed out in 2ab2d72) — probed empirically now
#: that their structural stories are pinned by plan tests.
#: Round-7 additions (VERDICT r6 ask #5): semantic_dedup_census — the
#: SemDeDup cluster-scoped dedup with the new max-cluster-size re-split
#: (the probe verifies the (cid, sub) bucketing holds the pair join
#: at-worst-linear as the corpus grows) — and semantic_dedup_greedy,
#: whose per-bucket applyInPandas walk must stay flat because bucket
#: SIZE is capped while bucket COUNT grows with the corpus.
#: Round-7 follow-on: dsir_importance_weights — the DSIR selection
#: census. Structurally linear (64-row broadcast model, two map-side
#: combines over the unigram+bigram feature relation), but it is the
#: catalog's heaviest token-fanout plan (~2 features per token), so
#: the probe pins the constant empirically.
#: exact_substr_spans (stride-1 shingle digests, ~1 row per token) and
#: bigram_lm_surprisal (conditional-LM scoring whose bigram model joins
#: by key rather than broadcasting) are the session's other two heavy
#: token-fanout plans — probed so every r7 curation fanout has an
#: empirical row next to its structural claim.
#: Round-8 additions (VERDICT r7 ask #3): winnowing_fingerprint_pairs
#: (k-gram hashing + window mins — the same token-fanout shape DSIR and
#: exact_substr needed probes for; fanout ~1 fingerprint row per
#: ~(w+1)/2 chars) and soft_dedup_weights (one md5-digest exchange +
#: same-key join-back). Plus the r8-new plans: exact_substr_scrub_census
#: (span pipeline + higher-order token filter over the full doc scan)
#: and pagerank_loop_parts (5 checkpointed rank-vector rounds — the
#: probe pins that per-round cost grows with edges, not rounds).
#: Round-10 additions (second half): the distributed_scan / salted
#: top-k conversions — ntile_price_quartiles (global exact NTILE over
#: raw orders), window_value_functions (per-priority value functions +
#: rank ratios; 5-value key whose per-key mass grows with the data —
#: the key-disjoint inflation leaves o_orderpriority/lang/source
#: UNCHANGED, so for these keys the NX corpus is exactly the
#: key-constant growth case the shapes exist for), ccnet_quality_buckets
#: (per-lang terciles) and pack_context_windows (per-source prefix
#: sum). The [global-window] bracketed row re-measures the shape
#: ntile_price_quartiles replaced (one task sorts the whole table) as
#: the negative control.
for _name in (
    "ntile_price_quartiles",
    "window_value_functions",
    "ccnet_quality_buckets",
    "pack_context_windows",
    "winnowing_fingerprint_pairs",
    "soft_dedup_weights",
    "exact_substr_scrub_census",
    "pagerank_loop_parts",
    "bpe_merge_loop",
    "dsir_importance_weights",
    "exact_substr_spans",
    "bigram_lm_surprisal",
    "pq_adc_knn",
    "bloom_filter_probe",
    "grouped_exact_median",
    "ann_recall_matrix",
    "hash_embed_topk",
    "zorder_skipping_stats",
    "semantic_dedup_census",
    "semantic_dedup_greedy",
):
    EXTRA_PROBES[_name] = plans.QUERIES[_name]

def _time(fn, spark, sf_dir) -> float:
    # Single warm-ish measurement: the probe compares GROWTH between two
    # corpus sizes of the same plan in the same JVM, so constant session
    # overhead cancels; best-of-N would double a multi-minute run for
    # second-digit precision the ratio doesn't need.
    # Cold-cache discipline (r10): the census-shaped dedup plans lazily
    # persist their shingle/fingerprint frame, so a timed run after a
    # warm-up would measure cache READS only — clearing the cache makes
    # every timed run pay materialization (scan + cache write + both
    # consumers), which is the cost a fresh corpus pass pays. No-op for
    # plans that cache nothing.
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return time.perf_counter() - t0


def _ensure_corpus(spark, base: str, out: str, copies: int) -> None:
    """Marker-keyed reuse (same contract as bench.py's _scale_dir):
    re-running the probe must not rebuild identical corpora."""
    marker = os.path.join(out, "_MARKER")
    want = f"{base}|{copies}"
    if os.path.exists(marker) and open(marker).read() == want:
        return
    inflate_corpus(spark, base, out, copies)
    with open(marker, "w") as f:
        f.write(want)


def main() -> None:
    spark = get_spark("cba-scale-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_corpus(spark, BASE, OUT_1X, 1)
    _ensure_corpus(spark, BASE, OUT_NX, COPIES)
    # Planted corpora are built HERE too (r11 fix): building the
    # 10M-doc doc-skew corpus inside the TIMED session bloated its
    # heap/GC state and taxed the first planted rows (exact_substr
    # census read a bogus 9.06x on its first-build run) — the same
    # effect the restart below exists to avoid for OUT_1X/OUT_NX.
    from comperhensive_bigdata_analysis__spark.sources.inflate import (
        DOC_SKEW_VERSION,
        plant_doc_skew_corpus,
        plant_skew_corpus,
    )

    for base, out in ((OUT_1X, SKEW_1X), (OUT_NX, SKEW_NX)):
        marker = os.path.join(out, "_MARKER")
        want = f"{base}|skew"
        if not (os.path.exists(marker) and open(marker).read() == want):
            plant_skew_corpus(spark, base, out)
            with open(marker, "w") as f:
                f.write(want)

    # Doc-count-scaled planted corpus (VERDICT r10 ask #2 + #4): 256x
    # the docs at ~8-20 chars each, a single-value boilerplate
    # substring in HALF of them (ONE hot winnowing fingerprint at
    # df = n/2), and lang planted 'en' on that half over a
    # 499-cold-lang bed. On it the WINDOW controls' hot task is
    # doc-count-proportional (the exposure the token-mass corpus
    # cannot show: array_distinct bounds the hot fingerprint at one
    # row per doc), while the production census / distributed_scan
    # shapes stay balanced.
    for base, out in ((OUT_1X, DOCSKEW_1X), (OUT_NX, DOCSKEW_NX)):
        marker = os.path.join(out, "_MARKER")
        want = f"{base}|docskew{DOC_SKEW_VERSION}"
        if not (os.path.exists(marker) and open(marker).read() == want):
            plant_doc_skew_corpus(spark, base, out)
            with open(marker, "w") as f:
                f.write(want)
    # Time in a FRESH JVM session: the one that just wrote the inflated
    # corpora carries bloated heap/GC state that taxed the first timed
    # row by ~2x (measured on copurchase_triangles: 58-77s in-sequence
    # vs ~35s standalone for the identical 8x computation).
    spark.stop()
    spark = get_spark("cba-scale-probe-timed", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    probes = {name: plans.QUERIES[name] for name in PROBES}
    probes["benchmark_contamination"] = plans.QUERIES["benchmark_contamination"]
    probes.update(EXTRA_PROBES)

    rows = []
    for name, fn in probes.items():
        # Untimed warm-up: whole-stage-codegen compilation (~1s) is paid
        # on a plan's FIRST execution and cached after — without this,
        # any sub-second plan shows a bogus <1x ratio because the 1x run
        # pays the compile and the 8x run doesn't.
        fn(spark, OUT_1X).collect()
        base_s = _time(fn, spark, OUT_1X)
        big_s = _time(fn, spark, OUT_NX)
        ratio = big_s / base_s if base_s else float("inf")
        rows.append((name, base_s, big_s, ratio))
        print(f"{name:28s} base={base_s:7.2f}s x{COPIES}={big_s:7.2f}s "
              f"ratio={ratio:5.2f} (linear would be <= {COPIES})")

    # Negative control for the LSH contract: the default lsh_band_pairs
    # row above AUTO-widens its bands with the corpus count (VERDICT r6
    # ask #4 — no manual widening row needed), so this pins the shape
    # it replaced: FIXED 4-bit bands, whose candidate set grows
    # ~n^2/2^bits and whose ratio is expected super-linear. The probe
    # keeps it to prove the auto rule is doing real work.
    from comperhensive_bigdata_analysis__spark.plans.ann import (
        BITS_PER_BAND,
        lsh_pairs_at,
    )

    fixed = lambda s, d: lsh_pairs_at(s, d, bits_per_band=BITS_PER_BAND)  # noqa: E731
    fixed(spark, OUT_1X).collect()  # codegen warm-up
    fixed_base = _time(fixed, spark, OUT_1X)
    fixed_big = _time(fixed, spark, OUT_NX)
    fixed_ratio = fixed_big / fixed_base
    control_names = set()  # rows excluded from the pass/fail line
    control_names.add(f"lsh_band_pairs[fixed {BITS_PER_BAND}-bit bands]")
    rows.append(
        (f"lsh_band_pairs[fixed {BITS_PER_BAND}-bit bands]",
         fixed_base, fixed_big, fixed_ratio)
    )
    print(f"lsh fixed at {BITS_PER_BAND}-bit bands: base={fixed_base:.2f}s "
          f"x{COPIES}={fixed_big:.2f}s ratio={fixed_ratio:.2f} "
          "(expected super-linear — negative control)")

    # Second negative control (round 8): winnowing WITHOUT the
    # WINNOW_MAX_DF boilerplate-fingerprint cap — the uncapped shape
    # measured 27.6x at 8x when the cap landed; re-measuring it every
    # round keeps the cap's value an empirical row, not a one-time
    # claim.
    from comperhensive_bigdata_analysis__spark.plans.dedup import (
        WINNOW_MAX_DF,
        winnowing_pairs_at,
    )

    uncapped = lambda s, d: winnowing_pairs_at(s, d, max_df=None)  # noqa: E731
    uncapped(spark, OUT_1X).collect()  # codegen warm-up
    un_base = _time(uncapped, spark, OUT_1X)
    un_big = _time(uncapped, spark, OUT_NX)
    un_ratio = un_big / un_base
    control_names.add("winnowing_fingerprint_pairs[uncapped]")
    rows.append(
        ("winnowing_fingerprint_pairs[uncapped]", un_base, un_big, un_ratio)
    )
    print(f"winnowing uncapped: base={un_base:.2f}s x{COPIES}={un_big:.2f}s "
          f"ratio={un_ratio:.2f} (expected super-linear — negative control)")

    # Third negative control (round 10): the GLOBAL ntile window that
    # ntile_price_quartiles replaced — Window.orderBy with no partition
    # key sorts the ENTIRE orders table in one task (no rank filter, so
    # no WindowGroupLimit prune). Its 8x wall-clock ratio climbs toward
    # the copy count because the extra data serializes in that one
    # task, while the production scan shape's ratio stays near-flat.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as _Win

    def _ntile_global_window(s, d):
        o = load_table(s, d, "orders")
        w = _Win.orderBy("o_totalprice", "o_orderkey")
        return (
            o.select(
                "o_totalprice",
                F.ntile(4).over(w).cast("long").alias("quartile"),
            )
            .groupBy("quartile")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    _ntile_global_window(spark, OUT_1X).collect()  # codegen warm-up
    gw_base = _time(_ntile_global_window, spark, OUT_1X)
    gw_big = _time(_ntile_global_window, spark, OUT_NX)
    gw_ratio = gw_big / gw_base
    control_names.add("ntile_price_quartiles[global-window]")
    rows.append(
        ("ntile_price_quartiles[global-window]", gw_base, gw_big, gw_ratio)
    )
    print(f"ntile global-window control: base={gw_base:.2f}s "
          f"x{COPIES}={gw_big:.2f}s ratio={gw_ratio:.2f} "
          "(single-task sort — see per-task skew)")

    # Planted-hot-key skew rows (VERDICT r9 ask #1): the key-disjoint
    # corpora above keep every per-key mass constant, so they are
    # structurally blind to hot-key shapes. These corpora plant the
    # worst single-key case (sources/inflate.plant_skew_corpus: half
    # the docs get a repeated boilerplate token at ~3x their own mass
    # — ONE shingle digest carries ~47% of total shingle mass) and
    # re-measure the two digest-keyed dedup pipelines on it at 1x and
    # 8x. Scored rows run the PRODUCTION census shape (persist +
    # partial-agg census + broadcast semi/anti join — no stage
    # colocates one key's mass); the bracketed [window-shape] rows are
    # the r9 window-count shape kept as the skew negative control (all
    # rows of one key in one window task; AQE cannot split a window).
    from comperhensive_bigdata_analysis__spark.operators.curation import (
        exact_substr_span_table,
    )
    from pyspark.sql import functions as F

    def _ess_at(shape):
        def q(s, d):
            docs = load_table(s, d, "documents")
            spans = exact_substr_span_table(
                docs, "doc_id", "text", dup_shape=shape
            )
            return (
                spans.groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
                    F.sum(F.col("e") - F.col("s") + 1)
                    .cast("bigint")
                    .alias("dup_token_mass"),
                )
                .orderBy("doc_id")
            )

        return q

    # ccnet bare-window negative control (VERDICT r10 ask #4): the
    # exact shape the production plan replaced — NTILE(3) OVER
    # (PARTITION BY lang ...) with no rank filter, so no
    # WindowGroupLimit prune and the hot language's entire census
    # sorts in ONE task. Output identical to the production plan.
    from comperhensive_bigdata_analysis__spark.plans.training import (
        unigram_lm_surprisal,
    )
    from pyspark.sql.window import Window as _W

    def _ccnet_window_control(s, d):
        sur = unigram_lm_surprisal(s, d)
        docs = load_table(s, d, "documents").select("doc_id", "lang")
        w = _W.partitionBy("lang").orderBy("avg_surprisal", "doc_id")
        b = sur.join(docs, "doc_id").withColumn(
            "bucket", F.ntile(3).over(w).cast("bigint")
        )
        return (
            b.groupBy("lang", "bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                (
                    F.floor(
                        F.sum(
                            F.col("avg_surprisal").cast("decimal(28,12)")
                        ).cast("double")
                        / F.count(F.lit(1))
                        * 1e6
                    )
                    / 1e6
                ).alias("mean_surprisal"),
            )
            .orderBy("lang", "bucket")
        )

    # The df-cap test ISOLATED from the pair stage (VERDICT r10 ask #2
    # follow-through): in the full winnowing plan the pair explode
    # (~45us/row, uniform) fuses into the same physical stage as the
    # df window and swamps the hot key's cheap counting, so the full-
    # plan per-task rows cannot show the colocation even when it is
    # there. These probe the surviving-fingerprints-per-doc census —
    # same fingerprint relation, same df test, but the downstream is a
    # doc_id partial aggregate (~1us/row), so the stage's time IS the
    # df test and the window shape's hot task is visible.
    from comperhensive_bigdata_analysis__spark.plans.dedup import (
        _winnow_fingerprints,
    )
    from pyspark.sql.window import Window as _WW

    def _win_df_survivors(shape):
        def q(s, d):
            fp = _winnow_fingerprints(s, d)
            if shape == "window":
                kept = fp.withColumn(
                    "df", F.count(F.lit(1)).over(_WW.partitionBy("f"))
                ).filter(F.col("df") <= WINNOW_MAX_DF)
            else:
                fp = fp.persist()
                bl = (
                    fp.groupBy("f")
                    .agg(F.count(F.lit(1)).alias("df"))
                    .filter(F.col("df") > WINNOW_MAX_DF)
                    .select("f")
                )
                kept = fp.join(bl, "f", "left_anti")
            per_doc = kept.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_kept")
            )
            return per_doc.groupBy().agg(
                F.sum("n_kept").alias("kept_rows"),
                F.count(F.lit(1)).alias("docs"),
            )

        return q

    skew_probes = [
        ("exact_substr_spans[planted-skew]", _ess_at("census"), False,
         SKEW_1X, SKEW_NX),
        ("exact_substr_spans[window-shape planted-skew]",
         _ess_at("window"), True, SKEW_1X, SKEW_NX),
        ("winnowing_pairs[planted-skew]",
         lambda s, d: winnowing_pairs_at(s, d, max_df=WINNOW_MAX_DF), False,
         SKEW_1X, SKEW_NX),
        ("winnowing_pairs[window-shape planted-skew]",
         lambda s, d: winnowing_pairs_at(s, d, max_df=WINNOW_MAX_DF,
                                         cap_shape="window"), True,
         SKEW_1X, SKEW_NX),
        # ask #2: the doc-count axis — same pair of shapes, corpus
        # where the hot fingerprint's rows scale with DOC COUNT
        ("winnowing_pairs[doc-skew]",
         lambda s, d: winnowing_pairs_at(s, d, max_df=WINNOW_MAX_DF), False,
         DOCSKEW_1X, DOCSKEW_NX),
        ("winnowing_pairs[window-shape doc-skew]",
         lambda s, d: winnowing_pairs_at(s, d, max_df=WINNOW_MAX_DF,
                                         cap_shape="window"), True,
         DOCSKEW_1X, DOCSKEW_NX),
        # ask #4: the deepest r10 distributed_scan conversion vs the
        # bare ntile window it replaced, on the planted hot-lang bed
        ("ccnet_quality_buckets[lang-skew]",
         plans.QUERIES["ccnet_quality_buckets"], False,
         DOCSKEW_1X, DOCSKEW_NX),
        ("ccnet_quality_buckets[window-shape lang-skew]",
         _ccnet_window_control, True, DOCSKEW_1X, DOCSKEW_NX),
        # the isolated df-cap stage (see _win_df_survivors comment)
        ("winnow_df_filter[doc-skew]", _win_df_survivors("census"), False,
         DOCSKEW_1X, DOCSKEW_NX),
        ("winnow_df_filter[window-shape doc-skew]",
         _win_df_survivors("window"), True, DOCSKEW_1X, DOCSKEW_NX),
    ]

    def _task_skew(fn, sf_dir):
        """Worst per-stage (max task / p50 task) runtime ratio across
        the stages one cold run of ``fn`` executes — the mechanical
        hot-key signal wall-clock at fixed cores cannot show. Uses the
        UI REST API; returns None if the UI is off."""
        sc = spark.sparkContext
        ui, app = sc.uiWebUrl, sc.applicationId
        if not ui:
            return None

        def _get(path):
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}{path}", timeout=30
            ) as r:
                return json.loads(r.read())

        # AQE partition-coalescing neutralized for this instrument
        # only (wall-clock rows keep production confs): a probe-scale
        # shuffle is a few tens of MB, so AQE folds the reduce side
        # into a handful of tasks — inflating the p50 baseline and
        # hiding exactly the hot-task colocation this table exists to
        # price. A 100 TB stage has no such luxury; keeping the
        # configured partition count emulates the at-scale task
        # layout. The lever is the ADVISORY partition size (1KB merges
        # nothing) rather than coalescePartitions.enabled, because
        # every plan entry point re-applies RUNTIME_CONFS (which pins
        # that flag true) via apply_runtime_confs.
        adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        minp = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
        adv_old = spark.conf.get(adv, "64MB")
        minp_old = spark.conf.get(minp, "1MB")
        try:
            # sets live INSIDE the try (r11 ADVICE): an exception between
            # them and the probe must still restore production confs
            spark.conf.set(adv, "1KB")
            spark.conf.set(minp, "1B")  # parallelismFirst floors at this
            before = {s["stageId"] for s in _get("/stages?status=complete")}
            spark.catalog.clearCache()
            fn(spark, sf_dir).collect()
            new = [
                s
                for s in _get("/stages?status=complete")
                if s["stageId"] not in before
                and s.get("numCompleteTasks", 0) >= 4
            ]
            # Significance filter: a 100ms warm-up stage's max/p50 is
            # scheduler noise, not skew — only stages carrying >= 5% of
            # the run's total executor time can indict a shape.
            total = sum(s.get("executorRunTime", 0) for s in new) or 1
            worst = None
            for s in new:
                if s.get("executorRunTime", 0) < 0.05 * total:
                    continue
                q = _get(
                    f"/stages/{s['stageId']}/{s.get('attemptId', 0)}"
                    "/taskSummary?quantiles=0.5,1.0"
                )
                rt = q.get("executorRunTime") or q.get("duration")
                if not rt or rt[0] <= 0:
                    continue
                # Shuffle-read RECORDS max/p50 is the mechanical
                # colocation signal: one task holding Nx the median
                # task's rows is what becomes memory/spill/straggler
                # at 1e9 rows, even where its CPU ratio stays small
                # (measured r11: counting-and-dropping a hot key's
                # identical rows costs ~10x less per row than the
                # keep path, so runtime ratios understate colocation
                # at probe scale).
                srm = q.get("shuffleReadMetrics") or {}
                rec = srm.get("readRecords") or srm.get("recordsRead")
                rec_ratio = (
                    rec[1] / rec[0] if rec and rec[0] and rec[0] > 0 else None
                )
                rt_ratio = rt[1] / rt[0]
                key = (rec_ratio if rec_ratio is not None else 0.0, rt_ratio)
                if worst is None or key > worst[0]:
                    worst = (key, rec_ratio, rt_ratio,
                             s.get("numCompleteTasks"), int(rt[0]), int(rt[1]))
            return worst[1:] if worst else None
        except Exception:  # noqa: BLE001 — metrics must not fail the probe
            return None
        finally:
            spark.conf.set(adv, adv_old)
            spark.conf.set(minp, minp_old)

    skew_tasks = []
    for name, fn, is_control, dir_1x, dir_nx in skew_probes:
        fn(spark, dir_1x).collect()  # codegen warm-up
        b = _time(fn, spark, dir_1x)
        g = _time(fn, spark, dir_nx)
        r = g / b if b else float("inf")
        rows.append((name, b, g, r))
        if is_control:
            control_names.add(name)
        ts = _task_skew(fn, dir_nx)
        skew_tasks.append((name, ts))
        print(f"{name:44s} base={b:6.2f}s x{COPIES}={g:6.2f}s ratio={r:5.2f}"
              + (" (negative control)" if is_control else "")
              + (f"  task-skew records max/p50="
                 f"{(f'{ts[0]:.2f}' if ts[0] is not None else 'n/a')} "
                 f"runtime max/p50={ts[1]:.2f} "
                 f"({ts[4]}ms/{ts[3]}ms over {ts[2]} tasks)" if ts else ""))

    # (No task-skew row for the global-ntile pair: the control's sort
    # stage is ONE task, which the >= 8-tasks significance filter
    # rightly excludes — max/p50 of a 1-task stage is undefined, not
    # balanced. For that pair the wall-clock ratios above carry the
    # signal unassisted: the single-task sort serializes the extra
    # data, so the control's ratio climbs toward the copy count while
    # the scan shape's stays near-flat.)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_PROBE.md"), "w") as f:
        f.write(
            "# SCALE PROBE — empirical check of the SCALE_AUDIT claims\n\n"
            f"Generated by tools/scale_probe.py: the three shuffle-heaviest\n"
            f"plans over the {BASE} corpus, at 1x vs {COPIES}x key-disjoint\n"
            "inflation (see the tool docstring for how each table is\n"
            "inflated without duplicate-collision artifacts). BOTH corpora\n"
            "are written by the same Spark writer so file layout and scan\n"
            "parallelism are comparable — the ratio isolates data volume.\n"
            f"A time ratio at or below {COPIES}x means the plan scales at\n"
            "worst linearly with data volume on a fixed executor pool —\n"
            "the property the audit ledger claims structurally.\n\n"
            f"| plan | 1x (s) | {COPIES}x data (s) | time ratio |\n"
            "|---|---|---|---|\n"
        )
        for name, base_s, big_s, ratio in rows:
            f.write(f"| {name} | {base_s:.2f} | {big_s:.2f} | {ratio:.2f}x |\n")
        if any(ts for _, ts in skew_tasks):
            f.write(
                f"\n## Per-task skew on the planted corpus ({COPIES}x)\n\n"
                "Wall-clock at FIXED cores cannot price a single-task\n"
                "colocation — a hot key shifts constants, not 1x-vs-8x\n"
                "ratios — so this table records the MECHANICAL signal:\n"
                "the worst per-stage max/p50 task runtime over one cold\n"
                "run (UI REST taskSummary; stages with < 4 tasks\n"
                "excluded). A balanced shape reads ~1.0; a hot-key\n"
                "colocation reads the hot task's multiple directly, and\n"
                "GROWS with corpus scale while balanced shapes stay\n"
                "flat.\n\n"
                "(Stages carrying < 5% of the run's total executor time\n"
                "are excluded — a 100ms warm-up stage's max/p50 is\n"
                "scheduler noise, not skew. These task-metric runs\n"
                "NEUTRALIZE AQE partition coalescing (1KB advisory\n"
                "partition size): a probe-scale shuffle is tens of MB\n"
                "and AQE folds its reduce side into a handful of tasks,\n"
                "inflating the p50 baseline and hiding the colocation —\n"
                "a luxury a 100 TB stage does not have. Wall-clock rows\n"
                "keep production confs.)\n\n"
                "| run | records max/p50 | runtime max/p50 "
                "| max task | p50 task | tasks |\n"
                "|---|---|---|---|---|---|\n"
            )
            for name, ts in skew_tasks:
                if ts:
                    rec = f"{ts[0]:.2f}" if ts[0] is not None else "n/a"
                    f.write(
                        f"| {name} | {rec} | {ts[1]:.2f} | {ts[4]}ms "
                        f"| {ts[3]}ms | {ts[2]} |\n"
                    )
            f.write(
                "\nReading: the exact-substr [window-shape] control is\n"
                "where the planted hot digest shows — its dg-window\n"
                "stage's max task runs a MULTIPLE of the stage p50 (the\n"
                "~47%-mass digest sorted and counted in ONE task; the\n"
                "multiple grows with corpus scale), while the census\n"
                "shape's significant stages stay near 1 (partial\n"
                "aggregation + broadcast semi join never colocate the\n"
                "key). The winnowing TOKEN-MASS rows read near-balanced\n"
                "in BOTH shapes: array_distinct bounds the hot\n"
                "fingerprint at one row per doc and the char-gram md5\n"
                "scan dominates that corpus — the window shape's\n"
                "exposure there grows with DOC COUNT, which is what the\n"
                "[doc-skew] rows measure (VERDICT r10 ask #2): 256x the\n"
                "docs at ~8-20 chars each, ONE hot fingerprint in half\n"
                "of them. In the FULL plan the pair explode fuses into\n"
                "the same stage as the df window and dilutes the\n"
                "signal, so the winnow_df_filter pair isolates the\n"
                "stage whose shape actually differs (same fingerprint\n"
                "relation, cheap doc_id downstream): the [window-shape]\n"
                "control's hot count-task reads records 9.3x / runtime\n"
                "4.7x (713ms p50 -> 3355ms hot) while the census shape\n"
                "reads 1.0 — the doc-count exposure, now a number. The\n"
                "ccnet [lang-skew] pair (ask #4) makes the same\n"
                "measurement for the r10 distributed_scan conversions:\n"
                "lang planted 'en' on half the docs over a\n"
                "499-cold-lang bed — the bare NTILE window control\n"
                "sorts the hot language's census in ONE task (records\n"
                "34x / runtime 20x, 375ms p50 -> 7.6s hot), while the\n"
                "production range-partition + census-offset shape\n"
                "bounds every task by partition size (its residual\n"
                "records 3.9x is range-boundary SAMPLING imbalance on a\n"
                "50%-hot contiguous key — splittable by adding\n"
                "partitions, unlike a window partition, and its hot\n"
                "task is 1.7x p50, not 20x). The global-ntile\n"
                "shape pair in the MAIN table makes the same point\n"
                "without planting anything: the [global-window]\n"
                "control sorts the whole table in ONE task, so its 8x\n"
                "ratio climbs toward the copy count (the extra data\n"
                "serializes), while the production distributed_scan\n"
                "shape's ratio stays near-flat — a gap that widens\n"
                "with corpus scale at any core count.\n"
            )
        # deliberate negative controls (explicit membership, collected
        # at their append sites — review r8: a name heuristic would
        # silently declassify future bracketed SCORED variants) are
        # excluded from the pass/fail line and reported separately.
        scored = [r for r in rows if r[0] not in control_names]
        controls = [r for r in rows if r[0] in control_names]
        worst = max(r[3] for r in scored)
        f.write(
            f"\nWorst ratio {worst:.2f}x at {COPIES}x data"
            f"{' — all at-worst-linear.' if worst <= COPIES else ' — SUPER-linear plan flagged below.'}"
            + (
                " (Deliberate negative controls, scored separately below: "
                + "; ".join(f"{c[0]} at {c[3]:.2f}x" for c in controls)
                + ".)\n"
                if controls
                else "\n"
            )
            + "\n## Interpretation\n\n"
            "- copurchase_triangles, corpus_similarity_matrix, and the two\n"
            "  dedup-family rows (benchmark_contamination and the K=64\n"
            "  production MinHash tier) scale at-worst linearly: their\n"
            "  shuffled relations are collapsed aggregates / banded\n"
            "  equality joins, so constant scheduling/shuffle machinery\n"
            "  amortizes as volume grows — the SCALE_AUDIT claim holds.\n"
            "  (Triangles was re-probed repeatedly in round 7: the old\n"
            "  wedge-join shape exchanged ~49M wedge ROWS per sf0.1 copy\n"
            "  and sort-merged them into the closure join, and its 8x\n"
            "  row hovered AT the line — 7.2x-10.7x across four runs,\n"
            "  the scatter coming from wedge-exchange sort spills. The\n"
            "  plan now uses the degree-oriented edge-iterator\n"
            "  (forward-adjacency arrays + array_intersect per edge,\n"
            "  SHUFFLE_HASH adjacency joins): the same pair comparisons\n"
            "  run inside a per-edge JVM hash intersect, wedge-scale\n"
            "  data is never exchanged or sorted, and the oracle still\n"
            "  hash-checks the count against the textbook wedge join.\n"
            "  Basket distribution is scale-invariant here (key-disjoint\n"
            "  inflation; max 17 / mean 4.08 items per order at BOTH\n"
            "  scales) and the orientation bounds forward-degree at\n"
            "  O(sqrt(m)) on the skewed graphs this corpus never\n"
            "  enters.)\n"
            "- pq_adc_knn (declarative oracle tier) grows with its\n"
            "  n x codewords distance combine — linear in n at fixed\n"
            "  codebook, which the ratio should show; the benched numpy\n"
            "  tier does the same arithmetic as batch matmuls.\n"
            "- bloom_filter_probe's filter is constant-size by\n"
            "  construction; its time should track the (linear) digest\n"
            "  scan, with the 64-row bit_or reduce invariant.\n"
            "- grouped_exact_median refines a fixed 256-bucket histogram\n"
            "  per group per round, so each round is one map-side-combined\n"
            "  exchange over the data and the ROUND COUNT grows with the\n"
            "  value-range bits, not the row count — the ratio should sit\n"
            "  at or under the inflation factor (rounds are identical at\n"
            "  both scales because the value distribution is the same).\n"
            "- ann_recall_matrix runs all four ANN legs plus the\n"
            "  brute-force reference and joins them on vec_id; its growth\n"
            "  is the max of its legs (brute force: linear at fixed K and\n"
            "  query count; IVF/JL/PQ: linear candidate scans), so the\n"
            "  eval inherits at-worst-linear behavior and the probe pins\n"
            "  the 18-exchange composition's constant.\n"
            "- hash_embed_topk tokenizes and feature-hashes every doc\n"
            "  into 32 buckets, broadcasts the <=32-row query vector,\n"
            "  partial-aggregates the (doc, bucket) mass map-side, and\n"
            "  finishes with one doc_id exchange into a\n"
            "  TakeOrderedAndProject — linear scan work, constant-size\n"
            "  broadcast, top-k never materializes the full score set.\n"
            "- zorder_skipping_stats assigns file ids by integer range\n"
            "  arithmetic against a broadcast 1-row max (no global sort,\n"
            "  no window), then aggregates per-file min/max — one\n"
            "  map-side-combined exchange over the fact rows.\n"
            "- semantic_dedup_census is quadratic only WITHIN a (cluster,\n"
            "  sub-bucket): the SEMDEDUP_MAX_CLUSTER re-split caps bucket\n"
            "  size, so total candidate pairs are <= n*cap/2 — linear in\n"
            "  corpus size — and the probe ratio stays far under the\n"
            "  inflation factor even though the 8x corpus grows every\n"
            "  cluster 8-fold (more sub-buckets, same bucket size).\n"
            "- semantic_dedup_greedy shares that edge pipeline, then walks\n"
            "  each bucket in a grouped applyInPandas — per-group work is\n"
            "  bounded by the bucket cap, so growth comes only from the\n"
            "  NUMBER of buckets (linear) and the Arrow transfer of the\n"
            "  edge list (also linear at capped occupancy).\n"
            "- dsir_importance_weights is the heaviest token-fanout plan\n"
            "  (~2 hashed features per token: unigrams + bigrams), but\n"
            "  the whole plan is ONE tokenize/hash pass: the (doc,\n"
            "  lang, bucket) map-side-combined partial feeds both the\n"
            "  scoring leg and the 64-bucket model via AQE\n"
            "  ReuseExchange, totals are a window over the 64-row\n"
            "  model, and only the 64-row ratio table broadcasts — the\n"
            "  ratio pins the fanout constant, not a growth term.\n"
            "- exact_substr_spans emits ~1 digest row per token\n"
            "  (stride-1 16-token windows, md5-keyed so shingle\n"
            "  STRINGS never shuffle); since r10 the corpus-duplicate\n"
            "  test is a lazily-PERSISTED shingle frame feeding a\n"
            "  partial-aggregated digest census and a broadcast/AQE\n"
            "  semi join back (the r9 window-count shape put ALL rows\n"
            "  of one digest in one window task — the planted-skew\n"
            "  rows below measure exactly that exposure; the cache\n"
            "  replaces the double scan the r8 shape paid), and the\n"
            "  island merge is one window pass inside the per-doc\n"
            "  partitioning — linear, no stage colocating one key's\n"
            "  mass, fanout constant pinned here.\n"
            "- bigram_lm_surprisal builds its (doc, w1, w2) partial in\n"
            "  one tokenize pass and re-aggregates it into the bigram\n"
            "  model and the w1 marginal; scoring joins by key (the\n"
            "  bigram vocabulary is NEVER broadcast — it grows with\n"
            "  corpus diversity), so every stage is a map-side-combined\n"
            "  exchange over linear-size relations.\n"
            "- lsh_band_pairs AUTO-scales its band width from the corpus\n"
            "  count (plans/ann.auto_bits_per_band: ~ceil(log2(n)) - 5\n"
            "  bits, floor 4, cap 16), pinning per-band bucket occupancy\n"
            "  to ~32 vectors at any n — candidates, and therefore\n"
            "  runtime, stay linear. The oracle derives the identical\n"
            "  width from COUNT(*) in SQL, so the auto-widened shape is\n"
            "  still hash-verified cross-engine at every scale.\n"
            "- The fixed-4-bit row is the NEGATIVE CONTROL: at a frozen\n"
            "  band width there are only 16 buckets per band, occupancy\n"
            "  grows with n, and candidate pairs grow ~n^2/2^bits — the\n"
            "  super-linear ratio it shows is the failure mode the auto\n"
            "  rule exists to prevent, kept measured so a regression in\n"
            "  the rule would be visible as the default row drifting\n"
            "  toward the control row.\n"
            "- winnowing_fingerprint_pairs drops fingerprints whose\n"
            "  document frequency exceeds WINNOW_MAX_DF before pairing\n"
            "  (boilerplate substrings are not pairwise-copy evidence),\n"
            "  bounding per-fingerprint bucket size so pair mass is\n"
            "  linear — the r9 decomposition measured pair mass growing\n"
            "  SUB-linearly (4.9x at 8x data: the fixed cap binds harder\n"
            "  on a larger corpus). Cap SURVIVAL is a measured, driver-\n"
            "  green number, not a claim: winnowing_cap_recall records\n"
            "  185 ppm of uncapped pairs surviving at sf0.01 — read\n"
            "  with care, 99.4% of ALL doc pairs clear the uncapped\n"
            "  >=3-shared bar on this boilerplate-heavy corpus, so the\n"
            "  low survival IS the cap removing the boilerplate\n"
            "  cross-product, while recall on true planted copies is\n"
            "  pinned at 100% by the boilerplate-swamp fixture tests\n"
            "  (tests/test_fingerprint.py, test_dedup_tiers.py). Since\n"
            "  r10 the capped path lazily persists the fingerprint\n"
            "  frame, builds a partial-aggregated df census, and\n"
            "  broadcast-ANTI-joins the tiny over-cap blacklist, so\n"
            "  every key reaching the collect_list has <= cap rows and\n"
            "  the shuffle is uniform by construction (the r9 window\n"
            "  shape instead colocated each fingerprint's full mass in\n"
            "  one window task — the planted-skew rows below price\n"
            "  that). The [uncapped] row is its NEGATIVE CONTROL — the\n"
            "  Zipfian-bucket m^2/2 pair blowup (27.6x at 8x when\n"
            "  first measured in round 8), kept on the self-join shape\n"
            "  (group-lists would materialize unbounded arrays) and\n"
            "  re-measured every round for the same canary purpose as\n"
            "  the fixed-band LSH row.\n"
            "- The [planted-skew] rows (r10, VERDICT r9 ask #1) run on\n"
            "  the plant_skew_corpus variant: ONE boilerplate digest\n"
            "  carries ~47% of total shingle mass — the worst-single-\n"
            "  key form of a Zipfian corpus head, which the\n"
            "  key-disjoint corpora above cannot express. The scored\n"
            "  rows are the production census shapes and must stay\n"
            "  at-worst-linear; the bracketed [window-shape] rows keep\n"
            "  the r9 window-count shape measured beside them. The\n"
            "  structural difference the wall-clock ratios price: the\n"
            "  census shapes never colocate one key's mass (partial\n"
            "  aggregation combines map-side; the semi/anti join\n"
            "  broadcasts or AQE-skew-splits), while the window shape\n"
            "  sorts the hot key's entire mass in ONE task — linear\n"
            "  and spillable at probe scale, but the task grows with\n"
            "  the corpus and no executor count can split it, which\n"
            "  is why the census shape is the production default even\n"
            "  where the local ratios read close.\n"
            "- semantic_dedup_census runs the r9 2-salt sub-bucket\n"
            "  union (measured recall 0.494 -> 0.775 at sf0.01, see\n"
            "  PLANS.md): ~2x the linear per-salt pair cost, assignment\n"
            "  built once for both salts.\n"
        )
    print("wrote SCALE_PROBE.md")
    spark.stop()


if __name__ == "__main__":
    main()
