"""ANN scale-path plans: fast JVM tiers must agree with the
decimal-exact oracle-tier plans, and approximate results must be
consistent subsets of the exact baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.operators.similarity import (
    ivf_knn_fast,
    ivf_knn_np,
    lsh_band_pairs_fast,
    lsh_band_pairs_np,
)
from comperhensive_bigdata_analysis__spark.plans import ann
from comperhensive_bigdata_analysis__spark.plans.ann import (
    BITS_PER_BAND,
    KNN_K,
    NCENTROIDS,
    NPROBE,
    _SIGNS,
)
from comperhensive_bigdata_analysis__spark.plans.vector import (
    embedding_near_dup,
    knn_bruteforce,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def test_lsh_fast_matches_exact_tier(spark, sf_dir):
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in ann.lsh_band_pairs(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "embeddings")
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_band_pairs_fast(e, _SIGNS, BITS_PER_BAND, threshold=0.35).collect()
    }
    assert set(exact) == set(fast)
    for key in exact:
        assert abs(exact[key] - fast[key]) < 1e-6, (key, exact[key], fast[key])


def test_lsh_pairs_subset_of_exact_pairs(spark, sf_dir):
    lsh = {(r["id_a"], r["id_b"]) for r in ann.lsh_band_pairs(spark, sf_dir).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, sf_dir).collect()}
    assert lsh <= exact
    assert lsh  # banding at 4x4 bits must surface at least one pair


def test_ivf_fast_matches_exact_tier(spark, sf_dir):
    exact = [(r["vec_id"], r["cosine"]) for r in ann.ivf_knn(spark, sf_dir).collect()]
    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < NCENTROIDS).collect()
    ]
    qv = list(
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    fast = [
        (r["vec_id"], r["cosine"])
        for r in ivf_knn_fast(
            e, cents, qv, nprobe=NPROBE, k=KNN_K, exclude_id=0
        ).collect()
    ]
    assert [v for v, _ in exact] == [v for v, _ in fast]
    for (_, ce), (_, cf) in zip(exact, fast):
        assert abs(ce - cf) < 1e-6


def test_lsh_np_matches_fold_tier(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    fold = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_band_pairs_fast(e, _SIGNS, BITS_PER_BAND, threshold=0.35).collect()
    }
    np_ = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_band_pairs_np(e, _SIGNS, BITS_PER_BAND, threshold=0.35).collect()
    }
    assert set(fold) == set(np_)
    for k in fold:
        assert abs(fold[k] - np_[k]) < 1e-9


def test_ivf_np_matches_fold_tier(spark, sf_dir):
    from pyspark.sql import functions as FF

    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(FF.col("vec_id") < NCENTROIDS).collect()
    ]
    qv = list(e.filter(FF.col("vec_id") == 0).select("embedding").first()["embedding"])
    fold = [
        (r["vec_id"], r["cosine"])
        for r in ivf_knn_fast(e, cents, qv, nprobe=NPROBE, k=KNN_K, exclude_id=0).collect()
    ]
    np_ = [
        (r["vec_id"], r["cosine"])
        for r in ivf_knn_np(e, cents, qv, nprobe=NPROBE, k=KNN_K, exclude_id=0).collect()
    ]
    assert [v for v, _ in fold] == [v for v, _ in np_]
    for (_, cf), (_, cn) in zip(fold, np_):
        assert abs(cf - cn) < 1e-9


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    truth = {r["vec_id"] for r in knn_bruteforce(spark, sf_dir).collect()}
    got = {r["vec_id"] for r in ann.ivf_knn(spark, sf_dir).collect()}
    # probing NPROBE/NCENTROIDS = 1/4 of the space must still recover a
    # majority of the true top-k on clustered synthetic data
    assert len(truth & got) / len(truth) >= 0.5
