"""The three similarity tiers (exact decimal / JVM fold / numpy matmul)
must agree on the same inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.operators.similarity import (
    brute_force_knn,
    brute_force_knn_np,
    cosine_pairs_above,
    cosine_pairs_above_np,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def _pairs_dict(rows):
    return {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}


def test_pairs_fold_vs_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    fold = _pairs_dict(cosine_pairs_above(e, threshold=0.35).collect())
    np_ = _pairs_dict(cosine_pairs_above_np(e, threshold=0.35).collect())
    assert set(fold) == set(np_)
    for k in fold:
        assert abs(fold[k] - np_[k]) < 1e-9, (k, fold[k], np_[k])


def test_knn_fold_vs_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
         for r in brute_force_knn(e, q, k=5).collect()}
    b = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
         for r in brute_force_knn_np(e, q, k=5).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-9


def test_numpy_pairs_match_oracle_plan(spark, sf_dir):
    """numpy tier reproduces the oracle-tier plan's pair set."""
    from comperhensive_bigdata_analysis__spark.plans.vector import embedding_near_dup

    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "embeddings")
    fast = {
        (r["id_a"], r["id_b"]) for r in cosine_pairs_above_np(e, threshold=0.35).collect()
    }
    assert exact == fast


def test_pq_adc_numpy_matches_oracle_plan(spark, sf_dir):
    """The numpy PQ tier (benched) must reproduce the declarative
    DECIMAL-exact plan tier: same top-10 ids, distances within 1e-6
    (the plan tier rounds to 1e-6)."""
    from comperhensive_bigdata_analysis__spark import plans
    from comperhensive_bigdata_analysis__spark.operators.similarity import (
        pq_adc_knn_np,
    )
    from comperhensive_bigdata_analysis__spark.plans.ann import PQ_CENTROIDS, PQ_M

    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < PQ_CENTROIDS).orderBy("vec_id").collect()
    ]
    qv = list(e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"])
    np_rows = pq_adc_knn_np(e, cents, qv, n_sub=PQ_M, k=10, exclude_id=0).collect()
    plan_rows = plans.QUERIES["pq_adc_knn"](spark, sf_dir).collect()
    assert [r["vec_id"] for r in np_rows] == [r["vec_id"] for r in plan_rows]
    for a, b in zip(np_rows, plan_rows):
        assert abs(a["adc_dist"] - b["adc_dist"]) < 1e-5, (a, b)
