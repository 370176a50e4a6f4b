"""Iterative k-means (operators/ml.py): parity with the oracle-checked
single-step plans, Lloyd convergence, and a separable-blobs sanity fit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark import plans
from comperhensive_bigdata_analysis__spark.operators.ml import kmeans_fit
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


def test_first_round_matches_oracle_checked_step_plans(spark, sf_dir):
    """One kmeans_fit round == the kmeans_update plan (which the DuckDB
    oracle pins), so the iterative operator inherits the exactness proof."""
    e = load_table(spark, sf_dir, "embeddings")
    fit = kmeans_fit(e, k=8, max_iter=1)
    got = {
        (r["cid"], r["pos"] + 1): r["cx"] for r in fit["centroids"].collect()
    }
    want = {
        (r["centroid"], r["pos"]): r["mean_x"]
        for r in plans.QUERIES["kmeans_update"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    # plan floors at 1e-6 for the cross-engine hash; operator is raw
    assert all(abs(got[k] - want[k]) <= 1e-6 for k in want)


def test_inertia_non_increasing(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(200)
    i1 = kmeans_fit(e, k=4, max_iter=1)["inertia"]
    i3 = kmeans_fit(e, k=4, max_iter=3)["inertia"]
    i6 = kmeans_fit(e, k=4, max_iter=6)["inertia"]
    assert i3 <= i1 + 1e-9
    assert i6 <= i3 + 1e-9


def test_separable_blobs_recovered(spark):
    # Two tight blobs far apart: k=2 must split them exactly.
    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (10 + i, [100.0 + 0.01 * i, 100.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    fit = kmeans_fit(df, k=2, max_iter=5)
    sets = (
        fit["assignments"]
        .groupBy("cid")
        .agg(F.collect_set("vid").alias("members"))
        .collect()
    )
    groups = sorted(sorted(r["members"]) for r in sets)
    assert groups == [[0, 1, 2, 3, 4], [10, 11, 12, 13, 14]]
    assert fit["n_iter"] <= 5


def test_numpy_tier_matches_exact_assignment(spark, sf_dir):
    """Production matmul tier agrees with the oracle-checked exact plan:
    identical assignments, distances within float-rounding of the
    decimal-exact values."""
    from comperhensive_bigdata_analysis__spark.operators.ml import kmeans_assign_np

    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    got = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in kmeans_assign_np(e, cents).collect()
    }
    want = {
        r["vec_id"]: (r["centroid"], r["dist2"])
        for r in plans.QUERIES["kmeans_assign"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert all(got[k][0] == want[k][0] for k in want)  # same centroid
    # plan floors d2 at 1e-6; matmul path adds ~1e-9 relative noise
    assert all(abs(got[k][1] - want[k][1]) <= 1e-5 * (1 + want[k][1]) for k in want)


def test_kmeans_centroids_drive_ivf_index(spark, sf_dir):
    """End-to-end index build: Lloyd-learned centroids feed the IVF
    probe path, and IVF@nprobe=4 recovers most of the brute-force
    top-10 — the learned partitioning is a usable ANN index, not just
    a clustering statistic."""
    from comperhensive_bigdata_analysis__spark.operators.similarity import (
        brute_force_knn_np,
        ivf_knn_np,
    )

    e = load_table(spark, sf_dir, "embeddings")
    fit = kmeans_fit(e, k=8, max_iter=5)
    # centroids frame (cid, pos, cx) -> driver-side K x dim vectors
    rows = fit["centroids"].collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cx"]
    cents = [
        (cid, [comps[p] for p in sorted(comps)]) for cid, comps in sorted(by_cid.items())
    ]
    qv = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ivf = {
        r["vec_id"]
        for r in ivf_knn_np(e, cents, qv, nprobe=4, k=10, exclude_id=0).collect()
    }
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["vec_id"] for r in brute_force_knn_np(e, q, k=10).collect()}
    assert len(ivf) == 10
    assert len(ivf & exact) >= 6  # probing half the learned cells: recall >= 0.6


def test_converges_and_reports_rounds(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(100)
    fit = kmeans_fit(e, k=3, max_iter=10, tol=1e-12)
    assert 1 <= fit["n_iter"] <= 10
    assert fit["assignments"].count() == 100
    if fit["n_iter"] < 10:  # converged early: one more round moves nothing
        refit = kmeans_fit(e, k=3, max_iter=fit["n_iter"] + 1, tol=1e-12)
        assert refit["n_iter"] == pytest.approx(fit["n_iter"], abs=1)
