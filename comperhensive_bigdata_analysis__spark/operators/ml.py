"""Iterative Lloyd k-means over an embedding column — the full-fit
counterpart of the single-step plans in plans/ml.py (kmeans_assign /
kmeans_update are the oracle-checked building blocks; this operator
composes them to convergence).

Design for 100 TB / 1000 executors:

- The exploded component frame (id, pos, x) is localCheckpoint-ed ONCE
  and reused every round — the scan does not re-run per iteration.
- Centroids are a K x dim frame (tiny) and always BROADCAST into the
  assignment join; the only real shuffle per round is the two hash
  aggregations (per-vector distance sum, per-centroid mean), both
  map-side combined.
- Each round's centroids are localCheckpoint-ed — the operators/graph.py
  iteration discipline: without it round k replays rounds 1..k-1 and
  the DAG grows quadratically.
- Convergence is ONE scalar job: join old/new centroids, max |shift|.
  Nothing data-sized ever reaches the driver.
- At extreme dim x K products the per-component join inflates rows
  (n_vectors x K x dim); the production escape hatch is the numpy
  mapInPandas tier (operators/similarity.py pattern) computing all K
  distances per Arrow batch — keep THIS formulation as its correctness
  oracle, same twin-tier contract as dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PDEC = "decimal(28,12)"


def _components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("pos", "xf")
    ).select("vid", "pos", F.col("xf").cast("double").alias("x"))


def _assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    """(vid, cid, d2): nearest centroid by decimal-exact squared L2."""
    diff = F.col("x") - F.col("cx")
    d = (
        v.join(F.broadcast(cents), "pos")
        .groupBy("vid", "cid")
        .agg(F.sum((diff * diff).cast(PDEC)).cast("double").alias("d2"))
    )
    w = Window.partitionBy("vid").orderBy("d2", "cid")
    return (
        d.select("vid", "cid", "d2", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-9,
) -> dict:
    """Lloyd iterations to convergence; seeds = the k smallest ids
    (deterministic init — no RNG, rerun-identical like train_test_split).

    Returns {assignments, centroids, inertia, n_iter}: assignments is
    (vid, cid, d2); centroids is (cid, pos, cx); inertia the summed
    squared distance (decimal-exact); n_iter rounds actually run.
    """
    v = _components(df, id_col, vec_col).localCheckpoint()
    seed_ids = [r["vid"] for r in v.select("vid").distinct().orderBy("vid").limit(k).collect()]
    cents = (
        v.filter(F.col("vid").isin(seed_ids))
        .select(F.col("vid").alias("cid"), "pos", F.col("x").alias("cx"))
        .localCheckpoint()
    )

    n_iter = 0
    assign = None
    for n_iter in range(1, max_iter + 1):
        assign = _assign(v, cents)
        new_cents = (
            v.join(assign.select("vid", "cid"), "vid")
            .groupBy("cid", "pos")
            .agg(
                (F.sum(F.col("x").cast(PDEC)).cast("double") / F.count(F.lit(1))).alias(
                    "cx"
                )
            )
            .localCheckpoint()
        )
        shift = (
            new_cents.alias("n")
            .join(cents.alias("o"), ["cid", "pos"])
            .agg(F.max(F.abs(F.col("n.cx") - F.col("o.cx"))).alias("s"))
            .first()["s"]
        )
        cents = new_cents
        if shift is not None and shift <= tol:
            break

    final = _assign(v, cents)
    inertia = final.agg(
        F.sum(F.col("d2").cast(PDEC)).cast("double").alias("i")
    ).first()["i"]
    return {
        "assignments": final,
        "centroids": cents,
        "inertia": inertia,
        "n_iter": n_iter,
    }


def kmeans_assign_np(
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy production tier of the assignment step: the K x dim
    centroid matrix is broadcast once; each Arrow batch computes ALL K
    squared distances in one matmul (|a|^2 + |c|^2 - 2 a.c) and argmins
    locally — no per-component explode, no K-way row inflation, no
    shuffle at all. Ties break to the smallest centroid id (centroids
    sorted, argmin returns the first minimum), matching the exact tier.

    Same twin-tier contract as dedup/similarity: THIS is what bench/
    production runs; plans/ml.py kmeans_assign is the decimal-exact
    oracle it is tested against (the matmul expansion can dip epsilon
    negative on near-zero distances — clipped at 0).
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    ordered = sorted(cents)
    cids = np.array([c for c, _ in ordered], dtype="int64")
    cmat = np.stack([np.asarray(v, dtype="float64") for _, v in ordered])
    b = spark.sparkContext.broadcast((cids, cmat))

    def assign(batches):
        bc_ids, bc_mat = b.value
        csq = (bc_mat**2).sum(axis=1)
        for pdf in batches:
            a = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            d2 = (a**2).sum(axis=1)[:, None] + csq[None, :] - 2.0 * (a @ bc_mat.T)
            np.clip(d2, 0.0, None, out=d2)
            j = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cid": bc_ids[j],
                    "d2": d2[np.arange(len(j)), j],
                }
            )

    return vectors.mapInPandas(assign, schema=f"{id_col} long, cid long, d2 double")
