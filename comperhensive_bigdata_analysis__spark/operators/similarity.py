"""Similarity search over embedding columns (array<float>).

Two implementations of nearest-neighbor:

- brute_force_knn: the exact baseline. Query vectors are broadcast; each
  partition scores its rows with a single codegen'd fold expression
  (functions.vectors.dot_product) — no shuffle until the final top-k,
  which Spark executes as TakeOrderedAndProject (per-partition heaps +
  driver merge of k rows, never a global sort).
- cosine_pairs_above: exact all-pairs above a threshold. Quadratic —
  kept as the oracle baseline; at scale use lsh_bucket_pairs (random
  hyperplane signs -> candidate buckets), which turns all-pairs into an
  equality join exactly like MinHash banding does for text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot_product, l2_norm


def brute_force_knn(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding). Small (broadcast); the scan side
    streams. Returns (query_id, vec_id, cosine, rank) with rank 1..k.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        vectors.join(F.broadcast(q), F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs_above(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (embedding near-dup dedup).

    Norms are precomputed once per row before the self-join so the join
    condition is a single fold per candidate pair.
    """
    normed = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = normed.alias("a"), normed.alias("b")
    cos = dot_product(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _normalized_matrix(vectors: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, unit-row matrix) of the whole vector set.

    Only valid when the vector set fits on the driver (bench/test scale,
    or the candidate side of an LSH bucket). numpy float64 throughout.
    """
    import numpy as np

    pdf = vectors.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def brute_force_knn_np(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Arrow/numpy tier of brute_force_knn: broadcast the (small)
    normalized query matrix; each partition computes one blocked matmul
    per Arrow batch and emits its local top-k, merged by a final global
    top-k. This is the production brute-force path — vectorized math,
    one pass over the scan side, k·q rows shuffled per partition."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    qids, qmat = _normalized_matrix(queries, query_id_col, vec_col)
    b_q = spark.sparkContext.broadcast((qids, qmat))

    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def score(batches):
        qi, qm = b_q.value
        for pdf in batches:
            a = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            nrm = np.linalg.norm(a, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (a / nrm) @ qm.T  # (batch, n_queries)
            ids = pdf[id_col].to_numpy()
            for j, qid in enumerate(qi):
                col = sims[:, j]
                mask = ids != qid
                take = min(k, int(mask.sum()))
                idx = np.argpartition(-col[mask], take - 1)[:take]
                yield pd.DataFrame(
                    {
                        query_id_col: qid,
                        id_col: ids[mask][idx],
                        "cosine": col[mask][idx],
                    }
                )

    from pyspark.sql.window import Window

    local = vectors.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_pairs_above_np(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Arrow/numpy tier of cosine_pairs_above: the full normalized matrix
    is broadcast once; each partition matmuls its Arrow batches against
    it and emits only above-threshold pairs with id_a < id_b.

    Valid while the matrix fits in executor memory (~1e7 x 64 doubles =
    5 GB); beyond that, bucket first (lsh_bucket_pairs) and run this
    inside buckets."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    ids, mat = _normalized_matrix(vectors, id_col, vec_col)
    b_all = spark.sparkContext.broadcast((ids, mat))

    def pairs(batches):
        all_ids, all_mat = b_all.value
        for pdf in batches:
            a = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            nrm = np.linalg.norm(a, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (a / nrm) @ all_mat.T
            ids_a = pdf[id_col].to_numpy()
            ii, jj = np.nonzero(
                (sims >= threshold) & (ids_a[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ii],
                    "id_b": all_ids[jj],
                    "cosine": sims[ii, jj],
                }
            )

    return vectors.mapInPandas(pairs, schema="id_a long, id_b long, cosine double")


def lsh_bucket_pairs(
    vectors: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Random-hyperplane LSH candidate pairs, then exact rescoring.

    Bucket key = sign bits of dot(v, h_j) for the given hyperplanes
    (caller supplies deterministic hyperplanes — e.g. seeded numpy on
    the driver). All-pairs becomes an equality join on the bucket key;
    survivors are rescored exactly, so the result is a subset of
    cosine_pairs_above limited to same-bucket candidates.
    """
    sign_bits = F.concat_ws(
        "",
        *[
            F.when(dot_product(F.col(vec_col), F.array(*[F.lit(float(x)) for x in h])) >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for h in hyperplanes
        ],
    )
    bucketed = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        sign_bits.alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = dot_product(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
