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
