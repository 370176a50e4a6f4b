"""Similarity-search plans over ``embeddings`` (array<float>, 64-dim).

Oracle determinism: float dot products are order-dependent, and Spark's
fold order differs from DuckDB's list internals. The oracle-checked
plans therefore compute dot products the EXACT way — posexplode the
vectors, multiply per position in double (IEEE-deterministic per row),
cast each product to DECIMAL(28,12) and sum (order-insensitive). The
fast fold-based operators (operators/similarity.py) are what bench.py
exercises; tests assert the two tiers agree to 1e-9.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import plan

PDEC = "decimal(28,12)"


def _exploded(df):
    """(vec_id, pos, x): one row per vector component, double-typed."""
    return df.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))


# ---------------------------------------------------------------------------
# Exact brute-force top-10 cosine neighbors of vec_id = 0.
# ---------------------------------------------------------------------------

_KNN_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    q AS (SELECT pos, x AS qx FROM v WHERE vec_id = 0),
    d AS (
      SELECT v.vec_id,
             CAST(SUM(CAST(v.x * q.qx AS DECIMAL(28,12))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(v.x * v.x  AS DECIMAL(28,12))) AS DOUBLE) AS sq
      FROM v JOIN q USING (pos)
      WHERE v.vec_id <> 0
      GROUP BY v.vec_id
    ),
    qn AS (SELECT CAST(SUM(CAST(qx * qx AS DECIMAL(28,12))) AS DOUBLE) AS qsq FROM q)
    SELECT vec_id, ROUND(dot / (sqrt(sq) * sqrt(qsq)), 6) AS cosine
    FROM d, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
"""


@plan("knn_bruteforce", _KNN_ORACLE)
def knn_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    v = _exploded(e)
    q = v.filter(F.col("vec_id") == 0).select("pos", F.col("x").alias("qx"))
    d = (
        v.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("x") * F.col("qx")).cast(PDEC)).cast("double").alias("dot"),
            F.sum((F.col("x") * F.col("x")).cast(PDEC)).cast("double").alias("sq"),
        )
    )
    qn = q.agg(F.sum((F.col("qx") * F.col("qx")).cast(PDEC)).cast("double").alias("qsq"))
    return (
        d.crossJoin(F.broadcast(qn))
        .select(
            "vec_id",
            F.round(F.col("dot") / (F.sqrt("sq") * F.sqrt("qsq")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Exact all-pairs cosine >= 0.35 — embedding near-dup detection.
# The exploded pair join is the exact/oracle tier; the fold-based
# cosine_pairs_above + LSH bucketing is the production tier.
# ---------------------------------------------------------------------------

_PAIRS_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    nrm AS (
      SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sq
      FROM v GROUP BY vec_id
    ),
    d AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dot
      FROM v a JOIN v b ON a.pos = b.pos AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(dot / (sqrt(x.sq) * sqrt(y.sq)), 6) AS cosine
    FROM d JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
    WHERE dot / (sqrt(x.sq) * sqrt(y.sq)) >= 0.35
    ORDER BY id_a, id_b
"""


@plan("embedding_near_dup", _PAIRS_ORACLE)
def embedding_near_dup(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    v = _exploded(e)
    nrm = v.groupBy("vec_id").agg(
        F.sum((F.col("x") * F.col("x")).cast(PDEC)).cast("double").alias("sq")
    )
    a, b = v.alias("a"), v.alias("b")
    d = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .agg(F.sum((F.col("a.x") * F.col("b.x")).cast(PDEC)).cast("double").alias("dot"))
    )
    nx = nrm.select(F.col("vec_id").alias("id_a"), F.col("sq").alias("sq_a"))
    ny = nrm.select(F.col("vec_id").alias("id_b"), F.col("sq").alias("sq_b"))
    cos = F.col("dot") / (F.sqrt("sq_a") * F.sqrt("sq_b"))
    return (
        d.join(F.broadcast(nx), "id_a")
        .join(F.broadcast(ny), "id_b")
        .filter(cos >= 0.35)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )
