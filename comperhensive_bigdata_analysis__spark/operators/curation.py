"""Reusable training-data curation operators.

The DSIR flow (Xie et al. 2023) split into its production phases:
``dsir_featurize`` turns documents into hashed n-gram bucket counts,
``dsir_fit`` learns the 64-bucket smoothed log-ratio model (a tiny DF
the caller can persist and reuse across ingest batches), and
``dsir_score`` weights any batch of featurized documents against a
fixed model — the fit-once / score-increments shape a real pipeline
runs, where the model from last month's fit scores this week's crawl.

The oracle-checked plan ``plans.training.dsir_importance_weights``
composes fit+score over one corpus; the incremental contract is pinned
by tests/test_training_plans.py.

100 TB: featurize is scan-side (explode + md5 — whole-stage codegen);
fit is one map-side-combined 64-group aggregate; score joins the
64-row broadcast model onto map-side-combined (doc, bucket) partials.
Nothing data-sized is ever broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Feature-hash width shared by fit and score — a model is only valid
#: for features hashed at the same width.
DSIR_BUCKETS = 64

_BIGRAMS = (
    "CASE WHEN size(t) >= 2 THEN "
    "transform(sequence(2, size(t)), "
    "i -> concat(element_at(t, i - 1), ' ', element_at(t, i))) "
    "ELSE array() END"
)


def dsir_featurize(docs: DataFrame, id_col: str, text_col: str,
                   target_col: str) -> DataFrame:
    """(id, target_flag, bucket) — one row per unigram+bigram feature,
    md5-hashed into DSIR_BUCKETS buckets. ``target_col`` must be a
    boolean column marking target-domain rows (used by fit; carried
    through so one featurize pass serves both phases)."""
    from ..functions.text import tokens

    t = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.col(target_col).alias("is_target"),
        tokens(F.col(text_col)).alias("t"),
    )
    feats = t.select(
        "doc_id", "is_target",
        F.explode(F.concat(F.col("t"), F.expr(_BIGRAMS))).alias("f"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % DSIR_BUCKETS
    )
    return feats.select("doc_id", "is_target", bucket.alias("bucket"))


def dsir_fit(hashed: DataFrame) -> DataFrame:
    """Learn the Laplace-smoothed per-bucket log importance ratio from a
    featurized relation: ln(p_target(bucket) / p_raw(bucket)). Returns
    the DSIR_BUCKETS-row (bucket, logr) model — persist it to reuse
    across batches."""
    model = hashed.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.lit(1)).otherwise(F.lit(0))).alias(
            "p_cnt"
        ),
        F.count(F.lit(1)).alias("q_cnt"),
    )
    w_all = Window.partitionBy()
    b = F.lit(DSIR_BUCKETS)
    return model.select(
        "bucket",
        F.log(
            ((F.col("p_cnt") + F.lit(1.0)) / (F.sum("p_cnt").over(w_all) + b))
            / ((F.col("q_cnt") + F.lit(1.0)) / (F.sum("q_cnt").over(w_all) + b))
        ).alias("logr"),
    )


def dsir_score(hashed: DataFrame, model: DataFrame) -> DataFrame:
    """Score a featurized batch against a fixed model: per doc,
    n_feats and the DECIMAL-damped log importance weight (same float
    discipline as the oracle plan)."""
    doc_tf = hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    contrib = (F.col("tf") * F.col("logr")).cast("decimal(28,12)")
    return (
        doc_tf.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_feats"),
            (F.floor(F.sum(contrib).cast("double") * 1e6) / 1e6).alias(
                "dsir_logw"
            ),
        )
    )
