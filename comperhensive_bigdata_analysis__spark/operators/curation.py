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


# -- ExactSubstr scrub (Lee et al. 2022, production phase) ------------------

ESS_W = 16


def exact_substr_span_table(docs: DataFrame, id_col: str,
                            text_col: str, w: int = ESS_W) -> DataFrame:
    """(doc_id, s, e) maximal corpus-duplicated spans — the census the
    plan ``exact_substr_spans`` aggregates; here exposed per-span so the
    scrubber (and any masking/annotation pass) can consume it.
    Positions are 1-based token indices, inclusive."""
    from ..functions.text import tokens

    tk = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    npos = F.size("t") - F.lit(w - 1)
    windows = F.when(
        npos >= 1,
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(
                    F.concat_ws(" ", F.slice("t", i, w)).cast("binary")
                ).alias("dg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,dg:string>>"))
    sh = tk.select("doc_id", F.explode(windows).alias("x")).select(
        "doc_id", F.col("x.pos").alias("pos"), F.col("x.dg").alias("dg")
    )
    freq = (
        sh.groupBy("dg")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") > 1)
        .select("dg")
    )
    dup = sh.join(freq, "dg").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("pos").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(F.col("pos") <= prev_max + (w - 1), F.lit(0)).otherwise(
        F.lit(1)
    )
    return (
        dup.withColumn("brk", brk)
        .withColumn("g", F.sum("brk").over(w_doc))
        .groupBy("doc_id", "g")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(w - 1)).alias("e"),
        )
        .select("doc_id", "s", "e")
    )


def exact_substr_scrub(docs: DataFrame, id_col: str, text_col: str,
                       w: int = ESS_W) -> DataFrame:
    """Remove every corpus-duplicated span from every document — the
    actual ExactSubstr DEDUP step the census measures. Returns the
    input rows plus ``text_scrubbed`` (original-case tokens outside the
    merged spans, single-space joined; empty string when the whole doc
    is duplicated).

    100 TB: spans collapse to a per-doc array (collect_list — bounded
    by spans per doc, not corpus size) and the token filtering is one
    higher-order expression over the scan; the only exchanges are the
    span pipeline's digest aggregate + the doc_id join."""
    spans = exact_substr_span_table(docs, id_col, text_col, w)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("__spans")
    )
    orig = F.split(F.trim(F.col(text_col)), r"\s+")
    joined = docs.join(
        per_doc, docs[id_col] == per_doc["doc_id"], "left"
    ).drop(per_doc["doc_id"])
    kept = F.expr(
        f"filter(transform(sequence(1, size(split(trim({text_col}), "
        f"'\\\\s+'))), i -> i), i -> __spans IS NULL OR NOT exists("
        f"__spans, p -> i >= p.s AND i <= p.e))"
    )
    scrubbed = F.when(F.length(F.trim(text_col)) == 0, F.lit("")).otherwise(
        F.concat_ws(
            " ",
            F.transform(kept, lambda i: F.element_at(orig, i)),
        )
    )
    return joined.withColumn("text_scrubbed", scrubbed).drop("__spans")
