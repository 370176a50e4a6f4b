"""The corpus inflater (sources/inflate.py) must preserve the exact
semantics the probe/bench tiers rely on: row counts multiply, key
spaces stay disjoint between copies, and the lineitem->orders join
chain survives inflation (each customer's revenue exactly doubles at
2x, because decimal sums are exact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark import plans
from comperhensive_bigdata_analysis__spark.sources.inflate import (
    PASSTHROUGH,
    STRIDE,
    inflate_corpus,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


@pytest.fixture(scope="module")
def inflated(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inflate") / "x2")
    inflate_corpus(spark, sf_dir, out, 2, passthrough=PASSTHROUGH)
    return out


def test_row_counts_multiply_and_keys_disjoint(spark, sf_dir, inflated):
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")):
        base = load_table(spark, sf_dir, t)
        big = load_table(spark, inflated, t)
        assert big.count() == 2 * base.count()
        lo = big.filter(F.col(key) < STRIDE)
        hi = big.filter(F.col(key) >= STRIDE)
        assert lo.count() == hi.count() == base.count()


def test_join_chain_survives_inflation(spark, sf_dir, inflated):
    """revenue_by_nation on the 2x corpus: same nations, each revenue
    exactly double (decimal-exact aggregation makes this an equality,
    not an approximation)."""
    base = {r[0]: r[1] for r in plans.QUERIES["revenue_by_nation"](spark, sf_dir).collect()}
    big = {r[0]: r[1] for r in plans.QUERIES["revenue_by_nation"](spark, inflated).collect()}
    assert set(base) == set(big)
    for nation, rev in base.items():
        assert big[nation] == pytest.approx(2 * rev, abs=1e-6), nation


def test_documents_vocabulary_disjoint(spark, sf_dir, inflated):
    """Copy 1's vowel permutation must produce new shingles: the 8-gram
    sets of the two copies share (essentially) nothing, so dedup/
    contamination fan-out scales like real growth."""
    from comperhensive_bigdata_analysis__spark.functions.text import word_shingles

    d = load_table(spark, inflated, "documents")
    grams = d.select(
        (F.col("doc_id") >= STRIDE).alias("copy"),
        F.explode(word_shingles(F.col("text"), 3)).alias("g"),
    )
    overlap = (
        grams.filter("copy").select("g").distinct()
        .join(grams.filter("NOT copy").select("g").distinct(), "g")
        .count()
    )
    total = grams.select("g").distinct().count()
    assert overlap < 0.02 * total, (overlap, total)
