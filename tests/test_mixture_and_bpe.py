"""Invariant tests for the round-8 mixture/tokenizer plans: UniMax
water-filling conservation + cap semantics, and the BPE merge loop's
left-to-right fold on a planted vocabulary."""

from __future__ import annotations

from comperhensive_bigdata_analysis__spark import plans


def test_unimax_waterfill_invariants(spark, sf_dir):
    from comperhensive_bigdata_analysis__spark.plans.training import (
        UNIMAX_EPOCH_CAP,
    )

    rows = plans.QUERIES["unimax_language_budget"](spark, sf_dir).collect()
    total = sum(r["capacity_tokens"] for r in rows)
    budget = (total * 3) // 2
    alloc = sum(r["alloc_tokens"] for r in rows)
    # conservation: never over budget; floor losses only
    assert alloc <= budget
    assert budget - alloc < len(rows) * 2
    for r in rows:
        assert r["cap_tokens"] == r["capacity_tokens"] * UNIMAX_EPOCH_CAP
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        assert r["epochs"] <= UNIMAX_EPOCH_CAP
    # a budget of 1.5x total with cap 2x must cap at least one small
    # language AND leave at least one uncapped (both branches live)
    capped = [r for r in rows if r["alloc_tokens"] == r["cap_tokens"]]
    assert capped and len(capped) < len(rows)


def test_bpe_merge_loop_planted_vocabulary(spark, tmp_path):
    """Corpus engineered so the four merges are forced in a known
    order, including the overlapping-run case: counting is canonical
    Sennrich get_stats (every adjacent position — 'aaaa' has THREE
    (a,a) positions) while the merge is non-overlapping left-to-right
    ('aaaa' -> [aa, aa], so round 3 sees (aa,aa) x40)."""
    rows = []
    did = 0
    for word, n in (("aaaa", 40), ("bcbc", 30), ("dde", 20)):
        for _ in range(n):
            rows.append((did, word, "en", "s", len(word)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in plans.QUERIES["bpe_merge_loop"](spark, str(tmp_path)).collect()
    ]
    # round 1: (a,a) counts 3 positions per 'aaaa' word = 120;
    #   (b,c) = 60, (c,b) = 30, (d,d) = 20, (d,e) = 20
    # round 2 (aaaa -> [aa,aa], non-overlap): (aa,aa) = 40 vs (b,c) 60
    # round 3 (bcbc -> [bc,bc]): (bc,bc) = 30 vs (aa,aa) 40 -> (aa,aa)
    # round 4: (bc,bc) = 30 wins over (d,d)/(d,e) = 20
    assert got == [
        (1, "a", "a", 120),
        (2, "b", "c", 60),
        (3, "aa", "aa", 40),
        (4, "bc", "bc", 30),
    ]


def test_bpe_fertility_tracks_merge_table(spark, sf_dir):
    """Applying M merges can only shrink unit counts, never below one
    unit per word; and a language's fertility must drop vs the
    char-level baseline whenever any learned merge occurs in it."""
    from pyspark.sql import functions as F

    from comperhensive_bigdata_analysis__spark.plans.training import (
        _bpe_words,
    )
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    rows = plans.QUERIES["bpe_fertility_census"](spark, sf_dir).collect()
    assert rows, "census empty"
    d = load_table(spark, sf_dir, "documents")
    base = {
        r["lang"]: (r["nw"], r["nc"])
        for r in _bpe_words(d, F.col("lang"))
        .groupBy("lang")
        .agg(
            F.sum("freq").alias("nw"),
            F.sum(F.col("freq") * F.size("units")).alias("nc"),
        )
        .collect()
    }
    for r in rows:
        nw, nc = base[r["lang"]]
        assert r["n_words"] == nw  # application never drops words
        assert nw <= r["n_units"] <= nc  # merges only shrink, floor 1/word
        assert 1.0 <= r["units_per_word"] <= nc / nw


def test_unimax_null_text_language_degrades_to_zero(spark, tmp_path):
    """ADVICE r8: a language whose documents are ALL NULL-text used to
    TypeError on int(None) while the DuckDB oracle degraded to NULL
    rows. Both engines must now agree on capacity 0 for that language
    (COALESCE on both sides)."""
    import duckdb

    from comperhensive_bigdata_analysis__spark import plans

    rows = [(1, None, "xx", "s", 0), (2, None, "xx", "s", 0)]
    rows += [(10 + i, "alpha beta gamma", "en", "s", 16) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["lang"]: r
        for r in plans.QUERIES["unimax_language_budget"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["xx"]["capacity_tokens"] == 0
    assert got["xx"]["alloc_tokens"] == 0
    assert got["xx"]["epochs"] == 0.0
    assert got["en"]["capacity_tokens"] == 15
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}/*.parquet'"
    )
    oracle = {
        r[0]: r
        for r in con.execute(plans.ORACLES["unimax_language_budget"]).fetchall()
    }
    con.close()
    assert oracle["xx"][1] == 0 and oracle["xx"][3] == 0
    assert oracle["en"][1] == 15
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in oracle.items()
    }
