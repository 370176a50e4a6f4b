"""Stream-batch parity tests: run each streaming operator over a file
stream (availableNow trigger -> memory sink) and compare with the same
transformation applied to the batch frame."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from comperhensive_bigdata_analysis__spark.sources.tables import load_table
from comperhensive_bigdata_analysis__spark.streaming import ops


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events table re-written as plain-timestamp parquet in a tmp dir
    (the corpus file uses TIMESTAMP(NANOS), which the streaming file
    source can't schema-read)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    e.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _batch_events(spark, stream_dir):
    return spark.read.schema(ops.EVENTS_SCHEMA).parquet(stream_dir)


def test_tumbling_counts_parity(spark, stream_dir):
    stream = ops.events_stream(spark, stream_dir)
    # complete mode: emit every window at the final trigger (append mode
    # would rightly hold back windows still open under the watermark).
    got = _run_stream(
        spark, ops.tumbling_counts(stream), f"t_{uuid.uuid4().hex[:8]}", "complete"
    )
    want = ops.tumbling_counts(_batch_events(spark, stream_dir))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_sliding_sums_parity(spark, stream_dir):
    stream = ops.events_stream(spark, stream_dir)
    got = _run_stream(
        spark, ops.sliding_value_sums(stream), f"s_{uuid.uuid4().hex[:8]}", "complete"
    )
    want = ops.sliding_value_sums(_batch_events(spark, stream_dir))
    g = {(r[0], r[1]): r[2] for r in got.collect()}
    w = {(r[0], r[1]): r[2] for r in want.collect()}
    assert set(g) == set(w)
    for k in g:
        assert abs(g[k] - w[k]) < 1e-6


def test_session_windows_parity(spark, stream_dir):
    stream = ops.events_stream(spark, stream_dir)
    got = _run_stream(
        spark, ops.session_windows(stream), f"w_{uuid.uuid4().hex[:8]}", "complete"
    )
    want = ops.session_windows(_batch_events(spark, stream_dir))
    assert got.count() == want.count()
    g = sorted((r["user_id"], r["n_events"]) for r in got.collect())
    w = sorted((r["user_id"], r["n_events"]) for r in want.collect())
    assert g == w


def test_stream_static_enrich_parity(spark, stream_dir):
    """Stream-static left join == the same join on the batch frame;
    events with keys outside the dim survive with nulls."""
    dim = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier_"), (F.col("id") % 3).cast("string")).alias("tier"),
    )
    out = _run_stream(
        spark,
        ops.stream_static_enrich(
            ops.events_stream(spark, stream_dir), dim
        ).select("event_id", "user_id", "tier"),
        f"enrich_{uuid.uuid4().hex[:8]}",
    )
    got = {(r["event_id"], r["tier"]) for r in out.collect()}
    want = {
        (r["event_id"], r["tier"])
        for r in ops.stream_static_enrich(_batch_events(spark, stream_dir), dim)
        .select("event_id", "tier")
        .collect()
    }
    assert got == want
    n_events = _batch_events(spark, stream_dir).count()
    assert len(got) == n_events  # left join: nothing dropped


def test_streaming_dedup(spark, stream_dir, tmp_path):
    # Duplicate every file so the stream sees each event twice.
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    for f in os.listdir(stream_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stream_dir, f), os.path.join(dup_dir, f))
            shutil.copy(os.path.join(stream_dir, f), os.path.join(dup_dir, "dup_" + f))
    stream = ops.events_stream(spark, dup_dir)
    got = _run_stream(spark, ops.streaming_dedup(stream), f"d_{uuid.uuid4().hex[:8]}")
    n_unique = _batch_events(spark, stream_dir).select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_unique
    assert got.count() == n_unique


def test_stream_to_parquet_sink(spark, stream_dir, tmp_path):
    """File sink lands the stream exactly-once into partitioned parquet."""
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    stream = ops.events_stream(spark, stream_dir).withColumn(
        "day", F.col("ts").cast("date")
    )
    q = ops.stream_to_parquet(
        stream, out, ckpt, partition_cols=["day"], available_now=True
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out)
    src = _batch_events(spark, stream_dir)
    assert landed.count() == src.count()
    assert os.path.isdir(ckpt)
    # restart with no new data: checkpoint prevents re-landing
    q2 = ops.stream_to_parquet(
        ops.events_stream(spark, stream_dir).withColumn(
            "day", F.col("ts").cast("date")
        ),
        out,
        ckpt,
        partition_cols=["day"],
        available_now=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == src.count()


def test_stream_stream_join_parity(spark, stream_dir):
    """Watermarked stream-stream interval join (clicks -> purchases
    within 60 min) emits exactly the batch join's pairs."""
    s = ops.stream_stream_join(
        ops.events_stream(spark, stream_dir), ops.events_stream(spark, stream_dir)
    )
    out = _run_stream(spark, s, f"ssj_{uuid.uuid4().hex[:8]}")
    got = {(r["left_id"], r["right_id"]) for r in out.collect()}
    b = _batch_events(spark, stream_dir)
    want = {
        (r["left_id"], r["right_id"])
        for r in ops.stream_stream_join(b, b).collect()
    }
    assert got == want
    assert len(want) > 0  # fixture actually exercises the join


def test_incremental_rollup_matches_batch(spark, stream_dir, tmp_path):
    """The continuously-maintained rollup table equals the one-shot
    batch rollup over the same data — and a REPLAY (fresh checkpoint,
    same input) converges to the identical table (idempotence)."""
    out = str(tmp_path / "rollup")

    def run(cp):
        q = ops.incremental_rollup(
            ops.events_stream(spark, stream_dir),
            out_dir=out,
            checkpoint_dir=str(tmp_path / cp),
        ).trigger(availableNow=True).start()
        q.awaitTermination(180)

    run("cp1")
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["value_sum"])
        for r in _batch_events(spark, stream_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
        .collect()
    }

    def table():
        return {
            (str(r["window_start"]), r["event_type"]): (r["n_events"], r["value_sum"])
            for r in spark.read.parquet(out).collect()
        }

    got = table()
    assert got.keys() == want.keys()
    assert all(got[k][0] == want[k][0] for k in want)
    assert all(abs(got[k][1] - want[k][1]) < 1e-6 for k in want)

    run("cp2")  # replay from scratch -> same table, no dupes, no loss
    assert table().keys() == want.keys()


def test_running_user_totals(spark, stream_dir):
    stream = ops.events_stream(spark, stream_dir)
    got = _run_stream(
        spark,
        ops.running_user_totals(stream),
        f"u_{uuid.uuid4().hex[:8]}",
        output_mode="update",
    )
    # Last update per user must equal the batch totals.
    batch = (
        _batch_events(spark, stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    rows = got.collect()
    last = {}
    for r in rows:  # memory sink appends per micro-batch; keep the max-count row
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            last[r["user_id"]] = (r["n_events"], r["value_total"])
    assert set(last) == set(want)
    for u in want:
        assert last[u][0] == want[u][0]
        assert abs(last[u][1] - want[u][1]) < 1e-6


def test_running_user_totals_tws_matches_batch(spark, stream_dir):
    """The transformWithStateInPandas tier agrees with the batch rollup
    (same contract as the applyInPandasWithState tier)."""
    import pytest

    if not ops.tws_available():
        pytest.skip("transformWithStateInPandas needs protobuf (absent here)")
    stream = ops.events_stream(spark, stream_dir)
    got = _run_stream(
        spark,
        ops.running_user_totals_tws(stream),
        f"u_{uuid.uuid4().hex[:8]}",
        output_mode="update",
    )
    batch = (
        _batch_events(spark, stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    last = {}
    for r in got.collect():
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            last[r["user_id"]] = (r["n_events"], r["value_total"])
    assert set(last) == set(want)
    for u in want:
        assert last[u][0] == want[u][0]
        assert abs(last[u][1] - want[u][1]) < 1e-6


def test_streaming_bloom_dedup(spark, stream_dir, tmp_path):
    """Cross-batch bloom dedup over REAL multiple micro-batches: (a) no
    duplicate content digest is admitted, (b) the filter is sized for
    the corpus (256 slots ~ 16k bits for ~1k keys), so false-positive
    drops stay under 1%, (c) filter state stays <= slots rows. The
    corpus and hashes are fixed, so every assertion is deterministic."""
    import os

    # Re-write the fixture as 4 real files (the shared fixture's
    # coalesce(2) on a single-file source yields ONE file, which
    # availableNow would swallow in one batch — no cross-batch probing).
    multi = str(tmp_path / "events_multi")
    _batch_events(spark, stream_dir).repartition(4).write.mode(
        "overwrite"
    ).parquet(multi)
    out = str(tmp_path / "bloom_out")
    ckpt = str(tmp_path / "bloom_ckpt")
    filt = str(tmp_path / "bloom_filter")
    src = (
        spark.readStream.schema(ops.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(multi)
    )
    q = ops.streaming_bloom_dedup(src, out, ckpt, filt, slots=256).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert len(batch_dirs) >= 2, "stream collapsed into one micro-batch"

    cols = ["user_id", "event_type", "value", "props"]
    digest = F.md5(
        F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary")
    )
    admitted = spark.read.parquet(out).withColumn("__d", digest)
    batch = _batch_events(spark, stream_dir).withColumn("__d", digest)

    n_admitted = admitted.count()
    n_distinct_admitted = admitted.select("__d").distinct().count()
    n_distinct_input = batch.select("__d").distinct().count()
    assert n_admitted == n_distinct_admitted, "duplicate content admitted"
    assert n_distinct_admitted <= n_distinct_input
    assert n_distinct_admitted >= 0.99 * n_distinct_input, (
        f"bloom dropped {n_distinct_input - n_distinct_admitted} of "
        f"{n_distinct_input} — filter undersized"
    )
    filt_rows = spark.read.parquet(filt).collect()
    assert 0 < len(filt_rows) <= 256


def test_streaming_bloom_foreign_filter_dir_raises(spark, stream_dir, tmp_path):
    """A filter_dir that exists with content but NO _SUCCESS marker was
    not written by the operator's atomic-rename protocol — the batch
    must FAIL instead of treating it as 'first batch' (which would
    silently reset dedup history; ADVICE r3/r4)."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    out = str(tmp_path / "bloom_out")
    ckpt = str(tmp_path / "bloom_ckpt")
    filt = str(tmp_path / "bloom_filter")
    os.makedirs(filt)
    with open(os.path.join(filt, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    src = (
        spark.readStream.schema(ops.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = ops.streaming_bloom_dedup(src, out, ckpt, filt, slots=256).trigger(
        availableNow=True
    ).start()
    with pytest.raises(StreamingQueryException, match="_SUCCESS"):
        q.awaitTermination(120)


def test_streaming_bloom_old_generation_recovery(spark, stream_dir, tmp_path):
    """Crash-recovery: if a rewrite died mid-swap (filter renamed to
    ``.old``, new generation not yet promoted), the next run reads the
    ``.old`` generation — dedup history survives, so replaying the same
    corpus admits (almost) nothing and re-promotes a live filter dir."""
    import os

    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    filt = str(tmp_path / "bloom_filter")

    def run(out, ckpt):
        src = (
            spark.readStream.schema(ops.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = ops.streaming_bloom_dedup(
            src, out, str(tmp_path / ckpt), filt, slots=256
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run(out1, "ckpt1")
    n_first = spark.read.parquet(out1).count()
    assert n_first > 0

    # simulate the mid-swap crash window: live generation at .old only
    os.rename(filt, filt + ".old")
    run(out2, "ckpt2")

    batch2 = [d for d in os.listdir(out2) if d.startswith("batch_id=")]
    n_second = sum(
        spark.read.parquet(os.path.join(out2, d)).count() for d in batch2
    ) if batch2 else 0
    assert n_second == 0, (
        f"replay admitted {n_second} rows — .old generation was not read, "
        "dedup history silently reset"
    )
    # the rewrite re-promoted a live committed filter and cleaned up .old
    assert os.path.exists(os.path.join(filt, "_SUCCESS"))
    assert not os.path.exists(filt + ".old")



def test_streaming_dsir_score_matches_batch(spark, sf_dir, tmp_path):
    """Stream-batch parity for DSIR scoring: a fixed model fit offline
    scores a document stream micro-batch by micro-batch; the landed
    per-doc weights must equal scoring the same corpus in one batch
    (per-doc weights are state-free, so the equality is exact). The
    STREAM carries no target column — scoring must not require one."""
    from pyspark.sql import functions as F

    from comperhensive_bigdata_analysis__spark.operators.curation import (
        dsir_featurize,
        dsir_fit,
        dsir_score,
    )
    from comperhensive_bigdata_analysis__spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fit_hashed = dsir_featurize(
        docs.withColumn("is_en", F.col("lang") == "en"),
        "doc_id", "text", "is_en",
    )
    model = dsir_fit(fit_hashed)
    want = {
        r["doc_id"]: (r["n_feats"], r["dsir_logw"])
        for r in dsir_score(fit_hashed, model).collect()
    }

    src_dir = str(tmp_path / "docs_src")
    # the crawl stream: id + text only, no target flag
    docs.select("doc_id", "text").repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "scored")
    q = (
        ops.streaming_dsir_score(
            stream, model, out, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logw"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
