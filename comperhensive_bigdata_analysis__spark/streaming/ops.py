"""Streaming operators over an events stream (event_id, ts, user_id,
event_type, value, props).

Every operator is expressed on an unbounded DataFrame, so the SAME
transformations run on a batch frame for testing (stream-batch parity
is the test strategy: run both, compare). Watermarks bound state; at
cluster scale the shuffle keys are (window, group) pairs and state
store size is O(open windows x groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the events stream (matches the corpus events table with a
#: plain timestamp — file streams re-read through this schema).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(directory)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event counts per type, late data bounded by the
    watermark. State per (window, event_type) only.

    NULL-event-time contract (r12, tests/test_streaming_degenerate.py,
    applies to every windowed op in this module): rows with a NULL
    ``ts`` are EXCLUDED from windowed aggregates — Spark's window()
    is generator-shaped and produces no bucket for a NULL input, in
    batch and streaming alike (NULL grouping KEYS like event_type
    group normally). A census that must account for every row counts
    NULL-ts rows separately before windowing; ``streaming_dedup``
    retains them (dropDuplicates needs no event time)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sliding_value_sums(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window value sums — each event lands in window/slide
    buckets; Spark expands them without a UDF."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "value_sum",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based). State is one open session
    per user; the watermark closes sessions."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich each event with a (small) dimension
    frame. The static side is broadcast to every micro-batch — no
    stream-side state, no watermark needed, and the dimension is re-read
    per batch so slowly-changing dims pick up updates. This is the
    standard pattern for attaching user/tenant/source attributes to an
    event stream before windowed aggregation; keys absent from the dim
    pass through with nulls (left join) so late dimension rows never
    drop events."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, "left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_type: str = "click",
    right_type: str = "purchase",
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: pair each purchase with the same
    user's clicks in the preceding ``horizon_minutes``. Both sides carry
    watermarks and the join predicate bounds event-time distance, so
    Spark can size the join state and expire rows — an UNBOUNDED
    stream-stream join would buffer forever; the time bound is what
    makes it shippable. State per key is (rows within horizon+watermark).
    """
    from pyspark.sql import functions as F

    lt = (
        left.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            F.col(key).alias("l_key"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    rt = (
        right.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("right_id"),
            F.col(key).alias("r_key"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES"))
    )
    return lt.join(rt, cond).select(
        "left_id", "right_id", F.col("l_key").alias(key), "l_ts", "r_ts"
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon — the
    streaming analog of exact_dedup. State = seen ids inside the
    watermark window."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id"])


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
    available_now: bool = False,
):
    """File sink: append the stream to a (optionally partitioned)
    parquet table with exactly-once via the checkpoint log. This is the
    production landing path — memory sinks are test-only. Returns the
    StreamingQuery; caller owns awaitTermination.

    At scale: partition by a time-derived column so downstream reads
    prune, and run compaction (sources.layout.compact) behind the
    watermark horizon — streaming appends accrete small files.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_rollup(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Continuously-maintained rollup table: windowed counts/sums land in
    a date-partitioned parquet table, each micro-batch rewriting ONLY the
    partitions it touches (dynamic partition overwrite via foreachBatch).

    This is the streaming analog of a materialized hourly rollup — the
    update-mode aggregation re-emits a window row whenever late data
    (within the watermark) changes it, and the overwrite is keyed by
    date partition, so replays and retries converge to the same table
    (idempotent). Downstream readers see a plain partitioned parquet
    table and prune on `day` like any batch source.

    Scale: state is bounded by (windows in watermark horizon) x
    event_type; each batch's write touches only the partitions with
    changed windows, never the whole table.
    """
    from ..sources.layout import overwrite_partitions

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.to_date("w.start").alias("day"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # Merge-then-overwrite: a micro-batch carries only the CHANGED
        # (window, type) rows of a day, but dynamic overwrite replaces
        # whole day directories — writing the batch alone would drop the
        # day's untouched windows. Keep existing rows the batch doesn't
        # supersede (left_anti on the rollup key), then rewrite the day.
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        keys = ["window_start", "event_type"]
        merged = batch_df
        try:
            existing = spark.read.parquet(out_dir)
            days = [r["day"] for r in batch_df.select("day").distinct().collect()]
            untouched = existing.filter(F.col("day").isin(days)).join(
                batch_df.select(*keys), keys, "left_anti"
            )
            merged = batch_df.unionByName(untouched)
        except Exception:  # first batch: no table yet
            pass
        overwrite_partitions(merged, out_dir, ["day"])

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )


def running_user_totals(events: DataFrame, timeout_duration: str = "30 minutes") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running event
    count + value total per user, emitting an update per micro-batch.

    Demonstrates the arbitrary-state API the reference had no analog
    for; state is a single (count, total) pair per user.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, value_total double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_total": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent in this container (no installs allowed), so the
    TWS tier is import-gated exactly like Prophet/geopandas and the
    applyInPandasWithState tier above stays the always-runnable path."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The transformWithStateInPandas twin of running_user_totals —
    Spark 4's arbitrary-state API (SPARK-49564): typed ValueState
    replaces the single opaque tuple, the processor object owns its
    lifecycle (init/rows/close), and state TTL/timers are first-class
    when needed. Same semantics: per-user running (count, value total),
    one update row per user per micro-batch. Gate on tws_available().
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = "user_id long, n_events long, value_total double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_total": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Bloom-backed streaming dedup — cross-batch, BEYOND the watermark
# horizon. streaming_dedup above holds exact seen-id state only inside
# the watermark window; this operator remembers every content digest
# ever admitted, at constant state size, by maintaining the same
# md5-derived bloom bit-set plans/dedup.py:bloom_filter_probe builds
# (the position scheme is SHARED code: functions/bloom.py — the batch
# and streaming filters cannot de-synchronize). Dedup may drop a
# false-positive row at the filter's documented FP rate — the standard
# trade for unbounded-horizon dedup at 100 TB.
# ---------------------------------------------------------------------------


def streaming_bloom_dedup(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    filter_dir: str,
    dedup_cols: list[str] | None = None,
    slots: int = None,  # default functions/bloom.py:BLOOM_SLOTS
):
    """Admit only first-seen content rows across the whole stream life.

    Per micro-batch (foreachBatch):
      1. digest = md5 of the to_json(struct(dedup_cols)) rendering —
         NULL-safe and delimiter-safe (concat_ws would silently skip
         NULLs and let 'a|b','c' collide with 'a','b|c'); batch-internal
         dups collapse first (keep-any within the batch, deterministic
         via digest).
      2. probe the persisted filter (<= ``slots`` rows of OR'd bit
         slots, broadcast) — rows whose 7 positions are all set are
         dropped as probable-seen. The filter table carries its
         ``slots`` sizing; restarting the stream with a DIFFERENT
         slots value raises instead of silently re-admitting everything
         (the positions are mod slots*63, so old bits would never
         match).
      3. survivors land in ``out_dir/batch_id=N`` via per-directory
         overwrite — replays REWRITE the same directory, and a batch
         directory that already has its _SUCCESS marker is not
         recomputed (the earlier attempt's output is authoritative), so
         a replay after the filter already absorbed this batch's bits
         cannot retro-drop rows.
      4. survivors' bits OR into the filter (collect <= ``slots`` longs
         to the driver — bounded regardless of stream volume) and the
         filter table is rewritten. OR is idempotent, so replayed
         updates converge.

    Scale: filter size is fixed — size it for the expected key
    cardinality (``slots``: m = slots*63 bits; for fp rate p and n keys
    the classic m = -n*ln(p)/ln(2)^2, e.g. n=1e9, p=1e-3 -> ~1.8 GB,
    still a broadcastable table; shard the slot space beyond that).
    Each batch adds one broadcast probe join + one <= ``slots``-row
    write. State never grows with stream history — the property
    watermark-bounded dropDuplicates cannot offer.
    """
    import os as _os
    import shutil as _shutil

    from ..functions.bloom import BLOOM_SEEDS, BLOOM_SLOTS, bloom_positions

    dedup_cols = dedup_cols or ["user_id", "event_type", "value", "props"]
    slots = slots if slots is not None else BLOOM_SLOTS

    def _digest_col():
        return F.md5(
            F.to_json(F.struct(*[F.col(c) for c in dedup_cols])).cast("binary")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = batch_df.withColumn("__digest", _digest_col()).dropDuplicates(
            ["__digest"]
        )
        # Locate the committed filter explicitly instead of catching read
        # errors: a corrupt/unreadable filter must FAIL the batch, never
        # silently reset dedup history (an empty filter re-admits every
        # previously-seen row). ``.old`` is the crash-recovery generation
        # left by an interrupted rewrite below.
        committed = None
        for cand in (filter_dir, filter_dir + ".old"):
            if _os.path.exists(_os.path.join(cand, "_SUCCESS")):
                committed = cand
                break
        if committed is None and _os.path.isdir(filter_dir) and _os.listdir(
            filter_dir
        ):
            raise ValueError(
                f"bloom filter dir {filter_dir} exists but has no _SUCCESS "
                "marker — it was not written by this operator's atomic "
                "rewrite protocol. Refusing to treat it as 'first batch' "
                "(that would silently reset dedup history); repair or "
                "remove the directory."
            )
        if committed is not None:
            filt = spark.read.parquet(committed)
            stored = filt.select(F.min("slots"), F.max("slots")).first()
            if stored[0] is not None and (stored[0] != slots or stored[1] != slots):
                raise ValueError(
                    f"bloom filter at {committed} was built with "
                    f"slots={stored[0]}; restarting with slots={slots} would "
                    "silently re-admit previously-seen rows (positions are "
                    "mod slots*63). Use the original sizing or a fresh "
                    "filter_dir."
                )
            filt = filt.select("slot", "bits")
        else:  # genuinely first batch — empty filter
            filt = spark.createDataFrame([], "slot long, bits long")

        pos = bloom_positions(b, "__digest", slots=slots)
        probe = (
            pos.join(F.broadcast(filt), "slot", "left")
            .select(
                "__digest",
                (
                    (
                        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                            F.col("mask")
                        )
                        != 0
                    ).cast("int")
                ).alias("hit"),
            )
            .groupBy("__digest")
            .agg(F.sum("hit").alias("n_hits"))
        )
        seen = probe.filter(F.col("n_hits") == BLOOM_SEEDS).select("__digest")
        survivors = b.join(seen, "__digest", "left_anti")

        batch_out = _os.path.join(out_dir, f"batch_id={batch_id}")
        if _os.path.exists(_os.path.join(batch_out, "_SUCCESS")):
            # Replay after a committed output write: the landed rows are
            # authoritative (the filter may already carry this batch's
            # bits, which would otherwise retro-drop them here).
            landed = spark.read.parquet(batch_out)
            surv_digests = landed.withColumn("__digest", _digest_col()).select(
                "__digest"
            )
        else:
            survivors.drop("__digest").write.mode("overwrite").parquet(batch_out)
            surv_digests = survivors.select("__digest")

        new_rows = (
            bloom_positions(surv_digests, "__digest", slots=slots)
            .select("slot", F.col("mask").alias("bits"))
            .unionByName(filt)
            .groupBy("slot")
            .agg(F.expr("bit_or(bits)").alias("bits"))
            .collect()  # <= ``slots`` rows — bounded
        )
        # Crash-safe rewrite: write the new generation to a temp dir, then
        # swap via renames. A crash at any point leaves either the old
        # filter at filter_dir or (mid-swap) at filter_dir + ".old", both
        # of which the read path above recovers; history is never lost to
        # a torn overwrite-in-place.
        tmp_dir = filter_dir + f".tmp-{batch_id}"
        old_dir = filter_dir + ".old"
        spark.createDataFrame(
            [(r["slot"], r["bits"], slots) for r in new_rows],
            "slot long, bits long, slots int",
        ).coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        if _os.path.exists(filter_dir):
            # a live generation exists, so any .old is a stale leftover
            _shutil.rmtree(old_dir, ignore_errors=True)
            _os.rename(filter_dir, old_dir)
        _os.rename(tmp_dir, filter_dir)
        _shutil.rmtree(old_dir, ignore_errors=True)

    return (
        events.writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )


def streaming_dsir_score(
    docs: DataFrame,
    model: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str | None = None,
):
    """Score a DOCUMENT stream against a fixed DSIR importance model
    (fit offline with operators/curation.dsir_fit — e.g. last month's
    model scoring this week's crawl as it lands).

    The stream needs NO target column — target membership is a
    fit-time concept; featurize defaults the flag false and scoring
    ignores it (pass ``target_col`` only if the stream happens to
    carry one and you want it preserved in featurization).

    A document's log weight depends only on its OWN hashed features
    plus the 64-row model, so per-micro-batch scoring IS the batch
    semantics — no cross-batch state, no watermark, nothing to expire;
    replayed batches rewrite their own output directory (idempotent,
    same per-directory-overwrite + _SUCCESS contract as
    streaming_bloom_dedup). The model broadcasts into every batch.
    """
    import os as _os

    from ..operators.curation import dsir_featurize, dsir_score

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_out = _os.path.join(out_dir, f"batch_id={batch_id}")
        if _os.path.exists(_os.path.join(batch_out, "_SUCCESS")):
            return  # replay of an already-landed batch
        hashed = dsir_featurize(batch_df, id_col, text_col, target_col)
        dsir_score(hashed, model).write.mode("overwrite").parquet(batch_out)

    return (
        docs.writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
