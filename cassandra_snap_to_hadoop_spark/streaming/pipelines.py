"""Structured Streaming pipelines (SURVEY §2-K, §5.6).

Each builder takes a *streaming* DataFrame (``readStream`` file source over
micro-batch shards) and returns the streaming aggregation whose complete
output must equal the batch declaration in ``queries/streaming_sem.py`` —
the engine's batch/stream parity contract, asserted by
tests/test_streaming_parity.py.

Scale notes: all stateful operators carry a watermark so state is bounded
(without one, window state grows forever); file-source ingestion uses
``maxFilesPerTrigger`` for backpressure.  In production the file source
swaps for Kafka without touching the transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.queries._util import qsum

_FMT = "yyyy-MM-dd HH:mm"

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, shard_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """A5/K7 ingestion edge: incremental file-source read of event shards
    (arrival order = file order; late rows live in later files)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(shard_dir)
    )


def k1_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """K1 streaming twin: watermarked tumbling-window counts/sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), qsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def k12_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """K12 streaming twin: the STATEFUL half of windowed top-k — per-day
    windowed counts.  The rank is applied downstream on each emitted
    (tiny) per-window aggregate, because a rank over a complete-mode
    aggregate is deterministic per emission while a rank inside the
    streaming plan is not an incrementalizable operator; see
    tests/test_streaming_parity.py::test_k12_stream_topk_parity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n",
        )
    )


def k2_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """K2 streaming twin: watermarked sliding-window (1h / 15m) aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), qsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def k3_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 days") -> DataFrame:
    """K3 streaming twin: native ``session_window`` sessionization.

    Emits (user_id, session_start, n_events, duration_ms) — session ids are
    an artifact of the batch formulation, so parity is asserted on the
    session's natural key (user, start)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).cast("long").alias("duration_ms"),
            F.date_format(F.min("ts"), _FMT).alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "duration_ms")
    )


def k14_stream(events: DataFrame, watermark: str = "30 days") -> DataFrame:
    """K14 streaming twin: session_window with a DYNAMIC per-event gap
    expression (purchase 1h, view 15m, else 30m) — the engine merges
    overlapping per-event extents into sessions in streaming state
    exactly as in batch; parity on (user, start, n_events, span)."""
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("1 hour"))
        .when(F.col("event_type") == "view", F.lit("15 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).cast("long").alias("span_ms"),
            F.date_format(F.min("ts"), _FMT).alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "span_ms")
    )


def k5_stream(events: DataFrame, watermark: str = "30 days") -> DataFrame:
    """K5 streaming twin: dedup by event_id within the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def k5_stream_within_watermark(events: DataFrame, watermark: str = "30 days") -> DataFrame:
    """K5 variant: ``dropDuplicatesWithinWatermark`` — unlike plain
    ``dropDuplicates``, each key's dedup state EXPIRES once the watermark
    passes it, so state stays bounded even over an unbounded event_id
    domain.  The guarantee weakens accordingly (duplicates farther apart
    than the watermark delay both survive) — the right trade at 100 TB/day
    where duplicate pairs arrive close together."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def k6_stream(events: DataFrame) -> DataFrame:
    """K6 streaming twin: first-touch attribution via arbitrary stateful
    processing (``applyInPandasWithState``).

    Per-user state = (first event's ts/id/type, running count); every
    micro-batch emits the user's current attribution (update semantics), so
    the LAST emission per user equals the batch declaration in
    queries/streaming_sem.py — asserted by the parity test.  State is a few
    scalars per key: bounded, spillable, 100 TB-safe.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, first_touch string, n_events long"
    state_schema = "first_us long, first_id long, first_touch string, n long"

    def attribute(key, pdfs, state: GroupState):
        if state.exists:
            first_us, first_id, touch, n = state.get
        else:
            first_us, first_id, touch, n = None, None, None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            idx = pdf.sort_values(["ts", "event_id"]).index[0]
            batch_us = int(pd.Timestamp(pdf.loc[idx, "ts"]).value // 1000)
            batch_id = int(pdf.loc[idx, "event_id"])
            if first_us is None or (batch_us, batch_id) < (first_us, first_id):
                first_us, first_id, touch = batch_us, batch_id, str(pdf.loc[idx, "event_type"])
        state.update((first_us, first_id, touch, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "first_touch": [touch], "n_events": [n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        attribute, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def k6_stream_tws(events: DataFrame) -> DataFrame:
    """K6 via Spark 4's ``transformWithStateInPandas`` — the arbitrary-state
    API that supersedes applyInPandasWithState: named state variables
    (value/list/map), timers, and state TTL.  Same first-touch semantics as
    ``k6_stream`` so the parity test can assert both twins agree with the
    batch declaration.  Requires the RocksDB state store provider (set by
    the caller), which is also the 100 TB answer: state lives off-heap
    on local disk, checkpointed incrementally, not in executor memory.

    Runtime requirement: the TWS Python worker speaks protobuf to the
    state server, so ``google.protobuf`` must be importable on workers —
    the parity test skips where it isn't (applyInPandasWithState has no
    such dependency and remains the always-available twin).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    output_schema = "user_id long, first_touch string, n_events long"

    class FirstTouchProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "attr", "first_us long, first_id long, first_touch string, n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                first_us, first_id, touch, n = self._state.get()
            else:
                first_us, first_id, touch, n = None, None, None, 0
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                idx = pdf.sort_values(["ts", "event_id"]).index[0]
                batch_us = int(pd.Timestamp(pdf.loc[idx, "ts"]).value // 1000)
                batch_id = int(pdf.loc[idx, "event_id"])
                if first_us is None or (batch_us, batch_id) < (first_us, first_id):
                    first_us, first_id, touch = batch_us, batch_id, str(pdf.loc[idx, "event_type"])
            self._state.update((first_us, first_id, touch, n))
            yield pd.DataFrame({"user_id": [key[0]], "first_touch": [touch], "n_events": [n]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstTouchProcessor(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="None",
    )


def k8_stream(clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """K8 streaming twin: stream-stream inner join — purchases matched to
    the same user's clicks within the preceding 30 minutes.

    Both sides carry a watermark and the join condition bounds event time in
    BOTH directions, so Spark can expire join state: a buffered click is
    droppable once the purchase-side watermark passes click_ts + 30 min —
    without the time bound, stream-stream join state grows forever (the
    scale failure mode this twin exists to demonstrate avoiding)."""
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts"))
        .withWatermark("pts", watermark)
    )
    return c.join(
        p,
        (F.col("cu") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts"))).cast("long").alias("lag_us"),
    )


def k13_stream(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """K13 streaming twin: LEFT-OUTER stream-stream join — every click
    emits, matched purchases inline, UNMATCHED clicks as a null-purchase
    row once the watermark passes the end of their join window (cts +
    30 min).  The semantic difference from k8: the null result for a
    click is only knowable when no further purchase can arrive, so outer
    emission is gated on watermark progress — a bounded replay must push
    the watermark past the last window with a sentinel event or trailing
    unmatched rows stay buffered forever (demonstrated in
    tests/test_streaming_parity.py::test_k13_left_outer_stream_join_parity)."""
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts"))
        .withWatermark("pts", watermark)
    )
    return c.join(
        p,
        (F.col("cu") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts"))).alias("lag_us"),
    )


def run_to_completion(stream_df: DataFrame, checkpoint: str, mode: str = "complete") -> list:
    """Test helper: run a streaming aggregation over a bounded file source
    until exhausted (availableNow), collecting emitted rows via foreachBatch
    (which, unlike the memory sink, supports resuming from a checkpoint —
    needed for multi-run late-data scenarios)."""
    collected: list = []

    def collect_batch(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "complete":
            collected.clear()  # complete mode re-emits the full result set
        collected.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(collect_batch)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def incremental_snapshot_pipeline(
    spark: SparkSession,
    shard_dir: str,
    bronze_dir: str,
    silver_dir: str,
    checkpoint: str,
    key_cols: list[str],
    writetime_col: str,
    seq_col: str,
) -> None:
    """K7: the reference's cron loop, Sparkified — incremental snapshot
    shards stream into a bronze parquet table; each trigger recomputes the
    silver LWW view from bronze via ``foreachBatch``.

    Exactly-once story: ``foreachBatch`` itself is at-least-once (a crash
    between the sink write and the checkpoint commit replays the batch), so
    bronze is made IDEMPOTENT rather than trusted to be exactly-once: each
    micro-batch overwrites its own ``batch_id=N`` subdirectory — a replay
    of batch N rewrites the same files instead of double-appending, and the
    batch_id partition column is dropped on read.  Silver is a
    deterministic function of bronze (LWW merge — idempotence is a tested
    property), so end-to-end the pipeline is effectively exactly-once.
    """
    from cassandra_snap_to_hadoop_spark.operators.cassandra import lww_merge

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 10)
        .parquet(shard_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{bronze_dir}/batch_id={batch_id}")
        bronze = batch_df.sparkSession.read.parquet(bronze_dir).drop("batch_id")
        silver = lww_merge(bronze, key_cols, writetime_col, seq_col)
        silver.write.mode("overwrite").parquet(silver_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCUMENTS_DDL = "doc_id long, lang string, source string, text string"


def incremental_curation_pipeline(
    spark: SparkSession,
    shard_dir: str,
    curated_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    near_dup: bool = False,
) -> None:
    """Streaming corpus curation (K7 x J1/J2/J9): document shards stream
    in; each micro-batch is quality-gated, deduplicated WITHIN the batch
    (min doc_id per normalized-content md5), then anti-joined against the
    hashes already curated so re-crawled content never lands twice.
    Survivors append to the curated parquet store per batch (batch_id
    subdirectory — same idempotent-replay scheme as the bronze layer).

    With ``near_dup=True`` a banded-MinHash stage follows exact dedup:
    each batch's band keys probe a persisted ``bands`` store, and a doc
    drops when it shares a full band with ANY earlier stage-2 doc (kept
    or near-dup-dropped — the band store covers both, which is what makes
    the incremental rule match the batch keep-first rule) or with a
    smaller-id doc in its own batch.  Band keys for the whole batch are
    then appended, so the probe corpus grows with ingestion.  This is the
    production shape of "near-dedup new crawl against existing corpus":
    the probe is an equi-join on (band, bkey) — never all-pairs — and the
    band store is the only state, so restarts stay stateless.

    Equivalence contract (asserted in tests): when shards arrive in
    ascending doc_id ranges — the crawl-frontier order a real ingest has —
    the final curated set equals the batch funnel over the union of all
    shards (quality + exact dedup, plus LSH keep-first when near_dup),
    because first-seen-across-batches plus min-id-within-batch composes
    to global min-id per hash / per band bucket.

    Scale notes: the anti-join probe reads only the curated store's hash
    column (columnar prune); state lives in the store itself, not in
    streaming state, so the pipeline restarts stateless and the watermark
    problem never arises.  At 100 TB the curated store is partitioned and
    the probe becomes a bucketed join on content_hash / (band, bkey).
    """
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        minhash_band_keys,
        normalize_text,
    )
    from cassandra_snap_to_hadoop_spark.operators.text import quality_features

    stream = (
        spark.readStream.schema(DOCUMENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(shard_dir)
    )
    bands_dir = f"{curated_dir}_bands"

    def curate_batch(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        passed = quality_features(batch_df, "text").filter(F.col("quality_ok") == 1)
        hashed = passed.withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
        from pyspark.sql.window import Window

        w = Window.partitionBy("content_hash")
        in_batch = hashed.withColumn("__keep", F.min("doc_id").over(w)).filter(
            F.col("doc_id") == F.col("__keep")
        )
        try:
            seen = ss.read.parquet(f"{curated_dir}/batch_id=*").select("content_hash").distinct()
            fresh = in_batch.join(seen, "content_hash", "left_anti")
        except Exception:  # first batch: no curated store yet
            fresh = in_batch
        if near_dup:
            # r11 (guide §2.4): ``fresh`` feeds the band-key derivation,
            # the near-dup anti join AND the final write — cut once so the
            # quality gate + dedup window + store anti-join run once per
            # batch, not three times.
            fresh = fresh.localCheckpoint()
            batch_bands = minhash_band_keys(fresh, "doc_id", "text").localCheckpoint()
            try:
                corpus_bands = ss.read.parquet(f"{bands_dir}/batch_id=*").select("band", "bkey")
                hit_old = (
                    batch_bands.join(corpus_bands.distinct(), ["band", "bkey"], "left_semi")
                    .select(F.col("id").alias("doc_id"))
                    .distinct()
                )
            except Exception:
                hit_old = None
            bb = batch_bands.alias("a")
            cc = batch_bands.alias("b")
            hit_new = (
                bb.join(
                    cc,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a.id") > F.col("b.id")),
                    "left_semi",
                )
                .select(F.col("a.id").alias("doc_id"))
                .distinct()
            )
            dropped = hit_new if hit_old is None else hit_new.unionByName(hit_old).distinct()
            fresh = fresh.join(dropped, "doc_id", "left_anti")
            # persist bands for EVERY stage-2 doc of this batch (kept or
            # dropped): future docs must also collide with dropped ones,
            # exactly as the batch keep-first rule pairs against all
            # exact-dedup survivors
            batch_bands.select(F.col("id").alias("doc_id"), "band", "bkey").write.mode(
                "overwrite"
            ).parquet(f"{bands_dir}/batch_id={batch_id}")
        fresh.select("doc_id", "lang", "source", "content_hash").write.mode("overwrite").parquet(
            f"{curated_dir}/batch_id={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(curate_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def k9_stream(events: DataFrame, nation: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """K9 streaming twin: stream-static broadcast enrichment + aggregate.
    The static dim is joined micro-batch-side (stateless); only the
    post-join aggregation keeps state, bounded by the watermark."""
    enriched = events.withWatermark("ts", watermark).withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("int")
    ).join(F.broadcast(nation), "n_nationkey")
    return enriched.groupBy(F.col("n_name").alias("nation"), "event_type").agg(
        F.count("*").alias("n"), qsum(F.col("value")).alias("total_value")
    )


def f24_stream(events: DataFrame) -> DataFrame:
    """F24 streaming twin: Holt level/trend forecasting as ARBITRARY
    STATEFUL processing (``applyInPandasWithState``), the k6 pattern
    applied to a numeric model.

    Per-user state = the day->count map accumulated so far (two parallel
    arrays — bounded by the user's active-day span, not by event volume,
    which the per-batch local pre-count guarantees).  Every micro-batch
    merges the batch's day counts into state and emits the user's CURRENT
    Holt fit over the zero-filled span, so the last emission per user
    equals the batch declaration (queries/round3d.f24_holt_forecast) —
    asserted by the parity test.  Accumulating COUNTS rather than model
    state keeps the emission arrival-order-free: the fold reruns over the
    completed series, which is exactly what makes the parity exact."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cassandra_snap_to_hadoop_spark.operators.forecast import holt_fold

    output_schema = (
        "user_id long, n_days long, level double, trend double, forecast_7d double"
    )
    state_schema = "days array<int>, counts array<long>"

    def fit(key, pdfs, state: GroupState):
        acc: dict[int, int] = {}
        if state.exists:
            days, counts = state.get
            acc = dict(zip(days, counts))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            epoch_days = (
                pd.to_datetime(pdf["ts"]).dt.normalize().astype("int64") // 86_400_000_000_000
            )
            for d, c in epoch_days.value_counts().items():
                acc[int(d)] = acc.get(int(d), 0) + int(c)
        if not acc:
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        span = range(ds[0], ds[-1] + 1)
        xs = [float(acc.get(d, 0)) for d in span]
        level, trend, fc = holt_fold(xs)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_days": [len(xs)],
                "level": [level],
                "trend": [trend],
                "forecast_7d": [fc],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fit, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def f27_stream(events: DataFrame) -> DataFrame:
    """F27 streaming twin: additive Holt-Winters (weekly season) as
    arbitrary stateful processing — the f24_stream pattern with the
    three-state seasonal fold.  Per-TYPE state is the day->count map (not
    model state), so every micro-batch re-runs the shared fold over the
    completed zero-filled span and the last emission equals the batch
    declaration (queries/round4.f27_holt_winters) regardless of arrival
    order — asserted by the parity test."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cassandra_snap_to_hadoop_spark.operators.forecast import holt_winters_fold

    output_schema = (
        "event_type string, n_days long, level double, trend double,"
        " seasonal_amplitude double, forecast_next double"
    )
    state_schema = "days array<int>, counts array<long>"

    def fit(key, pdfs, state: GroupState):
        acc: dict[int, int] = {}
        if state.exists:
            days, counts = state.get
            acc = dict(zip(days, counts))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            epoch_days = (
                pd.to_datetime(pdf["ts"]).dt.normalize().astype("int64")
                // 86_400_000_000_000
            )
            for d, c in epoch_days.value_counts().items():
                acc[int(d)] = acc.get(int(d), 0) + int(c)
        if not acc:
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        span = range(ds[0], ds[-1] + 1)
        xs = [float(acc.get(d, 0)) for d in span]
        level, trend, seas, fc = holt_winters_fold(xs, season=7)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [len(xs)],
                "level": [level],
                "trend": [trend],
                "seasonal_amplitude": [round(max(seas) - min(seas), 4)],
                "forecast_next": [fc],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fit, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def f33_stream(events: DataFrame) -> DataFrame:
    """F33 streaming twin: single binary-segmentation changepoint as
    arbitrary stateful processing — the f27_stream pattern with the
    integer binseg fold.  Per-TYPE state is the day->count map (bounded
    by the active-day span, not event volume); every micro-batch merges
    the batch's day counts and emits the CURRENT changepoint over the
    zero-filled span, so the last emission equals the batch declaration
    (queries/round5.f33_changepoint_binseg) regardless of arrival order
    — asserted by the parity test.  The fold lives in
    operators/changepoint.py, shared verbatim with the batch query's
    pure-Python pin."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cassandra_snap_to_hadoop_spark.operators.changepoint import binseg_fold

    output_schema = (
        "event_type string, split_day long, n_days_left long,"
        " n_days_right long, sum_left long, sum_right long,"
        " reduction_micro long"
    )
    state_schema = "days array<int>, counts array<long>"

    def fit(key, pdfs, state: GroupState):
        acc: dict[int, int] = {}
        if state.exists:
            days, counts = state.get
            acc = dict(zip(days, counts))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            epoch_days = (
                pd.to_datetime(pdf["ts"]).astype("int64") // 86_400_000_000_000
            )
            for d, c in epoch_days.value_counts().items():
                acc[int(d)] = acc.get(int(d), 0) + int(c)
        if not acc or len(acc) < 2:
            if acc:
                ds = sorted(acc)
                state.update((ds, [acc[d] for d in ds]))
            return
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds]))
        xs = [int(acc.get(d, 0)) for d in range(ds[0], ds[-1] + 1)]
        day, nl, nr, sl, sr, red = binseg_fold(xs, ds[0])
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "split_day": [day],
                "n_days_left": [nl],
                "n_days_right": [nr],
                "sum_left": [sl],
                "sum_right": [sr],
                "reduction_micro": [red],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fit, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def k16_pane_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """K16 streaming twin: the PANE half of pane-merged sliding windows —
    disjoint 1-hour tumbling aggregates (each event touched once, the
    panes-optimization invariant).  The 3-pane window ASSEMBLY runs
    downstream on the emitted pane aggregate (calendar-bounded, KB),
    exactly like k12's rank: the merge is deterministic per emission
    while keeping the stateful operator a plain incremental tumbling
    agg; see tests/test_streaming_parity.py::test_k16_pane_parity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("pc"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / 3_600_000_000)
            .cast("long")
            .alias("hour_idx"),
            "event_type",
            "pn",
            "pc",
        )
    )
