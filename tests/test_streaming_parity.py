"""Batch/stream parity tests (SURVEY §5.6): the streaming twins must produce
the batch declarations' answers when run incrementally over micro-batch
shards of the same events (FIXTURES.md §3.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import load
from cassandra_snap_to_hadoop_spark.registry import load_all
from cassandra_snap_to_hadoop_spark.streaming.pipelines import (
    incremental_snapshot_pipeline,
    k1_stream,
    k2_stream,
    k3_stream,
    k5_stream,
    k5_stream_within_watermark,
    k6_stream,
    k6_stream_tws,
    k8_stream,
    k12_stream,
    read_event_stream,
    run_to_completion,
)

REGISTRY = load_all()


@pytest.fixture(scope="module")
def event_shards(spark, sf_dir, tmp_path_factory):
    """events re-sharded by day in arrival order (~30 micro-batch files)."""
    root = str(tmp_path_factory.mktemp("stream") / "events")
    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    e.repartition("day").write.partitionBy("day").mode("overwrite").parquet(root)
    return root + "/*"  # glob over day partitions


def _rows(df):
    return sorted(map(tuple, df))


def test_k1_tumbling_parity(spark, sf_dir, event_shards, tmp_path):
    batch = REGISTRY["k1_tumbling_window"].fn(spark, sf_dir).collect()
    stream = run_to_completion(
        k1_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5)),
        str(tmp_path / "ck1"),
    )
    assert _rows(batch) == _rows(stream)


def test_k12_stream_topk_parity(spark, sf_dir, event_shards, tmp_path):
    """The windowed count runs incrementally; the rank runs on the emitted
    per-window aggregate (the only non-incrementalizable piece) — together
    they must reproduce the batch top-k declaration exactly."""
    from pyspark.sql.window import Window

    batch = REGISTRY["k12_stream_topk"].fn(spark, sf_dir).collect()
    counts = run_to_completion(
        k12_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5), watermark="30 days"),
        str(tmp_path / "ck12"),
    )
    cdf = spark.createDataFrame(counts)
    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    )
    ranked = (
        cdf.select("window_start", "event_type", F.col("n").cast("long").alias("n"),
                   rnk.cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )
    assert _rows(batch) == _rows(ranked.collect())


def test_k2_sliding_parity(spark, sf_dir, event_shards, tmp_path):
    batch = REGISTRY["k2_sliding_window"].fn(spark, sf_dir).collect()
    # large watermark => nothing dropped in the bounded replay
    stream = run_to_completion(
        k2_stream(read_event_stream(spark, event_shards, max_files_per_trigger=10), watermark="30 days"),
        str(tmp_path / "ck2"),
    )
    assert _rows(batch) == _rows(stream)


def test_k3_session_parity(spark, sf_dir, event_shards, tmp_path):
    # compare on the session natural key: (user, start, n_events, duration)
    batch = (
        REGISTRY["k3_session_windows"]
        .fn(spark, sf_dir)
        .select("user_id", "session_start", "n_events", "duration_ms")
        .collect()
    )
    stream = run_to_completion(
        k3_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5)),
        str(tmp_path / "ck3"),
    )
    assert _rows(batch) == _rows(stream)


def test_k14_dynamic_gap_session_parity(spark, sf_dir, event_shards, tmp_path):
    """Dynamic-gap session_window: streaming state merge must equal the
    batch execution of the same gap expression on the session natural key."""
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import k14_stream

    batch = REGISTRY["k14_dynamic_session_gap"].fn(spark, sf_dir).collect()
    stream = run_to_completion(
        k14_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5)),
        str(tmp_path / "ck14"),
    )
    assert _rows(batch) == _rows(stream)


def test_k5_dedup_parity(spark, sf_dir, event_shards, tmp_path):
    stream_rows = run_to_completion(
        k5_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5))
        .groupBy("event_type")
        .agg(F.count("*").alias("n")),
        str(tmp_path / "ck5"),
    )
    batch = load(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n")).collect()
    assert _rows(batch) == _rows(stream_rows)


def test_k5_dedup_within_watermark_parity(spark, sf_dir, event_shards, tmp_path):
    """dropDuplicatesWithinWatermark with a watermark spanning the whole
    replay must agree with exact batch dedup (its state-expiry weakening
    only shows when duplicates straddle the watermark horizon)."""
    stream_rows = run_to_completion(
        k5_stream_within_watermark(read_event_stream(spark, event_shards, max_files_per_trigger=5))
        .groupBy("event_type")
        .agg(F.count("*").alias("n")),
        str(tmp_path / "ck5w"),
    )
    batch = load(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n")).collect()
    assert _rows(batch) == _rows(stream_rows)


def test_k4_watermark_drops_late_rows(spark, tmp_path):
    """Late-arrival fixture: a row older than watermark arriving in a later
    file must be dropped from its (closed) window."""
    shard_dir = tmp_path / "late"
    shard_dir.mkdir()
    ddl = "event_id long, ts string, user_id long, event_type string, value double, props string"
    f1 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 02:00:00", 1, "view", 1.0, "{}"),  # advances watermark past 01:50
        ],
        ddl,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    f2 = spark.createDataFrame(
        [
            (3, "2024-01-01 00:10:00", 1, "view", 1.0, "{}"),  # late by ~2h -> dropped
            (4, "2024-01-01 02:30:00", 1, "view", 1.0, "{}"),
        ],
        ddl,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ck = str(tmp_path / "ck4")

    # run 1: only b0 exists -> watermark reaches 01:50, closing the hour-00
    # window (availableNow's final flush emits it with n=1)
    f1.coalesce(1).write.parquet(str(shard_dir / "b0"))
    stream = read_event_stream(spark, str(shard_dir) + "/*", max_files_per_trigger=1)
    out1 = run_to_completion(k1_stream(stream, watermark="10 minutes"), ck, mode="append")

    # run 2: b1 arrives with a 2h-late row; the checkpointed watermark must
    # drop it — were it admitted, the closed window would re-emit
    f2.coalesce(1).write.parquet(str(shard_dir / "b1"))
    stream = read_event_stream(spark, str(shard_dir) + "/*", max_files_per_trigger=1)
    out2 = run_to_completion(k1_stream(stream, watermark="10 minutes"), ck, mode="append")

    got = {(r.window_start, r.n) for r in out1 + out2}
    assert ("2024-01-01 00:00", 1) in got  # closed with only event 1
    assert ("2024-01-01 00:00", 2) not in got  # late event 3 discarded
    assert len(out2) == 0  # nothing re-opens after the watermark


def test_k6_stateful_first_touch_parity(spark, sf_dir, event_shards, tmp_path):
    """Arbitrary stateful processing: the last per-user emission of the
    update-mode stream equals the batch first-touch declaration."""
    emissions = run_to_completion(
        k6_stream(read_event_stream(spark, event_shards, max_files_per_trigger=5)),
        str(tmp_path / "ck6"),
        mode="update",
    )
    last = {}
    for r in emissions:  # collected in emission order; later overwrites
        last[r.user_id] = (r.first_touch, r.n_events)
    batch = {
        r.user_id: (r.first_touch, r.n_events)
        for r in REGISTRY["k6_first_touch"].fn(spark, sf_dir).collect()
    }
    assert last == batch


def test_k6_transform_with_state_parity(spark, sf_dir, event_shards, tmp_path):
    """The transformWithStateInPandas twin (named state variables + RocksDB
    state store) must produce the same final per-user attribution as both
    the applyInPandasWithState twin and the batch declaration."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python worker speaks protobuf to the state server",
    )
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        emissions = run_to_completion(
            k6_stream_tws(read_event_stream(spark, event_shards, max_files_per_trigger=5)),
            str(tmp_path / "ck6t"),
            mode="update",
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    last = {}
    for r in emissions:
        last[r.user_id] = (r.first_touch, r.n_events)
    batch = {
        r.user_id: (r.first_touch, r.n_events)
        for r in REGISTRY["k6_first_touch"].fn(spark, sf_dir).collect()
    }
    assert last == batch


def test_k8_stream_stream_join_parity(spark, sf_dir, event_shards, tmp_path):
    """Stream-stream join with two independent file-source streams over the
    same shards must emit exactly the batch declaration's pairs (append
    mode; availableNow drains everything, so no pair is lost to the
    watermark)."""
    out = run_to_completion(
        k8_stream(
            read_event_stream(spark, event_shards, max_files_per_trigger=5),
            read_event_stream(spark, event_shards, max_files_per_trigger=5),
        ),
        str(tmp_path / "ck8"),
        mode="append",
    )
    got = {(r.user_id, r.click_id, r.purchase_id, r.lag_us) for r in out}
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us)
        for r in REGISTRY["k8_stream_stream_join"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(out) == len(got)  # no duplicate emissions


def test_k7_incremental_snapshot_pipeline(spark, sf_dir, event_shards, tmp_path):
    """Bronze/silver incremental pipeline: silver equals batch LWW of all data."""
    incremental_snapshot_pipeline(
        spark,
        event_shards,
        bronze_dir=str(tmp_path / "bronze"),
        silver_dir=str(tmp_path / "silver"),
        checkpoint=str(tmp_path / "ck7"),
        key_cols=["user_id"],
        writetime_col="ts",
        seq_col="event_id",
    )
    from cassandra_snap_to_hadoop_spark.operators.cassandra import lww_merge

    silver = spark.read.parquet(str(tmp_path / "silver"))
    batch = lww_merge(load(spark, sf_dir, "events"), ["user_id"], "ts", "event_id")
    key = lambda df: sorted((r.user_id, r.event_id) for r in df.collect())
    assert key(silver) == key(batch)


def test_streaming_curation_matches_batch(spark, sf_dir, tmp_path):
    """Streamed quality-gate + cross-batch content dedup must converge to
    the batch quality+exact-dedup survivor set when shards arrive in
    ascending doc_id ranges (the stated equivalence contract)."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import normalize_text
    from cassandra_snap_to_hadoop_spark.operators.text import quality_features
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import (
        incremental_curation_pipeline,
    )

    docs = load(spark, sf_dir, "documents")
    # three ascending-id shards, one file each
    shard_dir = str(tmp_path / "doc_shards")
    bounds = [0, 150, 300, 1 << 60]
    for i in range(3):
        (
            docs.filter((F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1]))
            .coalesce(1)
            .write.mode("append")
            .parquet(shard_dir)
        )
    curated_dir = str(tmp_path / "curated")
    incremental_curation_pipeline(
        spark, shard_dir, curated_dir, checkpoint=str(tmp_path / "ckc")
    )

    got = {
        r.doc_id for r in spark.read.parquet(f"{curated_dir}/batch_id=*").select("doc_id").collect()
    }
    q = quality_features(docs, "text").filter(F.col("quality_ok") == 1)
    hashed = q.withColumn("h", F.md5(normalize_text(F.col("text"))))
    want = {
        r.doc_id
        for r in hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_near_dup_matches_batch_lsh(spark, sf_dir, tmp_path):
    """With near_dup=True the streamed curated set must equal the batch
    rule: quality + exact dedup, then drop any doc sharing a full MinHash
    band with a smaller-id stage-2 doc (the keep-first LSH prune) — the
    incremental band-store probe implements exactly that when shards
    arrive in ascending id ranges."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        minhash_lsh_pairs,
        normalize_text,
    )
    from cassandra_snap_to_hadoop_spark.operators.text import quality_features
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import (
        incremental_curation_pipeline,
    )

    docs = load(spark, sf_dir, "documents")
    shard_dir = str(tmp_path / "doc_shards_nd")
    bounds = [0, 150, 300, 1 << 60]
    for i in range(3):
        (
            docs.filter((F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1]))
            .coalesce(1)
            .write.mode("append")
            .parquet(shard_dir)
        )
    curated_dir = str(tmp_path / "curated_nd")
    incremental_curation_pipeline(
        spark, shard_dir, curated_dir, checkpoint=str(tmp_path / "cknd"), near_dup=True
    )
    got = {
        r.doc_id for r in spark.read.parquet(f"{curated_dir}/batch_id=*").select("doc_id").collect()
    }

    q = quality_features(docs, "text").filter(F.col("quality_ok") == 1)
    hashed = q.withColumn("h", F.md5(normalize_text(F.col("text"))))
    stage2_ids = {
        r.doc_id for r in hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    stage2 = docs.filter(F.col("doc_id").isin([int(i) for i in stage2_ids]))
    pairs = minhash_lsh_pairs(stage2, "doc_id", "text")
    dropped = {r.id_b for r in pairs.collect()}
    want = stage2_ids - dropped
    assert got == want
    assert 0 < len(got) <= len(stage2_ids)


def test_k9_stream_static_enrich_parity(spark, sf_dir, event_shards, tmp_path):
    """Stream-static join: the static side resolves per micro-batch with no
    join state; complete-mode output must equal the batch declaration."""
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import k9_stream

    batch = REGISTRY["k9_stream_static_enrich"].fn(spark, sf_dir).collect()
    stream = run_to_completion(
        k9_stream(
            read_event_stream(spark, event_shards, max_files_per_trigger=7),
            load(spark, sf_dir, "nation"),
        ),
        str(tmp_path / "ck9"),
    )
    assert _rows(batch) == _rows(stream)


def test_k13_left_outer_stream_join_parity(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join parity.  The outer side's null
    results are gated on watermark progress, so a bounded replay needs a
    far-future sentinel on BOTH input streams (global watermark = min of
    the two sides) to close every join window; without it the trailing
    unmatched clicks would stay buffered forever.  Sentinel rows
    (user_id = -1) are excluded from the comparison."""
    from pyspark.sql import Row

    from cassandra_snap_to_hadoop_spark.streaming.pipelines import k13_stream

    batch = REGISTRY["k13_stream_stream_left_join"].fn(spark, sf_dir).collect()

    root = str(tmp_path / "events13")
    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    e.repartition("day").write.partitionBy("day").mode("overwrite").parquet(root)
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    import datetime

    far = max_ts + datetime.timedelta(days=3)
    sent = spark.createDataFrame(
        [
            Row(event_id=10**12, ts=far, user_id=-1, event_type="click", value=0.0, props="{}"),
            Row(event_id=10**12 + 1, ts=far, user_id=-1, event_type="purchase", value=0.0, props="{}"),
        ]
    )
    sent.write.mode("overwrite").parquet(root + "/day=31")  # newest mtime -> arrives last

    src = read_event_stream(spark, root + "/*", max_files_per_trigger=5)
    stream = [
        r
        for r in run_to_completion(
            k13_stream(src, src, watermark="1 hour"),
            str(tmp_path / "ck13"),
            mode="append",
        )
        if r.user_id != -1
    ]
    assert _rows(batch) == _rows(stream)


def test_hll_sketch_fold_parity_with_batch(spark, sf_dir, event_shards, tmp_path):
    """Mergeable-sketch streaming (the e27 distinct-to-date story run
    incrementally): each micro-batch emits ONE HLL sketch binary, the
    driver folds them with hll_union_agg, and the merged estimate must
    equal the one-shot batch sketch's estimate EXACTLY — register-wise
    max-merge is associative, so sharding cannot change the union — and
    sit within 5% of the true distinct count."""
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import read_event_stream

    batch_sketches: list = []

    def grab(batch_df, batch_id):
        rows = batch_df.agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk")).collect()
        if rows and rows[0].sk is not None:
            batch_sketches.append(rows[0].sk)

    q = (
        read_event_stream(spark, event_shards, max_files_per_trigger=5)
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "ckhll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batch_sketches) > 1, "expected multiple micro-batches"

    merged = (
        spark.createDataFrame([(s,) for s in batch_sketches], "sk binary")
        .agg(F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS LONG)").alias("est"))
        .collect()[0]
        .est
    )
    e = load(spark, sf_dir, "events")
    oneshot = (
        e.agg(F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id, 14)) AS LONG)").alias("est"))
        .collect()[0]
        .est
    )
    exact = e.select("user_id").distinct().count()
    assert merged == oneshot, (merged, oneshot)
    assert abs(merged - exact) <= 0.05 * exact, (merged, exact)


def test_e44_quantile_summary_fold_parity_with_batch(spark, sf_dir, event_shards, tmp_path):
    """The mergeable-quantile summary is STREAMABLE: each micro-batch is
    summarized independently (the 'sketch per increment' pattern), the
    per-batch (value, weight) rows are unioned, and ONE weighted fold
    answers quantiles for the whole stream — with the same total
    rank-error law as the batch path, because errors add as Σ n_s/k =
    n/k across every summary regardless of which batch produced it
    (+ the boundary-pick slack).  This is the e12-HLL fold test for the
    quantile tier."""
    import bisect

    from cassandra_snap_to_hadoop_spark.operators.qsketch import (
        _summarize,
        _weighted_quantiles,
    )

    k = 128
    batch_summaries: list = []

    def grab(df, _epoch):
        import pandas as pd

        vals = df.selectExpr("cast(value as double) as v").where(
            "v is not null"
        ).toPandas()
        if len(vals):
            s = _summarize(pd.DataFrame({"v": vals["v"]}), k)
            batch_summaries.extend(
                (float(v), int(w)) for v, w in zip(s["value"], s["weight"])
            )

    stream = read_event_stream(spark, event_shards)
    q = (
        stream.writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "ckq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batch_summaries) > k, "expected summaries from multiple batches"

    import pandas as pd

    probs = [round(0.1 * i, 1) for i in range(1, 10)]
    merged = _weighted_quantiles(
        pd.DataFrame(batch_summaries, columns=["value", "weight"]), probs
    )
    est = dict(zip(merged["p"], merged["est"]))

    vals = sorted(
        r.v
        for r in load(spark, sf_dir, "events")
        .selectExpr("cast(value as double) as v")
        .where("v is not null")
        .collect()
    )
    n = len(vals)
    assert sum(w for _, w in batch_summaries) == n, "weight conservation across batches"
    for p, e in est.items():
        lo = bisect.bisect_left(vals, e)
        hi = bisect.bisect_right(vals, e)
        target = p * n
        slack = 3 * n / k  # Σ n_s/k = n/k summary error + pick slack margin
        assert lo - slack <= target <= hi + slack, (p, e, lo, hi, target, slack)


def test_e74_sprt_fold_parity_with_batch(spark, sf_dir, event_shards, tmp_path):
    """SPRT is the canonical STREAMING test — its sufficient statistics
    are per-(arm, day) increments that merge by addition regardless of
    which micro-batch delivered them: accumulate increments per batch
    with foreachBatch, fold by day in arrival-independent order, and the
    reconstructed LLR trajectory + decisions must equal the batch
    query's output exactly (pure integers end-to-end)."""
    from collections import defaultdict

    from cassandra_snap_to_hadoop_spark.queries.round6 import (
        _SPRT_C0,
        _SPRT_C1,
        _SPRT_LO,
        _SPRT_UP,
    )

    inc: dict = defaultdict(lambda: [0, 0])

    def grab(df, _epoch):
        rows = df.selectExpr(
            "user_id % 2 AS arm",
            "unix_micros(ts) div 86400000000 AS day",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s",
        ).collect()
        for r in rows:
            d = inc[(r.arm, r.day)]
            d[0] += 1
            d[1] += r.s

    stream = read_event_stream(spark, event_shards, max_files_per_trigger=5)
    q = (
        stream.writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "cksprt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert inc, "no increments folded"

    want = {}
    for arm in (0, 1):
        cn = cs = 0
        for day in sorted(d for a, d in inc if a == arm):
            n, s = inc[(arm, day)]
            cn += n
            cs += s
            llr = cs * _SPRT_C1 + (cn - cs) * _SPRT_C0
            dec = (
                "accept_h1"
                if llr >= _SPRT_UP
                else "accept_h0"
                if llr <= _SPRT_LO
                else "continue"
            )
            want[(arm, day)] = (cn, cs, llr, dec)
    got = {
        (r.arm, r.day): (r.cum_n, r.cum_s, r.llr_micro, r.decision)
        for r in REGISTRY["e74_sprt_sequential"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_k15_lateness_fold_parity_with_batch(spark, sf_dir, event_shards, tmp_path):
    """Lateness is computable as a STREAM fold: carry the per-type max
    arrived event time across micro-batches (processing rows in
    event_id order within each batch), and the reconstructed histogram
    equals the batch query — the state is exactly the watermark state a
    real stream would keep.

    Lateness is ARRIVAL-ORDER-sensitive, so cross-batch carry is only
    well-defined when batches deliver in arrival order: the Spark leg
    runs availableNow as one batch (plumbing parity), and the
    chunked-fold leg below slices the arrival stream into 1000-row
    micro-batches explicitly, proving the state carry itself."""
    from collections import defaultdict

    seen_max: dict = {}
    agg: dict = defaultdict(lambda: [0, 0])

    def bucket(late):
        if late is None:
            return "first"
        if late <= 0:
            return "in_order"
        if late <= 60_000_000:
            return "le_1m"
        if late <= 300_000_000:
            return "le_5m"
        if late <= 3_600_000_000:
            return "le_1h"
        return "gt_1h"

    def grab(df, _epoch):
        rows = df.selectExpr(
            "event_type", "event_id", "unix_micros(ts) AS tus"
        ).collect()
        for r in sorted(rows, key=lambda x: x.event_id):
            late = (
                seen_max[r.event_type] - r.tus
                if r.event_type in seen_max
                else None
            )
            a = agg[(r.event_type, bucket(late))]
            a[0] += 1
            a[1] = max(a[1], max(late or 0, 0))
            seen_max[r.event_type] = max(
                seen_max.get(r.event_type, r.tus), r.tus
            )

    stream = read_event_stream(spark, event_shards, max_files_per_trigger=10**6)
    q = (
        stream.writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "cklate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_type, r.bucket): (r.n, r.max_late_us)
        for r in REGISTRY["k15_lateness_histogram"].fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}

    # chunked-fold leg: 1000-row arrival-order micro-batches with carried
    # per-type state must reconstruct the same histogram.
    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            "SELECT event_type, event_id, epoch_us(ts) FROM"
            f" read_parquet('{sf_dir}/events.parquet') ORDER BY event_id"
        )
        .fetchall()
    )
    seen2: dict = {}
    agg2: dict = defaultdict(lambda: [0, 0])
    for start in range(0, len(rows), 1000):
        for typ, _eid, tus in rows[start : start + 1000]:
            late = seen2[typ] - tus if typ in seen2 else None
            a = agg2[(typ, bucket(late))]
            a[0] += 1
            a[1] = max(a[1], max(late or 0, 0))
            seen2[typ] = max(seen2.get(typ, tus), tus)
    assert got == {k: tuple(v) for k, v in agg2.items()}


def test_k16_pane_parity(spark, sf_dir, event_shards, tmp_path):
    """Pane-merged sliding windows: the 1-hour pane agg runs
    incrementally (each event touched once); the 3-pane window assembly
    runs on the emitted pane aggregate — together they must reproduce
    the batch pane-merge declaration, which the oracle already proves
    equal to DIRECT window assembly.  Stream == batch == direct closes
    the triangle."""
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import k16_pane_stream

    batch = REGISTRY["k16_pane_merged_sliding"].fn(spark, sf_dir).collect()
    panes = run_to_completion(
        k16_pane_stream(
            read_event_stream(spark, event_shards, max_files_per_trigger=5),
            watermark="30 days",
        ),
        str(tmp_path / "ck16"),
    )
    pdf = spark.createDataFrame(panes)
    merged = (
        pdf.select(
            "event_type",
            F.explode(F.expr("sequence(0, 2)")).alias("o"),
            "hour_idx", "pn", "pc",
        )
        .select(
            "event_type",
            (F.col("hour_idx") - F.col("o")).alias("w_start"),
            "pn", "pc",
        )
        .groupBy("event_type", "w_start")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("pc").cast("long").alias("sum_cents"),
        )
    )
    assert _rows(batch) == _rows(merged.collect())
