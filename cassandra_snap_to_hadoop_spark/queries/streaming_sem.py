"""Streaming-semantics operators (SURVEY §2-K), batch-declared.

The driver harness is batch+DuckDB, so each operator is declared here in its
batch form over the events table; the genuinely-streaming counterparts
(readStream file source, watermarks, session_window, stateful processing)
live in ``streaming/pipelines.py`` and are proven equivalent to these batch
declarations by tests/test_streaming_parity.py — the engine's guarantee that
moving a pipeline from batch to incremental doesn't change its answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import qsum
from cassandra_snap_to_hadoop_spark.registry import register

_FMT = "yyyy-MM-dd HH:mm"
_DUCK_FMT = "%Y-%m-%d %H:%M"


@register(
    "k1_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_DUCK_FMT}') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
    survey="K1",
)
def k1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — built with the streaming
    ``window()`` primitive (works identically under readStream; parity test
    runs this exact shape incrementally)."""
    e = Tables(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), qsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "k2_sliding_window",
    oracle=f"""
    WITH offs(k) AS (VALUES (0), (1), (2), (3)),
    memb AS (
        SELECT date_trunc('minute', ts)
               - INTERVAL 1 MINUTE * (CAST(minute(ts) AS INTEGER) % 15)
               - INTERVAL 15 MINUTE * k AS window_start,
               event_type, value
        FROM events CROSS JOIN offs
    )
    SELECT strftime(window_start, '{_DUCK_FMT}') AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM memb GROUP BY 1, 2
    """,
    survey="K2",
)
def k2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 15m slide): every event belongs to exactly
    4 windows (SURVEY §7 hard-part 3 — the x4 membership is the semantics
    the oracle reproduces with an explicit offset cross join)."""
    e = Tables(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), qsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "k3_session_windows",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS BIGINT) AS duration_ms
    FROM sess GROUP BY 1, 2
    """,
    survey="K3",
)
def k3_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min, strict > gap — SURVEY §7 hard-part
    6): lag -> new-session flag -> running sum = session id.  The streaming
    twin uses ``session_window()`` and is parity-tested."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = 30 * 60 * 1000
    seq = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))) > gap_ms),
            1,
        ).otherwise(0),
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.count("*").alias("n_events"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).cast("long").alias("duration_ms"),
    )


@register(
    "k4_watermark_late_drop",
    oracle=f"""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT strftime(date_trunc('hour', ts), '{_DUCK_FMT}') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, mx
    WHERE ts >= max_ts - INTERVAL 3 DAY
    GROUP BY 1
    """,
    survey="K4",
)
def k4_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch-declared: with event time having advanced
    to max(ts), a 3-day watermark admits only rows newer than max - 3d.
    The streaming twin (withWatermark + window) is parity-tested on a
    late-arrival fixture."""
    e = Tables(spark, sf_dir).events
    mx = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 3 DAY"))
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), _FMT).alias("window_start"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "k5_stream_dedup",
    oracle="""
    WITH doubled AS (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events WHERE event_id % 10 = 0
    ), deduped AS (
        SELECT DISTINCT * FROM doubled
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM deduped GROUP BY 1
    """,
    survey="K5",
)
def k5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-id over a stream with replayed records (10% re-delivered —
    at-least-once delivery simulation).  Batch: dropDuplicates; streaming
    twin: withWatermark + dropDuplicates within the watermark."""
    e = Tables(spark, sf_dir).events
    doubled = e.unionByName(e.filter(F.col("event_id") % 10 == 0))
    return doubled.dropDuplicates(["event_id"]).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "k6_first_touch",
    oracle="""
    SELECT user_id, event_type AS first_touch,
           CAST(n_events AS BIGINT) AS n_events
    FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events
        FROM events
    ) WHERE rn = 1
    """,
    survey="K6",
)
def k6_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution — the batch declaration of a per-key stateful
    computation (streaming twin keeps first-seen per user in state via
    transformWithState/applyInPandasWithState; parity-tested)."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_touch"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


@register(
    "k8_stream_stream_join",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id AS click_id, ts AS cts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, event_id AS purchase_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id,
           CAST(epoch_us(pts) - epoch_us(cts) AS BIGINT) AS lag_us
    FROM c JOIN p ON c.user_id = p.user_id
                 AND pts >= cts AND pts <= cts + INTERVAL 30 MINUTE
    """,
    survey="K8,D6",
)
def k8_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join, batch-declared: every purchase matched to the
    same user's clicks in the preceding 30 minutes (click-attribution).
    The equi key (user_id) keeps the pair generation a hash join with the
    time band as a post-filter — never a cartesian.  Under readStream the
    identical condition plus watermarks bounds both join-state buffers
    (streaming/pipelines.py k8_stream; parity-tested).  Lag emitted in
    exact integer microseconds — both engines see identical instants."""
    e = Tables(spark, sf_dir).events
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("cu") == F.col("user_id"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts"))).cast("long").alias("lag_us"),
        )
    )
