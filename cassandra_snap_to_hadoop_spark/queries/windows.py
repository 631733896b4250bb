"""Window functions (SURVEY §2-F).

Every window here is partitioned — a window without PARTITION BY would pull
the whole table through one task at 100 TB, so the engine never declares one
over raw data (global top-k goes through TakeOrderedAndProject instead,
see g1_g2).  Ordering keys always end in a unique tiebreak column so
row_number/lag/lead are deterministic under value ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import qavg_over, qsum_over, round4
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "f1_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER w, 4) AS prank,
           ROUND(cume_dist() OVER w, 4) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    survey="F1",
)
def f1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions over one per-nation window."""
    c = Tables(spark, sf_dir).customer
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        round4(F.percent_rank().over(w)).alias("prank"),
        round4(F.cume_dist().over(w)).alias("cdist"),
    )


@register(
    "f2_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS BIGINT) AS ms_since_prev,
           lead(value, 1, -1.0) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey="F2",
)
def f2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with default — inter-event gap per user."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).cast("long").alias("ms_since_prev"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
    )


@register(
    "f3_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w / 100.0 AS running_spend,
           CAST(COUNT(*) OVER w AS BIGINT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey="F3",
)
def f3_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running) aggregates — explicit ROWS frame."""
    o = Tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        qsum_over(F.col("o_totalprice"), w).alias("running_spend"),
        F.count("*").over(w).cast("long").alias("order_seq"),
    )


@register(
    "f4_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
               / (COUNT(*) OVER w * 100.0) AS ma3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    survey="F4",
)
def f4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: 3-order moving average per customer."""
    o = Tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select("o_custkey", "o_orderkey", qavg_over(F.col("o_totalprice"), w).alias("ma3"))


@register(
    "f5_range_frame",
    oracle="""
    SELECT event_id, user_id,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts)
               RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW) / 100.0 AS sum_7d,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts)
               RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
    FROM events
    """,
    survey="F5",
)
def f5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: trailing 7 days per user, ordered on epoch
    milliseconds so both engines frame on identical integer values."""
    e = Tables(spark, sf_dir).events
    week_ms = 7 * 86400 * 1000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-week_ms, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        qsum_over(F.col("value"), w).alias("sum_7d"),
        F.count("*").over(w).cast("long").alias("n_7d"),
    )


@register(
    "f6_gap_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    survey="F6",
)
def f6_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last non-null (carry the most recent purchase value
    forward over each user's event stream)."""
    e = Tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "f7_value_windows",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 3) OVER w AS third_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    survey="F6,F1",
)
def f7_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wide value picks: first / last / nth event type per user
    over the full-partition frame (UNBOUNDED..UNBOUNDED — the default
    RANGE..CURRENT ROW frame would make last_value degenerate).  Ordering
    carries the event_id tiebreak so every pick is deterministic; DISTINCT
    collapses the per-row window output to one row per user."""
    e = Tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.nth_value("event_type", 3).over(w).alias("third_type"),
        )
        .distinct()
    )
