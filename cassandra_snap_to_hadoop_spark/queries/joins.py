"""Join operators (SURVEY §2-D).  Join *semantics* are checked by the oracle;
the physical strategy (broadcast / sort-merge / NLJ) is asserted separately
in tests/test_plans.py since DuckDB has no notion of it.

Scale posture: the five small dims always broadcast (no shuffle of the fact
side); fact⋈fact goes sort-merge on the join key; non-equi joins are always
given an equi component or a broadcast-able side so they never degenerate to
an unpartitioned nested loop over big data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import qavg, qsum, yr
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "d1_broadcast_dim_join",
    oracle="""
    SELECT p_brand, SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
    survey="D1",
)
def d1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join — the explicitly-hinted demo of the strategy
    (the §2-D1 row).  The hinted side is part AFTER a selective filter, and
    part scales with SF, so this exact hint is a bench-scale demo: the
    production pattern for SF-scaling dims is elsewhere (flagship/tpch),
    where AQE picks the build side from runtime stats and only the
    fixed-cardinality region/nation keep hard hints.  lineitem is never
    shuffled for a broadcast join."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(F.broadcast(t.part.filter(F.col("p_size") <= 20)), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "d2_sortmerge_fact_join",
    oracle="""
    SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS sum_qty,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
    survey="D2",
)
def d2_sortmerge_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi join: Catalyst picks sort-merge above the broadcast
    threshold — both sides hash-partition on the key, sort, stream-merge;
    spills instead of OOM on any key distribution, AQE splits skew."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", yr(F.col("o_orderdate")).alias("order_year"))
        .agg(
            qsum(F.col("l_quantity"), 1).alias("sum_qty"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "d3_outer_join",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1, 2
    """,
    survey="D3",
)
def d3_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders (COUNT of the
    null-extended column is 0 — the semantics under test)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(qsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "d3_full_outer_join",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    survey="D3",
)
def d3_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts."""
    t = Tables(spark, sf_dir)
    cn = t.customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_cust"))
    sn = t.supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_supp"))
    joined = cn.alias("cn").join(sn.alias("sn"), F.col("cn.nationkey") == F.col("sn.nationkey"), "full")
    return joined.select(
        F.coalesce(F.col("cn.nationkey"), F.col("sn.nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).cast("long").alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).cast("long").alias("n_supp"),
    )


@register(
    "d4_semi_anti_join",
    oracle="""
    WITH exists_side AS (
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 150000)
    ), not_exists_side AS (
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    )
    SELECT 'has_big_order' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM exists_side
    UNION ALL
    SELECT 'no_orders' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM not_exists_side
    """,
    survey="D4",
)
def d4_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) — existence joins never
    duplicate the left side and stream in one pass."""
    t = Tables(spark, sf_dir)
    big_orders = t.orders.filter(F.col("o_totalprice") > 150000)
    semi = t.customer.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    anti = t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return semi.agg(F.count("*").alias("n")).select(F.lit("has_big_order").alias("bucket"), "n").unionByName(
        anti.agg(F.count("*").alias("n")).select(F.lit("no_orders").alias("bucket"), "n")
    )


@register(
    "d5_cross_theta_join",
    oracle="""
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_other_nations
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    GROUP BY 1
    """,
    survey="D5",
)
def d5_cross_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta filter => BroadcastNestedLoopJoin.  Only legal when
    one side is broadcast-small (region: 5 rows) — the engine never NLJs two
    large inputs (see d6 for the bucketed alternative)."""
    t = Tables(spark, sf_dir)
    return (
        t.region.crossJoin(t.nation)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_other_nations"))
    )


@register(
    "d6_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 500.0), ('mid', 500.0, 1200.0), ('high', 1200.0, 1000000.0)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parts,
           SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) / (COUNT(*) * 100.0) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    survey="D6",
)
def d6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join against a banding table.  The band side is tiny ->
    broadcast NLJ is the *right* plan; with two large sides the engine
    pre-buckets both on coarse range so the NLJ runs per-bucket."""
    t = Tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1200.0), ("high", 1200.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        t.part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), qavg(F.col("p_retailprice")).alias("avg_price"))
    )


@register(
    "d7_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CAST(epoch_ms(v.ts) AS BIGINT) AS last_view_ms
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    survey="D7",
)
def d7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's latest view at or
    before it.  Spark formulation: tag + union both sides, then one window
    pass with ``last(ignorenulls)`` — a single shuffle on user_id, linear
    scan per user, no pairwise blowup (SURVEY §2-D7).

    Equal-timestamp rule: a view at exactly the purchase ts DOES match
    (p.ts >= v.ts) — the union sorts views before purchases at equal ts.
    """
    e = Tables(spark, sf_dir).events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"), F.lit(None).cast("long").alias("view_ms")
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_p"),
        F.unix_millis("ts").alias("view_ms"),
    )
    unioned = purchases.unionByName(views)
    # views (is_p=0) order before purchases (is_p=1) at equal ts => >= semantics;
    # among equal-ts views the max view_ms is the same value, so it stays deterministic.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_view_ms", F.last("view_ms", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "last_view_ms")
    )


@register(
    "d8_self_join",
    oracle="""
    SELECT a.o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 7
    GROUP BY 1
    """,
    survey="D8",
)
def d8_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi+theta join: pairs of orders by the same customer within 7
    days.  The equi key (custkey) keeps it a hash/SMJ join; the theta part
    only filters within matched groups."""
    o = Tables(spark, sf_dir).orders
    a = o.alias("a")
    b = o.alias("b")
    dd = F.abs(F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate")))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (dd <= 7),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "d6_range_join_bucketed",
    oracle="""
    WITH iv AS (
        SELECT event_id AS iv_id, ts AS lo, ts + INTERVAL 45 MINUTE AS hi
        FROM events WHERE event_id % 50 = 0
    )
    SELECT e.event_id, iv_id
    FROM events e JOIN iv ON e.ts >= lo AND e.ts <= hi
    """,
    survey="D6",
)
def d6_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 scale tier: the same interval-containment join as a bucket
    EQUI-join (operators/rangejoin.py) — facts keyed by their time bucket,
    intervals exploded across the buckets they span, precise band
    re-filtered after the hash join.  The oracle is the plain theta join:
    the formulations are provably pair-identical (tested), only the plan
    shape differs (no nested loop — asserted in test_plans.py)."""
    from cassandra_snap_to_hadoop_spark.operators.rangejoin import bucketed_range_join

    e = Tables(spark, sf_dir).events
    facts = e.select("event_id", "ts")
    iv = (
        e.filter(F.col("event_id") % 50 == 0)
        .select(
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("hi"),
        )
    )
    return bucketed_range_join(facts, iv, "ts", "lo", "hi", bucket_width_s=1800).select(
        "event_id", "iv_id"
    )


@register(
    "d14_asof_tolerance",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN epoch_ms(p.ts) - epoch_ms(v.ts) <= 3600000
                THEN CAST(epoch_ms(v.ts) AS BIGINT) END AS last_view_ms,
           CAST(CASE WHEN v.ts IS NOT NULL
                      AND epoch_ms(p.ts) - epoch_ms(v.ts) > 3600000
                     THEN 1 ELSE 0 END AS INTEGER) AS stale_dropped
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    survey="D7,C2",
)
def d14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest view at or before
    each purchase counts only if it is at most 1 hour old — the bounded-
    staleness variant every feature store / attribution pipeline actually
    runs (an unbounded as-of happily joins a price from last month).  The
    tolerance is applied AFTER the as-of pick, not as a join predicate:
    'latest within the window' and 'latest, if within the window' differ
    whenever a fresher-but-out-of-window match exists, and the
    industry-standard semantics (pandas merge_asof tolerance) is the
    latter — match NULLed, staleness flagged, row kept.  Engine shape is
    d7's unchanged: one union + one window pass per user, the tolerance
    is a pure column expression on top — zero additional shuffle."""
    asof = d7_asof_join(spark, sf_dir)
    e = Tables(spark, sf_dir).events
    p_ms = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_millis("ts").alias("p_ms")
    )
    tol = 3600000
    joined = asof.join(p_ms, "event_id")
    fresh = F.col("p_ms") - F.col("last_view_ms") <= tol
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("last_view_ms")).alias("last_view_ms"),
        F.when(F.col("last_view_ms").isNotNull() & ~fresh, 1)
        .otherwise(0)
        .cast("int")
        .alias("stale_dropped"),
    )


@register(
    "d15_null_skew_join",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS ck,
               o_totalprice
        FROM orders
    )
    SELECT COALESCE(c.c_mktsegment, 'UNMATCHED') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM o LEFT JOIN customer c ON o.ck = c.c_custkey
    GROUP BY 1
    """,
    survey="D3,C4,E2",
)
def d15_null_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key skew isolation: in a left join, every null-key row hashes
    to ONE reducer (nulls never match, but they still shuffle together) —
    with 1/3 of keys null, one task carries a third of the fact while the
    rest idle.  The standard fix, applied here: split the fact on key
    nullability, hash-join only the non-null side, pass null rows
    straight to the result with join columns nulled — the null partition
    never enters the shuffle at all.  Value-checked against the oracle's
    plain LEFT JOIN (identical semantics: null keys match nothing), so
    the rewrite is proven safe, and the null fraction is injected
    deterministically (orderkey % 3)."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("ck"),
        "o_totalprice",
    )
    c = t.customer
    nn = o.filter(F.col("ck").isNotNull()).join(
        c, F.col("ck") == F.col("c_custkey"), "left"
    )
    nulls = o.filter(F.col("ck").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    unioned = nn.select("o_totalprice", "c_mktsegment").unionByName(
        nulls.select("o_totalprice", "c_mktsegment")
    )
    return unioned.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("UNMATCHED")).alias("segment")
    ).agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias(
            "total_price"
        ),
    )
