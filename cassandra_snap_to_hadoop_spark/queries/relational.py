"""Relational core queries (SURVEY §2 rows C1-C6, E1-E11, G1-G3, H1-H3).

All direct Catalyst built-ins: scans stay columnar, filters push down to
parquet, aggregates run partial->final hash aggregation, and none of these
plans contain a Python boundary.  Floating aggregates are rounded (2dp)
identically on both sides so value-hashes are summation-order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import qavg, qsum, round2, round4, yr
from cassandra_snap_to_hadoop_spark.registry import register

# --------------------------------------------------------------------------
# C. projections / filters / predicates
# --------------------------------------------------------------------------


@register(
    "c1_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_extendedprice / l_quantity AS unit_price,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem WHERE l_linenumber = 1
    """,
    survey="C1,C5",
)
def c1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed columns + casts; Catalyst prunes the scan to the
    five referenced columns (check ReadSchema)."""
    li = Tables(spark, sf_dir).lineitem
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@register(
    "c2_filter_boolean",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE (o_totalprice > 100000 AND o_orderstatus = 'F')
       OR (NOT o_orderpriority = '1-URGENT' AND o_totalprice <= 2000)
    """,
    survey="C2",
)
def c2_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT; the whole predicate pushes into the scan."""
    o = Tables(spark, sf_dir).orders
    return o.filter(
        ((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "F"))
        | (~(F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") <= 2000))
    ).select("o_orderkey", "o_totalprice")


@register(
    "c3_in_between_like",
    oracle="""
    SELECT p_partkey, p_brand, p_size FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#3')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%a%'
      AND regexp_matches(p_type, '^(STANDARD|SMALL)')
    """,
    survey="C3",
)
def c3_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / regexp predicates."""
    p = Tables(spark, sf_dir).part
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%a%")
        & F.col("p_type").rlike("^(STANDARD|SMALL)")
    ).select("p_partkey", "p_brand", "p_size")


@register(
    "c4_null_semantics",
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS seg,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(seg) AS BIGINT) AS n_seg_notnull,
        CAST(SUM(CASE WHEN seg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seg_null,
        CAST(SUM(CASE WHEN seg IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
        SUM(CAST(ROUND(COALESCE(bal, 0.0) * 100) AS BIGINT)) / 100.0 AS bal_coalesced
    FROM t
    """,
    survey="C4",
)
def c4_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: nullif/coalesce, IS NULL counting, null-safe equality."""
    c = Tables(spark, sf_dir).customer
    t = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return t.agg(
        F.count("*").alias("n"),
        F.count("seg").alias("n_seg_notnull"),
        F.sum(F.when(F.col("seg").isNull(), 1).otherwise(0)).cast("long").alias("n_seg_null"),
        F.sum(F.when(F.col("seg").eqNullSafe(F.lit(None)), 1).otherwise(0)).cast("long").alias("n_nullsafe"),
        qsum(F.coalesce(F.col("bal"), F.lit(0.0))).alias("bal_coalesced"),
    )


@register(
    "c6_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS ship_year FROM lineitem",
    survey="C6",
)
def c6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate without measures (one shuffle on all cols)."""
    li = Tables(spark, sf_dir).lineitem
    return li.select(
        "l_returnflag", "l_linestatus", yr(F.col("l_shipdate")).alias("ship_year")
    ).distinct()


# --------------------------------------------------------------------------
# E. aggregations
# --------------------------------------------------------------------------


@register(
    "e1_global_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / (COUNT(*) * 100.0) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
    survey="E1,E3",
)
def e1_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregate — partial agg per partition, single final."""
    li = Tables(spark, sf_dir).lineitem
    return li.agg(
        F.count("*").alias("n_rows"),
        qsum(F.col("l_quantity"), 1).alias("sum_qty"),
        qavg(F.col("l_extendedprice")).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "e2_groupby_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
           SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000) AS BIGINT)) / 10000.0 AS sum_charge,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / (COUNT(*) * 1.0) AS avg_qty,
           SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) / (COUNT(*) * 10000.0) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="E2",
)
def e2_groupby_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-measure hash group-by.

    The canonical scale test: partial aggregation collapses 600k rows to a
    handful of groups map-side, so the shuffle moves only group states.
    """
    li = Tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qsum(F.col("l_quantity"), 1).alias("sum_qty"),
            qsum(F.col("l_extendedprice")).alias("sum_base_price"),
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("sum_disc_price"),
            qsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 10000
            ).alias("sum_charge"),
            qavg(F.col("l_quantity"), 1).alias("avg_qty"),
            qavg(F.col("l_discount"), 10000).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "e3_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    survey="E3",
)
def e3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group COUNT DISTINCT (expand + two-phase agg in Spark)."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "e5_statistical_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covar_pop_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="E5",
)
def e5_statistical_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments per group — all single-pass built-ins.
    (skewness/kurtosis exist in Spark but use population formulas while
    DuckDB uses sample-adjusted ones — exercised in tests, not oracles.)"""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        round4(F.stddev_samp("l_quantity")).alias("std_qty"),
        round4(F.var_samp("l_quantity")).alias("var_qty"),
        round4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        round2(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
        round2(F.covar_pop("l_quantity", "l_extendedprice")).alias("covar_pop_qty_price"),
    )


@register(
    "e6_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_price,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99_price
    FROM orders GROUP BY o_orderpriority
    """,
    survey="E6",
)
def e6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``).  At 100 TB swap to ``percentile_approx`` (t-digest
    style sketch, mergeable map-side) — exact kept here for the oracle."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        round4(F.percentile("o_totalprice", 0.5)).alias("median_price"),
        round4(F.percentile("o_totalprice", 0.95)).alias("p95_price"),
        round4(F.percentile("o_totalprice", 0.99)).alias("p99_price"),
    )


@register(
    "e7_collect_aggs",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           CAST(len(list_distinct(list(n_regionkey))) AS BIGINT) AS n_distinct_keys
    FROM nation GROUP BY n_regionkey
    """,
    survey="E7",
)
def e7_collect_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collections, emitted as sorted joined strings so the oracle
    hash is deterministic (array output order is engine-defined)."""
    n = Tables(spark, sf_dir).nation
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.size(F.array_distinct(F.collect_list("n_regionkey"))).cast("long").alias("n_distinct_keys"),
    )


@register(
    "e8_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey="E8",
)
def e8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-granularity aggregate with GROUPING flags; keys coalesced
    to a sentinel so rollup-NULL vs data-NULL can't collide."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            qsum(F.col("l_quantity"), 1).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n",
        )
    )


@register(
    "e8_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey="E8",
)
def e8_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims — the 4-way grouping-set expansion."""
    o = Tables(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            qsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            "sum_price",
        )
    )


@register(
    "e8_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
    survey="E8",
)
def e8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS via the DataFrame API (Spark 4
    ``df.groupingSets``) — the general form that rollup/cube specialize.
    The set list here is deliberately NOT a rollup prefix chain
    ((flag,status),(status),()) to prove the general expansion."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            qsum(F.col("l_quantity"), 1).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n",
        )
    )


@register(
    "e9_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
    survey="E9",
)
def e9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into count columns (explicit value list — never let
    pivot infer values with a distinct scan at scale)."""
    e = Tables(spark, sf_dir).events
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count()
    # pivot leaves missing combos NULL; oracle FILTER yields 0 — align.
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


@register(
    "e9_unpivot",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
        FROM events GROUP BY user_id
    )
    SELECT user_id, kind, n
    FROM wide UNPIVOT (n FOR kind IN (click, "view", purchase, signup, error))
    """,
    survey="E9",
)
def e9_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of e9_pivot: wide per-user counts back to
    (user_id, kind, n) long form via ``DataFrame.unpivot`` (physical plan is
    an Expand node, no shuffle beyond the feeding aggregate).  Counts are
    coalesced to 0 first: DuckDB's UNPIVOT drops NULL cells while Spark's
    keeps them, so the engines only agree on a NULL-free wide table."""
    e = Tables(spark, sf_dir).events
    kinds = ["click", "view", "purchase", "signup", "error"]
    wide = e.groupBy("user_id").pivot("event_type", kinds).count()
    wide = wide.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )
    return wide.unpivot("user_id", kinds, "kind", "n")


@register(
    "e10_arg_minmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_totalprice, o_orderkey) AS latest_order_price,
           arg_min(o_totalprice, o_orderkey) AS first_order_price,
           CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders GROUP BY o_custkey
    """,
    survey="E10",
)
def e10_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by order-dependent picks.  Determinism rule: the ordering
    expression must be unique per group (o_orderkey is; o_orderdate is not),
    otherwise both engines tie-break arbitrarily and hashes diverge."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy("o_custkey").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("latest_order_price"),
        F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
        F.max("o_orderkey").cast("long").alias("max_orderkey"),
    )


@register(
    "e11_conditional_agg",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           SUM(CAST(ROUND((CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) * 100) AS BIGINT)) / 100.0 AS returned_value,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) FILTER (WHERE l_discount > 0.05) / 100.0 AS discounted_value,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS big_lines,
           ROUND(100.0 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) / COUNT(*), 4) AS pct_returned
    FROM lineitem GROUP BY 1
    """,
    survey="E11",
)
def e11_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q8/Q12/Q14 pattern)."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy(yr(F.col("l_shipdate")).alias("ship_year")).agg(
        qsum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias(
            "returned_value"
        ),
        qsum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))).alias(
            "discounted_value"
        ),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("big_lines"),
        round4(
            100.0 * F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)) / F.count("*")
        ).alias("pct_returned"),
    )


# --------------------------------------------------------------------------
# G. sorts / limits / top-k
# --------------------------------------------------------------------------


@register(
    "g1_g2_global_topk",
    oracle="""
    SELECT c_custkey, c_acctbal AS acctbal FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey LIMIT 50
    """,
    survey="G1,G2",
)
def g1_g2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT => TakeOrderedAndProject: each partition keeps a
    local top-50 heap, driver merges — no global sort materialized.  Sort key
    made unique with the pk tiebreak so LIMIT is deterministic."""
    c = Tables(spark, sf_dir).customer
    return (
        c.orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey"))
        .limit(50)
        .select("c_custkey", F.col("c_acctbal").alias("acctbal"))
    )


@register(
    "g3_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal AS acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
    survey="G3,F1",
)
def g3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation: window row_number + filter.  One shuffle
    on the group key; AQE splits any skewed nation partition."""
    c = Tables(spark, sf_dir).customer
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.col("c_acctbal").alias("acctbal"))
    )


# --------------------------------------------------------------------------
# H. set operations
# --------------------------------------------------------------------------


@register(
    "h1_union",
    oracle="""
    WITH u AS (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    )
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY nationkey
    """,
    survey="H1",
)
def h1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag) then aggregate; unionByName guards column order."""
    t = Tables(spark, sf_dir)
    u = t.customer.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "h2_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    survey="H2",
)
def h2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set): nations having both customers and suppliers."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "h3_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    survey="H3",
)
def h3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): nations with customers but no suppliers.
    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would be the bag
    variant, which keeps surplus duplicates — different semantics)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
