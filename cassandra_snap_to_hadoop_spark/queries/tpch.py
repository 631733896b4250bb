"""Composite analytics queries — TPC-H-shaped workloads (adapted to the
narrower synthetic schema, FIXTURES.md §1) proving the relational operators
compose: multi-way joins + selective filters + grouped aggregates + top-k.

These are the "every query they run today" tier: each stresses a different
physical pattern (selective pushdown + SMJ, star join with broadcast dims,
anti-join correlation, group-filter-rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import qsum, yr
from cassandra_snap_to_hadoop_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"
_QREV = f"SUM(CAST(ROUND(({_REV}) * 10000) AS BIGINT)) / 10000.0"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey, {_QREV} AS revenue,
           CAST(o_orderdate AS DATE) AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey="D1,D2,E2,G2",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim filter -> two fact joins -> grouped revenue ->
    global top-10.  Both date predicates push into the scans; the customer
    filter shrinks the broadcast side before the join."""
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.filter(F.col("l_shipdate") > cutoff), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(qsum(F.expr(_REV), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("order_date"))
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation, {_QREV} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation n ON c_nationkey = n.n_nationkey
    JOIN region   ON n.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    survey="D1,D2,E2",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: six-way star join with a same-nation correlation between
    customer and supplier.  Only fixed-cardinality region/nation carry
    broadcast hints; supplier/customer scale with SF, so their build sides
    are AQE's call (broadcast at bench scale, partitioned at 100 TB)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(qsum(F.expr(_REV), 10000).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name AS nation, {_QREV} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="D1,D2,E2,G2",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: who returned the most value — returnflag filter pushes to
    the lineitem scan; top-20 via TakeOrderedAndProject."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.filter(F.col("l_returnflag") == "R"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(qsum(F.expr(_REV), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "nation", "revenue")
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           100.0 * SUM(CAST(ROUND((CASE WHEN p_type LIKE 'STANDARD%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 10000) AS BIGINT))
                 / SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS standard_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    survey="D1,E11,I4",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-share metric over a part-dim join (build side
    AQE-chosen: part scales with SF, so no hard broadcast hint); the ratio
    of two quantized sums stays engine-exact (both sums are integers until
    the final division)."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    std_rev = F.when(F.col("p_type").like("STANDARD%"), rev).otherwise(0.0)
    qsum_int = lambda c: F.sum(F.round(c * 10000).cast("long"))
    return (
        t.lineitem.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(yr(F.col("l_shipdate")).alias("ship_year"))
        .agg((100.0 * qsum_int(std_rev) / qsum_int(rev)).alias("standard_pct"))
    )


def _views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> None:
    """Register cs2h_<t> temp views for SQL-form queries (subquery shapes
    that the DataFrame API can't express directly)."""
    from cassandra_snap_to_hadoop_spark.io import load

    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"cs2h_{t}")


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    survey="D4",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (adapted: shipped-late = shipdate 60+ days after order, since
    the synthetic schema has no commit/receipt dates): correlated EXISTS.
    Declared as SQL so Catalyst's subquery decorrelation rewrites it — the
    physical plan is a left SEMI join on l_orderkey, never a per-row probe
    (asserted in test_plans.py)."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM cs2h_orders
        WHERE EXISTS (
            SELECT 1 FROM cs2h_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND((l_extendedprice * l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="C2,C3,E1",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: all three predicates push to the parquet scan (row-group
    stats skip most of the file at scale) and the agg is a single partial ->
    final sum — the canonical scan-bound query."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            qsum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH volume AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               n2.n_name AS supp_nation,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT order_year,
           SUM(CAST(ROUND((CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END) * 10000) AS BIGINT))
             / CAST(SUM(CAST(ROUND(rev * 10000) AS BIGINT)) AS DOUBLE) AS mkt_share
    FROM volume GROUP BY order_year
    """,
    survey="D1,D2,E11,I4",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — a 7-table star join (nation joined
    TWICE under different roles) feeding a conditional-share aggregate.
    Broadcast hints only on the fixed-cardinality sides (nation x2, region);
    part/supplier/customer scale with SF so AQE picks their build side —
    broadcast at bench scale, partitioned joins at 100 TB where an 8 GB+
    broadcast would fail.  The share is a ratio of two integer-quantized
    sums, so the double division is engine-exact."""
    t = Tables(spark, sf_dir)
    n_cust = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    europe = t.region.filter(F.col("r_name") == "EUROPE")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qsum_int = lambda c: F.sum(F.round(c * 10000).cast("long"))
    volume = (
        t.lineitem.join(t.part.filter(F.col("p_type") == "PROMO"), F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(europe), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    return volume.groupBy(yr(F.col("o_orderdate")).alias("order_year")).agg(
        (
            qsum_int(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(0.0))
            / qsum_int(rev).cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 700.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    survey="D1,E1",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated SCALAR subquery (per-part average) gating the
    outer row.  Declared as SQL so Catalyst's RewriteCorrelatedScalarSubquery
    turns the per-row probe into one aggregate-then-join — the decorrelated
    plan every warehouse engine produces.  AVG over integer-valued doubles
    is an exact integer sum / exact count, so the 0.2*avg threshold is
    bit-identical across engines."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / CAST(700 AS DOUBLE) AS avg_yearly
        FROM cs2h_lineitem JOIN cs2h_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * AVG(l_quantity) FROM cs2h_lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) / 1.0 > 250
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    survey="D2,E2,G3",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose line quantities sum past a threshold (~top
    1%), joined back to customers.  The IN-subquery form decorrelates to
    exactly this aggregate-then-join; the pre-aggregation collapses lineitem
    before any wide join touches it — at 100 TB the HAVING filter is what
    keeps the join input tiny."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(qsum(F.col("l_quantity"), 1).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           {_QREV} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
       OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    survey="D2,D5,E2,I4",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume — nation joined twice under
    different roles with a DISJUNCTIVE cross-pair predicate.  The
    disjunction cannot become a join key, so it lands as a post-join
    filter; what keeps the plan scale-safe is that each nation join is
    still an equi-join on nationkey (fixed-cardinality, hinted broadcast)
    and the disjunction filters the tiny joined dim columns — the facts
    never see a non-equi condition."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = t.nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9"))
        | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        t.supplier.join(t.lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", yr(F.col("l_shipdate")).alias("ship_year"))
        .agg(qsum(F.expr(_REV), 10000).alias("revenue"))
    )


@register(
    "tpch_q22_dormant_accounts",
    oracle="""
    WITH avg_bal AS (
        SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > ab
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
      )
    GROUP BY 1
    """,
    survey="D4,E1,E2",
)
def tpch_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent orders —
    an uncorrelated scalar subquery (global average gate) plus a NOT
    EXISTS that decorrelates to a LEFT ANTI join.  Declared as SQL so
    Catalyst performs both rewrites; the anti-join build side is the
    date-filtered orders projection, which the predicate pushes into the
    scan.  The average is a ratio of an exact integer-cent sum and a
    count, and the gate compares integer cents against it, so threshold
    membership is bit-identical across engines (the repo's float rule)."""
    _views(spark, sf_dir, ("customer", "orders", "nation"))
    return spark.sql(
        """
        WITH avg_bal AS (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*) AS ab
            FROM cs2h_customer WHERE c_acctbal > 0
        )
        SELECT n_name AS nation, COUNT(*) AS numcust,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS totacctbal
        FROM cs2h_customer
        JOIN cs2h_nation ON c_nationkey = n_nationkey
        CROSS JOIN avg_bal
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > ab
          AND NOT EXISTS (
              SELECT 1 FROM cs2h_orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
          )
        GROUP BY n_name
        """
    )


@register(
    "tpch_q12_shipping_delay",
    oracle="""
    SELECT CAST(GREATEST(LEAST(FLOOR(date_diff('day', o_orderdate, l_shipdate) / 60.0), 4), 0) AS BIGINT)
               AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    survey="D2,E11",
)
def tpch_q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipmode -> ship-delay buckets, the schema has no
    l_shipmode): classify each line by capped 60-day shipping-delay bucket
    (clamped to [0, 4]; the synthetic dates allow ship-before-order)
    and pivot order priority into conditional counts — the CASE-sum
    pattern over a fact⋈fact join.  datediff is exact-integer on both
    engines, so bucket membership needs no float rule."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    bucket = F.greatest(
        F.least(F.floor(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 60.0), F.lit(4)),
        F.lit(0),
    ).cast("long")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("delay_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    survey="D3,E2",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: customer order-count distribution.  The left join keeps
    zero-order customers (COUNT of a null-extended column is 0, exactly
    the semantics positional inner join would lose); the filtered join
    condition ('not special requests' stood in by excluding 1-URGENT)
    lives in the ON clause, not WHERE — moving it to WHERE would silently
    drop the zero-order rows.  Two-level aggregation: per-customer count,
    then histogram over counts."""
    t = Tables(spark, sf_dir)
    c_orders = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_QREV} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    survey="D1,E2,G2",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: top supplier by quarterly revenue via a scalar subquery over a
    derived view.  Revenue is QUANTIZED (integer-cent sums), so the
    max-equality join is engine-exact — the one formulation where a float
    `=` across engines is safe.  Spark shape: the revenue aggregate is
    computed once, its 1-row MAX is broadcast back (scalar-subquery
    decorrelation by hand), supplier join is a broadcast of the tiny
    winners set at any scale."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(qsum(F.expr(_REV), 10000).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    winners = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop("__mx")
    return t.supplier.join(
        winners, F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT COALESCE({_QREV}, 0.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    survey="D2,C3",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (container terms replaced by size bands): revenue under an
    OR of brand/size/quantity conjunctions spanning both join sides.  The
    optimizer must split the disjunction: per-side implied predicates
    (brand IN (...), size <= 35, quantity <= 30) push into each scan, and
    the residual OR evaluates post-join — the classic test that
    disjunctions don't force a full cartesian read.  COALESCE guards the
    empty-match case (single-row global agg)."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.coalesce(qsum(F.expr(_REV), 10000), F.lit(0.0)).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s_name
    """,
    survey="D4,D8,E3",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (receipt-vs-commit lateness stood in by ship > order +
    90 days): suppliers who were the SOLE late supplier on a
    multi-supplier finalized order.  The two correlated subqueries
    decorrelate to a semi join (another supplier exists) and an anti join
    (no OTHER late supplier) on the same self-joined relation — the
    hardest decorrelation pattern in the suite.  All three legs cluster
    on l_orderkey, so AQE reuses one fact exchange; the supplier join is
    a dim lookup."""
    t = Tables(spark, sf_dir)
    l = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
        )
    )
    l1 = l.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = l.filter(F.col("late")).select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    cand = l1.join(
        l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
    )
    sole_late = cand.join(
        l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti"
    )
    return (
        sole_late.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


_PROFIT = "l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity"


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
        FROM lineitem GROUP BY 1, 2
    ), euro AS (
        SELECT pk, sk, cost_c, s_name, s_acctbal, n_name
        FROM supply JOIN supplier ON s_suppkey = sk
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name,
           cost_c / 100.0 AS supply_cost
    FROM part JOIN euro ON pk = p_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
      AND cost_c = (SELECT MIN(e2.cost_c) FROM euro e2 WHERE e2.pk = p_partkey)
    """,
    survey="D1,D2,E2",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (no partsupp table — the supply relation is DERIVED from
    lineitem as min observed price in exact cents per (part, supplier)):
    for each small STANDARD part, every EUROPE supplier achieving the
    regional minimum cost.  The correlated scalar MIN decorrelates by hand
    into a per-part WINDOW minimum over the euro relation — one pass,
    one shuffle on pk, no duplicated subtree (an aggregate-and-join-back
    would evaluate the supply join twice since Spark does not auto-reuse
    the common subplan here).  Integer-exact cents, so ties keep ALL
    minimal suppliers on both engines (the float-equality trap q15 also
    avoids).  nation/region are the only hinted broadcasts
    (fixed-cardinality); supply/supplier/part joins stay shuffle joins
    that AQE may upgrade at bench scale."""
    t = Tables(spark, sf_dir)
    supply = t.lineitem.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cost_c"))
    euro = (
        supply.join(t.supplier, F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("pk", "sk", "cost_c", "s_name", "s_acctbal", "n_name")
    )
    parts = t.part.filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
    best = F.min("cost_c").over(Window.partitionBy("pk"))
    return (
        euro.withColumn("best_c", best)
        .filter(F.col("cost_c") == F.col("best_c"))
        .join(parts, F.col("p_partkey") == F.col("pk"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            (F.col("cost_c") / 100.0).alias("supply_cost"),
        )
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS yr,
           SUM(CAST(ROUND(({_PROFIT}) * 10000) AS BIGINT)) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    survey="D2,E2,I2",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (ps_supplycost stood in by 10% of retail price — the only
    cost column the schema carries): profit by supplier nation and order
    year over a five-way join.  The p_name filter prunes part BEFORE its
    join (predicate pushdown shrinks the build side ~linearly); the two
    fact-fact joins (lineitem-orders) cluster on orderkey so AQE can reuse
    the exchange.  Profit is quantized per-row THEN summed — exact under
    any partial-aggregation order at any parallelism."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.part.filter(F.col("p_name").like("%gear%")), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), yr(F.col("o_orderdate")).alias("yr"))
        .agg(qsum(F.expr(_PROFIT), 10000).alias("profit"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l_partkey AS pk,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS v_c
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
        GROUP BY 1
    )
    SELECT pk AS p_partkey, v_c / 100.0 AS part_value
    FROM val
    WHERE v_c > (SELECT SUM(v_c) FROM val) * 0.0005
    """,
    survey="E1,E2,D1",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (stock value stood in by shipped value): parts whose
    traded value from three nations' suppliers exceeds a fraction of the
    total.  The scalar-subquery gate is decorrelated by hand: the 1-row
    global total re-joins via broadcast nested-loop (sanctioned small
    side).  val is localCheckpoint-ed first because Spark re-executes a
    twice-referenced subplan (verified: no ReusedExchange even under
    AQE) — materializing |part| narrow rows once beats re-running the
    lineitem-supplier join at any scale (same pattern as
    operators/dedup.py dup_clusters).  The int-vs-double threshold
    compare is exact below 2^53 cents."""
    t = Tables(spark, sf_dir)
    nat = t.nation.filter(F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2"))
    val = (
        t.lineitem.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("v_c"))
    ).localCheckpoint()
    total = val.agg(F.sum("v_c").alias("t_c"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v_c") > F.col("t_c") * 0.0005)
        .select(F.col("pk").alias("p_partkey"), (F.col("v_c") / 100.0).alias("part_value"))
    )


@register(
    "tpch_q16_part_supplier_counts",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT sk) AS BIGINT) AS supplier_cnt
    FROM sp JOIN part ON p_partkey = pk
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    survey="C6,D4,E3",
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (the supplier-complaint exclusion stood in by negative
    account balance): distinct supplier counts per (brand, type, size)
    excluding flagged suppliers.  NOT IN over a provably non-null key is
    declared as a left anti join directly — the decorrelation Catalyst
    would produce, minus the null-semantics trap.  The DISTINCT pair
    projection collapses lineitem 60k->52k BEFORE any join (cheapest
    place to dedup: 2 longs wide)."""
    t = Tables(spark, sf_dir)
    sp = t.lineitem.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    flagged = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        sp.join(flagged, F.col("sk") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("p_partkey") == F.col("pk"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS total_qty,
               SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                        THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS qty_1996
        FROM lineitem GROUP BY 1, 2
    )
    SELECT DISTINCT s_name, n_name AS nation
    FROM shipped
    JOIN part     ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'small%' AND total_qty >= 60 AND 2 * qty_1996 > total_qty
    """,
    survey="D4,E11",
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (availqty stood in by lifetime shipped quantity):
    suppliers who moved over half their lifetime volume of a 'small%'
    part during 1996 (restricted to repeat-supply pairs, total >= 60,
    so the majority test discriminates instead of saturating on the
    single-shipment pairs that dominate this grain).  The nested EXISTS
    chain is declared as an
    aggregate -> filter -> LEFT SEMI join onto supplier, so each supplier
    emits once regardless of how many parts qualify — the semi join IS
    the decorrelation.  All quantity math is exact integer (quantities
    are integral by construction, checked in FIXTURES.md)."""
    t = Tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity")).cast("long")
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    shipped = t.lineitem.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum(qty).alias("total_qty"),
        F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("qty_1996"),
    )
    qualifying = (
        shipped.join(
            t.part.filter(F.col("p_name").like("small%")),
            F.col("p_partkey") == F.col("pk"),
        )
        .filter((F.col("total_qty") >= 60) & (2 * F.col("qty_1996") > F.col("total_qty")))
        .select("sk")
    )
    return (
        t.supplier.join(qualifying, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )
