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
    customer and supplier; dims broadcast, facts sort-merge."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t.supplier),
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
    """Q14 shape: conditional-share metric over a broadcast dim join; the
    ratio of two quantized sums stays engine-exact (both sums are integers
    until the final division)."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    std_rev = F.when(F.col("p_type").like("STANDARD%"), rev).otherwise(0.0)
    qsum_int = lambda c: F.sum(F.round(c * 10000).cast("long"))
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(yr(F.col("l_shipdate")).alias("ship_year"))
        .agg((100.0 * qsum_int(std_rev) / qsum_int(rev)).alias("standard_pct"))
    )
