"""Sketch-backed approximate twins of exact relational aggregates (E4/E6).

SQL-certified IN PLACE since round 7 (VERDICT r6 item 3, the e44/e21
pattern): each query now emits the EXACT aggregate (hash-checked against
DuckDB) alongside an integer in-band flag asserting the sketch estimate
satisfies its documented error contract.  The oracle states the flag as
the constant 1 — so if Spark's HLL++/Greenwald-Khanna estimate ever
drifts outside its band, the Spark side produces 0 and the hash check
goes red.  The raw estimates themselves stay out of the output on
purpose (they are engine-specific by design); their values are law-tested
in tests/test_round7.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import round4
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "e4_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(1 AS INTEGER) AS approx_within_10pct
    FROM lineitem GROUP BY 1
    """,
    survey="E4",
)
def e4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct next to the exact count it replaces at
    100 TB (no expand, one mergeable pass).

    SQL-certified via the error-contract flag: ``approx_within_10pct`` is
    computed from the LIVE sketch estimate (rsd 0.02 → 10% is a 5-sigma
    band; HLL++ is hash-deterministic, so for fixed data the deviation is
    fixed and measured well inside the band at sf0.001/0.01/0.1) while
    the oracle asserts the contractually-required constant 1.  The exact
    counts hash-check as ordinary values.  The estimate itself is
    engine-specific and deliberately not an output column."""
    li = Tables(spark, sf_dir).lineitem
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").cast("long").alias("exact_orders"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        F.when(
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            * F.lit(10)
            <= F.col("exact_orders"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("approx_within_10pct"),
    )


@register(
    "e6_percentile_approx",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS exact_p95,
           CAST(1 AS INTEGER) AS approx_median_in_band,
           CAST(1 AS INTEGER) AS approx_p95_in_band
    FROM orders GROUP BY 1
    """,
    survey="E6",
)
def e6_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e6 scale tier: ``percentile_approx`` (Greenwald-Khanna sketch —
    mergeable map-side, one pass, bounded memory) next to the exact
    interpolated percentile it replaces at 100 TB.

    SQL-certified via the error-contract flags: accuracy 10000 bounds the
    sketch's RANK error at n/10000, so the returned value must lie
    between the exact quantile_cont at p ∓ 0.02 (a 200× slack over the
    guarantee — the sketch is deterministic for fixed data, so the band
    is stable); each flag is computed from the LIVE sketch value while
    the oracle asserts the required constant 1.  The exact percentiles
    hash-check as ordinary values (the e6_percentiles idiom: Spark
    ``percentile`` == DuckDB ``quantile_cont`` under round4)."""
    o = Tables(spark, sf_dir).orders
    agg = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("am"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("a95"),
        round4(F.percentile("o_totalprice", 0.5)).alias("exact_median"),
        round4(F.percentile("o_totalprice", 0.95)).alias("exact_p95"),
        F.percentile("o_totalprice", 0.48).alias("lo_m"),
        F.percentile("o_totalprice", 0.52).alias("hi_m"),
        F.percentile("o_totalprice", 0.93).alias("lo_95"),
        F.percentile("o_totalprice", 0.97).alias("hi_95"),
    )
    in_band = lambda v, lo, hi: (  # noqa: E731
        F.when((F.col(v) >= F.col(lo)) & (F.col(v) <= F.col(hi)), 1)
        .otherwise(0)
        .cast("int")
    )
    return agg.select(
        "o_orderpriority",
        "exact_median",
        "exact_p95",
        in_band("am", "lo_m", "hi_m").alias("approx_median_in_band"),
        in_band("a95", "lo_95", "hi_95").alias("approx_p95_in_band"),
    )
