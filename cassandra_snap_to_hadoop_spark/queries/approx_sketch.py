"""Sketch-backed approximate twins of exact relational aggregates (E4/E6).

Registered LAST on purpose: both are rows-only checks by design (HLL++ and
Greenwald-Khanna estimates are engine-specific), and the driver's
correctness sweep is insertion-ordered with a bounded entry budget — the
budget is spent on SQL-value-checkable rows first.  Their exact twins
(e3_count_distinct / e6_percentiles) are value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import round4
from cassandra_snap_to_hadoop_spark.registry import register


@register("e4_approx_count_distinct", oracle=None, survey="E4")
def e4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only: estimates differ across
    engines by design; exactness is e3's job).  At 100 TB this replaces e3
    wherever a 2% error is acceptable — no expand, one pass."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@register("e6_percentile_approx", oracle=None, survey="E6")
def e6_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e6 scale tier: ``percentile_approx`` (Greenwald-Khanna sketch —
    mergeable map-side, one pass, bounded memory) next to the exact
    interpolated percentile it replaces at 100 TB.  Rows-only: sketch
    estimates are engine-specific by design; e6_percentiles is the exact
    value-checked twin, and the sketch error is bounded by the accuracy
    parameter (10000 -> within 1/10000 rank units)."""
    o = Tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        round4(F.percentile_approx("o_totalprice", 0.5, 10000)).alias("approx_median"),
        round4(F.percentile("o_totalprice", 0.5)).alias("exact_median"),
        round4(F.percentile_approx("o_totalprice", 0.95, 10000)).alias("approx_p95"),
        round4(F.percentile("o_totalprice", 0.95)).alias("exact_p95"),
    )
