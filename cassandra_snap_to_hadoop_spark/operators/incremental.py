"""Incremental materialized-view maintenance (SURVEY §2-A5/K7/E2).

The engine analogue of a warehouse's incremental MV refresh: keep an
aggregate table as MERGEABLE PARTIAL STATES (count, exact quantized sum,
min, max), fold each new ingest batch into it with a re-aggregation over
the union, and the result is bit-identical to recomputing the aggregate
from all rows — for ANY split of the input into batches, in ANY order.

That associativity/commutativity law is exactly what lets a 100 TB
pipeline refresh a daily rollup by touching only the new day's partition:
merge cost is O(|state| + |delta agg|), never O(history).  The law is
Hypothesis-pinned in tests/test_round3d.py (random row partitions), and
the a24 registered query value-checks the 2-batch fold against a DuckDB
full recompute.

The sum is the repo-standard quantized exact sum (``_util.qsum``): per-row
round to cents -> exact BIGINT partial -> divide once at presentation, so
merge order can never perturb a float.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Grouping keys and the partial-state schema for the orders rollup MV.
KEYS = ("o_orderpriority", "yr")


def order_partials(orders: DataFrame) -> DataFrame:
    """Partial aggregate state for one ingest batch of ``orders``:
    (keys, n, cents, mx, mn) — every column mergeable by sum/sum/max/min."""
    return (
        orders.withColumn("yr", F.year("o_orderdate").cast("int"))
        .groupBy(*KEYS)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
            F.max("o_totalprice").alias("mx"),
            F.min("o_totalprice").alias("mn"),
        )
    )


def merge_order_partials(parts: list[DataFrame]) -> DataFrame:
    """Fold partial states (union -> one re-aggregation).  Associative and
    commutative by construction; at scale this is a shuffle over the STATE
    cardinality (|groups|), not over the underlying fact rows."""
    if not parts:
        raise ValueError(
            "merge_order_partials: empty batch list — a refresh cycle needs "
            "at least one partial state (fold an empty DataFrame explicitly "
            "if zero-ingest cycles are expected)"
        )
    unioned = reduce(DataFrame.unionByName, parts)
    return unioned.groupBy(*KEYS).agg(
        F.sum("n").alias("n"),
        F.sum("cents").alias("cents"),
        F.max("mx").alias("mx"),
        F.min("mn").alias("mn"),
    )


def present(state: DataFrame) -> DataFrame:
    """Presentation view of the MV state (driver-checkable column types)."""
    return state.select(
        F.col("o_orderpriority"),
        F.col("yr"),
        F.col("n").alias("n_orders"),
        (F.col("cents") / F.lit(100.0)).alias("total_price"),
        F.col("mx").alias("max_price"),
        F.col("mn").alias("min_price"),
    )
