"""Bucketed range join (SURVEY §2-D6 scale path).

A range join ``fact.ts BETWEEN dim.lo AND dim.hi`` with BOTH sides large
compiles to a nested-loop join — the one shape that no amount of hardware
saves (SCALE.md global invariants).  The scale formulation coarsens time
into fixed-width buckets: each fact row belongs to exactly one bucket, each
interval is replicated to every bucket it overlaps, and the join becomes
EQUI on the bucket id with the precise band re-checked as a post-filter.

Cost model: pair volume drops from |fact|x|dim| to
sum over buckets of (facts_in_bucket x intervals_touching_bucket); the
bucket width trades interval replication (wide buckets) against bucket-key
cardinality (narrow buckets) — pick width ~ median interval length.

Each qualifying (fact, interval) pair appears EXACTLY once (the fact's one
bucket is among the interval's buckets iff they can overlap), so no
distinct pass is needed — unlike LSH-style bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner range join: rows of ``facts`` matched to rows of ``intervals``
    with ``lo <= ts <= hi`` (timestamp columns), via bucket equi-join.
    Returns facts.* + intervals.* for every qualifying pair."""
    w = F.lit(int(bucket_width_s))
    f = facts.withColumn("__bucket", (F.unix_timestamp(F.col(ts_col)) / w).cast("long"))
    lo_b = (F.unix_timestamp(F.col(lo_col)) / w).cast("long")
    hi_b = (F.unix_timestamp(F.col(hi_col)) / w).cast("long")
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    return (
        f.join(iv, "__bucket")
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col)))
        .drop("__bucket")
    )
