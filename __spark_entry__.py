"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine package: every operator in SURVEY.md §2 registers
itself in ``cassandra_snap_to_hadoop_spark.registry`` with a Spark callable
and (where SQL-expressible) a DuckDB oracle; this module just exposes the
registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra_snap_to_hadoop_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Snapshot-generation LWW merge -> star join -> windowed top-region-per-
    year (see cassandra_snap_to_hadoop_spark/queries/flagship.py).
    """
    registry = load_all()
    return registry["flagship_snapshot_star"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
