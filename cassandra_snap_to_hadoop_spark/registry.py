"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here with
  * a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path), and
  * optionally a DuckDB-runnable ANSI-SQL oracle (the correctness gate).

Contract rules baked into the registry (SURVEY §5.1):
  - alias every computed column identically in Spark and oracle SQL;
  - order-insensitive outputs (the driver hashes a sorted multiset);
  - DuckDB-comparable types only (long/double/string/date — no structs,
    no arrays, no raw Spark-only types in checked outputs);
  - no nondeterministic functions in checked outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    survey_rows: tuple[str, ...] = ()  # SURVEY.md §2 rows this covers, e.g. ("E2", "D1")
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey: str | tuple[str, ...] = (),
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""
    if isinstance(survey, str):
        survey = tuple(s.strip() for s in survey.split(",") if s.strip())

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            survey_rows=survey,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: populates REGISTRY)."""
    import cassandra_snap_to_hadoop_spark.queries  # noqa: F401

    return REGISTRY
