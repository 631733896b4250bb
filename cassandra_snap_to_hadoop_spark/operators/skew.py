"""Skew-mitigation operators (SURVEY §4 "Skew handling").

AQE's skew-join splitting handles most cases automatically; these explicit
tools cover the two places AQE can't:

  * ``salted_agg`` — a hash aggregate whose *groups* are skewed (one hot key
    receives most rows).  Two-phase: aggregate on (key, salt) first, then on
    key — the hot key's load spreads over ``n_salts`` tasks.  Works for any
    algebraic aggregate (sum/count/min/max and compositions).
  * ``salted_join`` — fact⋈dim join with a skewed fact key where the dim
    side is small but above the broadcast threshold: replicate each dim row
    ``n_salts`` times, salt the fact side randomly-but-deterministically
    (hash of row identity), join on (key, salt).

Both are pure DataFrame transforms — deterministic, no RDD code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[Column], n_salts: int) -> Column:
    """Deterministic pseudo-random salt from row identity columns (never
    ``rand()`` — checked queries must be replay-stable)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, Column | tuple[Column, "object"]],
    salt_id_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> either

      * a bare first-phase ``Column`` whose partials merge by SUM
        (``F.sum``/``F.count`` — the common algebraic cases), or
      * a ``(Column, merge_fn)`` tuple for anything whose partials merge
        differently: ``{"lo": (F.min("v"), F.min), "hi": (F.max("v"),
        F.max)}``.  ``merge_fn`` is applied to the phase-1 partial column
        in the re-combine groupBy.

    Summing per-salt minima/maxima would be silently wrong, so the bare
    form is reserved for sum-mergeable partials — non-decomposable
    aggregates (e.g. exact ``countDistinct``, ``avg``) must be expressed
    as decompositions by the caller (sum+count for avg), as on any
    two-phase combiner.
    """
    phase1 = df.withColumn("__salt", _salt([F.col(c) for c in salt_id_cols], n_salts))
    split = {
        name: (spec if isinstance(spec, tuple) else (spec, F.sum))
        for name, spec in aggs.items()
    }
    p1 = phase1.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in split.items()]
    )
    merged = p1.groupBy(*key_cols).agg(
        *[merge(f"__p_{name}").alias(name) for name, (_, merge) in split.items()]
    )
    return merged


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    fact_id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi join: dim replicated n_salts times, fact salted on row
    identity, join on (key, salt).  Each hot fact key spreads across
    ``n_salts`` reduce tasks instead of one straggler."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    dim_rep = dim.withColumn("__salt", salts)
    id_cols = [F.col(c) for c in (fact_id_cols or fact.columns)]
    fact_salted = fact.withColumn("__salt", _salt(id_cols, n_salts))
    return fact_salted.join(dim_rep, [key, "__salt"]).drop("__salt")
