"""Cassandra-semantics transforms (SURVEY §2-B) — the reference's "soul".

The reference tool moves Cassandra snapshot SSTables into HDFS; the data
semantics those files carry (last-write-wins cells, tombstones, TTLs,
counters, partition/clustering layout) are re-expressed here as declarative
DataFrame transforms so Catalyst owns distribution.

Scale notes (100 TB posture):
- Every merge is ONE hash shuffle on the primary key — never a collect, never
  a per-group in-memory assumption (window state spills via
  UnsafeExternalSorter).
- LWW merge runs at the ingest boundary (bronze -> silver), *before* any wide
  join, so downstream plans see already-deduplicated data (SURVEY §4
  "LWW-merge pushdown" convention).
- Skewed partitions (Cassandra "wide rows") are handled by AQE skew-join /
  partition splitting; nothing here pins a partition to one task by hand.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket(df: DataFrame, pk_cols: Sequence[str], n_buckets: int, out_col: str = "bucket") -> DataFrame:
    """B1: Murmur3-token-style partition bucketing.

    Cassandra places a partition by ``murmur3(pk) mod ranges``; Spark's
    ``hash`` *is* Murmur3 (32-bit), so ``pmod(hash(pk), n)`` reproduces the
    placement discipline.  Use ``df.repartition(n, col)`` downstream for
    physical co-location (e.g. to pre-co-locate both sides of a join and
    avoid a second shuffle).
    """
    return df.withColumn(out_col, F.pmod(F.hash(*[F.col(c) for c in pk_cols]), F.lit(n_buckets)))


def lww_merge(
    df: DataFrame,
    key_cols: Sequence[str],
    writetime_col: str = "_writetime",
    seq_col: str | None = None,
    tiebreak_cols: Sequence[str] = (),
    priority: Column | None = None,
) -> DataFrame:
    """B2: last-write-wins merge across overlapping snapshot generations.

    SSTable-compaction semantics: for each (partition key, clustering key)
    the surviving row is the one with the greatest writetime; ties break on
    ``seq_col`` (greatest wins) so the result is deterministic (SURVEY §7
    hard-part 4).  If the source itself can hold several rows with equal
    (key, writetime, seq) — i.e. seq is not truly unique — pass
    ``tiebreak_cols`` (descending value order) to pin a deterministic
    survivor; otherwise the pick is engine/partitioning-dependent.

    Plan shape — two tiers, both aggregates (never a window), both with
    map-side partial combine so the shuffle moves one surviving candidate
    per key per map task; at 100 TB with heavy overwrite ratios that is
    the difference between shuffling the dataset and shuffling the merged
    result:

    * default: ``max_by(struct(row), struct(ordering))``.  The struct
      aggregation buffer is not HashAggregate-mutable, so Spark plans a
      SortAggregate — still partial-combined, but each task sorts its
      input by the grouping key first.
    * ``priority`` (a single non-null NUMERIC column encoding the whole
      ordering, greatest wins): one ``max_by(col, priority)`` per payload
      column.  Every aggregation buffer is then primitive-typed, which
      keeps the merge on whole-stage-codegen **HashAggregate** — no sort
      anywhere.  Callers whose ordering fits a packed long (writetime
      epochs bounded, small seq, quantizable tiebreaks) should build one:
      the flagship measures the difference and PLANS.md shows both shapes.
      REQUIREMENT: ``priority`` must totally order rows within a key, OR
      tied rows must be identical on every payload column — otherwise the
      per-column picks can mix columns from different tied rows (the
      struct tier always returns one physical row).  A packed priority
      whose bits include every tiebreak value satisfies this by
      construction: equal priority then implies equal tiebreak columns.

    Ordering columns must be non-null (Cassandra writetimes always are).
    """
    if priority is not None:
        if seq_col is not None or tiebreak_cols:
            raise ValueError(
                "lww_merge: priority replaces the whole ordering — it cannot "
                "be combined with seq_col/tiebreak_cols (pack them into the "
                "priority encoding instead, so ties imply identical payloads)"
            )
        payload_cols = [c for c in df.columns if c not in set(key_cols)]
        merged = df.groupBy(*[F.col(c) for c in key_cols]).agg(
            *[F.max_by(F.col(c), priority).alias(c) for c in payload_cols]
        )
        return merged.select(*df.columns)
    order_cols: list[Column] = [F.col(writetime_col)]
    if seq_col is not None:
        order_cols.append(F.col(seq_col))
    order_cols.extend(F.col(c) for c in tiebreak_cols)
    payload = F.struct(*[F.col(c) for c in df.columns])
    ordering = F.struct(*order_cols)
    merged = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max_by(payload, ordering).alias("__lww_row")
    )
    return merged.select("__lww_row.*")


def apply_tombstones(df: DataFrame, tombstone_col: str = "_tombstone") -> DataFrame:
    """B3 (row tombstones): after LWW merge, a winning delete marker
    suppresses the row entirely.  Null marker == live."""
    c = F.col(tombstone_col)
    return df.filter(c.isNull() | ~c).drop(tombstone_col)


def apply_range_tombstones(
    df: DataFrame,
    deletes: DataFrame,
    pk_col: str,
    ck_col: str,
    lo_col: str = "ck_lo",
    hi_col: str = "ck_hi",
    delete_time_col: str = "del_writetime",
    writetime_col: str = "_writetime",
) -> DataFrame:
    """B3 (range tombstones): drop live rows covered by a newer range delete.

    Left-anti join on (pk equal, ck within [lo, hi], row older than the
    delete).  The equi key ``pk`` keeps this a hash join, not a nested loop;
    range-delete sets are tiny in practice so Catalyst broadcasts them.
    """
    cond = (
        (df[pk_col] == deletes[pk_col])
        & (df[ck_col] >= deletes[lo_col])
        & (df[ck_col] <= deletes[hi_col])
        & (df[writetime_col] < deletes[delete_time_col])
    )
    return df.join(F.broadcast(deletes), cond, "left_anti")


def apply_ttl(
    df: DataFrame,
    asof_micros: int,
    writetime_col: str = "_writetime",
    ttl_col: str = "_ttl",
) -> DataFrame:
    """B4: TTL expiry — a cell is invisible once ``writetime + ttl`` passes.

    ``writetime`` is microseconds (Cassandra convention), ``ttl`` seconds;
    null ttl == never expires.  Pure filter -> pushes down to the scan.
    """
    wt = F.col(writetime_col)
    ttl = F.col(ttl_col)
    return df.filter(ttl.isNull() | (wt + ttl.cast("long") * F.lit(1_000_000) > F.lit(asof_micros)))


def wide_row_regroup(
    df: DataFrame,
    pk_cols: Sequence[str],
    ck_col: str,
    value_cols: Sequence[str],
    out_col: str = "cells",
) -> DataFrame:
    """B5: partition view — one output row per partition key, clustering rows
    nested as an array sorted by clustering key (Cassandra's wide-row shape).

    ``sort_array(collect_list(struct(ck, ...)))`` sorts by the struct's first
    field, giving deterministic cell order without a global sort.
    """
    cell = F.struct(F.col(ck_col).alias("ck"), *[F.col(c) for c in value_cols])
    return df.groupBy(*[F.col(c) for c in pk_cols]).agg(F.sort_array(F.collect_list(cell)).alias(out_col))


def counter_merge(df: DataFrame, key_cols: Sequence[str], delta_col: str = "delta") -> DataFrame:
    """B6: counter-column merge — commutative sum of per-replica deltas.

    Plain hash aggregate: partial (map-side) sums then one shuffle, the exact
    distributed shape Cassandra's counter reconciliation implies.
    """
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(F.sum(delta_col).alias(f"{delta_col}_total"))


def asof_state(
    df,
    key_cols: list[str],
    writetime_col: str,
    seq_col: str | None = None,
    asof=None,
):
    """B7: point-in-time read — the keyspace state AS OF ``asof``.

    Cassandra semantics: a cell is visible at time T iff its writetime is
    <= T and it wins LWW among cells written by T.  So: filter on
    writetime (scan-pushable — at 100 TB this prunes whole row groups /
    snapshot generations before any shuffle), THEN merge.  The filter
    must come first: merging before filtering would let a post-T overwrite
    shadow the version that was current at T.
    """
    from pyspark.sql import functions as F

    snap = df.filter(F.col(writetime_col) <= F.lit(asof)) if asof is not None else df
    return lww_merge(snap, key_cols, writetime_col, seq_col)
