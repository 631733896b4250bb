"""Unit tests for Cassandra-semantics operators (SURVEY §5.5) on synthetic
snapshot-generation fixtures with hand-computed expected outputs
(FIXTURES.md §3.1) — writetime conflicts, seq tie-breaks, tombstones, TTLs,
counters, wide rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.operators.cassandra import (
    apply_range_tombstones,
    apply_tombstones,
    apply_ttl,
    counter_merge,
    lww_merge,
    token_bucket,
    wide_row_regroup,
)

CELL_SCHEMA = "pk long, ck long, v1 string, _writetime long, _ttl int, _tombstone boolean, _seq long"


@pytest.fixture(scope="module")
def snapshot_cells(spark):
    # Three overlapping "generations": (pk, ck, v1, writetime_us, ttl_s, tombstone, seq)
    rows = [
        # pk=1, ck=1: three versions — seq breaks the writetime tie (20, b vs c)
        (1, 1, "a", 10, None, False, 1),
        (1, 1, "b", 20, None, False, 2),
        (1, 1, "c", 20, None, False, 3),  # winner: wt=20, seq=3
        # pk=1, ck=2: live then tombstoned later -> row disappears
        (1, 2, "x", 10, None, False, 4),
        (1, 2, None, 30, None, True, 5),  # delete marker wins
        # pk=2, ck=1: tombstone then RE-INSERT after delete -> row lives
        (2, 1, None, 10, None, True, 6),
        (2, 1, "y", 20, None, False, 7),
        # pk=3, ck=1: TTL'd cell, expires at wt+ttl = 100us + 50s
        (3, 1, "z", 100, 50, False, 8),
        # pk=3, ck=2: no TTL, never expires
        (3, 2, "w", 100, None, False, 9),
    ]
    return spark.createDataFrame(rows, CELL_SCHEMA)


def test_lww_merge_picks_latest_with_seq_tiebreak(snapshot_cells):
    merged = lww_merge(snapshot_cells, ["pk", "ck"], "_writetime", "_seq")
    got = {(r.pk, r.ck): (r.v1, r._seq) for r in merged.collect()}
    assert got[(1, 1)] == ("c", 3)  # seq tiebreak at equal writetime
    assert got[(1, 2)][1] == 5  # tombstone row wins the merge
    assert got[(2, 1)] == ("y", 7)  # re-insert after delete wins
    assert len(got) == 5


def test_lww_merge_priority_excludes_other_orderings(snapshot_cells):
    """priority replaces the whole ordering; combining it with seq_col or
    tiebreak_cols would be silently ignored — must raise instead."""
    import pytest
    from pyspark.sql import functions as F

    prio = F.col("_writetime") * 1000 + F.col("_seq")
    with pytest.raises(ValueError, match="priority"):
        lww_merge(snapshot_cells, ["pk", "ck"], seq_col="_seq", priority=prio)
    with pytest.raises(ValueError, match="priority"):
        lww_merge(snapshot_cells, ["pk", "ck"], tiebreak_cols=["v1"], priority=prio)
    # priority alone still works and agrees with the struct tier
    a = lww_merge(snapshot_cells, ["pk", "ck"], "_writetime", "_seq")
    b = lww_merge(snapshot_cells, ["pk", "ck"], priority=prio)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lww_merge_idempotent(snapshot_cells):
    m1 = lww_merge(snapshot_cells, ["pk", "ck"], "_writetime", "_seq")
    m2 = lww_merge(m1, ["pk", "ck"], "_writetime", "_seq")
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_tombstones_suppress_after_merge(snapshot_cells):
    merged = lww_merge(snapshot_cells, ["pk", "ck"], "_writetime", "_seq")
    live = apply_tombstones(merged)
    keys = {(r.pk, r.ck) for r in live.collect()}
    assert (1, 2) not in keys  # deleted
    assert (2, 1) in keys  # re-inserted after delete
    assert len(keys) == 4


def test_ttl_expiry(snapshot_cells):
    # asof: 100us + 50s and a hair -> pk=3,ck=1 expired; ck=2 (no ttl) lives
    live = apply_ttl(snapshot_cells, asof_micros=100 + 50 * 1_000_000 + 1)
    keys = {(r.pk, r.ck) for r in live.collect()}
    assert (3, 1) not in keys
    assert (3, 2) in keys
    # asof before expiry -> still there
    live2 = apply_ttl(snapshot_cells, asof_micros=100 + 49 * 1_000_000)
    assert (3, 1) in {(r.pk, r.ck) for r in live2.collect()}


def test_range_tombstones(spark):
    data = spark.createDataFrame(
        [(1, i, f"v{i}", 10) for i in range(10)], "pk long, ck long, v1 string, _writetime long"
    )
    deletes = spark.createDataFrame(
        [(1, 3, 6, 20)], "pk long, ck_lo long, ck_hi long, del_writetime long"
    )
    live = apply_range_tombstones(data, deletes, "pk", "ck")
    cks = sorted(r.ck for r in live.collect())
    assert cks == [0, 1, 2, 7, 8, 9]


def test_counter_merge(spark):
    deltas = spark.createDataFrame(
        [(1, "hits", 5), (1, "hits", 3), (1, "hits", -2), (2, "hits", 7)],
        "pk long, ck string, delta long",
    )
    got = {(r.pk, r.ck): r.delta_total for r in counter_merge(deltas, ["pk", "ck"]).collect()}
    assert got == {(1, "hits"): 6, (2, "hits"): 7}


def test_wide_row_regroup_sorted_cells(spark):
    rows = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x")], "pk long, ck long, v string"
    )
    out = {r.pk: [c.ck for c in r.cells] for r in wide_row_regroup(rows, ["pk"], "ck", ["v"]).collect()}
    assert out == {1: [1, 2, 3], 2: [1]}


def test_token_bucket_is_stable_and_bounded(spark, sf_dir):
    from cassandra_snap_to_hadoop_spark.io import load

    c = load(spark, sf_dir, "customer")
    b1 = token_bucket(c, ["c_custkey"], 16)
    assert b1.filter((F.col("bucket") < 0) | (F.col("bucket") >= 16)).count() == 0
    # deterministic across runs
    x = sorted((r.c_custkey, r.bucket) for r in b1.select("c_custkey", "bucket").collect())
    y = sorted((r.c_custkey, r.bucket) for r in token_bucket(c, ["c_custkey"], 16).select("c_custkey", "bucket").collect())
    assert x == y


def test_asof_state_semantics(spark):
    """As-of reads: (1) as-of >= max writetime == full merge; (2) as-of
    before a key's first write -> key absent; (3) monotonic: keys visible
    at T1 are visible at every T2 > T1; (4) filter-then-merge, not
    merge-then-filter (a post-T overwrite must not shadow the version
    current at T)."""
    from cassandra_snap_to_hadoop_spark.operators.cassandra import asof_state, lww_merge

    rows = [
        # (pk, writetime, value)
        (1, 10, "v1@10"),
        (1, 30, "v1@30"),   # overwrite after T=20
        (2, 25, "v2@25"),   # first write after T=20
    ]
    df = spark.createDataFrame(rows, "pk long, wt long, v string")
    at20 = {r.pk: r.v for r in asof_state(df, ["pk"], "wt", asof=20).collect()}
    assert at20 == {1: "v1@10"}  # (2) absent, (4) pre-overwrite version
    at30 = {r.pk: r.v for r in asof_state(df, ["pk"], "wt", asof=30).collect()}
    full = {r.pk: r.v for r in lww_merge(df, ["pk"], "wt").collect()}
    assert at30 == full == {1: "v1@30", 2: "v2@25"}  # (1)
    assert set(at20) <= set(at30)  # (3)
