"""Hypothesis property tests for the round-8 classes — the ma codec's
vint/roundtrip laws and the new algorithm families' invariants, asserted
on the pure-Python references the engine pins tie to both engines (the
round-5/6/7 property-test discipline)."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_snap_to_hadoop_spark.sources.snapshot import parse_table_meta
from cassandra_snap_to_hadoop_spark.sources.sstable_ma import (
    decode_uvint,
    encode_uvint,
    parse_ma_data_db,
    read_stats_db,
    stats_path_for,
    write_ma_data_db,
)

# ------------------------------------------------------------- vints


@given(st.integers(0, 2**64 - 1))
def test_uvint_roundtrip_any_u64(v):
    b = encode_uvint(v)
    got, i = decode_uvint(b, 0)
    assert got == v and i == len(b)


@given(st.integers(0, 2**64 - 1))
def test_uvint_length_law(v):
    """Cassandra VIntCoding size law: 1 byte carries 7 bits, each extra
    byte adds 7 more until the 9-byte full-64-bit form."""
    size = len(encode_uvint(v))
    if size < 9:
        assert v < (1 << (7 * size))
        if size > 1:
            assert v >= (1 << (7 * (size - 1)))
    else:
        assert v >= (1 << 56)


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=8))
def test_uvint_stream_is_self_delimiting(vals):
    """Concatenated vints decode back unambiguously — the property the
    row/cell framing relies on (no length prefixes between fields)."""
    buf = b"".join(encode_uvint(v) for v in vals)
    i, out = 0, []
    while i < len(buf):
        v, i = decode_uvint(buf, i)
        out.append(v)
    assert out == vals


# ---------------------------------------------------------- ma codec

_MA_CQL = """CREATE TABLE ks.p (
    pk bigint,
    ck bigint,
    val bigint,
    note text,
    PRIMARY KEY (pk, ck)
);"""


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 8),        # partition key
            st.integers(0, 5),        # clustering value
            st.integers(0, 10**6),    # row/cell timestamp
            st.integers(-(10**9), 10**9),  # bigint payload
            st.text(max_size=8),      # text payload (incl. empty-value path)
            st.sampled_from(["live", "tombstone"]),
        ),
        min_size=1,
        max_size=25,
    ),
    st.one_of(st.none(), st.integers(0, 10**6)),
)
def test_ma_roundtrip_matches_dict_semantics(rows, part_del):
    """For ANY set of (pk, ck, ts, val, note, kind) rows (last write per
    (pk, ck) kept, as the writer subset requires) and any partition
    deletion timestamp applied to partition 0, the ma write→parse
    roundtrip equals plain dict semantics with shadowing."""
    meta = parse_table_meta(_MA_CQL)
    latest: dict = {}
    for pk, ck, ts, val, note, kind in rows:
        prev = latest.get((pk, ck))
        if prev is None or ts >= prev[0]:
            latest[(pk, ck)] = (ts, val, note, kind)
    parts: dict = {}
    for (pk, ck), (ts, val, note, kind) in sorted(latest.items()):
        p = parts.setdefault(
            pk,
            {
                "key": (pk,),
                "deletion": (0, part_del) if (pk == 0 and part_del is not None) else None,
                "rows": [],
            },
        )
        cells = {
            "val": ("tombstone", ts, 10) if kind == "tombstone" else ("live", ts, val),
            "note": ("live", ts, note),
        }
        p["rows"].append({"clustering": (ck,), "marker_ts": ts, "cells": cells})
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ma-1-big-Data.db")
        write_ma_data_db(path, list(parts.values()), meta)
        stats = read_stats_db(stats_path_for(path))
        got = {
            (r["pk"], r["ck"]): r
            for r in parse_ma_data_db(open(path, "rb").read(), meta, stats)
        }
    for (pk, ck), (ts, val, note, kind) in latest.items():
        shadowed = pk == 0 and part_del is not None and ts <= part_del
        if shadowed:
            assert (pk, ck) not in got
            continue
        r = got[(pk, ck)]
        assert r["_writetime"] == ts
        assert r["note"] == note
        assert r["val"] == (None if kind == "tombstone" else val)
    extra = set(got) - {
        k
        for k, (ts, *_rest) in latest.items()
        if not (k[0] == 0 and part_del is not None and ts <= part_del)
    }
    assert not extra


# ------------------------------------------------ round-8 algorithm laws


@given(st.lists(st.integers(1, 12), min_size=3, max_size=120))
def test_good_turing_mass_conservation(counts):
    """The exact GT identity: Σ_{r≥1} N_r·r*(r) = Σ_{r≥1} (r+1)·N_{r+1}
    = N − N₁, so the smoothed seen mass plus the unseen mass N₁ restores
    the token total N exactly (computed in exact rationals — the
    registered query's micro quantization only floors each row)."""
    from collections import Counter

    ff = Counter(counts)
    n = sum(r * k for r, k in ff.items())
    # total GT mass assigned to count-r types is N_r·r* = (r+1)·N_{r+1},
    # summed over ALL r ≥ 1 (a gap with N_r = 0 carries no types but the
    # shifted sum still counts N_{r+1} — the classic raw-GT gap caveat
    # the registered query's N_r > 0 join surfaces rather than hides)
    smoothed_seen = sum((r + 1) * ff.get(r + 1, 0) for r in range(1, max(ff) + 1))
    assert smoothed_seen + ff.get(1, 0) == n


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=80,
    )
)
def test_hits_l1_mass_and_positivity(pairs):
    """The integer-lattice HITS half-step conserves L1 mass up to floor
    loss (≤ one unit per node) and keeps every score non-negative."""
    edges = sorted({(u, v + 100) for u, v in pairs})
    h = {u: 1_000_000 for u, _ in edges}
    for _ in range(3):
        raw: dict = {}
        for u, v in edges:
            raw[v] = raw.get(v, 0) + h[u]
        t = sum(raw.values())
        if t == 0:
            return
        a = {v: r * 1_000_000 // t for v, r in raw.items()}
        assert all(s >= 0 for s in a.values())
        assert 1_000_000 - len(a) <= sum(a.values()) <= 1_000_000
        raw_h: dict = {}
        for u, v in edges:
            raw_h[u] = raw_h.get(u, 0) + a[v]
        th = sum(raw_h.values())
        if th == 0:
            return
        h = {u: r * 1_000_000 // th for u, r in raw_h.items()}


@given(
    st.lists(st.integers(0, 5), min_size=2, max_size=200),
    st.integers(2, 10),
)
def test_t_closeness_emd_bounds_and_zero_law(bins_draw, n_bins):
    """Integer EMD ∈ [0, 1000]; a class distributed exactly like the
    global distribution has EMD 0."""
    from collections import Counter

    global_c = Counter(b % n_bins for b in bins_draw)
    n = sum(global_c.values())
    bins = sorted(global_c)
    m = len(bins)
    if m < 2:
        return

    def emd(cnt: Counter, ng: int) -> int:
        cum_c = cum_g = s = 0
        for b in bins:
            cum_c += cnt.get(b, 0)
            cum_g += global_c[b]
            s += abs(cum_c * n - cum_g * ng)
        return s * 1000 // (ng * n * (m - 1))

    # any single-bin class: EMD in bounds
    for b in bins:
        cnt = Counter({b: 3})
        assert 0 <= emd(cnt, 3) <= 1000
    # the self-distribution law (scale the global dist by an integer k)
    self_cnt = Counter({b: global_c[b] * 2 for b in bins})
    assert emd(self_cnt, 2 * n) == 0


@given(
    st.lists(st.integers(-(10**6), 10**6), min_size=4, max_size=50),
)
def test_ewma_fixpoint_and_bounds(xs):
    """The integer EWMA is a contraction: if every x equals a constant c,
    z converges to within 8 of c and stays there (the DIV-8 lattice
    fixpoint); for general series z stays inside [min(x, z0), max(x, z0)]
    modulo the ±1 truncation slack."""
    mu = sum(xs) // len(xs)
    z = mu
    lo = min(min(xs), mu) - 8
    hi = max(max(xs), mu) + 8
    for x in xs:
        z = (x + 7 * z) // 8 if (x + 7 * z) >= 0 else -((-(x + 7 * z)) // 8)
        assert lo <= z <= hi
    c = xs[0]
    z = mu
    for _ in range(200):
        zn = (c + 7 * z) // 8 if (c + 7 * z) >= 0 else -((-(c + 7 * z)) // 8)
        if zn == z:
            break
        z = zn
    assert abs(z - c) <= 8
