"""Hypothesis property tests for the round-7 algorithm classes — laws
asserted on the pure-Python reference implementations the Spark/DuckDB
pairs are pinned against (the round-5/6 property-test discipline: the
reference is cheap to run thousands of times; the engine pins tie the
reference to both engines, so a law proven here covers all three)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_snap_to_hadoop_spark.sources.sstable import (
    TableMeta,
    decode_composite,
    decode_value,
    encode_composite,
    encode_value,
    parse_data_db,
    write_data_db,
)

# ------------------------------------------------------------ ka codec

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@given(st.lists(st.binary(max_size=30), max_size=6))
def test_composite_roundtrip_any_components(comps):
    assert decode_composite(encode_composite(comps)) == comps


@given(
    st.sampled_from(["text", "bigint", "int", "double", "boolean", "blob"]),
    st.data(),
)
def test_value_codec_roundtrip_any_value(t, data):
    v = data.draw(
        {
            "text": _TEXT,
            "bigint": st.integers(-(2**63), 2**63 - 1),
            "int": st.integers(-(2**31), 2**31 - 1),
            "double": st.floats(allow_nan=False),
            "boolean": st.booleans(),
            "blob": st.binary(max_size=64),
        }[t]
    )
    assert decode_value(t, encode_value(t, v)) == v


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),  # partition key
            st.integers(0, 5),  # clustering value
            st.integers(0, 10**6),  # cell timestamp
            st.integers(-(10**6), 10**6),  # int payload
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ka_roundtrip_lww_matches_dict_semantics(cells):
    """For ANY multiset of (pk, ck, ts, value) live-cell writes, the ka
    write→parse roundtrip must equal plain last-write-wins dict
    semantics (ties: first write at a timestamp wins — the parser keeps
    the earlier cell on equal ts, matching Cassandra's deterministic
    reconciliation on identical timestamps)."""
    meta = TableMeta(
        [("pk", "bigint"), ("ck", "int"), ("v", "int")], ["pk"], ["ck"]
    )
    parts: dict[int, dict] = {}
    want: dict[tuple, tuple] = {}
    for pk, ck, ts, v in cells:
        p = parts.setdefault(pk, {"key": (pk,), "deletion": None, "rows": []})
        p["rows"].append(
            {"clustering": (ck,), "marker_ts": None, "cells": {"v": ("live", ts, v)}}
        )
        cur = want.get((pk, ck))
        if cur is None or ts > cur[0]:
            want[(pk, ck)] = (ts, v)
    import tempfile
    import os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x-Data.db")
        write_data_db(path, list(parts.values()), meta)
        got = {
            (r["pk"], r["ck"]): (r["_writetime"], r["v"])
            for r in parse_data_db(open(path, "rb").read(), meta)
        }
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 10**6)),
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 10**6),
)
def test_ka_partition_deletion_shadows_by_timestamp(cells, mfda):
    """For ANY cell timestamps and ANY markedForDeleteAt, exactly the
    cells with ts > mfda survive; a fully-shadowed partition vanishes."""
    meta = TableMeta([("pk", "bigint"), ("v", "int")], ["pk"], [])
    rows = [
        {"clustering": (), "marker_ts": None, "cells": {"v": ("live", ts, i)}}
        for i, (_, ts) in enumerate(cells)
    ]
    # single partition; each write targets the same column so LWW applies
    # among the SURVIVORS only
    parts = [{"key": (1,), "deletion": (1000, mfda), "rows": rows}]
    import tempfile
    import os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "y-Data.db")
        write_data_db(path, parts, meta)
        out = list(parse_data_db(open(path, "rb").read(), meta))
    survivors = [(ts, i) for i, (_, ts) in enumerate(cells) if ts > mfda]
    if not survivors:
        assert out == []
    else:
        ts_w, v_w = max(survivors, key=lambda p: (p[0], -p[1]))
        # LWW keeps the FIRST write at the max ts
        first_at_max = next(i for ts, i in survivors if ts == ts_w)
        assert len(out) == 1
        assert out[0]["v"] == first_at_max
        assert out[0]["_writetime"] == ts_w


# ---------------------------------------------------------- k-truss peel


def _py_truss(edges, k, rounds):
    counts = [len(edges)]
    for _ in range(rounds):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        edges = {(u, v) for u, v in edges if len(adj[u] & adj[v]) >= k - 2}
        counts.append(len(edges))
    return edges, counts


@settings(max_examples=50, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).map(
            lambda p: (min(p), max(p))
        ),
        max_size=40,
    )
)
def test_ktruss_laws_on_random_graphs(pairs):
    """For ANY graph: the peel is monotone (counts never increase), the
    fixpoint is stable (one more round changes nothing), and every
    surviving edge has >= k-2 common neighbors within the survivor set
    (the defining truss property)."""
    edges = {(u, v) for u, v in pairs if u != v}
    final, counts = _py_truss(set(edges), 4, 10)
    assert all(b <= a for a, b in zip(counts, counts[1:]))
    again, _ = _py_truss(set(final), 4, 1)
    assert again == final
    adj = {}
    for u, v in final:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for u, v in final:
        assert len(adj[u] & adj[v]) >= 2


# --------------------------------------------------- greedy max coverage


def _py_greedy(sets, k):
    covered: set = set()
    picks = []
    for _ in range(k):
        best = None
        for sid in sorted(sets):
            gain = len(sets[sid] - covered)
            if best is None or gain > best[1]:
                best = (sid, gain)
        if best is None:
            break
        covered |= sets[best[0]]
        picks.append(best)
    return picks, covered


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 8),
        st.sets(st.integers(0, 20), max_size=10),
        min_size=1,
        max_size=8,
    )
)
def test_greedy_maxcover_laws(sets):
    """For ANY set system: greedy gains are non-increasing
    (submodularity), coverage is the exact union of picks, and greedy
    achieves >= (1 - 1/e) of the optimal k-cover (Nemhauser) — checked
    against brute force for k = 2."""
    import itertools
    import math

    picks, covered = _py_greedy(sets, 2)
    gains = [g for _, g in picks]
    assert all(b <= a for a, b in zip(gains, gains[1:]))
    assert covered == set().union(*(sets[s] for s, _ in picks)) if picks else True
    best_opt = 0
    for combo in itertools.combinations(sorted(sets), min(2, len(sets))):
        best_opt = max(best_opt, len(set().union(*(sets[c] for c in combo))))
    assert len(covered) >= math.ceil((1 - 1 / math.e) * best_opt) - 1


# ------------------------------------------------ capture-recapture law


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(0, 200), min_size=1, max_size=80),
    st.sets(st.integers(0, 200), min_size=1, max_size=80),
)
def test_chapman_bounds(c1, c2):
    """Chapman's estimator is always defined, never exceeds
    Lincoln-Petersen when m > 0, and is bounded below by the observed
    union size minus 1 when the overlap is complete-ish — the e91 laws
    on arbitrary capture sets."""
    n1, n2, m = len(c1), len(c2), len(c1 & c2)
    ch = ((n1 + 1) * (n2 + 1)) // (m + 1) - 1
    assert ch >= max(n1, n2) - 1
    if m:
        lp = (n1 * n2) // m
        assert ch <= lp
