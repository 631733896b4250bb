"""Hypothesis property tests for the round-6 algorithm classes — laws
asserted on the pure-Python reference implementations the Spark/DuckDB
pairs are pinned against (the round-5 property-test discipline: the
reference is cheap to run thousands of times; the engine pins tie the
reference to both engines, so a law proven here covers all three)."""

from __future__ import annotations

import hashlib
from collections import defaultdict


# ------------------------------------------------------------------- PAV


def _py_pav(bins):
    """Stack PAV over [(bin, n, pos)] sorted by bin (the test_round6 pin)."""
    stack = []
    for b, n, pos in bins:
        cur = [b, [b], n, pos]
        while stack and stack[-1][3] * cur[2] > cur[3] * stack[-1][2]:
            top = stack.pop()
            cur = [top[0], top[1] + cur[1], top[2] + cur[2], top[3] + cur[3]]
        stack.append(cur)
    return stack  # [[pool_min, members, n, pos], ...]


def test_pav_properties():
    """For ANY bin sequence: pooled rates are monotone non-decreasing,
    pools are CONTIGUOUS bin runs, mass (n, pos) is conserved, and PAV is
    idempotent (re-running on the pooled rates changes nothing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bin_ = st.tuples(
        st.integers(min_value=1, max_value=50),  # n
        st.integers(min_value=0, max_value=50),  # pos (clamped to n below)
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(bin_, min_size=1, max_size=12))
    def run(raw):
        bins = [(i, n, min(pos, n)) for i, (n, pos) in enumerate(raw)]
        pools = _py_pav(bins)
        # mass conservation
        assert sum(p[2] for p in pools) == sum(n for _, n, _ in bins)
        assert sum(p[3] for p in pools) == sum(pos for _, _, pos in bins)
        # contiguity + ordering of members
        flat = [m for p in pools for m in p[1]]
        assert flat == [b for b, _, _ in bins]
        # monotone rates (cross-multiplied)
        for a, b in zip(pools, pools[1:]):
            assert a[3] * b[2] <= b[3] * a[2], (a, b)
        # idempotence: each pool as a single bin -> no further merges
        again = _py_pav([(p[0], p[2], p[3]) for p in pools])
        assert len(again) == len(pools)

    run()


# ------------------------------------------------------------- Allen 13


def _allen(a_lo, a_hi, b_lo, b_hi):
    if a_hi < b_lo:
        return "precedes"
    if a_hi == b_lo:
        return "meets"
    if a_lo < b_lo and b_lo < a_hi and a_hi < b_hi:
        return "overlaps"
    if a_lo < b_lo and a_hi == b_hi:
        return "finished_by"
    if a_lo < b_lo and a_hi > b_hi:
        return "contains"
    if a_lo == b_lo and a_hi < b_hi:
        return "starts"
    if a_lo == b_lo and a_hi == b_hi:
        return "equals"
    if a_lo == b_lo and a_hi > b_hi:
        return "started_by"
    if a_lo > b_lo and a_hi < b_hi:
        return "during"
    if a_lo > b_lo and a_hi == b_hi:
        return "finishes"
    if b_lo < a_lo and a_lo < b_hi and b_hi < a_hi:
        return "overlapped_by"
    if a_lo == b_hi:
        return "met_by"
    return "preceded_by"


_CONVERSE = {
    "precedes": "preceded_by",
    "meets": "met_by",
    "overlaps": "overlapped_by",
    "finished_by": "finishes",
    "contains": "during",
    "starts": "started_by",
    "equals": "equals",
    "started_by": "starts",
    "during": "contains",
    "finishes": "finished_by",
    "overlapped_by": "overlaps",
    "met_by": "meets",
    "preceded_by": "precedes",
}


def test_allen_partition_and_converse_properties():
    """For ANY two proper integer intervals: exactly one relation holds
    (the CASE chain is a partition — checked by evaluating every branch
    predicate independently) and swapping the intervals yields the
    Allen converse."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iv = st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=1, max_value=20),
    )

    @settings(max_examples=500, deadline=None)
    @given(iv, iv)
    def run(a, b):
        a_lo, a_hi = a[0], a[0] + a[1]
        b_lo, b_hi = b[0], b[0] + b[1]
        preds = {
            "precedes": a_hi < b_lo,
            "meets": a_hi == b_lo,
            "overlaps": a_lo < b_lo and b_lo < a_hi and a_hi < b_hi,
            "finished_by": a_lo < b_lo and a_hi == b_hi and a_hi != b_lo,
            "contains": a_lo < b_lo and a_hi > b_hi,
            "starts": a_lo == b_lo and a_hi < b_hi,
            "equals": a_lo == b_lo and a_hi == b_hi,
            "started_by": a_lo == b_lo and a_hi > b_hi,
            "during": a_lo > b_lo and a_hi < b_hi,
            "finishes": a_lo > b_lo and a_hi == b_hi,
            "overlapped_by": b_lo < a_lo and a_lo < b_hi and b_hi < a_hi,
            "met_by": a_lo == b_hi,
            "preceded_by": a_lo > b_hi,
        }
        true_set = {k for k, v in preds.items() if v}
        assert len(true_set) == 1, (a, b, true_set)
        rel = _allen(a_lo, a_hi, b_lo, b_hi)
        assert rel in true_set
        assert _allen(b_lo, b_hi, a_lo, a_hi) == _CONVERSE[rel]

    run()


# ------------------------------------------------------------------- IPF


def test_ipf_calibration_property():
    """For ANY positive grid with achievable margins (targets = margins
    of a random positive sub-grid), after the final column scaling the
    column sums hit their targets within one floor unit per cell, and
    weights stay non-negative."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=1, max_value=100), min_size=2, max_size=4),
            min_size=2,
            max_size=4,
        ),
        st.lists(
            st.lists(st.integers(min_value=1, max_value=100), min_size=2, max_size=4),
            min_size=2,
            max_size=4,
        ),
    )
    def run(grid_raw, sub_raw):
        rows = min(len(grid_raw), len(sub_raw))
        cols = min(min(len(r) for r in grid_raw), min(len(r) for r in sub_raw))
        grid = [r[:cols] for r in grid_raw[:rows]]
        sub = [r[:cols] for r in sub_raw[:rows]]
        rowt = [sum(r) * 1_000_000 for r in sub]
        colt = [sum(r[j] for r in sub) * 1_000_000 for j in range(cols)]
        w = [[v * 1_000_000 for v in r] for r in grid]
        for _ in range(3):
            for i in range(rows):
                cur = sum(w[i])
                w[i] = [math.floor(v * (rowt[i] * 1.0 / cur)) for v in w[i]]
            for j in range(cols):
                cur = sum(w[i][j] for i in range(rows))
                for i in range(rows):
                    w[i][j] = math.floor(w[i][j] * (colt[j] * 1.0 / cur))
        for i in range(rows):
            for j in range(cols):
                assert w[i][j] >= 0
        for j in range(cols):
            got = sum(w[i][j] for i in range(rows))
            assert 0 <= colt[j] - got <= rows, (j, got, colt[j])

    run()


# ---------------------------------------------------------------- k-core


def test_kcore_peel_order_independence():
    """The k-core is UNIQUE: peeling violating nodes in ANY order (batch
    rounds, one-at-a-time in hash order, reversed) reaches the same
    fixpoint, and every surviving node has >= k surviving neighbors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(edge, min_size=0, max_size=60), st.integers(min_value=2, max_value=4))
    def run(raw, k):
        adj = defaultdict(set)
        for a, b in raw:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)

        def peel(order_key):
            active = set(adj)
            while True:
                viol = sorted(
                    (u for u in active
                     if sum(1 for v in adj[u] if v in active) < k),
                    key=order_key,
                )
                if not viol:
                    return active
                active.discard(viol[0])  # one at a time, chosen by order

        def peel_batch():
            active = set(adj)
            while True:
                drop = {
                    u for u in active
                    if sum(1 for v in adj[u] if v in active) < k
                }
                if not drop:
                    return active
                active -= drop

        batch = peel_batch()
        one_by_one = peel(lambda u: u)
        reverse = peel(lambda u: -u)
        hashed = peel(lambda u: hashlib.md5(str(u).encode()).hexdigest())
        assert batch == one_by_one == reverse == hashed
        for u in batch:
            assert sum(1 for v in adj[u] if v in batch) >= k

    run()


# ------------------------------------------------------------------- CMS


def test_md5_cms_one_sided_and_mass_properties():
    """For ANY multiset: the md5-CMS estimate is >= the exact count for
    EVERY item (one-sided error is structural, not probabilistic), and
    each counter row conserves total mass."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    DEPTH, WIDTH = 5, 64

    def bucket(i, key):
        return (
            int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % WIDTH
        )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80))
    def run(items):
        from collections import Counter

        exact = Counter(items)
        table = [[0] * WIDTH for _ in range(DEPTH)]
        for key, c in exact.items():
            for i in range(DEPTH):
                table[i][bucket(i, key)] += c
        n = len(items)
        for i in range(DEPTH):
            assert sum(table[i]) == n  # mass conservation per row
        for key, c in exact.items():
            est = min(table[i][bucket(i, key)] for i in range(DEPTH))
            assert est >= c  # structural one-sided error

    run()


# --------------------------------------------------------------- entropy


def test_token_entropy_bounds_property():
    """For ANY token multiset: 0 <= H_micro <= ln(n_types)*1e6 (+ floor
    slack), H = 0 exactly for single-type docs, and H is maximal for
    uniform multisets among same-type-count rearrangements."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12))
    def run(counts):
        n = sum(counts)
        s = sum(math.floor(c * math.log(c / n) * 1_000_000) for c in counts)
        h = (-s) // n
        assert h >= 0
        assert h <= math.log(len(counts)) * 1_000_000 + len(counts) + 1
        if len(counts) == 1:
            assert h * n <= len(counts)  # 0 up to one floor unit
        # uniformization never lowers entropy: compare against the uniform
        # multiset with the same n and type count (when divisible).
        t = len(counts)
        if t > 1 and n % t == 0:
            u = n // t
            su = t * math.floor(u * math.log(u / n) * 1_000_000)
            hu = (-su) // n
            assert hu + 2 >= h, (counts, h, hu)

    run()
