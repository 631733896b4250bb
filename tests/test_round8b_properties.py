"""Hypothesis property tests for the round-8 continuation algorithm
classes (queries/round8b.py) — laws asserted on the pure-Python
references the engine pins tie to both engines (the rounds-5..8
property-test discipline): doubled-rank lattice laws, Kruskal-Wallis /
Friedman / Cochran invariants, Durbin-Watson bounds, G-test
non-negativity, the CAS replay monotonicity, and the log2 bucketing
partition law.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def rank2_map(counter: Counter) -> dict:
    out, cum = {}, 0
    for v in sorted(counter):
        c = counter[v]
        out[v] = 2 * cum + c + 1
        cum += c
    return out


# ------------------------------------------------- doubled-rank lattice


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=200))
def test_rank2_total_is_n_times_n_plus_one(vals):
    """Σ over all observations of rank2 = 2·Σranks = n(n+1) regardless of
    ties — the closed-form law the e102 W2+ + W2− pin instantiates."""
    vc = Counter(vals)
    r2 = rank2_map(vc)
    n = len(vals)
    assert sum(r2[v] for v in vals) == n * (n + 1)


@given(st.lists(st.integers(0, 9), min_size=2, max_size=200))
def test_rank2_is_order_isomorphic(vals):
    """Distinct values keep their order under the doubled rank."""
    vc = Counter(vals)
    r2 = rank2_map(vc)
    ks = sorted(vc)
    assert all(r2[a] < r2[b] for a, b in zip(ks, ks[1:]))


# ------------------------------------------------------ Kruskal-Wallis


@given(
    st.lists(
        st.tuples(st.sampled_from("ABC"), st.integers(1, 8)),
        min_size=6,
        max_size=300,
    ).filter(lambda xs: len({g for g, _ in xs}) == 3)
)
def test_kruskal_wallis_h_nonnegative_and_tie_bound(pairs):
    """H ≥ 0 (it is a between-group rank variance) and the tie term obeys
    0 ≤ Σ(t³−t) < N³−N strictly unless every value is identical."""
    vc = Counter(v for _, v in pairs)
    r2 = rank2_map(vc)
    n_g, r_g = Counter(), Counter()
    for g, v in pairs:
        n_g[g] += 1
        r_g[g] += r2[v]
    n = len(pairs)
    h = (
        12.0 / (n * (n + 1)) * sum(r_g[g] ** 2 / (4.0 * n_g[g]) for g in n_g)
        - 3.0 * (n + 1)
    )
    assert h >= -1e-9
    tie = sum(c**3 - c for c in vc.values())
    assert 0 <= tie <= n**3 - n
    if len(vc) > 1:
        assert tie < n**3 - n


@given(st.lists(st.integers(1, 6), min_size=4, max_size=100))
def test_kruskal_wallis_identical_groups_give_zero(vals):
    """Splitting ONE sample into equal halves by round-robin over a
    sorted copy gives rank sums proportional to sizes → H ≈ 0 when the
    two halves get identical multisets."""
    vals = sorted(vals)[: (len(vals) // 2) * 2]
    a, b = vals[0::2], vals[1::2]
    if Counter(a) != Counter(b):
        return
    vc = Counter(vals)
    r2 = rank2_map(vc)
    n = len(vals)
    ra, rb = sum(r2[v] for v in a), sum(r2[v] for v in b)
    assert ra == rb  # identical multisets share rank mass exactly
    h = (
        12.0 / (n * (n + 1))
        * (ra**2 / (4.0 * len(a)) + rb**2 / (4.0 * len(b)))
        - 3.0 * (n + 1)
    )
    assert abs(h) < 1e-6


# ------------------------------------------------------------ Friedman


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 10**6)),
        min_size=5,
        max_size=5,
    ),
    st.integers(2, 12),
)
def test_friedman_chi2_bounds(block_template, n_blocks):
    """For k=5 treatments over n complete blocks: 0 ≤ χ² ≤ n·(k−1)·
    12/(k(k+1))·…; concretely the rank-sum identity ΣR2j = n·k(k+1)
    holds and χ²_milli stays within [−ε, 3000·n·(k−1)] on the integer
    lattice (max when every block agrees on a strict order)."""
    k = 5
    r2_sum = Counter()
    for b in range(n_blocks):
        # rotate the template per block for variety, values may tie
        vals = [v for _, v in block_template]
        vals = vals[b % k :] + vals[: b % k]
        for trt, v in enumerate(vals):
            smaller = sum(1 for x in vals if x < v)
            equal = sum(1 for x in vals if x == v)
            r2_sum[trt] += 2 * smaller + equal + 1
    assert sum(r2_sum.values()) == n_blocks * k * (k + 1)
    ss2 = sum(r * r for r in r2_sum.values())
    chi2_milli = 3000 * ss2 // (n_blocks * k * (k + 1)) - 3000 * n_blocks * (k + 1)
    assert -1000 <= chi2_milli <= 3000 * n_blocks * (k - 1) + 1000


# ----------------------------------------------------------- Cochran Q


@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=2,
        max_size=200,
    )
)
def test_cochran_q_identities(blocks):
    """k·ΣRi − ΣRi² ≥ 0 always; the numerator k·ΣCj² − (ΣCj)² ≥ 0 by
    Cauchy-Schwarz; ΣRi == ΣCj (row/column totals agree)."""
    k = 3
    cj = [sum(int(b[j]) for b in blocks) for j in range(k)]
    ri = [sum(map(int, b)) for b in blocks]
    assert sum(ri) == sum(cj)
    num = k * sum(c * c for c in cj) - sum(cj) ** 2
    den = k * sum(ri) - sum(r * r for r in ri)
    assert num >= 0 and den >= 0
    if den > 0:
        q_milli = 1000 * (k - 1) * num // den
        assert q_milli >= 0
        # k=2 McNemar reduction: projecting onto treatments (0, 1) the
        # same formula must equal (b - c)^2 / (b + c) exactly.
        b = sum(1 for t in blocks if t[0] and not t[1])
        c = sum(1 for t in blocks if t[1] and not t[0])
        cj2 = [sum(int(t[j]) for t in blocks) for j in range(2)]
        ri2 = [int(t[0]) + int(t[1]) for t in blocks]
        num2 = 2 * sum(x * x for x in cj2) - sum(cj2) ** 2
        den2 = 2 * sum(ri2) - sum(r * r for r in ri2)
        assert num2 == (b - c) ** 2 and den2 == b + c
        if den2 > 0:
            assert 1000 * (2 - 1) * num2 // den2 == 1000 * (b - c) ** 2 // (b + c)


# ------------------------------------------------------- Durbin-Watson


@given(st.lists(st.integers(-10**6, 10**6), min_size=3, max_size=300))
def test_durbin_watson_range_law(xs):
    """On the n-scaled lattice DW = num/den lands in [0, 4]: num =
    Σ(nΔ)² ≤ 2·(Σ(nx−S)² doubled) by the parallelogram bound."""
    n, s = len(xs), sum(xs)
    den = sum((n * x - s) ** 2 for x in xs)
    if den == 0:
        return
    num = sum((n * b - n * a) ** 2 for a, b in zip(xs, xs[1:]))
    dw_milli = 1000 * num // den
    assert 0 <= dw_milli <= 4000


# ------------------------------------------------------------- G-test


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=10,
        max_size=500,
    )
)
def test_g_statistic_nonnegative(cells_draw):
    """G = 2ΣO·ln(O·N/(R·C)) ≥ 0 (it is 2N·KL(joint ‖ product)) — the
    law the e105 pin asserts up to per-cell quantization."""
    obs = Counter(cells_draw)
    rt, ct = Counter(), Counter()
    for (r, c), o in obs.items():
        rt[r] += o
        ct[c] += o
    n = sum(obs.values())
    g = 2 * sum(
        o * math.log(o * n / (rt[r] * ct[c])) for (r, c), o in obs.items()
    )
    assert g >= -1e-9


# ------------------------------------------------------------ CAS fold


@st.composite
def _proposals(draw):
    n = draw(st.integers(1, 7))
    return [
        (
            draw(st.integers(1, 5)),  # newv
            draw(st.one_of(st.none(), st.integers(0, 5))),  # expected
        )
        for _ in range(n)
    ]


def _replay(props):
    state, applied = 0, 0
    for newv, expected in props:
        if expected is not None and expected == state:
            state, applied = newv, applied + 1
    return state, applied


@given(_proposals())
def test_cas_applied_bounds_and_final_state_provenance(props):
    """applied ≤ #proposals, and the final state is either 0 (nothing
    ever applied) or the new-value of some APPLIED proposal."""
    state, applied = _replay(props)
    assert 0 <= applied <= len(props)
    if applied == 0:
        assert state == 0
    else:
        assert state in [nv for nv, _ in props]


@given(_proposals())
def test_cas_prefix_monotonicity(props):
    """applied counts are monotone over prefixes — replaying a longer
    ballot history can never UNDO an accept (the freeze law)."""
    prev = 0
    for i in range(1, len(props) + 1):
        _, a = _replay(props[:i])
        assert a >= prev
        prev = a


# ----------------------------------------------------- log2 bucketing


@given(st.integers(1, 2**40 - 1))
def test_log2_bucket_partition_law(size):
    """Exactly one p in 0..40 satisfies 2^p ≤ size < 2^(p+1), and it is
    bit_length − 1 — the range-join bucketing a38 uses instead of
    FLOOR(ln x / ln 2)."""
    hits = [p for p in range(41) if (1 << p) <= size < (1 << (p + 1))]
    assert hits == [size.bit_length() - 1]


# ------------------------------------------------------- Page-Hinkley


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=200))
def test_page_hinkley_excursion_nonnegative_and_flat_series_silent(xs):
    """The excursion PH_t − min PH is ≥ 0 by construction, and a
    CONSTANT series never alarms (every dev term is 0 on the integer
    lattice because (1000·S_i) DIV i is exact for constant x)."""
    s = ph = 0
    run_min, devs = None, []
    for i, x in enumerate(xs, 1):
        s += x
        ph += 1000 * x - (1000 * s) // i
        run_min = ph if run_min is None else min(run_min, ph)
        devs.append(ph - run_min)
    assert all(d >= 0 for d in devs)
    if len(set(xs)) == 1:
        assert all(d == 0 for d in devs)


# ------------------------------------------------------ Heaps OLS law


@given(
    st.lists(st.integers(1, 10**6), min_size=2, max_size=8).filter(
        lambda v: len(set(v)) >= 2
    )
)
def test_heaps_slope_is_one_when_v_equals_n(ns):
    """If V(n) = n at every checkpoint (all-distinct corpus) the fitted
    slope is exactly 1 on the micro lattice (x == y pointwise)."""
    xs = [math.floor(math.log(n) * 1e6) for n in sorted(set(ns))]
    m = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    num, den = m * sxx - sx * sx, m * sxx - sx * sx
    assert 1000 * num // den == 1000


# ------------------------------------------------------------- MMR greedy


@st.composite
def _mmr_instance(draw):
    n = draw(st.integers(5, 10))
    dim = 4
    vecs = [
        tuple(draw(st.integers(-5, 5)) for _ in range(dim)) for _ in range(n)
    ]
    return vecs


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


@given(_mmr_instance())
def test_mmr_first_pick_is_pure_relevance_and_greedy_dominates(vecs):
    """Step 1 ignores redundancy (red=0) and maximizes pure relevance;
    every later pick's MMR score dominates every other REMAINING
    candidate's score at that step (the argmax definition), and — when
    all pairwise redundancies are nonnegative — never exceeds 7·rel of
    the first pick (with NEGATIVE dots, redundancy is a bonus and the
    ceiling genuinely does not hold: Hypothesis found the antiparallel
    counterexample that corrected this law)."""
    q = vecs[0]
    cand = list(range(1, len(vecs)))
    rel = {i: _dot(q, vecs[i]) for i in cand}
    first = min(cand, key=lambda i: (-rel[i], i))
    sel = [first]
    scores = [7 * rel[first]]
    nonneg = all(
        _dot(vecs[i], vecs[j]) >= 0 for i in cand for j in cand if i != j
    )
    for _ in range(min(3, len(cand) - 1)):
        best, allsc = None, []
        for c in cand:
            if c in sel:
                continue
            red = max(_dot(vecs[c], vecs[s]) for s in sel)
            sc = 7 * rel[c] - 3 * red
            allsc.append(sc)
            key = (-sc, c)
            if best is None or key < best[0]:
                best = (key, c, sc)
        sel.append(best[1])
        scores.append(best[2])
        assert best[2] == max(allsc)  # the argmax definition
    assert scores[0] == 7 * max(rel.values())
    if nonneg:
        # with nonnegative redundancy, step-1's pure relevance is a ceiling
        assert all(s <= scores[0] for s in scores[1:])
    assert len(set(sel)) == len(sel)


# ------------------------------------------------- Hamilton apportionment


@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=30).filter(
        lambda ws: sum(ws) > 0
    ),
    st.integers(1, 10**7),
)
def test_hamilton_apportionment_sums_to_budget_and_near_quota(ws, budget):
    wsum = sum(ws)
    base = [budget * w // wsum for w in ws]
    rem = [budget * w % wsum for w in ws]
    k = budget - sum(base)
    order = sorted(range(len(ws)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:k]:
        alloc[i] += 1
    assert sum(alloc) == budget
    # quota rule: every allocation is floor or ceil of the exact share
    for w, a in zip(ws, alloc):
        lo = budget * w // wsum
        assert a in (lo, lo + 1)


# -------------------------------------------------------- Hill estimator


@given(st.lists(st.integers(2, 10**6), min_size=12, max_size=200))
def test_hill_terms_nonnegative_and_alpha_positive(xs):
    xs = sorted(xs, reverse=True)
    k = min(10, len(xs) - 1)
    xk1 = xs[k]
    terms = [math.floor((math.log(x) - math.log(xk1)) * 1e6) for x in xs[:k]]
    # each log-ratio is >= 0 up to the floor's -1 at exact ties
    assert all(t >= -1 for t in terms)
    s = sum(terms)
    if s > 0:
        assert 1000 * k * 1_000_000 // s > 0


# --------------------------------------------- order-pattern classification


@given(st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 3)))
def test_permutation_pattern_code_is_a_permutation(t):
    """The 3-digit less-than-count code is always a permutation of
    {0,1,2} under the (value, index) tie rule — exactly 6 possible
    codes, each digit distinct."""
    v = [(t[0], 0), (t[1], 1), (t[2], 2)]
    digits = [sum(1 for w in v if w < x) for x in v]
    assert sorted(digits) == [0, 1, 2]


# ------------------------------------------------------- Benford masses


def test_benford_second_digit_masses_sum_to_one():
    micro = {
        0: 119679, 1: 113890, 2: 108821, 3: 104329, 4: 100308,
        5: 96677, 6: 93374, 7: 90351, 8: 87570, 9: 84997,
    }
    # floors lose < 1 micro each; the ten masses must cover (1e6 - 10, 1e6]
    assert 1_000_000 - 10 <= sum(micro.values()) <= 1_000_000
    for d in range(10):
        exact = sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
        assert micro[d] == math.floor(exact * 1e6)
    # second-digit masses are monotonically decreasing in d
    assert all(micro[d] > micro[d + 1] for d in range(9))


# ---------------------------------------------------- nearest-event rule


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.sampled_from("cp")),
        min_size=1,
        max_size=40,
    )
)
def test_nearest_event_delta_is_minimal(evts):
    """The prev/next window construction finds the true nearest click
    for every purchase (ties to prev) — checked against brute force."""
    evts = sorted((t, i, k) for i, (t, k) in enumerate(evts))
    clicks = [t for t, _, k in evts if k == "c"]
    for t, _, k in evts:
        if k != "p" or not clicks:
            continue
        prev = max((c for c in clicks if c <= t), default=None)
        nxt = min((c for c in clicks if c >= t), default=None)
        if prev is not None and (nxt is None or t - prev <= nxt - t):
            chosen = t - prev
        else:
            chosen = nxt - t
        brute = min(abs(c - t) for c in clicks)
        assert chosen == brute
