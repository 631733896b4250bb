"""Round-11 pins: the j72 bit-parallel-LCS conversion (VERDICT r10
item 3).  The oa/BTI codec pins live in tests/test_sstable_oa.py; the
query-level certification is the oracle mirror + driver window."""

from __future__ import annotations

import random

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def _lcs_dp(x: list, y: list) -> int:
    """Textbook rolling-row DP — the independent reference."""
    prev = [0] * (len(y) + 1)
    for xi in x:
        cur = [0]
        for j, yj in enumerate(y, 1):
            cur.append(prev[j - 1] + 1 if xi == yj else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def _lcs_bitparallel(x: list, y: list) -> int:
    """The Allison-Dix/Hyyrö word fold exactly as both engines run it:
    V' = ((V + (V & M)) | (V − (V & M))) masked to |y| bits,
    LCS = |y| − popcount(V)."""
    n = len(y)
    if n == 0 or len(x) == 0:
        return 0
    mask = (1 << n) - 1
    v = mask
    for xe in x:
        m = 0
        for j, yj in enumerate(y):
            if yj == xe:
                m |= 1 << j
        u = v & m
        v = ((v + u) | (v - u)) & mask
    return n - bin(v).count("1")


def test_bitparallel_lcs_equals_dp_random_sweep():
    """5000 random token-sequence pairs (alphabet 6, lengths 0..30 — the
    exact domain j72 runs on): the bit-parallel recurrence must equal
    the full DP everywhere.  This is the pin the j72 docstring cites."""
    rng = random.Random(11)
    alpha = ["a", "b", "c", "d", "e", "f"]
    for _ in range(5000):
        x = [rng.choice(alpha) for _ in range(rng.randint(0, 30))]
        y = [rng.choice(alpha) for _ in range(rng.randint(0, 30))]
        assert _lcs_bitparallel(x, y) == _lcs_dp(x, y), (x, y)


def test_bitparallel_lcs_known_values():
    assert _lcs_bitparallel(list("abcbdab"), list("bdcaba")) == 4
    assert _lcs_bitparallel(["tok"] * 30, ["tok"] * 30) == 30
    assert _lcs_bitparallel([""], [""]) == 1  # empty-text token parity
    assert _lcs_bitparallel(list("abc"), list("xyz")) == 0


def test_j72_is_sql_oracled_now():
    """The round-11 conversion contract: j72 carries a DuckDB oracle and
    the engine path is registered (hash certification happens in the
    driver window / oracle mirror, not here)."""
    q = REGISTRY["j72_rouge_l"]
    assert q.oracle is not None and "list_reduce" in q.oracle


# ---------------------------------------------------------------------------
# Batch-2 pins: independent pure-Python third implementations of the
# round-11 stats tier (f62 Dickey-Fuller, e129 Bartlett, e130 Page,
# e131 Ansari-Bradley, e132 Stuart-Maxwell), recomputed from raw
# parquet so a Spark+DuckDB twin bug cannot hide behind a matching
# hash.  Integer outputs assert EXACT equality; shared-IEEE floats
# assert tight relative tolerance.
# ---------------------------------------------------------------------------

import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _daily_mean_cents():
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        d = ts.timestamp() if hasattr(ts, "timestamp") else ts / 1e6
        day = int(d * 1_000_000) // 86400000000
        cents = int(Decimal(v * 100).quantize(Decimal(1), ROUND_HALF_UP))
        cell = per[et][day]
        cell[0] += cents
        cell[1] += 1
    out = {}
    for et, days in per.items():
        xs = []
        for day in sorted(days):
            s, n = days[day]
            xs.append(s // n if s >= 0 else -((-s + n - 1) // n) if s % n else s // n)
        # truncating DIV toward negative infinity == floor for positives;
        # Spark/DuckDB DIV truncates toward zero — daily sums here are
        # positive at every shipped SF, so floor == trunc.
        out[et] = [days[day][0] // days[day][1] for day in sorted(days)]
    return out


def test_f62_dickey_fuller_matches_numpy(spark):
    series = _daily_mean_cents()
    got = {
        r.event_type: r
        for r in REGISTRY["f62_dickey_fuller"].fn(spark, SF).collect()
    }
    assert set(got) == set(series)
    for et, xs in series.items():
        z = xs[:-1]
        y = [b - a for a, b in zip(xs, xs[1:])]
        n = len(y)
        sz, sy = sum(z), sum(y)
        szz = sum(v * v for v in z)
        szy = sum(a * b for a, b in zip(z, y))
        syy = sum(v * v for v in y)
        zz_p = n * szz - sz * sz
        zy_p = n * szy - sz * sy
        yy_p = n * syy - sy * sy
        r = got[et]
        assert (r.n_obs, r.zz_p, r.zy_p, r.yy_p) == (n, zz_p, zy_p, yy_p)
        rho = zy_p / zz_p
        s2 = (yy_p - zy_p * (zy_p / zz_p)) / n / (n - 2)
        want_df = rho / math.sqrt(n * s2 / zz_p)
        assert abs(r.df_stat - want_df) < 1e-9 * max(1.0, abs(want_df))
        # numpy cross-check of the regression slope itself
        import numpy as np

        A = np.vstack([np.ones(n), np.array(z, dtype=float)]).T
        coef, *_ = np.linalg.lstsq(A, np.array(y, dtype=float), rcond=None)
        assert abs(coef[1] - rho) < 1e-9 * max(1.0, abs(rho))


def test_e129_bartlett_matches_formula(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    groups = defaultdict(list)
    for g, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        groups[g].append(round(q * 100))
    terms_micro = 0
    ssq_micro = 0
    inv_micro = 0
    n_tot = 0
    k = len(groups)
    for xs in groups.values():
        n = len(xs)
        m = sum(xs) // n
        d1 = sum(x - m for x in xs)
        d2 = sum((x - m) * (x - m) for x in xs)
        var = (d2 - d1 * d1 / n) / (n - 1)
        terms_micro += round(1_000_000 * (n - 1) * math.log(var))
        ssq_micro += round(1_000_000 * (n - 1) * var)
        inv_micro += round(1_000_000 / (n - 1))
        n_tot += n
    want_t = (
        (n_tot - k) * math.log(ssq_micro / 1_000_000 / (n_tot - k))
        - terms_micro / 1_000_000
    ) / (1 + (inv_micro / 1_000_000 - 1.0 / (n_tot - k)) / (3 * (k - 1)))
    r = REGISTRY["e129_bartlett_variance"].fn(spark, SF).collect()[0]
    assert (r.n_tot, r.k, r.terms_micro) == (n_tot, k, terms_micro)
    assert abs(r.bartlett_t - want_t) < 1e-9 * max(1.0, abs(want_t))
    # scipy cross-check on the same data (statistic only, formula route)
    try:
        from scipy import stats as sps

        T, _p = sps.bartlett(*groups.values())
        assert abs(T - want_t) < 5e-3 * max(1.0, abs(T))  # micro-rounding slack
    except ImportError:
        pass


def test_e130_page_trend_matches_python(spark):
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = dict(zip(c.column(0).to_pylist(), c.column(1).to_pylist()))
    cells = defaultdict(int)
    for ck, pr, price in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        cells[(nat[ck], int(pr[0]))] += round(price * 100)
    blocks = defaultdict(dict)
    for (blk, j), v in cells.items():
        blocks[blk][j] = v
    complete = {b: trts for b, trts in blocks.items() if len(trts) == 5}
    r2_sum = defaultdict(int)
    for trts in complete.values():
        vs = trts.items()
        for j, v in vs:
            rank2 = (
                2 * sum(1 for _, v2 in vs if v2 < v)
                + sum(1 for _, v2 in vs if v2 == v)
                + 1
            )
            r2_sum[j] += rank2
    b = len(complete)
    l2 = sum(j * s for j, s in r2_sum.items())
    want_z = (l2 - b * 5 * 36 / 2) / math.sqrt(b * 25 * 6 * 24 / 36)
    got = {r.j: r for r in REGISTRY["e130_page_trend"].fn(spark, SF).collect()}
    for j in range(1, 6):
        assert got[j].r2_sum == r2_sum[j]
        assert got[j].b == b and got[j].l2 == l2
        assert abs(got[j].z_stat - want_z) < 1e-9 * max(1.0, abs(want_z))


def test_e131_ansari_bradley_matches_python(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    xs, ys = [], []
    for g, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        if g == "R":
            xs.append(int(q))
        elif g == "A":
            ys.append(int(q))
    hist = defaultdict(lambda: [0, 0])
    for v in xs:
        hist[v][0] += 1
    for v in ys:
        hist[v][1] += 1
    n_tot = len(xs) + len(ys)
    cum = 0
    w2x = s2tot = ss2q = 0
    for v in sorted(hist):
        cx, cy = hist[v]
        c = cx + cy
        m2 = 2 * cum + c + 1
        s2 = min(m2, 2 * (n_tot + 1) - m2)
        w2x += cx * s2
        s2tot += c * s2
        ss2q += c * s2 * s2
        cum += c
    n1, n2 = len(xs), len(ys)
    want_z = (w2x - n1 * s2tot / (n1 + n2)) / math.sqrt(
        n1 * n2 * ((n1 + n2) * ss2q - s2tot * s2tot)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    r = REGISTRY["e131_ansari_bradley"].fn(spark, SF).collect()[0]
    assert (r.n1, r.n2, r.w2x, r.s2tot, r.ss2q) == (n1, n2, w2x, s2tot, ss2q)
    assert abs(r.z_stat - want_z) < 1e-9 * max(1.0, abs(want_z))
    # scipy convention cross-check: scipy.stats.ansari's AB statistic is
    # the (undoubled) X-sample score sum — w2x must equal 2*AB exactly
    try:
        from scipy import stats as sps

        ab = sps.ansari(xs, ys)
        assert w2x == round(2 * ab.statistic)
    except ImportError:
        pass


def test_e132_stuart_maxwell_matches_python(spark):
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"],
    )
    percust = defaultdict(list)
    for ck, pr, dt, ok in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(),
        t.column(2).to_pylist(), t.column(3).to_pylist(),
    ):
        day = int(dt.timestamp() * 1_000_000) // 86400000000
        digit = int(pr[0])
        cls = 0 if digit <= 2 else (1 if digit == 3 else 2)
        percust[ck].append((day * 10_000_000_000 + ok, cls))
    n = defaultdict(int)
    for orders in percust.values():
        if len(orders) < 2:
            continue
        orders.sort()
        n[(orders[0][1], orders[-1][1])] += 1
    r0 = sum(c for (a, _b), c in n.items() if a == 0)
    r1 = sum(c for (a, _b), c in n.items() if a == 1)
    c0 = sum(c for (_a, b), c in n.items() if b == 0)
    c1 = sum(c for (_a, b), c in n.items() if b == 1)
    n00, n11 = n[(0, 0)], n[(1, 1)]
    n01, n10 = n[(0, 1)], n[(1, 0)]
    d0, d1 = r0 - c0, r1 - c1
    s00 = r0 + c0 - 2 * n00
    s11 = r1 + c1 - 2 * n11
    s01 = -(n01 + n10)
    num = s11 * d0 * d0 - 2 * s01 * d0 * d1 + s00 * d1 * d1
    den = s00 * s11 - s01 * s01
    want_chi2_milli = 1000 * num // den if (1000 * num) >= 0 else -((-1000 * num) // den)
    r = REGISTRY["e132_stuart_maxwell"].fn(spark, SF).collect()[0]
    assert (r.d0, r.d1, r.s00, r.s11, r.s01) == (d0, d1, s00, s11, s01)
    assert r.n_pairs == sum(n.values())
    assert r.chi2_milli == want_chi2_milli
    assert den > 0 and r.chi2_milli >= 0


# ------------------------------------------------------------- batch 3 pins

import hashlib
import re as _re


def _norm_tokens(text: str) -> list[str]:
    return _re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _docs():
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return list(
        zip(t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist())
    )


def test_j137_stupid_backoff_matches_python(spark):
    docs = _docs()
    from collections import Counter

    tri, big, uni = Counter(), Counter(), Counter()
    for did, _src, text in docs:
        if did % 2 != 0:
            continue
        w = _norm_tokens(text)
        uni.update(w)
        big.update(zip(w, w[1:]))
        tri.update(zip(w, w[1:], w[2:]))
    nt, nv = sum(uni.values()), len(uni)
    want = {}
    fired = [0, 0, 0]
    for did, src, text in docs:
        if did % 2 != 1:
            continue
        w = _norm_tokens(text)
        if len(w) < 3:
            continue
        s_micro = 0
        tiers = [0, 0, 0]
        for g in zip(w, w[1:], w[2:]):
            if g in tri:
                s = tri[g] / big[(g[0], g[1])]
                tiers[0] += 1
            elif (g[1], g[2]) in big:
                s = (2 / 5) * (big[(g[1], g[2])] / uni[g[1]])
                tiers[1] += 1
            else:
                s = (2 / 5) * (2 / 5) * ((uni.get(g[2], 0) + 1) / (nt + nv))
                tiers[2] += 1
            s_micro += round(math.log(s) * 1_000_000)
        want[did] = (src, len(w) - 2, s_micro, *tiers)
        for i in range(3):
            fired[i] += tiers[i]
    got = {
        r.doc_id: (r.source, r.n_trigrams, r.sb_micro, r.n_tri_hits,
                   r.n_big_backoffs, r.n_uni_backoffs)
        for r in REGISTRY["j137_stupid_backoff"].fn(spark, SF).collect()
    }
    assert got == want
    # discrimination: ALL THREE backoff tiers must fire on the fixture
    assert all(f > 0 for f in fired), fired


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_j138_quality_classifier_matches_python(spark):
    docs = _docs()
    weights = {h: _h60(f"qw:{h}") % 2001 - 1000 for h in range(1024)}
    agg = {}
    for did, src, text in docs:
        toks = _norm_tokens(text)
        score = sum(weights[_h60(f"qf:{t}") % 1024] for t in toks)
        n = len(toks)
        p = 1 / (1 + math.exp(-(score / 1000 / n)))
        bucket = math.floor(p * 10)
        key = (src, bucket)
        a = agg.setdefault(key, [0, 0, 0])
        a[0] += 1
        a[1] += score
        a[2] += n
    got = {
        (r.source, r.bucket): (r.n_docs, r.sum_score_milli, r.sum_tokens)
        for r in REGISTRY["j138_quality_classifier"].fn(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # discrimination: more than one bucket must appear
    assert len({b for _s, b in got}) > 1


def test_b24_phi_accrual_matches_python(spark):
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    beats = defaultdict(list)
    for uid, ts in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        beats[uid % 8].append(int(ts.timestamp() * 1_000_000))
    now = max(max(v) for v in beats.values())
    want = {}
    for node, ts_list in beats.items():
        ts_list.sort()
        gaps = [b - a for a, b in zip(ts_list, ts_list[1:])]
        mean = sum(gaps) // len(gaps)
        cur = now - ts_list[-1]
        phi = cur / (mean * math.log(10))
        want[node] = (
            len(gaps), mean, cur, round(1000 * phi), 1 if phi >= 8 else 0
        )
    got = {
        r.node: (r.n_gaps, r.mean_us, r.cur_gap_us, r.phi_milli, r.suspect)
        for r in REGISTRY["b24_phi_accrual"].fn(spark, SF).collect()
    }
    assert got == want


def test_e133_welch_anova_matches_formula(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    groups = defaultdict(list)
    for g, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        groups[g].append(round(q * 100))
    k = len(groups)
    per = []
    for xs in groups.values():
        n = len(xs)
        m = sum(xs) // n
        d1 = sum(x - m for x in xs)
        d2 = sum((x - m) * (x - m) for x in xs)
        var = (d2 - d1 * d1 / n) / (n - 1)
        w_nano = round(1_000_000_000 * (n / var))
        wx_nano = round(1_000_000_000 * (n / var) * (sum(xs) / n))
        per.append((n, sum(xs), w_nano, wx_nano))
    w_tot = sum(p[2] for p in per)
    wx_tot = sum(p[3] for p in per)
    a_micro = sum(
        round(
            1_000_000 * (w_nano / 1_000_000_000)
            * ((sx / n) - (wx_tot / w_tot)) ** 2
        )
        for n, sx, w_nano, _wx in per
    )
    b_nano = sum(
        round(1_000_000_000 * (1 - w_nano / w_tot) ** 2 / (n - 1))
        for n, _sx, w_nano, _wx in per
    )
    want_f = (a_micro / 1_000_000 / (k - 1)) / (
        1 + (2 * (k - 2) / (k * k - 1)) * (b_nano / 1_000_000_000)
    )
    want_df2 = ((k * k - 1) / 3) / (b_nano / 1_000_000_000)
    r = REGISTRY["e133_welch_anova"].fn(spark, SF).collect()[0]
    assert (r.k, r.a_micro, r.b_nano) == (k, a_micro, b_nano)
    assert abs(r.welch_f - want_f) < 1e-9 * max(1.0, abs(want_f))
    assert abs(r.df2 - want_df2) < 1e-9 * max(1.0, want_df2)
    # lattice-free textbook Welch F (floats all the way): the nano/micro
    # lattice must agree to ~1e-4 relative — a formula error would not
    import statistics

    ws, wxs = [], []
    for xs in groups.values():
        n = len(xs)
        var = statistics.variance(xs)
        ws.append(n / var)
        wxs.append((n / var) * (sum(xs) / n))
    W = sum(ws)
    xw = sum(wxs) / W
    A = sum(
        w * ((sum(xs) / len(xs)) - xw) ** 2
        for w, xs in zip(ws, groups.values())
    ) / (k - 1)
    B = sum(
        (1 - w / W) ** 2 / (len(xs) - 1)
        for w, xs in zip(ws, groups.values())
    )
    free_f = A / (1 + (2 * (k - 2) / (k * k - 1)) * B)
    assert abs(want_f - free_f) < 1e-4 * max(1.0, abs(free_f))


def test_f63_croston_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    per = defaultdict(lambda: defaultdict(int))
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        day = int(ts.timestamp() * 1_000_000) // 86400000000
        per[et][day] += int(Decimal(v * 100).quantize(Decimal(1), ROUND_HALF_UP))
    want = {}
    for et, days in per.items():
        demand = [
            (d, x)
            for d, x in sorted(days.items())
            if _h60(f"{et}:{d}") % 10 < 4
        ]
        gaps = [b - a for (a, _), (b, _) in zip(demand, demand[1:])]
        # genuine intermittency: mean interval strictly > 1 day
        assert sum(gaps) / len(gaps) > 1, (et, gaps)
        z, p = demand[0][1], 1000
        for (d, x), gap in zip(demand[1:], gaps):
            z = (x + 4 * z) // 5
            p = (1000 * gap + 4 * p) // 5
        want[et] = (len(demand), z, p, 1_000_000 * z // p)
    got = {
        r.event_type: (r.n_demands, r.z_cents, r.p_milli, r.rate_milli)
        for r in REGISTRY["f63_croston"].fn(spark, SF).collect()
    }
    assert got == want


def test_e134_fisher_z_matches_numpy(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_discount"]
    )
    groups = defaultdict(lambda: ([], []))
    for g, q, disc in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        if g in ("R", "A"):
            groups[g][0].append(int(q))
            groups[g][1].append(round(disc * 100))
    stats = {}
    for g, (xs, ys) in groups.items():
        n = len(xs)
        mx, my = sum(xs) // n, sum(ys) // n
        dx = sum(x - mx for x in xs)
        dy = sum(y - my for y in ys)
        dxx = sum((x - mx) ** 2 for x in xs)
        dyy = sum((y - my) ** 2 for y in ys)
        dxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        r = (dxy - dx * dy / n) / math.sqrt(
            (dxx - dx * dx / n) * (dyy - dy * dy / n)
        )
        stats[g] = (n, r, (1 / 2) * math.log((1 + r) / (1 - r)))
        # numpy cross-check of r itself
        import numpy as np

        r_np = np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1]
        assert abs(r - r_np) < 1e-9
    n1, r1, z1 = stats["R"]
    n2, r2, z2 = stats["A"]
    want_z = (z1 - z2) / math.sqrt(1 / (n1 - 3) + 1 / (n2 - 3))
    row = REGISTRY["e134_fisher_z_corr_compare"].fn(spark, SF).collect()[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.r1_micro == round(1_000_000 * r1)
    assert row.r2_micro == round(1_000_000 * r2)
    assert abs(row.z_stat - want_z) < 1e-9 * max(1.0, abs(want_z))


def test_j139_rbo_weights_and_python_replay(spark):
    """The persistence weights must be the micro-rounded 0.9^(d-1)
    (the j134 pinned-constant rule), and the whole RBO fold must match
    an independent python replay from the raw embeddings."""
    from cassandra_snap_to_hadoop_spark.queries.round11 import _J139_W

    for d, w in _J139_W:
        assert w == round((0.9 ** (d - 1)) * 1_000_000)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [round(float(x) * 100) for x in emb]
        for vid, emb in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }
    want = {}
    for qid in range(8):
        if qid not in vecs:
            continue
        qv = vecs[qid]
        scored = []
        for nid, ev in vecs.items():
            if nid == qid:
                continue
            dot = sum(a * b for a, b in zip(qv, ev))
            dist2 = sum((a - b) * (a - b) for a, b in zip(qv, ev))
            scored.append((nid, dot, dist2))
        r_dot = {
            nid: i + 1
            for i, (nid, _d, _l) in enumerate(
                sorted(scored, key=lambda s: (-s[1], s[0]))
            )
        }
        r_l2 = {
            nid: i + 1
            for i, (nid, _d, _l) in enumerate(
                sorted(scored, key=lambda s: (s[2], s[0]))
            )
        }
        rbo_nano = 0
        x10 = None
        for d, w in _J139_W:
            x_d = sum(
                1 for nid in r_dot if r_dot[nid] <= d and r_l2[nid] <= d
            )
            rbo_nano += 1000 * w * x_d // d
            if d == 10:
                x10 = x_d
        want[qid] = (x10, rbo_nano // 10)
    got = {
        r.query_id: (r.x10, r.rbo_nano)
        for r in REGISTRY["j139_rank_biased_overlap"].fn(spark, SF).collect()
    }
    assert got == want
    # discrimination: the two rankings genuinely differ (RBO < max) and
    # genuinely agree somewhat (RBO > 0) somewhere
    vals = [v[1] for v in got.values()]
    assert any(v > 0 for v in vals) and any(v < 1_000_000_000 for v in vals)
