"""Round-8 continuation pins: independent pure-Python third
implementations of the nonparametric k-sample / paired / blocked tier
(e101 Kruskal-Wallis, e102 Wilcoxon signed-rank, e103 Friedman, e104
Cochran's Q) so a Spark+DuckDB twin bug cannot hide behind a matching
hash.  Integer sufficient statistics assert EXACT equality; the two
milli-floored double-chain statistics (e101 H, e102 z) allow ±1 milli
for python-vs-engine summation-order ulps.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _rank2_map(counter: Counter) -> dict:
    """value -> doubled tie-averaged rank (2*#smaller + #equal + 1)."""
    out, cum = {}, 0
    for v in sorted(counter):
        c = counter[v]
        out[v] = 2 * cum + c + 1
        cum += c
    return out


def test_e101_kruskal_wallis_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    gs = t.column(0).to_pylist()
    vs = [int(round(q)) for q in t.column(1).to_pylist()]
    vc = Counter(vs)
    r2 = _rank2_map(vc)
    n_g, r2_sum = Counter(), Counter()
    for g, v in zip(gs, vs):
        n_g[g] += 1
        r2_sum[g] += r2[v]
    n = sum(n_g.values())
    tie_sum = sum(c * c * c - c for c in vc.values())
    row = REGISTRY["e101_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row.n == n and row.tie_sum == tie_sum
    for flag, nc, rc in (("A", "n_a", "r2_a"), ("N", "n_n", "r2_n"),
                         ("R", "n_r", "r2_r")):
        assert row[nc] == n_g[flag] and row[rc] == r2_sum[flag], flag
    h = (
        12.0 / (n * (n + 1))
        * sum(r2_sum[g] ** 2 / (4.0 * n_g[g]) for g in ("A", "N", "R"))
        - 3.0 * (n + 1)
    )
    corr = 1.0 - tie_sum / (float(n) ** 3 - n)
    assert abs(row.h_milli - math.floor(h * 1000)) <= 1
    assert abs(row.h_tied_milli - math.floor(h / corr * 1000)) <= 1
    # H must be chi-square-scaled: nonnegative after tie correction
    assert row.h_tied_milli >= row.h_milli >= 0


def test_e102_wilcoxon_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    d = defaultdict(int)
    for u, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        day = (
            int(ts.timestamp() * 1_000_000) // 86_400_000_000
            if hasattr(ts, "timestamp")
            else int(ts) // 86_400_000_000
        )
        cents = int(round(v * 100))
        d[u] += cents if day % 2 == 1 else -cents
    diffs = [x for x in d.values() if x != 0]
    ac = Counter(abs(x) for x in diffs)
    r2 = _rank2_map(ac)
    n = len(diffs)
    w2p = sum(r2[abs(x)] for x in diffs if x > 0)
    w2m = sum(r2[abs(x)] for x in diffs if x < 0)
    tie_sum = sum(c * c * c - c for c in ac.values())
    row = REGISTRY["e102_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.w2_plus, row.w2_minus, row.tie_sum) == (n, w2p, w2m, tie_sum)
    # closed-form rank-sum law on the doubled lattice
    assert row.w2_plus + row.w2_minus == n * (n + 1)
    z = (w2p / 2.0 - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie_sum / 48.0
    )
    assert abs(row.z_milli - math.floor(z * 1000)) <= 1


def test_e103_friedman_python_replay(spark, sf_dir):
    o = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = dict(zip(c.column(0).to_pylist(), c.column(1).to_pylist()))
    cells = defaultdict(int)
    for ck, pr, tp in zip(
        o.column(0).to_pylist(), o.column(1).to_pylist(), o.column(2).to_pylist()
    ):
        cells[(nation[ck], pr)] += int(round(tp * 100))
    by_blk = defaultdict(dict)
    for (blk, trt), v in cells.items():
        by_blk[blk][trt] = v
    complete = {b: tv for b, tv in by_blk.items() if len(tv) == 5}
    r2_sum = Counter()
    for tv in complete.values():
        vals = list(tv.values())
        for trt, v in tv.items():
            smaller = sum(1 for x in vals if x < v)
            equal = sum(1 for x in vals if x == v)
            r2_sum[trt] += 2 * smaller + equal + 1
    nb = len(complete)
    ss2 = sum(r * r for r in r2_sum.values())
    chi2_milli = 3000 * ss2 // (nb * 5 * 6) - 3000 * nb * 6
    rows = REGISTRY["e103_friedman_test"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.r2_sum == r2_sum[r.trt], r.trt
        assert r.n_blocks == nb and r.chi2_milli == chi2_milli
    # within every complete block the five rank2 values sum to 2*k(k+1)/2
    assert sum(r2_sum.values()) == nb * 5 * 6


def test_e104_cochran_q_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_discount", "l_tax"],
    )
    flags = defaultdict(lambda: [0, 0, 0])
    for k, rf, dc, tx in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(),
        t.column(2).to_pylist(), t.column(3).to_pylist(),
    ):
        f = flags[k]
        if rf == "R":
            f[0] = 1
        if int(round(dc * 100)) >= 5:
            f[1] = 1
        if int(round(tx * 100)) >= 5:
            f[2] = 1
    nb = len(flags)
    cj = [sum(f[j] for f in flags.values()) for j in range(3)]
    sum_r = sum(sum(f) for f in flags.values())
    sum_r2 = sum(sum(f) ** 2 for f in flags.values())
    den = 3 * sum_r - sum_r2
    q_milli = (
        1000 * (2 * (3 * sum(c * c for c in cj) - sum_r * sum_r)) // den
        if den > 0
        else None
    )
    row = REGISTRY["e104_cochran_q"].fn(spark, sf_dir).collect()[0]
    assert (row.n_blocks, row.c_ret, row.c_disc, row.c_tax) == (
        nb, cj[0], cj[1], cj[2],
    )
    assert (row.sum_r, row.sum_r2, row.q_milli) == (sum_r, sum_r2, q_milli)
    assert sum_r == sum(cj)  # row/column total identity


def _events():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    out = []
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        day = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        out.append((et, day, int(round(v * 100))))
    return out


def test_f45_ljung_box_python_replay(spark, sf_dir):
    daily = Counter()
    for _, day, _ in _events():
        daily[day] += 1
    days = sorted(daily)
    n, s = len(days), sum(daily.values())
    d = sum((n * daily[t] - s) ** 2 for t in days)
    m = {}
    for k in range(1, 8):
        m[k] = sum(
            (n * daily[t] - s) * (n * daily[t + k] - s)
            for t in days
            if t + k in daily
        )
    q = (
        n * (n + 2)
        * sum((m[k] / d) * (m[k] / d) / (n - k) for k in range(1, 8))
    )
    row = REGISTRY["f45_ljung_box"].fn(spark, sf_dir).collect()[0]
    assert row.n == n and row.den_scaled == d
    for k in range(1, 8):
        assert row[f"m{k}"] == m[k], k
    assert abs(row.q_milli - math.floor(q * 1000)) <= 1
    assert row.q_milli >= 0  # Q is a sum of squares scaled by positives


def test_f46_durbin_watson_python_replay(spark, sf_dir):
    daily = defaultdict(int)
    for et, day, cents in _events():
        daily[(et, day)] += cents
    by_type = defaultdict(dict)
    for (et, day), x in daily.items():
        by_type[et][day] = x
    rows = {r.event_type: r for r in
            REGISTRY["f46_durbin_watson"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(by_type)
    for et, series in by_type.items():
        n, s = len(series), sum(series.values())
        den = sum((n * x - s) ** 2 for x in series.values())
        pairs = [(t, t + 1) for t in series if t + 1 in series]
        num = sum((n * series[b] - n * series[a]) ** 2 for a, b in pairs)
        r = rows[et]
        assert (r.n_days, r.n_pairs) == (n, len(pairs)), et
        assert (r.num_scaled, r.den_scaled) == (num, den), et
        assert r.dw_milli == 1000 * num // den, et
        assert 0 <= r.dw_milli <= 4000  # DW lives in [0, 4]


def _orders_with_segment():
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(c.column(0).to_pylist(), c.column(1).to_pylist()))
    return [
        (pr, seg[ck])
        for ck, pr in zip(o.column(0).to_pylist(), o.column(1).to_pylist())
    ]


def test_e105_g_test_python_replay(spark, sf_dir):
    cells, rt, ct = Counter(), Counter(), Counter()
    for pr, sg in _orders_with_segment():
        cells[(pr, sg)] += 1
        rt[pr] += 1
        ct[sg] += 1
    n = sum(cells.values())
    rows = REGISTRY["e105_g_test"].fn(spark, sf_dir).collect()
    assert len(rows) == len(cells)
    g_q = 0
    for r in rows:
        o = cells[(r.pr, r.seg)]
        assert r.o == o and r.row_total == rt[r.pr] and r.col_total == ct[r.seg]
        term = math.floor(o * math.log(o * n / (rt[r.pr] * ct[r.seg])) * 1e6)
        assert abs(r.term_micro - term) <= 1, (r.pr, r.seg)
        g_q += r.term_micro
    assert all(r.g2_micro == 2 * g_q for r in rows)
    # G >= 0 up to per-cell quantization (<= 1 micro each)
    assert rows[0].g2_micro >= -2 * len(cells)


def test_e106_odds_ratio_python_replay(spark, sf_dir):
    a = b = c = d = 0
    for pr, sg in _orders_with_segment():
        e, y = sg == "BUILDING", pr == "1-URGENT"
        if e and y:
            a += 1
        elif e:
            b += 1
        elif y:
            c += 1
        else:
            d += 1
    row = REGISTRY["e106_odds_ratio_woolf"].fn(spark, sf_dir).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    assert row.or_milli == 1000 * a * d // (b * c)
    assert abs(row.lnor_micro - math.floor(math.log(a * d / (b * c)) * 1e6)) <= 1
    assert abs(
        row.se_micro
        - math.floor(math.sqrt(1 / a + 1 / b + 1 / c + 1 / d) * 1e6)
    ) <= 1
    assert row.ci_lo_ln_micro == row.lnor_micro - 1960 * row.se_micro // 1000
    assert row.ci_hi_ln_micro == row.lnor_micro + 1960 * row.se_micro // 1000
    assert row.ci_lo_ln_micro < row.lnor_micro < row.ci_hi_ln_micro


import re as _re


def _docs(cols):
    t = pq.read_table(f"{SF}/documents.parquet", columns=cols)
    return list(zip(*[t.column(i).to_pylist() for i in range(len(cols))]))


def _norm_words(text):
    norm = _re.sub(r"\s+", " ", text.lower()).strip()
    return norm, norm.split(" ")


def test_j117_heaps_law_python_replay(spark, sf_dir):
    by_source = defaultdict(list)
    for src, did, text in _docs(["source", "doc_id", "text"]):
        by_source[src].append((did, _norm_words(text)[1]))
    rows = {r.source: r for r in
            REGISTRY["j117_heaps_law"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(by_source)
    for src, docs in by_source.items():
        docs.sort()
        seen, pts_by_rank = set(), {}
        n_cum = 0
        for rnk, (did, ws) in enumerate(docs, 1):
            n_cum += len(ws)
            seen |= set(ws)
            pts_by_rank[rnk] = (n_cum, len(seen))
        nd = len(docs)
        cps = sorted({max(1, (j * nd) // 8) for j in range(1, 9)})
        xs = [math.floor(math.log(pts_by_rank[r][0]) * 1e6) for r in cps]
        ys = [math.floor(math.log(pts_by_rank[r][1]) * 1e6) for r in cps]
        m = len(cps)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        r = rows[src]
        assert (r.m, r.sx, r.sy, r.sxy, r.sxx) == (m, sx, sy, sxy, sxx), src
        num, den = m * sxy - sx * sy, m * sxx - sx * sx
        assert r.beta_milli == 1000 * num // den, src
        lnk = (sy / m - (num / den) * sx / m) / 1000
        assert abs(r.lnk_milli - math.floor(lnk)) <= 1, src


def test_j118_flesch_kincaid_python_replay(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, sentences, syllables
    for src, text in _docs(["source", "text"]):
        norm, ws = _norm_words(text)
        a = agg[src]
        a[0] += 1
        a[1] += len(ws)
        a[2] += max(len(_re.findall(r"[.!?]+", text)), 1)
        a[3] += len(_re.findall(r"[aeiouy]+", norm))
    rows = {r.source: r for r in
            REGISTRY["j118_flesch_kincaid"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for src, (nd, w, st, y) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_words, r.n_sentences, r.n_syllables) == (nd, w, st, y)
        fk = 0.39 * w / st + 11.8 * y / w - 15.59
        fre = 206.835 - 1.015 * w / st - 84.6 * y / w
        assert abs(r.fk_grade_milli - math.floor(fk * 1000)) <= 1, src
        assert abs(r.fre_milli - math.floor(fre * 1000)) <= 1, src


def test_f47_page_hinkley_python_replay(spark, sf_dir):
    daily = defaultdict(lambda: defaultdict(int))
    for et, day, _ in _events():
        daily[et][day] += 1
    rows = {r.event_type: r for r in
            REGISTRY["f47_page_hinkley"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(daily)
    for et, series in daily.items():
        days = sorted(series)
        s = ph = 0
        run_min, max_dev, alarm = 0, 0, None
        total, n = sum(series.values()), len(days)
        lam = 1000 * total // n
        for i, day in enumerate(days, 1):
            s += series[day]
            ph += 1000 * series[day] - (1000 * s) // i
            run_min = min(run_min, ph) if i > 1 else ph
            dev = ph - run_min
            max_dev = max(max_dev, dev)
            if alarm is None and dev > lam:
                alarm = day
        r = rows[et]
        assert (r.n_days, r.total) == (n, total), et
        assert (r.max_dev_milli, r.lambda_milli) == (max_dev, lam), et
        assert r.alarm_day == alarm, et


def test_j119_term_burstiness_python_replay(spark, sf_dir):
    dw = Counter()
    for (did, text) in _docs(["doc_id", "text"]):
        for w in _norm_words(text)[1]:
            dw[(w, did)] += 1
    per_w = defaultdict(lambda: [0, 0, 0])
    for (w, _), c in dw.items():
        p = per_w[w]
        p[0] += 1
        p[1] += 1 if c >= 2 else 0
        p[2] += c
    top = sorted(per_w.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    rows = REGISTRY["j119_term_burstiness"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r, (w, (df, df2, cf)) in zip(rows, top):
        assert (r.w, r.df, r.df2, r.cf) == (w, df, df2, cf)
        assert r.burst_milli == 1000 * df2 // df
        assert r.rate_milli == 1000 * cf // df
        assert 0 <= r.burst_milli <= 1000  # df2 <= df by construction


def test_b16_secondary_index_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    agg = defaultdict(lambda: [set(), 0, 0])
    for k, pr, tp in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        a = agg[pr]
        a[0].add(k % 32)
        a[1] += 1
        a[2] += int(round(tp * 100))
    rows = {r.priority: r for r in
            REGISTRY["b16_secondary_index_scan"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for pr, (buckets, n, cents) in agg.items():
        r = rows[pr]
        assert (r.n_buckets, r.n_rows, r.sum_cents) == (len(buckets), n, cents), pr


def test_b17_lwt_cas_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_partkey",
                 "l_discount"],
    )
    dedup = {}
    for ok, ln, q, pk, dc in zip(*[t.column(i).to_pylist() for i in range(5)]):
        key = (ok, ln)
        cand = (int(round(q)), pk, int(round(dc * 100)))
        if key not in dedup:
            dedup[key] = list(cand)
        else:
            cur = dedup[key]
            cur[0] = min(cur[0], cand[0])
            cur[1] = min(cur[1], cand[1])
            cur[2] = min(cur[2], cand[2])
    by_key = defaultdict(dict)
    for (ok, ln), (q, pk, dc) in dedup.items():
        by_key[ok][ln] = (q, pk, dc)
    grid = defaultdict(lambda: [0, 0])
    for ok, lines in by_key.items():
        state, applied = 0, 0
        lns = sorted(lines)
        for j in range(1, 8):
            if j not in lines:
                continue
            q, pk, dc = lines[j]
            if j == 1:
                expected = pk % 2
            elif dc >= 5:
                expected = 0
            else:
                earlier = [x for x in lns if x < j]
                # LAG over the existing rows: None (never matches) when
                # this is the first ballot slot present for the key
                expected = lines[max(earlier)][0] if earlier else None
            if expected == state:
                state, applied = q, applied + 1
        g = grid[(len(lines), applied)]
        g[0] += 1
        g[1] += state
    rows = REGISTRY["b17_lwt_cas_replay"].fn(spark, sf_dir).collect()
    assert len(rows) == len(grid)
    for r in rows:
        n_keys, sum_state = grid[(r.n_props, r.applied)]
        assert (r.n_keys, r.sum_state) == (n_keys, sum_state), (r.n_props, r.applied)
        assert r.applied <= r.n_props  # can never apply more than proposed


def test_a38_partition_histogram_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_discount"],
    )
    parts = defaultdict(lambda: [0, 0])
    for ok, q, dc in zip(*[t.column(i).to_pylist() for i in range(3)]):
        p = parts[ok]
        p[0] += 1
        p[1] += 48 + 2 * int(round(q)) + int(round(dc * 100))
    hist = defaultdict(lambda: [0, None, None, 0, 0])
    for n_rows, size in parts.values():
        b = size.bit_length() - 1  # 2^b <= size < 2^(b+1)
        h = hist[b]
        h[0] += 1
        h[1] = size if h[1] is None else min(h[1], size)
        h[2] = size if h[2] is None else max(h[2], size)
        h[3] += size
        h[4] += n_rows
    total = len(parts)
    rows = REGISTRY["a38_partition_size_histogram"].fn(spark, sf_dir).collect()
    assert len(rows) == len(hist)
    for r in rows:
        n, mn, mx, sm, nr = hist[r.log2_bucket]
        assert (r.n_partitions, r.min_bytes, r.max_bytes) == (n, mn, mx)
        assert (r.sum_bytes, r.sum_rows) == (sm, nr)
        assert r.share_ppm == 1_000_000 * n // total
    assert sum(h[0] for h in hist.values()) == total  # buckets partition


def test_e107_benford_python_replay(spark, sf_dir):
    BEN = {0: 119679, 1: 113890, 2: 108821, 3: 104329, 4: 100308,
           5: 96677, 6: 93374, 7: 90351, 8: 87570, 9: 84997}
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])
    obs = Counter()
    for tp in t.column(0).to_pylist():
        c = int(round(tp * 100))
        if c >= 10:
            obs[int(str(c)[1])] += 1
    n = sum(obs.values())
    rows = REGISTRY["e107_benford_law"].fn(spark, sf_dir).collect()
    assert [r.digit for r in rows] == sorted(obs)
    chi2 = 0
    for r in rows:
        assert r.observed == obs[r.digit] and r.p_micro == BEN[r.digit]
        assert r.expected_micro == n * BEN[r.digit]
        dev = 1_000_000 * obs[r.digit] - n * BEN[r.digit]
        term = math.floor(dev * dev / (1_000_000 * n * BEN[r.digit]) * 1000)
        assert abs(r.term_milli - term) <= 1, r.digit
        chi2 += r.term_milli
    assert all(r.chi2_milli == chi2 for r in rows)
    assert chi2 >= 0


def test_j120_sttr_python_replay(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for src, text in _docs(["source", "text"]):
        ws = _norm_words(text)[1]
        for i in range(0, len(ws) - len(ws) % 50, 50):
            chunk = ws[i:i + 50]
            agg[src][0] += 1
            agg[src][1] += 1000 * len(set(chunk)) // 50
    rows = {r.source: r for r in
            REGISTRY["j120_sttr_lexical_diversity"].fn(spark, sf_dir).collect()}
    assert set(rows) == {s for s, a in agg.items() if a[0] > 0}
    for src, (nc, st_sum) in agg.items():
        if nc == 0:
            continue
        r = rows[src]
        assert (r.n_chunks, r.sum_ttr_milli) == (nc, st_sum), src
        assert r.sttr_mean_milli == st_sum // nc
        assert 0 < r.sttr_mean_milli <= 1000  # TTR is a proper fraction


def test_f48_theil_u2_python_replay(spark, sf_dir):
    daily = defaultdict(lambda: defaultdict(int))
    for et, day, cents in _events():
        daily[et][day] += cents
    rows = {r.event_type: r for r in
            REGISTRY["f48_theil_u2"].fn(spark, sf_dir).collect()}
    for et, series in daily.items():
        sse7 = sse1 = n = 0
        for day, x in series.items():
            if day - 1 in series and day - 7 in series:
                n += 1
                sse1 += (x - series[day - 1]) ** 2
                sse7 += (x - series[day - 7]) ** 2
        if n == 0:
            assert et not in rows
            continue
        r = rows[et]
        assert (r.n_days, r.sse_seasonal, r.sse_naive) == (n, sse7, sse1), et
        if sse1 > 0:
            assert r.u2_milli == math.floor(math.sqrt(sse7 / sse1) * 1000)
        else:
            assert r.u2_milli is None


def test_j121_mmr_python_greedy_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [int(round(float(x) * 1_000_000)) for x in emb]
        for vid, emb in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }
    dot = lambda a, b: sum(x * y for x, y in zip(vecs[a], vecs[b]))
    want = []
    for qid in sorted(v for v in vecs if v < 8):
        rel = {i: dot(qid, i) for i in vecs if i != qid}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:12]
        sel = []
        first = min(cand, key=lambda i: (-rel[i], i))
        sel.append(first)
        want.append((1, qid, first, rel[first], 0, 7 * rel[first]))
        for step in range(2, 5):
            best = None
            for c in cand:
                if c in sel:
                    continue
                red = max(dot(c, s) for s in sel)
                score = 7 * rel[c] - 3 * red
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, red, score)
            _, c, red, score = best
            sel.append(c)
            want.append((step, qid, c, rel[c], red, score))
    want.sort()
    rows = REGISTRY["j121_mmr_rerank"].fn(spark, sf_dir).collect()
    got = sorted(
        (r.step, r.query_id, r.picked_id, r.rel, r.red, r.score) for r in rows
    )
    assert got == want
    # picks are distinct within each query
    for qid in {q for _, q, *_ in want}:
        picks = [p for _, q, p, *_ in want if q == qid]
        assert len(picks) == len(set(picks)) == 4


def test_e108_brown_forsythe_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    by_g = defaultdict(list)
    for g, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        by_g[g].append(int(round(q)))
    stats = {}
    for g, xs in by_g.items():
        xs.sort()
        n = len(xs)
        med2 = xs[(n - 1) // 2] + xs[n // 2]
        z2 = [abs(2 * x - med2) for x in xs]
        stats[g] = (n, sum(z2), sum(z * z for z in z2))
    n_tot = sum(s[0] for s in stats.values())
    s_tot = sum(s[1] for s in stats.values())
    ssb = (
        sum(s[1] ** 2 / s[0] for s in stats.values()) - s_tot**2 / n_tot
    )
    ssw = sum(s[2] - s[1] ** 2 / s[0] for s in stats.values())
    f = (n_tot - 3) / 2 * ssb / ssw
    row = REGISTRY["e108_brown_forsythe"].fn(spark, sf_dir).collect()[0]
    assert row.n_tot == n_tot
    for g, (nc, sc, qc) in (("A", ("n_a", "s_a", "q_a")),
                            ("N", ("n_n", "s_n", "q_n")),
                            ("R", ("n_r", "s_r", "q_r"))):
        n, s, q = stats[g]
        assert (row[nc], row[sc], row[qc]) == (n, s, q), g
    assert abs(row.f_milli - math.floor(f * 1000)) <= 1
    assert row.f_milli >= 0


def test_j122_apportion_python_replay(spark, sf_dir):
    BUDGET = 1_000_000
    tok = Counter()
    for src, text in _docs(["source", "text"]):
        tok[src] += len(_norm_words(text)[1])
    wgt = {s: math.isqrt(t) for s, t in tok.items()}
    wsum = sum(wgt.values())
    base = {s: BUDGET * w // wsum for s, w in wgt.items()}
    rem = {s: BUDGET * w % wsum for s, w in wgt.items()}
    k = BUDGET - sum(base.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    extras = set(order[:k])
    rows = {r.source: r for r in
            REGISTRY["j122_token_budget_apportion"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(tok)
    total = 0
    for s, r in rows.items():
        assert (r.tokens, r.wgt, r.base_alloc, r.rem) == (
            tok[s], wgt[s], base[s], rem[s]
        ), s
        assert r.extra == (1 if s in extras else 0), s
        assert r.alloc == base[s] + r.extra
        total += r.alloc
    assert total == BUDGET  # the apportionment law


def test_f49_permutation_entropy_python_replay(spark, sf_dir):
    daily = defaultdict(lambda: defaultdict(int))
    for et, day, _ in _events():
        daily[et][day] += 1
    rows = REGISTRY["f49_permutation_entropy"].fn(spark, sf_dir).collect()
    got = defaultdict(dict)
    h_by_type = {}
    for r in rows:
        got[r.event_type][r.pattern] = (r.c, r.n, r.term_micro)
        h_by_type[r.event_type] = r.h_micro
    for et, series in daily.items():
        pats = Counter()
        for d in sorted(series):
            if d + 1 in series and d + 2 in series:
                v = [(series[d], 0), (series[d + 1], 1), (series[d + 2], 2)]
                code = 0
                for val, idx in v:
                    rank = sum(1 for w in v if w < (val, idx))
                    code += rank * 10 ** (2 - idx)
                pats[code] += 1
        n = sum(pats.values())
        assert set(got[et]) == set(pats), et
        h = 0
        for p, cnt in pats.items():
            c_, n_, term = got[et][p]
            assert (c_, n_) == (cnt, n), (et, p)
            want = math.floor(cnt / n * math.log(cnt / n) * 1e6)
            assert abs(term - want) <= 1, (et, p)
            h -= term
        assert h_by_type[et] == h and h >= 0
        # order-3 entropy is bounded by ln 6
        assert h <= math.log(6) * 1e6 + len(pats)


def test_e109_cramers_v_python_replay(spark, sf_dir):
    cells, rt, ct = Counter(), Counter(), Counter()
    for pr, sg in _orders_with_segment():
        cells[(pr, sg)] += 1
        rt[pr] += 1
        ct[sg] += 1
    n = sum(cells.values())
    rows = REGISTRY["e109_cramers_v"].fn(spark, sf_dir).collect()
    chi = 0
    for r in rows:
        o = cells[(r.pr, r.seg)]
        dev = n * o - rt[r.pr] * ct[r.seg]
        term = math.floor(dev * dev / (n * rt[r.pr] * ct[r.seg]) * 1e6)
        assert r.o == o and abs(r.term_micro - term) <= 1, (r.pr, r.seg)
        chi += r.term_micro
    assert all(r.chi2_micro == chi for r in rows)
    v = math.floor(math.sqrt(chi / 1e6 / (n * 4)) * 1000)
    assert all(abs(r.v_milli - v) <= 1 for r in rows)
    assert 0 <= rows[0].v_milli <= 1000  # V lives in [0, 1]


def test_j123_rouge_bigram_python_replay(spark, sf_dir):
    docs = {}
    for src, did, text in _docs(["source", "doc_id", "text"]):
        ws = _norm_words(text)[1]
        docs[did] = (src, Counter(zip(ws, ws[1:])))
    per_src = defaultdict(list)
    for did, (src, ref) in docs.items():
        if did + 20 not in docs or sum(ref.values()) == 0:
            continue
        csrc, cand = docs[did + 20]
        assert csrc == src  # round-robin source assignment
        if sum(cand.values()) == 0:
            continue
        clip = sum(min(c, cand[g]) for g, c in ref.items())
        rt, ct2 = sum(ref.values()), sum(cand.values())
        per_src[src].append(
            (1000 * clip // ct2, 1000 * clip // rt, 2000 * clip // (rt + ct2))
        )
    rows = {r.source: r for r in
            REGISTRY["j123_rouge_bigram"].fn(spark, sf_dir).collect()}
    assert set(rows) == {s for s, v in per_src.items() if v}
    for src, triples in per_src.items():
        if not triples:
            continue
        r = rows[src]
        np = len(triples)
        assert r.n_pairs == np, src
        assert r.mean_p_milli == sum(t[0] for t in triples) // np
        assert r.mean_r_milli == sum(t[1] for t in triples) // np
        assert r.mean_f1_milli == sum(t[2] for t in triples) // np
        # F1 is between P and R (harmonic mean law), per-pair
        for p, rr, f1 in triples:
            assert min(p, rr) - 1 <= f1 <= max(p, rr) + 1


def test_a39_backup_bytes_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_discount"],
    )
    gens = defaultdict(int)
    for ok, q, dc in zip(*[t.column(i).to_pylist() for i in range(3)]):
        gens[ok % 97] += 48 + 2 * int(round(q)) + int(round(dc * 100))
    shared = {g: b for g, b in gens.items() if g % 5 != 0}
    delta = {g: b for g, b in gens.items() if g % 5 == 0}
    rows = {r.tag: r for r in
            REGISTRY["a39_incremental_backup_bytes"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"tag1", "tag2"}
    assert rows["tag1"].n_files == len(shared)
    assert rows["tag1"].logical_bytes == sum(shared.values())
    assert rows["tag2"].n_files == len(gens)
    assert rows["tag2"].logical_bytes == sum(gens.values())
    for r in rows.values():
        assert (r.shared_files, r.shared_bytes) == (len(shared), sum(shared.values()))
        assert (r.delta_files, r.delta_bytes) == (len(delta), sum(delta.values()))
        assert r.dedup_ratio_milli == 1000 * sum(shared.values()) // (
            sum(shared.values()) + sum(delta.values())
        )
    # hardlink law: physical union == shared + delta == tag2 logical
    assert sum(shared.values()) + sum(delta.values()) == rows["tag2"].logical_bytes


def test_f50_ess_python_replay(spark, sf_dir):
    daily = Counter()
    for _, day, _ in _events():
        daily[day] += 1
    days = sorted(daily)
    n, s = len(days), sum(daily.values())
    d = sum((n * daily[t] - s) ** 2 for t in days)
    rho = [
        sum(
            (n * daily[t] - s) * (n * daily[t + k] - s)
            for t in days if t + k in daily
        ) / d
        for k in range(1, 8)
    ]
    tau = 1.0 + 2.0 * sum(rho)
    row = REGISTRY["f50_effective_sample_size"].fn(spark, sf_dir).collect()[0]
    assert row.n == n and row.den_scaled == d
    assert abs(row.tau_milli - math.floor(tau * 1000)) <= 1
    assert abs(row.ess_milli - math.floor(n / tau * 1000)) <= 1
    # law: 1000 * n ~= tau * ess (both milli-floored)
    assert row.ess_milli <= 1000 * n / max(row.tau_milli / 1000, 1e-9) + 1000


def test_d24_nearest_event_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts"],
    )
    by_user = defaultdict(list)
    for u, eid, et, ts in zip(*[t.column(i).to_pylist() for i in range(4)]):
        if et in ("click", "purchase"):
            by_user[u].append((int(ts.timestamp() * 1_000_000), eid, et))
    agg = defaultdict(lambda: [0, 0, None, None])
    for rows in by_user.values():
        rows.sort()
        for i, (pt, _, et) in enumerate(rows):
            if et != "purchase":
                continue
            prev = next(
                (rows[j][0] for j in range(i, -1, -1) if rows[j][2] == "click"),
                None,
            )
            nxt = next(
                (rows[j][0] for j in range(i, len(rows)) if rows[j][2] == "click"),
                None,
            )
            if prev is None and nxt is None:
                key, delta = ("none", -1), None
            elif nxt is None or (prev is not None and pt - prev <= nxt - pt):
                delta = pt - prev
                key = ("prev", delta // 600_000_000)
            else:
                delta = nxt - pt
                key = ("next", delta // 600_000_000)
            a = agg[key]
            a[0] += 1
            if delta is not None:
                a[1] += delta
                a[2] = delta if a[2] is None else min(a[2], delta)
                a[3] = delta if a[3] is None else max(a[3], delta)
    rows_out = REGISTRY["d24_nearest_event_join"].fn(spark, sf_dir).collect()
    assert len(rows_out) == len(agg)
    for r in rows_out:
        n_, sd, mn, mx = agg[(r.direction, r.bucket_10min)]
        assert r.n == n_, (r.direction, r.bucket_10min)
        assert (r.sum_delta_us, r.min_delta_us, r.max_delta_us) == (
            sd if r.direction != "none" else None,
            mn, mx,
        ), (r.direction, r.bucket_10min)


def test_b18_tombstone_audit_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    parts = defaultdict(lambda: [0, 0])
    for u, et in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        p = parts[u]
        p[0] += 1
        if et == "error":
            p[1] += 1
    levels = defaultdict(lambda: [0, 0, 0, 0])
    for cells, tomb in parts.values():
        lvl = "fail" if tomb >= 10 else "warn" if tomb >= 3 else "ok"
        a = levels[lvl]
        a[0] += 1
        a[1] += cells
        a[2] += tomb
        a[3] = max(a[3], tomb)
    rows = {r.level: r for r in
            REGISTRY["b18_tombstone_scan_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(levels)
    for lvl, (np_, tc, tt, mt) in levels.items():
        r = rows[lvl]
        assert (r.n_partitions, r.total_cells, r.total_tombstones) == (np_, tc, tt)
        assert r.max_tombstones == mt
        assert r.ratio_milli == 1000 * tt // tc
    # every partition lands in exactly one level
    assert sum(v[0] for v in levels.values()) == len(parts)


def test_e110_hill_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    xs = sorted((x for x in t.column(0).to_pylist() if x > 0), reverse=True)
    K = 100
    xk1 = xs[K]
    sum_micro = sum(
        math.floor((math.log(x) - math.log(xk1)) * 1e6) for x in xs[:K]
    )
    row = REGISTRY["e110_hill_tail_index"].fn(spark, sf_dir).collect()[0]
    assert (row.k, row.x_k1, row.sum_micro) == (K, xk1, sum_micro)
    assert row.alpha_milli == 1000 * K * 1_000_000 // sum_micro
    assert row.inv_alpha_micro == 1_000_000 * sum_micro // (K * 1_000_000)
    assert row.alpha_milli > 0  # tail terms are nonnegative, at least one > 0


def test_e111_power_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["value"])
    xs = [int(round(v * 100)) for v in t.column(0).to_pylist()]
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    var = (n * sxx - sx * sx) / (n * (n - 1))
    delta = sx / n / 100  # 1% of the mean, in cents
    z = 1_959_963 / 1e6 + 841_621 / 1e6
    want = math.floor(2.0 * z * z * var / (delta * delta)) + 1
    row = REGISTRY["e111_power_sample_size"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.sx, row.sxx) == (n, sx, sxx)
    assert abs(row.n_per_arm - want) <= 1
    # detecting a smaller effect needs more samples than we HAVE here
    assert row.n_per_arm > 0


def test_e112_deming_python_replay(spark, sf_dir):
    xs, ys = [], []
    for nc, text in _docs(["n_chars", "text"]):
        xs.append(nc)
        ys.append(len(_norm_words(text)[1]))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cyy, cxx = n * syy - sy * sy, n * sxx - sx * sx
    cxy = n * sxy - sx * sy
    slope = ((cyy - cxx) + math.sqrt((cyy - cxx) ** 2 + 4 * cxy * cxy)) / (
        2 * cxy
    )
    intercept = sy / n - slope * sx / n
    row = REGISTRY["e112_deming_regression"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.sx, row.sy, row.sxx, row.syy, row.sxy) == (
        n, sx, sy, sxx, syy, sxy,
    )
    assert abs(row.slope_micro - math.floor(slope * 1e6)) <= 1
    assert abs(row.intercept_milli - math.floor(intercept * 1000)) <= 1
    # Deming with positive covariance: slope positive, and at least as
    # steep as OLS (attenuation correction)
    assert row.slope_micro > 0
    assert slope >= cxy / cxx - 1e-9


def test_j124_diversity_python_replay(spark, sf_dir):
    counts = Counter(src for src, in _docs(["source"]))
    n = sum(counts.values())
    k = len(counts)
    nmax = max(counts.values())
    pair_sum = sum(c * (c - 1) for c in counts.values())
    row = REGISTRY["j124_corpus_diversity"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.n_sources, row.n_max) == (n, k, nmax)
    assert row.simpson_milli == 1000 - 1000 * pair_sum // (n * (n - 1))
    assert row.berger_parker_milli == 1000 * nmax // n
    assert row.inv_simpson_evenness_milli == 1000 * (n * (n - 1)) // (
        k * pair_sum
    )
    assert 0 <= row.simpson_milli < 1000
    assert row.berger_parker_milli >= 1000 // k  # dominance >= 1/k


def test_e113_nelson_aalen_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    span = defaultdict(lambda: [None, None])
    for u, ts in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        d = ts.date()
        s = span[u]
        s[0] = d if s[0] is None else min(s[0], d)
        s[1] = d if s[1] is None else max(s[1], d)
    wend = max(s[1] for s in span.values())
    agg = defaultdict(lambda: [0, 0])  # t_days -> [events, censored]
    for d0, d1 in span.values():
        td = (d1 - d0).days
        if (wend - d1).days >= 3:
            agg[td][0] += 1
        else:
            agg[td][1] += 1
    total = len(span)
    rows = REGISTRY["e113_nelson_aalen"].fn(spark, sf_dir).collect()
    assert [r.t_days for r in rows] == sorted(agg)
    seen, h, v = 0, 0, 0
    for r in rows:
        ev, ce = agg[r.t_days]
        at_risk = total - seen
        seen += ev + ce
        na = 1_000_000 * ev // at_risk
        assert (r.at_risk, r.events, r.censored) == (at_risk, ev, ce), r.t_days
        assert r.na_term_micro == na
        h += na
        v += 1_000_000 * ev // (at_risk * at_risk)
        assert (r.h_cum_micro, r.var_cum_micro) == (h, v), r.t_days
    # the hazard accumulator is nondecreasing by construction
    assert all(b.h_cum_micro >= a.h_cum_micro for a, b in zip(rows, rows[1:]))


def test_j125_threshold_curve_python_replay(spark, sf_dir):
    docs = {}
    for src, did, text in _docs(["source", "doc_id", "text"]):
        ws = _norm_words(text)[1]
        docs[did] = {" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)}
    jacs = []
    for did, ref in docs.items():
        if did + 20 not in docs or not ref:
            continue
        cand = docs[did + 20]
        if not cand:
            continue
        i = len(ref & cand)
        jacs.append(1000 * i // (len(ref) + len(cand) - i))
    rows = REGISTRY["j125_dedup_threshold_curve"].fn(spark, sf_dir).collect()
    assert [r.threshold_milli for r in rows] == [5, 10, 25, 50, 100]
    assert rows[0].n_dup_pairs > 0  # the sweep range must discriminate
    prev = None
    for r in rows:
        want = sum(1 for j in jacs if j >= r.threshold_milli)
        assert r.n_dup_pairs == want, r.threshold_milli
        assert r.n_pairs == len(jacs)
        assert r.dup_rate_milli == 1000 * want // len(jacs)
        if prev is not None:
            assert r.n_dup_pairs <= prev  # monotone nonincreasing curve
        prev = r.n_dup_pairs


def test_d26_temporal_anti_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    clicks, purchases = defaultdict(list), []
    for u, et, ts in zip(*[t.column(i).to_pylist() for i in range(3)]):
        us = int(ts.timestamp() * 1_000_000)
        if et == "click":
            clicks[u].append(us)
        elif et == "purchase":
            purchases.append((u, us))
    agg = defaultdict(lambda: [0, 0])
    for u, pt in purchases:
        day = pt // 86_400_000_000
        orphan = not any(0 <= pt - ct <= 3_600_000_000 for ct in clicks.get(u, []))
        agg[day][0] += 1
        agg[day][1] += int(orphan)
    rows = {r.day: r for r in
            REGISTRY["d26_temporal_anti_join"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for day, (np_, no) in agg.items():
        r = rows[day]
        assert (r.n_purchases, r.n_orphan) == (np_, no), day
        assert r.orphan_rate_milli == 1000 * no // np_
    # d24 consistency: every orphan here is a purchase d24 cannot match
    # backwards within the hour (weaker law: orphans <= purchases)
    assert all(r.n_orphan <= r.n_purchases for r in rows.values())


def test_e114_newcombe_python_replay(spark, sf_dir):
    a = n1 = c = n2 = 0
    for pr, sg in _orders_with_segment():
        if sg == "BUILDING":
            n1 += 1
            a += pr == "1-URGENT"
        else:
            n2 += 1
            c += pr == "1-URGENT"
    z = 1_959_963 / 1e6

    def wilson(k, n):
        half = z * z / 2
        rad = z * math.sqrt(k * (n - k) / n + z * z / 4)
        return (k + half - rad) / (n + z * z), (k + half + rad) / (n + z * z)

    p1, p2 = a / n1, c / n2
    l1, u1 = wilson(a, n1)
    l2, u2 = wilson(c, n2)
    lo = (p1 - p2) - math.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2)
    hi = (p1 - p2) + math.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2)
    row = REGISTRY["e114_newcombe_risk_diff"].fn(spark, sf_dir).collect()[0]
    assert (row.a, row.n1, row.c, row.n2) == (a, n1, c, n2)
    # Spark DIV / DuckDB // truncate toward zero; Python // floors, which
    # diverges by 1 on a negative non-exact risk difference — pin trunc.
    rd_num = 1000 * (a * n2 - c * n1)
    rd_trunc = abs(rd_num) // (n1 * n2) * (1 if rd_num >= 0 else -1)
    assert row.rd_milli == rd_trunc
    assert abs(row.ci_lo_milli - math.floor(lo * 1000)) <= 1
    assert abs(row.ci_hi_milli - math.floor(hi * 1000)) <= 1
    assert row.ci_lo_milli <= row.rd_milli <= row.ci_hi_milli


def test_i25_higher_order_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    per = defaultdict(list)
    for k, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        per[k].append(int(round(q)))
    grid = defaultdict(lambda: [0, 0, 0, 0, 0])
    for vs in per.values():
        vs.sort()
        n = len(vs)
        g = grid[n]
        g[0] += 1
        g[1] += sum(vs)
        g[2] += sum(1 for v in vs if v >= 25)
        g[3] += int(any(v == 50 for v in vs))
        g[4] += sum(a * b for a, b in zip(vs, reversed(vs)))
    rows = REGISTRY["i25_higher_order_array_funcs"].fn(spark, sf_dir).collect()
    assert len(rows) == len(grid)
    for r in rows:
        no, st, sg, w50, pd_ = grid[r.n_lines]
        assert (r.n_orders, r.sum_total, r.sum_ge_25) == (no, st, sg), r.n_lines
        assert (r.n_with_50, r.sum_pal_dot) == (w50, pd_), r.n_lines
    # Cauchy-Schwarz: the palindrome dot of a sorted array is the MINIMUM
    # over pairings of the multiset with itself — ≤ the aligned dot
    for vs in list(per.values())[:50]:
        vs.sort()
        pal = sum(a * b for a, b in zip(vs, reversed(vs)))
        assert pal <= sum(v * v for v in vs)


def test_e115_footrule_python_replay(spark, sf_dir):
    stats = defaultdict(lambda: [0, 0])
    for src, text in _docs(["source", "text"]):
        s = stats[src]
        s[0] += 1
        s[1] += len(_norm_words(text)[1])
    srcs = sorted(stats)

    def ranks(idx):
        order = sorted(srcs, key=lambda s: (-stats[s][idx], s))
        return {s: i + 1 for i, s in enumerate(order)}

    rd, rt = ranks(0), ranks(1)
    k = len(srcs)
    foot = sum(abs(rd[s] - rt[s]) for s in srcs)
    mx = max(abs(rd[s] - rt[s]) for s in srcs)
    norm = k * k // 2 if k % 2 == 0 else (k * k - 1) // 2
    row = REGISTRY["e115_rank_stability_footrule"].fn(spark, sf_dir).collect()[0]
    assert (row.k, row.footrule, row.max_displacement) == (k, foot, mx)
    assert row.footrule_norm_milli == 1000 * foot // norm
    assert foot % 2 == 0          # footrule of two permutations is even
    assert foot <= norm           # Diaconis-Graham maximum


def test_j126_hapax_python_replay(spark, sf_dir):
    wc = defaultdict(Counter)
    for src, text in _docs(["source", "text"]):
        wc[src].update(_norm_words(text)[1])
    rows = {r.source: r for r in
            REGISTRY["j126_hapax_ratio"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(wc)
    for src, counts in wc.items():
        vocab = len(counts)
        tokens = sum(counts.values())
        hapax = sum(1 for c in counts.values() if c == 1)
        dis = sum(1 for c in counts.values() if c == 2)
        r = rows[src]
        assert (r.vocab, r.tokens, r.hapax, r.dis_legomena) == (
            vocab, tokens, hapax, dis,
        ), src
        assert r.hapax_vocab_milli == 1000 * hapax // vocab
        assert r.hapax_token_micro == 1_000_000 * hapax // tokens
        assert hapax <= vocab <= tokens  # the chain law
