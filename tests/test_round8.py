"""Round-8 additions: pure-Python third-implementation pins for the new
depth operators (the rounds-3..7 discipline — every SQL-certified query
also replays against an independent Python implementation so a
Spark+DuckDB twin bug cannot hide behind a matching hash).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _orders():
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


def test_b15_quorum_read_repair_python_replay(spark, sf_dir):
    base = {
        k: (int(round(p * 100)), k * 100) for k, p in _orders()
    }
    ra = {k: (v - 7, ts - 5) if k % 499 == 0 else (v, ts) for k, (v, ts) in base.items()}
    rb = {
        k: (v - 3, ts - 3) if k % 503 == 0 else (v, ts)
        for k, (v, ts) in base.items()
        if k % 991 != 0
    }
    rc = {k: (v, ts) for k, (v, ts) in base.items() if k % 997 != 0}
    reconciled = {}
    for rep in (ra, rb, rc):
        for k, (v, ts) in rep.items():
            if k not in reconciled or (ts, v) > reconciled[k]:
                reconciled[k] = (ts, v)
    want = {}
    for name, rep in (("A", ra), ("B", rb), ("C", rc)):
        stale = sum(1 for k, (ts, _) in reconciled.items()
                    if k in rep and rep[k][1] < ts)
        missing = sum(1 for k in reconciled if k not in rep)
        want[name] = (len([k for k in reconciled if k in rep]), stale, missing)
    out = {r.replica: r for r in
           REGISTRY["b15_quorum_read_repair"].fn(spark, sf_dir).collect()}
    assert set(out) == {"A", "B", "C"}
    total = sum(v for _, v in reconciled.values())
    for name, (present, stale, missing) in want.items():
        r = out[name]
        assert (r.n_present, r.n_stale, r.n_missing) == (present, stale, missing), name
        assert r.n_repair == stale + missing
        assert r.n_keys == len(reconciled) and r.total_value == total
    # the fixture must actually exercise every divergence class
    assert out["A"].n_stale > 0 and out["B"].n_missing > 0 and out["C"].n_missing > 0


def test_j111_t_closeness_python_fractions(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_mktsegment", "c_nationkey", "c_acctbal"],
    )
    rows = list(zip(*(t.column(c).to_pylist() for c in t.column_names)))

    # Spark/DuckDB `div`/`//` truncate toward zero; mirror exactly.
    def b_of(bal: float) -> int:
        cents = int(round(bal * 100))
        q, r = divmod(abs(cents), 200000)
        return (q if cents >= 0 else -q)

    sens = [((seg, nat), b_of(bal)) for seg, nat, bal in rows]
    bins = sorted({b for _, b in sens})
    n = len(sens)
    from collections import Counter

    global_c = Counter(b for _, b in sens)
    classes: dict = {}
    for key, b in sens:
        classes.setdefault(key, Counter())[b] += 1
    m = len(bins)
    want = {}
    for key, cnt in classes.items():
        ng = sum(cnt.values())
        cum_c = cum_g = 0
        s = 0
        for b in bins:
            cum_c += cnt.get(b, 0)
            cum_g += global_c[b]
            s += abs(cum_c * n - cum_g * ng)
        want[key] = (ng, (s * 1000) // (ng * n * (m - 1)))
    out = {
        (r.c_mktsegment, r.c_nationkey): (r.class_size, r.emd_milli)
        for r in REGISTRY["j111_t_closeness"].fn(spark, sf_dir).collect()
    }
    assert out == want
    # audit sanity: a perfectly representative class has EMD 0; every EMD
    # is within [0, 1000]
    assert all(0 <= e <= 1000 for _, e in out.values())


def test_j112_hits_python_power_iteration(spark, sf_dir):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = sorted(
        {
            (ok % 512, pk % 512)
            for ok, pk in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
            if ok % 10 == 0
        }
    )
    h = {u: 1_000_000 for u, _ in edges}
    a = {}
    for _ in range(3):
        raw_a: dict = {}
        for u, v in edges:
            raw_a[v] = raw_a.get(v, 0) + h[u]
        ta = sum(raw_a.values())
        a = {v: r * 1_000_000 // ta for v, r in raw_a.items()}
        raw_h: dict = {}
        for u, v in edges:
            raw_h[u] = raw_h.get(u, 0) + a[v]
        th = sum(raw_h.values())
        h = {u: r * 1_000_000 // th for u, r in raw_h.items()}
    out = REGISTRY["j112_hits_scores"].fn(spark, sf_dir).collect()
    got_h = {r.node: r.score_micro for r in out if r.side == "hub"}
    got_a = {r.node: r.score_micro for r in out if r.side == "auth"}
    assert got_h == h and got_a == a
    # L1 mass conservation up to floor loss: each vector sums to <= 1e6
    # and within |nodes| of it
    assert 1_000_000 - len(h) <= sum(h.values()) <= 1_000_000
    assert 1_000_000 - len(a) <= sum(a.values()) <= 1_000_000


def test_e96_fleiss_kappa_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    docs = list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))
    from collections import Counter

    cells: dict = {}
    for doc_id, n_chars in docs:
        c = cells.setdefault(doc_id, Counter())
        c[n_chars % 3] += 1
        c[(n_chars // 7) % 3] += 1
        c[(doc_id * 31) % 3] += 1
    n_items = len(cells)
    m = 3
    sa = sum(sum(v * v for v in c.values()) - m for c in cells.values())
    cj = Counter()
    for c in cells.values():
        cj.update(c)
    p_bar_micro = sa * 1_000_000 // (n_items * m * (m - 1))
    p_e_micro = sum(v * v for v in cj.values()) * 1_000_000 // (n_items * m) ** 2
    kappa_milli = (p_bar_micro - p_e_micro) * 1000 // (1_000_000 - p_e_micro)
    # negative // floors in python but the engines truncate; the operands
    # here keep kappa's sign stable: assert trunc semantics explicitly
    num = (p_bar_micro - p_e_micro) * 1000
    den = 1_000_000 - p_e_micro
    kappa_trunc = abs(num) // den * (1 if num >= 0 else -1)
    r = REGISTRY["e96_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert r.n_items == n_items
    assert (r.c0, r.c1, r.c2) == (cj.get(0, 0), cj.get(1, 0), cj.get(2, 0))
    assert (r.p_bar_micro, r.p_e_micro) == (p_bar_micro, p_e_micro)
    assert r.kappa_milli == kappa_trunc
    # the quantized kappa must agree with the unquantized float kappa
    p_bar = sa / (n_items * m * (m - 1))
    p_e = sum(v * v for v in cj.values()) / (n_items * m) ** 2
    assert abs(r.kappa_milli / 1000 - (p_bar - p_e) / (1 - p_e)) < 2e-3


def _daily_cents_exact():
    """Exact HALF_UP per-event rounding matching Spark/DuckDB ROUND."""
    import math

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    days: dict = {}
    for et, ts, v in zip(
        t.column(0).to_pylist(),
        t.column("ts").cast("int64").to_pylist(),
        t.column(2).to_pylist(),
    ):
        d = ts // 86400000000
        cents = math.floor(v * 100 + 0.5)  # HALF_UP on the binary double
        key = (et, d)
        days[key] = days.get(key, 0) + cents
    series: dict = {}
    for (et, d), x in days.items():
        series.setdefault(et, []).append((d, x))
    return {et: sorted(v) for et, v in series.items()}


def test_f42_ewma_python_trunc_replay(spark, sf_dir):
    out = {r.event_type: r for r in
           REGISTRY["f42_ewma_control"].fn(spark, sf_dir).collect()}
    series = _daily_cents_exact()
    assert set(out) == set(series)
    for et, pairs in series.items():
        xs = [x for _, x in pairs]
        mu = sum(xs) // len(xs)  # non-negative sums: floor == trunc
        z = mu
        alarms = 0
        max_dev = 0
        band = mu // 10
        for x in xs:
            z = (x + 7 * z) // 8
            dev = abs(z - mu)
            max_dev = max(max_dev, dev)
            if dev > band:
                alarms += 1
        r = out[et]
        assert (r.n_days, r.n_alarms, r.max_dev_cents, r.z_final_cents) == (
            len(xs), alarms, max_dev, z), et


def test_f43_runs_python_replay(spark, sf_dir):
    import math

    out = {r.event_type: r for r in
           REGISTRY["f43_runs_test"].fn(spark, sf_dir).collect()}
    for et, pairs in _daily_cents_exact().items():
        xs = [x for _, x in pairs]
        mu = sum(xs) // len(xs)
        signs = [1 if x > mu else 0 for x in xs if x != mu]
        n1, n0 = sum(signs), len(signs) - sum(signs)
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        e = 1.0 + 2.0 * n1 * n0 / (n1 + n0)
        var = (2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
               / (float(n1 + n0) * (n1 + n0) * (n1 + n0 - 1)))
        z_milli = math.floor((runs - e) / math.sqrt(var) * 1000)
        r = out[et]
        assert (r.n1, r.n0, r.r) == (n1, n0, runs), et
        assert abs(r.z_milli - z_milli) <= 1, (et, r.z_milli, z_milli)


def test_f44_turning_points_python_replay(spark, sf_dir):
    import math

    out = {r.event_type: r for r in
           REGISTRY["f44_turning_points"].fn(spark, sf_dir).collect()}
    for et, pairs in _daily_cents_exact().items():
        xs = [x for _, x in pairs]
        n = len(xs)
        t_cnt = sum(
            1
            for i in range(1, n - 1)
            if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
            or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
        )
        z_milli = math.floor(
            (t_cnt - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
            * 1000
        )
        r = out[et]
        assert (r.n_days, r.t) == (n, t_cnt), et
        assert abs(r.z_milli - z_milli) <= 1, et


def test_e97_grubbs_python_replay(spark, sf_dir):
    import math

    out = {r.event_type: r for r in
           REGISTRY["e97_grubbs_outlier"].fn(spark, sf_dir).collect()}
    for et, pairs in _daily_cents_exact().items():
        n = len(pairs)
        s = sum(x for _, x in pairs)
        s2 = sum(x * x for _, x in pairs)
        devs = [(abs(n * x - s), d) for d, x in pairs]
        max_ndev = max(nd for nd, _ in devs)
        day = min(d for nd, d in devs if nd == max_ndev)
        g_milli = math.floor(
            max_ndev * math.sqrt(n - 1.0) / math.sqrt(float(n) * (n * s2 - s * s))
            * 1000
        )
        r = out[et]
        assert (r.n, r.day_of_max) == (n, day), et
        assert abs(r.g_milli - g_milli) <= 1, et
        assert r.beyond_3sigma == (1 if r.g_milli > 3000 else 0) or True
        # the flag compares the same quantities pre-quantization; check
        # against the float G directly
        g = max_ndev * math.sqrt(n - 1.0) / math.sqrt(float(n) * (n * s2 - s * s))
        assert r.beyond_3sigma == (1 if g > 3.0 else 0), et


def test_e95_mantel_haenszel_python_replay(spark, sf_dir):
    rows = REGISTRY["e95_mantel_haenszel"].fn(spark, sf_dir).collect()
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderpriority", "o_custkey", "o_orderstatus"],
    )
    cells: dict = {}
    for pri, ck, st in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        a, b, c, d = cells.setdefault(pri, [0, 0, 0, 0])
        i = (0 if st == "F" else 1) + (0 if ck % 2 == 0 else 2)
        cells[pri][i] += 1
    sr = ss = sdev = svar = 0
    for pri, (a, b, c, d) in cells.items():
        n = a + b + c + d
        sr += a * d * 1_000_000 // n
        ss += b * c * 1_000_000 // n
        sdev += a * 1_000_000 - (a + b) * (a + c) * 1_000_000 // n
        svar += (a + b) * (c + d) * 1_000_000 // n * (a + c) // n * (b + d) // (n - 1)
    or_milli = sr * 1000 // ss
    chi2_milli = sdev // 1000 * (sdev // 1000) // svar * 1000
    got = {r.stratum: r for r in rows}
    assert set(got) == set(cells)
    for pri, (a, b, c, d) in cells.items():
        r = got[pri]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d), pri
        assert r.or_mh_milli == or_milli and r.chi2_milli == chi2_milli
    # the quantized OR must track the unquantized float OR within 1%
    fr = sum(a * d / (a + b + c + d) for a, b, c, d in cells.values())
    fs = sum(b * c / (a + b + c + d) for a, b, c, d in cells.values())
    assert abs(or_milli / 1000 - fr / fs) < 0.01 * (fr / fs)


def _doc_words():
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    out = []
    for doc_id, src, text in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        out.append((doc_id, src, norm.split(" ") if norm else []))
    return out


def test_j113_good_turing_python_counter_replay(spark, sf_dir):
    from collections import Counter

    grams = Counter()
    for _, _, ws in _doc_words():
        if len(ws) >= 3:
            for i in range(len(ws) - 2):
                grams[" ".join(ws[i : i + 3])] += 1
    ff = Counter(grams.values())
    n_tok = sum(r * n for r, n in ff.items())
    want = {
        0: (ff[1], ff[1] * 1_000_000 // n_tok),
    }
    for r in sorted(ff):
        if r <= 10 and ff.get(r + 1, 0) > 0:
            want[r] = (ff[r], (r + 1) * ff[r + 1] * 1_000_000 // ff[r])
    out = {
        r.r: (r.n_r, r.r_star_micro)
        for r in REGISTRY["j113_good_turing"].fn(spark, sf_dir).collect()
    }
    assert out == want
    # GT law: smoothed counts discount the head to fund the unseen mass
    assert out[0][1] > 0 and out[1][1] < 1_000_000 * 2


def test_j114_textrank_python_power_iteration(spark, sf_dir):
    edges = set()
    for _, _, ws in _doc_words():
        fs = [w for w in ws if len(w) >= 4]
        for a, b in zip(fs, fs[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    sym = list(edges) + [(v, u) for u, v in edges]
    deg: dict = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    s = {w: 1_000_000 for w in deg}
    for _ in range(3):
        agg: dict = {}
        for u, v in sym:
            agg[v] = agg.get(v, 0) + s[u] // deg[u]
        s = {w: 150_000 + 85 * c // 100 for w, c in agg.items()}
    top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = sorted(
        REGISTRY["j114_textrank_keywords"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.keyword, r.score_micro) for r in out] == top
    assert [r.rank for r in out] == list(range(1, 11))


def test_j115_stratified_split_exact_proportions(spark, sf_dir):
    import hashlib
    from collections import defaultdict

    strata = defaultdict(list)
    for doc_id, src, _ in _doc_words():
        strata[src].append(doc_id)
    want = {}
    for src, ids in strata.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        n = len(ids)
        k = 4 * n // 5  # rn*5 <= 4n  <=>  rn <= floor(4n/5)
        train, val = ranked[:k], ranked[k:]
        want[(src, "train")] = (len(train), sum(train))
        want[(src, "val")] = (len(val), sum(val))
    out = {
        (r.source, r.split): (r.n_docs, r.doc_id_sum)
        for r in REGISTRY["j115_stratified_split"].fn(spark, sf_dir).collect()
    }
    assert out == want
    # the exactness law the operator exists for: train = floor(0.8 n) per
    # stratum, never off by the binomial wobble of per-row hashing
    for src, ids in strata.items():
        assert out[(src, "train")][0] == 4 * len(ids) // 5


def test_e98_somers_d_python_pair_count(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = dict(zip(c.column(0).to_pylist(), c.column(1).to_pylist()))
    import math
    from collections import defaultdict

    monthly = defaultdict(lambda: [0, 0])
    for ck, od, tp in zip(
        t.column(0).to_pylist(),
        t.column("o_orderdate").cast("int64").to_pylist(),
        t.column(2).to_pylist(),
    ):
        if ck not in nat:
            continue
        m = od // 86400000000 // 30
        cell = monthly[(nat[ck], m)]
        cell[0] += 1
        cell[1] += math.floor(tp * 100 + 0.5)
    series = defaultdict(list)
    for (n, m), (x, y) in monthly.items():
        series[n].append((m, x, y))
    out = {r.nation: r for r in REGISTRY["e98_somers_d"].fn(spark, sf_dir).collect()}
    for n, pts in series.items():
        pts.sort()
        nc = nd = ty = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dx = pts[i][1] - pts[j][1]
                dy = pts[i][2] - pts[j][2]
                if dx * dy > 0:
                    nc += 1
                elif dx * dy < 0:
                    nd += 1
                elif dy == 0 and dx != 0:
                    ty += 1
        r = out[n]
        assert (r.nc, r.nd, r.ty) == (nc, nd, ty), n
        if nc + nd + ty > 0:
            num = (nc - nd) * 1000
            den = nc + nd + ty
            assert r.d_milli == abs(num) // den * (1 if num >= 0 else -1), n


def test_e99_negbin_python_replay(spark, sf_dir):
    import math
    from collections import defaultdict

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    days = defaultdict(int)
    for et, ts in zip(
        t.column(0).to_pylist(), t.column("ts").cast("int64").to_pylist()
    ):
        days[(et, ts // 86400000000)] += 1
    series = defaultdict(list)
    for (et, _), x in days.items():
        series[et].append(x)
    out = {r.event_type: r for r in
           REGISTRY["e99_negbin_moments"].fn(spark, sf_dir).collect()}
    saw_null = saw_fit = False
    for et, xs in series.items():
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        var = (n * q - s * s) * 1.0 / (n * (n - 1))
        mean = s / n
        r = out[et]
        assert (r.n, r.s, r.q) == (n, s, q), et
        if var > mean:
            saw_fit = True
            assert abs(r.r_hat_milli - math.floor(mean * mean / (var - mean) * 1000)) <= 1
            assert abs(r.p_hat_milli - math.floor(mean / var * 1000)) <= 1
        else:
            saw_null = True
            assert r.r_hat_milli is None and r.p_hat_milli is None, et
    # the fixture exercises BOTH branches (measured: 'view' is
    # underdispersed at sf0.001)
    assert saw_fit and saw_null


def test_j116_containment_python_sets(spark, sf_dir):
    from itertools import combinations

    sets: dict = {}
    for _, src, ws in _doc_words():
        if len(ws) >= 3:
            sets.setdefault(src, set()).update(
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            )
    out = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["j116_source_containment"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(combinations(sorted(sets), 2))
    for (a, b), r in out.items():
        na, nb = len(sets[a]), len(sets[b])
        ni = len(sets[a] & sets[b])
        assert (r.n_a, r.n_b, r.n_inter) == (na, nb, ni), (a, b)
        assert r.cont_a_in_b_milli == ni * 1000 // na
        assert r.cont_b_in_a_milli == ni * 1000 // nb
        # subset law: containment hits 1000 iff one side is a subset
        assert (r.cont_a_in_b_milli == 1000) == (sets[a] <= sets[b])


def test_i24_bitwise_python_replay(spark, sf_dir):
    from collections import defaultdict
    from functools import reduce

    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderpriority", "o_orderkey", "o_custkey"],
    )
    groups = defaultdict(list)
    for pri, ok, ck in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        groups[pri].append((ok, ck))
    out = {r.priority: r for r in
           REGISTRY["i24_bitwise_funcs"].fn(spark, sf_dir).collect()}
    assert set(out) == set(groups)
    for pri, rows in groups.items():
        r = out[pri]
        assert r.and_low10 == reduce(lambda a, b: a & b, (ok & 1023 for ok, _ in rows))
        assert r.or_low10 == reduce(lambda a, b: a | b, (ok & 1023 for ok, _ in rows))
        assert r.xor_all == reduce(lambda a, b: a ^ b, (ok for ok, _ in rows))
        assert r.bit3_set == sum(1 for ok, _ in rows if (ok >> 3) & 1)
        assert r.xor_bytes_sum == sum((ok & 255) ^ (ck & 255) for ok, ck in rows)
        assert r.shl_masked_sum == sum((ok << 2) & 4095 for ok, _ in rows)


def test_e100_effect_size_python_replay(spark, sf_dir):
    import math

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    g1 = [n for lg, n in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
          if lg == "en"]
    g0 = [n for lg, n in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
          if lg != "en"]
    n1, s1, q1 = len(g1), sum(g1), sum(x * x for x in g1)
    n0, s0, q0 = len(g0), sum(g0), sum(x * x for x in g0)
    sp = math.sqrt(
        ((n1 * q1 - s1 * s1) * 1.0 / n1 + (n0 * q0 - s0 * s0) * 1.0 / n0)
        / (n1 + n0 - 2)
    )
    d = (s1 / n1 - s0 / n0) / sp
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0))
    r = REGISTRY["e100_effect_size"].fn(spark, sf_dir).collect()[0]
    assert (r.n1, r.n0) == (n1, n0)
    assert abs(r.d_milli - math.floor(d * 1000)) <= 1
    assert abs(r.g_milli - math.floor(g * 1000)) <= 1
    # |g| < |d| always (the correction shrinks toward zero)
    assert abs(r.g_milli) <= abs(r.d_milli)
