"""Round-10 pins: independent pure-Python third implementations of the
batch-2 depth operators (e122 Mood, e123 Hodges-Lehmann, e124
Jonckheere-Terpstra, f55 Kuiper, f56 variance ratio, f57 Cox-Stuart,
f58 KPSS, j132 temperature weights, b22 rack-aware placement) so a
Spark+DuckDB twin bug cannot hide behind a matching hash.  Everything
is recomputed from the raw parquet with math.isqrt / Fraction as the
independent exact tier; integer outputs assert EXACT equality.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _quantities():
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linenumber", "l_quantity", "l_partkey"],
    )
    return list(
        zip(
            t.column(0).to_pylist(),
            t.column(1).to_pylist(),
            (int(q) for q in t.column(2).to_pylist()),
            t.column(3).to_pylist(),
        )
    )


def _daily_cents_mean(spark):
    """(type -> ordered daily mean-cents list) replayed independently."""
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    per: dict[str, dict[int, list[int]]] = defaultdict(lambda: defaultdict(list))
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        d = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        cents = int(Decimal(v * 100).quantize(Decimal(1), ROUND_HALF_UP))
        per[et][d].append(cents)
    out = {}
    for et, days in per.items():
        out[et] = [sum(cs) // len(cs) for _, cs in sorted(days.items())]
    return out


def test_e122_mood_matches_python(spark):
    rows = _quantities()
    hist: dict[str, Counter] = defaultdict(Counter)
    for grp, _, q, _ in rows:
        hist[grp][q] += 1
    pooled = Counter()
    for h in hist.values():
        pooled.update(h)
    n = sum(pooled.values())
    cum = 0
    for v in sorted(pooled):
        cum += pooled[v]
        if 2 * cum >= n:
            m = v
            break
    cells = {
        g: (
            sum(c for v, c in h.items() if v > m),
            sum(c for v, c in h.items() if v <= m),
        )
        for g, h in hist.items()
    }
    ta_tot = sum(a for a, _ in cells.values())
    tb_tot = sum(b for _, b in cells.values())
    want = {}
    for g, (a, b) in cells.items():
        r = a + b

        def tdiv(x, y):
            q = abs(x) // y
            return q if x >= 0 else -q

        t_above = tdiv(1000 * (a * n - r * ta_tot), math.isqrt(n * r * ta_tot))
        t_below = tdiv(1000 * (b * n - r * tb_tot), math.isqrt(n * r * tb_tot))
        want[g] = (a, b, (t_above * t_above + t_below * t_below) // 1000)
    got = {
        r.grp: (r.above, r.at_or_below, r.chi2_contrib_milli)
        for r in REGISTRY["e122_mood_median_test"].fn(spark, SF).collect()
    }
    assert got == want


def test_e123_hl_recovers_injected_shift(spark):
    rows = _quantities()
    hx = Counter(q + pk % 7 for g, _, q, pk in rows if g == "R")
    hy = Counter(q for g, _, q, _ in rows if g == "A")
    diffs = Counter()
    for vx, cx in hx.items():
        for vy, cy in hy.items():
            diffs[vx - vy] += cx * cy
    n_pairs = sum(diffs.values())
    cum = 0
    for d in sorted(diffs):
        cum += diffs[d]
        if 2 * cum >= n_pairs:
            hl = d
            break
    (r,) = REGISTRY["e123_hodges_lehmann"].fn(spark, SF).collect()
    assert (r.n_x, r.n_y, r.n_pairs, r.hl_shift) == (
        sum(hx.values()), sum(hy.values()), n_pairs, hl,
    )
    # the injected uniform 0..6 shift has median 3 — the estimator must
    # recover the known truth (fixture-discrimination pin)
    assert r.hl_shift == 3


def test_e124_jt_matches_brute_force_and_is_positive(spark):
    rows = _quantities()
    groups: dict[int, list[int]] = defaultdict(list)
    for _, ln, q, _ in rows:
        if ln <= 4:
            groups[ln].append(q + ln - 1)
    # brute 2U over all ordered group pairs via histograms (exact)
    u2 = 0
    for gi in sorted(groups):
        for gj in sorted(groups):
            if gi >= gj:
                continue
            ha, hb = Counter(groups[gi]), Counter(groups[gj])
            for va, ca in ha.items():
                for vb, cb in hb.items():
                    if va < vb:
                        u2 += 2 * ca * cb
                    elif va == vb:
                        u2 += ca * cb
    sizes = [len(v) for v in groups.values()]
    n = sum(sizes)
    mu4 = n * n - sum(s * s for s in sizes)
    var72 = n * n * (2 * n + 3) - sum(s * s * (2 * s + 3) for s in sizes)
    (r,) = REGISTRY["e124_jonckheere_terpstra"].fn(spark, SF).collect()
    assert (r.u2, r.mu4, r.var72) == (u2, mu4, var72)
    z = ((2 * u2 - mu4) / 4.0) / math.sqrt(var72 / 72.0)
    assert abs(r.z_stat - z) < 1e-9
    # injected +g-1 monotone shift: the trend must be detected
    assert r.z_stat > 3.0


def test_f55_kuiper_dominates_ks_and_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    hist: dict[str, Counter] = defaultdict(Counter)
    for et, v in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        hist[et][int(Decimal(v).quantize(Decimal(1), ROUND_HALF_UP))] += 1
    grid = sorted({v for h in hist.values() for v in h})
    n_tot = sum(sum(h.values()) for h in hist.values())
    want = {}
    for et, h in hist.items():
        n_s = sum(h.values())
        cum_s = cum_g = 0
        dp = dm = 0
        for v in grid:
            cum_s += h.get(v, 0)
            cum_g += sum(hh.get(v, 0) for hh in hist.values())
            diff = cum_s * (n_tot - n_s) - (cum_g - cum_s) * n_s
            dp, dm = max(dp, diff), max(dm, -diff)
        want[et] = (n_s, n_tot - n_s, dp, dm)
    got = {}
    for r in REGISTRY["f55_kuiper_two_sample"].fn(spark, SF).collect():
        got[r.event_type] = (r.n_source, r.n_rest, r.dplus_num, r.dminus_num)
        # law: V >= KS's sup|diff| (V = D+ + D- >= max(D+, D-))
        assert r.dplus_num + r.dminus_num >= max(r.dplus_num, r.dminus_num)
        assert r.v_stat >= 0
    assert got == want


def test_f56_variance_ratio_matches_python(spark):
    # the query uses daily SUM cents (not f58's means) — replay with sums
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    per: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        d = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        per[et][d] += int(Decimal(v * 100).quantize(Decimal(1), ROUND_HALF_UP))
    want = {}
    for et, days in per.items():
        xs = [x for _, x in sorted(days.items())]
        r1 = [b - a for a, b in zip(xs, xs[1:])]
        r5 = [xs[i] - xs[i - 5] for i in range(5, len(xs))]
        v1 = len(r1) * sum(r * r for r in r1) - sum(r1) ** 2
        v5 = len(r5) * sum(r * r for r in r5) - sum(r5) ** 2
        want[et] = (len(r1), len(r5), v1, v5)
    got = {}
    for r in REGISTRY["f56_variance_ratio"].fn(spark, SF).collect():
        got[r.event_type] = (r.n1, r.n5, r.v1_num, r.v5_num)
        n1, n5, v1, v5 = want[r.event_type]
        z = (v5 * n1 * n1) / (5.0 * v1 * n5 * n5)
        assert abs(r.vr5 - z) < 1e-9
    assert got == want


def test_f57_cox_stuart_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    per: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for et, ts, v in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        d = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        per[et][d] += int(Decimal(v * 100).quantize(Decimal(1), ROUND_HALF_UP))
    want = {}
    for et, days in per.items():
        xs = [x for _, x in sorted(days.items())]
        h = len(xs) // 2
        plus = sum(1 for i in range(h) if xs[i + h] > xs[i])
        minus = sum(1 for i in range(h) if xs[i + h] < xs[i])
        want[et] = (plus, minus, plus + minus)
    got = {
        r.event_type: (r.n_plus, r.n_minus, r.n_pairs)
        for r in REGISTRY["f57_cox_stuart_trend"].fn(spark, SF).collect()
    }
    assert got == want


def test_f58_kpss_matches_python_and_nonnegative(spark):
    series = _daily_cents_mean(spark)
    want = {}
    for et, xs in series.items():
        n = len(xs)
        mu = sum(xs) // n
        devs = [x - mu for x in xs]
        s = 0
        snums = []
        for dv in devs:
            s += dv
            snums.append(s)
        sum_s2 = sum(v * v for v in snums)
        sum_dev2 = sum(v * v for v in devs)
        eta = 1000 * sum_s2 // (n * sum_dev2) if sum_dev2 > 0 else None
        want[et] = (n, sum_s2, sum_dev2, eta)
    got = {}
    for r in REGISTRY["f58_kpss_level"].fn(spark, SF).collect():
        got[r.event_type] = (r.n_days, r.sum_s2, r.sum_dev2, r.kpss_milli)
        assert r.kpss_milli is None or r.kpss_milli >= 0
    assert got == want


def test_j132_weights_match_python_and_sum_to_unit(spark):
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    ntok: Counter = Counter()
    for src, txt in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        ntok[src] += len(re.sub(r"\s+", " ", txt.lower()).strip().split(" "))
    r_s = {s: math.isqrt(n * 1_000_000) for s, n in ntok.items()}
    r_tot, t_tot = sum(r_s.values()), sum(ntok.values())
    got = {}
    for r in REGISTRY["j132_temperature_sampling"].fn(spark, SF).collect():
        got[r.source] = (r.n_tokens, r.r_s, r.w_ppm, r.epochs_milli)
    want = {
        s: (
            ntok[s],
            r_s[s],
            1_000_000 * r_s[s] // r_tot,
            1000 * r_s[s] * (t_tot // 1000) // max(r_tot // 1000, 1) // ntok[s],
        )
        for s in ntok
    }
    assert got == want
    total_ppm = sum(v[2] for v in got.values())
    # floor rounding loses < 1 ppm per source
    assert 1_000_000 - len(got) <= total_ppm <= 1_000_000


def test_b22_placement_laws(spark):
    """Every token's replica set: exactly 3 nodes, 3 DISTINCT racks, and
    the primary (dist 0 segment owner) is among them — replayed from the
    fixture ring in pure Python over all 12 segments."""
    from cassandra_snap_to_hadoop_spark.queries.round10 import _B22_RING

    ring = list(_B22_RING)

    def replicas(segment: int):
        byrack = {}
        for pos, node in sorted(ring, key=lambda pn: (pn[0] - segment) % 12):
            rack = node % 3
            if rack not in byrack:
                byrack[rack] = node
        return byrack

    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    from decimal import ROUND_HALF_UP, Decimal

    per_node = Counter()
    per_node_cents = Counter()
    per_node_primary = Counter()
    for ok, price in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        seg = (ok % 1200) // 100
        cents = int(Decimal(price * 100).quantize(Decimal(1), ROUND_HALF_UP))
        byrack = replicas(seg)
        assert len(byrack) == 3 and len(set(byrack.values())) == 3
        primary = next(
            node for pos, node in sorted(ring, key=lambda pn: (pn[0] - seg) % 12)
        )
        for node in byrack.values():
            per_node[node] += 1
            per_node_cents[node] += cents
        per_node_primary[primary] += 1
    got = {
        r.node: (r.rack, r.n_replica_rows, r.bytes_proxy_cents, r.n_primary_rows)
        for r in REGISTRY["b22_rack_aware_placement"].fn(spark, SF).collect()
    }
    for node, (rack, n, cents, prim) in got.items():
        assert rack == node % 3
        assert n == per_node[node]
        assert cents == per_node_cents[node]
        assert prim == per_node_primary[node]
    # total replica rows = 3x the table (RF = 3)
    assert sum(v[1] for v in got.values()) == 3 * t.num_rows


def test_sql_identifier_binding_equals_inline(spark):
    """IDENTIFIER() binding must produce exactly the inline query's
    result (parse-time substitution, not runtime string splicing)."""
    got = {
        r.grp: (r.n, r.total_cents)
        for r in REGISTRY["sql_api_identifier"].fn(spark, SF).collect()
    }
    inline = {
        r.grp: (r.n, r.total_cents)
        for r in spark.sql(
            """
            SELECT o_orderpriority AS grp, COUNT(*) AS n,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
            FROM cs2h_orders_ident GROUP BY 1 ORDER BY 1
            """
        ).collect()
    }
    assert got == inline


def test_e125_cliffs_delta_matches_python(spark):
    rows = _quantities()
    hx = Counter(q + pk % 7 for g, _, q, pk in rows if g == "R")
    hy = Counter(q for g, _, q, _ in rows if g == "A")
    gt = lt = eq = 0
    for vx, cx in hx.items():
        for vy, cy in hy.items():
            if vx > vy:
                gt += cx * cy
            elif vx < vy:
                lt += cx * cy
            else:
                eq += cx * cy
    (r,) = REGISTRY["e125_cliffs_delta"].fn(spark, SF).collect()
    assert (r.gt, r.lt, r.eq, r.n_pairs) == (gt, lt, eq, gt + lt + eq)
    assert r.delta_milli == 1000 * (gt - lt) // (gt + lt + eq)
    # the injected +0..6 (mean 3) shift on a ~50-wide lattice must show
    # as a clearly positive delta
    assert r.delta_milli > 50


def test_f59_dfa_matches_python(spark):
    series = _daily_cents_mean(spark)
    want = {}
    for et, means in series.items():
        xs = [m // 100 for m in means]  # dollar lattice
        n = len(xs)
        mu = sum(xs) // n
        prof = []
        s = 0
        for x in xs:
            s += x - mu
            prof.append(s)
        f2 = {}
        for w in (8, 24):
            rss_micros = []
            for wid in range(len(prof) // w):
                ys = prof[wid * w : (wid + 1) * w]
                ks = list(range(1, w + 1))
                sy, syy = sum(ys), sum(y * y for y in ys)
                sk, skk = sum(ks), sum(k * k for k in ks)
                sky = sum(k * y for k, y in zip(ks, ys))
                d = w * skk - sk * sk
                n1 = w * syy - sy * sy
                n2 = w * sky - sk * sy
                rss_micros.append(1_000_000 * (n1 * d - n2 * n2) // (w * d))
            if rss_micros:
                f2[w] = (sum(rss_micros) // len(rss_micros), len(rss_micros))
        want[et] = (f2[8][1], f2[8][0], f2[24][1], f2[24][0])
    got = {}
    for r in REGISTRY["f59_dfa_alpha"].fn(spark, SF).collect():
        got[r.event_type] = (r.n_w8, r.f2_w8, r.n_w24, r.f2_w24)
        if r.f2_w8 > 0 and r.f2_w24 > 0:
            alpha = round(
                1000 * math.log(r.f2_w24 / r.f2_w8) / (2 * math.log(3))
            )
            assert r.dfa_alpha_milli == alpha
    assert got == want


def test_b23_vnode_variance_reduction_law(spark):
    rows = REGISTRY["b23_vnode_ownership"].fn(spark, SF).collect()
    by_cfg: dict[int, list[int]] = defaultdict(list)
    for r in rows:
        assert r.vnode_count == r.n_vnodes
        by_cfg[r.n_vnodes].append(r.owned_ppm)
    assert set(by_cfg) == {1, 16} and all(len(v) == 6 for v in by_cfg.values())
    # total ownership covers the ring (ppm, truncation loses < 1 ppm/vnode)
    for cfg, ppms in by_cfg.items():
        assert 1_000_000 - 6 * cfg <= sum(ppms) <= 1_000_000
    # the vnode law: 16 vnodes/node tightens the ownership spread
    spread1 = max(by_cfg[1]) - min(by_cfg[1])
    spread16 = max(by_cfg[16]) - min(by_cfg[16])
    assert spread16 < spread1
    # independent md5 replay of every token's ring position
    import hashlib

    for cfg in (1, 16):
        toks = []
        for node in range(6):
            for v in range(cfg):
                h = hashlib.md5(f"vn-{node}-{v}".encode()).hexdigest()
                toks.append((int(h[:15], 16), node))
        toks.sort()
        ring = 1 << 60
        owned = Counter()
        prev = toks[-1][0] - ring
        for tok, node in toks:
            owned[node] += tok - prev
            prev = tok
        for r in rows:
            if r.n_vnodes == cfg:
                assert r.owned_ppm == owned[r.node] // (ring // 1_000_000)


def test_a43_rowgroup_audit_matches_pyarrow_ground_truth(spark):
    import pyarrow.parquet as pq

    from cassandra_snap_to_hadoop_spark.queries.round10 import (
        _A43_FIXTURE,
        _stage_a43_fixture,
    )

    rows = {
        r.row_group_id: (r.num_rows, r.n_columns, r.compressed_bytes,
                         r.uncompressed_bytes)
        for r in REGISTRY["a43_parquet_rowgroup_audit"].fn(spark, SF).collect()
    }
    md = pq.ParquetFile(_stage_a43_fixture()).metadata
    assert md.num_row_groups == 3 and set(rows) == {0, 1, 2}
    for g in range(3):
        rg = md.row_group(g)
        comp = sum(rg.column(c).total_compressed_size for c in range(rg.num_columns))
        unc = sum(rg.column(c).total_uncompressed_size for c in range(rg.num_columns))
        assert rows[g] == (rg.num_rows, rg.num_columns, comp, unc)
        assert rg.num_rows == 20_000
    assert _A43_FIXTURE.endswith("a43_rowgroup_fixture.parquet")


def test_j133_calibration_audit_matches_python(spark):
    """Full pipeline replay in pure Python: md5 minhash signatures,
    banded candidates, per-pair component matches, exact Jaccard —
    and the calibration LAW that mean exact Jaccard rises with the
    match count."""
    import hashlib
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sh = {}
    for did, txt in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        w = re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
        sh[did] = {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    def h(i, s):
        return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)

    mh = {
        did: [min(h(i, s) for s in ss) for i in range(16)]
        for did, ss in sh.items()
        if ss
    }
    buckets = defaultdict(set)
    for did, sig in mh.items():
        for band in range(4):
            key = (band, tuple(sig[band * 4 : band * 4 + 4]))
            buckets[key].add(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    per_bucket = defaultdict(list)
    for a, b in cand:
        m = sum(1 for i in range(16) if mh[a][i] == mh[b][i])
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        per_bucket[m].append(1000 * inter // union)
    want = {
        m: (len(v), 1000 * m // 16, sum(v) // len(v))
        for m, v in per_bucket.items()
    }
    got = {
        r.mh_matches: (r.n_pairs, r.est_milli, r.mean_exact_milli)
        for r in REGISTRY["j133_minhash_error_audit"].fn(spark, SF).collect()
    }
    assert got == want
    # calibration law: E[exact | matches] nondecreasing in matches on
    # this fixture (ties allowed)
    ms = sorted(got)
    assert all(got[a][2] <= got[b][2] for a, b in zip(ms, ms[1:]))


def test_f60_entropy_bounds_and_python_replay(spark):
    import math

    rows = REGISTRY["f60_spectral_entropy"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # H in [0, ln K] => flatness in [0, 1000] (micro rounding slack)
        assert 0 <= r.entropy_micro <= 1_000_000 * math.log(5) + 5
        assert 0 <= r.flatness_milli <= 1000
    # replay the entropy fold from f34's certified power lattice
    f34 = {}
    for r in REGISTRY["f34_periodogram"].fn(spark, SF).collect():
        f34.setdefault(r.event_type, []).append(r.power)
    for r in rows:
        powers = f34[r.event_type]
        tot = sum(powers)
        e = sum(
            round(-1_000_000 * (p / tot) * math.log(p / tot))
            for p in powers
            if 0 < p < tot
        )
        assert r.entropy_micro == e
        assert r.flatness_milli == round(1000 * e / (1_000_000 * math.log(5)))


def test_f61_sampen_matches_python(spark):
    series = _daily_cents_mean(spark)
    want = {}
    for et, xs in series.items():
        n = len(xs)
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) // (n * max(n - 1, 1))
        r_tol = math.isqrt(var) // 2
        emb = [
            (xs[i], xs[i + 1], xs[i + 2]) for i in range(n - 2)
        ]
        b_cnt = a_cnt = 0
        for i in range(len(emb)):
            for j in range(i + 1, len(emb)):
                a_, b_ = emb[i], emb[j]
                if max(abs(a_[0] - b_[0]), abs(a_[1] - b_[1])) <= r_tol:
                    b_cnt += 1
                    if abs(a_[2] - b_[2]) <= r_tol:
                        a_cnt += 1
        se = (
            round(-1000 * math.log(a_cnt / b_cnt))
            if a_cnt > 0 and b_cnt > 0
            else None
        )
        want[et] = (b_cnt, a_cnt, se)
    got = {
        r.event_type: (r.b_count, r.a_count, r.sampen_milli)
        for r in REGISTRY["f61_sample_entropy"].fn(spark, SF).collect()
    }
    assert got == want
    # discrimination: at least 4 of 5 types must have a defined SampEn
    assert sum(1 for v in got.values() if v[2] is not None) >= 4


def test_d28_tolerance_filters_not_falls_through(spark):
    """d28 = d7's match, kept only within 48 h — replayed directly
    against the registered d7 result: every d28 non-NULL equals d7's
    match with staleness <= 48 h; every NULL is either d7-NULL or
    beyond tolerance (never a fall-through to an older view)."""
    d7 = {
        r.event_id: r.last_view_ms
        for r in REGISTRY["d7_asof_join"].fn(spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "event_type"])
    us = {
        eid: int(ts.timestamp() * 1_000_000)
        for eid, ts, et in zip(
            t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
        )
        if et in ("purchase", "view")
    }
    rows = REGISTRY["d28_asof_tolerance_join"].fn(spark, SF).collect()
    assert {r.event_id for r in rows} == set(d7)
    n_matched = 0
    for r in rows:
        base = d7[r.event_id]
        if r.last_view_ms is not None:
            n_matched += 1
            assert r.last_view_ms == base
            # staleness truncates the MICROS difference (the engines'
            # contract), not the difference of ms-truncated stamps
            view_us = [u for u in us.values() if u // 1000 == base]
            assert r.staleness_ms == (us[r.event_id] - view_us[0]) // 1000
            assert 0 <= r.staleness_ms <= 48 * 3600 * 1000
        else:
            assert base is None or us[r.event_id] // 1000 - base > 48 * 3600 * 1000 - 1
    # the 48 h window must split the population both ways (j125 rule)
    assert 0 < n_matched < len(rows)


def test_e126_theil_u_asymmetry_and_python_replay(spark):
    rows = _quantities()
    cells = Counter((q // 10, q) for _, _, q, _ in rows)
    n = sum(cells.values())
    cx = Counter()
    cy = Counter()
    for (x, y), c in cells.items():
        cx[x] += c
        cy[y] += c

    def ent(counts, denom_of):
        s = 0
        for key, c in counts.items():
            d = denom_of(key)
            if 0 < c < d:
                s += round(-1_000_000 * (c / n) * math.log(c / d))
        return s

    hx = ent(cx, lambda k: n)
    hy = ent(cy, lambda k: n)
    hxy = ent(cells, lambda k: cy[k[1]])
    hyx = ent(cells, lambda k: cx[k[0]])
    (r,) = REGISTRY["e126_theil_u"].fn(spark, SF).collect()
    assert (r.hx_micro, r.hy_micro, r.hxy_micro, r.hyx_micro) == (hx, hy, hxy, hyx)
    # the pinned asymmetry: quantity DETERMINES its bucket
    assert r.u_x_given_y_milli == 1000 and r.hxy_micro == 0
    assert 0 < r.u_y_given_x_milli < 1000


def test_e127_brunner_munzel_matches_python(spark):
    rows = _quantities()
    hx = Counter(q + pk % 7 for g, _, q, pk in rows if g == "R")
    hy = Counter(q for g, _, q, _ in rows if g == "A")
    grid = sorted(set(hx) | set(hy))
    cumx = cumy = 0
    m2 = {}
    w2x = {}
    w2y = {}
    for v in grid:
        cx, cy = hx.get(v, 0), hy.get(v, 0)
        m2[v] = 2 * (cumx + cumy) + (cx + cy) + 1
        w2x[v] = 2 * cumx + cx + 1
        w2y[v] = 2 * cumy + cy + 1
        cumx += cx
        cumy += cy
    n1, n2 = sum(hx.values()), sum(hy.values())
    t1 = sum(hx.get(v, 0) * m2[v] for v in grid)
    t2 = sum(hy.get(v, 0) * m2[v] for v in grid)
    s2x_q = sum(
        hx.get(v, 0) * (m2[v] - w2x[v] - (t1 // n1 - (n1 + 1))) ** 2 for v in grid
    )
    s2y_q = sum(
        hy.get(v, 0) * (m2[v] - w2y[v] - (t2 // n2 - (n2 + 1))) ** 2 for v in grid
    )
    (r,) = REGISTRY["e127_brunner_munzel"].fn(spark, SF).collect()
    assert (r.n1, r.n2, r.t1, r.t2, r.s2x_q, r.s2y_q) == (
        n1, n2, t1, t2, s2x_q, s2y_q,
    )
    p_hat = 1000.0 * (t2 / n2 - (n2 + 1)) / (2.0 * n1)
    assert abs(r.p_hat_milli - p_hat) < 1e-6
    # cross-check against e125's pair counts: p_hat = (lt + eq/2)/pairs
    # with X the shifted 'R' sample (rank identity, exact up to the
    # truncating-mean lattice which only touches the variance terms)
    (d,) = REGISTRY["e125_cliffs_delta"].fn(spark, SF).collect()
    p_pairs = 1000.0 * (d.lt + d.eq / 2.0) / d.n_pairs
    assert abs(r.p_hat_milli - p_pairs) < 0.5
    # X shifted UP => P(X < Y) < 1/2 and a large-negative W
    assert r.p_hat_milli < 500
    assert r.w_stat < -3.0


def test_j134_ndcg_matches_python_and_discount_constants(spark):
    from cassandra_snap_to_hadoop_spark.queries.round10 import _J134_DISCOUNTS

    # the discount constants ARE round(1e6 / log2(i+1))
    for i, d in enumerate(_J134_DISCOUNTS):
        assert d == round(1_000_000 / math.log2(i + 2))
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "label", "embedding"])
    vecs = {}
    labels = {}
    for vid, lab, emb in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        vecs[vid] = [
            int(Decimal(float(x) * 100).quantize(Decimal(1), ROUND_HALF_UP))
            for x in emb
        ]
        labels[vid] = lab
    want = {}
    for qid in range(8):
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(vecs[qid], vecs[nid])), nid)
                for nid in vecs
                if nid != qid
            ),
        )
        rels = [1 if labels[nid] == labels[qid] else 0 for _, nid in scored]
        dcg = sum(r * d for r, d in zip(rels[:10], _J134_DISCOUNTS))
        n_rel = sum(rels)
        idcg = sum(_J134_DISCOUNTS[: min(n_rel, 10)])
        want[qid] = (sum(rels[:10]), n_rel, dcg, idcg, 1000 * dcg // idcg)
    got = {
        r.query_id: (r.n_rel_topk, r.n_rel, r.dcg_micro, r.idcg_micro, r.ndcg_milli)
        for r in REGISTRY["j134_ndcg_retrieval"].fn(spark, SF).collect()
    }
    assert got == want


def test_a44_lcs_levels_match_python(spark):
    from decimal import ROUND_HALF_UP, Decimal  # noqa: F401

    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_shipdate", "l_orderkey"])
    per = defaultdict(lambda: [0, 10**9, -1])
    for sd, ok in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        d = int(sd.timestamp() * 1_000_000) // 86_400_000_000 if hasattr(sd, "timestamp") else (
            (sd.toordinal() - 719163)
        )
        rec = per[d]
        rec[0] += 1
        tok = ok % 1000
        rec[1] = min(rec[1], tok)
        rec[2] = max(rec[2], tok)
    files = sorted(per.items(), key=lambda kv: -kv[0])  # newest first
    lv = {}
    for f, (day, (n, lo, hi)) in enumerate(files, start=1):
        lvl = 1 if f <= 10 else 2 if f <= 110 else 3 if f <= 1110 else 4
        lv.setdefault(lvl, []).append((lo, day, hi, n))
    want = {}
    for lvl, fs in lv.items():
        fs.sort(key=lambda x: (x[0], x[1]))
        overlaps = sum(
            1 for a, b in zip(fs, fs[1:]) if a[2] >= b[0]
        )
        cap = {1: 10, 2: 100, 3: 1000}.get(lvl, 10000)
        want[lvl] = (
            len(fs), sum(x[3] for x in fs), cap,
            1_000_000 * len(fs) // cap, overlaps,
        )
    got = {
        r.lvl: (r.n_files, r.rows_total, r.capacity_files, r.fill_ppm,
                r.overlap_pairs)
        for r in REGISTRY["a44_lcs_level_audit"].fn(spark, SF).collect()
    }
    assert got == want
    # the time-partitioning penalty: overlaps bounded by adjacency and
    # present somewhere (at sf0.001 daily files hold ~2 rows, so their
    # token ranges are narrow and only MOST adjacent pairs collide; at
    # sf0.1 every file spans the ring and overlaps == n_files - 1)
    assert all(
        0 <= overlaps <= n_files - 1
        for n_files, *_rest, overlaps in got.values()
        if n_files > 1
    )
    assert any(overlaps > 0 for *_rest, overlaps in got.values())


def test_j135_rrf_matches_python_and_rankings_diverge(spark):
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [
            int(Decimal(float(x) * 100).quantize(Decimal(1), ROUND_HALF_UP))
            for x in emb
        ]
        for vid, emb in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }
    want = {}
    diverged = False
    for qid in range(8):
        others = [n for n in vecs if n != qid]
        dots = {n: sum(a * b for a, b in zip(vecs[qid], vecs[n])) for n in others}
        d2s = {n: sum((a - b) ** 2 for a, b in zip(vecs[qid], vecs[n])) for n in others}
        r_dot = {n: i + 1 for i, n in enumerate(sorted(others, key=lambda n: (-dots[n], n)))}
        r_l2 = {n: i + 1 for i, n in enumerate(sorted(others, key=lambda n: (d2s[n], n)))}
        if any(r_dot[n] != r_l2[n] for n in others):
            diverged = True
        rrf = {
            n: 1_000_000 // (60 + r_dot[n]) + 1_000_000 // (60 + r_l2[n])
            for n in others
        }
        top = sorted(others, key=lambda n: (-rrf[n], n))[:5]
        for i, n in enumerate(top, start=1):
            want[(qid, n)] = (r_dot[n], r_l2[n], rrf[n], i)
    got = {
        (r.query_id, r.neighbor_id): (r.r_dot, r.r_l2, r.rrf_micro, r.fused_rank)
        for r in REGISTRY["j135_rrf_fusion"].fn(spark, SF).collect()
    }
    assert got == want
    # the two retrieval orders must genuinely differ somewhere, or the
    # fusion proves nothing (j125 rule)
    assert diverged


def test_j136_fightin_words_matches_python(spark):
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    ya: Counter = Counter()
    yb: Counter = Counter()
    agroup = {"src0", "src1", "src2", "src3", "src4"}
    for src, txt in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        words = re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
        tgt = ya if src in agroup else yb
        for w in words:
            if w:
                tgt[w] += 1
    na, nb = sum(ya.values()), sum(yb.values())
    a0 = na + nb
    scored = []
    for w in set(ya) | set(yb):
        y1, y2 = ya.get(w, 0), yb.get(w, 0)
        if y1 + y2 < 50:
            continue
        aw = 500.0 * (y1 + y2) / a0
        delta = round(
            1_000_000
            * (
                math.log((y1 + aw) / (na + 500.0 - y1 - aw))
                - math.log((y2 + aw) / (nb + 500.0 - y2 - aw))
            )
        )
        var = round(1_000_000 * (1.0 / (y1 + aw) + 1.0 / (y2 + aw)))
        z = round(1000.0 * delta / math.sqrt(1_000_000.0 * var))
        scored.append((w, y1, y2, delta, var, z))
    scored.sort(key=lambda r: (-abs(r[5]), r[0]))
    want = scored[:20]
    got = [
        (r.w, r.ya, r.yb, r.delta_micro, r.var_micro, r.z_milli)
        for r in REGISTRY["j136_fightin_words"].fn(spark, SF).collect()
    ]
    assert got == want
    # discrimination: the top word must separate the groups decisively
    assert abs(got[0][5]) > 500


def test_fourier_factor_table_pinned_against_math():
    """The shared f34/f60 factor table (ADVICE r10 item 4) must be the
    micro-rounded cos/sin of 2πr/p at every (period, r) lattice point,
    with exact anchors at the rational angles."""
    import math

    from cassandra_snap_to_hadoop_spark.queries.round5 import _PERIODS, FOURIER_MICRO

    assert len(FOURIER_MICRO) == sum(_PERIODS)
    for p, r, c, s in FOURIER_MICRO:
        assert c == round(math.cos(2 * math.pi * r / p) * 1_000_000)
        assert s == round(math.sin(2 * math.pi * r / p) * 1_000_000)
    by = {(p, r): (c, s) for p, r, c, s in FOURIER_MICRO}
    assert by[(3, 0)] == (1_000_000, 0)       # angle 0
    assert by[(14, 7)] == (-1_000_000, 0)     # angle π
    assert by[(30, 15)] == (-1_000_000, 0)    # angle π
    assert by[(4, 1)] if (4, 1) in by else True
