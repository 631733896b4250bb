"""Round-9 pins: independent pure-Python third implementations of the
reliability tier (e116 Cronbach's alpha, e117 Anderson-Darling, e118
Krippendorff's alpha, e119 ICC(1,1)) so a Spark+DuckDB twin bug cannot
hide behind a matching hash.  Integer sufficient statistics assert
EXACT equality; e117's per-value micro-rounded double terms allow ±1
micro per distinct value for python-vs-engine ulps.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _complete_blocks():
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    per = defaultdict(dict)
    for ok, ln, q in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        if ln <= 4:
            # (orderkey, linenumber) is NOT unique in this corpus — the
            # b14/b17 row-version lesson; MIN-dedup each slot like the
            # engines do
            q = int(round(q))
            per[ok][ln] = min(per[ok][ln], q) if ln in per[ok] else q
    return {k: v for k, v in per.items() if len(v) == 4}


def test_e116_cronbach_python_replay(spark, sf_dir):
    blocks = _complete_blocks()
    n = len(blocks)
    sum_item_var = 0
    for j in range(1, 5):
        xs = [b[j] for b in blocks.values()]
        sum_item_var += n * sum(x * x for x in xs) - sum(xs) ** 2
    ts = [sum(b.values()) for b in blocks.values()]
    total_var = n * sum(t * t for t in ts) - sum(ts) ** 2
    # Spark DIV / DuckDB // truncate toward zero; Python // floors and
    # diverges by 1 on negative alpha (it IS negative on this fixture)
    num = 4 * 1000 * (total_var - sum_item_var)
    want = (
        abs(num) // (3 * total_var) * (1 if num >= 0 else -1)
        if total_var > 0
        else None
    )
    # exact-Fraction cross-check of the textbook form alpha =
    # k/(k-1) * (1 - sum(var_j)/var_total): the n-scaled numerators
    # share the n^2 denominator, so the trunc-milli values agree
    # (int() on a Fraction truncates toward zero, matching the engines)
    if total_var > 0:
        alpha = Fraction(4, 3) * (1 - Fraction(sum_item_var, total_var))
        assert want == int(1000 * alpha)
    row = REGISTRY["e116_cronbach_alpha"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.sum_item_var, row.total_var, row.alpha_milli) == (
        n, sum_item_var, total_var, want,
    )


def test_e117_anderson_darling_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    counts = defaultdict(lambda: [0, 0])
    for lang, v in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        counts[v][0 if lang == "en" else 1] += 1
    n = sum(a for a, _ in counts.values())
    m = sum(b for _, b in counts.values())
    cuma = cumn = 0
    s_micro = 0
    n_terms = 0
    for v in sorted(counts):
        ca, cb = counts[v]
        cuma += ca
        cumn += ca + cb
        cumb = cumn - cuma
        if cumn < n + m:
            z = cuma * m - cumb * n
            term = (ca + cb) * (z / cumn) * (z / (n + m - cumn)) * 1e6
            s_micro += int(term + 0.5) if term >= 0 else -int(-term + 0.5)
            n_terms += 1
    row = REGISTRY["e117_anderson_darling"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.m) == (n, m)
    # per-term double rounding may drift 1 micro against python's order
    assert abs(row.ad_sum_micro - s_micro) <= n_terms
    assert row.ad_micro == row.ad_sum_micro // (n * m)
    # AD is nonnegative by construction (every term is z^2-weighted)
    assert row.ad_sum_micro >= 0


def test_e118_krippendorff_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag"],
    )
    per = defaultdict(list)
    for ok, ln, c in zip(
        t.column(0).to_pylist(), t.column(1).to_pylist(), t.column(2).to_pylist()
    ):
        if ln <= 3:
            per[ok].append(c)
    do_total = 0
    marg = Counter()
    n_tot = 0
    for cs in per.values():
        m_u = len(cs)
        if m_u < 2:
            continue
        cnt = Counter(cs)
        marg.update(cnt)
        n_tot += m_u
        disagree = m_u * (m_u - 1) - sum(c * (c - 1) for c in cnt.values())
        do_total += 1_000_000 * disagree // (m_u - 1)
    de_num = n_tot * n_tot - sum(c * c for c in marg.values())
    want = (
        1000 - do_total * (n_tot - 1) // (1000 * de_num) if de_num > 0 else None
    )
    row = REGISTRY["e118_krippendorff_alpha"].fn(spark, sf_dir).collect()[0]
    assert (row.n_tot, row.do_total, row.de_num, row.alpha_milli) == (
        n_tot, do_total, de_num, want,
    )
    # perfect disagreement floor / perfect agreement ceiling
    assert row.alpha_milli is None or row.alpha_milli <= 1000


def test_e119_icc_python_replay(spark, sf_dir):
    blocks = _complete_blocks()
    n = len(blocks)
    g = sum(sum(b.values()) for b in blocks.values())
    g2 = sum(x * x for b in blocks.values() for x in b.values())
    ss = sum(sum(b.values()) ** 2 for b in blocks.values())
    ssb4n = n * ss - g * g
    ssw4n = 4 * n * g2 - n * ss
    den = 3 * n * ssb4n + 3 * (n - 1) * ssw4n
    # trunc toward zero, not Python floor (negative ICC on this fixture)
    num = 1000 * (3 * n * ssb4n - (n - 1) * ssw4n)
    want = abs(num) // den * (1 if num >= 0 else -1) if den > 0 else None
    # Fraction cross-check of the textbook ICC(1,1) = (MSB-MSW)/(MSB+3MSW):
    # int() on a Fraction truncates toward zero, matching the engines
    if den > 0:
        msb = Fraction(ssb4n, 4 * n * (n - 1))
        msw = Fraction(ssw4n, 4 * n * n * 3)
        icc = (msb - msw) / (msb + 3 * msw)
        assert want == int(1000 * icc)
    row = REGISTRY["e119_icc_oneway"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.ssb4n, row.ssw4n, row.icc_milli) == (n, ssb4n, ssw4n, want)
    # SSW >= 0 and SSB >= 0 by Cauchy-Schwarz on the lattice
    assert row.ssb4n >= 0 and row.ssw4n >= 0


def test_e116_e119_share_complete_block_population(spark, sf_dir):
    """The two reliability statistics must read the SAME subjects —
    their n columns agree (one fixture, two decompositions)."""
    a = REGISTRY["e116_cronbach_alpha"].fn(spark, sf_dir).collect()[0]
    b = REGISTRY["e119_icc_oneway"].fn(spark, sf_dir).collect()[0]
    assert a.n == b.n


def test_j127_decontamination_python_replay(spark, sf_dir):
    import re as _re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    rows = list(zip(*(t.column(c).to_pylist() for c in t.column_names)))
    grams = {}
    for did, src, text in rows:
        w = _re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")
        grams[did] = (
            src,
            {" ".join(w[i : i + 8]) for i in range(len(w) - 7)} if len(w) >= 8 else set(),
        )
    ev = set().union(*(g for d, (s, g) in grams.items() if d % 10 == 7))
    per_src_train = Counter(s for d, (s, g) in grams.items() if d % 10 != 7)
    cont = defaultdict(int)
    collisions = set()
    for d, (s, g) in grams.items():
        if d % 10 == 7:
            continue
        hit = g & ev
        if hit:
            cont[s] += 1
            collisions |= hit
    out = {r.source: r for r in REGISTRY["j127_ngram_decontamination"].fn(spark, sf_dir).collect()}
    assert set(out) == set(per_src_train)
    for s, r in out.items():
        assert (r.n_train, r.n_contaminated) == (per_src_train[s], cont[s])
        assert r.cont_ppm == 1_000_000 * cont[s] // per_src_train[s]
        assert r.n_collision_grams == len(collisions)
    # the fixture must discriminate (the j125 zero-count lesson)
    assert sum(cont.values()) > 0


def test_b19_hinted_handoff_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"],
    )
    windows = {0: (10, 12), 1: (30, 38), 2: (50, 65)}
    per = defaultdict(lambda: Counter())
    best = {}
    status = []
    for ok, ln, sd, ep in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        r = ok % 3
        phase = (int(sd.timestamp() * 1_000_000) // 86_400_000_000) % 100
        cents = int(round(ep * 100))
        s, e = windows[r]
        st = (
            "direct" if phase < s or phase >= e
            else ("hinted" if e - phase <= 5 else "dropped")
        )
        per[r][st] += 1
        status.append((r, ok, ln, phase, cents, st))
        k = (r, ok, ln)
        if k not in best or (phase, cents) > best[k]:
            best[k] = (phase, cents)
    stale = defaultdict(set)
    for r, ok, ln, phase, cents, st in status:
        if st == "dropped" and best[(r, ok, ln)] == (phase, cents):
            stale[r].add((ok, ln))
    rows = {r.replica: r for r in REGISTRY["b19_hinted_handoff"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2}
    for r in (0, 1, 2):
        row = rows[r]
        assert (row.n_direct, row.n_hinted, row.n_dropped) == (
            per[r]["direct"], per[r]["hinted"], per[r]["dropped"],
        )
        assert row.stale_keys == len(stale[r])
    # r0's outage (2 days) is shorter than the hint window: nothing drops
    assert rows[0].n_dropped == 0 and rows[0].stale_keys == 0
    # conservation: every mutation classified exactly once
    n_total = sum(per[r].total() for r in per)
    assert n_total == t.num_rows


def test_d27_bitemporal_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice"],
    )
    vers = defaultdict(list)
    for sk, ok, sd, ep in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        valid = int(sd.timestamp() * 1_000_000) // 86_400_000_000
        vers[sk].append((valid, valid + ok % 30, int(round(ep * 100))))
    rows = REGISTRY["d27_bitemporal_asof"].fn(spark, sf_dir).collect()
    assert len(rows) == 3 * len(vers)
    tx_bites = 0
    for r in rows:
        vs = vers[r.k]
        lo = min(v[0] for v in vs)
        hi = max(v[0] for v in vs)
        t_want = lo + (hi - lo) * (r.probe_id + 1) // 4
        assert (r.t, r.tx_asof) == (t_want, t_want + 10 * r.probe_id)
        vis = [v for v in vs if v[0] <= r.t and v[1] <= r.tx_asof]
        if vis:
            w = max(vis)
            assert (r.picked_valid, r.picked_tx, r.picked_cents) == w
        else:
            assert r.picked_valid is None and r.picked_cents is None
        # does the transaction axis BITE here: the valid-only as-of
        # (ignoring tx) would pick a different version
        valid_only = [v for v in vs if v[0] <= r.t]
        if valid_only and max(valid_only) != (max(vis) if vis else None):
            tx_bites += 1
    # the correction lag must actually exclude versions somewhere —
    # otherwise the fixture degenerates to a one-axis as-of (the j125
    # zero-count lesson)
    assert tx_bites > 0


def test_f51_sax_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    daily = defaultdict(lambda: [0, 0])
    for et, ts, v in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        day = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        d = daily[(et, day)]
        d[0] += int(v + 0.5) if v >= 0 else -int(-v + 0.5)
        d[1] += 1
    series = defaultdict(list)
    for (et, day), (s, c) in sorted(daily.items()):
        series[et].append(s // c)
    want = {}
    for et, xs in series.items():
        n = len(xs)
        s, q = sum(xs), sum(x * x for x in xs)
        v = n * q - s * s
        segs = defaultdict(lambda: [0, 0])
        for i, x in enumerate(xs):
            g = (i * 6) // n
            segs[g][0] += 1
            segs[g][1] += x
        for g, (c, seg_sum) in segs.items():
            d = n * seg_sum - s * c
            if d < 0 and 1_000_000 * d * d > 185_526 * c * c * v:
                sym = "a"
            elif d > 0 and 1_000_000 * d * d > 185_526 * c * c * v:
                sym = "c"
            else:
                sym = "b"
            want[(et, g)] = (c, d, v, sym)
    rows = REGISTRY["f51_sax_symbolization"].fn(spark, sf_dir).collect()
    assert len(rows) == len(want)
    syms = Counter()
    for r in rows:
        assert (r.c, r.d, r.v, r.symbol) == want[(r.event_type, r.seg)], r
        syms[r.symbol] += 1
    # fixture discriminates: all three letters appear across the corpus
    assert set(syms) == {"a", "b", "c"}, syms
    # PAA conservation: per type the segment deviations sum to zero
    per_type = defaultdict(int)
    for r in rows:
        per_type[r.event_type] += r.d
    assert all(v == 0 for v in per_type.values())


def test_j128_repetition_python_replay(spark, sf_dir):
    import re as _re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, flag1, flag2, s1, s2, s3
    for did, src, text in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        w = _re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")
        n_tok = len(w)
        bc = Counter(" ".join(w[i : i + 2]) for i in range(n_tok - 1))
        tc = Counter(" ".join(w[i : i + 3]) for i in range(n_tok - 2))
        top_big = max(bc.values()) if bc else 0
        dup_big = sum(c for c in bc.values() if c >= 2)
        dup_tri = sum(c for c in tc.values() if c >= 2)
        p1 = 1_000_000 * top_big // max(n_tok - 1, 1)
        p2 = 1_000_000 * dup_big // max(n_tok - 1, 1)
        p3 = 1_000_000 * dup_tri // max(n_tok - 2, 1)
        a = agg[src]
        a[0] += 1
        a[1] += p1 > 100_000
        a[2] += p3 > 40_000
        a[3] += p1
        a[4] += p2
        a[5] += p3
    rows = {r.source: r for r in REGISTRY["j128_repetition_signals"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for s, a in agg.items():
        r = rows[s]
        assert (
            r.n_docs, r.n_top_bigram_flagged, r.n_dup_trigram_flagged,
            r.mean_top_bigram_ppm, r.mean_dup_bigram_ppm, r.mean_dup_trigram_ppm,
        ) == (a[0], a[1], a[2], a[3] // a[0], a[4] // a[0], a[5] // a[0])
        # coverage fractions live in [0, 1e6] and top <= dup-bigram mass
        # can exceed top only when a second duplicated bigram exists —
        # the unconditional law is mean_top <= mean_dup + 1e6 slack-free
        assert 0 <= r.mean_top_bigram_ppm <= 1_000_000
        assert 0 <= r.mean_dup_trigram_ppm <= 1_000_000
    # fixture discriminates: some doc somewhere flags on each signal
    assert sum(a[1] for a in agg.values()) > 0
    assert sum(a[2] for a in agg.values()) > 0


def test_f52_cross_correlation_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    daily = defaultdict(lambda: [0, 0])
    for et, ts in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        if et not in ("click", "purchase"):
            continue
        day = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        daily[day][0 if et == "click" else 1] += 1
    n = len(daily)
    sx = sum(v[0] for v in daily.values())
    sy = sum(v[1] for v in daily.values())
    want = {}
    for k in range(-7, 8):
        num = 0
        c = 0
        for day, (x, _) in daily.items():
            if day + k in daily:
                y = daily[day + k][1]
                num += (n * x - sx) * (n * y - sy)
                c += 1
        want[k] = (c, num)
    best = max(want, key=lambda k: (want[k][1], -abs(k), -k))
    rows = REGISTRY["f52_cross_correlation"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    for r in rows:
        assert (r.n_overlap, r.num) == want[r.k], r.k
        assert r.is_best == (1 if r.k == best else 0)
    assert sum(r.is_best for r in rows) == 1
    # lag-0 overlap is the full calendar; |k|=7 loses exactly 7 days
    lag0 = next(r for r in rows if r.k == 0)
    lag7 = next(r for r in rows if r.k == 7)
    assert lag0.n_overlap == n and lag7.n_overlap == n - 7


def test_e120_tukey_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    st = {g: [0, 0, 0] for g in "ANR"}
    for g, q in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        qi = int(round(q))
        s = st[g]
        s[0] += 1
        s[1] += qi
        s[2] += qi * qi
    msw = sum(s[2] - s[1] * s[1] / s[0] for s in (st["A"], st["N"], st["R"])) / (
        sum(s[0] for s in st.values()) - 3
    )
    rows = {r.pair: r for r in REGISTRY["e120_tukey_hsd"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"A-N", "A-R", "N-R"}
    for pair, (i, j) in {"A-N": "AN", "A-R": "AR", "N-R": "NR"}.items():
        si, ni = st[i][1], st[i][0]
        sj, nj = st[j][1], st[j][0]
        d = si / ni - sj / nj
        q2 = d * d / (msw / 2 * (1 / ni + 1 / nj)) * 1e6
        want = int(q2 + 0.5)
        r = rows[pair]
        assert (r.n_i, r.n_j) == (ni, nj)
        # double-chain replay: python op order differs from the shared
        # SQL template only in summation of the 3 MSW terms -> ±2 micro
        assert abs(r.q2_micro - want) <= 2, (pair, r.q2_micro, want)
        assert r.significant == (1 if r.q2_micro > 10_986_000 else 0)
        assert r.q2_micro >= 0


def test_k16_pane_merge_equals_direct(spark, sf_dir):
    """The pane-merge identity replayed in python: per-event direct
    window assembly equals the engine's pane-merged output EXACTLY."""
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    direct = defaultdict(lambda: [0, 0])
    for et, ts, v in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        h = int(ts.timestamp() * 1_000_000) // 3_600_000_000
        cents = int(v * 100 + 0.5) if v >= 0 else -int(-v * 100 + 0.5)
        for o in range(3):
            d = direct[(et, h - o)]
            d[0] += 1
            d[1] += cents
    rows = REGISTRY["k16_pane_merged_sliding"].fn(spark, sf_dir).collect()
    assert len(rows) == len(direct)
    for r in rows:
        assert (r.n_events, r.sum_cents) == tuple(direct[(r.event_type, r.w_start)])
    # conservation: every event contributes to exactly 3 windows
    assert sum(r.n_events for r in rows) == 3 * t.num_rows


def _emb_micro():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    out = {}
    for vid, emb, lab in zip(
        t.column("vec_id").to_pylist(),
        t.column("embedding").to_pylist(),
        t.column("label").to_pylist(),
    ):
        v = []
        for x in emb:
            d = float(x) * 1_000_000
            v.append(int(d + 0.5) if d >= 0 else -int(-d + 0.5))
        out[vid] = (lab, v)
    return out


def test_j129_hard_negatives_python_replay(spark, sf_dir):
    embs = _emb_micro()
    rows = REGISTRY["j129_hard_negative_mining"].fn(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.qid].append(r)
    assert set(by_q) == {v for v in embs if v < 8}
    for qid, rs in by_q.items():
        qlab, qv = embs[qid]
        cands = sorted(
            (
                (-sum(a * b for a, b in zip(qv, v)), vid)
                for vid, (lab, v) in embs.items()
                if lab != qlab
            ),
        )[:3]
        rs.sort(key=lambda r: r.rnk)
        assert [r.neg_id for r in rs] == [vid for _, vid in cands]
        assert [r.dot for r in rs] == [-d for d, _ in cands]
        # the defining constraint: every mined negative crosses labels
        assert all(r.neg_label != r.qlabel for r in rs)
        # hardness ordering
        assert rs[0].dot >= rs[1].dot >= rs[2].dot


def test_j130_label_noise_python_replay(spark, sf_dir):
    embs = _emb_micro()
    per_label = defaultdict(lambda: [0, 0])
    for pid, (plab, pv) in embs.items():
        if pid % 25 != 0:
            continue
        knn = sorted(
            (
                (-sum(a * b for a, b in zip(pv, v)), vid, lab)
                for vid, (lab, v) in embs.items()
                if vid != pid
            ),
        )[:3]
        votes = defaultdict(lambda: [0, 9])
        for rnk, (_, vid, lab) in enumerate(knn, 1):
            votes[lab][0] += 1
            votes[lab][1] = min(votes[lab][1], rnk)
        win = max(votes.items(), key=lambda kv: (kv[1][0], -kv[1][1], kv[0]))[0]
        per_label[plab][0] += 1
        per_label[plab][1] += win != plab
    rows = {r.label: r for r in REGISTRY["j130_knn_label_noise"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(per_label)
    for lab, (n, fl) in per_label.items():
        r = rows[lab]
        assert (r.n_probes, r.n_flagged) == (n, fl)
        assert r.flag_ppm == 1_000_000 * fl // n


def test_b20_consistency_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"],
    )
    best = {}
    for ok, ln, sd, ep in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        phase = (int(sd.timestamp() * 1_000_000) // 86_400_000_000) % 100
        cents = int(round(ep * 100))
        k = (ok, ln)
        if k not in best or (phase, cents) > best[k]:
            best[k] = (phase, cents)
    windows = [(10, 12), (30, 38), (50, 65)]
    n = len(best)
    fresh = {"ONE": 0, "QUORUM": 0, "ALL": 0}
    for (ok, ln), (phase, _) in best.items():
        present = [not (s <= phase < e - 5) for s, e in windows]
        h = (ok // 7) % 3
        fresh["ONE"] += present[h]
        fresh["QUORUM"] += present[h] or present[(h + 1) % 3]
        fresh["ALL"] += any(present)
    rows = {r.cl: r for r in REGISTRY["b20_consistency_level_freshness"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"ONE", "QUORUM", "ALL"}
    for cl in rows:
        assert (rows[cl].n_keys, rows[cl].n_fresh) == (n, fresh[cl]), cl
        assert rows[cl].fresh_ppm == 1_000_000 * fresh[cl] // n
    # the tunable-consistency LAW: freshness is monotone in the CL
    assert rows["ONE"].n_fresh <= rows["QUORUM"].n_fresh <= rows["ALL"].n_fresh
    # the fixture must show real staleness somewhere below ALL
    assert rows["ONE"].n_fresh < rows["ALL"].n_fresh or rows["ALL"].n_fresh < n


def _rows(rows):
    return sorted(map(tuple, rows))


def test_sql_api_group_by_all_matches_explicit(spark, sf_dir):
    """GROUP BY ALL must resolve to exactly the explicit grouping —
    value-equal on the same session."""
    from pyspark.sql import functions as F

    from cassandra_snap_to_hadoop_spark.io import Tables

    got = _rows(
        REGISTRY["sql_api_group_by_all"].fn(spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "n", "sum_qty").collect()
    )
    explicit = _rows(
        Tables(spark, sf_dir).lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        )
        .collect()
    )
    assert got == explicit


def test_f53_seasonal_strength_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    daily = Counter()
    for et, ts in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        daily[(et, int(ts.timestamp() * 1_000_000) // 86_400_000_000)] += 1
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        series[et].append((d, c))
    want = {}
    for et, xs in series.items():
        det = []
        for i in range(len(xs)):
            if i < 3 or i >= len(xs) - 3:
                continue
            sum7 = sum(c for _, c in xs[i - 3 : i + 4])
            det.append((xs[i][0] % 7, 1000 * xs[i][1] - (1000 * sum7) // 7))
        ph = defaultdict(list)
        for p, v in det:
            ph[p].append(v)
        s_of = {
            p: (sum(v) // len(v) if sum(v) >= 0 else -((-sum(v)) // len(v)))
            for p, v in ph.items()
        }
        resid = [v - s_of[p] for p, v in det]
        dv = [v for _, v in det]
        n = len(det)
        v_resid = n * sum(r * r for r in resid) - sum(resid) ** 2
        v_detr = n * sum(v * v for v in dv) - sum(dv) ** 2
        fs = max(0, 1000 * (v_detr - v_resid) // v_detr) if v_detr > 0 else None
        want[et] = (n, v_resid, v_detr, fs)
    rows = {r.event_type: r for r in REGISTRY["f53_seasonal_strength"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for et, (n, vr, vd, fs) in want.items():
        r = rows[et]
        assert (r.n, r.v_resid, r.v_detr, r.f_seasonal_milli) == (n, vr, vd, fs)
        # variance dominance: removing the seasonal mean per phase can
        # only shrink the within-phase variance sum, so F_s in [0, 1000]
        assert r.f_seasonal_milli is None or 0 <= r.f_seasonal_milli <= 1000


def test_j131_semdedup_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    by_label = defaultdict(dict)
    for vid, emb, lab in zip(
        t.column("vec_id").to_pylist(),
        t.column("embedding").to_pylist(),
        t.column("label").to_pylist(),
    ):
        v = []
        for x in emb:
            d = float(x) * 100
            v.append(int(d + 0.5) if d >= 0 else -int(-d + 0.5))
        by_label[lab][vid] = v
    want = {}
    for lab, vecs in by_label.items():
        ids = sorted(vecs)
        n2 = {i: sum(c * c for c in vecs[i]) for i in ids}
        pairs = 0
        pruned = set()
        for i_pos, a in enumerate(ids):
            for b in ids[i_pos + 1 :]:
                dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
                if dot > 0 and 100 * dot * dot > 81 * n2[a] * n2[b]:
                    pairs += 1
                    pruned.add(b)
        want[lab] = (len(ids), pairs, len(pruned))
    rows = {r.label: r for r in REGISTRY["j131_semdedup"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for lab, (n, pairs, npr) in want.items():
        r = rows[lab]
        assert (r.n_vecs, r.n_dup_pairs, r.n_pruned, r.n_kept) == (
            n, pairs, npr, n - npr,
        )
        assert r.n_pruned <= r.n_dup_pairs  # each pruned vec needs >=1 pair


def test_e121_weighted_kappa_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    cells = Counter()
    for pr, tp in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        r1 = int(pr[0])
        r2 = min(5, 1 + int(round(tp * 100)) // 10_000_000)
        cells[(r1, r2)] += 1
    n = sum(cells.values())
    rows_m = Counter()
    cols_m = Counter()
    for (r1, r2), c in cells.items():
        rows_m[r1] += c
        cols_m[r2] += c
    sum_wo = sum((r1 - r2) ** 2 * c for (r1, r2), c in cells.items())
    sum_we = sum(
        (i - j) ** 2 * rows_m[i] * cols_m[j] for i in rows_m for j in cols_m
    )
    want = 1000 - 1000 * n * sum_wo // sum_we if sum_we > 0 else None
    row = REGISTRY["e121_weighted_kappa"].fn(spark, sf_dir).collect()[0]
    assert (row.n, row.sum_wo, row.sum_we, row.qwk_milli) == (
        n, sum_wo, sum_we, want,
    )
    # exact-Fraction cross-check: 1000 - floor(1000*(1-qwk)) is the
    # CEILING of 1000*qwk (identity: 1000 - floor(x) == ceil(1000 - x))
    if sum_we > 0:
        import math

        qwk = 1 - Fraction(n * sum_wo, sum_we)
        assert want == math.ceil(1000 * qwk)
    assert row.qwk_milli is None or row.qwk_milli <= 1000


def test_b21_ring_rebalance_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )
    mat = defaultdict(lambda: [0, 0])
    total = 0
    for ok, ep in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        tok = ok % 1000
        old = 0 if tok < 333 else (1 if tok < 666 else 2)
        new = 0 if tok < 250 else (1 if tok < 500 else (2 if tok < 750 else 3))
        m = mat[(old, new)]
        m[0] += 1
        m[1] += int(round(ep * 100))
        total += 1
    rows = REGISTRY["b21_ring_rebalance_plan"].fn(spark, sf_dir).collect()
    assert len(rows) == len(mat)
    for r in rows:
        n, cents = mat[(r.old_owner, r.new_owner)]
        assert (r.n_rows, r.bytes_proxy_cents) == (n, cents)
        assert r.moves == (0 if r.old_owner == r.new_owner else 1)
        # ring monotonicity: contiguous re-cuts only ever hand ranges to
        # an ADJACENT-or-same owner index (old <= new <= old+1 here)
        assert r.old_owner <= r.new_owner <= r.old_owner + 1
    # conservation: the matrix partitions all rows
    assert sum(r.n_rows for r in rows) == total


def test_f54_hurst_python_replay(spark, sf_dir):
    import math

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    daily = defaultdict(lambda: [0, 0])
    for et, ts, v in zip(*(t.column(c).to_pylist() for c in t.column_names)):
        day = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        d = daily[(et, day)]
        d[0] += int(v + 0.5) if v >= 0 else -int(-v + 0.5)
        d[1] += 1
    series = defaultdict(list)
    for (et, day), (s, c) in sorted(daily.items()):
        series[et].append(s // c)
    want = {}
    for et, xs in series.items():
        rs2 = {}
        nw = {}
        for w in (8, 24):
            qs = []
            for wid in range(len(xs) // w):
                win = xs[wid * w : (wid + 1) * w]
                s, q = sum(win), sum(x * x for x in win)
                v = w * q - s * s
                if v <= 0:
                    continue
                zk, mx, mn = 0, None, None
                acc = 0
                for k, x in enumerate(win, 1):
                    acc += w * x
                    zk = acc - k * s
                    mx = zk if mx is None else max(mx, zk)
                    mn = zk if mn is None else min(mn, zk)
                r = mx - mn
                qs.append(1_000_000 * r * r // v)
            if qs:
                rs2[w] = sum(qs) // len(qs)
                nw[w] = len(qs)
        if 8 in rs2 and 24 in rs2:
            h = (
                int(
                    round(
                        1000 * math.log(rs2[24] / rs2[8]) / 2.1972245773362196
                    )
                )
                if rs2[8] > 0 and rs2[24] > 0
                else None
            )
            want[et] = (nw[8], rs2[8], nw[24], rs2[24], h)
    rows = {r.event_type: r for r in REGISTRY["f54_hurst_rs"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for et, (n8, r8, n24, r24, h) in want.items():
        r = rows[et]
        assert (r.n_w8, r.rs2_w8, r.n_w24, r.rs2_w24) == (n8, r8, n24, r24)
        # the single LN is a double chain — allow 1 milli for ulps
        assert abs(r.hurst_milli - h) <= 1
        # R/S grows with window size on any non-constant series
        assert r.rs2_w24 >= r.rs2_w8
