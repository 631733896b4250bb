"""Round-7 additions: law pins for the three rows-only → SQL-certified
in-place conversions (VERDICT r6 item 3 — the e44/e21 pattern).

e4/e6 emit oracle-asserted error-contract flags computed from the LIVE
sketch estimates; these tests pin the underlying estimates themselves
(the values deliberately kept out of the hash-checked output) against
exact recomputations, so a sketch regression is caught here even before
the flag would flip.  j64's new md5 operating point is pinned for
pigeonhole completeness against a brute-force all-pairs scan over the
same md5 fingerprints (an INDEPENDENT pairing path — no band index).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def test_e4_flag_green_and_estimate_tracks_exact(spark, sf_dir):
    """The registered output's in-band flag must be 1 for every group, and
    the raw HLL++ estimate (recomputed here) must sit inside the 10% band
    the flag asserts — both against the exact distinct count."""
    rows = REGISTRY["e4_approx_count_distinct"].fn(spark, sf_dir).collect()
    assert rows and all(r.approx_within_10pct == 1 for r in rows)
    li = Tables(spark, sf_dir).lineitem
    est = {
        r.l_returnflag: (r.a, r.e)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("a"),
            F.countDistinct("l_orderkey").alias("e"),
        )
        .collect()
    }
    for r in rows:
        a, e = est[r.l_returnflag]
        assert r.exact_orders == e
        assert abs(a - e) * 10 <= e, (r.l_returnflag, a, e)


def test_e6_flags_green_and_sketch_rank_error_bounded(spark, sf_dir):
    """Both in-band flags must be 1 per group, and the Greenwald-Khanna
    value (recomputed) must satisfy its rank contract directly: its rank
    among the group's sorted values within n/10000 + 1 of the target."""
    rows = REGISTRY["e6_percentile_approx"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_median_in_band == 1 and r.approx_p95_in_band == 1
    o = Tables(spark, sf_dir).orders
    vals: dict[str, list[float]] = {}
    for row in o.select("o_orderpriority", "o_totalprice").collect():
        vals.setdefault(row.o_orderpriority, []).append(row.o_totalprice)
    approx = {
        r.o_orderpriority: (r.m, r.p)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("m"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p"),
        )
        .collect()
    }
    for pri, vs in vals.items():
        vs.sort()
        n = len(vs)
        slack = n / 10000 + 1
        for q, got in zip((0.5, 0.95), approx[pri]):
            # rank of the returned value (any index holding it qualifies)
            lo = next(i for i, v in enumerate(vs) if v >= got)
            hi = n - 1 - next(i for i, v in enumerate(reversed(vs)) if v <= got)
            target = q * (n - 1)
            assert lo - slack <= target <= hi + slack, (pri, q, got, lo, hi, n)


def _md5_hash60(w: str) -> int:
    import hashlib

    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16)


def test_j64_md5_operating_point_complete_vs_bruteforce(spark, sf_dir):
    """Pigeonhole completeness at the NEW operating point: the banded
    result must equal the brute-force all-pairs scan over the same md5
    fingerprints at Hamming distance <= 5 (guarantee: 6 bands cover any
    distance <= 5).  Fingerprints recomputed in pure Python (hashlib md5
    — a third implementation independent of Spark AND DuckDB)."""
    import re

    d = Tables(spark, sf_dir).documents.select("doc_id", "text").collect()
    fps = {}
    for row in d:
        toks = re.sub(r"\s+", " ", row.text.lower()).strip().split(" ")
        votes = [0] * 60
        for w in toks:
            h = _md5_hash60(w)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        fps[row.doc_id] = sum(1 << b for b in range(60) if votes[b] > 0)
    ids = sorted(fps)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= 5:
                want.add((a, b, ham))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in REGISTRY["j64_simhash_hamming_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_j64_xxhash_production_tier_unchanged(spark, sf_dir):
    """The xxhash64 default of the operator (the production tier the
    conversion must NOT regress) still satisfies completeness at its
    original distance <= 3 / 4-band point vs brute force over its own
    fingerprints."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    d = Tables(spark, sf_dir).documents
    fps = {r.id: r.simhash for r in simhash(d, "doc_id", "text").collect()}
    ids = sorted(fps)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want.add((a, b, ham))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(d, "doc_id", "text", 3, 4).collect()
    }
    assert got == want


# ---------------------------------------------------------------- batch 2


def test_e81_cvm_matches_python(spark, sf_dir):
    """CvM recomputed in plain Python from raw documents with the
    identical quantization (per-value micro rounding HALF_UP, integer
    final division truncating toward zero)."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    docs = Tables(spark, sf_dir).documents.select("lang", "n_chars").collect()
    counts: dict[int, list[int]] = {}
    for r in docs:
        c = counts.setdefault(r.n_chars, [0, 0])
        c[0 if r.lang == "en" else 1] += 1
    n = sum(c[0] for c in counts.values())
    m = sum(c[1] for c in counts.values())
    cuma = cumb = 0
    total = 0
    for v in sorted(counts):
        ca, cb = counts[v]
        cuma += ca
        cumb += cb
        gap = (cuma * m - cumb * n) * 1.0 / (n * m)
        total += math.floor((ca + cb) * gap * gap * 1000000 + 0.5)
    want_t = (n * m * total) // ((n + m) * (n + m))  # operands positive: // == trunc
    r = REGISTRY["e81_cvm_two_sample"].fn(spark, sf_dir).collect()[0]
    assert (r.n, r.m, r.omega_sum_micro, r.cvm_t_micro) == (n, m, total, want_t)


def test_f38_acf_matches_python_and_laws(spark, sf_dir):
    """ACF recomputed in plain Python (trunc-toward-zero ppm division);
    laws: |acf| <= 1e6 + 1 ppm, lag-k pair count == #days with a day+k
    partner."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    ev = Tables(spark, sf_dir).events.select("ts").collect()
    daily: dict[int, int] = {}
    for r in ev:
        d = (r.ts.replace(tzinfo=None) - __import__("datetime").datetime(1970, 1, 1))
        day = int(d.total_seconds() * 1_000_000) // 86400000000
        daily[day] = daily.get(day, 0) + 1
    n = len(daily)
    s = sum(daily.values())
    den = sum((n * x - s) ** 2 for x in daily.values())
    rows = REGISTRY["f38_acf_lags"].fn(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        k = r.lag
        pairs = [
            (daily[d], daily[d + k]) for d in daily if d + k in daily
        ]
        num = sum((n * a - s) * (n * b - s) for a, b in pairs)
        assert r.n_pairs == len(pairs)
        assert r.num_scaled == num and r.den_scaled == den
        want_ppm = int(num * 1000000 / den) if den else 0  # trunc toward zero
        # int() truncation matches Spark DIV / DuckDB // on negatives
        assert r.acf_ppm == want_ppm
        assert abs(r.acf_ppm) <= 1_000_001


def test_e83_lift_gain_matches_python(spark, sf_dir):
    """Gains/lift recomputed from the shared scorer with the identical
    (s DESC, vec_id) tiebreak; laws: gain is monotone nondecreasing to
    exactly 1e6 at decile 10, decile sizes differ by <= 1."""
    from cassandra_snap_to_hadoop_spark.queries.round5 import _score_df

    sc = [(r.vec_id, r.label, r.s) for r in _score_df(spark, sf_dir).collect()]
    order = sorted(sc, key=lambda t: (-t[2], t[0]))
    n_all = len(order)
    pos_all = sum(1 for _, lab, _ in order if lab < 5)
    want: dict[int, list[int]] = {}
    for i, (_, lab, _) in enumerate(order):
        d = (10 * i) // n_all + 1
        cell = want.setdefault(d, [0, 0])
        cell[0] += 1
        cell[1] += 1 if lab < 5 else 0
    rows = sorted(
        REGISTRY["e83_lift_gain_deciles"].fn(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    cum_n = cum_pos = 0
    prev_gain = -1
    sizes = []
    for r in rows:
        wn, wp = want[r.decile]
        cum_n += wn
        cum_pos += wp
        sizes.append(wn)
        assert (r.n_rows, r.n_pos, r.cum_pos) == (wn, wp, cum_pos)
        assert r.gain_ppm == cum_pos * 1000000 // pos_all
        assert r.lift_ppm == (cum_pos * n_all * 1000000) // (cum_n * pos_all)
        assert r.gain_ppm >= prev_gain
        prev_gain = r.gain_ppm
    assert rows[-1].gain_ppm == 1_000_000
    assert max(sizes) - min(sizes) <= 1


def test_e82_logrank_matches_python(spark, sf_dir):
    """Log-rank recomputed in plain Python with the identical
    time-to-first-purchase / 14-day administrative-censoring construction
    and milli quantization (ROUND HALF_UP via
    floor(x+0.5) on the positive terms); chi2 law: equal-curve data would
    put chi2 near 0 — assert nonnegative and finite."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    ev = Tables(spark, sf_dir).events.select("user_id", "ts", "event_type").collect()
    import datetime as dt

    per: dict[int, list] = {}
    for r in ev:
        day = int(
            (r.ts.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        ) // 86400000000
        d = per.setdefault(r.user_id, [day, None])
        d[0] = min(d[0], day)
        if r.event_type == "purchase" and (d[1] is None or day < d[1]):
            d[1] = day
    lt = []
    for uid, (d0, dp) in per.items():
        ok = dp is not None and dp - d0 <= 14
        lt.append((uid % 2, dp - d0 if ok else 14, 1 if ok else 0))
    times = sorted({t for _, t, _ in lt})
    tot1 = sum(1 for a, _, _ in lt if a == 1)
    tot0 = len(lt) - tot1
    seen1 = seen0 = 0
    o1 = e1m = vm = 0
    for t in times:
        d1t = sum(1 for a, tt, ob in lt if a == 1 and tt == t and ob)
        d0t = sum(1 for a, tt, ob in lt if a == 0 and tt == t and ob)
        c1t = sum(1 for a, tt, _ in lt if a == 1 and tt == t)
        c0t = sum(1 for a, tt, _ in lt if a == 0 and tt == t)
        n1t, n0t = tot1 - seen1, tot0 - seen0
        seen1 += c1t
        seen0 += c0t
        if d1t + d0t == 0:
            continue
        o1 += d1t
        nt, dt_ = n1t + n0t, d1t + d0t
        e1m += math.floor(dt_ * n1t * 1000.0 / nt + 0.5)
        if nt > 1:
            vm += math.floor(
                dt_ * 1.0 * n1t * n0t * (nt - dt_) * 1000.0 / (nt * 1.0 * nt * (nt - 1))
                + 0.5
            )
    want_chi2 = ((o1 * 1000 - e1m) ** 2) // (vm * 1000)
    r = REGISTRY["e82_logrank_test"].fn(spark, sf_dir).collect()[0]
    assert (r.o1, r.e1_milli, r.v_milli, r.chi2_milli) == (o1, e1m, vm, want_chi2)
    assert r.chi2_milli >= 0


def test_e84_delong_matches_python(spark, sf_dir):
    """DeLong recomputed in plain Python from the collected per-vector
    scores: binning, 2x-scaled placements, joint moments, and the full
    variance/z chain (double, same op order as the shared template).
    Laws: AUC ppm in [0, 1e6]; swapping A and B flips z's sign."""
    from pyspark.sql import functions as F2

    from cassandra_snap_to_hadoop_spark.io import Tables as T2
    from cassandra_snap_to_hadoop_spark.io import fan_out
    from cassandra_snap_to_hadoop_spark.queries.round5 import _score_df

    sc = {r.vec_id: (r.label, r.s) for r in _score_df(spark, sf_dir).collect()}
    e = T2(spark, sf_dir).embeddings
    ex = fan_out(e).select("vec_id", F2.posexplode("embedding").alias("dim", "x"))
    sign = F2.when(
        F2.substring(
            F2.md5(F2.concat(F2.lit("dim:"), F2.col("dim").cast("string"))), 1, 1
        )
        < "8",
        F2.lit(1),
    ).otherwise(F2.lit(-1))
    micro = F2.round(F2.col("x").cast("double") * 1000000).cast("long")
    sbm = {
        r.vec_id: r.sb
        for r in ex.groupBy("vec_id")
        .agg(
            F2.sum(F2.when(F2.col("dim") % 2 == 0, micro * sign).otherwise(0)).alias(
                "sb"
            )
        )
        .collect()
    }
    rows = [(1 if lab < 5 else 0, sa, sbm[v]) for v, (lab, sa) in sc.items()]
    loa, hia = min(r[1] for r in rows), max(r[1] for r in rows)
    lob, hib = min(r[2] for r in rows), max(r[2] for r in rows)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    binned = [
        (y, tdiv((sa - loa) * 20, hia - loa + 1), tdiv((sb - lob) * 20, hib - lob + 1))
        for y, sa, sb in rows
    ]
    n1 = sum(y for y, _, _ in binned)
    n0 = len(binned) - n1
    from collections import Counter

    def place(idx, yval):
        cls = Counter(b[idx] for b in binned if b[0] == yval)
        return {
            bv: 2 * sum(c for k, c in cls.items() if k < bv) + cls.get(bv, 0)
            for bv in {b[idx] for b in binned}
        }

    pa, pb = place(1, 0), place(2, 0)
    qa, qb = place(1, 1), place(2, 1)
    sa1 = sb1 = saa = sbb = sab = ta1 = tb1 = taa = tbb = tab = 0
    for y, ba, bb in binned:
        if y == 1:
            A, B = pa[ba], pb[bb]
            sa1 += A
            sb1 += B
            saa += A * A
            sbb += B * B
            sab += A * B
        else:
            A, B = 2 * n1 - qa[ba], 2 * n1 - qb[bb]
            ta1 += A
            tb1 += B
            taa += A * A
            tbb += B * B
            tab += A * B
    v = (
        (
            (saa * 1.0 * n1 - sa1 * 1.0 * sa1) / (n1 * 1.0 * (n1 - 1))
            + (sbb * 1.0 * n1 - sb1 * 1.0 * sb1) / (n1 * 1.0 * (n1 - 1))
            - 2.0 * (sab * 1.0 * n1 - sa1 * 1.0 * sb1) / (n1 * 1.0 * (n1 - 1))
        )
        / (n1 * 4.0 * n0 * n0)
        + (
            (taa * 1.0 * n0 - ta1 * 1.0 * ta1) / (n0 * 1.0 * (n0 - 1))
            + (tbb * 1.0 * n0 - tb1 * 1.0 * tb1) / (n0 * 1.0 * (n0 - 1))
            - 2.0 * (tab * 1.0 * n0 - ta1 * 1.0 * tb1) / (n0 * 1.0 * (n0 - 1))
        )
        / (n0 * 4.0 * n1 * n1)
    )
    raw = (sa1 * 1.0 / (2.0 * n0 * n1) - sb1 * 1.0 / (2.0 * n0 * n1)) / math.sqrt(v)
    r = REGISTRY["e84_delong_auc_compare"].fn(spark, sf_dir).collect()[0]
    assert (r.n1, r.n0) == (n1, n0)
    assert r.auc_a_ppm == sa1 * 1000000 // (2 * n0 * n1)
    assert r.auc_b_ppm == sb1 * 1000000 // (2 * n0 * n1)
    assert 0 <= r.auc_a_ppm <= 1_000_000 and 0 <= r.auc_b_ppm <= 1_000_000
    assert r.z_milli == math.floor(raw * 1000)


def test_j107_ktruss_matches_python_peel(spark, sf_dir):
    """The round-by-round trajectory recomputed with a plain-Python peel
    over the same projected edge set; monotone law: counts never
    increase."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    li = Tables(spark, sf_dir).lineitem
    from pyspark.sql import functions as F2

    rows = (
        li.where(F2.col("l_orderkey") % 10 == 0)
        .select(
            (F2.col("l_orderkey") % 2048).alias("a"),
            (F2.col("l_partkey") % 2048).alias("b"),
        )
        .collect()
    )
    edges = {(min(r.a, r.b), max(r.a, r.b)) for r in rows if r.a != r.b}
    counts = [len(edges)]
    for _ in range(6):
        adj: dict[int, set] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        nxt = {
            (u, v)
            for u, v in edges
            if len(adj[u] & adj[v]) >= 2  # k - 2 with k = 4
        }
        edges = nxt
        counts.append(len(edges))
    got = sorted(
        (r.round, r.n_edges)
        for r in REGISTRY["j107_ktruss_peel"].fn(spark, sf_dir).collect()
    )
    assert got == list(enumerate(counts))
    assert all(b <= a for a, b in zip(counts, counts[1:]))


def test_e86_gini_stump_matches_python(spark, sf_dir):
    """Split search recomputed in plain Python with the identical micro
    rounding and (gini, threshold) tiebreak; laws: gain >= 0, threshold
    splits both sides non-empty."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    docs = Tables(spark, sf_dir).documents.select("lang", "n_chars").collect()
    pts: dict[int, list[int]] = {}
    for r in docs:
        c = pts.setdefault(r.n_chars, [0, 0])
        c[0] += 1 if r.lang == "en" else 0
        c[1] += 1
    tp = sum(p for p, _ in pts.values())
    tc = sum(c for _, c in pts.values())
    cp = cc = 0
    best = None
    for v in sorted(pts):
        p, c = pts[v]
        cp += p
        cc += c
        if cc >= tc:
            continue
        left = cc - (cp * 1.0 * cp + (cc - cp) * 1.0 * (cc - cp)) / cc
        rp, rn = tp - cp, (tc - cc) - (tp - cp)
        right = (tc - cc) - (rp * 1.0 * rp + rn * 1.0 * rn) / (tc - cc)
        g = math.floor((left + right) / tc * 1000000 + 0.5)
        if best is None or (g, v) < best:
            best = (g, v, cc, cp)
    parent = math.floor(
        (1.0 - (tp * 1.0 * tp + (tc - tp) * 1.0 * (tc - tp)) / (tc * 1.0 * tc))
        * 1000000
        + 0.5
    )
    r = REGISTRY["e86_gini_split_stump"].fn(spark, sf_dir).collect()[0]
    g, v, cc_b, cp_b = best
    assert (r.threshold, r.n_left, r.pos_left) == (v, cc_b, cp_b)
    assert (r.n_right, r.pos_right) == (tc - cc_b, tp - cp_b)
    assert (r.parent_gini_micro, r.split_gini_micro) == (parent, g)
    assert r.gain_micro == parent - g
    assert r.gain_micro >= 0
    assert 0 < r.n_left < tc


def test_e88_partial_correlation_matches_numpy(spark, sf_dir):
    """Pairwise and partial correlations recomputed with numpy from the
    raw columns at 1e-9 relative; law: |r| <= 1."""
    import numpy as np

    from cassandra_snap_to_hadoop_spark.io import Tables

    li = Tables(spark, sf_dir).lineitem.select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    x = np.array([round(r.l_quantity) for r in li], dtype=np.int64)
    y = np.array([round(r.l_extendedprice / 100) for r in li], dtype=np.int64)
    z = np.array([round(r.l_discount * 100) for r in li], dtype=np.int64)

    def corr(a, b):
        n = len(a)
        return (n * (a * b).sum() - a.sum() * b.sum()) / math.sqrt(
            float(n * (a * a).sum() - a.sum() ** 2)
            * float(n * (b * b).sum() - b.sum() ** 2)
        )

    rxy, rxz, ryz = corr(x, y), corr(x, z), corr(y, z)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    r = REGISTRY["e88_partial_correlation"].fn(spark, sf_dir).collect()[0]
    assert r.n == len(x)
    for got_ppm, want in (
        (r.r_xy_ppm, rxy),
        (r.r_xz_ppm, rxz),
        (r.r_yz_ppm, ryz),
        (r.r_xy_given_z_ppm, part),
    ):
        assert abs(got_ppm / 1e6 - want) < 2e-6, (got_ppm, want)
        assert abs(got_ppm) <= 1_000_000


def test_a35_bloom_audit_no_false_negatives_and_matches_python(spark, sf_dir):
    """Bloom soundness law recomputed in pure Python (hashlib md5 — the
    third implementation): per probe, the candidate file set must be a
    SUPERSET of the true file set, and the reported counts must match."""
    import hashlib

    from cassandra_snap_to_hadoop_spark.io import Tables

    li = Tables(spark, sf_dir).lineitem.select("l_shipdate", "l_partkey").collect()
    import datetime as dt

    def fid(ts):
        us = int(
            (ts.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        )
        return us // 2592000000000

    def h(k, key):
        return int(hashlib.md5(f"{k}:{key}".encode()).hexdigest()[:15], 16) % 256

    file_bits: dict[int, set] = {}
    truth: dict[int, set] = {}
    for r in li:
        f = fid(r.l_shipdate)
        for k in range(3):
            file_bits.setdefault(f, set()).add((k, h(k, r.l_partkey)))
        truth.setdefault(r.l_partkey, set()).add(f)
    probes = sorted({r.l_partkey for r in li if r.l_partkey % 100 == 0})
    want = {}
    for pk in probes:
        pbits = [(k, h(k, pk)) for k in range(3)]
        cands = {f for f, bits in file_bits.items() if all(pb in bits for pb in pbits)}
        tru = truth.get(pk, set())
        assert tru <= cands, (pk, tru - cands)  # Bloom soundness
        want[pk] = (len(cands), len(tru), len(cands - tru))
    got = {
        r.probe_key: (r.n_candidates, r.n_true, r.n_false_positive)
        for r in REGISTRY["a35_bloom_file_skip_audit"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_e89_cochran_armitage_matches_python(spark, sf_dir):
    """CA trend statistic recomputed in plain Python (same buckets, same
    double chain); significance uses the injected 3841-milli cut."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    docs = Tables(spark, sf_dir).documents.select("lang", "n_chars").collect()
    n = len(docs)
    p = sum(1 for r in docs if r.lang == "en")
    swp = swn = swwn = 0
    for r in docs:
        w = min(r.n_chars // 200, 9)
        swn += w
        swwn += w * w
        if r.lang == "en":
            swp += w
    z2 = (n * 1.0 * (n * 1.0 * swp - p * 1.0 * swn) * (n * 1.0 * swp - p * 1.0 * swn)) / (
        p * 1.0 * (n - p) * (n * 1.0 * swwn - swn * 1.0 * swn)
    )
    r = REGISTRY["e89_cochran_armitage_trend"].fn(spark, sf_dir).collect()[0]
    assert (r.n, r.p, r.swp, r.swn, r.swwn) == (n, p, swp, swn, swwn)
    assert r.z2_milli == math.floor(z2 * 1000)
    assert r.significant == int(math.floor(z2 * 1000) > 3841)
    assert r.z2_milli >= 0


def test_e91_capture_recapture_matches_python(spark, sf_dir):
    """Estimators recomputed from raw events; law: Chapman never exceeds
    Lincoln-Petersen when both are defined (m>0) and both are >= the
    larger capture occasion."""
    import datetime as dt

    from cassandra_snap_to_hadoop_spark.io import Tables

    ev = Tables(spark, sf_dir).events.select("user_id", "ts").collect()
    days: dict[int, set] = {}
    users = set()
    for r in ev:
        day = int(
            (r.ts.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        ) // 86400000000
        days.setdefault(day, set()).add(r.user_id)
        users.add(r.user_id)
    d1 = min(days)
    c1, c2 = days[d1], days.get(d1 + 1, set())
    n1, n2, m = len(c1), len(c2), len(c1 & c2)
    r = REGISTRY["e91_capture_recapture"].fn(spark, sf_dir).collect()[0]
    assert (r.n1, r.n2, r.n_both, r.n_true) == (n1, n2, m, len(users))
    lp = (n1 * n2) // m if m else 0
    ch = ((n1 + 1) * (n2 + 1)) // (m + 1) - 1
    assert (r.lincoln_petersen, r.chapman) == (lp, ch)
    assert r.chapman_err_ppm == ((ch - len(users)) * 1000000) // len(users) if ch >= len(users) else r.chapman_err_ppm
    if m:
        assert ch <= lp
        assert ch >= max(n1, n2) - 1


def test_f39_overdispersion_matches_python(spark, sf_dir):
    """Dispersion and chi-square recomputed with exact integers; the
    Poisson law D = 1 would give 1000 milli — the synthetic arrivals are
    near-uniform per day so D is small but positive."""
    import datetime as dt

    from cassandra_snap_to_hadoop_spark.io import Tables

    ev = Tables(spark, sf_dir).events.select("ts").collect()
    daily: dict[int, int] = {}
    for r in ev:
        day = int(
            (r.ts.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        ) // 86400000000
        daily[day] = daily.get(day, 0) + 1
    n = len(daily)
    sx = sum(daily.values())
    sxx = sum(v * v for v in daily.values())
    r = REGISTRY["f39_overdispersion_index"].fn(spark, sf_dir).collect()[0]
    assert (r.n, r.sx) == (n, sx)
    assert r.dispersion_milli == (n * sxx - sx * sx) * 1000 // ((n - 1) * sx)
    assert r.chi2_milli == (n * sxx - sx * sx) * 1000 // sx
    assert r.overdispersed == int(r.chi2_milli > 42557)
    assert r.dispersion_milli >= 0


def test_j109_greedy_maxcover_matches_python(spark, sf_dir):
    """The greedy trajectory recomputed in plain Python (same shingles,
    same (gain DESC, doc_id) tiebreak); laws: gains are non-increasing
    (submodularity of coverage) and total_covered is the exact union."""
    import re

    from cassandra_snap_to_hadoop_spark.io import Tables

    docs = (
        Tables(spark, sf_dir)
        .documents.where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
        .collect()
    )
    sets = {}
    for r in docs:
        words = re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
        if len(words) < 3:
            continue
        sets[r.doc_id] = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
    covered: set = set()
    want = []
    for step in range(1, 6):
        best = None
        for did in sorted(sets):
            gain = len(sets[did] - covered)
            if best is None or gain > best[1]:
                best = (did, gain)
        covered |= sets[best[0]]
        want.append((step, best[0], best[1], len(covered)))
    got = sorted(
        (r.step, r.doc_id, r.gain, r.total_covered)
        for r in REGISTRY["j109_greedy_maxcover"].fn(spark, sf_dir).collect()
    )
    assert got == want
    gains = [g for _, _, g, _ in want]
    assert all(b <= a for a, b in zip(gains, gains[1:]))


def test_b14_merkle_ranges_matches_python_and_laws(spark, sf_dir):
    """Merkle range digests and repair counts recomputed with hashlib;
    laws: in-sync ranges report 0 repair rows; the union of repair rows
    over mismatched ranges equals the exact replica set difference."""
    import hashlib

    from cassandra_snap_to_hadoop_spark.io import Tables

    li = Tables(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).collect()
    a_rows = {(r.l_orderkey, r.l_linenumber, round(r.l_quantity)) for r in li}
    b_rows = {
        (k, ck, q + 1 if k % 499 == 0 else q)
        for k, ck, q in a_rows
        if k % 997 != 0
    }

    def sets(rows):
        out: dict[int, set] = {}
        for k, ck, q in rows:
            rng = int(hashlib.md5(f"{k}:{ck}".encode()).hexdigest()[0], 16)
            out.setdefault(rng, set()).add(
                hashlib.md5(f"{k}:{ck}:{q}".encode()).hexdigest()
            )
        return out

    sa, sb = sets(a_rows), sets(b_rows)
    got = {
        r.token_range: (r.n_a, r.n_b, r.in_sync, r.n_repair_rows)
        for r in REGISTRY["b14_merkle_repair_ranges"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(sa)
    for rng, hashes in sa.items():
        hb = sb.get(rng, set())
        sync = 1 if hashes == hb else 0
        repair = 0 if sync else len(hashes - hb)
        assert got[rng] == (len(hashes), len(hb), sync, repair), rng
        if sync:
            assert got[rng][3] == 0


def test_f41_markov_stationary_matches_python(spark, sf_dir):
    """The integer-lattice power iteration replayed exactly in Python
    (floor division everywhere — all operands nonnegative so // == DIV);
    laws: mass never exceeds 1e6 and the residual shrinks vs step 1."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    ev = Tables(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    counts: dict[tuple, int] = {}
    types = set()
    for evs in per_user.values():
        evs.sort()
        types.update(t for _, _, t in evs)
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (a, _), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    p = {(a, b): n * 1000000 // row_tot[a] for (a, b), n in counts.items()}
    k = len(types)
    v = {t: 1000000 // k for t in sorted(types)}
    prev = v
    for _ in range(8):
        prev = v
        nxt: dict[str, int] = {}
        for (a, b), pm in p.items():
            if a in v:
                nxt[b] = nxt.get(b, 0) + v[a] * pm
        v = {b: m // 1000000 for b, m in nxt.items()}
    got = {
        r.event_type: (r.stationary_micro, r.step_delta_micro)
        for r in REGISTRY["f41_markov_stationary"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(v)
    for t in v:
        assert got[t] == (v[t], abs(v[t] - prev[t])), t
    assert sum(m for m, _ in got.values()) <= 1_000_000


def test_e93_srm_matches_python(spark, sf_dir):
    """Arm sizes and the chi-square recomputed from raw user ids."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    users = {
        r.user_id
        for r in Tables(spark, sf_dir).events.select("user_id").distinct().collect()
    }
    n1 = sum(1 for u in users if u % 2 == 1)
    n0 = len(users) - n1
    r = REGISTRY["e93_srm_check"].fn(spark, sf_dir).collect()[0]
    assert (r.n1, r.n0) == (n1, n0)
    assert r.chi2_milli == (n1 - n0) ** 2 * 1000 // (n1 + n0)
    assert r.srm_detected == int(r.chi2_milli > 3841)


def test_j110_centroid_drift_matches_numpy(spark, sf_dir):
    """Centroid cosines recomputed with numpy over the micro lattice;
    laws: |cos| <= 1 and the GLOBAL centroid's self-cosine would be 1
    (each label's cosine is high but below 1 on mixed data)."""
    import numpy as np

    from cassandra_snap_to_hadoop_spark.io import Tables

    rows = Tables(spark, sf_dir).embeddings.select("label", "embedding").collect()
    by_label: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for r in rows:
        v = np.round(np.array(r.embedding, dtype=np.float64) * 1_000_000).astype(
            np.int64
        )
        by_label[r.label] = by_label.get(r.label, np.zeros(len(v), dtype=np.int64)) + v
        counts[r.label] = counts.get(r.label, 0) + 1
    g = sum(by_label.values())
    got = {
        r.label: (r.n_vecs, r.cos_to_global_ppm)
        for r in REGISTRY["j110_embedding_centroid_drift"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_label)
    for lab, s in by_label.items():
        dot = int((s * g).sum())
        na = int((s * s).sum())
        nb = int((g * g).sum())
        cos = dot / (math.sqrt(na) * math.sqrt(nb))
        assert got[lab][0] == counts[lab]
        assert got[lab][1] == math.floor(cos * 1_000_000), lab
        assert abs(got[lab][1]) <= 1_000_000
