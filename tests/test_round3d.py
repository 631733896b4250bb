"""Round-3 third-continuation batch: algorithmic-guarantee tests.

Each new operator family ships with the law that makes it trustworthy:
PPJoin's prefix filter is LOSSLESS (equals the naive quadratic join),
pigeonhole banding is COMPLETE for Hamming <= bands-1 (equals brute
force), incremental MV folds are ASSOCIATIVE (any batch split equals the
full recompute), and the sequential folds (Holt) match an independent
pure-Python reference.
"""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, load
from cassandra_snap_to_hadoop_spark.operators.dedup import (
    jaccard_pairs,
    ppjoin_pairs,
    simhash,
    simhash_hamming_pairs,
)
from cassandra_snap_to_hadoop_spark.operators.incremental import (
    merge_order_partials,
    order_partials,
    present,
)
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- j62 PPJoin


def test_ppjoin_equals_naive_quadratic(spark, sf_dir):
    """Prefix-filtering completeness theorem: the PPJoin result is exactly
    the naive all-shingle self-join result at the same threshold — no
    blocking column, no approximation."""
    d = Tables(spark, sf_dir).documents
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ppjoin_pairs(d, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    naive = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            d, "doc_id", "text", k=3, threshold=0.5, block_col=None
        ).collect()
    }
    # jaccard_pairs filters on the ROUNDED ratio >= t while ppjoin filters on
    # the exact integer inequality; at t=0.5 both are exact (inter*2 >= union
    # iff ratio >= .5, and rounding at 4dp cannot cross 0.5 from below by
    # more than 5e-5 — assert set equality on ids and near-equality overall).
    assert {(a, b) for a, b, _ in fast} == {(a, b) for a, b, _ in naive}
    assert fast == naive


def test_ppjoin_all_pairs_meet_threshold(spark, sf_dir):
    rows = REGISTRY["j62_ppjoin_pairs"].fn(spark, sf_dir).collect()
    assert rows and all(r.jaccard >= 0.75 for r in rows)


# ------------------------------------------------- j63 sorted neighborhood


def test_snm_matches_python_reference(spark, sf_dir):
    docs = (
        Tables(spark, sf_dir)
        .documents.select("doc_id", "lang", "source", "n_chars")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
    expect = set()
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r.n_chars, r.doc_id))
        for i, a in enumerate(rows):
            for j in range(i + 1, min(i + 4, len(rows))):
                b = rows[j]
                delta = abs(a.n_chars - b.n_chars)
                score = 2 * (a.source == b.source) + (delta <= 30)
                expect.add((lang, a.doc_id, b.doc_id, delta, score))
    got = {
        (r.lang, r.id_a, r.id_b, r.delta_chars, r.score)
        for r in REGISTRY["j63_sorted_neighborhood_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == expect


# ------------------------------------------------- a24 incremental MV fold


def _mv_key(rows):
    return {
        (r.o_orderpriority, r.yr): (r.n_orders, r.total_price, r.max_price, r.min_price)
        for r in rows
    }


@_slow
@given(n_batches=st.integers(2, 5), salt=st.integers(0, 10**6))
def test_incremental_mv_fold_equals_recompute_any_split(spark, sf_dir, n_batches, salt):
    """Associativity law: partition orders into ANY n batches (by a salted
    deterministic hash), aggregate each batch independently, fold the
    partials — the presented MV equals the single-pass recompute."""
    o = load(spark, sf_dir, "orders")
    bucket = F.pmod(F.xxhash64(F.col("o_orderkey"), F.lit(salt)), F.lit(n_batches))
    parts = [
        order_partials(o.filter(bucket == i)) for i in range(n_batches)
    ]
    folded = _mv_key(present(merge_order_partials(parts)).collect())
    full = _mv_key(present(order_partials(o)).collect())
    assert folded == full


def test_incremental_mv_query_green_rows(spark, sf_dir):
    rows = REGISTRY["a24_incremental_mv_maintenance"].fn(spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load(spark, sf_dir, "orders").count()


# ------------------------------------------------------- i18 date spine


def test_date_spine_is_dense_and_conserves_counts(spark, sf_dir):
    rows = REGISTRY["i18_date_spine_coverage"].fn(spark, sf_dir).collect()
    days = sorted(r.day for r in rows)
    assert len(days) == (days[-1] - days[0]).days + 1  # dense calendar
    assert len(set(days)) == len(days)
    assert sum(r.n_orders for r in rows) == load(spark, sf_dir, "orders").count()
    assert all((r.n_orders == 0) == (r.is_gap == 1) for r in rows)
    assert any(r.is_gap == 1 for r in rows)  # the synthetic data has gaps


# ------------------------------------------------------------ e36 KS test


def test_ks_matches_python_reference(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents.select("source", "n_chars").collect()
    allv = sorted({r.n_chars for r in docs})
    per = Counter()
    for r in docs:
        per[(r.source, r.n_chars)] += 1
    sources = sorted({r.source for r in docs})
    N = len(docs)
    expect = {}
    for s in sources:
        n_s = sum(c for (src, _), c in per.items() if src == s)
        cum_s = cum_g = 0
        d_num = 0
        for v in allv:
            cum_s += per.get((s, v), 0)
            cum_g += sum(c for (src, vv), c in per.items() if vv == v)
            d_num = max(d_num, abs(cum_s * (N - n_s) - (cum_g - cum_s) * n_s))
        expect[s] = (n_s, N - n_s, d_num, d_num / (n_s * (N - n_s)))
    got = {
        r.source: (r.n_source, r.n_rest, r.d_num, r.d_stat)
        for r in REGISTRY["e36_ks_drift"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for s in expect:
        assert got[s][:3] == expect[s][:3], s
        assert got[s][3] == pytest.approx(expect[s][3], abs=0, rel=0)  # same ints -> same double


# --------------------------------------------------------- f24 Holt fold


def _holt_ref(xs: list[float], alpha=0.5, beta=0.3):
    level = xs[0]
    trend = (xs[1] - xs[0]) if len(xs) > 1 else 0.0
    for v in xs[1:]:
        prev = level
        level = alpha * v + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
    return round(level, 4), round(trend, 4), round(level + 7 * trend, 4)


def test_holt_matches_python_reference(spark, sf_dir):
    """The round-10 SQL-certified integer micro-lattice fold, replayed
    independently in pure Python (its own epoch-day zero-fill and
    sign-split trunc division — Python // floors, the engines
    truncate)."""
    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("d")
    ).collect()
    per: dict[int, Counter] = {}
    for r in ev:
        per.setdefault(r.user_id, Counter())[int(r.d)] += 1

    def tdiv(a: int, b: int) -> int:
        return abs(a) // b if a >= 0 else -(abs(a) // b)

    expect = {}
    for uid, counts in per.items():
        lo, hi = min(counts), max(counts)
        xs = [counts.get(d, 0) * 1_000_000 for d in range(lo, hi + 1)]
        lvl, trend = xs[0], (xs[1] - xs[0] if len(xs) > 1 else 0)
        for x in xs[1:]:
            prev = lvl
            lvl = tdiv(x + lvl + trend, 2)
            trend = tdiv(3 * (lvl - prev) + 7 * trend, 10)
        expect[uid] = (len(xs), lvl, trend, lvl + 7 * trend)
    got = {
        r.user_id: (r.n_days, r.level_micros, r.trend_micros, r.forecast7_micros)
        for r in REGISTRY["f24_holt_forecast"].fn(spark, sf_dir).collect()
    }
    assert got == expect


@_slow
@given(xs=st.lists(st.floats(0, 50, allow_nan=False), min_size=1, max_size=40))
def test_holt_reference_is_finite_and_linear_forecast(xs):
    level, trend, fc = _holt_ref(xs)
    assert fc == pytest.approx(level + 7 * trend, abs=1e-3)


# ------------------------------------------------ j64 pigeonhole Hamming


def test_pigeonhole_equals_bruteforce(spark, sf_dir):
    """Completeness: 4-band pigeonhole at Hamming <= 3 finds EXACTLY the
    pairs the all-pairs popcount scan finds."""
    d = Tables(spark, sf_dir).documents
    fps = {r.id: r.simhash for r in simhash(d, "doc_id", "text").collect()}
    ids = sorted(fps)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
            if h <= 3:
                brute.add((a, b, h))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(d, "doc_id", "text", 3, 4).collect()
    }
    assert got == brute
    assert brute  # fixture has exact dups -> hamming-0 pairs exist


def test_pigeonhole_rejects_unsound_parameters():
    with pytest.raises(ValueError):
        simhash_hamming_pairs(None, "id", "text", max_hamming=4, n_bands=4)


# ------------------------------------------- e37 chi-square independence


def test_chi2_matches_python_reference(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents.select("lang", "source").collect()
    cells = Counter((r.lang, r.source) for r in docs)
    R = Counter(r.lang for r in docs)
    C = Counter(r.source for r in docs)
    N = len(docs)
    chi2_micro = 0
    for (lang, src), o in cells.items():
        dev = float(o) * N - float(R[lang]) * C[src]
        chi2_micro += round(dev * dev / (float(N) * R[lang] * C[src]) * 1e6)
    row = REGISTRY["e37_chi2_independence"].fn(spark, sf_dir).collect()[0]
    assert row.chi2_micro == chi2_micro
    assert row.n_cells == len(cells)
    assert row.dof == (len(R) - 1) * (len(C) - 1)


# ------------------------------------------------- e38 bootstrap CI


def test_bootstrap_ci_matches_python_reference(spark, sf_dir):
    """Exact replication of the hash-gated resampling with hashlib — a
    THIRD independent md5 implementation agreeing with Spark and DuckDB."""
    import hashlib

    orders = Tables(spark, sf_dir).orders.select("o_orderkey", "o_totalprice").collect()
    cents = {r.o_orderkey: round(r.o_totalprice * 100) for r in orders}
    means = []
    for b in range(1, 101):
        s = c = 0
        for k, v in cents.items():
            h = hashlib.md5(f"{k}:{b}".encode()).hexdigest()
            if h[0] < "8":
                s += v
                c += 1
        means.append((s / (c * 100.0), b))
    means.sort()
    row = REGISTRY["e38_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row.n_resamples == 100
    assert row.ci_lo == means[4][0]
    assert row.ci_hi == means[94][0]
    assert row.mean_full == sum(cents.values()) / (len(cents) * 100.0)
    assert row.ci_lo <= row.mean_full <= row.ci_hi


# ------------------------------------------------- e39 Kaplan-Meier


def test_kaplan_meier_matches_python_reference(spark, sf_dir):
    import math

    ev = Tables(spark, sf_dir).events.select("user_id", F.to_date("ts").alias("day")).collect()
    per: dict[int, list] = {}
    for r in ev:
        per.setdefault(r.user_id, []).append(r.day)
    w = max(max(v) for v in per.values())
    lifetimes = []
    for days in per.values():
        d0, d1 = min(days), max(days)
        lifetimes.append(((d1 - d0).days, 1 if (w - d1).days >= 3 else 0))
    total = len(lifetimes)
    agg: dict[int, list] = {}
    for t, obs in lifetimes:
        a = agg.setdefault(t, [0, 0])
        a[0] += obs
        a[1] += 1
    expect = {}
    consumed = 0
    s_micro = 0
    dead = 0
    for t in sorted(agg):
        d, cnt = agg[t]
        at_risk = total - consumed
        consumed += cnt
        if 0 < d < at_risk:
            s_micro += round(math.log((at_risk - d) / at_risk) * 1e6)
        if d >= at_risk:
            dead = 1
        km = 0.0 if dead else round(math.exp(s_micro / 1e6), 4)
        expect[t] = (at_risk, d, cnt - d, s_micro, km)
    got = {
        r.t_days: (r.at_risk, r.events, r.censored, r.s_micro, r.km_r4)
        for r in REGISTRY["e39_kaplan_meier"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    # survival is monotone nonincreasing in t
    kms = [got[t][4] for t in sorted(got)]
    assert all(a >= b for a, b in zip(kms, kms[1:]))


def test_incremental_mv_stream_fold_parity(spark, sf_dir, tmp_path):
    """K7-style streaming twin of a24: orders arrive as micro-batch files,
    each foreachBatch emits its partial-aggregate STATE (never raw rows),
    and folding the per-batch states equals the one-shot batch recompute —
    the production shape of incremental MV refresh under Structured
    Streaming's availableNow trigger."""
    from cassandra_snap_to_hadoop_spark.io import SCHEMAS

    o = load(spark, sf_dir, "orders")
    root = str(tmp_path / "orders")
    (
        o.withColumn("shard", F.pmod(F.xxhash64("o_orderkey"), F.lit(6)))
        .repartition("shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(root)
    )
    states: list[list] = []

    def fold(batch_df, _bid):
        rows = order_partials(batch_df).collect()
        if rows:
            states.append(rows)

    q = (
        spark.readStream.schema(SCHEMAS["orders"])
        .option("maxFilesPerTrigger", 2)
        .parquet(root + "/*")
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(states) > 1, "expected multiple micro-batches"
    parts = [
        spark.createDataFrame(rows, schema=order_partials(o).schema) for rows in states
    ]
    folded = _mv_key(present(merge_order_partials(parts)).collect())
    full = _mv_key(present(order_partials(o)).collect())
    assert folded == full


# ------------------------------------------------------ j66 BPE merges


def _bpe_ref(freqs: dict[str, int], n_merges=10, min_weight=2):
    cur = {" ".join(w): f for w, f in freqs.items()}
    out = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for sp, f in cur.items():
            toks = sp.split(" ")
            for i in range(len(toks) - 1):
                counts[toks[i] + " " + toks[i + 1]] += f
        if not counts:
            break
        # argmax with (weight desc, pair asc) tie-break
        pair = min(counts, key=lambda p: (-counts[p], p))
        w = counts[pair]
        if w < min_weight:
            break
        merged = pair.replace(" ", "")
        out.append((step, pair, merged, w))
        nxt: dict[str, int] = {}
        for sp, f in cur.items():
            ns = (" " + sp + " ").replace(" " + pair + " ", " " + merged + " ").strip()
            nxt[ns] = nxt.get(ns, 0) + f
        cur = nxt
    return out


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """The full merge SEQUENCE (pairs, order, weights) equals an
    independent pure-Python BPE over the same word-frequency table."""
    import re

    docs = Tables(spark, sf_dir).documents.select("text").collect()
    freqs = Counter()
    for r in docs:
        for w in re.sub(r"\s+", " ", r.text.lower()).strip().split(" "):
            if w:
                freqs[w] += 1
    expect = _bpe_ref(dict(freqs), 10)
    got = [
        (r.step, r.pair, r.merged, r.weight)
        for r in sorted(
            REGISTRY["j66_bpe_merges"].fn(spark, sf_dir).collect(), key=lambda r: r.step
        )
    ]
    assert got == expect
    assert len(got) == 10
    # merge weights are monotone nonincreasing only within same-symbol
    # regimes, but every weight must be >= 2 and every merged token must be
    # the concatenation of its pair
    assert all(w >= 2 and m == p.replace(" ", "") for _, p, m, w in got)


# ------------------------------------------- j67 clipped bigram precision


def test_ngram_overlap_matches_python_reference(spark, sf_dir):
    import re

    docs = Tables(spark, sf_dir).documents.collect()
    by_lang: dict[str, list] = {}
    grams: dict[int, Counter] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
        toks = [w for w in re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")]
        grams[r.doc_id] = Counter(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        )
    expect = {}
    for rows in by_lang.values():
        rows.sort(key=lambda r: (r.n_chars, r.doc_id))
        for i, a in enumerate(rows):
            for j in range(i + 1, min(i + 4, len(rows))):
                b = rows[j]
                if a.source != b.source:
                    continue
                ga, gb = grams[a.doc_id], grams[b.doc_id]
                clip = sum(min(ca, gb[g]) for g, ca in ga.items() if g in gb)
                total = sum(gb.values())
                expect[(a.doc_id, b.doc_id)] = (clip, total, clip / total)
    got = {
        (r.id_a, r.id_b): (r.clip2, r.total2, r.p2)
        for r in REGISTRY["j67_ngram_overlap_metrics"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[0] > 0 for v in got.values())  # dup clusters give overlap


# -------------------------------------------------------------- e40 CUPED


def test_cuped_matches_python_reference(spark, sf_dir):
    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day"), "value"
    ).collect()
    cut = dt.date(2024, 1, 15)
    per: dict[int, list[int]] = {}
    for r in ev:
        xy = per.setdefault(r.user_id, [0, 0])
        xy[0 if r.day <= cut else 1] += round(r.value * 100)
    n = len(per)
    sx = sum(v[0] for v in per.values())
    sy = sum(v[1] for v in per.values())
    sxx = sum(v[0] * v[0] for v in per.values())
    syy = sum(v[1] * v[1] for v in per.values())
    sxy = sum(v[0] * v[1] for v in per.values())
    cxx, cyy, cxy = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    row = REGISTRY["e40_cuped_adjustment"].fn(spark, sf_dir).collect()[0]
    assert (row.n_users, row.cov_xx, row.cov_yy, row.cov_xy) == (n, cxx, cyy, cxy)
    assert row.theta == cxy / cxx
    assert row.var_reduction == 1.0 - (float(cxy) * cxy) / (float(cxx) * cyy)
    assert 0.0 <= row.var_reduction <= 1.0  # Cauchy-Schwarz


# ------------------------------------------------- i19 edit distance


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python_reference(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents.collect()
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
    expect = {}
    for rows in by_lang.values():
        rows.sort(key=lambda r: (r.n_chars, r.doc_id))
        for i, a in enumerate(rows):
            for j in range(i + 1, min(i + 4, len(rows))):
                b = rows[j]
                if a.source != b.source or abs(a.n_chars - b.n_chars) > 30:
                    continue
                d = _lev(a.text[:40], b.text[:40])
                expect[(a.doc_id, b.doc_id)] = (d, int(d <= 5))
    got = {
        (r.id_a, r.id_b): (r.lev40, r.is_close)
        for r in REGISTRY["i19_edit_distance_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # the blocked pair set is nonempty at every SF
    assert all(v[0] >= 0 and v[1] == int(v[0] <= 5) for v in got.values())


# ------------------------------------------------------------- e41 OLS


def test_ols_matches_python_reference(spark, sf_dir):
    """Moments equal an exact-integer Python accumulation; betas equal
    numpy's least-squares solution to ~1e-9 relative (different solver,
    same normal equations)."""
    rows = Tables(spark, sf_dir).lineitem.select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    n = len(rows)
    s1 = s2 = sy = s11 = s12 = s22 = s1y = s2y = syy = 0
    xs = []
    import math

    # HALF_UP like Spark/DuckDB ROUND — Python's round() is half-EVEN and
    # disagrees on exact half-dollar prices.
    r_up = lambda v: math.floor(v + 0.5)
    for r in rows:
        x1, x2 = r_up(r.l_quantity * 100), r_up(r.l_discount * 10000)
        y = r_up(r.l_extendedprice)
        xs.append((x1, x2, y))
        s1 += x1; s2 += x2; sy += y
        s11 += x1 * x1; s12 += x1 * x2; s22 += x2 * x2
        s1y += x1 * y; s2y += x2 * y; syy += y * y
    got = REGISTRY["e41_ols_normal_equations"].fn(spark, sf_dir).collect()[0]
    assert (got.n_rows, got.s1, got.s2, got.sy) == (n, s1, s2, sy)
    assert (got.s11, got.s12, got.s22, got.s1y, got.s2y, got.syy) == (
        s11, s12, s22, s1y, s2y, syy,
    )
    import numpy as np

    A = np.array([[x1, x2, 1.0] for x1, x2, _ in xs])
    b = np.array([float(y) for _, _, y in xs])
    beta, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert got.beta_qty == pytest.approx(beta[0], rel=1e-9)
    assert got.beta_disc == pytest.approx(beta[1], rel=1e-9)
    assert 0.0 <= got.r2 <= 1.0


def test_bpe_encode_stats_match_python_reference(spark, sf_dir):
    import re

    docs = Tables(spark, sf_dir).documents.select("text").collect()
    freqs = Counter()
    for r in docs:
        for w in re.sub(r"\s+", " ", r.text.lower()).strip().split(" "):
            if w:
                freqs[w] += 1
    merges = _bpe_ref(dict(freqs), 10)
    total_units = 0
    for w, f in freqs.items():
        sp = " ".join(w)
        for _, pair, merged, _w in merges:
            sp = (" " + sp + " ").replace(" " + pair + " ", " " + merged + " ").strip()
        total_units += f * len(sp.split(" "))
    n_tokens = sum(freqs.values())
    row = REGISTRY["j68_bpe_encode_stats"].fn(spark, sf_dir).collect()[0]
    assert row.n_word_types == len(freqs)
    assert row.n_tokens == n_tokens
    assert row.n_bpe_units == total_units
    assert row.fertility_r4 == round(total_units / n_tokens, 4)
    # merging strictly reduces units vs raw character segmentation and
    # can never go below one unit per token
    assert n_tokens <= row.n_bpe_units < sum(f * len(w) for w, f in freqs.items())


# ------------------------------------------------ e43 permutation test


def test_permutation_test_matches_python_reference(spark, sf_dir):
    import hashlib

    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day"), "value"
    ).collect()
    cut = dt.date(2024, 1, 15)
    per: dict[int, int] = {}
    for r in ev:
        per[r.user_id] = per.get(r.user_id, 0) + (
            round(r.value * 100) if r.day > cut else -round(r.value * 100)
        )
    t_obs = abs(sum(per.values()))
    n_ge = 0
    for b in range(1, 200):
        t = 0
        for u, d in per.items():
            h = hashlib.md5(f"{u}:{b}".encode()).hexdigest()
            t += d if h[0] < "8" else -d
        if abs(t) >= t_obs:
            n_ge += 1
    row = REGISTRY["e43_permutation_test"].fn(spark, sf_dir).collect()[0]
    assert (row.n_users, row.t_obs, row.n_ge) == (len(per), t_obs, n_ge)
    assert row.p_value == (n_ge + 1) / 200.0
    assert 1 / 200.0 <= row.p_value <= 1.0


# --------------------------------------------- f25 linear interpolation


def test_linear_interpolation_matches_python_reference(spark, sf_dir):
    orders = Tables(spark, sf_dir).orders.select(
        F.to_date("o_orderdate").alias("day"), "o_totalprice"
    ).collect()
    daily: dict = {}
    for r in orders:
        daily[r.day] = daily.get(r.day, 0) + round(r.o_totalprice * 100)
    lo, hi = min(daily), max(daily)
    days = [lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)]
    known = sorted(daily)
    expect = {}
    import bisect

    for day in days:
        if day in daily:
            expect[day] = (0, daily[day] / 100.0)
        else:
            i = bisect.bisect_left(known, day)
            pd_, nd = known[i - 1], known[i]
            pv, nv = daily[pd_], daily[nd]
            v = pv + (nv - pv) * (float((day - pd_).days) / (nd - pd_).days)
            expect[day] = (1, v / 100.0)
    got = {
        r.day: (r.is_interpolated, r.filled_total)
        for r in REGISTRY["f25_linear_interpolation"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[0] == 1 for v in got.values())  # gaps exist and are filled


# ---------------------------- PPJoin losslessness on GENERATED corpora


@_slow
@given(
    texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=2, max_size=10),
    t=st.sampled_from([0.5, 0.75, 0.8]),
)
@pytest.mark.deep
def test_ppjoin_lossless_on_generated_corpora(spark, texts, t):
    """The prefix-filter completeness theorem must hold for ARBITRARY
    corpora (degenerate texts, empty shingle sets, all-identical docs),
    not just the fixture.  t=0.8 exercises the decimal-rational path
    (ADVICE r3: the old float ceil over-pruned boundary pairs for
    non-dyadic thresholds — J exactly 4/5 must survive t=0.8)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    fast = {
        (r.id_a, r.id_b)
        for r in ppjoin_pairs(df, "doc_id", "text", k=3, threshold=t).collect()
    }
    naive = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(df, "doc_id", "text", k=3, threshold=t).collect()
    }
    # naive filters on the 4dp-rounded ratio, ppjoin on the exact integer
    # inequality — equivalent here because with <= ~36 shingles per union
    # no ratio i/u can land within 5e-5 below t (min gap is 1/u >> 1e-2).
    assert fast == naive


def test_merge_partials_rejects_empty_batch_list():
    with pytest.raises(ValueError, match="empty batch list"):
        merge_order_partials([])


@_slow
@given(order=st.permutations(list(range(4))))
def test_incremental_mv_fold_is_order_invariant(spark, sf_dir, order):
    """Commutativity: folding the same partial states in ANY order gives
    the identical presented MV (the quantized cent-sums make this exact,
    not approximate)."""
    o = load(spark, sf_dir, "orders")
    bucket = F.pmod(F.xxhash64("o_orderkey"), F.lit(4))
    parts = [order_partials(o.filter(bucket == i)) for i in range(4)]
    folded = _mv_key(present(merge_order_partials([parts[i] for i in order])).collect())
    full = _mv_key(present(order_partials(o)).collect())
    assert folded == full


@_slow
@given(
    texts=st.lists(st.text(alphabet="abc d", min_size=0, max_size=25), min_size=2, max_size=8)
)
@pytest.mark.deep
def test_pigeonhole_equals_bruteforce_on_generated_corpora(spark, texts):
    """Band-index completeness must hold for arbitrary corpora, including
    empty texts (no tokens -> no fingerprint) and identical texts
    (hamming 0 through every band)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    fps = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    ids = sorted(fps)
    brute = {
        (a, b, bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(df, "doc_id", "text", 3, 4).collect()
    }
    assert got == brute


def test_embedding_decontamination_matches_python_reference(spark, sf_dir):
    import math

    rows = Tables(spark, sf_dir).embeddings.collect()
    train = [(r.vec_id, r.label, r.embedding) for r in rows if r.vec_id % 2 == 0]
    ev = [(r.vec_id, r.label, r.embedding) for r in rows if r.vec_id % 2 == 1]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    expect = {}
    for _, lbl, _ in ev:
        expect.setdefault(lbl, [0, 0, -1.0])
    for vid, lbl, e in ev:
        best = max(
            (cos(e, t) for tid, tl, t in train if tl == lbl), default=None
        )
        agg = expect[lbl]
        agg[0] += 1
        if best is not None and best >= 0.35:
            agg[1] += 1
        agg[2] = max(agg[2], best if best is not None else -1.0)
    got = {
        r.label: (r.n_eval, r.n_contaminated, r.worst_cos)
        for r in REGISTRY["j69_embedding_decontamination"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for lbl, (n, c, w) in expect.items():
        gn, gc, gw = got[lbl]
        assert (gn, gc) == (n, c), lbl
        assert gw == pytest.approx(round(w, 4), abs=2e-4), lbl
    assert any(v[1] > 0 for v in got.values())  # fixture has near-dups


def test_holt_streaming_state_parity(spark, sf_dir, tmp_path):
    """F24's stateful-streaming twin: per-user day counts accumulate in
    applyInPandasWithState state across micro-batches; the LAST emission
    per user equals the batch Holt fit — regardless of shard arrival
    order, because state holds the completed day->count map, not model
    coefficients."""
    from cassandra_snap_to_hadoop_spark.io import SCHEMAS
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import f24_stream

    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    root = str(tmp_path / "events")
    e.repartition("day").write.partitionBy("day").mode("overwrite").parquet(root)
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 7)
        .parquet(root + "/*")
    )
    q = (
        f24_stream(stream)
        .writeStream.format("memory")
        .queryName("f24_stream_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM f24_stream_sink").collect()
    assert emitted
    final = {}
    for r in emitted:  # last emission = max day-span (monotone under accumulation)
        cur = final.get(r.user_id)
        if cur is None or r.n_days >= cur.n_days:
            final[r.user_id] = r
    # Pin against the float fold DIRECTLY (the f27 precedent): the
    # registered f24 query is the integer micro-lattice tier since its
    # round-10 SQL conversion, while the streaming twin stays on the
    # production float path (operators/forecast.holt_fold == _holt_ref).
    ev = Tables(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    ).collect()
    per: dict[int, Counter] = {}
    for r in ev:
        per.setdefault(r.user_id, Counter())[r.day] += 1
    batch = {}
    for uid, counts in per.items():
        lo, hi = min(counts), max(counts)
        xs = [
            float(counts.get(lo + dt.timedelta(days=i), 0))
            for i in range((hi - lo).days + 1)
        ]
        level, trend, fc = _holt_ref(xs)
        batch[uid] = (len(xs), level, trend, fc)
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert (s.n_days, s.level, s.trend, s.forecast_7d) == b, uid
