"""Round-3 continuation batch: IR tier (j50/j51), cohort retention
(e22), and the count-min-sketch heavy-hitter path (e21 + the
operators/sketch.py reader).  The CMS tests pin the guarantees the
oracle can't: one-sided error, eps bound, and exact mergeability of
same-seed sketches."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.operators.sketch import CountMinSketch
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()

EPS, CONF, SEED = 0.001, 0.99, 42


def _cms(df, col):
    row = df.agg(
        F.count_min_sketch(col, F.lit(EPS), F.lit(CONF), F.lit(SEED)).alias("s")
    ).collect()[0]
    return CountMinSketch.parse(bytes(row.s))


def test_cms_parse_shape(spark):
    sk = _cms(spark.range(0, 100), "id")
    assert sk.total_count == 100
    # stream-lib sizing: width = ceil(2/eps), depth = ceil(-ln(1-conf)/ln 2)
    assert sk.width == math.ceil(2 / EPS)
    assert sk.depth == math.ceil(-math.log(1 - CONF) / math.log(2))
    assert len(sk.hash_a) == sk.depth and len(sk.table) == sk.depth


def test_cms_estimates_bounded(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    sk = _cms(ev, "user_id")
    assert sk.total_count == sum(exact.values())
    slack = EPS * sk.total_count
    for uid, n in exact.items():
        est = sk.estimate_long(uid)
        assert est >= n, f"CMS underestimated user {uid}: {est} < {n}"
        assert est - n <= slack, f"CMS over eps bound for user {uid}"


def test_cms_exact_merge_of_same_seed_sketches(spark, sf_dir):
    """Per-event-type sketches element-wise-add to EXACTLY the global
    sketch — the segment-rollup property (same seed => same hashA)."""
    ev = Tables(spark, sf_dir).events
    global_sk = _cms(ev, "user_id")
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    merged = None
    for t in types:
        part = _cms(ev.filter(F.col("event_type") == t), "user_id")
        merged = part if merged is None else merged.merge(part)
    assert merged.total_count == global_sk.total_count
    assert merged.table == global_sk.table


def test_cms_merge_rejects_incompatible(spark):
    a = _cms(spark.range(10), "id")
    row = spark.range(10).agg(
        F.count_min_sketch("id", F.lit(EPS), F.lit(CONF), F.lit(7)).alias("s")
    ).collect()[0]
    b = CountMinSketch.parse(bytes(row.s))
    with pytest.raises(ValueError):
        a.merge(b)


def test_cms_streaming_microbatch_merge_equals_batch(spark, sf_dir, tmp_path):
    """The CMS tier is streamable by construction: build one sketch per
    micro-batch via foreachBatch and merge them with the reader — the
    result must equal the batch-global sketch EXACTLY (same seed => same
    hashA => merge is element-wise addition, no approximation added by
    incrementality)."""
    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import read_event_stream

    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    shard_root = str(tmp_path / "events")
    e.repartition("day").write.partitionBy("day").mode("overwrite").parquet(shard_root)

    merged: list[CountMinSketch] = []

    def fold(batch_df, batch_id):
        row = batch_df.agg(
            F.count_min_sketch("user_id", F.lit(EPS), F.lit(CONF), F.lit(SEED)).alias("s")
        ).collect()[0]
        if row.s is None:  # empty micro-batch
            return
        sk = CountMinSketch.parse(bytes(row.s))
        merged.append(merged.pop().merge(sk) if merged else sk)

    q = (
        read_event_stream(spark, shard_root + "/*", max_files_per_trigger=4)
        .writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_sk = _cms(load(spark, sf_dir, "events"), "user_id")
    assert len(merged) == 1
    assert merged[0].total_count == batch_sk.total_count
    assert merged[0].table == batch_sk.table


def test_e21_query_columns_honor_guarantee(spark, sf_dir):
    """Since round 6 the registered e21 is the md5-relational CMS
    (depth 5 × width 512): one-sided error always; the depth-5 min keeps
    the excess within eps·total for eps = e/width (the classic CMS bound,
    comfortably met empirically at every SF)."""
    import math

    from cassandra_snap_to_hadoop_spark.queries.round3b import _CMS_WIDTH

    eps = math.e / _CMS_WIDTH
    rows = REGISTRY["e21_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_est >= r.exact_n
        assert r.cms_est - r.exact_n <= eps * r.total_events


def test_cohort_day_zero_equals_cohort_size(spark, sf_dir):
    """Everyone is active on their own first day: the offset-0 cell of
    every cohort must equal the cohort size."""
    out = REGISTRY["e22_cohort_retention"].fn(spark, sf_dir)
    day0 = out.filter(F.col("day_offset") == 0).collect()
    assert day0, "no offset-0 cells"
    for r in day0:
        assert r.n_active == r.cohort_size
    bad = out.filter(
        (F.col("day_offset") < 0) | (F.col("n_active") > F.col("cohort_size"))
    ).count()
    assert bad == 0


def test_inverted_index_postings_digest_matches_python(spark, sf_dir):
    """Recompute one term's posting digest from the raw (doc, term)
    stream in plain Python — pins the canonical serialization, not just
    cross-engine agreement."""
    import hashlib

    out = REGISTRY["j50_inverted_index"].fn(spark, sf_dir)
    first = out.orderBy("term").limit(1).collect()[0]
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    tf = (
        d.select(F.col("doc_id").alias("doc"), F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") == first.term)
        .groupBy("doc")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    posting = ",".join(f"{r.doc}:{r.tf}" for r in sorted(tf, key=lambda r: r.doc))
    assert hashlib.md5(posting.encode()).hexdigest() == first.postings_md5
    assert len(tf) == first.df
    assert sum(r.tf for r in tf) == first.tf_total


def test_interval_union_matches_python_sweep(spark, sf_dir):
    """f16's window formulation equals a plain-Python stack sweep on the
    same synthesized intervals, customer by customer."""
    import datetime

    out = {
        r.o_custkey: (r.n_intervals, r.n_blocks, r.covered_days)
        for r in REGISTRY["f16_interval_union"].fn(spark, sf_dir).collect()
    }
    anchor = datetime.date(1992, 1, 1)
    rows = (
        Tables(spark, sf_dir)
        .orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    by_cust: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        od = r.o_orderdate
        if isinstance(od, datetime.datetime):
            od = od.date()
        lo = (od - anchor).days
        by_cust.setdefault(r.o_custkey, []).append((lo, lo + 1 + r.o_orderkey % 20))
    assert set(out) == set(by_cust)
    for cust, ivs in by_cust.items():
        ivs.sort()
        blocks = []
        for lo, hi in ivs:
            if blocks and lo <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], hi)
            else:
                blocks.append([lo, hi])
        covered = sum(hi - lo + 1 for lo, hi in blocks)
        assert out[cust] == (len(ivs), len(blocks), covered), cust


def test_interval_union_single_exchange(spark, sf_dir):
    """The whole sweep — both windows and both aggregations — reuses ONE
    hash(cust) exchange (the shared-exchange rule the docstring claims)."""
    from cassandra_snap_to_hadoop_spark.plans.explain import count_shuffles

    df = REGISTRY["f16_interval_union"].fn(spark, sf_dir)
    assert count_shuffles(df) == 1, df._jdf.queryExecution().executedPlan().toString()


def test_pmi_pairs_respect_cooccurrence_bounds(spark, sf_dir):
    """Integer invariants of PMI mining: canonical pair order, the df_ab
    floor, and df_ab <= min(df_a, df_b) (a pair can't co-occur more often
    than either member occurs) — recomputed from the raw corpus."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    out = REGISTRY["j52_pmi_collocations"].fn(spark, sf_dir).collect()
    assert out, "no collocations found"
    d = Tables(spark, sf_dir).documents
    dt = (
        d.select(F.col("doc_id").alias("doc"), F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    df_map = {r.t: r.n for r in dt.groupBy("t").agg(F.count("*").alias("n")).collect()}
    for r in out:
        assert r.term_a < r.term_b
        assert r.df_ab >= 5
        assert r.df_ab <= min(df_map[r.term_a], df_map[r.term_b])


def test_weighted_median_matches_python(spark, sf_dir):
    """e23's cumulative-weight window equals a plain-Python weighted
    median (lower-median convention) per group."""
    rows = (
        Tables(spark, sf_dir)
        .lineitem.select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_grp: dict[str, dict[int, int]] = {}
    for r in rows:
        cents = round(r.l_extendedprice * 100)
        by_grp.setdefault(r.l_returnflag, {}).setdefault(cents, 0)
        by_grp[r.l_returnflag][cents] += round(r.l_quantity)
    out = {
        r.l_returnflag: (r.wmedian_cents, r.total_weight)
        for r in REGISTRY["e23_weighted_median"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(by_grp)
    for grp, wm in by_grp.items():
        tot = sum(wm.values())
        cum = 0
        for v in sorted(wm):
            cum += wm[v]
            if 2 * cum >= tot:
                assert out[grp] == (v, tot), grp
                break


def test_column_profile_matches_direct_counts(spark, sf_dir):
    """j53's one-scan profile equals per-column direct aggregates."""
    out = {r.col_name: r for r in REGISTRY["j53_column_profile"].fn(spark, sf_dir).collect()}
    o = Tables(spark, sf_dir).orders
    n = o.count()
    assert set(out) == {
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate", "totalprice_cents",
    }
    for r in out.values():
        assert r.n_rows == n and r.n_nulls == 0
        assert 0 < r.n_distinct <= n
        assert r.min_s is not None and r.max_s is not None
    assert out["o_orderkey"].n_distinct == n  # primary key
    ck = o.select("o_custkey").distinct().count()
    assert out["o_custkey"].n_distinct == ck


def test_dq_expectations_rule_suite_shape(spark, sf_dir):
    """j54 emits all five rules with sane totals; the synthetic TPC-H
    data is referentially intact, so the FK and uniqueness rules must
    report zero violations."""
    out = {r.rule: r for r in REGISTRY["j54_dq_expectations"].fn(spark, sf_dir).collect()}
    t = Tables(spark, sf_dir)
    n_orders, n_li = t.orders.count(), t.lineitem.count()
    assert set(out) == {
        "orders_custkey_fk", "lineitem_pk_unique", "quantity_in_range",
        "orderdate_not_null", "ship_after_order",
    }
    assert out["orders_custkey_fk"].n_checked == n_orders
    assert out["lineitem_pk_unique"].n_checked == n_li
    assert out["orders_custkey_fk"].n_violations == 0
    # the synthetic lineitem reuses (orderkey, linenumber) — the rule must
    # report exactly the surplus rows beyond each key's first
    surplus = n_li - t.lineitem.select("l_orderkey", "l_linenumber").distinct().count()
    assert out["lineitem_pk_unique"].n_violations == surplus
    for r in out.values():
        assert 0 <= r.n_violations <= r.n_checked


def test_twap_matches_python_segments(spark, sf_dir):
    """f17's lead-segment formulation equals a plain-Python per-user
    sweep over (epoch_us, event_id)-sorted events — integer exact."""
    out = {
        r.user_id: (r.twap_num, r.dur_us, r.n_segments)
        for r in REGISTRY["f17_twap"].fn(spark, sf_dir).collect()
    }
    rows = (
        Tables(spark, sf_dir)
        .events.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("t"),
            # reuse the engine's own cents quantization — the test pins the
            # segment/window logic, not double rounding conventions
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.t, r.event_id, r.c))
    for uid, evs in by_user.items():
        evs.sort()
        num = den = 0
        for (t0, _, c0), (t1, _, _) in zip(evs, evs[1:]):
            num += c0 * (t1 - t0)
            den += t1 - t0
        if len(evs) >= 2:
            assert out[uid] == (num, den, len(evs) - 1), uid
        else:
            assert uid not in out


def test_weighted_median_and_twap_single_exchange(spark, sf_dir):
    """Shuffle-count claims, pinned: f17's lead window and per-user agg
    share one hash(user) exchange.  e23 pays exactly two — hash(grp,
    cents) for the per-value weight agg, then hash(grp) for the window
    (a SUPERSET key does not satisfy the window's grp-only clustering);
    the final per-group reduction reuses the window's exchange."""
    from cassandra_snap_to_hadoop_spark.plans.explain import count_shuffles

    assert count_shuffles(REGISTRY["f17_twap"].fn(spark, sf_dir)) == 1
    assert count_shuffles(REGISTRY["e23_weighted_median"].fn(spark, sf_dir)) <= 2


def test_column_profile_scans_table_once(spark, sf_dir):
    """j53: one scan, one global aggregate — the only exchanges are the
    aggregate's partial->final single-partition hops (count-distinct
    expands add one), never a re-shuffle of the table."""
    from cassandra_snap_to_hadoop_spark.plans.explain import plan_string

    df = REGISTRY["j53_column_profile"].fn(spark, sf_dir)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 1, plan


def test_hll_overlap_estimate_near_exact_intersection(spark, sf_dir):
    """Since the round-7 in-place SQL certification e24_hll_overlap's
    registered output is (src_a, src_b, n_inter, hll_inter_in_band): the
    EXACT intersection (hash-checked vs the oracle) plus an in-band flag
    computed from the LIVE HLL triple.  This pin recomputes the exact
    shingle sets in pure Python and asserts n_inter matches exactly and
    the sketch flag reports in-band for every source pair (the sketch
    tolerance itself is pinned against the raw triple in
    tests/test_round6.py::test_e24_sketch_tier_pinned_to_exact_twin)."""
    from itertools import combinations

    out = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["e24_hll_overlap"].fn(spark, sf_dir).collect()
    }
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    w = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.array_join(F.slice(w, i, 3), " "),
    )
    rows = (
        d.filter(F.size(w) >= 3)
        .select("source", F.explode(shingles).alias("s"))
        .distinct()
        .collect()
    )
    sets: dict[str, set] = {}
    for r in rows:
        sets.setdefault(r.source, set()).add(r.s)
    assert set(out) == {
        (x, y) for x, y in combinations(sorted(sets), 2)
    }
    for (sa, sb), r in out.items():
        exact_inter = len(sets[sa] & sets[sb])
        assert r.n_inter == exact_inter, (sa, sb, r, exact_inter)
        assert r.hll_inter_in_band == 1, (sa, sb, r)


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    """e25's window sweep equals the brute-force non-dominated filter
    over all (richness, n_chars) points, computed in Python."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    pts_rows = d.select(
        F.size(F.array_distinct(tokens(F.col("text")))).cast("long").alias("r"),
        F.col("n_chars").cast("long").alias("c"),
    ).collect()
    from collections import Counter

    counts = Counter((p.r, p.c) for p in pts_rows)
    uniq = list(counts)
    sky = {
        (r, c)
        for r, c in uniq
        if not any(
            (r2 >= r and c2 <= c and (r2 > r or c2 < c)) for r2, c2 in uniq
        )
    }
    got = {
        (row.richness, row.n_chars): row.n_docs
        for row in REGISTRY["e25_skyline"].fn(spark, sf_dir).collect()
    }
    assert set(got) == sky
    for p, n in got.items():
        assert n == counts[p]


def test_vocab_coverage_monotone_and_crossing_tight(spark, sf_dir):
    """Higher coverage targets need at least as many terms; each crossing
    is tight (removing the last term drops below the target)."""
    rows = {r.pct: r for r in REGISTRY["j55_vocab_coverage"].fn(spark, sf_dir).collect()}
    assert sorted(rows) == [50, 80, 90, 95]
    last = 0
    for pct in (50, 80, 90, 95):
        r = rows[pct]
        assert r.vocab_size >= last
        last = r.vocab_size
        assert 100 * r.covered_tokens >= pct * r.total_tokens
    # tightness at the 95 crossing: coverage minus its own rank-95 term's
    # mass must be below target — verified via the term counts directly
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    tc = (
        Tables(spark, sf_dir)
        .documents.select(F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .collect()
    )
    r95 = rows[95]
    crossing_term_mass = tc[r95.vocab_size - 1].n
    assert 100 * (r95.covered_tokens - crossing_term_mass) < 95 * r95.total_tokens


def test_cdc_chunks_reconstruct_exactly():
    """Concatenating chunk ranges reproduces the input bytes, and every
    chunk honors the min/max size bounds (except the final tail)."""
    from cassandra_snap_to_hadoop_spark.operators.chunking import cdc_chunks

    text = "the quick brown fox jumps over the lazy dog. " * 200
    chunks = cdc_chunks(text)
    data = text.encode("utf-8")
    assert b"".join(data[s:e] for s, e, _ in chunks) == data
    assert [s for s, _, _ in chunks] == [0] + [e for _, e, _ in chunks[:-1]]
    for s, e, h in chunks[:-1]:
        assert 64 <= e - s <= 1024
        import hashlib

        assert hashlib.md5(data[s:e]).hexdigest() == h


def test_cdc_boundary_stability_under_prepend():
    """THE content-defined property: prepending a line shifts every byte
    offset, yet almost all chunk hashes survive — fixed-size chunking
    keeps none (beyond collisions)."""
    import random

    from cassandra_snap_to_hadoop_spark.operators.chunking import cdc_chunks

    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh \n") for _ in range(20000))
    edited = "INSERTED HEADER LINE\n" + base
    h1 = [h for _, _, h in cdc_chunks(base)]
    h2 = [h for _, _, h in cdc_chunks(edited)]
    shared = len(set(h1) & set(h2))
    assert shared >= len(h1) - 3, (len(h1), len(h2), shared)
    # fixed-size chunking under the same shift shares ~nothing
    fixed1 = {base[i : i + 256] for i in range(0, len(base), 256)}
    fixed2 = {edited[i : i + 256] for i in range(0, len(edited), 256)}
    assert len(fixed1 & fixed2) <= 2


def test_cdc_reconstruction_law_hypothesis():
    """∀ text: chunks partition the UTF-8 bytes exactly, honor the size
    bounds (final tail exempt from the minimum), and chunking is a pure
    function (same input ⇒ same chunks)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_snap_to_hadoop_spark.operators.chunking import cdc_chunks

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=5000))
    def law(text):
        chunks = cdc_chunks(text)
        data = text.encode("utf-8")
        assert b"".join(data[s:e] for s, e, _ in chunks) == data
        if data:
            assert chunks[0][0] == 0 and chunks[-1][1] == len(data)
        for (s1, e1, _), (s2, _e2, _) in zip(chunks, chunks[1:]):
            assert e1 == s2
        for s, e, _ in chunks[:-1]:
            assert 64 <= e - s <= 1024
        assert chunks == cdc_chunks(text)

    law()


def test_cdc_query_accounting(spark, sf_dir):
    """The registered query's per-doc byte totals equal the documents'
    UTF-8 lengths, and the corpus dedup columns are coherent."""
    out = REGISTRY["j56_cdc_chunking"].fn(spark, sf_dir).collect()
    assert out
    d = {
        r.doc_id: r.n
        for r in Tables(spark, sf_dir)
        .documents.filter(F.col("doc_id") < 200)
        .select("doc_id", F.octet_length("text").alias("n"))
        .collect()
    }
    for r in out:
        assert r.total_bytes == d[r.doc_id], r.doc_id
        assert r.min_chunk >= 1 and r.max_chunk <= 1024
        assert 0 < r.c_distinct <= r.c_total


def test_asof_nearest_is_truly_nearest(spark, sf_dir):
    """d17 against brute force: for every purchase, no view of the same
    user is strictly closer than the chosen one, and ties resolve to the
    backward (earlier) view."""
    out = {
        r.event_id: (r.nearest_view_us, r.dist_us)
        for r in REGISTRY["d17_asof_nearest"].fn(spark, sf_dir).collect()
    }
    ev = (
        Tables(spark, sf_dir)
        .events.select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("t"))
        .collect()
    )
    views: dict[int, list[int]] = {}
    purchases = []
    for r in ev:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append(r.t)
        elif r.event_type == "purchase":
            purchases.append(r)
    assert purchases
    for p in purchases:
        vs = views.get(p.user_id)
        got_t, got_d = out[p.event_id]
        if not vs:
            assert got_t is None and got_d is None
            continue
        best = min(abs(t - p.t) for t in vs)
        assert got_d == best, p.event_id
        # tie rule: backward preferred
        if any(p.t - t == best for t in vs):
            assert got_t == p.t - best
        else:
            assert got_t == p.t + best


def test_asof_nearest_single_exchange(spark, sf_dir):
    """The merge-streams formulation pays one hash(user) exchange, no
    joins at all."""
    from cassandra_snap_to_hadoop_spark.plans.explain import (
        count_shuffles,
        plan_string,
    )

    df = REGISTRY["d17_asof_nearest"].fn(spark, sf_dir)
    assert count_shuffles(df) == 1
    assert "Join" not in plan_string(df, "simple")


def test_ohlc_invariants_and_edges(spark, sf_dir):
    """Bar invariants: low <= open/close <= high, volume sums to the
    table count, and open/close equal the first/last event's value per
    bar recomputed in Python."""
    out = REGISTRY["f18_ohlc_bars"].fn(spark, sf_dir).collect()
    assert out
    import datetime

    anchor = datetime.date(2024, 1, 1)
    ev = (
        Tables(spark, sf_dir)
        .events.select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("t"),
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    bars: dict[tuple, list] = {}
    for r in ev:
        bars.setdefault((r.event_type, (r.d - anchor).days), []).append(
            (r.t, r.event_id, r.c)
        )
    assert sum(r.volume for r in out) == len(ev)
    for r in out:
        evs = sorted(bars[(r.event_type, r.day_idx)])
        assert r.volume == len(evs)
        assert r.open_cents == evs[0][2] and r.close_cents == evs[-1][2]
        assert r.low_cents <= min(r.open_cents, r.close_cents)
        assert r.high_cents >= max(r.open_cents, r.close_cents)
        assert r.low_cents == min(c for _, _, c in evs)
        assert r.high_cents == max(c for _, _, c in evs)


def test_bm25_more_occurrences_scores_higher_same_length(spark, sf_dir):
    """Sanity on the scoring direction: among docs of (near) equal
    length, more query-term occurrences => higher BM25.  Checked via the
    query's own output: every doc's score is positive and n_query_terms
    is within [1, 3]."""
    rows = REGISTRY["j51_bm25_scores"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_query_terms <= 3
        assert r.bm25_unats > 0


def test_d19_pit_join_is_join_free_single_exchange(spark, sf_dir):
    """The PIT enrichment must be the merged-stream formulation: zero join
    operators, one hash(user_id) exchange feeding the running window."""
    from cassandra_snap_to_hadoop_spark.plans.explain import count_shuffles, plan_string

    df = REGISTRY["d19_pit_scd2_join"].fn(spark, sf_dir)
    p = plan_string(df, "simple")
    assert "Join" not in p, p
    assert count_shuffles(df) == 1, p


def test_d19_pit_join_no_leakage_and_tie_rule(spark, tmp_path):
    """Hand-checkable PIT semantics on a staged mini events table:
      u1: state A @10, purchase @20 (-> A), state B @30, purchase @40 (-> B)
      u2: purchase @5 before any state -> 'unknown'
      u3: state C @10(id=1), purchase @10(id=2) -> C (same-ts, smaller id
          applies); state D @10(id=3) must NOT leak into the purchase.
    """
    import datetime as dt

    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.queries import round3c

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        (1, ts(10), 100, "view", 0.0, None),
        (2, ts(20), 100, "purchase", 1.0, None),
        (3, ts(30), 100, "error", 0.0, None),
        (4, ts(40), 100, "purchase", 1.0, None),
        (5, ts(5), 200, "purchase", 1.0, None),
        (1001, ts(10), 300, "click", 0.0, None),
        (1002, ts(10), 300, "purchase", 1.0, None),
        (1003, ts(10), 300, "signup", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "events_pit")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r.purchase_event_id: r
        for r in round3c.d19_pit_scd2_join(spark, d).collect()
    }
    assert out[2].state_at_purchase == "view"
    assert out[4].state_at_purchase == "error"
    assert out[5].state_at_purchase == "unknown" and out[5].state_since_ms == -1
    assert out[1002].state_at_purchase == "click"  # id 1003's signup must not leak


def test_e26_attribution_conserves_value_exactly(spark, sf_dir):
    """Conservation law: every micro-cent of every purchase lands in
    exactly one channel bucket — integer shares + remainder-to-earliest
    means the totals match bit-for-bit, not approximately."""
    out = REGISTRY["e26_multitouch_attribution"].fn(spark, sf_dir).collect()
    assert {r.channel for r in out} <= {"view", "click", "direct"}
    attributed = sum(r.attributed_micro for r in out)
    total = (
        Tables(spark, sf_dir)
        .events.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("t"))
        .collect()[0]
        .t
    )
    assert attributed == total, (attributed, total)


def test_e27_distinct_to_date_exact_and_sketch_in_band(spark, sf_dir):
    """Since the round-7 in-place certification: users_to_date must EQUAL
    the exact cumulative distinct (recomputed here per day), every
    hll_within_5pct flag must be 1, and the LIVE sketch-union estimates
    (recomputed) must be monotone non-decreasing."""
    rows = sorted(
        REGISTRY["e27_hll_distinct_to_date"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows and all(r.hll_within_5pct == 1 for r in rows)
    vals = [r.users_to_date for r in rows]
    assert all(b > a for a, b in zip(vals, vals[1:])), vals
    e = Tables(spark, sf_dir).events
    day_expr = (F.unix_micros(F.col("ts")) / 86_400_000_000).cast("long")
    for r in (rows[0], rows[-1]):
        exact = (
            e.filter(day_expr <= F.lit(r.day)).select("user_id").distinct().count()
        )
        assert r.users_to_date == exact, (r.day, r.users_to_date, exact)
    daily = (
        e.select(day_expr.alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    a = daily.select(F.col("day").alias("day"))
    b = daily.select(F.col("day").alias("bday"), "sk")
    ests = [
        r.est
        for r in sorted(
            a.join(b, F.col("bday") <= F.col("day"))
            .groupBy("day")
            .agg(
                F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                .cast("long")
                .alias("est")
            )
            .collect(),
            key=lambda r: r.day,
        )
    ]
    assert all(y >= x for x, y in zip(ests, ests[1:])), ests


def test_j58_weighted_sample_biases_toward_weight_and_scales(spark, sf_dir):
    """A-ES selection must (a) overrepresent heavy documents — the mean
    weight of the sample exceeds the corpus mean — and (b) plan as
    TakeOrderedAndProject (per-partition top-k), not a global sort or a
    single-partition window over the full corpus."""
    from cassandra_snap_to_hadoop_spark.plans.explain import plan_string

    df = REGISTRY["j58_weighted_sample"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_string(df, "simple")
    rows = df.collect()
    assert len(rows) == 100 and sorted(r.rn for r in rows) == list(range(1, 101))
    sel_mean = sum(r.weight for r in rows) / len(rows)
    corpus_mean = (
        Tables(spark, sf_dir)
        .documents.agg(F.avg(F.greatest(F.col("n_chars").cast("long"), F.lit(1))).alias("m"))
        .collect()[0]
        .m
    )
    assert sel_mean > corpus_mean, (sel_mean, corpus_mean)


def test_e28_robust_mean_matches_python_recompute(spark, sf_dir):
    """Exact recompute of the trim/winsorize arithmetic in plain Python
    for every group — boundary membership (the DuckDB round-on-cast trap
    this query's oracle originally hit) has no room to drift."""
    out = {r.event_type: r for r in REGISTRY["e28_robust_mean"].fn(spark, sf_dir).collect()}
    rows = (
        Tables(spark, sf_dir)
        .events.select("event_type", F.round(F.col("value") * 1_000_000).cast("long").alias("v"), "event_id")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append((r.v, r.event_id))
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = (n * 5) // 100
        mid = [v for v, _ in vals[k : n - k]]
        lo, hi = vals[k][0], vals[n - k - 1][0]
        wins = sum(min(max(v, lo), hi) for v, _ in vals)
        got = out[et]
        assert (got.n, got.n_trimmed_each_side) == (n, k), (et, got)
        assert got.trimmed_sum_micro == sum(mid), et
        assert got.winsor_sum_micro == wins, et
        assert got.winsor_sum_micro >= got.trimmed_sum_micro  # positive values


def test_e29_gini_matches_python_and_bounds(spark, sf_dir):
    out = {r.source: r for r in REGISTRY["e29_gini_concentration"].fn(spark, sf_dir).collect()}
    rows = (
        Tables(spark, sf_dir)
        .documents.select("source", F.col("n_chars").cast("long").alias("x"), "doc_id")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.source, []).append((r.x, r.doc_id))
    for src, vals in groups.items():
        vals.sort()
        n = len(vals)
        tot = sum(x for x, _ in vals)
        rws = sum((i + 1) * x for i, (x, _) in enumerate(vals))
        got = out[src]
        assert (got.n, got.total_chars, got.rank_weighted_sum) == (n, tot, rws), src
        assert 0.0 <= got.gini < 1.0, (src, got.gini)
        assert abs(got.gini - (2.0 * rws / (n * tot) - (n + 1.0) / n)) < 1e-9


def test_j59_reciprocal_nn_is_a_matching(spark, sf_dir):
    """Reciprocity makes the output a partial MATCHING: no vector appears
    in more than one pair (one-directional top-1 lists do not have this
    property — a hub can be many vectors' best neighbor).  Also pins the
    symmetric-best law: (a, b) in the output means a is b's top-1 AND b
    is a's top-1 within their shared block."""
    rows = REGISTRY["j59_reciprocal_nn"].fn(spark, sf_dir).collect()
    seen: set[int] = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.id_a not in seen and r.id_b not in seen, (r, "vector in 2 pairs")
        seen.add(r.id_a)
        seen.add(r.id_b)
    assert rows, "fixture should produce at least one mutual pair"


def test_e30_equidepth_invariants(spark, sf_dir):
    """Bucket law: counts differ by at most 1 (first buckets absorb the
    remainder), boundaries are non-overlapping and ordered, and the
    counts sum to the table size."""
    rows = sorted(
        REGISTRY["e30_equidepth_histogram"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, 17))
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1
    assert sorted(counts, reverse=True) == counts  # remainder goes to the front
    total = Tables(spark, sf_dir).lineitem.count()
    assert sum(counts) == total
    for a, b in zip(rows, rows[1:]):
        assert a.lo_cents <= a.hi_cents <= b.lo_cents


def test_f20_mad_matches_python_recompute(spark, sf_dir):
    import statistics

    out = {r.event_type: r for r in REGISTRY["f20_mad_outliers"].fn(spark, sf_dir).collect()}
    rows = (
        Tables(spark, sf_dir)
        .events.select("event_type", F.round(F.col("value") * 100).cast("long").alias("c"), "event_id")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append((r.c, r.event_id))
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        med = vals[(n + 1) // 2 - 1][0]  # lower median, 1-indexed rank
        devs = sorted(abs(c - med) for c, _ in vals)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(1 for d in devs if d > 3 * mad)
        got = out[et]
        assert (got.median_cents, got.mad_cents, got.n_outliers, got.n) == (med, mad, n_out, n), et


def test_e31_wilson_ci_brackets_rate_and_matches_python(spark, sf_dir):
    import math

    rows = REGISTRY["e31_wilson_ci"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        p = r.k / r.n
        assert 0.0 <= r.ci_lo <= p <= r.ci_hi <= 1.0, r
        center = p + 1.9208 / r.n
        half = 1.96 * math.sqrt(p * (1 - p) / r.n + 0.9604 / (r.n * r.n))
        denom = 1 + 3.8416 / r.n
        assert abs(r.ci_lo - round((center - half) / denom, 9)) < 1e-9, r
        assert abs(r.ci_hi - round((center + half) / denom, 9)) < 1e-9, r


def test_f22_peak_concurrency_sweep_laws(spark, sf_dir):
    """Sweep laws: the running count is never negative, ends at zero
    (every interval that opens also closes), and the peak equals a
    brute-force stab count at the argmax day."""
    rows = sorted(
        REGISTRY["f22_peak_concurrency"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0
    peak = max(rows, key=lambda r: (r.n_open, -r.day))
    o = Tables(spark, sf_dir).orders
    lo = (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000).cast("long")
    hi = lo + 1 + F.col("o_orderkey") % 20
    stab = o.filter((lo <= F.lit(peak.day)) & (F.lit(peak.day) < hi)).count()
    assert stab == peak.n_open, (peak, stab)


def test_f21_lttb_laws_and_greedy_optimality(spark, sf_dir):
    """LTTB laws: endpoints kept, output time-ordered, 64 points per
    series, picks are a subset of the series — and the GREEDY OPTIMALITY
    property: every interior pick maximizes the EXACT-INTEGER triangle
    area (relative-seconds × milli-value lattice, centroid division
    cleared by the bucket count — the round-9 SQL-certified form) formed
    with the previous pick and the next bucket's centroid, recomputed
    here by brute force from the raw series in pure-int Python."""
    from decimal import ROUND_HALF_UP, Decimal

    out: dict[str, list] = {}
    for r in REGISTRY["f21_lttb_downsample"].fn(spark, sf_dir).collect():
        out.setdefault(r.event_type, []).append(r)
    raw: dict[str, list] = {}
    for r in (
        Tables(spark, sf_dir)
        .events.select("event_type", "ts", "event_id", "value")
        .collect()
    ):
        raw.setdefault(r.event_type, []).append(r)
    for et, sel in out.items():
        sel.sort(key=lambda r: r.pos)
        series = sorted(raw[et], key=lambda r: (r.ts, r.event_id))
        t_us = [int(r.ts.timestamp() * 1_000_000) for r in series]
        t = [(u - t_us[0]) // 1_000_000 for u in t_us]
        # HALF_UP milli lattice — the engines' BigDecimal ROUND, not
        # Python banker's round
        v = [
            int(Decimal(r.value * 1000).quantize(Decimal(1), ROUND_HALF_UP))
            for r in series
        ]
        ids = [r.event_id for r in series]
        n = len(series)
        assert len(sel) == 64
        assert sel[0].event_id == ids[0] and sel[-1].event_id == ids[n - 1]
        assert [r.ts_us for r in sel] == sorted(r.ts_us for r in sel)
        pick_idx = [ids.index(r.event_id) for r in sel]
        edges = [1 + (i * (n - 2)) // 62 for i in range(63)]
        for b in range(62):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 < len(edges) else (n - 1, n)
            ax, ay = t[pick_idx[b]], v[pick_idx[b]]
            c = nhi - nlo
            st, sv = sum(t[nlo:nhi]), sum(v[nlo:nhi])
            areas = [
                abs((ax * c - st) * (v[j] - ay) - (ax - t[j]) * (sv - ay * c))
                for j in range(lo, hi)
            ]
            best = max(range(len(areas)), key=lambda j: (areas[j], -j))
            assert pick_idx[b + 1] == lo + best, (et, b)


def test_f21_lttb_short_series_passthrough_contract(spark, sf_dir, tmp_path):
    """ADVICE r9 short-series contract pin: a series with n <= 64 points
    passes through UNCHANGED (all n points, pos = time order) in BOTH
    engines — the engine via _lttb's n_out >= n branch, the oracle via
    the n <= 64 UNION branch (its 62-bucket WITH RECURSIVE chain would
    hit an empty bucket below n = 64 and silently truncate).  Staged on
    a fixture sf dir whose events table mixes n = 10 / 63 / 64 (gate
    boundary) / 200 series, checked hash-level via check_query."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_snap_to_hadoop_spark.io import TABLES
    from cassandra_snap_to_hadoop_spark.oracle import check_query

    d = tmp_path / "sf_f21_short"
    d.mkdir()
    for t in TABLES:
        if t != "events":
            os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [], "value": [], "props": []}
    eid = 0
    base_us = 1_700_000_000_000_000
    for et, n in [("tiny", 10), ("sub", 63), ("edge", 64), ("long", 200)]:
        for i in range(n):
            eid += 1
            rows["event_id"].append(eid)
            # irregular spacing + sign-flipping values so LTTB picks are
            # non-trivial on the long series
            rows["ts"].append(base_us + i * 7_000_000 + (i % 5) * 1_000_000)
            rows["user_id"].append(i % 7)
            rows["event_type"].append(et)
            rows["value"].append(((-1) ** i) * (i * 3.7 % 101) + i * 0.25)
            rows["props"].append("{}")
    tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    pq.write_table(tbl, d / "events.parquet")
    res = check_query(spark, "f21_lttb_downsample", str(d))
    assert res.ok, res
    out = REGISTRY["f21_lttb_downsample"].fn(spark, str(d)).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    assert {t: len(v) for t, v in by_type.items()} == {
        "tiny": 10, "sub": 63, "edge": 64, "long": 64,
    }
    for et, n in [("tiny", 10), ("sub", 63), ("edge", 64)]:
        sel = sorted(by_type[et], key=lambda r: r.pos)
        assert [r.pos for r in sel] == list(range(n))
        assert [r.ts_us for r in sel] == sorted(r.ts_us for r in sel)


def test_j60_sparse_cosine_matches_python_recompute(spark, sf_dir):
    """Every returned pair's cosine recomputed exactly in Python from the
    raw corpus (same micro-nat idf integers, full norms, rare-shingle
    dots) — and the df<=50 generation rule respected (each pair shares
    at least one rare shingle)."""
    import math
    import re as _re
    from collections import Counter

    out = REGISTRY["j60_sparse_cosine_pairs"].fn(spark, sf_dir).collect()
    assert out, "fixture should produce pairs"
    docs = {
        r.doc_id: _re.sub(r"\s+", " ", r.text.lower()).strip()
        for r in Tables(spark, sf_dir).documents.select("doc_id", "text").collect()
    }
    sh: dict[int, set] = {}
    for did, txt in docs.items():
        w = txt.split(" ")
        sh[did] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()
    df = Counter(s for ss in sh.values() for s in ss)
    n_docs = sum(1 for ss in sh.values() if ss)
    wt = {s: math.floor(math.log(n_docs / c) * 1_000_000) for s, c in df.items()}
    norm2 = {d: sum(wt[s] ** 2 for s in ss) for d, ss in sh.items()}
    for r in out:
        shared_rare = {
            s for s in sh[r.doc_a] & sh[r.doc_b] if df[s] <= 50
        }
        assert shared_rare, (r.doc_a, r.doc_b)
        dot = sum(wt[s] ** 2 for s in shared_rare)
        want = dot / (math.sqrt(norm2[r.doc_a]) * math.sqrt(norm2[r.doc_b]))
        assert want >= 0.3 and abs(round(want, 4) - r.cos) <= 1e-9, (r, want)


def test_j61_zipf_fit_matches_python_and_is_decreasing(spark, sf_dir):
    import math
    import re as _re
    from collections import Counter

    out = {r.lang: r for r in REGISTRY["j61_zipf_fit"].fn(spark, sf_dir).collect()}
    docs = Tables(spark, sf_dir).documents.select("lang", "text").collect()
    by_lang: dict[str, Counter] = {}
    for r in docs:
        toks = [t for t in _re.sub(r"\s+", " ", r.text.lower()).strip().split(" ") if t]
        by_lang.setdefault(r.lang, Counter()).update(toks)
    for lang, cnts in by_lang.items():
        ranked = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (math.floor(math.log(i + 1) * 1000), math.floor(math.log(c) * 1000))
            for i, (_, c) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        got = out[lang]
        assert (got.n, got.sx, got.sy, got.sxy, got.sxx) == (n, sx, sy, sxy, sxx), lang
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(got.zipf_slope - round(slope, 6)) < 1e-9
        assert got.zipf_slope < 0, (lang, got.zipf_slope)  # frequency falls with rank


def test_e33_benford_laws(spark, sf_dir):
    """Digit census laws: digits 1-9 only, counts sum to the qualifying
    row count, observed probabilities sum to 1 (within rounding), and
    benford_p matches log10(1+1/d) exactly."""
    import math

    rows = {r.digit: r for r in REGISTRY["e33_benford_digits"].fn(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    total_rows = (
        Tables(spark, sf_dir).orders.filter(F.col("o_totalprice") > 0).count()
    )
    assert sum(r.n for r in rows.values()) == total_rows
    assert abs(sum(r.observed_p for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert abs(r.benford_p - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert abs(r.deviation - round(r.n / total_rows - math.log10(1 + 1 / d), 6)) < 2e-6


def test_f23_moving_median_matches_python_and_resists_spikes(spark, sf_dir):
    out = {
        (r.user_id, r.event_id): r.mov_med_cents
        for r in REGISTRY["f23_moving_median"].fn(spark, sf_dir).collect()
    }
    rows = (
        Tables(spark, sf_dir)
        .events.select("user_id", "event_id", F.round(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    series: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        series.setdefault(r.user_id, []).append((r.event_id, r.c))
    checked = 0
    for u, evs in series.items():
        for i, (eid, _c) in enumerate(evs):
            frame = sorted(c for _, c in evs[max(0, i - 4) : i + 1])
            want = frame[(len(frame) + 1) // 2 - 1]
            assert out[(u, eid)] == want, (u, eid)
            checked += 1
    assert checked == len(out)
    # robustness: replacing the max of any full frame with 100x cannot
    # change the lower median (it's already the frame max's side)
    full = next(f for f in (sorted(c for _, c in evs[i-4:i+1])
                for evs in series.values() for i in range(4, len(evs))) if len(f) == 5)
    spiked = sorted(full[:-1] + [full[-1] * 100])
    assert spiked[2] == full[2]
