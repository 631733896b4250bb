"""Property-based tests (SURVEY §5.3, Hypothesis): algebraic invariants on
small random frames — the edge-case generator the fixed testdata can't be.

Settings note: each Spark round-trip costs ~100ms, so examples are capped
low; the properties are about structure (idempotence, additivity,
containment), not statistical coverage.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.operators.cassandra import lww_merge
from cassandra_snap_to_hadoop_spark.operators.dedup import exact_dedup, shingles

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

cells = st.lists(
    st.tuples(
        st.integers(0, 5),  # pk
        st.integers(0, 3),  # ck
        st.integers(0, 100),  # writetime
        st.integers(0, 10_000),  # seq (unique-ified below)
        st.text(alphabet="abc", max_size=3),  # payload
    ),
    min_size=1,
    max_size=30,
)


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@SLOW
@given(rows=cells)
@pytest.mark.deep
def test_lww_merge_idempotent_and_key_unique(sparkm, rows):
    # unique-ify seq so the ordering is total
    rows = [(pk, ck, wt, i, v) for i, (pk, ck, wt, _, v) in enumerate(rows)]
    df = sparkm.createDataFrame(rows, "pk long, ck long, _writetime long, _seq long, v string")
    m1 = lww_merge(df, ["pk", "ck"], "_writetime", "_seq")
    out = m1.collect()
    keys = [(r.pk, r.ck) for r in out]
    # one survivor per key, and that survivor is the max (writetime, seq)
    assert len(keys) == len(set(keys)) == df.select("pk", "ck").distinct().count()
    best = {}
    for pk, ck, wt, seq, v in rows:
        cur = best.get((pk, ck))
        if cur is None or (wt, seq) > cur[0]:
            best[(pk, ck)] = ((wt, seq), v)
    assert {(r.pk, r.ck): r.v for r in out} == {k: v for k, (_, v) in best.items()}
    # idempotence: merging the merge changes nothing
    m2 = lww_merge(m1, ["pk", "ck"], "_writetime", "_seq")
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, out))


@SLOW
@given(
    xs=st.lists(st.integers(-100, 100), min_size=0, max_size=20),
    ys=st.lists(st.integers(-100, 100), min_size=0, max_size=20),
)
@pytest.mark.deep
def test_union_count_additivity_and_set_ops(sparkm, xs, ys):
    a = sparkm.createDataFrame([(x,) for x in xs] or [(None,)], "v int").filter("v is not null")
    b = sparkm.createDataFrame([(y,) for y in ys] or [(None,)], "v int").filter("v is not null")
    assert a.unionAll(b).count() == a.count() + b.count()
    inter = {r.v for r in a.intersect(b).collect()}
    assert inter == set(xs) & set(ys)
    diff = {r.v for r in a.subtract(b).collect()}
    assert diff == set(xs) - set(ys)


@SLOW
@given(xs=st.lists(st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=25))
@pytest.mark.deep
def test_semi_join_is_inner_projection(sparkm, xs):
    left = sparkm.createDataFrame([(k, v) for k, v in xs], "k int, v int")
    right = sparkm.createDataFrame([(k,) for k in range(0, 2)], "k int")
    semi = {tuple(r) for r in left.join(right, "k", "left_semi").collect()}
    inner = {(r.k, r.v) for r in left.join(right, "k").select(left.k, left.v).collect()}
    anti = {tuple(r) for r in left.join(right, "k", "left_anti").collect()}
    assert semi == inner
    assert semi | anti == {tuple(r) for r in left.collect()}
    assert semi & anti == set()


@SLOW
@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=10))
def test_exact_dedup_partitions_ids(sparkm, texts):
    df = sparkm.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(df, "doc_id", "text").collect()
    # dup counts account for every row; survivors are distinct docs
    assert sum(r.dup_count for r in out) == len(texts)
    assert len({r.survivor_id for r in out}) == len(out)


@SLOW
@given(text=st.text(alphabet="xy z", min_size=0, max_size=40))
def test_shingle_count_bound(sparkm, text):
    df = sparkm.createDataFrame([(1, text)], "doc_id long, text string")
    row = df.select(
        F.size(shingles(F.col("text"), 3)).alias("n_sh"),
        F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("n_tok"),
    ).collect()[0]
    # at most max(n_tok - 2, 0) distinct 3-shingles, never negative
    assert 0 <= row.n_sh <= max(row.n_tok - 2, 1)


def test_asof_join_containment_and_order(spark, sf_dir):
    """As-of law on the real data: exactly one output row per purchase, and
    every matched view timestamp is <= its purchase timestamp."""
    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.registry import load_all

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    out = load_all()["d7_asof_join"].fn(spark, sf_dir)
    joined = out.join(purchases.select("event_id", F.unix_millis("ts").alias("p_ms")), "event_id")
    assert out.count() == purchases.count()
    assert joined.filter(F.col("last_view_ms") > F.col("p_ms")).count() == 0


def test_session_windows_partition_events(spark, sf_dir):
    """Sessionization law: sessions partition each user's events — per-user
    session event counts sum to the user's event count, and sessions don't
    overlap in time (next session starts > 30min after the previous end)."""
    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.registry import load_all

    e = load(spark, sf_dir, "events")
    sess = load_all()["k3_session_windows"].fn(spark, sf_dir)
    per_user_sess = sess.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    per_user_events = e.groupBy("user_id").agg(F.count("*").alias("n"))
    diff = per_user_sess.join(per_user_events, "user_id") \
        .filter(per_user_sess.n != per_user_events.n)
    assert diff.count() == 0


@SLOW
@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=30))
@pytest.mark.deep
def test_quantized_sum_engine_invariant(sparkm, vals):
    """qsum is partitioning-independent: 1 partition == 8 partitions."""
    from cassandra_snap_to_hadoop_spark.queries._util import qsum

    df = sparkm.createDataFrame([(v,) for v in vals], "v double")
    one = df.coalesce(1).agg(qsum(F.col("v")).alias("s")).collect()[0].s
    many = df.repartition(8).agg(qsum(F.col("v")).alias("s")).collect()[0].s
    assert one == many


def test_grouping_sets_internal_consistency(spark, sf_dir):
    """Multi-granularity invariants: in e8_grouping_sets, the grand total
    row equals the sum of the (linestatus) stratum, which equals the sum of
    the (flag, linestatus) stratum — the Expand node must neither drop nor
    double-count rows."""
    from cassandra_snap_to_hadoop_spark.registry import load_all

    rows = load_all()["e8_grouping_sets"].fn(spark, sf_dir).collect()
    total = [r for r in rows if r.g_flag == 1 and r.g_status == 1]
    by_status = [r for r in rows if r.g_flag == 1 and r.g_status == 0]
    finest = [r for r in rows if r.g_flag == 0 and r.g_status == 0]
    assert len(total) == 1
    assert total[0].n == sum(r.n for r in by_status) == sum(r.n for r in finest)
    assert abs(total[0].sum_qty - sum(r.sum_qty for r in by_status)) < 1e-6
    assert abs(total[0].sum_qty - sum(r.sum_qty for r in finest)) < 1e-6


def test_unpivot_inverts_pivot(spark, sf_dir):
    """e9_unpivot is the exact inverse of e9_pivot: re-pivoting the long
    form reproduces the wide form, and the long form's per-user sum equals
    the user's event count."""
    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.registry import load_all

    long_df = load_all()["e9_unpivot"].fn(spark, sf_dir)
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert long_df.count() == n_users * 5  # every (user, kind) cell present
    back = (
        long_df.groupBy("user_id").pivot("kind", ["click", "view", "purchase", "signup", "error"]).sum("n")
    )
    wide = load_all()["e9_pivot"].fn(spark, sf_dir)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, wide.collect()))


@pytest.mark.deep
def test_partition_count_invariance(spark, sf_dir):
    """Results must not depend on the shuffle-partition count — the
    failure mode of every duplicate-key/tiebreak bug this repo has hit
    (nondeterministic survivor picks surface as different rows under
    different partitionings).  Run the most partitioning-sensitive
    queries (LWW merges, window picks, funnel counts, fuzzy pairs) at 32
    and at 7 shuffle partitions and require identical sorted results."""
    from cassandra_snap_to_hadoop_spark.registry import load_all

    registry = load_all()
    names = [
        "flagship_snapshot_star",
        "b2_lww_latest_state",
        "b8_compaction_gc",
        "g3_topk_per_group",
        "llm_curation_funnel",
        "j14_fuzzy_match",
        "j13_sequence_packing",
        "b9_scd2_history",
        "j16_source_balancing",
        "e13_listagg_mode",
        "e15_salted_agg",
        "d11_salted_skew_join",
        "j18_mixture_weights",
        "j19_quality_percentile_cut",
        # continuation-session additions with survivor picks, window
        # orderings, or keep-first prunes — the same sensitivity class
        "j24_event_transitions",
        "j29_line_dedup",
        "j33_semdedup_prune",
        "j35_prefix_dedup",
        "e17_weighted_stats",
        "f10_monotone_runs",
        "k10_disorder_profile",
        "a16_cdc_apply",
        "j31_context_chunking",
    ]
    def run_all():
        return {
            n: sorted(tuple(r) for r in registry[n].fn(spark, sf_dir).collect())
            for n in names
        }

    base = spark.conf.get("spark.sql.shuffle.partitions")
    at_32 = run_all()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        at_7 = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    for n in names:
        assert at_32[n] == at_7[n], f"{n} differs across partition counts"


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=2, max_size=8
    )
)
def test_containment_pairs_match_python_reference(sparkm, texts):
    """containment_pairs must equal a brute-force Python reference on
    arbitrary short texts: same pair set, same score (exact integer
    division both sides)."""
    import re

    from cassandra_snap_to_hadoop_spark.operators.dedup import containment_pairs

    def ref_shingles(t: str) -> set:
        words = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    docs = list(enumerate(texts))
    want = {}
    for i, ta in docs:
        for j, tb in docs:
            if i >= j:
                continue
            sa, sb = ref_shingles(ta), ref_shingles(tb)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            score = round(inter / min(len(sa), len(sb)), 4)
            if score >= 0.5:
                want[(i, j)] = score

    df = sparkm.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert got == want


@SLOW
@given(rows=cells)
def test_lww_priority_tier_equals_struct_tier(sparkm, rows):
    """The packed-priority HashAggregate tier must pick exactly the rows
    the generic struct-ordering tier picks, for arbitrary cell sets —
    the flagship's perf trick may never change semantics.  Seq is
    unique-ified so both orderings are total."""
    rows = [
        (pk, ck, wt, i, payload)
        for i, (pk, ck, wt, _s, payload) in enumerate(rows)
    ]
    df = sparkm.createDataFrame(
        rows, "pk long, ck long, _writetime long, _seq long, v string"
    )
    struct_tier = lww_merge(df, ["pk", "ck"], seq_col="_seq")
    prio = F.col("_writetime") * 100000 + F.col("_seq")
    packed_tier = lww_merge(df, ["pk", "ck"], priority=prio)
    assert sorted(map(tuple, struct_tier.collect())) == sorted(
        map(tuple, packed_tier.collect())
    )


@SLOW
@given(
    ids=st.lists(
        st.integers(min_value=-(2**50), max_value=2**50), min_size=1, max_size=40
    )
)
def test_bitmap_distinct_law(sparkm, ids):
    """The bucket/bit-position bitmap pipeline must equal exact
    COUNT(DISTINCT) for arbitrary longs — negatives and wide magnitudes
    included (e19's correctness does not depend on the fixture's
    positive-id domain)."""
    df = sparkm.createDataFrame([(i,) for i in ids], "v long")
    got = (
        df.select(
            F.bitmap_bucket_number("v").alias("b"),
            F.bitmap_bit_position("v").alias("p"),
        )
        .groupBy("b")
        .agg(F.bitmap_construct_agg("p").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")))
        .collect()[0][0]
    )
    assert got == len(set(ids))


@SLOW
@given(
    xs=st.lists(
        st.floats(min_value=0.0, max_value=131071.999, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
def test_width_bucket_floor_law(sparkm, xs):
    """For a power-of-two step, width_bucket must equal the floor-division
    restatement on EVERY in-range double — the exactness property e18's
    oracle depends on."""
    df = sparkm.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select(
        F.width_bucket("x", F.lit(0.0), F.lit(131072.0), F.lit(32)).alias("wb"),
        (F.floor(F.col("x") / 4096.0).cast("long") + 1).alias("manual"),
    ).collect()
    for r in rows:
        assert r.wb == r.manual


def _ref_exact_substring_dedup(texts: list[str], k: int):
    """Pure-Python reference for operators.dedup.exact_substring_dedup:
    same normalize -> k-gram -> global-dup -> cover -> reassemble law."""
    import hashlib
    import re as _re

    toks = [
        [t for t in _re.sub(r"\s+", " ", s.lower()).strip().split(" ") if t]
        for s in texts
    ]
    from collections import Counter

    grams = Counter()
    for tk in toks:
        for i in range(len(tk) - k + 1):
            grams[" ".join(tk[i : i + k])] += 1
    out = []
    for doc, tk in enumerate(toks):
        covered = set()
        for i in range(len(tk) - k + 1):
            if grams[" ".join(tk[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        out.append(
            (
                doc,
                len(tk),
                len(tk) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        )
    return sorted(out)


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=12
    ),
    k=st.integers(2, 4),
)
@pytest.mark.deep
def test_exact_substring_dedup_matches_python_reference(sparkm, texts, k):
    """The distributed ExactSubstr (gram-hash agg + coverage anti-join)
    must agree with a direct quadratic Python restatement on arbitrary
    short corpora — including all-duplicate, all-unique, empty-text and
    shorter-than-k documents."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import exact_substring_dedup

    df = sparkm.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r.doc, r.n_tokens, r.n_removed, r.cleaned_md5)
        for r in exact_substring_dedup(df, "doc_id", "text", k=k).collect()
    )
    assert got == _ref_exact_substring_dedup(texts, k)


@SLOW
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),      # user
            st.integers(0, 50),     # ts seconds offset
            st.booleans(),          # is fact (purchase) vs dim update
            st.sampled_from(["a", "b", "c"]),  # state payload for updates
        ),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.deep
def test_d19_pit_semantics_match_python_reference(sparkm, events):
    """The join-free merged-stream PIT formulation must agree with a
    direct Python restatement ('last dim update strictly before the fact
    in (ts, id) order, else unknown') on arbitrary event soups —
    including same-timestamp fact/update collisions, all-facts users and
    all-update users."""
    import datetime as dt

    from cassandra_snap_to_hadoop_spark.queries import round3c

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, (user, sec, is_fact, state) in enumerate(events):
        rows.append(
            (
                i + 1,
                t0 + dt.timedelta(seconds=sec),
                user,
                "purchase" if is_fact else state,
                1.0,
                None,
            )
        )
    df = sparkm.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.purchase_event_id: (r.state_at_purchase, r.state_since_ms)
            for r in round3c.d19_pit_scd2_join(sparkm, d).collect()
        }
    # Python reference
    want = {}
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    for idx, (eid, ts, user, etype, _v, _p) in enumerate(ordered):
        if etype != "purchase":
            continue
        state, since = "unknown", -1
        for peid, pts, puser, petype, _pv, _pp in ordered[:idx]:
            if puser == user and petype != "purchase":
                state, since = petype, int(pts.timestamp() * 1000)
        want[eid] = (state, since)
    assert got == want


@SLOW
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.integers(0, 60),           # minutes offset
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(1, 500),          # cents value
        ),
        min_size=1,
        max_size=30,
    )
)
@pytest.mark.deep
def test_e26_attribution_conservation_on_arbitrary_events(sparkm, events):
    """Conservation generalized off the fixture: for ANY event soup, the
    channel totals must sum exactly to the purchases' total micro-value,
    and per-purchase shares must match a direct Python restatement
    (equal split over 24 h-window touches, remainder to earliest)."""
    import datetime as dt
    import tempfile

    from cassandra_snap_to_hadoop_spark.queries import round3c

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + dt.timedelta(minutes=m), u, et, c / 100.0, None)
        for i, (u, m, et, c) in enumerate(events)
    ]
    df = sparkm.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.channel: (r.n_assignments, r.attributed_micro)
            for r in round3c.e26_multitouch_attribution(sparkm, d).collect()
        }
    # Python reference
    want: dict[str, list] = {}
    purchases = [(eid, ts, u, round(v * 1_000_000)) for eid, ts, u, et, v, _ in rows if et == "purchase"]
    touches = [(eid, ts, u, et) for eid, ts, u, et, _v, _p in rows if et in ("view", "click")]
    for pid, pts, pu, vm in purchases:
        window = sorted(
            (t for t in touches if t[2] == pu and t[1] < pts and t[1] >= pts - dt.timedelta(hours=24)),
            key=lambda t: (t[1], t[0]),
        )
        if not window:
            want.setdefault("direct", []).append(vm)
            continue
        n = len(window)
        for i, (teid, tts, tu, tch) in enumerate(window):
            share = vm // n + (vm % n if i == 0 else 0)
            want.setdefault(tch, []).append(share)
    want_agg = {ch: (len(v), sum(v)) for ch, v in want.items()}
    assert got == want_agg
    assert sum(m for _, m in got.values()) == sum(vm for *_, vm in purchases)


@SLOW
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 10)),  # (lo day, length)
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.deep
def test_f22_sweep_equals_bruteforce_stab_everywhere(sparkm, intervals):
    """The delta-sweep open-count at EVERY boundary day must equal the
    brute-force stab count (# intervals with lo <= day < hi) — not just
    at the peak.  Uses the operator's own interval convention by staging
    synthetic orders whose (o_orderdate, o_orderkey) reproduce the
    requested [lo, lo+len) intervals."""
    import datetime as dt
    import tempfile

    from cassandra_snap_to_hadoop_spark.queries import round3c

    # o_orderkey % 20 == len - 1  =>  interval [lo, lo + 1 + (len-1))
    rows = []
    for i, (lo, length) in enumerate(intervals):
        okey = i * 20 + (length - 1)
        rows.append(
            (okey, 0, "F", 1.0, dt.datetime(1970, 1, 1) + dt.timedelta(days=lo), "1-URGENT")
        )
    df = sparkm.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        got = {r.day: r.n_open for r in round3c.f22_peak_concurrency(sparkm, d).collect()}
    ivs = [(lo, lo + length) for lo, length in intervals]
    for day in got:
        stab = sum(1 for lo, hi in ivs if lo <= day < hi)
        assert got[day] == stab, (day, got[day], stab)
    assert sorted(got) and got[max(got)] == 0
