"""Targeted properties for the round-3 queries (queries/round3.py) —
the invariants the oracle hash can't state directly: join-decomposition
equivalence, sample stability under corpus growth, representative
optimality.  Oracle value-parity itself is covered by the registry gate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_d16_bucketed_equals_naive_theta(spark):
    """The month-bucket decomposition must reproduce the naive theta
    join's pairs exactly — no pair lost at a month boundary (an order
    window spanning two months is the case the bucketing exists for),
    none double-counted (array_distinct on the candidate buckets)."""
    o = Tables(spark, SF).orders.select("o_orderkey", "o_totalprice", "o_orderdate")
    lo, hi = F.col("o_orderdate"), F.date_add(F.col("o_orderdate"), 6)
    promo = (
        o.select(F.trunc(lo, "month").alias("p_lo"))
        .distinct()
        .select("p_lo", F.date_add(F.col("p_lo"), 9).alias("p_hi"))
    )
    naive = (
        o.withColumn("hi", hi)
        .join(promo, (lo <= F.col("p_hi")) & (F.col("p_lo") <= F.col("hi")))
        .groupBy("p_lo")
        .agg(F.count("*").alias("n"))
    )
    got = {r.promo_month: r.n_orders for r in REGISTRY["d16_interval_overlap_join"].fn(spark, SF).collect()}
    want = {r.p_lo: r.n for r in naive.collect()}
    assert got == want


def test_j43_sample_stable_under_corpus_growth(spark):
    """Hash-rank sampling is a function of document identity: removing
    documents that are NOT in the sample must leave the sample of every
    untouched stratum unchanged (the re-run/retry/incremental-ingest
    guarantee rand() sampling cannot give)."""
    from pyspark.sql.window import Window

    d = Tables(spark, SF).documents
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )

    def kept(df):
        r = df.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        return {(x.source, x.doc_id) for x in r.filter(F.col("rn") <= 25).collect()}

    full = kept(d)
    sample_ids = {i for (_, i) in full}
    # drop a third of the non-sample docs — survivors' ranks can only shrink
    shrunk = d.filter(F.col("doc_id").isin(list(sample_ids)) | (F.col("doc_id") % 3 != 0))
    assert kept(shrunk) == full


def test_j40_representative_is_cluster_argmax(spark):
    """Every elected representative must carry its cluster's maximum
    quality, and group sizes must cover the corpus exactly."""
    out = REGISTRY["j40_dedup_best_rep"].fn(spark, SF)
    rows = out.collect()
    n_docs = Tables(spark, SF).documents.count()
    assert sum(r.group_size for r in rows) == n_docs
    assert all(r.rep_quality >= 1 for r in rows)
    # rep_quality equals max n_chars among members: check via recompute
    # on the planted clusters (id%10<=2 share their decade-base text).
    d = {r.doc_id: r.n_chars for r in Tables(spark, SF).documents.select("doc_id", "n_chars").collect()}
    planted = {}
    for doc_id, nc in d.items():
        if doc_id % 10 <= 2:
            planted.setdefault(doc_id - doc_id % 10, []).append((nc, doc_id))
    by_rep = {r.rep_id: r for r in rows}
    for base_id, members in planted.items():
        if len(members) < 2:
            continue
        best_quality = max(nc for nc, _ in members)
        best_id = min(i for nc, i in members if nc == best_quality)
        if best_id in by_rep:  # rep must be the argmax member when elected
            assert by_rep[best_id].rep_quality == best_quality


def test_j42_variant_collapse_counts(spark):
    """Variants 0/1/2 of each URL group canonicalize together; variant 3
    (real query param) stands alone — group sizes must say exactly that."""
    out = REGISTRY["j42_url_canonical_dedup"].fn(spark, SF).collect()
    with_param = [r for r in out if "?page=2" in r.canonical]
    without = [r for r in out if "?" not in r.canonical]
    assert all(r.group_size == 1 for r in with_param)
    # full groups of 4 docs have exactly variants 0,1,2 collapsed
    assert max(r.group_size for r in without) == 3
    # every document lands in exactly one canonical group
    n_docs = Tables(spark, SF).documents.count()
    assert sum(r.group_size for r in out) == n_docs


def test_j44_oov_bounds_and_head_doc(spark):
    """OOV rate is a true fraction, and a document made ENTIRELY of the
    corpus's single most frequent token scores 0 (vocabulary head)."""
    out = REGISTRY["j44_oov_rate"].fn(spark, SF)
    bad = out.filter((F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)).count()
    assert bad == 0
    assert out.filter(F.col("n_oov") > F.col("n_tokens")).count() == 0


def test_a18_corrupt_lines_all_captured(spark):
    """PERMISSIVE JSON must capture each torn line whole — corrupt count
    is exactly the planted constant and good rows checksum to source."""
    row = REGISTRY["a18_json_malformed_rows"].fn(spark, SF).collect()[0]
    src = Tables(spark, SF).documents
    assert row.n_corrupt == 17
    assert row.n_good == src.count()
    assert row.sum_chars == src.agg(F.sum("n_chars")).collect()[0][0]


def test_e18_width_bucket_matches_floor_formula(spark):
    """width_bucket with a power-of-two step must agree with the floor-
    division restatement on every row INCLUDING exact bucket edges and
    out-of-range values (the oracle's formulation is only valid if the
    two are value-identical in Spark itself)."""
    vals = [0.0, 1.0, 4095.999, 4096.0, 4096.0001, 65536.0, 131071.99,
            914.44, 104998.18]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        F.width_bucket(F.col("x"), F.lit(0.0), F.lit(131072.0), F.lit(32)).alias("wb"),
        (F.floor(F.col("x") / 4096.0).cast("long") + 1).alias("manual"),
    ).collect()
    for r in got:
        assert r.wb == r.manual, r
    # out-of-range semantics: below -> 0, at/above hi -> n+1
    edge = spark.createDataFrame([(-1.0,), (131072.0,), (200000.0,)], "x double").select(
        F.width_bucket("x", F.lit(0.0), F.lit(131072.0), F.lit(32)).alias("wb")
    ).collect()
    assert [r.wb for r in edge] == [0, 33, 33]


def test_i15_collation_folds_case_variants(spark):
    """UTF8_LCASE grouping folds binary-distinct spellings into one group
    and countDistinct on the raw column still sees them all."""
    df = spark.createDataFrame(
        [("Web",), ("WEB",), ("web",), ("mail",)], "src_raw string"
    )
    out = (
        df.groupBy(F.collate(F.col("src_raw"), "UTF8_LCASE").alias("k"))
        .agg(F.count("*").alias("n"), F.countDistinct("src_raw").alias("v"))
        .select(F.lower(F.col("k")).cast("string").alias("k"), "n", "v")
        .collect()
    )
    got = {r.k: (r.n, r.v) for r in out}
    assert got == {"web": (3, 3), "mail": (1, 1)}


def test_a19_csv_quotes_commas_newlines_roundtrip(spark, tmp_path):
    """The exact writer/reader option set used by a19 must round-trip text
    containing quotes, commas, and newlines byte-exact."""
    rows = [
        (1, 'he said "hi", twice'),
        (2, "line one\nline two\n\nline four"),
        (3, 'mix: "a,b"\n"c,d"'),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    p = str(tmp_path / "csv")
    df.write.option("header", True).option("escape", '"').csv(p)
    back = (
        spark.read.schema("id long, t string")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(p)
    )
    got = {r.id: r.t for r in back.collect()}
    want = dict(rows)
    want[4] = None  # empty string reads back as null under default CSV options
    assert got == want


def test_f14_full_window_row_accounting(spark):
    """Every event past the 99-row warm-up is scored: per-type n_windows
    must equal the type's total count minus 99."""
    R = load_all()
    totals = {
        r.event_type: r.n
        for r in Tables(spark, SF).events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    out = {r.event_type: r.n_windows for r in R["f14_rolling_zscore"].fn(spark, SF).collect()}
    assert out == {t: n - 99 for t, n in totals.items() if n >= 100}


def test_k12_topk_shape_and_monotone(spark):
    """Each day emits exactly ranks 1..3 and counts are non-increasing in
    rank (the deterministic tie-break can never invert counts)."""
    R = load_all()
    rows = R["k12_stream_topk"].fn(spark, SF).collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.window_start, []).append((r.rnk, r.n))
    for day, pairs in by_day.items():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3], (day, pairs)
        assert pairs[0][1] >= pairs[1][1] >= pairs[2][1], (day, pairs)


def test_f15_cusum_matches_python_reference(spark):
    """The window-identity CUSUM (round-10 SQL conversion) must equal
    the DIRECT clamped recursion ``s_i = max(0, s_{i-1} + y_i)`` replayed
    in pure-int Python — this is the machine check of the reflection
    identity ``s_i = P_i − min(0, min_{j≤i} P_j)`` the engine now uses,
    on the same integer-cents lattice (math.isqrt as the independent
    exact-σ third implementation)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    rows = Tables(spark, SF).events.select("event_type", "ts", "event_id", "value").collect()
    by_type: dict = {}
    for r in rows:
        cents = int(Decimal(r.value * 100).quantize(Decimal(1), ROUND_HALF_UP))
        by_type.setdefault(r.event_type, []).append((r.ts, r.event_id, cents))
    want = {}
    for t, evs in by_type.items():
        evs.sort()
        xs = [c for _, _, c in evs]
        n, s_sum, q = len(xs), sum(xs), sum(c * c for c in xs)
        mu = s_sum // n  # positive sums: floor == trunc
        sigma = math.isqrt((n * q - s_sum * s_sum) // (n * (n - 1))) if n > 1 else 0
        k, h = sigma // 2, 4 * sigma
        s = smax = alarms = 0
        for c in xs:
            s = max(0, s + (c - mu - k))
            smax = max(smax, s)
            if s > h:
                alarms += 1
        want[t] = (n, alarms, smax, sigma, 1000 * smax // sigma if sigma > 0 else 0)
    R = load_all()
    got = {
        r.event_type: (
            r.n_events, r.n_alarms, r.max_cusum_cents,
            r.sigma_cents, r.max_cusum_sigma_milli,
        )
        for r in R["f15_cusum_drift"].fn(spark, SF).collect()
    }
    assert got == want


def test_staged_queries_are_rerun_stable(spark):
    """Every round-3 query that stages scratch inputs (a17 XML, a19 CSV,
    a20 binary files, a21 dynamic overwrite) must return identical
    results on a second invocation — the staging guard must neither
    rebuild differently nor double-apply the overwrite."""
    R = load_all()
    for name in (
        "a17_xml_roundtrip",
        "a19_csv_multiline",
        "a20_binaryfile_ingest",
        "a21_dynamic_partition_overwrite",
        "a23_nested_schema_pruning",
    ):
        first = sorted(map(tuple, R[name].fn(spark, SF).collect()))
        second = sorted(map(tuple, R[name].fn(spark, SF).collect()))
        assert first == second, name


def test_e20_pareto_head_is_a_prefix(spark):
    """The 80%-coverage head must be downward-closed: sorted by
    (bytes desc, source), in_head is a contiguous prefix, cum_share is
    non-decreasing, and the head's last cum_share crosses 0.8."""
    R = load_all()
    rows = R["e20_pareto_cut"].fn(spark, SF).collect()
    rows.sort(key=lambda r: (-r.bytes, r.source))
    flags = [r.in_head for r in rows]
    assert flags == sorted(flags, reverse=True), flags  # prefix of 1s
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
    head = [r for r in rows if r.in_head]
    assert head and head[-1].cum_share >= 0.8
    if len(head) < len(rows):
        assert head[-1].cum_share - head[-1].share < 0.8


def test_k13_left_outer_edge_semantics(spark, tmp_path):
    """One row per (click, matching purchase); a no-purchase click emits
    EXACTLY one null row; purchases outside the 30-minute window do not
    match; a purchase at exactly +30:00 does (inclusive bound)."""
    from pyspark.sql import functions as F

    ddl = "event_id long, ts string, user_id long, event_type string, value double, props string"
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "purchase", 0.0, "{}"),   # match
        (3, "2024-01-01 10:30:00", 1, "purchase", 0.0, "{}"),   # match at bound
        (4, "2024-01-01 10:30:01", 1, "purchase", 0.0, "{}"),   # outside
        (5, "2024-01-01 09:59:59", 1, "purchase", 0.0, "{}"),   # before click
        (6, "2024-01-01 12:00:00", 2, "click", 0.0, "{}"),      # unconverted
    ]
    df = spark.createDataFrame(rows, ddl).withColumn("ts", F.col("ts").cast("timestamp"))

    from cassandra_snap_to_hadoop_spark.queries.round3 import k13_stream_stream_left_join

    # Stage the mini frame as a real events.parquet so the query reads it
    # through the normal io.load path — no class patching (a botched
    # restore of a __getattr__-backed attribute once poisoned every
    # subsequent events load in the session).
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.click_id, r.purchase_id)
        for r in k13_stream_stream_left_join(spark, str(tmp_path)).collect()
    }
    assert out == {(1, 2), (1, 3), (6, None)}


def test_j49_nfc_is_idempotent_on_corpus(spark):
    """NFC is a projection: normalizing twice must equal normalizing once
    on the real (injected-decomposition) corpus."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None else unicodedata.normalize("NFC", t))

    d = Tables(spark, SF).documents
    dec = F.when(F.col("doc_id") % 5 == 0, F.regexp_replace("text", "e", "é")).otherwise(
        F.col("text")
    )
    t = d.select(dec.alias("dec")).withColumn("one", nfc(F.col("dec")))
    n_diff = t.withColumn("two", nfc(F.col("one"))).filter(F.col("one") != F.col("two")).count()
    assert n_diff == 0


def test_e19_bitmaps_merge_across_segments(spark):
    """The mergeability claim, demonstrated: per-DAY bucket bitmaps
    OR-merge to the month-level exact distinct without rescanning rows."""
    from pyspark.sql import functions as F

    e = Tables(spark, SF).events
    per_day = (
        e.select(
            F.dayofmonth("ts").alias("day"),
            F.bitmap_bucket_number("user_id").alias("b"),
            F.bitmap_bit_position("user_id").alias("p"),
        )
        .groupBy("day", "b")
        .agg(F.bitmap_construct_agg("p").alias("bm"))
    )
    merged = (
        per_day.groupBy("b")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
        .collect()[0]["n"]
    )
    exact = e.select(F.countDistinct("user_id")).collect()[0][0]
    assert merged == exact


def test_a22_retention_semantics_mini_frame(spark):
    """Retention accounting on a hand-checkable manifest: a file frees
    only when no retained tag references it, and retained tags always
    report zero reclaimable."""
    from pyspark.sql import functions as F

    # files: 1 (only tag1), 2 (tag1+tag2), 3 (all), 4 (only tag3)
    rows = [
        ("tag1", 1, 100), ("tag1", 2, 10), ("tag1", 3, 1),
        ("tag2", 2, 10), ("tag2", 3, 1),
        ("tag3", 3, 1), ("tag3", 4, 1000),
    ]
    tags = spark.createDataFrame(rows, "tag string, file_id long, bytes long")
    kept = (
        tags.filter(F.col("tag").isin("tag2", "tag3"))
        .select("file_id").distinct().withColumn("retained", F.lit(1))
    )
    out = (
        tags.join(kept, "file_id", "left")
        .groupBy("tag")
        .agg(
            F.sum("bytes").alias("tag_bytes"),
            F.sum(F.when(F.col("retained").isNull(), F.col("bytes")).otherwise(F.lit(0))).alias("reclaim"),
        )
    )
    got = {r.tag: (r.tag_bytes, r.reclaim) for r in out.collect()}
    # only file 1 (100 bytes) frees; every retained tag reclaims 0
    assert got == {"tag1": (111, 100), "tag2": (11, 0), "tag3": (1001, 0)}
