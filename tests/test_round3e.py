"""Round-4 operator-law tests for the linkage/qsketch/graph modules —
the tests their docstrings promise (ADVICE r3: claims must be backed by
runs, not prose).

* Jaro-Winkler: differential fuzz of the pure-Python implementation
  against DuckDB's independent C++ ``jaro_winkler_similarity`` — two
  unrelated implementations of the published definition must agree
  bit-for-bit, including the empty-string convention.
* GK-lite quantile summaries: the merge's rank-error law — every
  estimated decile's TRUE rank within 2·n/k of the target.
* Integer PageRank: bit-identical to an independent pure-Python
  dict-based power iteration on the same lattice, and rank-mass
  conservation within integer-truncation loss.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from cassandra_snap_to_hadoop_spark.operators.linkage import jaro, jaro_winkler
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------- linkage


def test_jaro_winkler_matches_duckdb_bit_for_bit():
    """5000 random pairs (fixed seed): the pure-Python Winkler '90
    implementation and DuckDB's C++ one must emit IDENTICAL doubles —
    the evidence behind j70's hash-checked oracle."""
    rng = random.Random(7)
    con = duckdb.connect()
    for _ in range(5000):
        a = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 12)))
        d = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert d == jaro_winkler(a, b), (a, b)


def test_jaro_winkler_empty_string_convention():
    """DuckDB scores '' vs anything (including '') as 0.0, not the
    textbook 1.0 for two empties — the one definitional divergence the
    fuzz found, matched by the empty-input guard."""
    con = duckdb.connect()
    for a, b in [("", ""), ("", "a"), ("abc", "")]:
        d = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert d == 0.0 == jaro_winkler(a, b)


def test_jaro_known_values():
    """Textbook anchor points (Winkler's own MARTHA/MARHTA example)."""
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444444444)
    # prefix boost: 3 matching leading chars, p=0.1
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_j70_registry_pairs_meet_threshold(spark, sf_dir):
    rows = REGISTRY["j70_jaro_winkler_pairs"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one high-similarity pair in the fixture"
    assert all(r.jw_micro >= 850000 and r.id_a != r.id_b for r in rows)


# ---------------------------------------------------------------- qsketch


def test_mergeable_quantiles_rank_error_law(spark, sf_dir):
    """The whole point of the summary: after bucketing + merge, each
    estimated quantile's TRUE rank must sit within 2·n/k of p·n (n/k
    summary resolution + n/k for the boundary pick).  Since round 6 the
    registered query is the SQL-certified md5-keyed tier
    (qsketch.mergeable_quantiles_certified, k=32) — the law is asserted
    on it; the pandas production tier keeps its own law test below."""
    from cassandra_snap_to_hadoop_spark.io import Tables

    k = 32
    est = {
        r.decile / 10.0: r.est
        for r in REGISTRY["e44_mergeable_quantiles"].fn(spark, sf_dir).collect()
    }
    assert len(est) == 9
    vals = sorted(
        r.v
        for r in Tables(spark, sf_dir)
        .orders.selectExpr("cast(o_totalprice as double) as v")
        .collect()
    )
    n = len(vals)
    import bisect

    for p, e in est.items():
        # true rank range of the estimate value within the sorted data
        lo = bisect.bisect_left(vals, e)
        hi = bisect.bisect_right(vals, e)
        target = p * n
        slack = 2 * n / k
        assert lo - slack <= target <= hi + slack, (p, e, lo, hi, target, slack)


def test_mergeable_quantiles_pandas_tier_rank_error_law(spark, sf_dir):
    """The xxhash64-bucketed applyInPandas production tier keeps its own
    rank-error law now that the registered query is the certified twin."""
    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.qsketch import mergeable_quantiles

    k = 128
    o = Tables(spark, sf_dir).orders
    est = {r.p: r.est for r in mergeable_quantiles(o, "o_totalprice", k=k).collect()}
    assert len(est) == 9
    vals = sorted(
        r.v
        for r in Tables(spark, sf_dir)
        .orders.selectExpr("cast(o_totalprice as double) as v")
        .collect()
    )
    n = len(vals)
    import bisect

    for p, e in est.items():
        lo = bisect.bisect_left(vals, e)
        hi = bisect.bisect_right(vals, e)
        target = p * n
        slack = 2 * n / k
        assert lo - slack <= target <= hi + slack, (p, e, lo, hi, target, slack)


def test_mergeable_quantiles_certified_matches_pandas_fold_law(spark, sf_dir):
    """Both tiers answer from the same summary algebra: their decile
    estimates must agree within the COMBINED rank-error budget (2·n/k per
    tier) — a cross-tier consistency pin, not exact equality (different
    bucketing hashes pick different boundary values)."""
    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.qsketch import mergeable_quantiles

    o = Tables(spark, sf_dir).orders
    cert = {
        r.decile: r.est
        for r in REGISTRY["e44_mergeable_quantiles"].fn(spark, sf_dir).collect()
    }
    prod = {
        int(round(r.p * 10)): r.est
        for r in mergeable_quantiles(o, "o_totalprice", k=128).collect()
    }
    vals = sorted(
        r.v for r in o.selectExpr("cast(o_totalprice as double) as v").collect()
    )
    import bisect

    n = len(vals)
    budget = 2 * n / 32 + 2 * n / 128
    for d in range(1, 10):
        ra = bisect.bisect_left(vals, cert[d])
        rb = bisect.bisect_left(vals, prod[d])
        assert abs(ra - rb) <= budget, (d, cert[d], prod[d], ra, rb, budget)


def test_mergeable_quantiles_weights_conserve(spark, sf_dir):
    """Per-bucket summary weights must sum exactly to the input count —
    the summary is a lossless-cardinality reduction."""
    from pyspark.sql import functions as F

    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.qsketch import _summarize

    o = Tables(spark, sf_dir).orders
    n = o.where(F.col("o_totalprice").isNotNull()).count()
    import pandas as pd

    pdf = o.select(F.col("o_totalprice").cast("double").alias("v")).toPandas()
    s = _summarize(pdf, 128)
    assert int(s["weight"].sum()) == n


# ------------------------------------------------------------------ graph


def _pagerank_py(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Independent dict-based reference on the same integer lattice."""
    SCALE, BASE = 1_000_000_000_000, 150_000_000_000
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {s: SCALE for s in outdeg}
    for _ in range(iters):
        acc: dict[int, int] = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {d: BASE + (85 * c) // 100 for d, c in acc.items()}
    return ranks


def test_pagerank_int_matches_python_reference(spark):
    from cassandra_snap_to_hadoop_spark.operators.graph import pagerank_int

    rng = random.Random(13)
    raw = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(300)]
    edges = raw + [(d, s) for s, d in raw]  # symmetric
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.r for r in pagerank_int(df, iters=3).collect()}
    assert got == _pagerank_py(edges, 3)


def test_pagerank_mass_conservation(spark):
    """Total rank mass stays within truncation loss of the closed form:
    each node loses < outdeg ulps to integer division and < 1 to the
    85/100 step, so  0 <= expected_mass - actual < |edges| + |nodes|."""
    from cassandra_snap_to_hadoop_spark.operators.graph import (
        BASE,
        SCALE,
        pagerank_int,
    )

    rng = random.Random(29)
    raw = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(200)]
    edges = raw + [(d, s) for s, d in raw]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_nodes = len({s for s, _ in edges})
    mass0 = n_nodes * SCALE
    got = pagerank_int(df, iters=1).collect()
    actual = sum(r.r for r in got)
    expected = n_nodes * BASE + (85 * mass0) // 100
    loss_bound = len(edges) + n_nodes
    assert 0 <= expected - actual < loss_bound


# ---------------------------------------------------------------- ROUGE-L


def _lcs_ref(x: list[str], y: list[str]) -> int:
    """Independent full-table DP (the UDF uses a rolling two-row table)."""
    m, n = len(x), len(y)
    t = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            t[i][j] = (
                t[i - 1][j - 1] + 1
                if x[i - 1] == y[j - 1]
                else max(t[i - 1][j], t[i][j - 1])
            )
    return t[m][n]


def test_rouge_l_matches_reference_dp(spark, sf_dir):
    """Every emitted score must equal the micro-quantized F computed from
    an independent full-table LCS over the same 30-token prefixes."""
    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.text import tokens as _tokens
    from pyspark.sql import functions as F

    got = {
        (r.id_a, r.id_b): r.rouge_l_micro
        for r in REGISTRY["j72_rouge_l"].fn(spark, sf_dir).collect()
    }
    assert got, "expected candidate pairs with LCS > 0"
    toks = {
        r.doc_id: list(r.t)
        for r in Tables(spark, sf_dir)
        .documents.select("doc_id", F.slice(_tokens(F.col("text")), 1, 30).alias("t"))
        .collect()
    }
    for (ia, ib), micro in list(got.items())[:300]:
        x, y = toks[ia], toks[ib]
        m = _lcs_ref(x, y)
        p, r = m / len(x), m / len(y)
        want = int((2 * p * r / (p + r)) * 1_000_000 + 0.5) if m else 0
        assert micro == want, (ia, ib, micro, want)


# ------------------------------------------------------------ Holt-Winters


def test_holt_winters_periodic_series_is_learned_exactly():
    """A perfectly periodic series must converge to trend 0, seasonal
    offsets equal to the cycle, and a forecast equal to the next true
    value — the additive-decomposition sanity anchor."""
    from cassandra_snap_to_hadoop_spark.operators.forecast import holt_winters_fold

    level, trend, seas, fc = holt_winters_fold([1, 2, 3, 4, 5, 6, 7] * 4, season=7)
    assert trend == 0.0
    assert seas == [-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0]
    assert fc == 1.0  # next value of the cycle
    assert level == 4.0  # the cycle mean


def test_f27_matches_pure_python_twin(spark, sf_dir):
    """Since the round-7 in-place certification the registered query is
    the INTEGER-lattice recursion; this pin replays it in plain Python
    with truncating (toward-zero) division over the rn-indexed observed
    daily counts."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cassandra_snap_to_hadoop_spark.io import Tables

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    got = {
        r.event_type: (
            r.n_days,
            r.level_cnt,
            r.trend_cnt,
            r.seasonal_amplitude_cnt,
            r.forecast_next_cnt,
        )
        for r in REGISTRY["f27_holt_winters"].fn(spark, sf_dir).collect()
    }
    rows = Tables(spark, sf_dir).events.select("event_type", "ts").collect()
    series: dict[str, dict] = {}
    for r in rows:
        day = int(
            (r.ts.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        ) // 86400000000
        series.setdefault(r.event_type, {}).setdefault(day, 0)
        series[r.event_type][day] += 1
    for et, byday in series.items():
        xs = [byday[d] for d in sorted(byday)]
        if len(xs) < 7:
            assert et not in got
            continue
        l = sum(xs[:7]) // 7
        b = 0
        seas = [x - l for x in xs[:7]]
        for x in xs[7:]:
            s_old = seas.pop(0)
            l_new = tdiv(x - s_old + 4 * (l + b), 5)
            b = tdiv((l_new - l) + 9 * b, 10)
            seas.append(tdiv((x - l_new) + 3 * s_old, 4))
            l = l_new
        amp = max(seas) - min(seas)
        assert got[et] == (len(xs), l, b, amp, l + b + seas[0]), et


def test_holt_winters_streaming_state_parity(spark, sf_dir, tmp_path):
    """F27's stateful-streaming twin: per-type day counts accumulate in
    applyInPandasWithState state across micro-batches; the LAST emission
    per type equals the batch Holt-Winters fit — regardless of shard
    arrival order, because state holds the completed day->count map, not
    the three model states."""
    from pyspark.sql import functions as F

    from cassandra_snap_to_hadoop_spark.io import SCHEMAS, load
    from cassandra_snap_to_hadoop_spark.streaming.pipelines import f27_stream

    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    root = str(tmp_path / "events")
    e.repartition("day").write.partitionBy("day").mode("overwrite").parquet(root)
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 7)
        .parquet(root + "/*")
    )
    q = (
        f27_stream(stream)
        .writeStream.format("memory")
        .queryName("f27_stream_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck27"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM f27_stream_sink").collect()
    assert emitted
    final = {}
    for r in emitted:  # last emission = max day-span (monotone under accumulation)
        cur = final.get(r.event_type)
        if cur is None or r.n_days >= cur.n_days:
            final[r.event_type] = r
    # batch reference: the float fold directly (the registered query is
    # the integer-lattice certified twin since round 7)
    import datetime as dt

    from cassandra_snap_to_hadoop_spark.io import Tables
    from cassandra_snap_to_hadoop_spark.operators.forecast import holt_winters_fold

    daily = (
        Tables(spark, sf_dir)
        .events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series: dict[str, dict] = {}
    for r in daily:
        series.setdefault(r.event_type, {})[r.day] = r.n
    batch = {}
    for et, bydate in series.items():
        lo, hi = min(bydate), max(bydate)
        xs = [
            float(bydate.get(lo + dt.timedelta(days=i), 0))
            for i in range((hi - lo).days + 1)
        ]
        level, trend, seas, fc = holt_winters_fold(xs, season=7)
        batch[et] = (len(xs), level, trend, round(max(seas) - min(seas), 4), fc)
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert (
            s.n_days,
            s.level,
            s.trend,
            s.seasonal_amplitude,
            s.forecast_next,
        ) == b, et
