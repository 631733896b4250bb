#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of the headline set (median of N_RUNS per
query).  Every timing forces a full materialization via count() on the
query's result (the driver-side collect cost is excluded — we measure the
engine, not py4j transfer).
"""

from __future__ import annotations

import json
import os
import time

from cassandra_snap_to_hadoop_spark.registry import load_all
from cassandra_snap_to_hadoop_spark.session import get_spark

# Headline set: the flagship + the heaviest representative per operator
# family (scan+agg, fact join, window, sessionization, dedup, similarity,
# tf-idf).  Kept deliberately diverse — bench regressions localize to a family.
HEADLINE = [
    "flagship_snapshot_star",
    "e2_groupby_pricing_summary",
    "d2_sortmerge_fact_join",
    "tpch_q8_market_share",
    "d7_asof_join",
    "f3_running_agg",
    "k3_session_windows",
    "j1_exact_dedup",
    "j2_minhash_lsh_pairs",
    "j3_knn_bruteforce",
    "j7_tfidf",
    "llm_curation_funnel",
    "j29_line_dedup",
    # round-3 representatives: profiling agg + rolling-window analytics
    "e18_width_bucket_histogram",
    "f14_rolling_zscore",
    # round-3 continuation: IR tier + event-analytics join/distinct shape
    "j50_inverted_index",
    "e22_cohort_retention",
    # round-3 late depth batch: corpus-wide span dedup (gram agg + anti join)
    "j57_exact_substring_dedup",
    # round-3 third continuation: exact prefix-filtered similarity join
    "j62_ppjoin_pairs",
    # round-4: two-pass global total order (range partitions + offsets) and
    # the SQL-certified md5 simhash band index; j70 adds the pandas-UDF
    # linkage-scoring family to the headline
    "e30_equidepth_scalable",
    "j64_simhash_pairs_md5",
    "j70_jaro_winkler_pairs",
    # round-4 continuation: iterative workload (12-step UnionLoop) and the
    # broadcast-constant Bloom prefilter ingest-dedup shape
    "sql_api_recursive_cte",
    "j82_bloom_prefilter_dedup",
    # round-4 second continuation: iterative ML (broadcast-centroid Lloyd)
    # and grid-blocked density classification
    "j86_kmeans_lloyd",
    "j87_dbscan_core",
    # round-5: iterative graph clustering over the banded dup graph
    # (multi-round join/agg workload class) and positional winnowing
    # fingerprints (partitioned sliding-min window + bucket pair join)
    "j90_connected_components",
    "j91_winnowing_fingerprints",
    # round-6 representatives: corpus-scan importance scoring (bigram
    # explode + broadcast feature join) and bounded-round graph peeling
    "j101_dsir_importance",
    "j100_kcore_decomposition",
    # round-6 second representative (VERDICT r6 item 5): iterative-
    # relational PAV calibration — unrolled KB-relation merge rounds with
    # the j100-style fixpoint early-exit
    "e75_isotonic_calibration",
    # round-7 representative (VERDICT r7 item 5): iterative graph
    # wedge-join truss peeling — shape distinct from j100's semi-join peel
    "j107_ktruss_peel",
    # round-8 representative: embedding-selection workload (quantized
    # dot-product joins + candidate-lockstep greedy rounds)
    "j121_mmr_rerank",
    # round-8 second representative (VERDICT r8 item 7): Cassandra LWT
    # ballot replay — per-slot LAG-chain over MIN-deduped CAS rounds, the
    # ordered-window state-machine class the headline lacked
    "b17_lwt_cas_replay",
    # round-9 representative: cluster-bounded quadratic embedding dedup
    # (SemDeDup) — within-label pair dots via the (label, dim) equi
    # self-join; the cluster bounds the candidate term
    "j131_semdedup",
    # round-10 representative (VERDICT r9 item 5): exact n-gram
    # decontamination — the distinct-gram SEMI-JOIN shape (train grams
    # anti/semi vs the broadcastable eval-gram side) the headline lacked
    "j127_ngram_decontamination",
    # round-11 representatives (VERDICT r10 item 7): the round-10 depth
    # tier's two shapes the headline lacked — e127's value-histogram
    # lattice windows + integer folds, and f59's per-window OLS-detrend
    # RSS ladder over the profile lattice
    "e127_brunner_munzel",
    "f59_dfa_alpha",
]

N_RUNS = 3
# r12 (VERDICT r11 item 7): sub-second keys carried no signal — one cold
# box window drifted 15 untouched queries 0.77-0.90x.  Keys whose median
# lands under this threshold get extra runs (median of 7 instead of 3) and
# every key reports its [min, max] spread, so a 20% move on a 0.3 s query
# can be told apart from scheduler noise.  Methodology is otherwise
# unchanged (count-timed median after one warm run).
FAST_KEY_SEC = 0.5
N_RUNS_FAST = 7


def _drop_persisted(spark) -> None:
    """Unpersist dead RDD blocks between queries.

    The engine's lazy ``localCheckpoint`` lineage cuts persist their
    relation on first use; every timed run builds FRESH DataFrames, so
    the previous run's persisted blocks are unreachable dead weight
    that otherwise waits on the JVM ContextCleaner.  Dropping them at
    each query boundary keeps session memory flat across the sweep and
    guarantees no persisted state crosses query boundaries (the
    no-cross-run-caching contract).  Timing methodology is unchanged:
    count-timed median of N_RUNS after one warm run, cleanup OUTSIDE
    the timed region."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:
        pass  # introspection API drift must never fail the bench


def _guard_limits() -> tuple[dict[str, float], float, float]:
    """Load the guard's baseline medians + slack + ratio bar from
    tools/bench_guard.py (single source of truth — ADVICE r10 item 2;
    tools/ is not a package, hence importlib)."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_guard.py")
    spec = importlib.util.spec_from_file_location("bench_guard", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.BASELINE_MEDIANS, mod.ABS_SLACK_SEC, mod.THRESHOLD


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    registry = load_all()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = registry[name]
        q.fn(spark, sf_dir).count()  # warm (JIT, code cache, FS cache)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        # sub-second keys: extend to N_RUNS_FAST total so the median sits
        # on more samples (noise floor on this box is ~0.1 s per run)
        if sorted(runs)[len(runs) // 2] < FAST_KEY_SEC:
            for _ in range(N_RUNS_FAST - N_RUNS):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
        _drop_persisted(spark)

    # Contention re-check (VERDICT r9 item 7): three rounds of guard
    # adjudication (r7/r8/r9) traced every sweep flag to shared-box /
    # JVM-drain contention, never to a plan change — so any query over
    # the guard bar gets ONE isolated re-measure (median of N_RUNS after
    # a warm run, same protocol) before the number is recorded.  The
    # isolated median is AUTHORITATIVE (ADVICE r10 item 2: min() of two
    # estimators biases the headline downward; the isolated measurement
    # is the cleaner one by construction — it is what BASELINE.md's own
    # medians are).  Both numbers are reported under "reruns" so the
    # adjudication is visible, not silent.
    baselines, abs_slack, threshold = _guard_limits()
    reruns: dict[str, list[float]] = {}
    flagged = [
        n
        for n, sec in timings.items()
        if n in baselines
        and sec / baselines[n] > threshold
        and sec - baselines[n] > abs_slack
    ]
    for name in flagged:
        q = registry[name]
        q.fn(spark, sf_dir).count()
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        iso = round(sorted(runs)[len(runs) // 2], 3)
        reruns[name] = [timings[name], iso]
        timings[name] = iso
        _drop_persisted(spark)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # additions-only key (r12): per-query [min, max] across its timed
        # runs, so sub-second medians carry their own error bars.
        "spread": spread,
    }
    if reruns:
        out["reruns"] = reruns
    print(json.dumps(out))


if __name__ == "__main__":
    main()
