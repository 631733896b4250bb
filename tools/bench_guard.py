#!/usr/bin/env python
"""Bench regression guard: diff a bench JSON line against BASELINE.md's
per-query medians and fail on drift beyond the threshold.

    python bench.py | python tools/bench_guard.py -
    python tools/bench_guard.py BENCH_r03.json [--threshold 1.5]

Mechanizes the "no perf regression" property that otherwise relies on
eyeballing BENCH_r{N}.json against BASELINE.md: every headline query must
stay under threshold × its baseline median (default 1.5×, comfortably
inside the driver's 2× bar while still absorbing shared-box noise).
Queries present in the bench output but not in the baseline table are
reported as NEW (non-fatal) — add a baseline row once they stabilize.
Exit 0 = all within bounds; exit 1 = at least one regression.
"""

from __future__ import annotations

import json
import sys

# BASELINE.md "Self-measured headline numbers" medians at sf0.1, local[32],
# AQE on, median of 3 after warm (see that file for plan digests).  Where a
# continuation re-measure exists the CONSERVATIVE (slower, isolated) median
# is used so FS-cache warmth can't turn box noise into a false alarm.
BASELINE_MEDIANS: dict[str, float] = {
    "flagship_snapshot_star": 2.03,
    "e2_groupby_pricing_summary": 0.43,
    "d2_sortmerge_fact_join": 0.86,
    "tpch_q8_market_share": 1.10,
    "d7_asof_join": 0.23,
    "f3_running_agg": 0.17,
    "k3_session_windows": 0.45,
    "j1_exact_dedup": 0.26,
    "j2_minhash_lsh_pairs": 1.36,
    "j3_knn_bruteforce": 0.59,
    "j7_tfidf": 0.96,
    "llm_curation_funnel": 3.88,
    "j29_line_dedup": 1.06,
    "e18_width_bucket_histogram": 0.56,
    "f14_rolling_zscore": 0.47,
    "j50_inverted_index": 1.07,
    "e22_cohort_retention": 0.57,
    "j57_exact_substring_dedup": 0.57,
    "j62_ppjoin_pairs": 2.64,
    "e30_equidepth_scalable": 2.22,
    "j64_simhash_pairs_md5": 2.24,
    "j70_jaro_winkler_pairs": 1.23,
    "sql_api_recursive_cte": 5.65,
    "j82_bloom_prefilter_dedup": 0.75,
    "j86_kmeans_lloyd": 2.37,
    "j87_dbscan_core": 0.71,
    "j90_connected_components": 3.77,
    "j91_winnowing_fingerprints": 1.72,
    "j101_dsir_importance": 1.88,
    "j100_kcore_decomposition": 3.34,
    "e75_isotonic_calibration": 2.46,
    "j107_ktruss_peel": 6.54,
    "j121_mmr_rerank": 4.48,
    "b17_lwt_cas_replay": 3.70,
    "j131_semdedup": 0.82,
    "j127_ngram_decontamination": 1.42,
    # round-11 additions (VERDICT r10 item 7): isolated 5-run medians
    # after a 3-run JIT deep-warm, idle box, 2026-08-16 (shallow-warm
    # sessions read 2.5/1.2 with monotonically falling runs — still
    # JIT-dominated; the deep-warm medians match in-sweep conditions:
    # 0.53/0.63 in the same day's 38-query sweep).
    "e127_brunner_munzel": 0.85,
    "f59_dfa_alpha": 0.88,
}

# Sub-second queries wobble ±100-200 ms on a shared box regardless of plan
# shape; a ratio test alone would flag 0.17 s -> 0.27 s as a "regression".
# A query only fails if it exceeds BOTH the ratio bar and this absolute
# slack over its baseline.
ABS_SLACK_SEC = 0.25

# The ratio bar (ADVICE r10 item 2: single source of truth — bench.py's
# contention re-check imports this instead of hardcoding its own copy;
# the CLI's --threshold flag still overrides per invocation).
THRESHOLD = 1.5


def _extract_bench(raw: str) -> dict:
    """Accept bench.py's own one-line JSON (possibly preceded by Spark log
    lines) or the driver's BENCH_r{N}.json wrapper, whose "tail" field
    carries the bench stdout."""
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and "tail" in doc:
            raw = doc["tail"]
    except json.JSONDecodeError:
        pass
    for ln in reversed(raw.replace("\r", "\n").splitlines()):
        ln = ln.strip()
        if ln.startswith("{") and '"queries"' in ln:
            return json.loads(ln)
    raise SystemExit("bench_guard: no bench JSON line with a 'queries' field found")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = THRESHOLD
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

    src = args[0] if args else "-"
    raw = sys.stdin.read() if src == "-" else open(src).read()
    bench = _extract_bench(raw)
    timings: dict[str, float] = bench["queries"]

    failures, new = [], []
    for name, sec in timings.items():
        base = BASELINE_MEDIANS.get(name)
        if base is None:
            new.append(name)
            continue
        ratio = sec / base
        verdict = "OK"
        if ratio > threshold and sec - base > ABS_SLACK_SEC:
            verdict = "REGRESSION"
            failures.append(name)
        print(f"[{verdict:>10}] {name}: {sec:.3f}s vs baseline {base:.2f}s ({ratio:.2f}x)")
    for name in new:
        print(f"[       NEW] {name}: {timings[name]:.3f}s — no baseline row yet")
    missing = sorted(set(BASELINE_MEDIANS) - set(timings))
    for name in missing:
        print(f"[   MISSING] {name}: in baseline but absent from bench output")

    total = sum(timings.values())
    print(f"\ntotal {total:.3f}s over {len(timings)} queries; "
          f"{len(failures)} regression(s), threshold {threshold}x + {ABS_SLACK_SEC}s slack")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
