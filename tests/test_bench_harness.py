"""Bench-harness contracts: the headline set must stay runnable and
guarded (every entry registered, every entry with a BASELINE.md median
wired into the guard), and the contention re-run mechanism (VERDICT r9
item 7) must flag exactly the queries the guard would fail."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, REPO / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load("bench_mod", "bench.py")
guard = _load("bench_guard_mod", "tools/bench_guard.py")


def test_headline_queries_are_registered():
    from cassandra_snap_to_hadoop_spark.registry import load_all

    reg = load_all()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"HEADLINE entries not in registry: {missing}"


def test_every_headline_query_has_a_guard_baseline():
    """A headline entry without a BASELINE_MEDIANS row is invisible to
    the guard AND to bench.py's re-run mechanism — the round-9 pattern
    was to add the isolated 5-run median in the same commit that adds
    the headline entry."""
    missing = [n for n in bench.HEADLINE if n not in guard.BASELINE_MEDIANS]
    assert not missing, f"headline entries without a baseline median: {missing}"


def test_guard_limits_single_source_of_truth():
    baselines, abs_slack, threshold = bench._guard_limits()
    assert baselines == guard.BASELINE_MEDIANS
    assert abs_slack == guard.ABS_SLACK_SEC
    assert threshold == 1.5


def test_rerun_flag_predicate_matches_guard_rule():
    """bench.py re-runs exactly the queries the guard would call a
    regression: over the ratio bar AND over the absolute slack."""
    baselines, abs_slack, threshold = bench._guard_limits()
    name = next(iter(baselines))
    base = baselines[name]

    def flagged(sec: float) -> bool:
        return sec / base > threshold and sec - base > abs_slack

    assert not flagged(base)  # at baseline: never
    assert not flagged(base * threshold)  # exactly at the ratio bar: no
    # over the ratio bar but inside absolute slack: no (sub-second wobble)
    if base * (threshold - 1) < abs_slack:
        assert not flagged(base * threshold + 0.001)
    assert flagged(base * threshold + abs_slack + 0.001)  # over both: yes
