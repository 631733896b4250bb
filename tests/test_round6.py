"""Round-6 additions: exact mask-histogram source overlap (e24's exact
twin) and the round-6 certified-twin conversions' cross-tier pins."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.operators.text import tokens
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def _shingle_sets(spark, sf_dir) -> dict[str, set]:
    """Independent per-source 3-gram sets, assembled in plain Python from
    the exploded relation — the third implementation every Spark/DuckDB
    pair is pinned against."""
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
    return sets


def test_e24_incl_excl_exact_against_python_sets(spark, sf_dir):
    """The mask-histogram formulation must reproduce |A|, |B|, |A∪B| and
    |A∩B| EXACTLY for every source pair — set algebra in plain Python is
    the pin."""
    out = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["e24_overlap_incl_excl"].fn(spark, sf_dir).collect()
    }
    sets = _shingle_sets(spark, sf_dir)
    assert set(out) == {(x, y) for x, y in combinations(sorted(sets), 2)}
    for (sa, sb), r in out.items():
        assert r.n_a == len(sets[sa]), (sa, sb)
        assert r.n_b == len(sets[sb]), (sa, sb)
        assert r.n_union == len(sets[sa] | sets[sb]), (sa, sb)
        assert r.n_inter == len(sets[sa] & sets[sb]), (sa, sb)


def test_e24_sketch_tier_pinned_to_exact_twin(spark, sf_dir):
    """The HLL tier's inclusion-exclusion estimates must land within
    sketch tolerance of the EXACT twin's values — the triage contract:
    the sketch points at the pairs the exact tier then settles."""
    exact = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["e24_overlap_incl_excl"].fn(spark, sf_dir).collect()
    }
    est = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["e24_hll_overlap"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for key, e in exact.items():
        s = est[key]
        tol_union = 0.05 * e.n_union + 20
        assert abs(s.est_union - e.n_union) <= tol_union, (key, s, e)
        assert abs(s.est_inter - e.n_inter) <= 0.06 * e.n_union + 50, (key, s, e)


def test_e24_mask_histogram_mass_conserves(spark, sf_dir):
    """Σ mask-histogram counts == number of distinct shingles in the
    corpus — the histogram is a lossless partition of the shingle space
    (the property that makes every pair readable from one KB relation)."""
    d = Tables(spark, sf_dir).documents
    w = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.array_join(F.slice(w, i, 3), " "),
    )
    n_distinct = (
        d.filter(F.size(w) >= 3)
        .select(F.explode(shingles).alias("s"))
        .distinct()
        .count()
    )
    out = REGISTRY["e24_overlap_incl_excl"].fn(spark, sf_dir)
    # any single source's n_a counts only masks containing it; the union
    # over ALL sources of "mask touches source" is every mask, so check
    # via a two-source union + the complement identity instead: total
    # distinct shingles equals n_union + (shingles in neither source),
    # recomputed from the python sets.
    sets = _shingle_sets(spark, sf_dir)
    allsh = set().union(*sets.values())
    assert len(allsh) == n_distinct
    first = out.limit(1).collect()[0]
    neither = len(allsh - (sets[first.src_a] | sets[first.src_b]))
    assert first.n_union + neither == n_distinct


def test_e21_certified_matches_native_sketch_law(spark, sf_dir):
    """Cross-tier CMS pin: the relational md5-CMS estimates and the native
    binary sketch estimates both over-estimate the same exact counts, and
    both respect their width's eps bound — the two tiers implement the
    same sketch with different hash families."""
    import math

    from cassandra_snap_to_hadoop_spark.io import load
    from cassandra_snap_to_hadoop_spark.operators.sketch import CountMinSketch
    from cassandra_snap_to_hadoop_spark.queries.round3b import _CMS_WIDTH

    rows = REGISTRY["e21_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    raw = ev.agg(
        F.count_min_sketch("user_id", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).collect()[0]
    sk = CountMinSketch.parse(bytes(raw.s))
    for r in rows:
        native = sk.estimate_long(r.user_id)
        assert r.cms_est >= r.exact_n
        assert native >= r.exact_n
        assert r.cms_est - r.exact_n <= math.e / _CMS_WIDTH * r.total_events
        assert native - r.exact_n <= 0.001 * sk.total_count


# ------------------------------------------------- large-star/small-star CC


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _union_find_min(n: int, edges: set) -> dict:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n)}


def test_two_phase_cc_equals_union_find_on_random_graphs(spark):
    """dup_clusters_two_phase (large-star/small-star) must equal exact
    union-find on the same deterministic random graphs the hash-min tier
    is pinned on — the two strategies are interchangeable."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import dup_clusters_two_phase

    for seed, n, m in ((1, 40, 30), (2, 60, 80), (3, 25, 5)):
        edges = set()
        i = 0
        while len(edges) < m:
            a = _h60(f"{seed}:a:{i}") % n
            b = _h60(f"{seed}:b:{i}") % n
            i += 1
            if a == b:
                continue
            edges.add((min(a, b), max(a, b)))
        want = _union_find_min(n, edges)
        nodes = spark.createDataFrame([(v,) for v in range(n)], "id long")
        pairs = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "id_a long, id_b long"
        )
        got = {
            r.id: r.cluster_id
            for r in dup_clusters_two_phase(nodes, pairs, max_iterations=20).collect()
        }
        assert got == want, f"seed={seed}"


def test_two_phase_cc_beats_hashmin_rounds_on_paths(spark):
    """The round-count win the dup_clusters docstring promises: on a path
    graph (worst-case diameter), hash-min pays ~one round per hop while
    large-star/small-star collapses in O(log n) rounds — both reaching
    the identical min-rooted labeling."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        dup_clusters,
        dup_clusters_two_phase,
    )

    n = 24  # path 0-1-2-...-23: diameter 23
    edges = {(v, v + 1) for v in range(n - 1)}
    nodes = spark.createDataFrame([(v,) for v in range(n)], "id long")
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    s_hm: dict = {}
    hm = {
        r.id: r.cluster_id
        for r in dup_clusters(nodes, pairs, max_iterations=40, stats=s_hm).collect()
    }
    s_tp: dict = {}
    tp = {
        r.id: r.cluster_id
        for r in dup_clusters_two_phase(
            nodes, pairs, max_iterations=40, stats=s_tp
        ).collect()
    }
    want = {v: 0 for v in range(n)}
    assert hm == want and tp == want
    # hash-min needs ~diameter rounds (+1 to observe convergence);
    # two-phase needs O(log n) (+1 to observe the fixpoint).
    assert s_hm["rounds"] >= n - 2, s_hm
    assert s_tp["rounds"] <= 8, s_tp
    assert s_tp["rounds"] < s_hm["rounds"] // 2, (s_tp, s_hm)
