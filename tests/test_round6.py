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
