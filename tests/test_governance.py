"""Semantic checks for the corpus-governance queries (oracle parity covers
value equality; these pin the *meaning* of the outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def test_j27_histogram_reconciles(spark, sf_dir):
    """Injected structure: decades with base doc present get a 3-cluster;
    histogram totals must cover the whole corpus and removable = docs-groups."""
    rows = REGISTRY["j27_dup_size_histogram"].fn(spark, sf_dir).collect()
    from cassandra_snap_to_hadoop_spark.io import Tables

    # The inner join drops docs whose decade base id is absent; reconcile
    # against the joined row count, not raw corpus size.
    d = Tables(spark, sf_dir).documents
    ids = {r[0] for r in d.select("doc_id").collect()}
    joined = sum(1 for i in ids if (i - i % 10) in ids)
    assert sum(r["n_docs"] for r in rows) == joined
    for r in rows:
        assert r["n_docs"] == r["group_size"] * r["n_groups"]
        assert r["n_removable"] == (r["group_size"] - 1) * r["n_groups"]
    sizes = {r["group_size"] for r in rows}
    assert 3 in sizes  # the planted clusters


def test_j28_blocklist_marks_expected_domains(spark, sf_dir):
    rows = REGISTRY["j28_domain_stats"].fn(spark, sf_dir).collect()
    for r in rows:
        site = int(r["domain"].removeprefix("site").split(".")[0])
        assert r["blocklisted"] == (1 if site % 7 == 0 else 0)
    assert sum(r["n_docs"] for r in rows) > 0


def test_j29_banner_is_dropped_exactly_once_per_injected_doc(spark, sf_dir):
    """Docs with the injected banner lose exactly their first line; others
    keep everything."""
    out = {r["doc_id"]: r for r in REGISTRY["j29_line_dedup"].fn(spark, sf_dir).collect()}
    for doc_id, r in out.items():
        if doc_id % 3 != 0:
            assert r["n_kept"] == r["n_lines"] - 1, r
        else:
            assert r["n_kept"] == r["n_lines"], r


def test_j26_overlap_is_symmetric_and_bounded(spark, sf_dir):
    rows = REGISTRY["j26_source_overlap"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert (r["src_a"], r["src_b"]) not in seen
        seen.add((r["src_a"], r["src_b"]))
        assert 0 < r["n_shared"] <= min(r["sz_a"], r["sz_b"])
        assert 0.0 < r["jaccard"] <= 1.0
