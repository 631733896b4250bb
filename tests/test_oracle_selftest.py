"""Mutation self-test of the oracle parity gate (oracle.py).

The mirror is the engine's primary correctness evidence; a regression in
``check_query`` that silently passes everything would green 248 queries
while proving nothing.  Each test here feeds the compare a deliberately
broken pairing and asserts it FAILS with the right issue class — plus the
float-normalization boundary (9 significant digits) from both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.oracle import _norm_cell, check_query
from cassandra_snap_to_hadoop_spark.registry import REGISTRY, Query, register


@pytest.fixture()
def inject():
    """Register a throwaway query for the duration of one test."""
    added: list[str] = []

    def _add(name: str, fn, oracle: str) -> None:
        register(name, oracle=oracle)(fn)
        added.append(name)

    yield _add
    for n in added:
        REGISTRY.pop(n, None)


def _nation_count(spark, sf_dir):
    from cassandra_snap_to_hadoop_spark.io import Tables

    return Tables(spark, sf_dir).nation.agg(F.count("*").cast("long").alias("n"))


def test_value_mutation_fails(spark, sf_dir, inject):
    inject("selftest_value", _nation_count, "SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n FROM nation")
    res = check_query(spark, "selftest_value", sf_dir)
    assert not res.ok and any("rows differ" in i for i in res.issues), res


def test_rowcount_mutation_fails(spark, sf_dir, inject):
    def two_rows(spark_, sf_dir_):
        df = _nation_count(spark_, sf_dir_)
        return df.union(df)

    inject("selftest_rowcount", two_rows, "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation")
    res = check_query(spark, "selftest_rowcount", sf_dir)
    assert not res.ok and any("row count" in i for i in res.issues), res


def test_column_name_mutation_fails(spark, sf_dir, inject):
    inject("selftest_colname", _nation_count, "SELECT CAST(COUNT(*) AS BIGINT) AS wrong FROM nation")
    res = check_query(spark, "selftest_colname", sf_dir)
    assert not res.ok and any("columns" in i for i in res.issues), res


def test_hugeint_type_gate_fires(spark, sf_dir, inject):
    # SUM(BIGINT) silently widens to HUGEINT in DuckDB — the gate must
    # reject the TYPE even though fetchall() values would compare equal.
    def sum_key(spark_, sf_dir_):
        from cassandra_snap_to_hadoop_spark.io import Tables

        return Tables(spark_, sf_dir_).nation.agg(
            F.sum("n_nationkey").cast("long").alias("s")
        )

    inject("selftest_hugeint", sum_key, "SELECT SUM(n_nationkey) AS s FROM nation")
    res = check_query(spark, "selftest_hugeint", sf_dir)
    assert not res.ok and any("HUGEINT" in i for i in res.issues), res


def test_int_float_type_signature_fails(spark, sf_dir, inject):
    # Python's 5 == 5.0 would hide int-vs-double divergence; the cell
    # type-signature check must catch it before value compare.
    inject(
        "selftest_intfloat",
        _nation_count,
        "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nation",
    )
    res = check_query(spark, "selftest_intfloat", sf_dir)
    assert not res.ok and any("type mismatch" in i for i in res.issues), res


def test_float_normalization_boundary():
    # Engines agreeing to 9 significant digits compare equal; a defect in
    # the 8th significant digit does not.
    assert _norm_cell(1.23456789012345) == _norm_cell(1.23456789098765)
    assert _norm_cell(1.2345678) != _norm_cell(1.2345679)
    assert _norm_cell(0.0) == _norm_cell(-0.0)  # signed-zero canonicalization
