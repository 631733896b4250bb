"""Oracle-differential tests (SURVEY §5.1) — the primary correctness gate.

Mirrors the driver's t2 check locally: every registered query with an oracle
must match DuckDB on row count, column names, and the order-insensitive
value multiset at sf0.001.  Rows-only queries must at least execute and
return a stable schema.
"""

from __future__ import annotations

import pytest

from cassandra_snap_to_hadoop_spark.oracle import check_query, duck_connection
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
ALL = sorted(REGISTRY)

# r12 (VERDICT r11 item 1): the 525-query parametrized parity sweep is the
# single biggest block of the default suite and exactly duplicates both
# the driver's own oracle gate and the standalone CLI
# (``python -m cassandra_snap_to_hadoop_spark.oracle``).  The full sweep
# moves behind the ``planfull`` marker (run:  pytest tests/ -m planfull);
# the default run keeps the driver-visible bench HEADLINE tier plus the
# entry-contract smoke, so a headline correctness regression still fails
# the default gate.


def _headline_names() -> list[str]:
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("cs2h_bench_for_parity", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return sorted(set(mod.HEADLINE))


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", _headline_names())
def test_query_parity(spark, sf_dir, duck, name):
    res = check_query(spark, name, sf_dir, duck)
    assert res.ok, str(res)


@pytest.mark.planfull
@pytest.mark.parametrize("name", ALL)
def test_query_parity_full(spark, sf_dir, duck, name):
    res = check_query(spark, name, sf_dir, duck)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "order_year", "revenue"}


def test_contract_shape():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 80
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
