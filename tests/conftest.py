from __future__ import annotations

import pytest

from cassandra_snap_to_hadoop_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _tables_class_unpolluted():
    """Fail AT the offending test if anything leaves a table-name class
    attribute on io.Tables: table access goes through __getattr__, so a
    leaked class attribute (e.g. a botched patch restore writing back
    ``Tables.__dict__.get(name)`` == None) silently shadows it and every
    later events/orders/... load returns the leaked object instead."""
    yield
    from cassandra_snap_to_hadoop_spark.io import TABLES, Tables

    leaked = [n for n in TABLES if n in Tables.__dict__]
    assert not leaked, f"io.Tables class polluted with attributes: {leaked}"
