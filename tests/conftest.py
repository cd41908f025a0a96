"""Shared pytest fixtures: one SparkSession per test session, DuckDB
oracle connection with the testdata views pre-registered (mirroring the
driver's harness)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# transformWithStateInPandas' state-server protocol needs google.protobuf
# in BOTH the driver and the Spark python workers. When the real package
# is absent, fall back to the vendored minimal runtime (vendor/google/
# protobuf — wire-format subset, validated against the JVM by
# tests/test_stateful.py). PYTHONPATH must carry it before the first
# SparkSession launches the JVM so worker processes inherit it; an
# installed protobuf always wins because the vendor dir is only added
# when the import fails.
try:
    import google.protobuf  # noqa: F401
except ImportError:
    _VENDOR = os.path.join(_REPO, "vendor")
    sys.path.insert(0, _VENDOR)
    os.environ["PYTHONPATH"] = (
        _VENDOR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

from aliyun_emapreduce_datasources_spark.registry import TABLES
from aliyun_emapreduce_datasources_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
