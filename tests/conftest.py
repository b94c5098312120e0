"""Shared fixtures: one SparkSession + one DuckDB oracle connection
per test session, plus the canonical compare helper (same comparison
the driver's t2 gate and tools/check.py use)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from hive_to_es_spark.session import get_spark

    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    from tools.check import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_parity(spark_df, duck_df) -> None:
    """Row-count + column + exact-canonical-value equality."""
    from tools.check import compare

    errs = compare("test", spark_df, duck_df)
    assert not errs, errs
