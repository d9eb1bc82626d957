"""Differential oracle tests (SURVEY §5.2-4): every registered query with an
oracle must match DuckDB exactly at sf0.001 — a local pre-flight of the
driver's CORRECTNESS gate."""

import os

import pytest

from polars_ad_etl_spark.operators import ORACLES, QUERIES

from tests.oracle_util import compare, duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "registry is empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    diff = compare(QUERIES[name](spark, SF_DIR), con, ORACLES[name])
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    # queries without an oracle still must execute and return a stable schema
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
