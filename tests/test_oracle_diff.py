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


def test_every_query_has_an_oracle():
    """Every registry query carries a DuckDB oracle — including the
    approximate-sketch entry, whose oracle is a tolerance gate (within-bound
    booleans over exact anchors) since sketch internals are engine-specific.
    k-means regained an oracle in round 2 via fixed-iteration integer Lloyd;
    approx_stats_orders regained one in round 6 via the tolerance gate."""
    assert set(QUERIES) - set(ORACLES) == set()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    diff = compare(QUERIES[name](spark, SF_DIR), con, ORACLES[name])
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_has_no_hugeint_columns(con, name):
    """Guard for the round-1 q12 defect class: DuckDB types SUM(INTEGER) as
    HUGEINT, which hash-mismatches Spark's bigint in the driver's
    type-sensitive compare even when every value is identical. The local
    normalizer coerces ints to Int64 and would mask it — so assert at the
    *plan* level (relation type resolution, no execution) that no oracle
    produces a HUGEINT/UHUGEINT column. Fix pattern: CAST(SUM(...) AS BIGINT).
    """
    rel = con.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: oracle columns typed HUGEINT (driver hash will mismatch "
        f"Spark bigint): {bad} — wrap in CAST(... AS BIGINT)"
    )


def test_rows_only_queries_run(spark):
    # queries without an oracle (none today; the hook stays for genuinely
    # non-SQL-expressible future ops) still must execute with a stable schema
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns
        assert df.count() >= 0


def test_approx_sketches_within_error_bounds(spark, con):
    """The raw sketch surface (engine-specific values, not registry-hashable)
    still gets a numeric accuracy gate: every HLL distinct estimate within
    10% of the exact count (default rsd 5%), every approximate median within
    5% of the exact interpolated median. The driver-checked twins are
    ``approx_stats_orders`` (tolerance-gated) and
    ``approx_stats_error_bounds``; this is the local numeric version."""
    from polars_ad_etl_spark.operators.relational2 import approx_sketch_stats

    approx = {
        r["l_returnflag"]: r
        for r in approx_sketch_stats(spark, SF_DIR).collect()
    }
    exact = {
        r[0]: r
        for r in con.execute(
            f"""
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_suppkey),
                   quantile_cont(l_extendedprice, 0.5)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        _, parts, supps, med = exact[flag]
        assert abs(a["approx_parts"] - parts) <= 0.10 * parts, flag
        assert abs(a["approx_suppliers"] - supps) <= 0.10 * supps, flag
        assert abs(a["approx_median_price"] - med) <= 0.05 * med, flag
