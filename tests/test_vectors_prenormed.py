"""Bit-equality pins for the round-12 vector-math optimization.

The optimization replaced per-PAIR ``cosine(a, b)`` (which recomputes both
norms inside the pair projection) with ``cosine_prenormed(a, b, na, nb)``
where the norms are computed once per VECTOR in the side projections. The
arithmetic tree ``dot / (na * nb)`` is unchanged, so the result must be
BIT-equal — not just close — for the oracle hashes to stay stable. These
tests pin that, including NULL/short/long/empty-array edge shapes, and pin
that string operands parse to the same expression as Column operands.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.vectors import (
    cosine,
    cosine_prenormed,
    dot,
    hyperplane_signs,
    norm,
    signed_projection,
)

ROWS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),            # plain
    ([0.25, -7.5, 1e-3], [3.125, 0.1, -2.0]),      # non-representable in fewer bits
    ([1.0, 2.0], [1.0, 2.0, 3.0]),                 # mismatched lengths
    (None, [1.0, 2.0, 3.0]),                        # null array
    ([1.0, None, 3.0], [1.0, 2.0, 3.0]),            # null element
    # NOTE: no zero-norm (all-zero or empty-array) rows — under ANSI mode
    # both the plain and prenormed cosine raise DIVIDE_BY_ZERO identically;
    # the embeddings contract (non-degenerate vectors) guarantees the
    # queries never hit it.
]


def _frame(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(ROWS)],
        "id int, a array<float>, b array<float>",
    )


def test_cosine_prenormed_bit_equal(spark):
    df = _frame(spark).select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("plain"),
        "a",
        "b",
        norm("a").alias("na"),
        norm("b").alias("nb"),
    )
    out = df.select(
        "id",
        "plain",
        cosine_prenormed(F.col("a"), F.col("b"), F.col("na"), F.col("nb")).alias(
            "pre"
        ),
    ).collect()
    assert len(out) == len(ROWS)
    for r in out:
        if r.plain is None:
            assert r.pre is None, r
        elif math.isnan(r.plain):
            assert math.isnan(r.pre), r
        else:
            # bit equality, not approx
            assert r.plain.hex() == r.pre.hex(), r


def test_string_operands_match_columns(spark):
    df = _frame(spark)
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("col_dot"),
        dot("a", "b").alias("str_dot"),
        norm(F.col("a")).alias("col_norm"),
        norm("a").alias("str_norm"),
    ).collect()
    for r in out:
        assert (r.col_dot is None) == (r.str_dot is None)
        assert (r.col_norm is None) == (r.str_norm is None)
        if r.col_dot is not None:
            assert r.col_dot.hex() == r.str_dot.hex()
        if r.col_norm is not None and not math.isnan(r.col_norm):
            assert r.col_norm.hex() == r.str_norm.hex()


def test_signed_projection_string_matches_column(spark):
    signs = hyperplane_signs(3, 3)
    df = _frame(spark)
    out = df.select(
        signed_projection(F.col("a"), signs).alias("col_p"),
        signed_projection("a", signs).alias("str_p"),
    ).collect()
    for r in out:
        assert (r.col_p is None) == (r.str_p is None)
        if r.col_p is not None:
            assert r.col_p.hex() == r.str_p.hex()


@pytest.mark.parametrize("qname", ["sim_bruteforce_topk"])
def test_prenormed_query_matches_oracle_sf001(spark, qname):
    """End-to-end: the rewritten scoring still matches the DuckDB oracle
    on the tiny SF (the full sweep covers every SF/config)."""
    from oracle_util import compare, duckdb_conn

    from polars_ad_etl_spark.operators import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb_conn(sf)
    diff = compare(QUERIES[qname](spark, sf), con, ORACLES[qname])
    assert diff is None, diff


def test_bucket_sql_matches_column_construction(spark):
    """The single-F.expr SQL construction of the sign-LSH bucket ids must
    produce exactly the rows the Column-API construction produces (the SQL
    text exists only to cut py4j round-trips, never to change the tree)."""
    from polars_ad_etl_spark.operators.similarity import (
        _CURVE_MAX_T,
        _bucket_expr,
        _curve_bucket_expr,
        _mt_bucket_expr,
        MT_TABLES,
    )
    from polars_ad_etl_spark.sources.star import load_embeddings

    e = load_embeddings(spark, "/root/testdata/sf0.001")
    checks = [
        (_bucket_expr("embedding"), _bucket_expr(F.col("embedding"))),
        (_mt_bucket_expr("embedding", 0), _mt_bucket_expr(F.col("embedding"), 0)),
        (
            _mt_bucket_expr("embedding", MT_TABLES - 1),
            _mt_bucket_expr(F.col("embedding"), MT_TABLES - 1),
        ),
        (
            _curve_bucket_expr("embedding", _CURVE_MAX_T - 1),
            _curve_bucket_expr(F.col("embedding"), _CURVE_MAX_T - 1),
        ),
    ]
    sel = e.select(
        *[
            (a.alias(f"s{i}"), b.alias(f"c{i}"))[j]
            for i, (a, b) in enumerate(checks)
            for j in (0, 1)
        ]
    )
    bad = sel.filter(
        " OR ".join(f"s{i} IS DISTINCT FROM c{i}" for i in range(len(checks)))
    ).count()
    assert bad == 0
