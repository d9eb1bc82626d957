"""Pins for the verbatim-SQL LSH front door (operators/sql_api.py,
round-10 widening: the similarity/LSH family's SQL surface).

The whole point of the sql_api family is ONE text through both engines, so
these pins protect the two places that could silently fork dialects: the
position()-based hex parse standing in for the Spark-only conv(), and the
band self-join plan (must block on the band key, never cartesian).
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.hashing import portable_hash32
from polars_ad_etl_spark.operators import QUERIES
from polars_ad_etl_spark.operators.sql_api import _hex32_verbatim

SF = "/root/testdata/sf0.001"


def test_hexparse_matches_portable_hash32(spark):
    # The shared text cannot use conv() (Spark-only), so it parses the
    # first 8 md5 hex chars with position() arithmetic. Must equal
    # portable_hash32 bit-for-bit in BOTH engines, or every signature
    # downstream silently diverges.
    tokens = ["", "a", "tok", "한국어", "x" * 100, "\U0001f600"]
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    got = (
        df.select(
            portable_hash32(F.col("tok")).alias("want"),
            F.expr(_hex32_verbatim("md5(tok)")).alias("got"),
        )
        .collect()
    )
    assert all(r.want == r.got for r in got)
    con = duckdb.connect()
    for t in tokens:
        (duck,) = con.execute(
            f"SELECT {_hex32_verbatim('md5(?)')}", [t] * 8
        ).fetchone()
        (spark_val,) = (
            spark.createDataFrame([(t,)], "tok string")
            .select(portable_hash32(F.col("tok")))
            .first()
        )
        assert duck == spark_val, t


def test_lsh_pairs_plan_blocks_on_band_key(spark):
    # The band self-join must be an equi-join on (band, bkey) — a
    # cartesian here would be the all-pairs scan the LSH exists to avoid.
    # The ONLY nested-loop joins allowed are the token-sampling fan-outs:
    # documents x range(1,17), a 16-row broadcast build side (bounded
    # fan-out is the sampling design, not a scale hazard).
    plan = (
        QUERIES["sql_api_lsh_pairs"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin [band" in plan or "ShuffledHashJoin [band" in plan
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_range_scans = plan.count("Range (1, 17")
    assert n_bnlj <= n_range_scans


def test_lsh_topk_is_bounded_per_query(spark):
    rows = QUERIES["sql_api_lsh_topk"](spark, SF).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert 0 <= r.n_agree <= 8
        assert r.query_id < 8
    for q, rs in per_q.items():
        assert len(rs) <= 10
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
