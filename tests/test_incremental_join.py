"""Incremental JOIN-aggregate maintenance: the delta-propagation identity
must reproduce the full recompute exactly, batch by batch."""

import os

import pytest
from pyspark.sql import functions as F

from polars_ad_etl_spark.sinks.incremental import (
    join_agg_delta,
    read_incremental_agg,
    write_agg_delta,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    return orders, lineitem


def _full_view(orders, lineitem):
    return (
        orders.join(lineitem, "o_orderkey")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_l_extendedprice"),
        )
    )


def test_join_ivm_equals_full_recompute(spark, tables, tmp_path):
    """Split both bases at a cutoff date, apply the second half as one
    delta batch, and assert the delta-log view equals the full recompute
    over everything — counts and exact-decimal sums."""
    orders, lineitem = tables
    cut = F.lit("1995-01-01").cast("timestamp_ntz")
    o_old, o_delta = (
        orders.filter(F.col("o_orderdate") < cut),
        orders.filter(F.col("o_orderdate") >= cut),
    )
    l_old, l_delta = (
        lineitem.filter(F.col("l_shipdate") < cut),
        lineitem.filter(F.col("l_shipdate") >= cut),
    )

    store = tmp_path / "view"
    base = _full_view(o_old, l_old)
    write_agg_delta(base, store, batch_id=0)
    delta = join_agg_delta(
        o_old, o_delta, l_old, l_delta,
        on="o_orderkey",
        key_cols=["o_custkey"],
        value_col="l_extendedprice",
    )
    write_agg_delta(delta, store, batch_id=1)

    maintained = {
        r.o_custkey: (r.cnt, r.sum_l_extendedprice)
        for r in read_incremental_agg(
            spark, store, ["o_custkey"]
        ).collect()
    }
    full = {
        r.o_custkey: (r.cnt, r.sum_l_extendedprice)
        for r in _full_view(orders, lineitem).collect()
    }
    assert maintained == full
    # the split must be non-trivial on both sides for the test to mean much
    assert o_delta.count() > 0 and l_delta.count() > 0


def test_join_ivm_empty_delta_is_noop(spark, tables):
    orders, lineitem = tables
    empty_o = orders.limit(0)
    empty_l = lineitem.limit(0)
    d = join_agg_delta(
        orders, empty_o, lineitem, empty_l,
        on="o_orderkey",
        key_cols=["o_custkey"],
        value_col="l_extendedprice",
    )
    assert d.count() == 0
