"""The reference's own pipeline semantics (detect -> conform -> strict-cast ->
union), exercised through the oracle harness on the driver's tables.

Two heterogeneous "sources" (orders-shaped and lineitem-shaped) are conformed
to one standard schema exactly the way the ad pipelines conform Meta/TikTok/X
exports: rename maps, typed-null fill for missing columns (P4), projection to
schema order (P5), strict cast (P6), then schema-aligned union (U1). The
oracle states the same program as ANSI SQL, proving the engine's conform+union
semantics equal a plain UNION ALL of casted selects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet
from polars_ad_etl_spark.plans import MultiSourceAdETL, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, Int64, String


def _config() -> PipelineConfig:
    return PipelineConfig(
        rename_config={
            "A": {"o_orderkey": "Key", "o_totalprice": "Amount", "o_orderdate": "Day"},
            "B": {"l_orderkey": "Key", "l_extendedprice": "Amount"},
        },
        standard_schema={
            "Source": String,
            "Key": Int64,
            "Amount": Float64,
            "Day": Date,
        },
        source_config={"A": ["o_orderkey"], "B": ["l_orderkey"]},
        cleaner_config={},
        capitalize=False,
    )


@register(
    "etl_conform_union",
    oracle="""
    SELECT 'A' AS Source, o_orderkey AS Key,
           CAST(o_totalprice AS DOUBLE) AS Amount,
           CAST(o_orderdate AS DATE) AS Day
    FROM orders
    UNION ALL
    SELECT 'B' AS Source, l_orderkey AS Key,
           CAST(l_extendedprice AS DOUBLE) AS Amount,
           CAST(NULL AS DATE) AS Day
    FROM lineitem
    """,
)
def etl_conform_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    etl = MultiSourceAdETL(spark, _config()).with_frames(
        [(None, orders), (None, lineitem)]
    )
    return (
        etl.assign_source().clean_dataframes().standardize_dataframes().merge()
    )
