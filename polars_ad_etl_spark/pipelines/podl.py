"""PODL daily pipeline — Meta + TikTok video-funnel metrics, 24-column
standard schema with an always-null ``Website URL`` column (declared in the
schema but mapped by no source — exercises typed-null fill, P4). Config data
reproduces the reference pipeline (``scripts/podl_daily.py:26-102``). TikTok
ad names ending in ``.mp4`` keep the suffix here (the reference registers only
the Total-row cleaner for podl)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.functions.cleaners import remove_tiktok_total_row
from polars_ad_etl_spark.plans import MultiSourceAdETL, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, Int64, String

_META = {
    "Day": "Day",
    "Campaign name": "Campaign name",
    "Ad Set Name": "Ad Set Name",
    "Ad name": "Ad name",
    "Gender": "Gender",
    "Age": "Age",
    "Amount spent (USD)": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Unique outbound clicks": "Unique outbound clicks",
    "Link clicks": "Link clicks",
    "Video plays": "Video plays",
    "Video plays at 25%": "Video plays at 25%",
    "Video plays at 50%": "Video plays at 50%",
    "Video plays at 75%": "Video plays at 75%",
    "Video plays at 100%": "Video plays at 100%",
    "Adds to cart": "Adds to cart",
    "Checkouts Initiated": "Checkouts Initiated",
    "Purchases": "Purchases",
    "Purchases conversion value": "Purchases conversion value",
}

_TIKTOK = {
    "By Day": "Day",
    "Campaign name": "Campaign name",
    "Ad group name": "Ad Set Name",
    "Ad name": "Ad name",
    "Cost": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Clicks (destination)": "Link clicks",
    "Video views": "Video plays",
    "Video views at 25%": "Video plays at 25%",
    "Video views at 50%": "Video plays at 50%",
    "Video views at 75%": "Video plays at 75%",
    "Video views at 100%": "Video plays at 100%",
    "Adds to cart (website)": "Adds to cart",
    "Checkouts initiated (website)": "Checkouts Initiated",
    "Purchases (website)": "Purchases",
    "Purchase value (website)": "Purchases conversion value",
}


def config() -> PipelineConfig:
    return PipelineConfig(
        rename_config={"Meta": _META, "TikTok": _TIKTOK},
        standard_schema={
            "Source": String,
            "Day": Date,
            "Campaign name": String,
            "Ad Set Name": String,
            "Ad name": String,
            "Gender": String,
            "Age": String,
            "Website URL": String,
            "Amount spent (USD)": Float64,
            "Impressions": Int64,
            "Frequency": Float64,
            "Reach": Int64,
            "Unique outbound clicks": Int64,
            "Link clicks": Int64,
            "Video plays": Int64,
            "Video plays at 25%": Int64,
            "Video plays at 50%": Int64,
            "Video plays at 75%": Int64,
            "Video plays at 100%": Int64,
            "Adds to cart": Int64,
            "Checkouts Initiated": Int64,
            "Purchases": Int64,
            "Purchases conversion value": Float64,
        },
        source_config={
            "Meta": ["Day", "Gender"],
            "TikTok": ["Cost", "Clicks (destination)"],
        },
        cleaner_config={"TikTok": remove_tiktok_total_row},
        capitalize=False,
    )


def run(spark: SparkSession, raw_dir: str | Path) -> DataFrame:
    return MultiSourceAdETL(spark, config()).run(raw_dir)
