"""APSL internal pipeline — five ad sources (Meta, Meta_OLIVE, Meta_Lead,
X/Twitter, TikTok) conformed to a 17-column standard schema.

Config data reproduces the reference pipeline's declared mappings, schema,
fingerprints, and cleaners (``scripts/apsl_internal.py:25-136``) so outputs
are drop-in identical. Headers are capitalized before detection
(``apsl_internal.py:148``). Note the Meta_Lead fingerprint includes
``"Leads conversion value"`` which no mapping consumes — legal: fingerprints
only need to be subsets of file columns (SURVEY §2.12).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.functions.cleaners import (
    clean_x_avg_frequency,
    remove_tiktok_total_row,
)
from polars_ad_etl_spark.plans import MultiSourceAdETL, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, Int64, String

_META = {
    "Day": "Day",
    "Account name": "Account name",
    "Campaign name": "Campaign name",
    "Ad set name": "Ad set name",
    "Ad name": "Ad name",
    "Amount spent (usd)": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Reach": "Reach",
    "Frequency": "Frequency",
    "Link clicks": "Link clicks",
    "Registrations completed": "Registrations completed",
    "Adds to cart": "Adds to cart",
    "Checkouts initiated": "Checkouts initiated",
    "Purchases": "Purchases",
    "Purchases conversion value": "Purchases conversion value",
}

_META_OLIVE = {
    "Day": "Day",
    "Campaign name": "Campaign name",
    "Ad set name": "Ad set name",
    "Ad name": "Ad name",
    "Amount spent (usd)": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Link clicks": "Link clicks",
    "Adds to cart with shared items": "Adds to cart",
    "Purchases with shared items": "Purchases",
    "Purchases conversion value for shared items only": "Purchases conversion value",
}

_META_LEAD = {
    "Day": "Day",
    "Campaign name": "Campaign name",
    "Ad set name": "Ad set name",
    "Ad name": "Ad name",
    "Amount spent (usd)": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Link clicks": "Link clicks",
    "Leads": "Leads",
}

_X = {
    "Time period": "Day",
    "Funding source name": "Account name",
    "Ad group name": "Ad set name",
    "Campaign name": "Campaign name",
    "Spend": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Link clicks": "Link clicks",
    "Leads": "Registrations completed",
    "Cart additions": "Adds to cart",
    "Checkouts initiated": "Checkouts initiated",
    "Purchases": "Purchases",
    "Purchases - sale amount": "Purchases conversion value",
}

_TIKTOK = {
    "By day": "Day",
    "Account name": "Account name",
    "Campaign name": "Campaign name",
    "Ad group name": "Ad set name",
    "Ad name": "Ad name",
    "Cost": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Clicks (destination)": "Link clicks",
    "Adds to cart (website)": "Adds to cart",
    "Checkouts initiated (website)": "Checkouts initiated",
    "Purchases (website)": "Purchases",
    "Purchase value (website)": "Purchases conversion value",
}


def config() -> PipelineConfig:
    return PipelineConfig(
        rename_config={
            "Meta": _META,
            "Meta_OLIVE": _META_OLIVE,
            "Meta_Lead": _META_LEAD,
            "X (Twitter)": _X,
            "TikTok": _TIKTOK,
        },
        standard_schema={
            "Day": Date,
            "Source": String,
            "Account name": String,
            "Campaign name": String,
            "Ad set name": String,
            "Ad name": String,
            "Amount spent (USD)": Float64,
            "Impressions": Int64,
            "Reach": Int64,
            "Frequency": Float64,
            "Link clicks": Int64,
            "Registrations completed": Int64,
            "Adds to cart": Int64,
            "Checkouts initiated": Int64,
            "Purchases": Int64,
            "Purchases conversion value": Float64,
            "Leads": Int64,
        },
        source_config={
            "Meta": ["Day", "Purchases conversion value"],
            "Meta_OLIVE": [
                "Purchases with shared items",
                "Purchases conversion value for shared items only",
            ],
            "Meta_Lead": ["Leads", "Leads conversion value"],
            "X (Twitter)": ["Time period", "Cart additions"],
            "TikTok": ["Cost", "Clicks (destination)"],
        },
        cleaner_config={
            "TikTok": remove_tiktok_total_row,
            "X (Twitter)": clean_x_avg_frequency,
        },
        capitalize=True,
    )


def run(spark: SparkSession, raw_dir: str | Path) -> DataFrame:
    return MultiSourceAdETL(spark, config()).run(raw_dir)
