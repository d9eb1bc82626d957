"""Manaboo daily pipeline — Meta + X/Twitter, 19-column standard schema, no
header capitalization (exact-case headers). Config data reproduces the
reference pipeline (``scripts/manaboo_daily.py:26-88``); the X source maps
"Average frequency" into the standard ``Frequency`` column after the ``"-"``
sentinel cleaner runs."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.functions.cleaners import clean_x_avg_frequency
from polars_ad_etl_spark.plans import MultiSourceAdETL, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, Int64, String

_META = {
    "Day": "Day",
    "Campaign name": "Campaign name",
    "Ad Set Name": "Ad Set Name",
    "Ad name": "Ad name",
    "Gender": "Gender",
    "Age": "Age",
    "Link (ad settings)": "Link (ad settings)",
    "Amount spent (USD)": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Frequency": "Frequency",
    "Reach": "Reach",
    "Clicks (all)": "Clicks (all)",
    "ThruPlays": "ThruPlays",
    "3-second video plays": "3-second video plays",
    "Registrations Completed": "Registrations Completed",
    "Purchases": "Purchases",
    "Purchases conversion value": "Purchases conversion value",
    "Video plays": "Video plays",
}

_X = {
    "Time period": "Day",
    "Campaign name": "Campaign name",
    "Spend": "Amount spent (USD)",
    "Impressions": "Impressions",
    "Average frequency": "Frequency",
    "Total audience reach": "Reach",
    "Clicks": "Clicks (all)",
    "Video completions": "ThruPlays",
    "3s/100% video views": "3-second video plays",
    "Leads": "Registrations Completed",
    "Purchases": "Purchases",
    "Purchases - sale amount": "Purchases conversion value",
    "Video views": "Video plays",
}


def config() -> PipelineConfig:
    return PipelineConfig(
        rename_config={"Meta": _META, "X (Twitter)": _X},
        standard_schema={
            "Source": String,
            "Day": Date,
            "Campaign name": String,
            "Ad Set Name": String,
            "Ad name": String,
            "Gender": String,
            "Age": String,
            "Link (ad settings)": String,
            "Amount spent (USD)": Float64,
            "Impressions": Int64,
            "Frequency": Float64,
            "Reach": Int64,
            "Clicks (all)": Int64,
            "ThruPlays": Int64,
            "3-second video plays": Int64,
            "Registrations Completed": Int64,
            "Purchases": Int64,
            "Purchases conversion value": Float64,
            "Video plays": Int64,
        },
        source_config={
            "Meta": ["Campaign name", "Day"],
            "X (Twitter)": ["Objective", "Time period"],
        },
        cleaner_config={"X (Twitter)": clean_x_avg_frequency},
        capitalize=False,
    )


def run(spark: SparkSession, raw_dir: str | Path) -> DataFrame:
    return MultiSourceAdETL(spark, config()).run(raw_dir)
