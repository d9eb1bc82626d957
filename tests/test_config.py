"""The four constructor-time config checks (reference
``multi_source_ad_etl.py:40-94``) each trip on a crafted bad config."""

import pytest

from polars_ad_etl_spark.plans import ConfigError, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, String


def good_kwargs():
    return dict(
        rename_config={
            "Meta": {"Day": "Day", "Amount spent (usd)": "Amount spent (USD)"},
            "TikTok": {"By day": "Day", "Cost": "Amount spent (USD)"},
        },
        standard_schema={"Day": Date, "Source": String, "Amount spent (USD)": Float64},
        source_config={"Meta": ["Day"], "TikTok": ["By day"]},
        cleaner_config={},
    )


def test_valid_config_passes():
    cfg = PipelineConfig(**good_kwargs())
    assert cfg.cleaners == {}


def test_source_without_mapping_raises():
    kw = good_kwargs()
    kw["source_config"]["X"] = ["Time period"]
    with pytest.raises(ConfigError, match="without a rename mapping"):
        PipelineConfig(**kw)


def test_mapping_without_source_raises():
    kw = good_kwargs()
    kw["rename_config"]["X"] = {"Time period": "Day"}
    with pytest.raises(ConfigError, match="undetectable sources"):
        PipelineConfig(**kw)


def test_overlapping_fingerprints_raise():
    kw = good_kwargs()
    kw["source_config"]["TikTok"] = ["Day"]  # already claimed by Meta
    with pytest.raises(ConfigError, match="claimed by both"):
        PipelineConfig(**kw)


def test_rename_target_missing_from_schema_raises():
    kw = good_kwargs()
    kw["rename_config"]["Meta"]["Impressions"] = "Impressions"  # not in schema
    with pytest.raises(ConfigError, match="missing from the standard schema"):
        PipelineConfig(**kw)


def test_cleaner_for_unknown_source_raises():
    kw = good_kwargs()
    kw["cleaner_config"] = {"Nope": lambda df: df}
    with pytest.raises(ConfigError, match="undetectable sources"):
        PipelineConfig(**kw)


def test_single_cleaner_normalized_to_list():
    kw = good_kwargs()
    fn = lambda df: df  # noqa: E731
    kw["cleaner_config"] = {"Meta": fn, "TikTok": [fn, fn]}
    cfg = PipelineConfig(**kw)
    assert cfg.cleaners["Meta"] == [fn]
    assert cfg.cleaners["TikTok"] == [fn, fn]
