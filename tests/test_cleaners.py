"""The five reference cleaners with their quirk inputs (FIXTURES.md A2/A3/A7)."""

import pytest

from polars_ad_etl_spark.functions.cleaners import (
    clean_naver_gfa_age_gender,
    clean_naver_gfa_date,
    clean_x_avg_frequency,
    remove_tiktok_total_row,
    strip_tiktok_mp4_suffix,
)


def test_x_avg_frequency_dash_to_zero(spark):
    df = spark.createDataFrame(
        [("2024-01-01", "-"), ("2024-01-02", "1.5")], ["Time period", "Average frequency"]
    )
    out = clean_x_avg_frequency(df)
    assert [r["Average frequency"] for r in out.collect()] == ["0", "1.5"]
    assert dict(out.dtypes)["Average frequency"] == "string"


def test_x_avg_frequency_numeric_column_untouched(spark):
    df = spark.createDataFrame([("a", 1.5)], ["Time period", "Average frequency"])
    assert clean_x_avg_frequency(df) is df


def test_x_avg_frequency_missing_column_raises(spark):
    df = spark.createDataFrame([("a",)], ["Time period"])
    with pytest.raises(KeyError):
        clean_x_avg_frequency(df)


def test_tiktok_total_row_removed_nulls_kept(spark):
    df = spark.createDataFrame(
        [("2024-01-01", "camp1"), ("2024-01-02", "Total of 2 days"), ("2024-01-03", None)],
        ["By day", "Campaign name"],
    )
    out = remove_tiktok_total_row(df)
    assert sorted(r["By day"] for r in out.collect()) == ["2024-01-01", "2024-01-03"]


def test_tiktok_mp4_suffix(spark):
    df = spark.createDataFrame([("x", "vid.mp4"), ("y", "plain")], ["k", "Ad name"])
    out = strip_tiktok_mp4_suffix(df)
    assert [r["Ad name"] for r in out.collect()] == ["vid", "plain"]


GFA_CASES = [
    ("25~34세 남성", "25-34", "male"),
    ("35–44세 여자", "35-44", "female"),
    ("50세 이상 여성", "50+", "female"),
    ("연령모름 성별모름", "unknown", "unknown"),
    ("  25~34세   남성  ", "25-34", "male"),  # extra-whitespace variant
]


def test_naver_gfa_age_gender(spark):
    df = spark.createDataFrame([(v,) for v, _, _ in GFA_CASES], ["연령 및 성별"])
    out = clean_naver_gfa_age_gender(df).collect()
    assert [(r["연령"], r["성"]) for r in out] == [(a, g) for _, a, g in GFA_CASES]
    assert "연령 및 성별" not in clean_naver_gfa_age_gender(df).columns


def test_naver_gfa_date(spark):
    df = spark.createDataFrame([("2026.02.09.",), (" 2026.02.10. ",)], ["기간"])
    out = clean_naver_gfa_date(df)
    assert [r["기간"] for r in out.collect()] == ["2026-02-09", "2026-02-10"]
    # the whole point: the standardize strict-cast to Date now succeeds
    casted = out.selectExpr("cast(`기간` as date) d").collect()
    assert str(casted[0].d) == "2026-02-09"
