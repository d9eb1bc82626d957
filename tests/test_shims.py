"""Semantic shims: the Polars-parity behaviors (SURVEY §5.2-1) — null-keeping
remove, extract-as-null, strip-suffix-once."""

from pyspark.sql import functions as F

from polars_ad_etl_spark.functions import (
    extract_nullif,
    remove_rows,
    strip_suffix_once,
)


def test_remove_keeps_null_predicate_rows(spark):
    df = spark.createDataFrame(
        [("a", "Total x"), ("b", "keep"), ("c", None)], ["id", "v"]
    )
    out = remove_rows(df, F.col("v").startswith("Total"))
    assert sorted(r.id for r in out.collect()) == ["b", "c"]


def test_extract_nullif_no_match_is_null(spark):
    df = spark.createDataFrame([("25-34",), ("nope",), (None,)], ["v"])
    out = df.select(extract_nullif(F.col("v"), r"\d+-\d+", 0).alias("m")).collect()
    assert [r.m for r in out] == ["25-34", None, None]


def test_extract_nullif_group(spark):
    df = spark.createDataFrame([("50 이상",), ("x",)], ["v"])
    out = df.select(extract_nullif(F.col("v"), r"(\d+)\s*이상", 1).alias("m")).collect()
    assert [r.m for r in out] == ["50", None]


def test_strip_suffix_once(spark):
    df = spark.createDataFrame(
        [("ad.mp4",), ("ad.mp4.mp4",), ("plain",), (None,), (".mp4",)], ["v"]
    )
    out = df.select(strip_suffix_once(F.col("v"), ".mp4").alias("s")).collect()
    assert [r.s for r in out] == ["ad", "ad.mp4", "plain", None, ""]
