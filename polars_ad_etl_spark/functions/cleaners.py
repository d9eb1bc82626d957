"""The reusable per-source cleaner library.

Spark re-expression of the reference's five cleaners (reference
``data_clean_lib.py``), each a ``DataFrame -> DataFrame`` transform composable
via ``df.transform`` — the reference's extension point is exactly this
DataFrame-level registry, not scalar UDFs (SURVEY §2.10). All of these are
pure built-in-expression programs: they stay inside whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.shims import (
    extract_nullif,
    remove_rows,
    strip_suffix_once,
)


def clean_x_avg_frequency(df: DataFrame, column: str = "Average frequency") -> DataFrame:
    """X/Twitter exports put a literal ``"-"`` in "Average frequency" for
    no-data rows; replace with "0", keeping the column string-typed (the
    standardize cast turns it numeric later). Dtype-guarded like the reference
    (``data_clean_lib.py:4-12``): only applies when the column is string — and
    like the reference, raises if the column is absent.
    """
    dtype = dict(df.dtypes)[column]  # KeyError when absent, matching reference
    if dtype != "string":
        return df
    c = F.col(column)
    return df.withColumn(column, F.when(c == "-", F.lit("0")).otherwise(c))


def remove_tiktok_total_row(df: DataFrame) -> DataFrame:
    """Drop TikTok "Total ..." summary rows: remove rows whose *second* column
    (positional, like the reference ``data_clean_lib.py:15-18``) starts with
    "Total". Null-keeping remove semantics: a null in that column keeps the
    row (Polars ``remove`` inverse-of-filter behavior, SURVEY §2.3 F1)."""
    second = df.columns[1]
    return remove_rows(df, F.col(second).startswith("Total"))


def strip_tiktok_mp4_suffix(df: DataFrame, column: str = "Ad name") -> DataFrame:
    """Remove one trailing ``.mp4`` from ad names (reference
    ``data_clean_lib.py:21-23``)."""
    return df.withColumn(column, strip_suffix_once(F.col(column), ".mp4"))


def clean_naver_gfa_age_gender(
    df: DataFrame,
    column: str = "연령 및 성별",
    age_col: str = "연령",
    gender_col: str = "성",
) -> DataFrame:
    """Split Naver GFA's combined "연령 및 성별" (age & gender) column into a
    normalized age bucket and gender (reference ``data_clean_lib.py:26-85``).

    Normalization: trim + collapse whitespace, unify dash variants (~ – —) to
    ``-``, strip the 세 (years-old) suffix. Then:

    - age: unknown-marker 연령모름 -> "unknown"; a "lo-hi" range -> "lo-hi";
      "N 이상" (N and over) -> "N+"; anything else -> "unknown".
    - gender: 성별모름 -> "unknown"; 남자/남성 -> "male"; 여자/여성 -> "female";
      else "unknown".

    The consumed raw column is dropped (reference ``data_clean_lib.py:85``).
    """
    raw = F.col(column).cast("string")
    cleaned = F.regexp_replace(F.trim(raw), r"\s+", " ")
    cleaned = F.regexp_replace(cleaned, r"[~–—]", "-")
    cleaned = F.regexp_replace(cleaned, "세", "")

    age_range = extract_nullif(cleaned, r"\d+\s*-\s*\d+", 0)
    age_range = F.regexp_replace(age_range, r"\s", "")  # "25 - 34" -> "25-34"
    age_plus = extract_nullif(cleaned, r"(\d+)\s*이상", 1)

    age = (
        F.when(cleaned.contains("연령모름"), F.lit("unknown"))
        .when(age_range.isNotNull(), age_range)
        .when(age_plus.isNotNull(), F.concat(age_plus, F.lit("+")))
        .otherwise(F.lit("unknown"))
    )
    gender = (
        F.when(cleaned.contains("성별모름"), F.lit("unknown"))
        .when(cleaned.rlike("남자|남성"), F.lit("male"))
        .when(cleaned.rlike("여자|여성"), F.lit("female"))
        .otherwise(F.lit("unknown"))
    )
    return (
        df.withColumn(age_col, age)
        .withColumn(gender_col, gender)
        .drop(column)
    )


def clean_naver_gfa_date(df: DataFrame, column: str = "기간") -> DataFrame:
    """Normalize Naver GFA's ``2026.02.09.`` date format (trailing dot,
    dot-separated) to ISO ``2026-02-09`` so the standardize strict-cast to
    Date succeeds (reference ``data_clean_lib.py:88-105``)."""
    c = F.trim(F.col(column).cast("string"))
    c = strip_suffix_once(c, ".")
    c = F.regexp_replace(c, r"\.", "-")
    return df.withColumn(column, c)
