"""Semantic shims: Spark expressions that reproduce observable Polars
behaviors the reference relies on (SURVEY §2.3 F1, §2.5 T3/T4/T5). These are
the silent-wrong-answer traps — each is unit-tested first (SURVEY §5.2-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def remove_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Polars ``DataFrame.remove`` semantics: drop rows where the predicate is
    TRUE, but KEEP rows where it evaluates to null (the inverse of ``filter``,
    which drops null-predicate rows). Used by the TikTok Total-row cleaner
    (reference ``data_clean_lib.py:15-18``).
    """
    return df.filter(~predicate | predicate.isNull())


def extract_nullif(col: Column, pattern: str, group: int = 0) -> Column:
    """Polars ``str.extract`` returns null on no-match; Spark
    ``regexp_extract`` returns ``''``. Wrap in nullif for parity (reference
    call sites ``data_clean_lib.py:53-57``).
    """
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit(""))


def strip_suffix_once(col: Column, suffix: str) -> Column:
    """Polars ``str.strip_suffix``: remove the exact suffix once if present,
    else leave unchanged (reference ``data_clean_lib.py:21-23,98-105``).
    Null-safe: null in -> null out."""
    n = len(suffix)
    return F.when(
        col.endswith(F.lit(suffix)),
        col.substr(F.lit(1), F.length(col) - n),
    ).otherwise(col)
