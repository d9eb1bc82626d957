from polars_ad_etl_spark.functions.shims import (
    remove_rows,
    extract_nullif,
    strip_suffix_once,
)
from polars_ad_etl_spark.functions.exact import dsum, davg

__all__ = ["remove_rows", "extract_nullif", "strip_suffix_once", "dsum", "davg"]
