from polars_ad_etl_spark.sources.tabular import read_tabular_dir, read_csv, read_excel
from polars_ad_etl_spark.sources.star import load_tables, register_views

__all__ = ["read_tabular_dir", "read_csv", "read_excel", "load_tables", "register_views"]
