from polars_ad_etl_spark.sinks.csv_bom import write_csv_bom

__all__ = ["write_csv_bom"]
