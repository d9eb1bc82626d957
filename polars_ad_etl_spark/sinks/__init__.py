from polars_ad_etl_spark.sinks.csv_bom import write_csv_bom
from polars_ad_etl_spark.sinks.incremental import (
    stream_to_partitioned_parquet,
    write_partition_overwrite,
)

__all__ = [
    "write_csv_bom",
    "write_partition_overwrite",
    "stream_to_partitioned_parquet",
]
