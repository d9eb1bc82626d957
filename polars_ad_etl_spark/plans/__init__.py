from polars_ad_etl_spark.plans.config import PipelineConfig, ConfigError
from polars_ad_etl_spark.plans.pipeline import MultiSourceAdETL
from polars_ad_etl_spark.plans.schema import to_struct_type

__all__ = ["PipelineConfig", "ConfigError", "MultiSourceAdETL", "to_struct_type"]
