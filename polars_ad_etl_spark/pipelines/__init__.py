"""Drop-in pipeline definitions matching the reference's four shipped scripts
(``scripts/apsl_internal.py``, ``manaboo_daily.py``, ``podl_daily.py``,
``like_eat.py``). A user of the reference can run the same four pipelines here:
each module exposes ``config()`` (the validated PipelineConfig) and ``run()``
(full chain raw_dir -> merged DataFrame), plus a shared ``export_daily`` that
reproduces the scripts' CSV+BOM export with a date-range filename.
"""

from polars_ad_etl_spark.pipelines import apsl, like_eat, manaboo, podl
from polars_ad_etl_spark.pipelines.export import export_daily

PIPELINES = {
    "apsl": apsl,
    "manaboo": manaboo,
    "podl": podl,
    "like_eat": like_eat,
}

__all__ = ["PIPELINES", "apsl", "manaboo", "podl", "like_eat", "export_daily"]
