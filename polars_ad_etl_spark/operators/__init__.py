"""Operator/query surface for the driver harness.

Importing this package populates the registry: every module below registers
its queries (Spark callable) and, where SQL-expressible, the matching DuckDB
oracle SQL.
"""

from polars_ad_etl_spark.operators.registry import QUERIES, ORACLES, register

# populate the registry (import side effects)
from polars_ad_etl_spark.operators import relational  # noqa: E402,F401
from polars_ad_etl_spark.operators import etl_demo  # noqa: E402,F401
from polars_ad_etl_spark.operators import dedup  # noqa: E402,F401
from polars_ad_etl_spark.operators import similarity  # noqa: E402,F401
from polars_ad_etl_spark.operators import textstats  # noqa: E402,F401
from polars_ad_etl_spark.operators import multimodal  # noqa: E402,F401
from polars_ad_etl_spark.operators import relational2  # noqa: E402,F401
from polars_ad_etl_spark.operators import relational3  # noqa: E402,F401
from polars_ad_etl_spark.operators import curation  # noqa: E402,F401
from polars_ad_etl_spark.operators import asof  # noqa: E402,F401
from polars_ad_etl_spark.operators import skew  # noqa: E402,F401
from polars_ad_etl_spark.operators import semistructured  # noqa: E402,F401
from polars_ad_etl_spark.operators import quality  # noqa: E402,F401
from polars_ad_etl_spark.operators import behavior  # noqa: E402,F401
from polars_ad_etl_spark.operators import graph  # noqa: E402,F401
from polars_ad_etl_spark.operators import intervals  # noqa: E402,F401
from polars_ad_etl_spark.operators import linalg  # noqa: E402,F401
from polars_ad_etl_spark.operators import cep  # noqa: E402,F401
from polars_ad_etl_spark.operators import inequality  # noqa: E402,F401
from polars_ad_etl_spark.operators import search  # noqa: E402,F401
from polars_ad_etl_spark.operators import skyline  # noqa: E402,F401
from polars_ad_etl_spark.operators import dq  # noqa: E402,F401
from polars_ad_etl_spark.operators import privacy  # noqa: E402,F401
from polars_ad_etl_spark.operators import diffing  # noqa: E402,F401
from polars_ad_etl_spark.operators import sql_api  # noqa: E402,F401
from polars_ad_etl_spark.operators import layout_twins  # noqa: E402,F401
from polars_ad_etl_spark.operators import similarity_indexed  # noqa: E402,F401
from polars_ad_etl_spark.operators import media_dedup  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
