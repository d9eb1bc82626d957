"""SparkSession factory.

Defaults chosen for parity with the reference's observable semantics and for
scale-out readiness:

- ``spark.sql.ansi.enabled=true``: the reference's standardize stage strict-casts
  and *raises* on bad values (reference ``multi_source_ad_etl.py:196``); ANSI mode
  is the Spark-native equivalent of that data-quality gate.
- AQE on: runtime partition coalescing + skew-join handling — the knobs that make
  the same plan survive a 100x scale-up without retuning.
- UTC session timezone: deterministic timestamp semantics (and parity with the
  DuckDB oracle harness, which is UTC-naive).
- Arrow enabled: fast toPandas / pandas_udf batch transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "polars-ad-etl-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    ansi: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    In local mode the shuffle-partition count defaults to the core count —
    Spark's default of 200 over-parallelizes small local runs and
    under-parallelizes big clusters; on a real cluster this is expected to be
    overridden (or left to AQE coalescing, which is enabled).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "true" if ansi else "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
