"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (preference (a) from the build
rules): union both sides, then one window pass per partition key carrying the
most recent right-side value forward with ``last(..., ignorenulls=True)``.
This is the scalable formulation — one shuffle + sort on (key, time), no
per-group Python, no range explosion — equivalent to ``pd.merge_asof`` /
DuckDB ``ASOF JOIN`` semantics (inclusive: right.time <= left.time).

At 100 TB: both sides shuffle once on the partition key; the window sort is
per key-group. Skewed keys fall to AQE; a secondary time-bucket pre-partition
(repartitionByRange on (key, time)) is the escape hatch for single-key
firehoses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import load_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right-side ``value_cols`` with
    ``right.time_col <= left.time_col`` within the same ``key``. Left columns
    are preserved; missing matches yield nulls (left-asof semantics)."""
    lcols = left.columns
    l_tagged = left.withColumn("_side", F.lit(1)).withColumns(
        {f"_r_{c}": F.lit(None).cast(dict(right.dtypes)[c]) for c in value_cols}
    )
    r_tagged = (
        right.select(
            key,
            time_col,
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
        .withColumns({c: F.lit(None).cast(dict(left.dtypes)[c]) for c in lcols
                      if c not in (key, time_col)})
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (_side=0) sort before left rows at equal time -> inclusive <=
    w = (
        W.partitionBy(key)
        .orderBy(time_col, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumns(
        {f"_r_{c}": F.last(f"_r_{c}", ignorenulls=True).over(w) for c in value_cols}
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in value_cols]
    )


@register(
    "asof_purchase_last_click",
    oracle="""
    WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts,
                      event_type, value FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    c AS (SELECT * FROM e WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.value,
           c.value AS asof_value, c.event_id AS asof_event_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent prior-or-simultaneous click
    by the same user — the canonical attribution as-of join, checked against
    DuckDB's native ASOF JOIN."""
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(purchases, clicks, key="user_id", time_col="ts",
                       value_cols=["value", "event_id"])
    return joined.select("event_id", "user_id", "value", "asof_value", "asof_event_id")
