"""Range/interval joins WITHOUT an equi-key — the join shape Spark executes
as BroadcastNestedLoopJoin (broadcast side × every row) or a cartesian
product if written naively, and the one that actually melts at 100 TB.

The fix is the classic time-bucketing rewrite: quantize both sides to
fixed-width buckets sized to the range predicate, explode the probe side to
the (at most two) buckets its window can touch, join on bucket EQUALITY
(hash join, shuffle on a well-distributed key), then re-apply the exact
range predicate as a cheap post-join filter. The plan becomes a plain
shuffled hash/sort-merge join — scan-partitioned, AQE-skew-splittable — with
a bounded duplication factor of 2 on the probe side.

The equi-key variant of this pattern (user_id + time window) lives in
``relational.py::events_purchase_click_attribution``; this module covers the
no-key case. A plan test (`tests/test_plan_quality.py`) asserts no
nested-loop/cartesian node survives in the optimized plan.

Reference parity note: the reference repo has no join surface at all
(SURVEY §2.8); this is part of the Spark-native extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.exact import dsum, dsum_sql
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import load_events

WINDOW_S = 300  # 5-minute lookback; bucket width == window width

# wall-clock seconds since the epoch, assembled from tz-free field
# extractions (unix_date/hour/minute/second are pure functions of the NTZ
# wall value). NOT timestampdiff: that resolves to the instant (LTZ)
# variant, coercing NTZ through the session timezone — which is nonlinear
# across DST transitions and can push a 5-minute wall window more than one
# bucket wide (caught by reading the optimized plan, per the hostile-tz
# verification rule).
_BUCKET = (
    "(unix_date(CAST({col} AS DATE)) * 86400"
    " + hour({col}) * 3600 + minute({col}) * 60"
    f" + CAST(floor(second({{col}})) AS BIGINT)) div {WINDOW_S}"
)


def bucketed_range_join_counts(
    probe: DataFrame, build: DataFrame, probe_ts: str, build_ts: str
) -> DataFrame:
    """For every probe row, count/sum build rows with
    ``probe_ts - WINDOW_S <= build_ts <= probe_ts`` — no equi-key.

    Because the bucket width equals the window width, a probe's window spans
    exactly two buckets (its own and the previous one), so the probe side is
    exploded ×2 and the join is pure bucket equality."""
    b = build.withColumn("bucket", F.expr(_BUCKET.format(col=build_ts)))
    p = probe.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(_BUCKET.format(col=probe_ts)),
                F.expr(_BUCKET.format(col=probe_ts)) - F.lit(1),
            )
        ),
    )
    matched = (
        p.join(b, "bucket")
        .filter(
            (F.col(build_ts) >= F.expr(f"{probe_ts} - INTERVAL {WINDOW_S} SECOND"))
            & (F.col(build_ts) <= F.col(probe_ts))
        )
        .groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_clicks_5min"),
            dsum("c_value").alias("click_value_5min"),
        )
    )
    return (
        probe.select("purchase_id")
        .join(matched, "purchase_id", "left_outer")
        .select(
            "purchase_id",
            F.coalesce("n_clicks_5min", F.lit(0).cast("long")).alias(
                "n_clicks_5min"
            ),
            F.coalesce("click_value_5min", F.lit(0.0)).alias(
                "click_value_5min"
            ),
        )
    )


@register(
    "range_join_global_click_rate",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_5min,
           COALESCE({dsum_sql('c.value')}, 0.0) AS click_value_5min
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def range_join_global_click_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitewide click pressure at purchase time: for every purchase, the
    count and value of ALL clicks (any user) in the preceding 5 minutes —
    a cross-user range join with NO equi-key, executed as a bucketed equi
    join instead of the nested-loop plan the naive formulation produces.
    The DuckDB oracle runs the naive inequality join (its IEJoin handles
    it at oracle scale), so the bucketing rewrite is proven semantics-
    preserving, window boundaries included."""
    e = load_events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    return bucketed_range_join_counts(p, c, "p_ts", "c_ts")
