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
from pyspark.sql import Window as W

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


# ------------------------------------------------ sweep-line concurrency
#
# "How many sessions are open at once?" is an interval-overlap counting
# problem. The naive formulation is a self range-join (quadratic); the
# classic answer is a sweep line: emit (+1 at start, -1 at end) points and
# take a running sum. A running sum over the whole timeline is a GLOBAL
# window — the single-partition sort the plan lint exists to catch — so the
# implementation is two-level: a per-hour partitioned running sum (window
# partitioned by hour_start, parallel across ~|hours| partitions) plus an
# hour-level carry-in offset computed on the tiny per-hour aggregate
# (|hours| rows ≈ days×24; the one allowlisted global window, same class as
# events_cumulative_distinct_users' |days| aggregate). At 100 TB the point
# stream shuffles once on hour_start; no per-row cross-partition dependency.
#
# End points are exclusive ([ts, ts+300s)): at equal timestamps the -1
# sorts before the +1, so a session ending exactly when another starts
# never double-counts. Within a tie group of identical (t, delta) the
# partial sums are the same multiset under any order, so MAX is
# deterministic even though row order within ties is not.
@register(
    "events_max_concurrent_intervals",
    oracle="""
    WITH pts AS (
        SELECT ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT ts + INTERVAL 300 SECOND AS t, -1 AS delta FROM events
    ), run AS (
        SELECT date_trunc('hour', t) AS hour_start,
               SUM(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM pts
    )
    SELECT hour_start,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM run
    GROUP BY hour_start
    ORDER BY hour_start
    """,
)
def events_max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per hour, treating each event as a 5-minute-open
    interval [ts, ts+300s) — the load-planning / capacity metric. DuckDB
    oracle runs the textbook single global running sum; Spark runs the
    two-level decomposition (per-hour local sweep + bounded hour-offset
    cumsum), and the hash match proves them equal, tie semantics included."""
    e = load_events(spark, sf_dir)
    starts = e.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = e.select(
        F.expr("timestampadd(SECOND, 300, ts)").alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends).withColumn(
        "hour_start", F.date_trunc("hour", F.col("t"))
    )
    local_w = (
        W.partitionBy("hour_start")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = pts.withColumn("local_run", F.sum("delta").over(local_w))
    per_hour = local.groupBy("hour_start").agg(
        F.max("local_run").alias("local_max"),
        F.sum("delta").alias("hour_delta"),
    )
    # carry-in for each hour = sum of all earlier hours' deltas; |hours| is
    # a bounded aggregate (~days*24 rows), the allowlisted global-window
    # class (sort column pinned by the plan test).
    offset_w = (
        W.orderBy("hour_start")
        .rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    )
    return (
        per_hour.withColumn(
            "carry_in", F.coalesce(F.sum("hour_delta").over(offset_w), F.lit(0))
        )
        .select(
            "hour_start",
            (F.col("carry_in") + F.col("local_max")).alias("max_concurrent"),
        )
        .orderBy("hour_start")
    )


# ------------------------------------------------ time-weighted average
@register(
    "events_time_weighted_value",
    oracle="""
    WITH held AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               DATEDIFF('microsecond', ts,
                        LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)) AS dur_us
        FROM events
    )
    SELECT user_id,
           CAST(SUM(dur_us) AS BIGINT) AS held_us,
           CAST(SUM(CAST(cents AS HUGEINT) * dur_us) // SUM(dur_us)
                AS BIGINT) AS twa_cents
    FROM held
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_us) > 0
    ORDER BY user_id
    """,
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value (TWAP): each event's value
    is "held" until the user's next event; the average weights value-cents
    by exact holding microseconds. Integer arithmetic end-to-end, with the
    cents × µs products accumulated in DECIMAL(38,0)/HUGEINT — a
    1e8-magnitude value held for an hour is ~4e19, past int64 (caught by
    the fuzz edge sweep) — so the oracle hash-matches at any value scale.
    One user-partitioned window + one aggregation — a single shuffle on
    the high-cardinality user key; same scale shape as
    events_interarrival_stats."""
    e = load_events(spark, sf_dir)
    held = e.select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "timestampdiff(MICROSECOND, ts,"
            " lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        held.groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("held_us"),
            F.expr(
                "CAST(sum(CAST(cents AS DECIMAL(38,0)) * dur_us)"
                " div sum(dur_us) AS BIGINT)"
            ).alias("twa_cents"),
        )
        .filter(F.col("held_us") > 0)
        .orderBy("user_id")
    )
