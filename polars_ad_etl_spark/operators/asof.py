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
    are preserved; missing matches yield nulls (left-asof semantics).

    The carried payload is ONE struct per right row, not per-column
    ``last(ignorenulls=True)`` carries: a struct whose members are NULL is
    still a non-NULL struct, so a right row with NULL value columns is a
    real match (yielding its NULLs), and all asof_* outputs always come
    from the SAME right row — per-column carries would skip the NULL and
    tear columns from different rows (caught by the NULL-heavy edge
    sweep)."""
    lcols = left.columns
    if not value_cols:  # nothing to attach: the as-of is a no-op
        return left
    rtypes = dict(right.dtypes)
    struct_ddl = (
        "struct<" + ",".join(f"`{c}`:{rtypes[c]}" for c in value_cols) + ">"
    )
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_ddl)
    )
    r_tagged = (
        right.select(
            key,
            time_col,
            F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
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
    carried = unioned.withColumn(
        "_r", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in value_cols],
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


# ------------------------------------- nearest-asof with tolerance
#
# The third member of the asof family (after backward, which
# asof_purchase_last_click covers, and forward, its mirror): match each left
# row to the temporally NEAREST right row in either direction, within a
# tolerance — pd.merge_asof(direction="nearest", tolerance=...). Spark has
# no native form; the scalable composition is one union + ONE sorted window
# pass per user producing both the backward candidate (last click at or
# before) and the forward candidate (first click after), then a cheap
# row-local argmin of the two. Same-timestamp clicks are pre-deduped to
# MIN(event_id) so both engines resolve ties identically and the window
# carry is well-defined. One shuffle+sort on the user key, no range
# explosion, no self-join of the events table.
TOL_US = 120_000_000  # ±120 s


@register(
    "asof_nearest_click",
    oracle="""
    WITH cl AS (
        SELECT user_id, ts, MIN(event_id) AS c_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ), p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           n.c_id AS nearest_click_id,
           n.diff_us
    FROM p LEFT JOIN LATERAL (
        SELECT c.c_id,
               CAST(DATEDIFF('microsecond', p.ts, c.ts) AS BIGINT) AS diff_us
        FROM cl c
        WHERE c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 120 SECOND
          AND c.ts <= p.ts + INTERVAL 120 SECOND
        ORDER BY abs(DATEDIFF('microsecond', p.ts, c.ts)), c.ts
        LIMIT 1
    ) n ON TRUE
    ORDER BY purchase_id
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the nearest same-user click within ±120 s —
    either direction, ties to the earlier click. The DuckDB oracle runs the
    declarative LATERAL top-1; Spark runs the single-window two-candidate
    composition, and the hash match proves them equal (signed microsecond
    offset included)."""
    e = load_events(spark, sf_dir)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("c_id"))
        .select(
            "user_id",
            "ts",
            F.struct(F.col("ts").alias("c_ts"), F.col("c_id")).alias("c"),
            F.lit(0).alias("side"),
            F.lit(None).cast("bigint").alias("purchase_id"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None)
        .cast("struct<c_ts:timestamp_ntz,c_id:bigint>")
        .alias("c"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    # clicks at equal ts sort BEFORE the purchase (side 0 < 1): the backward
    # frame is inclusive of simultaneous clicks, the forward frame excludes
    # them — a 0-µs match is always taken from the backward side.
    ob = W.partitionBy("user_id").orderBy("ts", "side")
    back = F.last("c", ignorenulls=True).over(
        ob.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = F.first("c", ignorenulls=True).over(
        ob.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    cand = (
        u.withColumn("back", back)
        .withColumn("fwd", fwd)
        .filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.expr("timestampdiff(MICROSECOND, back.c_ts, ts)").alias("bd"),
            F.col("back.c_id").alias("b_id"),
            F.expr("timestampdiff(MICROSECOND, ts, fwd.c_ts)").alias("fd"),
            F.col("fwd.c_id").alias("f_id"),
        )
    )
    vb = F.col("bd").isNotNull() & (F.col("bd") <= TOL_US)
    vf = F.col("fd").isNotNull() & (F.col("fd") <= TOL_US)
    pick_back = vb & (~vf | (F.col("bd") <= F.col("fd")))
    pick_fwd = vf & ~pick_back
    return cand.select(
        "purchase_id",
        "user_id",
        F.when(pick_back, F.col("b_id"))
        .when(pick_fwd, F.col("f_id"))
        .alias("nearest_click_id"),
        F.when(pick_back, -F.col("bd"))
        .when(pick_fwd, F.col("fd"))
        .alias("diff_us"),
    ).orderBy("purchase_id")
