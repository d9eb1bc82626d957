"""User-behavior analytics over the events table: funnel conversion, weekly
cohort retention, and statistical anomaly detection.

The reference is an advertising-ETL system (`/root/reference/README.md:3-5`)
whose downstream analytics (CTR, conversion) are delegated to Google Sheets
(`README.md:223-228`); these operators bring that analytics layer into the
engine itself, Spark-first.

Scale notes (100 TB / 1000-executor design):

- **Funnel** is ONE shuffle on ``user_id``: per-user event times are gathered
  with conditional ``collect_list`` (map-side partial aggregation applies) and
  the step ordering logic runs JVM-side with array higher-order functions —
  no self-join per step, no Python. A 3-step funnel over 10^11 events is a
  single hash aggregation whose state per user is a few timestamps.
- **Cohort retention** distincts (user, week) *before* joining the per-user
  first-week table, so the join input is |users|·|weeks|, not |events|; both
  sides shuffle on ``user_id`` (co-partitioned join, one exchange each).
- **Anomaly detection** aggregates per-type moments (5 rows) and broadcasts
  them back across the event scan — the classic two-pass z-score with no
  window over the full table (a window by event_type would funnel 1/5 of
  100 TB through single partitions). Thresholding is done on exact-decimal
  power sums compared in identically-structured double arithmetic, so Spark
  and the DuckDB oracle agree bit-for-bit (see functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window as W

from polars_ad_etl_spark.functions.exact import dsum, dsum_sql
from polars_ad_etl_spark.functions.hashing import portable_hash32_sql
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet, load_events


@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS users_view,
           (SELECT COUNT(*) FROM c) AS users_click_after_view,
           (SELECT COUNT(*) FROM p) AS users_purchase_after_click
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase), strictly increasing
    event time, per user.

    Spark-first: ONE aggregation on user_id gathers each user's click and
    purchase timestamps as sorted arrays; the "first click after the first
    view" / "first purchase after that click" steps are array ``filter`` +
    ``array_min`` — JVM higher-order functions, no per-step self-join. The
    oracle states the same semantics as the classic 3-CTE join cascade.
    """
    e = load_events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    stepped = per_user.withColumn(
        "t_click", F.expr("array_min(filter(clicks, x -> x > t_view))")
    ).withColumn(
        "t_purchase", F.expr("array_min(filter(purchases, x -> x > t_click))")
    )
    return stepped.agg(
        F.count("t_view").alias("users_view"),
        F.count("t_click").alias("users_click_after_view"),
        F.count("t_purchase").alias("users_purchase_after_click"),
    )


@register(
    "events_weekly_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id,
                      CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS activity_week
          FROM events)
    SELECT f.cohort_week,
           CAST(FLOOR(date_diff('day', f.cohort_week, a.activity_week) / 7)
                AS BIGINT) AS week_offset,
           COUNT(*) AS active_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by the ISO week of
    their first event; ``active_users`` counted per (cohort_week, week_offset).

    Scale shape: (user, week) pairs are distinct-ed BEFORE the join, shrinking
    the join input from |events| to |users|x|weeks|; the final count needs no
    DISTINCT because a user contributes one row per activity week by
    construction. Both the distinct and the join shuffle on user_id, so AQE
    can reuse the exchange.
    """
    e = load_events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("activity_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("activity_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "events_value_anomalies",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000) AS BIGINT) AS mu
      FROM events),
    s AS (
      SELECT event_type,
             COUNT(mu) AS n_v,
             SUM(CAST(mu AS HUGEINT)) AS s_mu,
             SUM(CAST(mu AS HUGEINT) * mu) AS ss_mu
      FROM m GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value
    FROM m e JOIN s ON e.event_type = s.event_type
    WHERE 4.0 * CAST(CAST(s.n_v AS HUGEINT) * e.mu - s.s_mu AS DOUBLE)
              * CAST(CAST(s.n_v AS HUGEINT) * e.mu - s.s_mu AS DOUBLE)
              * (CAST(s.n_v AS DOUBLE) - 1.0)
          > 25.0 * CAST(s.n_v AS DOUBLE)
               * CAST(s.n_v * s.ss_mu - s.s_mu * s.s_mu AS DOUBLE)
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose ``value`` is a >2.5-sigma outlier within its event_type
    (sample stddev).

    Determinism: the test |x - mean| > 2.5*stddev is evaluated with no
    division or sqrt — squared and multiplied through to
    ``4(nx-S)^2(n-1) > 25n(nSS - S^2)``. The moments are EXACT integer
    sums of micro-unit values (decimal(38,0)/HUGEINT — a 1e8-magnitude
    value squares to ~1.5e28, far past int64 and the previous
    DECIMAL(18,6) squares, caught by the fuzz edge sweep); only the final
    comparison converts the exact integers to double, and both engines
    round the identical integer to the identical double. The oracle's
    n*mu product is HUGEINT-cast too (n*1.2e14 passes int64 at ~75k
    rows/type). Exactness envelope: s_mu**2 < 1e38 — |value| <= 1e8 up to
    ~1e9 events per type; past that both engines overflow their 128-bit
    integers together (symmetric failure, not a silent divergence).

    Scale shape: per-type moments are a 5-row aggregate broadcast back into
    the scan — two passes over events, zero wide shuffles of event rows
    (a Window.partitionBy(event_type) would hot-spot 1/5 of the table into
    one partition).
    """
    e = load_events(spark, sf_dir)
    m = e.select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("mu"),
    )
    mu38 = F.col("mu").cast("decimal(38,0)")
    stats = m.groupBy("event_type").agg(
        F.count("mu").alias("n_v"),
        F.sum(mu38).alias("s_mu"),
        F.sum(mu38 * F.col("mu")).alias("ss_mu"),
    )
    nx_s = (
        F.col("n_v") * F.col("mu").cast("decimal(38,0)") - F.col("s_mu")
    ).cast("double")
    n = F.col("n_v").cast("double")
    lhs = F.lit(4.0) * nx_s * nx_s * (n - F.lit(1.0))
    var_num = (
        F.col("n_v") * F.col("ss_mu") - F.col("s_mu") * F.col("s_mu")
    ).cast("double")
    rhs = F.lit(25.0) * n * var_num
    return (
        m.join(F.broadcast(stats), "event_type")
        .filter(lhs > rhs)
        .select("event_id", "event_type", "value")
    )


@register(
    "cdc_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT user_id, event_id, ts, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def cdc_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the CDC/upsert compaction primitive (newest
    state wins; ties broken by event_id so the winner is unique).

    Spark-first: implemented as ``max_by`` with a tie-proof struct ordering
    key, NOT the row_number window the oracle states. The aggregate is
    map-side combinable — each partition reduces to one candidate row per
    key before the shuffle, so the exchange carries |keys| rows, while the
    window form must shuffle and sort ALL |events| rows. At 100 TB of CDC
    history that is the difference between a compaction and a global sort.
    """
    e = load_events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("r")
        )
        .select("user_id", "r.event_id", "r.ts", "r.event_type", "r.value")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    t AS (SELECT event_type, next_type, COUNT(*) AS n_trans
          FROM o WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
    SELECT event_type, next_type, n_trans,
           CAST(n_trans AS DOUBLE)
             / SUM(n_trans) OVER (PARTITION BY event_type) AS p_trans
    FROM t
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each user's event sequence:
    counts and row-normalized probabilities of event_type -> next event_type.

    Scale shape: ``lead`` shuffles once on user_id (per-user state is one
    row); the transition count aggregate is map-side combinable into at most
    |types|^2 rows, and the normalizing window runs over that tiny aggregate,
    not the event table. Ordering is made total with the unique event_id
    tie-break, so results are partitioning-independent.
    """
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    norm = W.partitionBy("event_type")
    return trans.withColumn(
        "p_trans", F.col("n_trans").cast("double") / F.sum("n_trans").over(norm)
    )


@register(
    "events_rolling_active_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    wau AS (SELECT d2.d AS report_day, COUNT(DISTINCT ud.user_id) AS wau
            FROM (SELECT DISTINCT d FROM ud) d2
            JOIN ud ON ud.d BETWEEN d2.d - 6 AND d2.d
            GROUP BY d2.d)
    SELECT dau.d AS day, dau.dau, wau.wau
    FROM dau JOIN wau ON dau.d = wau.report_day
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users plus trailing-7-day weekly active users, reported
    for each day that has activity.

    Scale shape: COUNT(DISTINCT) over a sliding window is not window-able
    directly, and the naive range self-join (the oracle's formulation) is
    |days| x |user-days| — quadratic-ish and skew-prone at 100 TB. Spark-first
    instead EXPLODES each distinct (user, day) into the <=7 report days it
    supports (``sequence`` + ``explode``, JVM-side), distincts, and counts:
    linear 7x fan-out, both distincts and the count shuffle on the same
    (user_id, day)-derived keys, no range join anywhere.
    """
    e = load_events(spark, sf_dir)
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias(
                "report_day"
            ),
        )
        .distinct()
        .groupBy("report_day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.report_day)
        .select(F.col("d").alias("day"), "dau", "wau")
    )


@register(
    "user_rfm_segments",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             MAX(ts) AS last_purchase_ts,
             COUNT(*) AS frequency,
             {dsum_sql('value')} AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT user_id, frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY last_purchase_ts DESC, user_id)
                AS INTEGER) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id)
                AS INTEGER) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id)
                AS INTEGER) AS m_quartile
    FROM m
    """,
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency/frequency/monetary
    quartiles (1 = best). Ties broken by user_id so NTILE is deterministic;
    monetary uses the exact-decimal sum.

    Scale design — exact NTILE with NO global-sort window. A naive
    ``ntile(4).over(Window.orderBy(...))`` funnels every user through one
    partition; instead the three metrics are melted into long format
    (user_id, metric, sort_val) and ranked with the distributed-sort
    machinery Spark's own orderBy uses, kept parallel end-to-end:

    1. ONE ``repartitionByRange(metric, sort_val, user_id)`` — the range
       partitioner's reservoir sampling balances partitions even on skewed
       value distributions (the failure mode of fixed-width value buckets).
    2. ``row_number`` per (range-partition id, metric) — every window
       partition is a bounded ~n/P slice by construction.
    3. Exact global rank = intra rank + sum of earlier partitions' counts,
       from a tiny (P x 3)-row stats frame (broadcast; its cumulative sum is
       a broadcast self-join, so the plan contains no empty-partitionBy
       window at all — enforced by test_rfm_no_global_window).
    4. quartile = closed-form NTILE(4) arithmetic on (rank, n).

    Sort values are exact as doubles: epoch micros (< 2^53) via tz-safe
    timestampdiff on the NTZ timestamp, integer frequency, and the
    exact-decimal monetary sum the oracle orders by. All negated so
    ascending range order = the oracle's DESC.
    """
    e = load_events(spark, sf_dir)
    m = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase_ts"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("value").alias("monetary"),
        )
    )
    recency_sv = -F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " last_purchase_ts)"
    ).cast("double")
    melted = m.select(
        "user_id",
        "frequency",
        "monetary",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("metric"), recency_sv.alias("sv")),
                F.struct(
                    F.lit(1).alias("metric"),
                    (-F.col("frequency")).cast("double").alias("sv"),
                ),
                F.struct(
                    F.lit(2).alias("metric"), (-F.col("monetary")).alias("sv")
                ),
            )
        ).alias("mx"),
    ).select(
        "user_id",
        "frequency",
        "monetary",
        F.col("mx.metric").alias("metric"),
        F.col("mx.sv").alias("sv"),
    )
    r = melted.repartitionByRange("metric", "sv", "user_id").withColumn(
        "pid", F.spark_partition_id()
    )
    ranked = r.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("pid", "metric").orderBy("sv", "user_id")
        ),
    )
    pstats = r.groupBy("pid", "metric").agg(F.count(F.lit(1)).alias("cnt"))
    before = (
        pstats.alias("a")
        .join(
            F.broadcast(pstats.alias("b")),
            (F.col("a.metric") == F.col("b.metric"))
            & (F.col("b.pid") < F.col("a.pid")),
            "left",
        )
        .groupBy(F.col("a.pid").alias("pid"), F.col("a.metric").alias("metric"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("before_cnt"))
    )
    ntot = pstats.groupBy("metric").agg(F.sum("cnt").alias("n"))
    ranked2 = (
        ranked.join(F.broadcast(before), ["pid", "metric"])
        .join(F.broadcast(ntot), ["metric"])
        .withColumn("rank", F.col("before_cnt") + F.col("rn"))
    )
    # Closed-form NTILE(4): first (n mod 4) tiles hold (n div 4 + 1) rows.
    q = F.expr(
        "CASE WHEN rank <= (n % 4) * (n div 4 + 1)"
        " THEN (rank - 1) div (n div 4 + 1) + 1"
        " ELSE (n % 4) + (rank - (n % 4) * (n div 4 + 1) - 1)"
        "      div greatest(n div 4, 1) + 1 END"
    )
    return (
        ranked2.groupBy("user_id")
        .agg(
            F.max("frequency").alias("frequency"),
            F.max("monetary").alias("monetary"),
            F.max(F.when(F.col("metric") == 0, q))
            .cast("integer")
            .alias("r_quartile"),
            F.max(F.when(F.col("metric") == 1, q))
            .cast("integer")
            .alias("f_quartile"),
            F.max(F.when(F.col("metric") == 2, q))
            .cast("integer")
            .alias("m_quartile"),
        )
        .select(
            "user_id",
            "frequency",
            "monetary",
            "r_quartile",
            "f_quartile",
            "m_quartile",
        )
    )


@register(
    "user_modal_event_type",
    oracle="""
    SELECT user_id, event_type AS modal_type, n_events
    FROM (SELECT user_id, event_type, COUNT(*) AS n_events,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    """,
)
def user_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode: each user's most frequent event type (ties broken
    lexicographically so the winner is unique).

    Spark-first: two stacked aggregates — (user, type) counts, then
    ``min_by`` over ``struct(-n, type)`` (min of negated count = max count,
    tie falls to the smaller type string). Both stages are map-side
    combinable and shuffle only on user-derived keys; no window ever sees
    the raw event table, unlike the oracle's row_number formulation."""
    e = load_events(spark, sf_dir)
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    pick = F.struct((-F.col("n_events")).alias("neg_n"), F.col("event_type"))
    return counts.groupBy("user_id").agg(
        F.min_by("event_type", pick).alias("modal_type"),
        F.max("n_events").alias("n_events"),
    )


# ---------------------------------------------------------- path mining
# Frequent navigation paths: each user's events in (ts, event_id) order
# form an event-type sequence; sliding 3-grams over those sequences,
# counted corpus-wide, surface the dominant flows (browse>click>purchase
# vs browse>click>error). One shuffle on user_id builds the sequences
# (collect_list is map-side combinable, the sort is bounded by per-user
# event count), the 3-gram fan-out is partition-local, and the final count
# is the term-frequency shape. The deterministic (ts, event_id) struct sort
# is what makes the sequences — and therefore the counts — engine-exact.
@register(
    "events_user_path_ngrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
        FROM events GROUP BY user_id
    ),
    paths AS (
        -- list-form generate_series takes the per-row column bound (the
        -- TABLE function would not), so the series is exact for any
        -- sequence length — no fixed cap to silently overflow when the
        -- driver regenerates testdata with heavier users
        -- indexed, not types[i:i+2]: the slice costs O(offset) per row in
        -- DuckDB, quadratic in a heavy user's event count. concat_ws, not
        -- concat: a NULL element must be SKIPPED with its separator
        -- (matching array_to_string and the Spark side's concat_ws) —
        -- plain concat keeps both separators around a dropped NULL
        SELECT concat_ws('>', types[i], types[i+1], types[i+2]) AS path
        FROM (SELECT types, unnest(generate_series(1, len(types) - 2)) AS i
              FROM seq)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path
    LIMIT 25
    """,
)
def events_user_path_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 3-step event-type paths across all user sequences; see the
    section comment."""
    e = load_events(spark, sf_dir)
    pair = F.struct("ts", "event_id", "event_type")
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(pair)), lambda s: s["event_type"]
        ).alias("types")
    )
    grams = F.expr(
        "CASE WHEN size(types) >= 3 THEN"
        " transform(sequence(0, size(types) - 3),"
        "   i -> concat_ws('>', types[i], types[i+1], types[i+2]))"
        " ELSE array() END"
    )
    return (
        seq.select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(25)
    )


# ----------------------------------------------------- co-occurrence pairs
# Market-basket analysis over per-user event baskets: which event types
# occur together in the same user's history, with support (user count) and
# lift-style independence ratio. The basket is the DISTINCT (user, type)
# projection, so the pair join fans out by basket size — bounded by the
# event-type vocabulary (|types| small), never by event volume. Support
# and both marginals come from the same distinct projection; the ratio is
# scaled fixed-point integer (lift * 10^4) so the output is engine-exact.
_PAIR_MIN_SUPPORT = 5


@register(
    "events_type_cooccurrence",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    marg AS (
        SELECT event_type, COUNT(*) AS m FROM basket GROUP BY event_type
    ),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM basket),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS support
        FROM basket a JOIN basket b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, CAST(p.support AS BIGINT) AS support,
           CAST(p.support * n.n_users * 10000 // (ma.m * mb.m) AS BIGINT)
               AS lift_x10000
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.type_a
    JOIN marg mb ON mb.event_type = p.type_b
    CROSS JOIN n
    WHERE p.support >= {_PAIR_MIN_SUPPORT}
    """,
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type pair support and fixed-point lift over user baskets; see
    the section comment."""
    e = load_events(spark, sf_dir)
    basket = e.select("user_id", "event_type").distinct()
    marg = basket.groupBy("event_type").agg(F.count("*").alias("m"))
    n = basket.agg(F.countDistinct("user_id").alias("n_users"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _PAIR_MIN_SUPPORT)
    )
    ma, mb = marg.alias("ma"), marg.alias("mb")
    return (
        pairs.join(F.broadcast(ma), F.col("type_a") == F.col("ma.event_type"))
        .join(F.broadcast(mb), F.col("type_b") == F.col("mb.event_type"))
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("support").cast("long").alias("support"),
            F.expr("(support * n_users * 10000) div (ma.m * mb.m)")
            .cast("long")
            .alias("lift_x10000"),
        )
    )


# ------------------------------------------------------ inter-arrival gaps
# Per-user event cadence: lag each user's events by (ts, event_id) order
# and profile the inter-arrival gap in EXACT integer microseconds
# (timestampdiff on the NTZ timestamps — no float seconds, no tz
# dependence). High-cardinality window partition key (user_id), so
# parallelism scales with the user base; the output is the per-user gap
# profile a rate-limiter or bot detector consumes.
@register(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               DATEDIFF('microsecond',
                        LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id),
                        ts) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_gap_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap profile in exact integer microseconds; see
    the section comment."""
    e = load_events(spark, sf_dir)
    gaps = e.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr("sum(gap_us) div count(gap_us)").alias("mean_gap_us"),
    )


# ------------------------------------------- cumulative distinct users
@register(
    "events_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
        GROUP BY user_id
    ),
    daily_new AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily_new
    """,
)
def events_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running count of distinct users ever seen, per day — the growth-curve
    query. A naive COUNT(DISTINCT) OVER (ORDER BY day) re-deduplicates the
    whole history per day; the scale-safe shape is first-seen-day per user
    (one user_id aggregate) -> daily new-user counts (|days| rows) -> a
    cumulative window over that bounded aggregate. The global window is
    allowlisted in the plan lint because its input is the |days| aggregate,
    same class as the curation bucket cumsums."""
    e = load_events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily_new.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# ------------------------------------------------- market-basket mining
# Association rules over order baskets: which parts sell together. The
# pair expansion is a self-join of the DISTINCT (order, part) table on the
# order key — fan-out is sum over orders of k², bounded because basket
# sizes are bounded (TPC-H: <= 7 lines/order at any SF; cap or sample
# pathological baskets at ingest if a data source can't guarantee that).
# Support/confidence/lift come out in exact integer / fixed-point form.
_BASKET_MIN_SUPPORT = 3
_LIFT_SCALE = 10_000


@register(
    "basket_part_pairs",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM items),
    pc AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_part FROM items GROUP BY part),
    pairs AS (
        SELECT a.part AS part_a, b.part AS part_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM items a JOIN items b
          ON a.okey = b.okey AND a.part < b.part
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT part_a, part_b, support,
           (100 * support) // ca.n_part AS conf_a_to_b_pct,
           (100 * support) // cb.n_part AS conf_b_to_a_pct,
           (support * n.n_orders * {_LIFT_SCALE}) // (ca.n_part * cb.n_part)
               AS lift_fp
    FROM pairs
    JOIN pc ca ON part_a = ca.part
    JOIN pc cb ON part_b = cb.part
    CROSS JOIN n
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs across order baskets with integer confidence
    (percent) and fixed-point lift — the association-mining deliverable
    (recommendation candidates / planogram signals). See section comment
    for the bounded-fan-out scale argument."""
    from pathlib import Path

    l = read_star_parquet(spark, str(Path(sf_dir) / "lineitem.parquet"))
    items = l.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n_row = items.agg(F.countDistinct("okey").alias("n_orders"))
    pc = items.groupBy("part").agg(F.count("*").alias("n_part"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    ca = pc.select(F.col("part").alias("part_a"), F.col("n_part").alias("n_a"))
    cb = pc.select(F.col("part").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_row))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr("(100 * support) div n_a").alias("conf_a_to_b_pct"),
            F.expr("(100 * support) div n_b").alias("conf_b_to_a_pct"),
            F.expr(
                f"(support * n_orders * {_LIFT_SCALE}) div (n_a * n_b)"
            ).alias("lift_fp"),
        )
    )


# ------------------------------------------------- experiment analysis
@register(
    "events_ab_metrics",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN {portable_hash32_sql("'exp1' || CAST(user_id AS VARCHAR)")} % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM events
    ),
    purchasers AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               {dsum_sql('value')} AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_converted,
           (1000 * COUNT(p.user_id)) // COUNT(*) AS conversion_permille,
           CAST(SUM(COALESCE(n_purchases, 0)) AS BIGINT) AS n_purchases,
           COALESCE({dsum_sql('purchase_value')}, 0.0) AS total_value
    FROM assigned a LEFT JOIN purchasers p USING (user_id)
    GROUP BY variant
    """,
)
def events_ab_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC hash assignment (salted
    user-id hash — the same function that assigns users in production, so
    the analysis joins no assignment table) and exact metrics per variant:
    users, converters, integer-permille conversion, purchase volume. The
    variant aggregate is two map-side-combinable shuffles on user_id.
    Engineering note: value sums re-enter exact decimal at the second
    aggregation level, so the totals stay partition-order-independent."""
    from polars_ad_etl_spark.functions.hashing import portable_hash32

    e = load_events(spark, sf_dir)
    assigned = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                portable_hash32(
                    F.concat(F.lit("exp1"), F.col("user_id").cast("string"))
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("variant"),
        )
    )
    purchasers = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            dsum("value").alias("purchase_value"),
        )
    )
    joined = assigned.join(purchasers, "user_id", "left_outer")
    return joined.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.count("n_purchases").alias("n_converted"),
        F.expr("(1000 * count(n_purchases)) div count(*)").alias(
            "conversion_permille"
        ),
        F.sum(F.coalesce("n_purchases", F.lit(0))).alias("n_purchases"),
        F.coalesce(dsum("purchase_value"), F.lit(0.0)).alias("total_value"),
    )


# ------------------------------------------------- daily trend (integer OLS)
@register(
    "events_daily_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) * SUM(t * y) - SUM(t) * SUM(y) AS BIGINT)
               AS slope_num,
           CAST(COUNT(*) * SUM(t * t) - SUM(t) * SUM(t) AS BIGINT)
               AS slope_den,
           CAST(SUM(y) AS BIGINT) AS total_events
    FROM daily
    GROUP BY event_type
    """,
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend as an EXACT least-squares slope over daily
    counts: slope = slope_num / slope_den with both sides integer (day
    index x integer counts), so the fit is engine- and partition-exact —
    no float regression needed to rank which event types are growing.
    Two stacked map-side-combinable aggregates (day grain, then type);
    the day index is a tz-free date difference."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("t"),
    ).agg(F.count("*").alias("y"))
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (
            F.count("*") * F.sum(F.col("t") * F.col("y"))
            - F.sum("t") * F.sum("y")
        ).alias("slope_num"),
        (
            F.count("*") * F.sum(F.col("t") * F.col("t"))
            - F.sum("t") * F.sum("t")
        ).alias("slope_den"),
        F.sum("y").alias("total_events"),
    )


# ------------------------------------------- seasonality-aware anomalies
@register(
    "events_seasonal_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour_start,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    baseline AS (
        SELECT event_type, hod,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(n) AS BIGINT) AS total_n
        FROM hourly GROUP BY 1, 2
    )
    SELECT h.event_type, h.hour_start, h.n,
           b.n_obs, b.total_n,
           (2 * h.n * b.n_obs > 3 * b.total_n) AS spike,
           (2 * h.n * b.n_obs < b.total_n) AS dip
    FROM hourly h JOIN baseline b USING (event_type, hod)
    """,
)
def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted volume anomalies: each (type, hour) bucket is
    compared against the baseline for ITS OWN hour-of-day (so the nightly
    lull never reads as a dip and the daily peak never as a spike —
    the flaw of the global-moment detector ``events_value_anomalies`` for
    strongly diurnal series). Thresholds are exact integer
    cross-multiplications (spike: n > 1.5x its hod mean; dip: n < 0.5x),
    no floats anywhere. Two stacked aggregates + a broadcast-scale join
    on (type, hod) — 24x|types| baseline rows."""
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count("*").alias("n"))
    baseline = hourly.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_obs"), F.sum("n").alias("total_n")
    )
    return (
        hourly.join(F.broadcast(baseline), ["event_type", "hod"])
        .select(
            "event_type",
            "hour_start",
            "n",
            "n_obs",
            "total_n",
            (2 * F.col("n") * F.col("n_obs") > 3 * F.col("total_n")).alias(
                "spike"
            ),
            (2 * F.col("n") * F.col("n_obs") < F.col("total_n")).alias("dip"),
        )
    )


# ------------------------------------------------------- activity heatmap
@register(
    "events_dow_hour_heatmap",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activity heatmap behind every ops dashboard: event and distinct
    user counts per (type, ISO day-of-week, hour-of-day). Extraction is
    tz-free wall-clock field math on the NTZ timestamps; output is the
    bounded |types|x7x24 grid. Spark's dayofweek is Sunday=1, so the ISO
    value is derived arithmetically to match the oracle."""
    e = load_events(spark, sf_dir)
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    return e.groupBy(
        "event_type",
        iso_dow.alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------- retention hazard rates
@register(
    "retention_hazard_rates",
    oracle="""
    WITH span AS (
        SELECT user_id,
               DATEDIFF('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
                   // 7 AS tenure_w
        FROM events GROUP BY user_id
    ), cohort AS (
        SELECT tenure_w, COUNT(*) AS n_churned FROM span GROUP BY tenure_w
    )
    SELECT a.tenure_w AS tenure_weeks,
           CAST(a.n_churned AS BIGINT) AS n_churned,
           CAST(SUM(b.n_churned) AS BIGINT) AS n_at_risk,
           CAST((1000 * a.n_churned) // SUM(b.n_churned) AS BIGINT)
               AS hazard_permille
    FROM cohort a JOIN cohort b ON b.tenure_w >= a.tenure_w
    GROUP BY a.tenure_w, a.n_churned
    ORDER BY tenure_weeks
    """,
)
def retention_hazard_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard (the Kaplan-Meier building block): a
    user's tenure is full weeks between first and last activity; the hazard
    at week w is users churning at exactly w over users still at risk at w,
    in exact integer permille. The survival denominator is a suffix sum
    computed by a triangular self-join ON THE TINY TENURE AGGREGATE
    (|weeks| rows — broadcast; base data is touched once by the per-user
    min/max aggregation). Day arithmetic is on DATE casts of the NTZ wall
    clock, so the result is session-timezone-free."""
    e = load_events(spark, sf_dir)
    span = e.groupBy("user_id").agg(
        F.expr(
            "datediff(CAST(max(ts) AS DATE), CAST(min(ts) AS DATE)) div 7"
        ).alias("tenure_w")
    )
    cohort = span.groupBy("tenure_w").agg(F.count("*").alias("n_churned"))
    b = cohort.select(
        F.col("tenure_w").alias("w2"), F.col("n_churned").alias("c2")
    )
    return (
        cohort.join(F.broadcast(b), F.col("w2") >= F.col("tenure_w"))
        .groupBy("tenure_w", "n_churned")
        .agg(F.sum("c2").alias("n_at_risk"))
        .select(
            F.col("tenure_w").alias("tenure_weeks"),
            "n_churned",
            "n_at_risk",
            F.expr("(1000 * n_churned) div n_at_risk").alias(
                "hazard_permille"
            ),
        )
        .orderBy("tenure_weeks")
    )


# --------------------------------------------- session bounce rate
@register(
    "events_session_bounce_rate",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    ), sessions AS (
        SELECT user_id, sid,
               CAST(MIN(ts) AS DATE) AS day,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           CAST((1000 * COUNT(*) FILTER (WHERE n_events = 1)) // COUNT(*)
                AS BIGINT) AS bounce_permille
    FROM sessions
    GROUP BY day
    ORDER BY day
    """,
)
def events_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing exactly
    one event, keyed by the session's start day — the engagement KPI on top
    of the verified sessionization primitive. Spark uses the native
    session_window operator; the oracle re-derives sessions with the
    lag-gap-cumsum program, so the two formulations are proven equal at the
    KPI level too. Two aggregations, both map-side-combinable; no window on
    the Spark side at all."""
    e = load_events(spark, sf_dir)
    sessions = e.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return (
        sessions.select(
            F.col("w.start").cast("date").alias("day"), "n_events"
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
                "n_bounces"
            ),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            F.expr("(1000 * n_bounces) div n_sessions").alias(
                "bounce_permille"
            ),
        )
        .orderBy("day")
    )


# --------------------------------------- sequential EWMA (stateful fold)
#
# An exponentially weighted moving average is inherently SEQUENTIAL state —
# s_i = f(s_{i-1}, x_i) — the op class SQL engines usually push to UDFs.
# With alpha = 1/2 on integer cents the recurrence stays in exact integer
# arithmetic (s_i = (x_i + s_{i-1}) div 2), so both engines can replay it
# bit-for-bit: DuckDB as a recursive CTE (one level per event index — fine
# for an oracle, wrong as a plan), Spark as a single JVM aggregate() fold
# over each user's sorted event array (one user_id shuffle, no recursion,
# no Python) — the events_cep_funnel_instances execution pattern applied to
# numeric state. Truncating integer division matches between engines
# (both truncate toward zero; inputs here are nonnegative anyway).
@register(
    "events_value_ewma",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS i
        FROM events
    ), walk AS (
        SELECT user_id, i, cents AS ewma FROM ordered WHERE i = 1
        UNION ALL
        SELECT o.user_id, o.i, (o.cents + w.ewma) // 2
        FROM walk w
        JOIN ordered o ON o.user_id = w.user_id AND o.i = w.i + 1
    ), last AS (
        SELECT user_id, MAX(i) AS n FROM walk GROUP BY user_id
    )
    SELECT w.user_id,
           CAST(l.n AS BIGINT) AS n_events,
           CAST(w.ewma AS BIGINT) AS ewma_cents
    FROM walk w JOIN last l ON l.user_id = w.user_id AND w.i = l.n
    ORDER BY w.user_id
    """,
)
def events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's half-life-one EWMA of event value after their final
    event, in exact integer cents — the smoothed-engagement feature a
    ranking model consumes. See the section comment for the fold-vs-
    recursion proof strategy."""
    e = load_events(spark, sf_dir)
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).alias("ts_us"),
                F.col("event_id"),
                F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("ev")).alias("seq"))
    )
    # the zero accumulator's ewma is a typed NULL, not literal 0: Spark
    # derives the fold's state type from the zero value, and a
    # non-nullable field silently coerces a NULL intermediate (NULL cents
    # poisoning the average, as in the oracle's recursion) to 0
    fold = """
        aggregate(
            seq,
            named_struct('ewma', CAST(NULL AS BIGINT), 'n', CAST(0 AS BIGINT)),
            (acc, x) -> IF(acc.n = 0,
                named_struct('ewma', x.cents, 'n', CAST(1 AS BIGINT)),
                named_struct('ewma', (x.cents + acc.ewma) div 2,
                             'n', acc.n + 1)),
            acc -> acc)
    """
    return seqs.select(
        "user_id", F.expr(fold).alias("acc")
    ).select(
        "user_id",
        F.col("acc.n").alias("n_events"),
        F.col("acc.ewma").alias("ewma_cents"),
    ).orderBy("user_id")


# ------------------------------------------ funnel conversion latency
@register(
    "events_funnel_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
        GROUP BY e.user_id
    ), lat AS (
        SELECT DATEDIFF('microsecond', v.v_ts, p.p_ts) AS lat_us
        FROM v JOIN p ON p.user_id = v.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
           CAST(MIN(lat_us) AS BIGINT) AS lat_us_min,
           round(quantile_cont(lat_us, 0.5), 4) AS lat_us_p50,
           round(quantile_cont(lat_us, 0.9), 4) AS lat_us_p90,
           round(quantile_cont(lat_us, 0.99), 4) AS lat_us_p99,
           CAST(MAX(lat_us) AS BIGINT) AS lat_us_max
    FROM lat
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first view to the first
    purchase at-or-after it, summarized as exact interpolated percentiles
    of the microsecond latency (the established round(4) cross-engine
    percentile contract). Two user-keyed aggregations and one user-keyed
    join — a single shuffle family on the high-cardinality key; the
    percentile runs over the converters-only aggregate."""
    e = load_events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = v.join(p, "user_id").select(
        F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)").alias("lat_us")
    )
    return lat.agg(
        F.count("*").alias("n_converters"),
        F.min("lat_us").cast("long").alias("lat_us_min"),
        F.round(F.percentile("lat_us", 0.5), 4).alias("lat_us_p50"),
        F.round(F.percentile("lat_us", 0.9), 4).alias("lat_us_p90"),
        F.round(F.percentile("lat_us", 0.99), 4).alias("lat_us_p99"),
        F.max("lat_us").cast("long").alias("lat_us_max"),
    )


# ------------------------------------------------ cohort LTV curve
@register(
    "events_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week,
               CAST(MIN(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ), spend AS (
        SELECT f.cohort_week,
               DATEDIFF('day', f.first_day, CAST(e.ts AS DATE)) // 7
                   AS age_week,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
    ), weekly AS (
        SELECT cohort_week, age_week,
               CAST(SUM(cents) AS BIGINT) AS week_cents
        FROM spend GROUP BY cohort_week, age_week
    )
    SELECT cohort_week, age_week, week_cents,
           CAST(SUM(week_cents) OVER (PARTITION BY cohort_week
                                      ORDER BY age_week
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents,
           CAST((1000 * SUM(week_cents) OVER (PARTITION BY cohort_week
                                              ORDER BY age_week
                                              ROWS UNBOUNDED PRECEDING))
                // SUM(week_cents) OVER (PARTITION BY cohort_week)
                AS BIGINT) AS cum_share_permille
    FROM weekly
    ORDER BY cohort_week, age_week
    """,
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value accumulation by signup cohort: purchase cents per
    user-age week, cumulated within each cohort (exact integer, permille of
    the cohort's final LTV) — the curve growth teams read to decide when a
    cohort has "matured". Age is measured from each user's own first event
    (tz-free date arithmetic); the cumsum window is partitioned by cohort
    over the tiny (cohort × age) aggregate, never the event table."""
    e = load_events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"),
        F.min("ts").cast("date").alias("first_day"),
    )
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("ts").cast("date"), F.col("first_day"))
                / 7
            )
            .cast("int")
            .alias("age_week"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    weekly = spend.groupBy("cohort_week", "age_week").agg(
        F.sum("cents").alias("week_cents")
    )
    cw = W.partitionBy("cohort_week")
    cum = F.sum("week_cents").over(
        cw.orderBy("age_week").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        weekly.select(
            "cohort_week",
            "age_week",
            "week_cents",
            cum.alias("cum_cents"),
            F.sum("week_cents").over(cw).alias("total_cents"),
        )
        .select(
            "cohort_week",
            "age_week",
            "week_cents",
            "cum_cents",
            F.expr("(1000 * cum_cents) div total_cents").alias(
                "cum_share_permille"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )


# -------------------------------------------- customer band migration
@register(
    "customer_band_migration",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ), banded AS (
        SELECT o_custkey, yr,
               CASE WHEN cents < 20000000 THEN 'low'
                    WHEN cents < 60000000 THEN 'mid'
                    ELSE 'high' END AS band
        FROM spend
    )
    SELECT a.band AS band_from, b.band AS band_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM banded a
    JOIN banded b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def customer_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year spend-band migration matrix (low/mid/high by annual
    order cents): who upgraded, who churned down — the segment-transition
    counterpart of [[events_transition_matrix]] at the customer-value
    grain. One aggregation to (customer, year) then a self-join on
    (customer, adjacent year); the matrix output is |bands|² per year
    pair. All thresholds exact integer cents."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    spend = orders.groupBy(
        "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    banded = spend.select(
        "o_custkey",
        "yr",
        F.when(F.col("cents") < 20_000_000, "low")
        .when(F.col("cents") < 60_000_000, "mid")
        .otherwise("high")
        .alias("band"),
    )
    a = banded.select(
        F.col("o_custkey").alias("ck"),
        F.col("yr").alias("yra"),
        F.col("band").alias("band_from"),
    )
    b = banded.select(
        F.col("o_custkey").alias("ckb"),
        F.col("yr").alias("yrb"),
        F.col("band").alias("band_to"),
    )
    return (
        a.join(b, (F.col("ckb") == F.col("ck")) & (F.col("yrb") == F.col("yra") + 1))
        .groupBy("band_from", "band_to")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("band_from", "band_to")
    )


# ------------------------------------------------- bot suspect scoring
@register(
    "events_bot_suspects",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               DATEDIFF('microsecond',
                        LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts) AS gap_us
        FROM events
    ), gap_stats AS (
        SELECT user_id,
               round(quantile_cont(gap_us, 0.5), 4) AS median_gap_us
        FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    ), mix AS (
        SELECT user_id, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), diversity AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST((1000 * (SUM(c) * SUM(c) - SUM(c * c)))
                    // (SUM(c) * SUM(c)) AS BIGINT) AS diversity_permille
        FROM mix GROUP BY user_id
    )
    SELECT d.user_id, d.n_events, d.diversity_permille, g.median_gap_us
    FROM diversity d JOIN gap_stats g ON g.user_id = d.user_id
    WHERE d.n_events >= 30
      AND d.diversity_permille <= 700
      AND g.median_gap_us <= 21600000000
    ORDER BY d.user_id
    """,
)
def events_bot_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot shortlist composing three verified per-user signals:
    high volume (≥30 events), low behavioral diversity (Gini-Simpson ≤
    0.7 — the [[events_simpson_diversity]] statistic), and a tight median
    inter-event gap (≤6 h; interpolated median of exact integer µs gaps —
    the average of two int64s is exact in doubles, so the threshold
    comparison cannot flip between engines). Everything shuffles once on
    user_id; the three signal aggregates join on that same key."""
    e = load_events(spark, sf_dir)
    gaps = e.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gap_stats = gaps.groupBy("user_id").agg(
        F.round(F.percentile("gap_us", 0.5), 4).alias("median_gap_us")
    )
    mix = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    diversity = mix.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.expr(
            "(1000 * (sum(c) * sum(c) - sum(c * c)))"
            " div (sum(c) * sum(c))"
        ).alias("diversity_permille"),
    )
    return (
        diversity.join(gap_stats, "user_id")
        .filter(
            (F.col("n_events") >= 30)
            & (F.col("diversity_permille") <= 700)
            & (F.col("median_gap_us") <= 21_600_000_000)
        )
        .select(
            "user_id", "n_events", "diversity_permille", "median_gap_us"
        )
        .orderBy("user_id")
    )


# -------------------------------------------- new vs returning users
@register(
    "events_new_vs_returning",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ), daily AS (
        SELECT CAST(e.ts AS DATE) AS day, e.user_id,
               CAST(e.ts AS DATE) = f.first_day AS is_new
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        GROUP BY 1, 2, 3
    )
    SELECT day,
           CAST(COUNT(*) FILTER (WHERE is_new) AS BIGINT) AS new_users,
           CAST(COUNT(*) FILTER (WHERE NOT is_new) AS BIGINT)
               AS returning_users,
           CAST((1000 * COUNT(*) FILTER (WHERE is_new)) // COUNT(*)
                AS BIGINT) AS new_share_permille
    FROM daily GROUP BY day ORDER BY day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user split (the growth-accounting
    KPI): a user is "new" on the calendar day of their first event,
    returning on any later active day. Distinct (day, user) pairs join the
    per-user first-day aggregate on user_id — the cohort-retention scale
    shape reused; all arithmetic exact integer."""
    e = load_events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    daily = (
        e.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .join(firsts, "user_id")
        .select("day", (F.col("day") == F.col("first_day")).alias("is_new"))
    )
    return (
        daily.groupBy("day")
        .agg(
            F.sum(F.col("is_new").cast("long")).alias("new_users"),
            F.sum((~F.col("is_new")).cast("long")).alias("returning_users"),
        )
        .select(
            "day",
            "new_users",
            "returning_users",
            F.expr(
                "(1000 * new_users) div (new_users + returning_users)"
            ).alias("new_share_permille"),
        )
        .orderBy("day")
    )


# ------------------------------------- recency-decay weighted value
@register(
    "events_recency_weighted_value",
    oracle="""
    WITH aged AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               LEAST(DATEDIFF('day', CAST(ts AS DATE), DATE '2024-01-31'),
                     CAST(30 AS BIGINT)) AS age_days
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents // (CAST(1 AS BIGINT) << age_days)) AS BIGINT)
               AS decayed_cents
    FROM aged GROUP BY user_id
    HAVING SUM(cents // (CAST(1 AS BIGINT) << age_days)) > 0
    ORDER BY user_id
    """,
)
def events_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed purchase value per user with a one-day half-life:
    each purchase contributes cents / 2^age_days (integer shift — the decay
    stays EXACT instead of a float exp()), ages capped at 30 days and
    measured from the corpus horizon date. The ranking feature recommender
    pipelines want, with bit-for-bit reproducibility. One aggregation on
    user_id; users fully decayed to zero are dropped identically by both
    engines."""
    e = load_events(spark, sf_dir)
    aged = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.least(
            F.datediff(
                F.lit("2024-01-31").cast("date"), F.col("ts").cast("date")
            ).cast("long"),
            F.lit(30).cast("long"),
        ).alias("age_days"),
    )
    return (
        aged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.expr("cents div shiftleft(CAST(1 AS BIGINT), CAST(age_days AS INT))")
            ).alias("decayed_cents"),
        )
        .filter(F.col("decayed_cents") > 0)
        .orderBy("user_id")
    )


# -------------------------------------------- feature assembly / hashing
@register(
    "user_feature_vector",
    oracle="""
    WITH base AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               COUNT(*) FILTER (WHERE event_type = 'purchase')
                   AS n_purchases,
               COALESCE(SUM(CAST(round(value * 100) AS BIGINT))
                        FILTER (WHERE event_type = 'purchase'), 0)
                   AS purchase_cents,
               COUNT(DISTINCT event_type) AS n_types,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days,
               DATEDIFF('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
                   AS tenure_days
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(purchase_cents AS BIGINT) AS purchase_cents,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(n_active_days AS BIGINT) AS n_active_days,
           CAST(tenure_days AS BIGINT) AS tenure_days,
           CAST((1000 * n_active_days) // (tenure_days + 1) AS BIGINT)
               AS activity_density_permille
    FROM base ORDER BY user_id
    """,
)
def user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user feature row a training pipeline materializes: volume,
    purchase count and exact cents, type breadth, active days, tenure, and
    an activity-density ratio — ALL from ONE aggregation pass over events
    (count-distincts included; Catalyst plans the multi-distinct with
    expand, still a single user_id shuffle family). Integer arithmetic
    end-to-end; density denominates tenure+1 so day-one users are defined
    identically in both engines."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n_purchases"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.expr("CAST(round(value * 100) AS BIGINT)"),
                    )
                ),
                F.lit(0),
            ).alias("purchase_cents"),
            F.count_distinct("event_type").alias("n_types"),
            F.count_distinct(F.col("ts").cast("date")).alias(
                "n_active_days"
            ),
            F.datediff(
                F.max("ts").cast("date"), F.min("ts").cast("date")
            )
            .cast("long")
            .alias("tenure_days"),
        )
        .withColumn(
            "activity_density_permille",
            F.expr("(1000 * n_active_days) div (tenure_days + 1)"),
        )
        .orderBy("user_id")
    )


_CROSS_BUCKETS = 256


@register(
    "events_feature_crosses",
    oracle=f"""
    WITH crossed AS (
        SELECT {portable_hash32_sql(
            "COALESCE(event_type, '~null~') || ':' || "
            "CAST(isodow(ts) AS VARCHAR) || ':' || "
            "COALESCE(CAST(CAST(round(value * 100) AS BIGINT) // 5000"
            " AS VARCHAR), '~null~')"
        )} % {_CROSS_BUCKETS} AS bucket
        FROM events
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM crossed GROUP BY bucket
    ORDER BY n_rows DESC, bucket LIMIT 30
    """,
)
def events_feature_crosses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing of the (event_type × ISO weekday × value-band)
    cross: the hashing-trick primitive that turns a combinatorial
    categorical cross into a fixed {B}-bucket space with no vocabulary
    state. Portable md5-derived hash (engine-identical), top-30 buckets by
    collision mass — the table you inspect to size B before training.
    Stateless projection + one aggregation.""".replace(
        "{B}", str(_CROSS_BUCKETS)
    )
    e = load_events(spark, sf_dir)
    from polars_ad_etl_spark.functions.hashing import portable_hash32

    # missing features hash as an explicit '~null~' token on BOTH engines:
    # concat_ws would silently drop the element (aliasing distinct crosses,
    # e.g. (NULL, 7, 3) with ('7', 3, ...)), and || would NULL-poison the
    # whole cross (lumping every missing-feature row into one bucket)
    crossed = e.select(
        (
            portable_hash32(
                F.concat_ws(
                    ":",
                    F.coalesce(F.col("event_type"), F.lit("~null~")),
                    F.expr("extract(dayofweek_iso FROM ts)").cast("string"),
                    F.coalesce(
                        F.expr(
                            "CAST(round(value * 100) AS BIGINT) div 5000"
                        ).cast("string"),
                        F.lit("~null~"),
                    ),
                )
            )
            % _CROSS_BUCKETS
        ).alias("bucket")
    )
    return (
        crossed.groupBy("bucket")
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), "bucket")
        .limit(30)
    )


@register(
    "events_ab_srm_check",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN {portable_hash32_sql("'exp1' || CAST(user_id AS VARCHAR)")} % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM events
    ), counts AS (
        SELECT CAST(COUNT(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b
        FROM assigned
    )
    SELECT n_a, n_b,
           CAST((1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
                AS BIGINT) AS srm_chi2_milli,
           (1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) > 3841
               AS srm_alarm
    FROM counts
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate for the [[events_ab_metrics]] experiment:
    the 1-df chi-square against the intended 50/50 split — χ² =
    (n_a−n_b)²/(n_a+n_b) — in exact integer milli-units, alarmed at the
    p≈0.05 critical value 3.841. The FIRST check any experiment readout
    must pass (a biased assignment invalidates every downstream metric).
    Same deterministic hash assignment as the metrics query; one distinct
    + one 2-row aggregate."""
    from polars_ad_etl_spark.functions.hashing import portable_hash32

    e = load_events(spark, sf_dir)
    assigned = e.select(
        "user_id",
        F.when(
            portable_hash32(
                F.concat(F.lit("exp1"), F.col("user_id").cast("string"))
            )
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    ).distinct()
    # count_if: COUNT-FILTER semantics (0 users on empty input, not NULL);
    # nullif keeps 0-div-0 as NULL instead of an ANSI error
    counts = assigned.agg(
        F.count_if(F.col("variant") == "A").alias("n_a"),
        F.count_if(F.col("variant") == "B").alias("n_b"),
    )
    return counts.select(
        "n_a",
        "n_b",
        F.expr(
            "(1000 * (n_a - n_b) * (n_a - n_b)) div nullif(n_a + n_b, 0)"
        ).alias("srm_chi2_milli"),
        (
            F.expr(
                "(1000 * (n_a - n_b) * (n_a - n_b))"
                " div nullif(n_a + n_b, 0)"
            )
            > 3841
        ).alias("srm_alarm"),
    )


@register(
    "orders_revenue_bridge",
    oracle="""
    WITH yearly AS (
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2
    ), wide AS (
        SELECT o_orderpriority,
               MAX(CASE WHEN yr = 1995 THEN n END) AS n0,
               MAX(CASE WHEN yr = 1995 THEN cents END) AS c0,
               MAX(CASE WHEN yr = 1996 THEN n END) AS n1,
               MAX(CASE WHEN yr = 1996 THEN cents END) AS c1
        FROM yearly GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, c0 AS rev1995_cents, c1 AS rev1996_cents,
           c1 - c0 AS delta_cents,
           (n1 - n0) * (c0 // n0) AS volume_effect_cents,
           (c1 - c0) - (n1 - n0) * (c0 // n0) AS price_mix_effect_cents
    FROM wide
    ORDER BY o_orderpriority
    """,
)
def orders_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (FP&A waterfall) per priority, 1995 → 1996: the
    year-over-year delta decomposed into a volume effect (order-count
    change at the base-year truncated average ticket) and the price/mix
    residual — defined as the exact remainder, so the two effects sum to
    the delta to the cent by construction. One two-year aggregation,
    conditional-max pivot, pure integer arithmetic."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    yearly = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_orderpriority",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("cents"),
        )
    )
    wide = yearly.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("yr") == 1995, F.col("cents"))).alias("c0"),
        F.max(F.when(F.col("yr") == 1996, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("yr") == 1996, F.col("cents"))).alias("c1"),
    )
    return wide.select(
        "o_orderpriority",
        F.col("c0").alias("rev1995_cents"),
        F.col("c1").alias("rev1996_cents"),
        (F.col("c1") - F.col("c0")).alias("delta_cents"),
        F.expr("(n1 - n0) * (c0 div n0)").alias("volume_effect_cents"),
        F.expr("(c1 - c0) - (n1 - n0) * (c0 div n0)").alias(
            "price_mix_effect_cents"
        ),
    ).orderBy("o_orderpriority")


# ---------------------------------------- forecast backtest (snaive)
@register(
    "events_snaive_backtest",
    oracle="""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), joined AS (
        SELECT a.day, a.hr, a.y,
               b.y AS yhat
        FROM hourly a
        JOIN hourly b ON b.day = a.day - 1 AND b.hr = a.hr
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(abs(y - yhat)) AS BIGINT) AS abs_err_sum,
           CAST(SUM(abs(y - yhat)) // COUNT(*) AS BIGINT) AS mae,
           CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact
    FROM joined
    """,
)
def events_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ[day,hour] = y[day−1,
    hour] — the baseline every real forecast must beat): exact integer MAE
    over all hour cells with a same-hour previous day. Two map-side
    aggregations and a self-join of the tiny day×hour grid; the metric a
    capacity-planning pipeline tracks before trusting anything fancier."""
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count("*").alias("y"))
    a = hourly
    b = hourly.select(
        F.col("day").alias("pday"),
        F.col("hr").alias("phr"),
        F.col("y").alias("yhat"),
    )
    joined = a.join(
        b,
        (F.col("pday") == F.date_sub(F.col("day"), 1))
        & (F.col("phr") == F.col("hr")),
    )
    return joined.agg(
        F.count("*").alias("n_points"),
        F.sum(F.abs(F.col("y") - F.col("yhat"))).alias("abs_err_sum"),
        F.expr("sum(abs(y - yhat)) div count(*)").alias("mae"),
        F.sum((F.col("y") == F.col("yhat")).cast("long")).alias("n_exact"),
    )


@register(
    "events_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY 1
    ), with_peak AS (
        SELECT a.day, a.v, CAST(MAX(b.v) AS BIGINT) AS peak
        FROM daily a JOIN daily b ON b.day <= a.day
        GROUP BY a.day, a.v
    ), dd AS (
        SELECT day, v, peak,
               CAST((1000 * (peak - v)) // peak AS BIGINT) AS dd_permille
        FROM with_peak
    )
    SELECT CAST(MAX(dd_permille) AS BIGINT) AS max_drawdown_permille,
           CAST(MIN(day) FILTER (WHERE dd_permille =
               (SELECT MAX(dd_permille) FROM dd)) AS DATE) AS trough_day
    FROM dd
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of daily event volume (largest permille drop from
    any prior peak — the engagement-collapse severity metric, borrowed
    from finance). The running peak is a triangular self-join ON THE
    BOUNDED DAILY AGGREGATE (|days|² pairs), not a global window; the
    trough day ties to the earliest date in both engines."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("v")
    )
    b = daily.select(F.col("day").alias("d2"), F.col("v").alias("v2"))
    with_peak = (
        daily.join(F.broadcast(b), F.col("d2") <= F.col("day"))
        .groupBy("day", "v")
        .agg(F.max("v2").alias("peak"))
    )
    dd = with_peak.select(
        "day",
        F.expr("(1000 * (peak - v)) div peak").alias("dd_permille"),
    )
    mx = dd.agg(F.max("dd_permille").alias("m"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .filter(F.col("dd_permille") == F.col("m"))
        .agg(
            F.max("dd_permille").alias("max_drawdown_permille"),
            F.min("day").alias("trough_day"),
        )
    )


@register(
    "events_autocorr_24h",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), pairs AS (
        SELECT a.y AS y0, b.y AS y1
        FROM hourly a
        JOIN hourly b ON b.hr = a.hr + INTERVAL 24 HOUR
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) * SUM(y0 * y1) - SUM(y0) * SUM(y1) AS BIGINT)
               AS autocov_num,
           CAST(COUNT(*) * SUM(y0 * y0) - SUM(y0) * SUM(y0) AS BIGINT)
               AS var0_num,
           CAST(COUNT(*) * SUM(y1 * y1) - SUM(y1) * SUM(y1) AS BIGINT)
               AS var1_num
    FROM pairs
    """,
)
def events_autocorr_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal periodicity check: the lag-24-hour autocovariance of hourly
    volume with the two variance numerators — all exact integers (the
    correlation itself needs a square root, so the engine emits the three
    exact numerators and the consumer forms r = cov/√(v0·v1); a strongly
    positive cov against same-scale variances confirms the daily cycle
    that [[events_seasonal_anomalies]] assumes). Self-join of the bounded
    hourly aggregate on a pure NTZ interval shift."""
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").alias("y")
    )
    b = hourly.select(
        F.expr("hr - INTERVAL 24 HOUR").alias("hr0"),
        F.col("y").alias("y1"),
    )
    pairs = hourly.join(b, F.col("hr0") == F.col("hr")).select(
        F.col("y").alias("y0"), "y1"
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        (
            F.count("*") * F.sum(F.col("y0") * F.col("y1"))
            - F.sum("y0") * F.sum("y1")
        ).alias("autocov_num"),
        (
            F.count("*") * F.sum(F.col("y0") * F.col("y0"))
            - F.sum("y0") * F.sum("y0")
        ).alias("var0_num"),
        (
            F.count("*") * F.sum(F.col("y1") * F.col("y1"))
            - F.sum("y1") * F.sum("y1")
        ).alias("var1_num"),
    )


# ------------------------------------------------- SRE error budget
@register(
    "events_error_budget",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                   AS n_errors
        FROM events GROUP BY 1
    ), t7 AS (
        SELECT a.day, a.n_events, a.n_errors,
               CAST(SUM(b.n_events) AS BIGINT) AS t7_events,
               CAST(SUM(b.n_errors) AS BIGINT) AS t7_errors
        FROM daily a JOIN daily b
          ON b.day BETWEEN a.day - 6 AND a.day
        GROUP BY 1, 2, 3
    )
    SELECT day, n_events, n_errors,
           CAST((1000 * n_errors) // n_events AS BIGINT) AS err_permille,
           CAST((1000 * t7_errors) // t7_events AS BIGINT)
               AS trailing7_err_permille,
           (1000 * t7_errors) // t7_events > 210 AS slo_breach
    FROM t7 ORDER BY day
    """,
)
def events_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget tracking over the ``error`` event stream: daily and
    trailing-7-day error rates in exact permille, with the SLO-breach flag
    at the 21% objective — the burn-rate view an on-call rotation pages
    on. The trailing window is a 7-day-bounded self-join ON THE DAILY
    AGGREGATE (never a window over raw events); integer division keeps the
    breach boundary engine-exact."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias(
            "n_errors"
        ),
    )
    b = daily.select(
        F.col("day").alias("d2"),
        F.col("n_events").alias("e2"),
        F.col("n_errors").alias("r2"),
    )
    trailing = (
        daily.join(
            F.broadcast(b),
            (F.col("d2") >= F.date_sub(F.col("day"), 6))
            & (F.col("d2") <= F.col("day")),
        )
        .groupBy("day", "n_events", "n_errors")
        .agg(
            F.sum("e2").alias("t7_events"), F.sum("r2").alias("t7_errors")
        )
    )
    return trailing.select(
        "day",
        "n_events",
        "n_errors",
        F.expr("(1000 * n_errors) div n_events").alias("err_permille"),
        F.expr("(1000 * t7_errors) div t7_events").alias(
            "trailing7_err_permille"
        ),
        (F.expr("(1000 * t7_errors) div t7_events") > 210).alias(
            "slo_breach"
        ),
    ).orderBy("day")


# ------------------------------------------- difference-in-differences
@register(
    "events_diff_in_diff",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN {portable_hash32_sql("'exp1' || CAST(user_id AS VARCHAR)")} % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM events
    ), outcomes AS (
        SELECT a.variant,
               CASE WHEN e.ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'before' ELSE 'after' END AS period,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN assigned a ON a.user_id = e.user_id
        WHERE e.event_type = 'purchase'
    ), cells AS (
        SELECT variant, period,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
        FROM outcomes GROUP BY 1, 2
    ), wide AS (
        SELECT
            MAX(CASE WHEN variant='A' AND period='before' THEN mean_cents END) AS a0,
            MAX(CASE WHEN variant='A' AND period='after'  THEN mean_cents END) AS a1,
            MAX(CASE WHEN variant='B' AND period='before' THEN mean_cents END) AS b0,
            MAX(CASE WHEN variant='B' AND period='after'  THEN mean_cents END) AS b1,
            CAST(SUM(n) AS BIGINT) AS n_purchases
        FROM cells
    )
    SELECT a0 AS control_before, a1 AS control_after,
           b0 AS treated_before, b1 AS treated_after,
           (b1 - b0) - (a1 - a0) AS did_cents,
           n_purchases
    FROM wide
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate for the hash-assigned experiment
    around a mid-month cutover: the treated group's purchase-value change
    minus the control group's — the causal-inference workhorse when a
    pre-period exists. Cell means are truncated integer cents (identical
    truncation both engines), the cutover timestamp is NTZ wall-clock, and
    the whole estimate is two aggregations over one user-keyed join; the
    SRM gate ([[events_ab_srm_check]]) validates the assignment first."""
    from polars_ad_etl_spark.functions.hashing import portable_hash32

    e = load_events(spark, sf_dir)
    assigned = e.select(
        "user_id",
        F.when(
            portable_hash32(
                F.concat(F.lit("exp1"), F.col("user_id").cast("string"))
            )
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    ).distinct()
    outcomes = (
        e.filter(F.col("event_type") == "purchase")
        .join(assigned, "user_id")
        .select(
            "variant",
            F.when(
                F.col("ts")
                < F.lit("2024-01-16 00:00:00").cast("timestamp_ntz"),
                "before",
            )
            .otherwise("after")
            .alias("period"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    cells = outcomes.groupBy("variant", "period").agg(
        F.count("*").alias("n"),
        F.expr("sum(cents) div count(*)").alias("mean_cents"),
    )
    wide = cells.agg(
        F.max(
            F.when(
                (F.col("variant") == "A") & (F.col("period") == "before"),
                F.col("mean_cents"),
            )
        ).alias("a0"),
        F.max(
            F.when(
                (F.col("variant") == "A") & (F.col("period") == "after"),
                F.col("mean_cents"),
            )
        ).alias("a1"),
        F.max(
            F.when(
                (F.col("variant") == "B") & (F.col("period") == "before"),
                F.col("mean_cents"),
            )
        ).alias("b0"),
        F.max(
            F.when(
                (F.col("variant") == "B") & (F.col("period") == "after"),
                F.col("mean_cents"),
            )
        ).alias("b1"),
        F.sum("n").alias("n_purchases"),
    )
    return wide.select(
        F.col("a0").alias("control_before"),
        F.col("a1").alias("control_after"),
        F.col("b0").alias("treated_before"),
        F.col("b1").alias("treated_after"),
        ((F.col("b1") - F.col("b0")) - (F.col("a1") - F.col("a0"))).alias(
            "did_cents"
        ),
        "n_purchases",
    )


@register(
    "events_conversion_cdf",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
        GROUP BY e.user_id
    ), lat AS (
        SELECT DATEDIFF('microsecond', v.v_ts, p.p_ts) AS us
        FROM v JOIN p ON p.user_id = v.user_id
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)
    SELECT (SELECT n FROM tot) AS n_viewers,
           CAST(COUNT(*) AS BIGINT) AS n_converters,
           CAST((1000 * COUNT(*) FILTER (WHERE us <= 60000000))
                // (SELECT n FROM tot) AS BIGINT) AS within_1m_permille,
           CAST((1000 * COUNT(*) FILTER (WHERE us <= 3600000000))
                // (SELECT n FROM tot) AS BIGINT) AS within_1h_permille,
           CAST((1000 * COUNT(*) FILTER (WHERE us <= 86400000000))
                // (SELECT n FROM tot) AS BIGINT) AS within_1d_permille,
           CAST((1000 * COUNT(*)) // (SELECT n FROM tot) AS BIGINT)
               AS ever_permille
    FROM lat
    """,
)
def events_conversion_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert CDF at the thresholds a growth review quotes:
    share of viewers converting within one minute, one hour, one day, or
    ever — exact integer permille over the viewer base (the distribution
    companion to [[events_funnel_latency]]'s percentiles). The viewer
    total rides as a broadcast scalar; the latency table is the same
    two-aggregate join."""
    e = load_events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = v.join(p, "user_id").select(
        F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)").alias("us")
    )
    tot = v.agg(F.count("*").alias("n"))
    # count_if: COUNT-FILTER semantics on zero converters (0, not NULL);
    # nullif: zero viewers makes the permilles NULL, not an ANSI error
    agg = lat.agg(
        F.count("*").alias("n_converters"),
        F.count_if(F.col("us") <= 60_000_000).alias("c1m"),
        F.count_if(F.col("us") <= 3_600_000_000).alias("c1h"),
        F.count_if(F.col("us") <= 86_400_000_000).alias("c1d"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_viewers"),
        "n_converters",
        F.expr("(1000 * c1m) div nullif(n, 0)").alias("within_1m_permille"),
        F.expr("(1000 * c1h) div nullif(n, 0)").alias("within_1h_permille"),
        F.expr("(1000 * c1d) div nullif(n, 0)").alias("within_1d_permille"),
        F.expr("(1000 * n_converters) div nullif(n, 0)").alias(
            "ever_permille"
        ),
    )


@register(
    "events_error_streaks",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               (1000 * COUNT(*) FILTER (WHERE event_type = 'error'))
                   // COUNT(*) > 205 AS breach
        FROM events GROUP BY 1
    ), flagged AS (
        SELECT day, breach,
               CASE WHEN breach AND NOT COALESCE(
                        LAG(breach) OVER (ORDER BY day), FALSE)
                    THEN 1 ELSE 0 END AS streak_start
        FROM daily
    ), streaks AS (
        SELECT day, breach,
               SUM(streak_start) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS streak_id
        FROM flagged
    ), lens AS (
        SELECT streak_id,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(day) AS DATE) AS streak_start_day
        FROM streaks WHERE breach GROUP BY streak_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(COALESCE(MAX(len), 0) AS BIGINT) AS longest_streak_days,
           CAST(MIN(streak_start_day) FILTER (
               WHERE len = (SELECT MAX(len) FROM lens)) AS DATE)
               AS longest_streak_start
    FROM lens
    """,
)
def events_error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breach-streak analytics over the daily error rate: how many
    consecutive-day breach runs occurred and the longest one — sustained
    degradation reads differently from scattered bad days in a
    postmortem. Classic gaps-and-islands over the BOUNDED daily aggregate
    (the |days| global window is the allowlisted class; here it rides the
    tiny aggregate, mirrored exactly by the oracle); earliest start wins
    ties in both engines."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        (
            F.expr(
                "(1000 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0"
                " END)) div count(*)"
            )
            > 205
        ).alias("breach")
    )
    # |days| rows: collapse to one partition explicitly (bounded by
    # construction) so no empty-partitionBy window appears in the plan
    seq = daily.coalesce(1).select(
        "day",
        "breach",
        F.expr(
            "CASE WHEN breach AND NOT coalesce("
            " lag(breach) OVER (ORDER BY day), false)"
            " THEN 1 ELSE 0 END"
        ).alias("streak_start"),
    )
    streaks = seq.select(
        "day",
        "breach",
        F.expr(
            "sum(streak_start) OVER (ORDER BY day"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("streak_id"),
    )
    lens = (
        streaks.filter("breach")
        .groupBy("streak_id")
        .agg(
            F.count("*").alias("len"),
            F.min("day").alias("streak_start_day"),
        )
    )
    mx = lens.agg(F.max("len").alias("mx"))
    return (
        lens.crossJoin(F.broadcast(mx))
        .agg(
            F.count("*").alias("n_streaks"),
            F.coalesce(F.max("len"), F.lit(0)).alias(
                "longest_streak_days"
            ),
            F.min(
                F.when(F.col("len") == F.col("mx"), F.col("streak_start_day"))
            ).alias("longest_streak_start"),
        )
    )


@register(
    "events_changepoint_day",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), splits AS (
        SELECT s.day AS split_day,
               CAST(SUM(CASE WHEN d.day <= s.day THEN d.y ELSE 0 END)
                    AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN d.day <= s.day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN d.day > s.day THEN d.y ELSE 0 END)
                    AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN d.day > s.day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1
        FROM daily s JOIN daily d ON TRUE
        GROUP BY s.day
    ), scored AS (
        SELECT split_day, n0, n1,
               abs(s0 * n1 - s1 * n0) AS score
        FROM splits WHERE n1 > 0
    )
    SELECT split_day AS changepoint_day,
           CAST(score AS BIGINT) AS score,
           n0 AS days_before, n1 AS days_after
    FROM scored
    ORDER BY score DESC, split_day
    LIMIT 1
    """,
)
def events_changepoint_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily volume: the split day
    maximizing the cross-multiplied mean difference |S₀·n₁ − S₁·n₀|
    between the before and after segments — the launch/incident locator,
    entirely in exact integers (the score is the mean gap scaled by
    n₀·n₁, so no division enters the argmax; ties to the earlier day).
    The split enumeration is a |days|² pair expansion on the bounded
    daily aggregate."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("y")
    )
    d = daily.select(F.col("day").alias("d2"), F.col("y").alias("y2"))
    splits = (
        daily.crossJoin(F.broadcast(d))
        .groupBy(F.col("day").alias("split_day"))
        .agg(
            F.sum(F.when(F.col("d2") <= F.col("day"), F.col("y2")).otherwise(0)).alias("s0"),
            F.sum(F.when(F.col("d2") <= F.col("day"), 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("d2") > F.col("day"), F.col("y2")).otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("d2") > F.col("day"), 1).otherwise(0)).alias("n1"),
        )
    )
    return (
        splits.filter(F.col("n1") > 0)
        .select(
            F.col("split_day").alias("changepoint_day"),
            F.abs(
                F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0")
            ).alias("score"),
            F.col("n0").alias("days_before"),
            F.col("n1").alias("days_after"),
        )
        .orderBy(F.desc("score"), "changepoint_day")
        .limit(1)
    )


@register(
    "events_wow_by_type",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS DATE) AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.week_start, a.n,
           b.n AS prev_n,
           CAST(a.n - b.n AS BIGINT) AS delta,
           CAST((1000 * (a.n - b.n)) // b.n AS BIGINT)
               AS growth_permille
    FROM weekly a
    JOIN weekly b ON b.event_type = a.event_type
                 AND b.week_start = a.week_start - 7
    ORDER BY a.event_type, a.week_start
    """,
)
def events_wow_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movement per event type — the reporting staple
    behind every "top movers" slide: each week's volume against the
    previous week with exact integer delta and growth permille
    (truncation toward zero identical in both engines, negative growth
    included). Adjacent weeks pair by a self-join on the bounded weekly
    aggregate, no window at all."""
    e = load_events(spark, sf_dir)
    weekly = e.groupBy(
        "event_type",
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
    ).agg(F.count("*").alias("n"))
    prev = weekly.select(
        F.col("event_type").alias("et2"),
        F.date_add(F.col("week_start"), 7).alias("ws2"),
        F.col("n").alias("prev_n"),
    )
    return (
        weekly.join(
            F.broadcast(prev),
            (F.col("et2") == F.col("event_type"))
            & (F.col("ws2") == F.col("week_start")),
        )
        .select(
            "event_type",
            "week_start",
            "n",
            "prev_n",
            (F.col("n") - F.col("prev_n")).alias("delta"),
            F.expr("(1000 * (n - prev_n)) div prev_n").alias(
                "growth_permille"
            ),
        )
        .orderBy("event_type", "week_start")
    )


@register(
    "events_dormancy_winback",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               DATEDIFF('day',
                        CAST(LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS DATE),
                        CAST(ts AS DATE)) AS gap_days
        FROM events
    ), users AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN gap_days >= 7 THEN 1 ELSE 0 END)
                    AS BIGINT) AS had_winback,
               CAST(COALESCE(MAX(gap_days), 0) AS BIGINT) AS max_gap_days
        FROM gaps GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(had_winback) AS BIGINT) AS n_winback_users,
           CAST((1000 * SUM(had_winback)) // COUNT(*) AS BIGINT)
               AS winback_permille,
           CAST(MAX(max_gap_days) AS BIGINT) AS longest_dormancy_days
    FROM users
    """,
)
def events_dormancy_winback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winback census: users who went dormant (≥7 calendar days between
    consecutive events) and then RETURNED — by construction every
    qualifying gap has an event on both sides, so these are reactivations,
    the audience a winback campaign studies. One user-partitioned lag plus
    two aggregations; day gaps are tz-free date arithmetic."""
    e = load_events(spark, sf_dir)
    gaps = e.select(
        "user_id",
        F.expr(
            "datediff(CAST(ts AS DATE),"
            " CAST(lag(ts) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) AS DATE))"
        ).alias("gap_days"),
    )
    users = gaps.groupBy("user_id").agg(
        F.max(
            F.when(F.col("gap_days") >= 7, 1).otherwise(0)
        ).alias("had_winback"),
        F.coalesce(F.max("gap_days"), F.lit(0)).alias("max_gap_days"),
    )
    return users.agg(
        F.count("*").alias("n_users"),
        F.sum("had_winback").alias("n_winback_users"),
        F.expr("(1000 * sum(had_winback)) div count(*)").alias(
            "winback_permille"
        ),
        F.max("max_gap_days").alias("longest_dormancy_days"),
    )
