"""Complex-event-processing (CEP) pattern matching: MATCH_RECOGNIZE /
Flink-CEP semantics expressed as a recursive-CTE automaton both engines run
verbatim.

The pattern here is the linear funnel ``view -> click -> purchase`` with
greedy, leftmost, NON-OVERLAPPING matching per user — exactly what
``MATCH_RECOGNIZE (PATTERN (V C P))`` or a Flink CEP program emits as match
instances (start/end per occurrence), and strictly more than
``events_funnel_conversion`` (which counts converting users, not
instances).

Implementation: a 3-state automaton walked over each user's time-ordered
event sequence by a recursive CTE — one recursion level per event index,
state carried in columns, a match row emitted on each completing
transition. The SQL text is shared VERBATIM between Spark and the DuckDB
oracle (the ``sql_recursive_dup_closure`` pattern); only the ordered-view
preparation differs per engine, and its own equality is oracle-covered by
the event queries. Timestamps travel as wall-clock BIGINT micros so the
shared text needs no engine-specific timestamp typing.

Scale: recursion depth = max events/user (double-digit here; Spark's
``cteRecursionLevelLimit`` is raised accordingly). Each level joins the
|users| frontier to one event index — fine for bounded sequences; for
unbounded/high-depth streams the production path is the stateful streaming
automaton (``streaming/events.py`` applyInPandasWithState /
transformWithState), which holds the same state machine in keyed state
instead of recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import load_events

_WALK_TEXT = """
    walk (user_id, i, state, start_us, match_start_us, match_end_us) AS (
        SELECT user_id, 0, 0, CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM (SELECT DISTINCT user_id FROM ordered_events) u
        UNION ALL
        SELECT o.user_id, o.i,
               CASE WHEN w.state = 0 AND o.event_type = 'view' THEN 1
                    WHEN w.state = 1 AND o.event_type = 'click' THEN 2
                    WHEN w.state = 2 AND o.event_type = 'purchase' THEN 0
                    ELSE w.state END,
               CASE WHEN w.state = 0 AND o.event_type = 'view' THEN o.ts_us
                    WHEN w.state = 2 AND o.event_type = 'purchase'
                        THEN CAST(NULL AS BIGINT)
                    ELSE w.start_us END,
               CASE WHEN w.state = 2 AND o.event_type = 'purchase'
                    THEN w.start_us ELSE CAST(NULL AS BIGINT) END,
               CASE WHEN w.state = 2 AND o.event_type = 'purchase'
                    THEN o.ts_us ELSE CAST(NULL AS BIGINT) END
        FROM walk w
        JOIN ordered_events o ON o.user_id = w.user_id AND o.i = w.i + 1
    )
    SELECT user_id, match_start_us, match_end_us,
           match_end_us - match_start_us AS duration_us
    FROM walk WHERE match_end_us IS NOT NULL
"""


def _cep_oracle() -> str:
    return f"""
    WITH RECURSIVE ordered_events AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS i
        FROM events
    ),
    {_WALK_TEXT}
    """


_ACC_T = "struct<state:int,start:bigint,matches:array<struct<s:bigint,e:bigint>>>"

_FOLD = f"""
    aggregate(
        seq,
        CAST(named_struct('state', 0, 'start', CAST(NULL AS BIGINT),
                          'matches', array()) AS {_ACC_T}),
        (acc, x) -> CASE
            WHEN acc.state = 0 AND x.event_type = 'view' THEN
                named_struct('state', 1, 'start', x.ts_us,
                             'matches', acc.matches)
            WHEN acc.state = 1 AND x.event_type = 'click' THEN
                named_struct('state', 2, 'start', acc.start,
                             'matches', acc.matches)
            WHEN acc.state = 2 AND x.event_type = 'purchase' THEN
                named_struct('state', 0, 'start', CAST(NULL AS BIGINT),
                             'matches', array_append(acc.matches,
                                 named_struct('s', acc.start, 'e', x.ts_us)))
            ELSE acc END,
        acc -> acc.matches)
"""


@register("events_cep_funnel_instances", oracle=_cep_oracle())
def events_cep_funnel_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every greedy non-overlapping view->click->purchase MATCH INSTANCE
    per user, with wall-clock start/end/duration in exact micros — the
    MATCH_RECOGNIZE deliverable.

    Execution is deliberately ASYMMETRIC to the oracle: DuckDB replays the
    automaton as a recursive CTE (one level per event index — fine for an
    oracle, wrong as a plan: level-count joins); Spark runs the IDENTICAL
    state machine as a single ``aggregate()`` fold over each user's sorted
    event array — one shuffle on user_id, one JVM pass, no recursion. The
    hash match proves the two formulations compute the same function. The
    per-user sequence rides one array (the sessionize-fold memory caveat:
    bound pathological users at ingest)."""
    e = load_events(spark, sf_dir)
    # wall-clock micros: NTZ-NTZ timestampdiff is pure field arithmetic
    # (probed under hostile tz; no session-tz coercion for matching types)
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).alias("ts_us"),
                F.col("event_id"),
                F.col("event_type"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        # struct sort is lexicographic on (ts_us, event_id, ...) — the same
        # total order as the oracle's ROW_NUMBER(ORDER BY ts, event_id)
        .agg(F.sort_array(F.collect_list("ev")).alias("seq"))
    )
    matches = seqs.select(
        "user_id", F.explode(F.expr(_FOLD)).alias("m")
    )
    return matches.select(
        "user_id",
        F.col("m.s").alias("match_start_us"),
        F.col("m.e").alias("match_end_us"),
        (F.col("m.e") - F.col("m.s")).alias("duration_us"),
    )
