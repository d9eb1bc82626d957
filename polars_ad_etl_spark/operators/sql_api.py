"""SQL front door: one ``sql_api_*`` twin per operator family, each a single
ANSI text that runs VERBATIM through ``spark.sql`` and through the DuckDB
oracle (round-9 widening — previously the SQL surface was one query wide,
``sql_api_revenue_by_nation``, while every other capability was
Python-API-only; a real analyst hits ``spark.sql`` first).

Contract per query: the Spark side registers the star tables it needs as
temp views (events through :func:`sources.star.load_events`, so the view
carries the same event-time contract the oracle side gets via
``registry._apply_table_contracts``) and executes the shared text; the
oracle side is the SAME string. Any engine-specific shimming would defeat
the point, so the texts below are restricted to the ANSI intersection both
engines parse identically: explicit ``NULLS FIRST``, decimal-exact sums
(``functions/exact.py`` rationale), unique total orders under LIMIT, and —
for grouping-set queries — a ``HAVING COUNT(*) > 0`` guard (over an EMPTY
relation DuckDB emits the grand-total grouping-set row where Spark emits no
rows; the guard pins both to the same empty result without touching
non-empty inputs, where every grouping-set row has a positive count).

Families covered here: window (running frame), rollup (grouping sets),
anti-join (NOT EXISTS), exact-dedup keep list (GROUP BY over documents),
event-time rollup (date_trunc over the contracted events view). The join
family's SQL twin is ``relational3.sql_api_revenue_by_nation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.operators.relational import _t
from polars_ad_etl_spark.sources.star import load_events


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose star tables as temp views for a spark.sql text. ``events``
    routes through load_events so the view carries the ts-not-null contract
    and the NANOS->NTZ normalization (the oracle side gets the identical
    predicate via the registry's table-contract rewrite)."""
    for t in names:
        df = load_events(spark, sf_dir) if t == "events" else _t(spark, sf_dir, t)
        df.createOrReplaceTempView(t)


# ---------------------------------------------------------------- window
_RUNNING_SPEND_TEXT = """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
"""


@register("sql_api_window_running_spend", oracle=_RUNNING_SPEND_TEXT)
def sql_api_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of ``window_running_customer_spend``: running-total frame
    with decimal-exact prefix sums and spelled null ordering (Spark's ASC
    default is nulls-first, DuckDB's nulls-last — unspelled order diverges
    on NULL order dates)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_RUNNING_SPEND_TEXT)


# ---------------------------------------------------------------- rollup
_ROLLUP_TEXT = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
"""


@register("sql_api_rollup_quantity", oracle=_ROLLUP_TEXT)
def sql_api_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of the grouping-set family (``agg_rollup_revenue``): rollup
    subtotals + grand total through ``GROUP BY ROLLUP``. The HAVING guard
    exists solely for the empty-relation edge (see module docstring)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_ROLLUP_TEXT)


# ---------------------------------------------------------------- anti-join
_NOT_EXISTS_TEXT = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
    )
"""


@register("sql_api_orders_without_lineitems", oracle=_NOT_EXISTS_TEXT)
def sql_api_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of the anti-join family: Catalyst plans the NOT EXISTS as a
    LeftAnti hash join (plan-pinned), never a per-row correlated re-scan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_NOT_EXISTS_TEXT)


# ---------------------------------------------------------------- dedup
_EXACT_DEDUP_TEXT = """
    SELECT md5(lower(trim(text))) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
"""


@register("sql_api_exact_dedup_keep_list", oracle=_EXACT_DEDUP_TEXT)
def sql_api_exact_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of ``dedup_exact_documents``: the exact-dedup keep list is
    one GROUP BY away in plain SQL — the shuffle key is the 16-byte content
    hash, never the document body."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_EXACT_DEDUP_TEXT)


# ---------------------------------------------------------------- events
_HOURLY_TEXT = """
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
"""


@register("sql_api_events_hourly_rollup", oracle=_HOURLY_TEXT)
def sql_api_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL twin of ``events_hourly_rollup``: event-time truncation over the
    contracted events view. The view is TIMESTAMP_NTZ (loader-normalized
    from parquet NANOS), so date_trunc is session-timezone-independent on
    both engines."""
    _views(spark, sf_dir, "events")
    return spark.sql(_HOURLY_TEXT)
