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

from polars_ad_etl_spark.functions.hashing import MERSENNE_P, perm_constants
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


# ------------------------------------------------- similarity / LSH family
# Round-10 widening: the last Python-only family gets a SQL front door.
# The embedding-space LSH cannot be a verbatim text — there is NO shared
# array-element accessor between the engines (Spark brackets are 0-based /
# element_at is Spark-only; DuckDB brackets are 1-based / list_* functions
# are DuckDB-only), so any vector expression forks dialects by
# construction. The verbatim-able similarity surface is the TEXT side of
# the family: MinHash signatures -> banded LSH candidate pairs -> top-k by
# signature agreement, built exclusively from constructs probed identical
# in both engines (range TVF with exclusive end + t(i) aliasing,
# split_part with out-of-range -> '', position(x IN y) hex parsing of md5,
# ||-concat with implicit integer casts, CASE, ROW_NUMBER).
#
# Portable hash: the conv()-based portable_hash32 (functions/hashing.py)
# is Spark-only syntax, so the shared text parses the first 8 md5 hex
# chars with position() arithmetic — same value, one dialect.
#
# Tokenization: the first {_LSH_TOK_SAMPLE} space-separated tokens per
# document (split_part over a fixed 16-wide range cross join, empties
# filtered). A FIXED sample size is what makes the text scale-safe: the
# cross join fans out exactly 16 rows per document regardless of document
# length (no correlated range bound, which Spark cannot push down), so the
# plan is linear in corpus size — sampled-token MinHash, the same sketch
# family as dedup.py's full MinHash with a bounded shingle budget.
_LSH_TOK_SAMPLE = 16
_SQL_LSH_H = 8  # signature length
_SQL_LSH_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 4 bands x 2 rows
_SQL_LSH_NQ = 8  # doc_id < 8 are the query documents (similarity.N_QUERIES)
_SQL_LSH_TOPK = 10


def _hex32_verbatim(expr: str) -> str:
    """First 32 bits of the md5 hex digest ``expr`` as a BIGINT, in the
    ANSI intersection (verified bit-equal to portable_hash32 by
    tests/test_sql_api_lsh.py::test_hexparse_matches_portable_hash32)."""
    terms = [
        f"(CAST(position(substring({expr}, {k + 1}, 1) IN"
        f" '0123456789abcdef') AS BIGINT) - 1) * {16 ** (7 - k)}"
        for k in range(8)
    ]
    return "(" + "\n         + ".join(terms) + ")"


def _sql_lsh_sigs_cte() -> str:
    """CTEs documents -> sampled tokens -> hashes -> H-component MinHash
    signature per doc (one GROUP BY, map-side combinable MINs)."""
    perms = perm_constants(_SQL_LSH_H)
    mins = ",\n               ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE_P}) AS m{j}"
        for j, (a, b) in enumerate(perms)
    )
    return f"""
    toks AS (
        SELECT DISTINCT doc_id,
               split_part(text, ' ', CAST(t.i AS INT)) AS tok
        FROM documents, range(1, {_LSH_TOK_SAMPLE + 1}) AS t(i)
        WHERE split_part(text, ' ', CAST(t.i AS INT)) <> ''
    ),
    hashed AS (SELECT doc_id, md5(tok) AS hx FROM toks),
    ints AS (SELECT doc_id, {_hex32_verbatim('hx')} AS h FROM hashed),
    sigs AS (
        SELECT doc_id,
               {mins}
        FROM ints GROUP BY doc_id
    ),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {bi} AS band, m{i} || '_' || m{j} AS bkey FROM sigs"
            for bi, (i, j) in enumerate(_SQL_LSH_BANDS)
        )}
    )"""


SQL_LSH_PAIRS_TEXT = f"""
    WITH {_sql_lsh_sigs_cte()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
    WHERE a.doc_id < b.doc_id
"""


@register("sql_api_lsh_pairs", oracle=SQL_LSH_PAIRS_TEXT)
def sql_api_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs through one verbatim SQL text: docs sharing any
    of the 4 signature bands pair up — the blocking join is a plain
    equi-join on (band, band key), never all-pairs. Spark plans the band
    self-join as a shuffled hash/sort-merge join on the composite key
    (plan-pinned: no cartesian product)."""
    _views(spark, sf_dir, "documents")
    return spark.sql(SQL_LSH_PAIRS_TEXT)


SQL_LSH_TOPK_TEXT = f"""
    WITH {_sql_lsh_sigs_cte()},
    cand AS (
        SELECT DISTINCT a.doc_id AS query_id, b.doc_id AS neighbor_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < {_SQL_LSH_NQ} AND a.doc_id <> b.doc_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {" + ".join(
                   f"(CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END)"
                   for j in range(_SQL_LSH_H)
               )} AS n_agree
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.query_id
        JOIN sigs sb ON sb.doc_id = c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, n_agree,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_agree DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, n_agree, rnk
    FROM ranked WHERE rnk <= {_SQL_LSH_TOPK}
"""


@register("sql_api_lsh_topk", oracle=SQL_LSH_TOPK_TEXT)
def sql_api_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k through one verbatim SQL text: band-blocked candidates
    for the query documents, scored by MinHash signature agreement
    (n_agree of 8 — an exact-integer Jaccard estimate, so ranking is
    deterministic with the neighbor-id tie-break)."""
    _views(spark, sf_dir, "documents")
    return spark.sql(SQL_LSH_TOPK_TEXT)
