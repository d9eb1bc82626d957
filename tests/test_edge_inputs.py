"""Edge-input robustness: registry queries on empty and single-row tables.

A 100-TB pipeline hits these shapes constantly — a day-partition with no
events, a delta batch with nothing in it, a source that shipped one row.
The sf* gates never exercise them, and the first empty-input sweep found
20 real defects in 5 classes:

1. ROLLUP/CUBE/GROUPING SETS on empty input: Spark's Expand emits no
   rows, silently dropping the grand-total row the SQL standard (and
   DuckDB/Postgres) require — fixed by
   ``functions/grouping.py::with_empty_grand_total``.
2. ANSI DIVIDE_BY_ZERO crashes: integer ``div`` by a zero count (empty
   corpus permilles) — fixed with ``nullif(denom, 0)``, matching DuckDB's
   ``x // 0 -> NULL``.
3. SUM-over-empty NULL where the oracle counts 0 (``sum(CASE...)`` vs
   ``COUNT(*) FILTER``) — fixed with ``coalesce(sum(...), 0)``.
4. Empty-trainer crashes: kmeans/PQ/k-center collect 0 seed rows and
   built un-analyzable empty ``array()`` literals or indexed ``rows[0]``
   — fixed with typed-NULL assignment expressions and early returns.
5. A global aggregate that manufactures a row of NULLs where the oracle's
   grouped aggregate yields no row (events_pareto_8020) — fixed by
   mirroring the oracle's GROUP BY.

The full-registry sweep lives in ``scripts/edge_sweep.py`` (283/283 on
both variants); this file pins the once-broken queries plus one
representative per family so the property is guarded in CI time budget.
"""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

from oracle_util import compare, duckdb_conn
from polars_ad_etl_spark.operators import ORACLES, QUERIES

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from gen_edge_data import generate  # noqa: E402

# Every query the first empty-input sweep broke (classes 1-5 above) ...
ONCE_BROKEN = [
    "agg_rollup_revenue",
    "agg_cube_quantity",
    "grouping_sets_revenue",
    "agg_rollup_grouping_id",
    "sim_kmeans_clusters",
    "dedup_semdedup_keep_list",
    "embedding_pq_codes",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "sim_kmeans_label_purity",
    "sim_kcenter_coreset",
    "dedup_blocking_reduction",
    "events_conversion_cdf",
    "corpus_health_scorecard",
    "events_pareto_8020",
    "curation_gate_funnel",
    "events_ab_srm_check",
    "dq_orders_rules",
    "dq_linenumber_density",
    "privacy_suppression_impact",
]
# ... plus one never-broken representative per major family, so a future
# regression in shared plumbing is caught even if it skips the fixed set.
REPRESENTATIVES = [
    "q1_pricing_summary",
    "dedup_exact_documents",
    "dedup_incremental_keep_list",
    "sim_bruteforce_topk",
    "text_quality_scores",
    "curation_training_set",
    "events_session_windows",
    "multimodal_metadata",
    "search_ranked_retrieval",
    "window_running_customer_spend",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return str(generate("empty", tmp_path_factory.mktemp("edge_empty")))


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    return str(generate("tiny", tmp_path_factory.mktemp("edge_tiny")))


def _check(spark, sf_dir: str, name: str) -> None:
    df = QUERIES[name](spark, sf_dir)
    con = duckdb_conn(sf_dir)
    try:
        diff = compare(df, con, ORACLES[name])
    finally:
        con.close()
    assert diff is None, f"{name} on {sf_dir}: {diff}"


@pytest.mark.parametrize("name", ONCE_BROKEN + REPRESENTATIVES)
def test_empty_input_matches_oracle(spark, empty_dir, name):
    _check(spark, empty_dir, name)


@pytest.mark.parametrize("name", ONCE_BROKEN + REPRESENTATIVES)
def test_tiny_input_matches_oracle(spark, tiny_dir, name):
    _check(spark, tiny_dir, name)


def test_grand_total_guard_is_limit1_not_rescan(spark, empty_dir):
    """The empty-input grand-total guard must probe the source via
    limit(1) — a near-free early-terminating scan — not re-aggregate the
    rolled frame (which Catalyst prunes into a DIFFERENT exchange and
    therefore a second full fact scan)."""
    df = QUERIES["agg_rollup_revenue"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Limit" in plan
    assert plan.count("FileScan") == 2  # main rollup + the limit(1) probe

    rows = QUERIES["agg_rollup_revenue"](spark, empty_dir).collect()
    assert len(rows) == 1  # exactly the standard grand-total row
    (r,) = rows
    assert r.l_returnflag is None and r.l_linestatus is None
    assert r.revenue is None and r.n_rows == 0
