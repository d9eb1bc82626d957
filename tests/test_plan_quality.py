"""Physical-plan regression tests: the properties that make these queries
survive a 100x scale-up must stay visible in the plan — filter pushdown,
column pruning, broadcast only for fixed-size dims, map-side partial
aggregation, TakeOrderedAndProject for top-k, no Python evaluation in
JVM-path queries."""

import pytest

from polars_ad_etl_spark.operators import QUERIES

SF_DIR = "/root/testdata/sf0.01"


from polars_ad_etl_spark.plans.audit import (  # noqa: E402
    formatted_plan,
    global_window_specs as _empty_partition_window_specs,
)


def test_q1_pushdown_and_pruning(spark):
    plan = formatted_plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must NOT read the join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_q6_no_join_no_extra_shuffle(spark):
    plan = formatted_plan(QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # single-partition combine only
    assert "GreaterThanOrEqual(l_shipdate" in plan  # range pushed to parquet


def test_q5_broadcasts_fixed_dims_only(spark):
    plan = formatted_plan(QUERIES["q5_local_supplier_volume"](spark, SF_DIR))
    # nation + region carry explicit broadcast hints -> BroadcastExchange
    assert "BroadcastExchange" in plan
    # lineitem (the big fact) must always be the streamed/probe side: every
    # BroadcastExchange subtree's scans must be dimension tables
    for block in plan.split("\n\n"):
        if block.strip().startswith("(") and "BroadcastExchange" in block:
            assert "lineitem" not in block


def test_topk_uses_take_ordered(spark):
    plan = formatted_plan(QUERIES["topk_orders_by_price"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort materialization


def test_semi_join_stays_semi(spark):
    plan = formatted_plan(QUERIES["join_semi_big_lineitems"](spark, SF_DIR))
    assert "LeftSemi" in plan


def test_no_python_udfs_in_jvm_path_queries(spark):
    """Everything except genuine codec work must run fully JVM-side: no
    row-at-a-time or Arrow-batch Python evaluation anywhere, and the
    mapInPandas slow path is allowlisted to exactly the queries that
    decode media containers (the ``multimodal_*`` family and the
    cross-codec dedup proof — real pure-python decoders by necessity).
    Every other query growing a MapInPandas node is a regression into the
    Python slow path."""
    for name, fn in QUERIES.items():
        plan = formatted_plan(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        if not (
            name.startswith("multimodal_")
            or name == "dedup_media_cross_codec_pairs"
        ):
            assert "MapInPandas" not in plan, name


def test_minhash_signatures_single_exchange_codegen_agg(spark):
    """Round-13 shape: explode shingles + ONE whole-stage-codegen
    HashAggregate of the K permutation minima, grouped by doc_id. The
    round-7 "pure projection" form (K array_min(transform(...)) passes)
    kept one row per doc but higher-order-function lambdas evaluate
    INTERPRETED outside codegen — measured ~6x the CPU of the exploded
    aggregate (OPTIMIZATION_r13.md). The spread exchange hashes on doc_id,
    so the aggregate REUSES it (guide §2.4): at most one Exchange total,
    and it must be the doc_id hash spread, never a second aggregate
    exchange. At scale the scan plans enough tasks, the spread is a no-op,
    and the plan is exchange-free (partial+final agg collapse scan-local
    per doc_id? no — the agg then plans its own single hash exchange of
    5000 signature rows, still one exchange)."""
    plan = formatted_plan(QUERIES["dedup_minhash_signatures"](spark, SF_DIR))
    # one exchange ("Exchange" appears twice per physical node: tree +
    # details section)
    assert plan.count("Exchange") <= 2
    assert "RoundRobinPartitioning" not in plan  # keyed spread, no RR sort
    assert "HashAggregate" in plan
    assert "Generate" in plan  # exploded shingles feed the codegen agg
    # the md5 hash is computed once, outside any interpreted lambda
    assert plan.count("array_min") == 0


def test_q2_correlated_min_single_window_shuffle(spark):
    """The correlated-MIN rewrite must be a window over ONE exchange on the
    part key — not a re-scan or a self-join of lineitem."""
    plan = formatted_plan(QUERIES["q2_min_cost_supplier"](spark, SF_DIR))
    assert "Window" in plan
    # lineitem is scanned exactly once
    assert plan.count("lineitem.parquet") == 1


def test_scalar_subqueries_broadcast_not_collected(spark):
    """q11/q15/q22 global scalars must enter the plan as broadcast one-row
    aggregates (BroadcastNestedLoopJoin/BroadcastExchange), never via a
    driver-side collect baked into a literal."""
    for name in (
        "q11_important_parts",
        "q15_top_supplier",
        "q22_idle_rich_customers",
    ):
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        assert "BroadcastExchange" in plan, name


def test_q17_single_scan_window_avg(spark):
    """Round-13 shape (guide §2.4): lineitem is scanned exactly ONCE — the
    brand-filtered part keys join first, then the per-part average is a
    window over the already part-keyed rows (its partitioning reused from
    the join exchange when the join goes sort-merge at scale). The old
    two-scan aggregate-join-back shape re-read lineitem in full for the
    averages of the ~96% of parts the brand filter discards."""
    plan = formatted_plan(QUERIES["q17_small_quantity_revenue"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_q16_not_in_is_anti_join(spark):
    plan = formatted_plan(QUERIES["q16_supplier_part_counts"](spark, SF_DIR))
    assert "LeftAnti" in plan


def test_q18_aggregates_before_join(spark):
    """The HAVING aggregate must sit BELOW the joins: the first operator
    above the lineitem scan is a partial hash aggregate, and the join
    operates on the filtered aggregate, not raw lineitem."""
    plan = formatted_plan(QUERIES["q18_large_volume_customers"](spark, SF_DIR))
    scan_block = plan.split("Scan parquet")[0]
    # lineitem scanned once; the aggregate's HAVING filter appears before joins
    assert plan.count("lineitem.parquet") == 1
    agg_pos = plan.find("partial_sum")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    assert "TakeOrderedAndProject" in plan


def test_prepart_twins_single_wide_exchange(spark):
    """Combine-decay mitigation pins (round-11; SCALING.md
    "partial-aggregation combine decay"): the ``_prepart`` twins declare a
    pre-partitioned aggregation grain, so the WIDE shuffle is the explicit
    ``REPARTITION_BY_COL`` exchange carrying exactly the projected input
    rows — linear in data by construction. The pins:

    - exactly one REPARTITION_BY_COL exchange, keyed on the group columns;
    - NO aggregate below it (nothing may reintroduce a per-(mapper, group)
      partial pass whose record count decays to mappers x groups);
    - no ENSURE_REQUIREMENTS exchange between the partial and final
      aggregates above it (Catalyst must see the distribution satisfied —
      otherwise the twin pays two wide shuffles and is strictly worse);
    - the scan reads only the projected columns (the repartition must not
      widen the shuffled rows)."""
    cases = {
        "window_rank_parts_by_revenue_prepart": (
            ["l_returnflag", "l_partkey"],
            {"l_partkey", "l_extendedprice", "l_discount", "l_returnflag"},
        ),
        "q18_large_volume_customers_prepart": (
            ["l_orderkey"],
            {"l_orderkey", "l_quantity"},
        ),
    }
    for name, (keys, cols) in cases.items():
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        assert plan.count("REPARTITION_BY_COL") == 1, name
        repart_line = next(
            l for l in plan.splitlines() if "REPARTITION_BY_COL" in l
        )
        for k in keys:
            assert k in repart_line, (name, k)
        # the partial aggregate sits ABOVE the repartition exchange: no
        # per-(mapper, group) partial pass runs before the wide shuffle
        # (formatted-plan detail blocks print bottom-up — node (1) is the
        # leaf scan — so "above" means textually AFTER)
        assert "partial_sum" in plan, name
        assert plan.find("REPARTITION_BY_COL") < plan.find("partial_sum"), name
        # exactly ONE exchange keyed on the full group-key set: an
        # ENSURE_REQUIREMENTS duplicate between partial and final aggregate
        # (two wide shuffles — strictly worse than the original) would add
        # a second hashpartitioning on the same keys
        key_pat = ", ".join(rf"{k}#\d+L?" for k in keys)
        import re as _re

        assert (
            len(_re.findall(rf"hashpartitioning\({key_pat}, \d+\)", plan))
            == 1
        ), name
        # column pruning through the explicit repartition
        schema_line = next(
            l for l in plan.splitlines()
            if "ReadSchema" in l and "lineitem" in plan
        )
        for c in cols:
            assert c in schema_line, (name, c)


def test_q18_bucketed_zero_wide_exchange(spark):
    """The layout twin's payoff: groupBy(l_orderkey) over the bucketed
    order-profile store satisfies the aggregate's distribution straight
    off the scan — NO hashpartitioning exchange anywhere in the plan, and
    the HAVING filter still runs below the joins. The post-HAVING joins
    are EXPLICIT broadcast hints (round-12: the static planner flipped
    big-join-orders to sort-merge at sf1.0, re-shuffling 1.5M orders rows
    per run); hints are size-independent, so requiring BroadcastHashJoin
    and forbidding SortMergeJoin here proves the plan shape at every
    SF."""
    plan = formatted_plan(
        QUERIES["q18_large_volume_customers_bucketed"](spark, SF_DIR)
    )
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("lineitem") >= 1


def test_window_rank_bucketed_zero_wide_exchange(spark):
    """The layout twin's payoff (round-11 verdict task 1, mirroring
    test_q18_bucketed_zero_wide_exchange): groupBy(l_returnflag, l_partkey)
    over the l_partkey-bucketed revenue store satisfies the aggregate's
    distribution straight off the scan — NO exchange below the aggregate,
    so the decaying mappers x groups shuffle is gone. The only exchanges
    left are the two salted-ranking ones ABOVE it, each carrying one row
    per part with rank-limit pruning (WindowGroupLimit) below it."""
    import re as _re

    plan = formatted_plan(
        QUERIES["window_rank_parts_by_revenue_bucketed"](spark, SF_DIR)
    )
    assert "Bucketed: true" in plan
    # detail blocks print bottom-up — the aggregate's partial_sum block
    # must precede every hashpartitioning exchange textually
    assert "partial_sum" in plan
    first_ex = plan.find("Arguments: hashpartitioning")
    assert plan.find("partial_sum") > -1
    assert first_ex > plan.find("partial_sum")
    # exactly the two ranking exchanges (salted local + global), nothing
    # keyed on the raw store's full width, pruned below each exchange
    assert len(_re.findall(r"Arguments: hashpartitioning", plan)) == 2
    assert "% 64)" in plan
    assert plan.count("WindowGroupLimit") >= 2
    assert plan.count("Window (") >= 2


def test_window_rank_two_phase(spark):
    """Salted top-k: two Window nodes (local prune + global), so the global
    window only sees pruned rows — the 3-partition bottleneck is gone."""
    plan = formatted_plan(QUERIES["window_rank_parts_by_revenue"](spark, SF_DIR))
    assert plan.count("(") and plan.count("Window") >= 2


def test_bruteforce_topk_two_phase(spark):
    """Round-9 fix: the exact top-k's final ranking must be two-phase. A
    single window PARTITION BY query_id over the scored relation shuffles
    |corpus| x |queries| rows into |queries| (= 8) partitions — at 100x
    corpus each task sorts the whole corpus, a straggler by construction.
    Pin: two Window nodes, and the window partitioned on query_id alone is
    fed by the salt-pruned subtree (symmetric with
    test_window_rank_two_phase)."""
    plan = formatted_plan(QUERIES["sim_bruteforce_topk"](spark, SF_DIR))
    assert plan.count("Window (") >= 2
    # the salted partitioning must appear in an exchange: no single-phase
    # global window over the full scored relation
    assert "% 64)" in plan
    # and Spark's rank-limit pushdown prunes to <= k per group BELOW each
    # exchange (WindowGroupLimit), so even phase 1 never shuffles the full
    # scored relation — assert it so a regression in this optimization
    # (or an order spec that defeats it) is caught here.
    assert plan.count("WindowGroupLimit") >= 2


def test_exact_dedup_bucketed_zero_exchange(spark):
    """Round-9 layout twin: groupBy(text_hash) over the content-hash-
    bucketed documents store must satisfy the aggregation's distribution
    requirement straight off the scan — ZERO Exchange anywhere in the
    plan. This is the payoff the one-time write shuffle buys."""
    plan = formatted_plan(QUERIES["dedup_exact_documents_bucketed"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    assert "HashAggregate" in plan


def _store_side_join_pin(spark, twin: str, base: str) -> None:
    """Shared pin for the payload-fetch layout twins: with broadcast
    disabled (so the assertion is about bucketing, not about the id list
    fitting in a broadcast), the twin's plan must contain exactly ONE more
    Exchange than its base query — the id-list side re-shuffling to match
    the store's bucketing — while the bucketed store side feeds the
    SortMergeJoin straight from its scan."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tree = formatted_plan(QUERIES[twin](spark, SF_DIR)).split("\n\n")[0]
        base_tree = formatted_plan(QUERIES[base](spark, SF_DIR)).split("\n\n")[0]
        assert "Bucketed: true" in formatted_plan(QUERIES[twin](spark, SF_DIR))
        assert "SortMergeJoin" in tree
        assert tree.count("Exchange") == base_tree.count("Exchange") + 1, (
            f"{twin}: expected exactly one added Exchange (id-list side) "
            f"over {base}, got {tree.count('Exchange')} vs "
            f"{base_tree.count('Exchange')}\n{tree}"
        )
        # the store branch is printed last: no Exchange may sit between the
        # bucketed scan and the join it feeds
        store_branch = tree.rstrip().rsplit("SortMergeJoin", 1)[1]
        last_child = store_branch.splitlines()[-4:]
        assert not any("Exchange" in ln for ln in last_child), tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lsh_pair_payload_join_storeside_no_exchange(spark):
    _store_side_join_pin(
        spark, "dedup_lsh_pairs_bucketed", "dedup_minhash_lsh_pairs"
    )


def test_ann_payload_fetch_storeside_no_exchange(spark):
    _store_side_join_pin(
        spark, "sim_topk_payload_fetch_bucketed", "sim_lsh_bucketed_topk"
    )


def test_sql_front_door_plans(spark):
    """The SQL front door must compile to the same physical shapes the
    DataFrame twins are pinned to — Catalyst treats spark.sql text and the
    DataFrame API identically, and these pins prove it: NOT EXISTS plans
    as a LeftAnti hash join (never a correlated re-scan), the running
    frame is one Window over one exchange on the partition key, and the
    rollup expands BELOW a partial aggregate (map-side combine before the
    shuffle)."""
    plan = formatted_plan(
        QUERIES["sql_api_orders_without_lineitems"](spark, SF_DIR)
    )
    assert "LeftAnti" in plan
    plan = formatted_plan(
        QUERIES["sql_api_window_running_spend"](spark, SF_DIR)
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1 and tree.count("Exchange") == 1
    plan = formatted_plan(QUERIES["sql_api_rollup_quantity"](spark, SF_DIR))
    assert "Expand" in plan and "partial_" in plan


def test_contamination_broadcasts_eval_side(spark):
    """The benchmark/eval n-gram set must broadcast: the 100 TB training
    side of the contamination join may never shuffle."""
    plan = formatted_plan(QUERIES["curation_contamination_check"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_window_over_buckets_only(spark):
    """The running-sum window must consume the bucket aggregate (bounded
    10k rows), never the document table: exactly one single-partition
    exchange feeds the Window, and an aggregate sits below it."""
    plan = formatted_plan(QUERIES["curation_token_budget_sample"](spark, SF_DIR))
    assert "Window" in plan
    # tree prints parent first: the window's child subtree (printed after it)
    # must aggregate to buckets before the single-partition sort
    below_window = plan.split("Window", 1)[1]
    assert "HashAggregate" in below_window.split("Scan parquet", 1)[0]


def test_scd2_single_shuffle(spark):
    """Gaps-and-islands SCD2: change-detection lag, running island sum, and
    the final interval aggregate must all reuse ONE user_id exchange."""
    df = QUERIES["events_user_value_bands_scd2"](spark, SF_DIR)
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("Sort") == 1


def test_funnel_single_user_shuffle(spark):
    """The 3-step funnel must be one user_id aggregation + the 3-counter
    global combine — no per-step self-joins of the event table."""
    plan = formatted_plan(QUERIES["events_funnel_conversion"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") <= 3  # user_id hash + partial->final combine


def test_anomalies_broadcast_moments_no_window(spark):
    """Per-type moments (5 rows) broadcast back into the event scan; a
    Window.partitionBy(event_type) over the full table would hot-spot."""
    plan = formatted_plan(QUERIES["events_value_anomalies"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "Window" not in tree
    assert "SortMergeJoin" not in tree


def test_transition_matrix_window_over_aggregate(spark):
    """The normalizing SUM window must consume the |types|^2 aggregate,
    not the event table: an aggregate sits between scan and window."""
    plan = formatted_plan(QUERIES["events_transition_matrix"](spark, SF_DIR))
    below_norm_window = plan.split("Window", 1)[1]
    assert "HashAggregate" in below_norm_window.split("Scan parquet", 1)[0]


def test_recon_aggregates_before_full_outer(spark):
    """The full-outer reconciliation must join two daily AGGREGATES — a
    HashAggregate on each side below the join, never raw fact scans."""
    plan = formatted_plan(QUERIES["recon_orders_vs_shipments_daily"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "FullOuter" in tree
    join_idx = tree.index("Join FullOuter") if "Join FullOuter" in tree else tree.index("FullOuter")
    below = tree[join_idx:]
    # both scans sit under aggregates on the join's input side
    assert below.count("HashAggregate") >= 4  # partial+final per side


def test_cdc_latest_is_aggregate_not_window(spark):
    """Latest-per-key must compile to a map-side-combinable aggregate:
    no Window, no global Sort of the event table."""
    plan = formatted_plan(QUERIES["cdc_latest_event_per_user"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "partial_max_by" in plan or "HashAggregate" in tree


def test_modal_type_stacked_aggregates_no_window(spark):
    """Per-group mode: two stacked aggregates, never a window over raw
    events."""
    plan = formatted_plan(QUERIES["user_modal_event_type"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert tree.count("Scan parquet") == 1


def test_importance_sample_single_pass(spark):
    """The DSIR sampler normalizes by a fixed theoretical bound, not an
    empirical MAX scalar — a global scalar would plan the whole
    scan+token-join+groupBy weight subtree twice. Lock the single-pass
    shape: exactly two scans of documents (dictionary pass + apply pass),
    no nested-loop join for a broadcast scalar."""
    plan = formatted_plan(QUERIES["curation_importance_sample"](spark, SF_DIR))
    # formatted output lists each node twice (tree + detail): 2 real scans
    assert plan.count("Scan parquet") == 4
    assert "BroadcastNestedLoopJoin" not in plan


def test_surprisal_single_pass(spark):
    plan = formatted_plan(QUERIES["text_unigram_surprisal"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 4  # tree + detail, 2 real scans
    assert "BroadcastNestedLoopJoin" not in plan


def test_shard_manifest_one_shuffle(spark):
    """Shard manifest: one shuffle on the shard key feeding the per-shard
    window; the hash expressions are projections, not joins."""
    plan = formatted_plan(QUERIES["curation_shard_manifest"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 2  # tree + detail, 1 real scan
    assert "Join" not in plan
    assert plan.count("Exchange") == 2  # tree + detail, 1 real shuffle


def test_semdedup_no_cartesian(spark):
    """SemDeDup's within-cluster pair expansion must stay an equi-join on
    the cluster key — never a cartesian/nested-loop pair enumeration."""
    plan = formatted_plan(QUERIES["dedup_semdedup_keep_list"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_drift_two_scans_only(spark):
    """The drift operator folds absent-token mass in algebraically; the
    plan must stay at the dictionary-pass shape (main branch + K scalar =
    2 scans), never materialize a source x vocab grid via extra passes."""
    plan = formatted_plan(QUERIES["quality_source_drift"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 4  # tree + detail, 2 real scans


def test_epoch_plan_single_aggregate(spark):
    """Epoch planning runs entirely on the |sources|-row aggregate: one
    scan, and the corpus totals come from windows over that aggregate,
    not a second pass."""
    plan = formatted_plan(QUERIES["curation_epoch_plan"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 2  # tree + detail, 1 real scan
    assert "Join" not in plan


def test_pq_codes_single_projection(spark):
    """PQ code assignment must stay one scan + projection against
    driver-side codebook literals — no join, no shuffle (training
    collects are separate jobs, not part of this plan)."""
    plan = formatted_plan(QUERIES["embedding_pq_codes"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 2  # tree + detail, 1 real scan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_q7_nation_pair_prefiltered_at_scan(spark):
    """Both nation roles must be pruned to the two named nations AT THE
    SCAN (pushed In-filter), so each broadcast hash table holds 2 rows and
    probe output shrinks at the earliest join — not at the late pair
    filter."""
    plan = formatted_plan(QUERIES["q7_volume_shipping"](spark, SF_DIR))
    assert plan.count("In(n_name, [NATION_1,NATION_2])") == 2


def test_q8_region_composed_before_customer_join(spark):
    """q8's AMERICA filter must reach the region scan, and the nation x
    region composite must be built inside a broadcast subtree (so customers
    outside the region die at their first join)."""
    plan = formatted_plan(QUERIES["q8_market_share"](spark, SF_DIR))
    assert "EqualTo(r_name,AMERICA)" in plan
    # region joins nation inside a BroadcastExchange subtree
    for block in plan.split("\n\n"):
        if "region.parquet" in block and "BroadcastExchange" in block:
            break
    tree = plan.split("\n\n")[0]
    assert "region.parquet" not in tree.split("BroadcastHashJoin")[0]


# Documented bounded exceptions: each allowed global window runs over an
# AGGREGATE of bounded cardinality (10k hash buckets, |days|, |months|),
# never the raw table — see the section comments at each query. The map
# value is the required sort-column prefix of the window spec, pinning the
# window to its intended bounded input.
_GLOBAL_WINDOW_ALLOWLIST = {
    "curation_token_budget_sample": "bk#",     # 10k-bucket cumsum
    "curation_packed_sequences": "bk#",        # 10k-bucket cumsum
    "events_cumulative_distinct_users": "day#",    # |days| daily aggregate
    "orders_yoy_growth": "month_start#",           # |months| aggregate
    "events_max_concurrent_intervals": "hour_start#",  # |hours| aggregate
    "search_zipf_rank": "freq#",               # 100-row LIMIT input
    "events_error_streaks": "day#",            # |days| daily aggregate
}


def test_no_global_windows_anywhere(spark):
    """Lint every registry query's optimized plan: an empty-partitionBy
    window is a single-partition sort of its input and must not appear
    outside the allowlisted bounded-aggregate cases."""
    offenders = {}
    for name, fn in QUERIES.items():
        if name in _GLOBAL_WINDOW_ALLOWLIST:
            continue
        specs = _empty_partition_window_specs(
            formatted_plan(fn(spark, SF_DIR))
        )
        if specs:
            offenders[name] = specs
    assert not offenders, offenders


def test_allowlisted_global_windows_consume_aggregates_only(spark):
    """Every allowlisted global window must (a) sort only on its declared
    bounded-aggregate column, and (b) sit above a partial/final aggregate
    pair (proof the window input is the aggregate, not the raw table). The
    window-over-aggregate shape for the token-budget query is additionally
    locked by test_token_budget_window_over_buckets_only."""
    for name, sort_prefix in _GLOBAL_WINDOW_ALLOWLIST.items():
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        specs = _empty_partition_window_specs(plan)
        assert specs, (name, "expected a global window")
        assert all(s.startswith(sort_prefix) for s in specs), (name, specs)
        assert "partial_sum" in plan or "partial_count" in plan, name


def test_rfm_no_global_window(spark):
    """user_rfm_segments' exact-NTILE must stay fully distributed: no
    empty-partitionBy window, one range exchange feeding per-partition
    ranks, and a broadcast (never shuffled) stats join."""
    df = QUERIES["user_rfm_segments"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert not _empty_partition_window_specs(plan)
    assert "rangepartitioning(metric" in plan
    assert "BroadcastHashJoin" in plan
    # after execution, AQE must reuse the user-aggregate exchange so the
    # raw events table is scanned exactly once in the final plan
    df.collect()
    final = formatted_plan(df).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "ReusedExchange" in final


def test_pq_adc_broadcasts_query_luts(spark):
    """ADC search: candidates are scanned once and joined to the tiny
    broadcast LUT frame; the scan side must never be the build side."""
    plan = formatted_plan(QUERIES["sim_pq_adc_topk"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 2  # 1 real candidate scan
    assert "BroadcastNestedLoopJoin" in plan  # 8-row LUT frame cross join


def test_range_join_bucketed_no_nested_loop(spark):
    """The no-equi-key range join must compile to a bucket EQUI join —
    never BroadcastNestedLoopJoin/CartesianProduct — with the range
    predicate as a post-join filter and a bounded x2 probe-side explode."""
    plan = formatted_plan(QUERIES["range_join_global_click_rate"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "bucket" in plan
    assert "explode(array(" in plan  # the bounded x2 probe-side fan-out
    # the bucket key must be pure wall-clock arithmetic: no session-tz cast
    # of the NTZ event time (DST would bend the 5-minute window)
    assert "as timestamp)" not in plan.lower().replace("timestamp_ntz", "")


def test_covariance_partial_aggregates_map_side(spark):
    """The D^2 second-moment accumulation must combine map-side: shuffle
    volume is |partitions| x 2080 integer rows, never the exploded pairs."""
    plan = formatted_plan(QUERIES["embedding_covariance"](spark, SF_DIR))
    assert "partial_sum" in plan
    assert "Join" not in plan.split("\n\n")[0]


def test_boilerplate_two_level_aggregate_no_expand(spark):
    """Document frequency via stacked aggregates — no count_distinct
    Expand over the exploded span table."""
    plan = formatted_plan(QUERIES["text_boilerplate_ngrams"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Expand" not in tree
    assert tree.count("Scan parquet") == 1


def test_basket_pairs_equi_join_no_cartesian(spark):
    """Basket pair expansion must be an equi join on the order key (bounded
    per-basket fan-out), never a cartesian/nested-loop pair enumeration."""
    plan = formatted_plan(QUERIES["basket_part_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the support HAVING filter must run on the aggregate, before the
    # confidence joins (tiny surviving-pair set drives those joins)
    assert "partial_count" in plan


def test_daily_trend_stacked_aggregates_no_window(spark):
    """Integer OLS trend: two stacked map-side-combinable aggregates over
    one scan — no window, no join, no second pass."""
    plan = formatted_plan(QUERIES["events_daily_trend"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "Join" not in tree
    assert tree.count("Scan parquet") == 1


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    """Runtime row-level filtering (the 100 TB shuffle reducer): with a
    selective filter on the build side, Catalyst injects a Bloom-filter
    subquery on the probe side (might_contain over the join key), dropping
    non-matching probe rows BEFORE the shuffle. Local scans sit under the
    application-side size threshold, so the test pins the knob that
    production relies on; correctness is unchanged either way."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = formatted_plan(j)
        assert "might_contain" in plan  # the injected Bloom probe filter
        assert j.count() > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_star_join(spark, tmp_path):
    """Dynamic partition pruning: joining a Hive-partitioned fact to a
    FILTERED dimension must inject a runtime partition filter
    (dynamicpruning subquery) on the fact scan — whole partitions skip at
    runtime based on the dim filter, the star-schema pattern DPP exists
    for."""
    import pyspark.sql.functions as F

    fact_path = str(tmp_path / "events_by_type")
    from polars_ad_etl_spark.sources.star import load_events

    load_events(spark, SF_DIR).write.partitionBy("event_type").parquet(
        fact_path
    )
    dim = spark.createDataFrame(
        [("purchase", "rev"), ("refund", "rev"), ("click", "traffic")],
        "event_type string, category string",
    ).filter("category = 'rev'")
    fact = spark.read.parquet(fact_path)
    j = fact.join(dim, "event_type").groupBy("category").agg(
        F.count("*").alias("n")
    )
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan.lower()
    want = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type").isin("purchase", "refund"))
        .count()
    )
    assert {r.category: r.n for r in j.collect()} == {"rev": want}


def test_plan_audit_library_flags_and_passes(spark):
    """The reusable plan auditor (plans/audit.py) must flag a deliberately
    non-scalable plan (global window over a raw table, cartesian join) and
    pass a clean aggregate, honoring the allow-prefix escape hatch."""
    from pyspark.sql import Window, functions as F

    from polars_ad_etl_spark.plans.audit import (
        PlanQualityError,
        assert_scalable,
        plan_report,
    )

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    bad = l.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_extendedprice"))
    )
    with pytest.raises(PlanQualityError, match="global sort"):
        assert_scalable(bad)
    # ...unless the caller declares the window's input bounded
    assert_scalable(bad, allow_global_window_prefixes=("l_extendedprice",))

    cart = l.limit(5).crossJoin(
        spark.read.parquet(f"{SF_DIR}/nation.parquet").limit(5)
    )
    r = plan_report(cart)
    assert r.cartesian_products or r.nested_loop_joins

    good = l.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    rep = assert_scalable(good)
    assert rep.n_scans >= 1 and not rep.global_windows


def test_cep_single_shuffle_no_recursion(spark):
    """The CEP match-instance query must execute as ONE user_id shuffle +
    a JVM fold — never the oracle's recursive level-per-event join chain."""
    plan = formatted_plan(QUERIES["events_cep_funnel_instances"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "Join" not in tree
    assert tree.count("Scan parquet") == 1


def test_cbo_table_stats_flip_join_to_broadcast(spark, tmp_path):
    """Cost-based optimization end-to-end: without statistics a managed
    table's size is unknown (conservative sort-merge under a disabled
    broadcast threshold is the safe default); after ANALYZE TABLE COMPUTE
    STATISTICS the optimizer KNOWS the dimension is tiny and flips the
    join to broadcast-hash on its own. This is the stats workflow a 100 TB
    warehouse runs nightly."""
    spark.sql("DROP TABLE IF EXISTS t_dim_stats")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    nation.write.mode("overwrite").saveAsTable("t_dim_stats")
    big = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    try:
        j = big.join(
            spark.table("t_dim_stats"),
            big.c_nationkey == spark.table("t_dim_stats").n_nationkey,
        )
        spark.sql("ANALYZE TABLE t_dim_stats COMPUTE STATISTICS")
        j2 = big.join(
            spark.table("t_dim_stats"),
            big.c_nationkey == spark.table("t_dim_stats").n_nationkey,
        )
        plan2 = formatted_plan(j2)
        assert "BroadcastHashJoin" in plan2
        # row-count stats are recorded on the catalog table
        desc = spark.sql("DESC EXTENDED t_dim_stats").collect()
        stats_row = [r for r in desc if r.col_name == "Statistics"]
        assert stats_row and "rows" in stats_row[0].data_type
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dim_stats")


def test_pareto_8020_distributed_rank(spark):
    """events_pareto_8020's exact global rank/cumsum must stay fully
    distributed: range-partitioned sort, no empty-partitionBy window."""
    df = QUERIES["events_pareto_8020"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert not _empty_partition_window_specs(plan)
    assert "rangepartitioning(neg_cents" in plan


def test_skyline_threshold_join_broadcasts(spark):
    """skyline_parts' base-data pass must be a broadcast join against the
    tiny per-size threshold table — never a cartesian or sort-merge."""
    plan = formatted_plan(QUERIES["skyline_parts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ngram_jaccard_candidates_no_shingle_join(spark):
    """The candidate-restricted exact-Jaccard verifier must compute the
    intersection via array_intersect over per-doc shingle arrays — its plan
    may join only on doc ids / LSH bucket keys, NEVER shingle = shingle
    (the raw verifier's quadratic fan-out shape)."""
    import re

    plan = formatted_plan(
        QUERIES["dedup_ngram_jaccard_on_candidates"](spark, SF_DIR)
    )
    assert "array_intersect" in plan
    shingle_key = re.compile(r"keys \[\d+\]: \[sh#")  # SMJ/BHJ join key on sh
    assert not shingle_key.search(plan), "shingle join keys in candidate path"
    # positive control: the raw small-scale verifier DOES join on shingles,
    # so the pattern above has teeth
    raw = formatted_plan(QUERIES["dedup_ngram_jaccard_pairs"](spark, SF_DIR))
    assert shingle_key.search(raw)


def test_aqe_splits_planted_skew_join(spark):
    """Scale evidence for the skew story: a planted hot key in a sort-merge
    join must be SPLIT by AQE's skew-join rule (``skew=true`` in the final
    adaptive plan) once the skewed partition crosses the size thresholds —
    with a negative control proving the marker has teeth.

    Division of labor this test documents: AQE skew-join fixes *join*-side
    skew at runtime with zero code change, so plain equi-joins need no
    manual salting at any scale; AGGREGATION skew (groupBy on a hot key) is
    not covered by AQE's skew rule — that is what the explicit two-phase
    ``skew_salted_revenue_by_suppkey`` operator is for."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }

    def planted_join():
        # key 0: 200k rows; keys 1..49: 200 rows each -> one hot partition
        left = (
            spark.range(0, 210_000)
            .select(
                F.when(F.col("id") < 200_000, 0)
                .otherwise((F.col("id") % 49) + 1)
                .alias("k"),
                F.concat(F.lit("payload-" * 8), F.col("id")).alias("pad"),
            )
        )
        right = spark.range(0, 1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("rv")
        )
        # aggregate to one row so collect() is cheap; the join is inside
        return left.join(right, "k").agg(F.sum(F.length("pad")).alias("s"))

    def final_plan(df):
        # collect() runs THIS Dataset's QueryExecution (count() would build
        # a different one), after which AQE has finalized the plan
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        plan = final_plan(planted_join())
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the planted hot partition"

        # negative control: same data, rule off -> no skew split
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plan_off = final_plan(planted_join())
        assert "skew=true" not in plan_off
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _parquet_scan_count(df) -> int:
    """Number of parquet file scans in the EXECUTED plan — subplans already
    materialized via localCheckpoint appear as RDD leaves, not scans, so
    this counts how many times the final action re-reads source data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Scan parquet")


def test_near_dup_keep_list_single_scan(spark):
    """The keep-list's final action must touch the documents parquet exactly
    once (the doc_id projection for the left join); the whole signature ->
    bucket -> pair -> component pipeline is materialized behind a
    checkpointed leaf during construction and must NOT re-execute."""
    df = QUERIES["dedup_near_dup_keep_list"](spark, SF_DIR)
    assert _parquet_scan_count(df) == 1


def test_connected_components_no_rescan(spark):
    """The component labels are joins over checkpointed leaves only — zero
    parquet scans in the final plan (the LSH subplan ran once, at the
    eager checkpoint)."""
    df = QUERIES["dedup_connected_components"](spark, SF_DIR)
    assert _parquet_scan_count(df) == 0


def test_summary_report_single_scan(spark):
    """Round-8 single-subplan discipline: the summary report's three LSH
    consumers (pair count, component graph, overflow accounting) share ONE
    materialized bucket frame, so the final plan scans parquet exactly once
    (the n_docs/exact-dup aggregate) instead of re-running the signature
    pipeline per consumer."""
    for name in ("dedup_summary_report", "dedup_summary_report_capped"):
        df = QUERIES[name](spark, SF_DIR)
        assert _parquet_scan_count(df) == 1, name


def test_shingle_tokenizer_is_let_bound(spark):
    """Catalyst's CollapseProject inlines the tokenizer into the shingle
    lambda (lambda bodies hide the reference count from the cheap-to-copy
    heuristic), which re-ran the regex split once per shingle ELEMENT —
    measured 12.2s vs 1.4s on the sf0.1 broadcast build. The defense is the
    let-binding in _SHINGLES_SPARK (transform(array(toks), t -> ...)[0]);
    this lint pins its marker in the optimized plan so a "simplification"
    can't silently reintroduce the per-element re-tokenization."""
    df = QUERIES["dedup_ngram_jaccard_on_candidates"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "transform(array(" in plan, "shingle let-binding gone from plan"
