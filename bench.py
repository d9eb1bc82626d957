#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() action) after a warm-up of the
session; per-query time is wall-clock for plan + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (agg, joins, window, topk, setop,
# dedup, similarity, text) — the queries a user would actually run repeatedly.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "window_rank_parts_by_revenue",
    "window_running_customer_spend",
    "topk_orders_by_price",
    "agg_distinct_suppliers",
    "dedup_exact_documents",
    "dedup_minhash_signatures",
    "sim_bruteforce_topk",
    "text_quality_scores",
    "events_hourly_rollup",
    "events_session_windows",
    "etl_conform_union",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "asof_purchase_last_click",
    "skew_salted_revenue_by_suppkey",
    "sim_lsh_bucketed_topk",
    "dedup_minhash_lsh_pairs",
    "curation_training_set",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
    "stats_moments_lineitem",
    "sim_ivf_probe_topk",
    "dedup_near_dup_keep_list",
    "events_multi_grain_rollup",
    "curation_doc_chunks",
    "q21_sole_returned_supplier",
    "text_repetition_scores",
    "curation_contamination_check",
    "events_purchase_click_attribution",
    "events_funnel_conversion",
    "events_weekly_cohort_retention",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    spark = get_spark("polars-ad-etl-spark-bench")

    # Warm up the JVM/session so the first measured query doesn't pay init.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Run each headline query once at the smallest SF first: whole-stage
    # codegen compilation + JIT are one-time per query shape, not per-run
    # work, so timing them against the target SF would measure compiler
    # latency, not engine throughput. Two passes: sf0.001 compiles every
    # query shape cheaply; sf0.01 pushes enough rows through the generated
    # code to reach C2 JIT tier (measured: without it the first sf0.1 query
    # pays ~3s of compiler time — 4.24s vs 1.16s for q1).
    warmup_dirs = [warmup_dir, os.environ.get(
        "SPARK_GRAFT_WARMUP2_DIR", "/root/testdata/sf0.01")]
    for d in warmup_dirs:
        if d and os.path.isdir(d):
            for name in HEADLINE:
                QUERIES[name](spark, d).count()

    # Steady-state measurement: best of N runs per query (N=2 default).
    # Single-shot timings at sub-second scale are dominated by GC pauses
    # and OS scheduling noise, not engine work; min-of-N is the standard
    # way to report the throughput the engine actually sustains.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
