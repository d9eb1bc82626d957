#!/usr/bin/env python
"""A/B a set of queries between two code snapshots on the SAME host state.

The build VM's wall-clock swings ~2x between host regimes on identical
code (ROUND6.md / ROUND7.md), so a single round-over-round bench delta
cannot distinguish a code regression from a regime change. This harness
settles it: check out the suspect round's snapshot commit into a git
worktree, then run BOTH snapshots back-to-back under the committed
protocol (idle-aware, JVM + per-query compile warmups, best-of-N) and
compare. Used in round 7 to clear q10_returned_items (1.30x in the r6
driver bench) and events_purchase_click_attribution (1.38x): both
measured at par with the r4 snapshot — host variance, not code.

Usage:
    git worktree add /tmp/r4snap <snapshot-commit>
    python scripts/ab_bench.py /root/repo q10_returned_items [...]
    python scripts/ab_bench.py /tmp/r4snap q10_returned_items [...]

Each invocation is its own process/JVM on purpose — two code versions
cannot share a Python module cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = sys.argv[1]
names = sys.argv[2:] or [
    "q10_returned_items",
    "events_purchase_click_attribution",
]
runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))
sys.path.insert(0, repo)

from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

load1 = os.getloadavg()[0]
spark = get_spark("ab-bench")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    for n in names:
        QUERIES[n](spark, d).count()

res = {}
for n in names:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES[n](spark, SF).count()
        best = min(best, time.perf_counter() - t0)
    res[n] = round(best, 3)
print(json.dumps({"repo": repo, "load1_at_start": round(load1, 2),
                  "runs": runs, "sf_dir": SF, "times": res}))
spark.stop()
