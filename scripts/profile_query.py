#!/usr/bin/env python
"""Per-stage profile of named queries: wall, task count, per-stage executor
time, shuffle bytes/records, input bytes — the SQL-tab view, scripted.

Usage: python scripts/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Each query is warmed at sf0.001+sf0.01 (codegen/JIT off the clock), then run
N times (SPARK_GRAFT_PROFILE_RUNS, default 3); the stage table reports the
LAST run so metrics map 1:1 to one execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    spark = get_spark(
        "profile-query", extra_conf={"spark.ui.enabled": "true",
                                     "spark.ui.port": "0"}
    )
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"

    def stages():
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            QUERIES[name](spark, d).count()
        walls = []
        for i in range(runs):
            before = {s["stageId"] for s in stages()}
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        new = sorted(
            (s for s in stages() if s["stageId"] not in before),
            key=lambda s: s["stageId"],
        )
        print(f"\n=== {name}: walls {[round(w, 3) for w in walls]} "
              f"(last run's stages below)")
        print(f"{'stage':>6} {'ms':>7} {'tasks':>5} {'exec_ms':>8} "
              f"{'cpu_ms':>8} {'in_MB':>7} {'sh_rd_MB':>8} {'sh_wr_MB':>8} "
              f"{'sh_wrec':>8}  name")
        for s in new:
            dur = s.get("executorRunTime", 0)
            cpu = s.get("executorCpuTime", 0) // 1_000_000
            first = s.get("firstTaskLaunchedTime", "")
            comp = s.get("completionTime", "")
            wall_ms = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                wall_ms = int(
                    (datetime.strptime(comp, fmt)
                     - datetime.strptime(first, fmt)).total_seconds() * 1000
                )
            except Exception:
                pass
            print(
                f"{s['stageId']:>6} {wall_ms!s:>7} {s['numCompleteTasks']:>5} "
                f"{dur:>8} {cpu:>8} "
                f"{s.get('inputBytes', 0) / 1e6:>7.2f} "
                f"{s.get('shuffleReadBytes', 0) / 1e6:>8.3f} "
                f"{s.get('shuffleWriteBytes', 0) / 1e6:>8.3f} "
                f"{s.get('shuffleWriteRecords', 0):>8}  "
                f"{s.get('name', '')[:60]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
