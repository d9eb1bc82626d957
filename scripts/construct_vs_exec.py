#!/usr/bin/env python
"""Split per-query wall into DataFrame CONSTRUCTION (py4j/analysis) vs
EXECUTION (jobs) for named queries, warmed. Usage:
python scripts/construct_vs_exec.py <query> [...]"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    spark = get_spark("construct-vs-exec")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"{'query':45s} {'constr_s':>9} {'exec_s':>8} {'total_s':>8}")
    for name in names:
        for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            QUERIES[name](spark, d).count()
        bc = be = bt = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            bc = min(bc, t1 - t0)
            be = min(be, t2 - t1)
            bt = min(bt, t2 - t0)
        print(f"{name:45s} {bc:>9.3f} {be:>8.3f} {bt:>8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
