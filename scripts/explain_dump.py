#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to
plans/$SPARK_GRAFT_PLANS_DIR/<q>_<tag>.txt (default plans/r13).

Usage: python scripts/explain_dump.py <tag> [query ...]
With no query names, dumps the bench HEADLINE set. The captured plan is the
pre-execution plan (AdaptiveSparkPlan isFinalPlan=false) under the same
session factory bench.py uses, so Exchange counts / join strategies /
PushedFilters in the files match what the bench actually plans.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = _ROOT / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
