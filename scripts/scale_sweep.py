#!/usr/bin/env python
"""Scale-stress sweep: run the bench headline set PLUS the full dedup/ANN
family at several scale factors, recording per-query wall time AND
per-query shuffle read/write, input, spill, and peak execution memory
(attributed via bench._StageMetrics / the public monitoring REST API).

The point is evidence, not timing folklore: for each query the output
carries the wall and shuffle-byte ratios between the largest and smallest
SF, so "this plan scales ≲ linearly" is a measured number per query. The
sf0.3/sf1.0 inputs come from scripts/gen_scale.py (disjoint-key
replication: cardinalities scale exactly linearly by construction, so a
super-linear wall or shuffle ratio is the ENGINE's fault and a finding).

Usage: python scripts/scale_sweep.py OUT.json [SF_DIR:SF ...]
Defaults: /root/testdata/sf0.1:0.1 .localdata/sf0.3:0.3 .localdata/sf1.0:1.0
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, _StageMetrics  # noqa: E402
from polars_ad_etl_spark.operators import QUERIES  # noqa: E402
from polars_ad_etl_spark.session import get_spark  # noqa: E402

FAMILY = sorted(n for n in QUERIES if n.startswith(("dedup_", "sim_")))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r5_sf1.json"
    if len(sys.argv) > 2:
        sfs = [(p.rsplit(":", 1)[0], float(p.rsplit(":", 1)[1])) for p in sys.argv[2:]]
    else:
        sfs = [
            ("/root/testdata/sf0.1", 0.1),
            (".localdata/sf0.3", 0.3),
            (".localdata/sf1.0", 1.0),
        ]
    names = list(dict.fromkeys(HEADLINE + FAMILY))
    # SPARK_GRAFT_EXCLUDE: comma list to drop (e.g. the documented
    # quadratic small-scale ground-truth controls on a big-SF stretch run)
    exclude = set(
        x for x in os.environ.get("SPARK_GRAFT_EXCLUDE", "").split(",") if x
    )
    if exclude:
        print(f"excluding {sorted(exclude & set(names))}", flush=True)
        names = [n for n in names if n not in exclude]
    spark = get_spark(
        "scale-sweep",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # JIT/codegen warmup at tiny SFs (same rationale as bench.py)
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            QUERIES[name](spark, d).count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    metrics_src = _StageMetrics(spark)
    result: dict = {"sfs": [sf for _, sf in sfs], "runs": runs, "queries": {}}
    for name in names:
        result["queries"][name] = {}
    for sf_dir, sf in sfs:
        for name in names:
            fn = QUERIES[name]
            best = float("inf")
            metrics_src.snapshot()
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            rec = {"wall": round(best, 3)}
            m = metrics_src.delta()
            if m:
                rec.update(
                    shuffle_read=m["shuffle_read_bytes"] // runs,
                    shuffle_write=m["shuffle_write_bytes"] // runs,
                    input_bytes=m["input_bytes"] // runs,
                    spill=m["spill_bytes"] // runs,
                    peak_mem=m["peak_execution_memory"],
                )
            result["queries"][name][str(sf)] = rec
            print(f"sf{sf} {name}: {rec['wall']}s", flush=True)

    lo, hi = str(sfs[0][1]), str(sfs[-1][1])
    data_ratio = sfs[-1][1] / sfs[0][1]
    result["data_ratio"] = data_ratio
    for name, per_sf in result["queries"].items():
        a, b = per_sf[lo], per_sf[hi]
        per_sf["wall_ratio"] = round(b["wall"] / max(a["wall"], 1e-9), 2)
        if "shuffle_write" in a and "shuffle_write" in b:
            per_sf["shuffle_ratio"] = round(
                b["shuffle_write"] / max(a["shuffle_write"], 1), 2
            )
        per_sf["linear"] = per_sf["wall_ratio"] <= data_ratio * 1.25
    result["total_wall"] = {
        str(sf): round(
            sum(result["queries"][n][str(sf)]["wall"] for n in names), 2
        )
        for _, sf in sfs
    }
    n_super = sum(1 for q in result["queries"].values() if not q["linear"])
    result["superlinear_count"] = n_super
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(f"totals {result['total_wall']}  superlinear={n_super}/{len(names)}")


if __name__ == "__main__":
    main()
