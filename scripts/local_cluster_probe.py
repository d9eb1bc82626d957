#!/usr/bin/env python
"""Multi-executor correctness probe -> committed per-round artifact.

local[N] runs every task in ONE JVM, so a whole class of distributed bugs
— closure/broadcast serialization, executor-local state leaking across
partitions, Python-worker setup on remote executors — can hide. This
probe re-runs the ENTIRE registry under `local-cluster[2,4,4096]` (two
separate executor processes, 4 cores / 4 GB each) with a hostile session
timezone, comparing every query against its DuckDB oracle, and writes a
JSON artifact (CLUSTER_r{N}.json at the repo root) in the same shape as
CORRECTNESS_full_r{N}.json. tests/test_full_sweep_artifact.py gates it:
it must exist, be all-green, and cover exactly the current registry — the
one sweep that catches serialization/executor-local-state bugs is now a
committed, suite-gated proof instead of a round-note claim.

Round-6 result: 282 MATCH / 0 rows-only / 0 FAIL of 282 in ~220s.

Usage: python scripts/local_cluster_probe.py [out_json] [SF_DIR]
(Expect harmless shutdown-hook noise from the standalone master during
teardown — the verdict line prints before it.)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
import traceback
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from pyspark.sql import SparkSession

from oracle_util import compare, duckdb_conn  # noqa: E402
from polars_ad_etl_spark.operators import ORACLES, QUERIES  # noqa: E402


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else None
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local-cluster[2,4,4096]")
        .appName("local-cluster-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf)
    t0 = time.time()
    results: dict[str, dict] = {}
    ok = mismatch = crash = 0
    for n, fn in QUERIES.items():
        try:
            df = fn(spark, sf)
            if n in ORACLES:
                d = compare(df, con, ORACLES[n])
                checked = "oracle"
            else:
                df.collect()
                d, checked = None, "rows_only"
            if d is None:
                ok += 1
                results[n] = {"status": "match", "checked": checked}
            else:
                mismatch += 1
                results[n] = {
                    "status": "mismatch",
                    "checked": checked,
                    "detail": d[:300],
                }
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            crash += 1
            tb = traceback.format_exc().splitlines()
            results[n] = {
                "status": "crash",
                "detail": f"{type(ex).__name__}: {str(ex)[:300]}",
                "at": tb[-2][:200] if len(tb) > 1 else "",
            }
        print(".", end="", flush=True)
    print()
    wall = round(time.time() - t0, 1)
    try:
        head = subprocess.run(
            ["git", "-C", str(_ROOT), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        head = "unknown"
    artifact = {
        "meta": {
            "sf_dir": sf,
            "session": (
                "local-cluster[2,4,4096] tz=America/New_York shuffle=8 "
                "(two separate executor JVMs)"
            ),
            "n_queries": len(QUERIES),
            "n_oracle_checked": len(ORACLES),
            "ok": ok,
            "mismatch": mismatch,
            "crash": crash,
            "wall_sec": wall,
            "git_head": head,
        },
        "results": results,
    }
    print(
        f"LC-FULL: ok={ok} mismatch={mismatch} crash={crash}"
        f" total={len(QUERIES)} wall={wall}s head={head}"
    )
    for n, r in results.items():
        if r["status"] != "match":
            print(f"  {r['status'].upper()} {n}: {r.get('detail', '')}")
    if out_path is not None:
        out_path.write_text(json.dumps(artifact, indent=1) + "\n")
        print(f"wrote {out_path}")
    spark.stop()
    return 0 if mismatch == 0 and crash == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
