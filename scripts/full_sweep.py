#!/usr/bin/env python
"""Full-registry differential sweep -> committed per-round artifact.

The driver's CORRECTNESS gate samples ~50 of the registry's queries; this
script runs ALL of them against their DuckDB oracles at sf0.01 under a
hostile session (local[8], America/New_York, default confs — the driver's
shape, not the repo's tuned factory) and writes a JSON artifact
(CORRECTNESS_full_r{N}.json at the repo root) so every round carries a
committed 285/285-style proof instead of a 50-sample plus a claim.

tests/test_full_sweep_artifact.py gates the artifact: it must exist, be
all-green, and cover exactly the current registry's query set (so adding a
query without re-running the sweep fails the suite).

Usage: python scripts/full_sweep.py [out_json] [sf_dir]
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
        SparkSession.builder.master("local[8]")
        .appName("full-sweep")
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
        except Exception as ex:
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
            "session": "local[8] tz=America/New_York shuffle=8 (hostile)",
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
        f"VERDICT ok={ok} mismatch={mismatch} crash={crash}"
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
