#!/usr/bin/env python
"""Multi-executor correctness probe.

local[N] runs every task in ONE JVM, so a whole class of distributed bugs
— closure/broadcast serialization, executor-local state leaking across
partitions, Python-worker setup on remote executors — can hide. This
probe re-runs the ENTIRE registry under `local-cluster[2,4,4096]` (two
separate executor processes, 4 cores / 4 GB each) with a hostile session
timezone, comparing every query against its DuckDB oracle.

Round-6 result: 282 MATCH / 0 rows-only / 0 FAIL of 282 in ~220s.

Usage: python scripts/local_cluster_probe.py [SF_DIR]
(Expect harmless shutdown-hook noise from the standalone master during
teardown — the verdict line prints before it.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from pyspark.sql import SparkSession

from oracle_util import compare, duckdb_conn  # noqa: E402
from polars_ad_etl_spark.operators import ORACLES, QUERIES  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    ok = fail = rows_only = 0
    fails = []
    for n, fn in QUERIES.items():
        try:
            df = fn(spark, sf)
            if n in ORACLES:
                d = compare(df, con, ORACLES[n])
                if d is None:
                    ok += 1
                else:
                    fail += 1
                    fails.append((n, d[:200]))
            else:
                assert df.count() >= 0
                rows_only += 1
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            fail += 1
            fails.append((n, f"EXC {e}"[:200]))
    print(
        f"LC-FULL: {ok} MATCH / {rows_only} rows-only / {fail} FAIL "
        f"of {len(QUERIES)} in {time.time() - t0:.0f}s"
    )
    for n, d in fails[:20]:
        print("FAIL", n, d)


if __name__ == "__main__":
    main()
