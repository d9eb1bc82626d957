#!/usr/bin/env python
"""Edge-input full-registry sweep: every query + oracle on empty or
single-row tables (variants from ``gen_edge_data.py``).

Why this gate exists: production pipelines hit empty partitions, empty
delta batches, and single-row sources constantly; the sf* benchmarks never
exercise them. The first run of this sweep found 20 real defects in 5
classes (see tests/test_edge_inputs.py's docstring for the taxonomy and
fixes). Round-6 result after fixes: empty 283/283, tiny 283/283.

Usage: python scripts/edge_sweep.py [empty|tiny|nulls|fuzz|textfuzz|longdoc|all] [out.json]

With ``all`` (+ an output path) every variant runs in one Spark session and
the per-variant verdict blocks are written as a JSON artifact
(EDGE_r{N}.json at the repo root) — the committed evidence trail behind the
robustness claim, gated by tests/test_full_sweep_artifact.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

# Local mode: the driver heap IS the executor heap, and the default 1g
# OOMs on the textfuzz variant's heavy documents (100k tokens -> ~100k
# shingle rows per doc across 8 concurrent tasks). In client mode the JVM
# is launched BEFORE builder configs apply, so spark.driver.memory via
# .config() is silently ignored — the heap must be set through the
# spark-submit args the py4j gateway launcher reads. 4g models a small
# production executor, which is the right robustness bar.
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell")

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT / "scripts"))

from pyspark.sql import SparkSession

from gen_edge_data import generate  # noqa: E402
from oracle_util import compare, duckdb_conn  # noqa: E402
from polars_ad_etl_spark.operators import ORACLES, QUERIES  # noqa: E402

ALL_VARIANTS = ("empty", "tiny", "nulls", "fuzz", "textfuzz", "longdoc")


def sweep_variant(spark, variant: str) -> dict:
    sf = str(generate(variant, f"/tmp/edge_{variant}"))
    print(f"[{variant}] swept dir: {sf}", flush=True)
    con = duckdb_conn(sf)
    t0 = time.time()
    ok = fail = crash = 0
    bad: list[tuple[str, str, str]] = []
    for n, fn in QUERIES.items():
        try:
            df = fn(spark, sf)
            if n in ORACLES:
                d = compare(df, con, ORACLES[n])
            else:
                # no oracle: still MATERIALIZE — a lazy plan alone would
                # count a runtime crash on edge input as ok
                df.collect()
                d = None
            if d is None:
                ok += 1
            else:
                fail += 1
                bad.append(("MISMATCH", n, d[:200]))
        except Exception as ex:
            crash += 1
            tb = traceback.format_exc().splitlines()
            bad.append(
                ("CRASH", n, f"{type(ex).__name__}: {str(ex)[:200]} | {tb[-2][:150]}")
            )
        print(".", end="", flush=True)
    print()
    wall = round(time.time() - t0, 1)
    print(
        f"VERDICT variant={variant} ok={ok} mismatch={fail} crash={crash}"
        f" total={len(QUERIES)} wall={wall:.0f}s"
    )
    for kind, n, d in bad:
        print(f"  {kind} {n}: {d}")
    return {
        "ok": ok,
        "mismatch": fail,
        "crash": crash,
        "total": len(QUERIES),
        "wall_sec": wall,
        "failures": [
            {"kind": k, "query": n, "detail": d} for k, n, d in bad
        ],
    }


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "empty"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"edge-{variant}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = ALL_VARIANTS if variant == "all" else (variant,)
    blocks = {v: sweep_variant(spark, v) for v in variants}
    if out is not None:
        out.write_text(
            json.dumps(
                {
                    "meta": {
                        "session": (
                            "local[8] tz=America/New_York shuffle=8 (hostile)"
                        ),
                        "src": "/root/testdata/sf0.001",
                    },
                    "variants": blocks,
                },
                indent=1,
            )
            + "\n"
        )
        print(f"wrote {out}")
    spark.stop()
    return 0 if all(
        b["mismatch"] == 0 and b["crash"] == 0 for b in blocks.values()
    ) else 1


if __name__ == "__main__":
    raise SystemExit(main())
