#!/usr/bin/env python
"""Structured Streaming throughput/latency/state bench.

Drives four streaming pipelines (tumbling rollup, session windows,
stateful dedup, stream-stream interval join) over the events table split
into K parquet files, `maxFilesPerTrigger` per micro-batch, with
`Trigger.AvailableNow` so the run terminates when caught up. Per
micro-batch numbers come from the engine's own `StreamingQueryProgress`
(`durationMs.triggerExecution`, `processedRowsPerSecond`,
`stateOperators[].numRowsTotal/memoryUsedBytes`) — the same metrics a
production monitor would scrape — and roll up into
`{rows_per_sec, p50/p95 batch ms, max_state_rows, max_state_bytes}`.

The state numbers are the scale evidence: a watermarked pipeline's state
must plateau (bounded by watermark horizon × key cardinality), not grow
with input size — `state_growth_ratio` compares the last batch's state
rows to the mid-run maximum to show the plateau.

Usage: python scripts/streaming_bench.py OUT.json [SF_DIR] [N_FILES] [FILES_PER_TRIGGER]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from polars_ad_etl_spark.session import get_spark  # noqa: E402
from polars_ad_etl_spark.sources.star import load_events  # noqa: E402
from polars_ad_etl_spark.streaming.events import (  # noqa: E402
    attribute_purchases_stream,
    dedup_events_stream,
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
    spend_alerts_stream,
    user_totals_stream,
)
from polars_ad_etl_spark.streaming.pbcompat import ensure_protobuf  # noqa: E402

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

PIPELINES = {
    "hourly_rollup": hourly_rollup_stream,
    "session_windows": sessionize_stream,
    "stateful_dedup": dedup_events_stream,
    "purchase_click_join": attribute_purchases_stream,
}


def prepare_source(spark, sf_dir: str, n_files: int) -> str:
    """Split the events table into n_files parquet files ordered by ts so
    micro-batches arrive in rough event-time order (how a log would)."""
    work = tempfile.mkdtemp(prefix="stream_bench_")
    (
        load_events(spark, sf_dir)
        .repartitionByRange(n_files, "ts")
        .write.mode("overwrite")
        .parquet(f"{work}/events.parquet")
    )
    return work


def _provider_conf(spark, provider: str) -> None:
    """Select the state-store provider for queries started AFTER this call
    (the provider class is captured into each query's checkpoint at start).
    'heap' = the default HDFSBackedStateStoreProvider; 'rocksdb' = the
    production store at 100 TB (bounded heap, native memory + local SST)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    if provider == "rocksdb":
        spark.conf.set(key, _ROCKSDB)
    else:
        spark.conf.unset(key)


def run_pipeline(
    spark, src_dir: str, name: str, files_per_trigger: int,
    provider: str = "heap",
) -> dict:
    events = read_events_stream(spark, src_dir, max_files_per_trigger=files_per_trigger)
    df = PIPELINES[name](events)
    _provider_conf(spark, provider)
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        state = p.get("stateOperators") or []
        batches.append(
            {
                "rows": p["numInputRows"],
                "ms": p["durationMs"].get("triggerExecution", 0),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
                "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    # drop cached state-store providers between pipelines (see the note in
    # run_rate_stress — retained in-heap state distorts the next run)
    spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    total_rows = sum(b["rows"] for b in batches)
    ms = sorted(b["ms"] for b in batches) or [0]
    max_state = max((b["state_rows"] for b in batches), default=0)
    return {
        "wall_sec": round(wall, 2),
        "total_rows": total_rows,
        "n_batches": len(batches),
        "rows_per_sec": round(total_rows / wall, 1) if wall else None,
        "batch_ms_p50": statistics.median(ms),
        "batch_ms_p95": ms[max(0, int(len(ms) * 0.95) - 1)],
        "max_state_rows": max_state,
        "max_state_bytes": max((b["state_bytes"] for b in batches), default=0),
        "final_state_rows": batches[-1]["state_rows"] if batches else 0,
        "state_growth_ratio": round(
            batches[-1]["state_rows"] / max_state, 3
        ) if max_state else None,
        "batches": batches,
    }


def run_ingest_bench(spark, sf_dir: str, n_files: int, bounded: bool) -> dict:
    """Documents-replay throughput for the incremental ingest twins
    (streaming/documents.py). The bounded twin swaps layer-1's unbounded
    ``dropDuplicates`` for ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` — this row measures what that
    stateful-operator swap costs at ingest rate. A file replay finishes in
    seconds, inside any sane horizon, so state eviction itself shows up in
    the dedicated eviction test (tests/test_streaming.py), not here; the
    state accounting columns still show both twins carrying one row per
    distinct admitted key during the replay."""
    from polars_ad_etl_spark.streaming.documents import (
        corpus_indexes,
        incremental_ingest_stream,
        incremental_ingest_stream_bounded,
        read_documents_stream,
    )

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(f"{work}/documents.parquet")
    )
    ck, bk = corpus_indexes(spark, sf_dir)
    docs = read_documents_stream(spark, work, max_files_per_trigger=2)
    if bounded:
        df = incremental_ingest_stream_bounded(docs, ck, bk, horizon="10 minutes")
    else:
        df = incremental_ingest_stream(docs, ck, bk)
    ckpt = tempfile.mkdtemp(prefix="ckpt_ingest_")
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        state = p.get("stateOperators") or []
        batches.append(
            {
                "rows": p["numInputRows"],
                "ms": p["durationMs"].get("triggerExecution", 0),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
                "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    total_rows = sum(b["rows"] for b in batches)
    ms = sorted(b["ms"] for b in batches) or [0]
    max_state = max((b["state_rows"] for b in batches), default=0)
    return {
        "variant": "bounded" if bounded else "unbounded",
        "wall_sec": round(wall, 2),
        "total_rows": total_rows,
        "n_batches": len(batches),
        "rows_per_sec": round(total_rows / wall, 1) if wall else None,
        "batch_ms_p50": statistics.median(ms),
        "max_state_rows": max_state,
        "final_state_rows": batches[-1]["state_rows"] if batches else 0,
    }


def _run_foreach_decisions(
    spark,
    table: str,
    reader,
    pipeline,
    indexes: tuple,
    sf_dir: str,
    n_files: int,
    files_per_trigger: int,
    static_side: str,
    metrics=None,
) -> dict:
    """Shared driver for both labeled foreachBatch admission benches. No
    heap-vs-RocksDB axis on purpose: these pipelines' cross-batch state is
    the lake-resident seen index, not a streaming state store, so each row
    records per-batch decision throughput plus the sink/index write cost.

    Round-11 verdict tasks 2+5: ``files_per_trigger`` scales the
    micro-batch size (the ~2s fixed per-trigger overhead must amortize —
    rows/s near-linear in batch size, or the pipeline cannot keep up at
    100 TB by batching alone), ``static_side`` selects the derived
    (corpus-rescanning) vs persisted (compaction-maintained parquet)
    corpus indexes, and ``metrics`` (bench._StageMetrics) attributes total
    INPUT BYTES to the run — the static side is re-evaluated every
    trigger, so input_bytes_per_trigger is the direct measure of what the
    persisted indexes save."""
    import os

    work = tempfile.mkdtemp(prefix=f"{table}_decisions_bench_")
    (
        spark.read.parquet(f"{sf_dir}/{table}.parquet")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(f"{work}/{table}.parquet")
    )
    # the stream side is read exactly once across all triggers — its size
    # lets the artifact decompose input_bytes into stream vs static-side
    # (static = what the corpus indexes re-cost EVERY trigger)
    stream_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(work)
        for f in fs
    )
    stream = reader(spark, work, max_files_per_trigger=files_per_trigger)
    out = tempfile.mkdtemp(prefix=f"{table}_decisions_out_")
    if metrics is not None:
        metrics.snapshot()
    t0 = time.perf_counter()
    q = pipeline(
        stream, *indexes,
        out_dir=f"{out}/decisions",
        seen_dir=f"{out}/seen",
        checkpoint=f"{out}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    wall = time.perf_counter() - t0
    m = metrics.delta() if metrics is not None else None
    batches = [
        {"rows": p["numInputRows"],
         "ms": p["durationMs"].get("triggerExecution", 0)}
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    n_decisions = spark.read.parquet(f"{out}/decisions").count()
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    total_rows = sum(b["rows"] for b in batches)
    ms = sorted(b["ms"] for b in batches) or [0]
    n_batches = len(batches)
    return {
        "variant": f"{table}_decisions",
        "static_side": static_side,
        "files_per_trigger": files_per_trigger,
        "wall_sec": round(wall, 2),
        "total_rows": total_rows,
        "n_decisions": n_decisions,
        "n_batches": n_batches,
        "rows_per_sec": round(total_rows / wall, 1) if wall else None,
        "batch_ms_p50": statistics.median(ms),
        "input_bytes_total": m["input_bytes"] if m else None,
        "input_bytes_per_trigger": (
            round(m["input_bytes"] / n_batches) if m and n_batches else None
        ),
        "stream_source_bytes": stream_bytes,
        "static_bytes_per_trigger": (
            round(max(m["input_bytes"] - stream_bytes, 0) / n_batches)
            if m and n_batches
            else None
        ),
    }


def run_decisions_bench(
    spark, sf_dir: str, n_files: int,
    files_per_trigger: int = 2, persisted: bool = True, metrics=None,
) -> dict:
    """Document admission decisions
    (streaming/documents.py::incremental_ingest_decisions). Persisted
    corpus indexes by default (round-11 verdict task 5) — the derived
    variant re-scans the corpus every trigger and is recorded once as the
    comparison row."""
    from polars_ad_etl_spark.streaming.documents import (
        corpus_indexes,
        corpus_indexes_persisted,
        incremental_ingest_decisions,
        read_documents_stream,
    )

    idx_fn = corpus_indexes_persisted if persisted else corpus_indexes
    return _run_foreach_decisions(
        spark, "documents", read_documents_stream,
        incremental_ingest_decisions, idx_fn(spark, sf_dir),
        sf_dir, n_files, files_per_trigger,
        "persisted" if persisted else "derived", metrics,
    )


def run_embedding_decisions_bench(
    spark, sf_dir: str, n_files: int,
    files_per_trigger: int = 2, persisted: bool = True, metrics=None,
) -> dict:
    """Vector admission decisions
    (streaming/embeddings.py::embedding_ingest_decisions) — same axes as
    the document row (exact-key joins + bucketed cosine layer)."""
    from polars_ad_etl_spark.streaming.embeddings import (
        corpus_vector_indexes,
        corpus_vector_indexes_persisted,
        embedding_ingest_decisions,
        read_embeddings_stream,
    )

    idx_fn = (
        corpus_vector_indexes_persisted if persisted else corpus_vector_indexes
    )
    r = _run_foreach_decisions(
        spark, "embeddings", read_embeddings_stream,
        embedding_ingest_decisions, idx_fn(spark, sf_dir),
        sf_dir, n_files, files_per_trigger,
        "persisted" if persisted else "derived", metrics,
    )
    r["variant"] = "embedding_decisions"
    return r


def run_rate_stress(
    spark,
    name: str,
    rows_per_sec: int = 2_000_000,
    n_users: int = 5_000,
    duration_s: int = 30,
    mode: str = "append",
) -> dict:
    """Rows/s ceiling for a stateful pipeline using the in-JVM ``rate``
    source, which generates rows for free — so unlike the file-source runs
    (plateaued at ~0.6s batch p50 of source/listing overhead) the measured
    throughput is the state-store + shuffle cost itself.

    The rate is set far above sustainable so every micro-batch saturates;
    the engine's own ``processedRowsPerSecond`` across saturated batches IS
    the ceiling. Event time advances with the generated timestamp, so the
    watermark moves and state expires exactly as in production; key
    cardinality is bounded by ``n_users``."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
    )
    events = raw.selectExpr(
        "value AS event_id",
        # watermarks require TIMESTAMP (same type read_events_stream yields
        # after its UTC-pinned normalization cast)
        "timestamp AS ts",
        f"value % {n_users} AS user_id",
        "element_at(array('click','view','purchase','cart'), "
        "CAST(value % 4 AS INT) + 1) AS event_type",
        "CAST(value % 997 AS DOUBLE) / 10 AS value",
        "CAST(NULL AS STRING) AS props",
    )
    df = PIPELINES[name](events)
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_rate_{name}_")
    q = (
        df.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(duration_s)
    # capture a mid-run failure BEFORE stop() masks it — a query that died
    # during the sleep would otherwise read as "0 batches" with no cause
    err = q.exception()
    # stop() aborts the in-flight micro-batch; the DataWritingSparkTask
    # "Aborting commit" ERROR lines at teardown are that abort, not a failure
    q.stop()
    q.awaitTermination()
    batches = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        state = p.get("stateOperators") or []
        batches.append(
            {
                "rows": p["numInputRows"],
                "ms": p["durationMs"].get("triggerExecution", 0),
                "proc_rows_per_sec": p.get("processedRowsPerSecond", 0.0),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
                "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    # Unload every cached state-store provider: the heavy stresses leave
    # tens of millions of rows pinned in the HDFS-backed provider cache
    # AFTER their query stops (the checkpoint dir is gone but the in-heap
    # maps are not), and the resulting GC pressure starved the next
    # pipeline's micro-batches to zero completed batches (measured —
    # that's why the Python-API rows read 0 rows/s on the first r7 run).
    spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    # skip the first two batches (cold state store / codegen) for the ceiling
    steady = batches[2:] or batches
    rates = sorted(b["proc_rows_per_sec"] for b in steady) or [0]
    return {
        "query_error": str(err)[:300] if err else None,
        "source": "rate",
        "offered_rows_per_sec": rows_per_sec,
        "n_users": n_users,
        "duration_s": duration_s,
        "n_batches": len(batches),
        "ceiling_rows_per_sec_p50": round(statistics.median(rates), 1),
        "ceiling_rows_per_sec_max": round(max(rates), 1),
        "batch_ms_p50": statistics.median(
            sorted(b["ms"] for b in steady) or [0]
        ),
        "max_state_rows": max((b["state_rows"] for b in batches), default=0),
        "max_state_bytes": max((b["state_bytes"] for b in batches), default=0),
        "batches": batches,
    }


def _stress_cli(name: str, mode: str, rate: int, duration: int) -> None:
    """Subprocess entry: one rate stress in a FRESH JVM, result as the
    final stdout line. Isolation is the point — a shared session carries
    the previous stress's heap garbage and state-store provider cache,
    which measurably starves the next query's micro-batches (first r7 run:
    two rows read 0 rows/s purely from ordering).

    A ``_rocksdb`` suffix on the pipeline name runs the same pipeline
    under RocksDBStateStoreProvider — the production store at 100 TB
    (bounded heap; state lives in native memory + local SST files) —
    so the committed artifact carries a heap-vs-rocksdb row pair for
    every stateful pipeline. TWS always requires RocksDB (typed state
    maps to state-store column families)."""
    have_protobuf = ensure_protobuf()
    base = name.removesuffix("_rocksdb")
    extra = {}
    if base == "spend_alerts_tws" or name.endswith("_rocksdb"):
        if base == "spend_alerts_tws" and not have_protobuf:
            print(json.dumps({"skipped": "no protobuf runtime resolvable"}))
            return
        extra["spark.sql.streaming.stateStore.providerClass"] = _ROCKSDB
    spark = get_spark(f"stress-{name}", extra_conf=extra)
    if base == "user_totals_legacy_api":
        PIPELINES[name] = user_totals_stream
    elif base == "spend_alerts_tws":
        PIPELINES[name] = spend_alerts_stream
    elif name not in PIPELINES:
        PIPELINES[name] = PIPELINES[base]
    # cold-JVM warmup, discarded: compile the streaming plan + C2 the hot
    # loops at a trivially sustainable rate — without this the measured
    # run's first (backlogged) micro-batch can outlive the whole window
    # and record zero completed batches (measured on session_windows)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_rate_stress(spark, name, rows_per_sec=10_000, duration_s=8, mode=mode)
    r = run_rate_stress(
        spark, name, rows_per_sec=rate, duration_s=duration, mode=mode
    )
    spark.stop()
    print(json.dumps(r))


# (name, output mode, offered rows/s, duration s). JVM-side pipelines get
# a saturating 2M offered; Python custom-state pipelines get 300k — at 2M
# the backlogged first micro-batch outlives the window and nothing
# completes (measured), so 300k/40s is what actually yields a ceiling.
# Each stateful pipeline appears twice — default heap provider and the
# _rocksdb twin — so the artifact records what the production store costs
# (spend_alerts_tws is RocksDB-only by API requirement).
STRESSES = [
    ("session_windows", "append", 2_000_000, 45),
    ("session_windows_rocksdb", "append", 2_000_000, 45),
    ("stateful_dedup", "append", 2_000_000, 45),
    ("stateful_dedup_rocksdb", "append", 2_000_000, 45),
    ("user_totals_legacy_api", "update", 300_000, 40),
    ("user_totals_legacy_api_rocksdb", "update", 300_000, 40),
    ("spend_alerts_tws", "update", 300_000, 40),
]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--stress":
        name, mode, rate, duration = (
            sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
        )
        _stress_cli(name, mode, rate, duration)
        return
    # round-neutral default so a no-arg run can't clobber a committed
    # BENCH_r{N}_streaming.json artifact
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_streaming.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    fpt = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    # before the JVM starts: workers inherit PYTHONPATH now (the stress
    # subprocesses re-resolve protobuf themselves in _stress_cli)
    ensure_protobuf()
    # UI on: bench._StageMetrics attributes input bytes via the monitoring
    # REST API (the static-side-rescan evidence for the decisions grid)
    spark = get_spark(
        "streaming-bench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    src = prepare_source(spark, sf_dir, n_files)
    # JIT warmup on a tiny slice: one throwaway run per pipeline shape
    warm = prepare_source(spark, "/root/testdata/sf0.001", 2)
    for name in PIPELINES:
        run_pipeline(spark, warm, name, 1)
    result = {"sf_dir": sf_dir, "n_files": n_files, "files_per_trigger": fpt,
              "pipelines": {}, "pipelines_rocksdb": {}}
    for provider, key in (("heap", "pipelines"), ("rocksdb", "pipelines_rocksdb")):
        for name in list(PIPELINES):
            r = run_pipeline(spark, src, name, fpt, provider=provider)
            result[key][name] = r
            print(
                f"{name} [{provider}]: {r['rows_per_sec']} rows/s, "
                f"p50 {r['batch_ms_p50']}ms, "
                f"max_state {r['max_state_rows']} rows", flush=True,
            )
    # incremental ingest twins over the documents replay (heap provider;
    # the bounded twin's dedupWithinWatermark also runs under RocksDB in
    # the rate stresses' provider pairs above for the events pipelines —
    # here the row pair isolates the watermarked-vs-plain operator cost)
    for bounded in (False, True):
        r = run_ingest_bench(spark, sf_dir, n_files, bounded)
        result[f"ingest_{r['variant']}"] = r
        print(
            f"ingest_{r['variant']}: {r['rows_per_sec']} rows/s, "
            f"p50 {r['batch_ms_p50']}ms, max_state {r['max_state_rows']} rows",
            flush=True,
        )
    # Labeled admission decisions — rounds 11-12. The grid per pipeline:
    # the PERSISTED-index default at the base trigger size plus 5x/10x
    # batch-size rows (near-linear rows/s vs batch size = the fixed
    # per-trigger overhead amortizes), and ONE derived-index comparison
    # row at the base size quantifying the static-side rescans the
    # persisted indexes eliminate (input_bytes_per_trigger).
    from bench import _StageMetrics

    metrics = _StageMetrics(spark)
    for fn, base_key in (
        (run_decisions_bench, "ingest_decisions"),
        (run_embedding_decisions_bench, "ingest_embedding_decisions"),
    ):
        for key, fpt_mult, persisted in (
            (base_key, 1, True),
            (f"{base_key}_derived", 1, False),
            (f"{base_key}_fpt5x", 5, True),
            (f"{base_key}_fpt10x", 10, True),
        ):
            r = fn(
                spark, sf_dir, n_files,
                files_per_trigger=fpt * fpt_mult, persisted=persisted,
                metrics=metrics,
            )
            result[key] = r
            print(
                f"{key} [{r['static_side']}, fpt={r['files_per_trigger']}]: "
                f"{r['rows_per_sec']} rows/s, p50 {r['batch_ms_p50']}ms, "
                f"{r['n_decisions']} decisions, "
                f"{r['input_bytes_per_trigger']} input B/trigger",
                flush=True,
            )
    spark.stop()
    # Rate-source stresses (state-store rows/s ceiling with zero source
    # cost), each in its OWN subprocess/JVM via --stress — see _stress_cli
    # for why isolation is required. The last two rows are the
    # custom-stateful API twins: legacy applyInPandasWithState vs the
    # modern transformWithStateInPandas (Spark 4 state-server protocol;
    # protobuf via pbcompat, RocksDB store for column families).
    import subprocess

    for name, mode, rate, duration in STRESSES:
        proc = subprocess.run(
            [sys.executable, __file__, "--stress", name, mode,
             str(rate), str(duration)],
            capture_output=True, text=True, timeout=900,
        )
        try:
            r = json.loads(proc.stdout.strip().splitlines()[-1])
        except Exception:
            r = {"error": (proc.stderr or proc.stdout)[-400:]}
        result[f"rate_stress_{name}"] = r
        print(
            f"rate_stress_{name}: ceiling p50 "
            f"{r.get('ceiling_rows_per_sec_p50')} rows/s (max "
            f"{r.get('ceiling_rows_per_sec_max')}), batch p50 "
            f"{r.get('batch_ms_p50')}ms, max_state "
            f"{r.get('max_state_rows')} rows",
            flush=True,
        )
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(warm, ignore_errors=True)
    Path(out_path).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
