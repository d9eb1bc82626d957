"""Failure injection on the incremental sinks' exactly-once claims.

The graceful checkpoint-restart tests in test_streaming.py stop queries
between batches; these tests crash them at the WORST point — after the
sink's write is fully durable but before Spark commits the batch offset —
so the restart REPLAYS a batch whose output already exists. That replay is
exactly what each sink's idempotence design (dynamic partition overwrite /
last-writer-wins merge / batch-keyed delta overwrite) must absorb: the
final store state has to be byte-identical to a crash-free run.

Mechanism: batch 0 runs through the sink's real write primitive and then
raises, which terminates the stream BETWEEN the offset-log entry (written
before processing) and the commit-log entry (written after) — the same
window a killed executor/driver leaves behind. The restart runs the REAL
``stream_*`` sink from the same checkpoint, re-delivering batch 0.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

CHAOS = "chaos: injected crash after write, before commit"


def _write_source_file(spark, rows, schema, src_dir, name):
    """Land one single-file parquet in the stream-source dir (one file ==
    one micro-batch under maxFilesPerTrigger=1)."""
    os.makedirs(src_dir, exist_ok=True)
    w = f"{src_dir}/__w_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(w)
    shutil.copy(glob.glob(f"{w}/part-*.parquet")[0], f"{src_dir}/{name}")
    shutil.rmtree(w)


def _read_stream(spark, src_dir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _run_until_chaos(stream_df, checkpoint, write_batch):
    """Start a foreachBatch query whose batch function performs the REAL
    sink write and then raises — the query dies with the batch written but
    uncommitted. Returns after asserting the crash actually happened."""

    def _apply(batch_df, batch_id):
        write_batch(batch_df, batch_id)
        raise RuntimeError(CHAOS)

    q = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", str(checkpoint))
        .foreachBatch(_apply)
        .start()
    )
    try:
        q.processAllAvailable()
        q.awaitTermination(60)
    except Exception:
        pass
    finally:
        q.stop()
    exc = q.exception()
    assert exc is not None and "chaos" in str(exc), (
        f"injected crash did not terminate the query: {exc}"
    )


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_partition_overwrite_sink_replays_batch_idempotently(
    spark, tmp_path
):
    """Crash after batch 0's partition write, before its commit: the
    restarted stream re-delivers batch 0 and dynamic partition overwrite
    rewrites the same partition with identical content — no duplicated
    rows, final table equal to a crash-free run."""
    from polars_ad_etl_spark.sinks.incremental import (
        stream_to_partitioned_parquet,
        write_partition_overwrite,
    )

    schema = "k long, p string, v long"
    src = f"{tmp_path}/src"
    out = f"{tmp_path}/table"
    ckpt = f"{tmp_path}/ckpt"
    # batch-aligned partitions: p='A' rows only in file 0, p='B' in file 1
    _write_source_file(
        spark, [(1, "A", 10), (2, "A", 20), (3, "A", 30)], schema, src,
        "f0.parquet",
    )

    _run_until_chaos(
        _read_stream(spark, src, schema),
        ckpt,
        lambda df, _bid: write_partition_overwrite(df, out, ["p"]),
    )
    # the write WAS durable before the crash (the replay below is real)
    assert spark.read.parquet(out).count() == 3

    _write_source_file(
        spark, [(4, "B", 40), (5, "B", 50)], schema, src, "f1.parquet"
    )
    _drain(stream_to_partitioned_parquet(
        _read_stream(spark, src, schema), out, ["p"], ckpt
    ))

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == [
        (1, 10, "A"), (2, 20, "A"), (3, 30, "A"), (4, 40, "B"), (5, 50, "B"),
    ], f"replayed batch duplicated or lost rows: {got}"


def test_upsert_latest_sink_replays_batch_idempotently(spark, tmp_path):
    """Crash after batch 0's upsert, before its commit: the restarted
    stream replays batch 0 into the merged store; last-writer-wins on the
    version ordering absorbs the re-delivery, then batch 1's newer
    versions win normally."""
    from polars_ad_etl_spark.sinks.incremental import (
        stream_upsert_latest,
        upsert_latest_by_key,
    )

    schema = "k long, v long, payload string"
    src = f"{tmp_path}/src"
    store = f"{tmp_path}/view"
    ckpt = f"{tmp_path}/ckpt"
    _write_source_file(
        spark, [(1, 10, "a"), (2, 5, "c")], schema, src, "f0.parquet"
    )

    _run_until_chaos(
        _read_stream(spark, src, schema),
        ckpt,
        lambda df, _bid: upsert_latest_by_key(df, store, ["k"], ["v"]),
    )
    assert spark.read.parquet(store).count() == 2  # durable pre-crash

    # newer version for k=1, stale update for k=2
    _write_source_file(
        spark, [(1, 30, "z"), (2, 1, "old")], schema, src, "f1.parquet"
    )
    _drain(stream_upsert_latest(
        _read_stream(spark, src, schema), store, ["k"], ["v"], ckpt
    ))

    rows = {r.k: (r.v, r.payload) for r in spark.read.parquet(store).collect()}
    assert rows == {1: (30, "z"), 2: (5, "c")}
    assert spark.read.parquet(store).count() == 2  # one row per key, ever


def test_incremental_agg_sink_replays_batch_idempotently(spark, tmp_path):
    """Crash after batch 0's delta write, before its commit: the restart
    re-delivers batch 0 under the SAME batch_id, overwriting its own delta
    dir with identical content — totals cannot double-count."""
    from polars_ad_etl_spark.sinks.incremental import (
        read_incremental_agg,
        stream_incremental_agg,
        write_agg_delta,
    )

    schema = "event_type string, value double"
    src = f"{tmp_path}/src"
    store = f"{tmp_path}/agg"
    ckpt = f"{tmp_path}/ckpt"
    _write_source_file(
        spark,
        [("x", 1.0), ("x", 2.0), ("x", 3.0)],
        schema, src, "f0.parquet",
    )

    def _partial_write(df, bid):
        partial = df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        write_agg_delta(partial, store, bid)

    _run_until_chaos(_read_stream(spark, src, schema), ckpt, _partial_write)
    assert os.path.isdir(f"{store}/batch_id=0")  # durable pre-crash

    _write_source_file(
        spark, [("x", 10.0), ("y", 5.0), ("y", 7.0)], schema, src,
        "f1.parquet",
    )
    _drain(stream_incremental_agg(
        _read_stream(spark, src, schema), store, ["event_type"], "value",
        ckpt,
    ))

    totals = {
        r.event_type: (r.cnt, round(r.sum_value, 6))
        for r in read_incremental_agg(spark, store, ["event_type"]).collect()
    }
    assert totals == {"x": (4, 16.0), "y": (2, 12.0)}, (
        f"replayed delta double-counted: {totals}"
    )
    # the replayed batch reused batch_id=0 (overwrite), it did not fork a
    # new delta dir
    deltas = sorted(
        d for d in os.listdir(store) if d.startswith("batch_id=")
    )
    assert deltas == ["batch_id=0", "batch_id=1"], deltas
