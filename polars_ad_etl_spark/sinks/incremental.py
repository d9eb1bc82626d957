"""Incremental, idempotent loads: dynamic partition overwrite + a streaming
foreachBatch writer built on it.

The 100 TB incremental pattern: land data partitioned by event date/hour,
and re-process by **overwriting exactly the affected partitions** — never
the table, never row-level merges. Dynamic partition overwrite
(``partitionOverwriteMode=dynamic``) makes the write idempotent: re-running
a day's load replaces that day and touches nothing else, so retries and
backfills are safe by construction.

The streaming side reuses the same primitive through ``foreachBatch``:
each micro-batch rewrites the partitions it contains. Combined with a
checkpoint location this gives effectively-once output on a plain parquet
table (a replayed batch overwrites its own partitions with identical
content) — no transactional table format needed.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_partition_overwrite(
    df: DataFrame, path: str | Path, partition_cols: list[str]
) -> str:
    """Overwrite only the partitions present in ``df`` (dynamic mode set
    per-write, not globally, so other writers keep static semantics)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(str(path))
    )
    return str(path)


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str | Path,
    partition_cols: list[str],
    checkpoint: str | Path,
) -> StreamingQuery:
    """foreachBatch incremental sink: every micro-batch dynamic-overwrites
    the partitions it touches. Replays after failure rewrite the same
    partitions identically — idempotent without a transaction log.

    Correct ONLY when partitions are batch-aligned (one partition's rows
    never span micro-batches — e.g. hourly trigger writing hourly
    partitions of already-closed hours): a partition fed by two batches
    would be overwritten by the later one. For unaligned raw appends, use
    plain append mode and dedup on replay instead."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            write_partition_overwrite(batch_df, path, partition_cols)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", str(checkpoint))
        .foreachBatch(_write_batch)
        .start()
    )
