"""JSONL (newline-delimited JSON) sink — the write half of the engine's
NDJSON surface (read half: sources/tabular.py::read_jsonl /
read_jsonl_quarantined).

JSONL is the lingua franca of LLM training corpora (The Pile, Dolma,
RedPajama all ship it), so exporting a curated corpus back to JSONL shards
is a first-class pipeline terminal, not a debugging convenience. Round-trip
fidelity (JSON escaping, unicode, null fields omitted by the writer and
resurfacing as NULLs on read) is proven differentially by the
``source_jsonl_roundtrip`` registry query, whose DuckDB oracle never leaves
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as JSONL shards.

    ``n_shards`` repartitions before the write — shard count is a layout
    decision (~256 MB-1 GB per compressed shard at scale, so
    n = corpus_bytes / shard_bytes); ``compression`` takes a codec name
    (gzip/zstd — zstd is the production pick at ~3x smaller than raw).
    Null handling follows JSONL convention: null-valued fields are omitted
    from the line (Spark's ``ignoreNullFields`` default) and come back as
    NULLs through a schema'd read.
    """
    if n_shards is not None:
        df = df.repartition(n_shards)
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def stream_to_jsonl(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    compression: str | None = None,
):
    """Streaming JSONL terminal: append NDJSON shards exactly-once.

    Spark's native file-stream sink commits each micro-batch's files
    through the checkpointed file-sink log, so a replayed batch never
    double-writes — downstream batch readers (``read_jsonl`` /
    ``read_jsonl_quarantined``) read the directory as plain JSONL shards.
    This is the streaming sibling of :func:`write_jsonl`, the shape a
    continuously-ingesting corpus exporter runs; shard size is governed by
    the trigger interval, not n_shards (one file per partition per batch).
    """
    w = (
        stream_df.writeStream.outputMode("append")
        .format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if compression is not None:
        w = w.option("compression", compression)
    return w.start()
