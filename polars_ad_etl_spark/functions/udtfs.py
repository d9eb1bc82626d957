"""Python user-defined TABLE functions (Spark 4 UDTF surface).

A UDTF is the right escape hatch when a transformation is one-row-in /
many-rows-out AND genuinely needs imperative Python (real tokenizers,
format-specific parsers) — the shapes ``explode``-composition covers are
still preferred (``curation_doc_chunks`` does the same chunking fully
JVM-side, and stays the production path). The UDTF here exists to prove the
platform surface end-to-end: class definition, registration, LATERAL
invocation from SQL, and row-multiplying semantics — with a test pinning
its output to the JVM-native chunker on real data, so the two
implementations can never drift.

Arrow note: enable ``spark.sql.execution.pythonUDTF.arrow.enabled`` for
batch-transfer execution; the semantics below are identical either way.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK = 40
STRIDE = 30


@udtf(returnType="chunk_id bigint, chunk_text string, chunk_tokens bigint")
class ChunkTextUDTF:
    """Overlapping token-window chunker: CHUNK-token windows every STRIDE
    tokens (tail chunks shorter), whitespace tokenization — byte-for-byte
    the semantics of ``curation_doc_chunks``."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return
        n_chunks = (len(toks) - 1) // STRIDE + 1
        for cid in range(n_chunks):
            start = cid * STRIDE
            window = toks[start : start + CHUNK]
            yield (cid, " ".join(window), len(window))


def register_udtfs(spark: SparkSession) -> None:
    """Register all package UDTFs on the session (idempotent)."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
