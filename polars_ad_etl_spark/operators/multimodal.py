"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas UDFs over
``mapInPandas``.

The decode step itself (image decode / resize / frame sampling) needs codec
libraries this container doesn't ship, so it is STUBBED behind
``decode_media`` — either a clearly-marked NotImplementedError (real mode) or
a deterministic fake (test mode). Everything Spark-side is real and tested:
schema (binary + metadata struct), partition-sized Arrow batches, UDF
signatures, and the feature-extraction pipeline shape.

Scale notes: media blobs ride the fact table as binary columns; the batch
iterator shape of ``mapInPandas`` means one Arrow batch in flight per task —
memory stays bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of blob sizes. Feature extraction emits fixed-width vectors, so
downstream similarity/dedup reuse the embeddings operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register

MEDIA_SCHEMA = (
    "doc_id long, blob binary, media_type string, n_bytes long, checksum string"
)
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<float>"
FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media-shaped table from the documents table: the text bytes
    stand in for an encoded media payload (binary column + typed metadata) —
    the real pipeline would read blobs from object storage the same way."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        blob.alias("blob"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(blob).alias("checksum"),
    )


def decode_media(blob: bytes, media_type: str, fake: bool = True) -> list[float]:
    """STUB decode. Real mode would dispatch to PIL/librosa/pyav — none of
    which are installed here — so ``fake=False`` raises loudly rather than
    pretending. Fake mode derives a deterministic fixed-width feature vector
    from the bytes, preserving the exact dataflow shape of a real extractor."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries (PIL/librosa/pyav) "
            "not present in this environment"
        )
    if blob is None or len(blob) == 0:
        return [0.0] * FEATURE_DIM
    step = max(len(blob) // FEATURE_DIM, 1)
    return [float(blob[min(i * step, len(blob) - 1)]) / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    The UDF is a per-partition iterator — blobs never round-trip through the
    driver and batch memory is bounded."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [
                        decode_media(b, t)
                        for b, t in zip(pdf["blob"], pdf["media_type"])
                    ],
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, pixels binary"
FRAME_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame_blob binary"


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Resize plumbing for image rows: binary in, fixed (width x height)
    pixel buffer out, via ``mapInPandas``. The fake resampler picks a
    deterministic byte grid from the blob (nearest-neighbor shape); real
    mode raises until a codec library is present. Output size is constant
    per row, so downstream batch memory is exactly predictable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height

        def fake_resize(blob: bytes) -> bytes:
            if not fake:
                raise NotImplementedError(
                    "image resize requires a codec library (PIL) "
                    "not present in this environment"
                )
            if blob is None or len(blob) == 0:
                return bytes(n)
            step = max(len(blob) // n, 1)
            return bytes(blob[min(i * step, len(blob) - 1)] for i in range(n))

        for pdf in batches:
            img = pdf[pdf["media_type"] == "image"]
            yield pd.DataFrame(
                {
                    "doc_id": img["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": [fake_resize(b) for b in img["blob"]],
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling for video rows: a row-fan-out ``mapInPandas`` — one
    input video emits ``n_frames`` output rows (frame index + frame bytes),
    the shape a real pyav-backed sampler would produce. The fake sampler
    slices the blob into equal spans; real mode raises loudly. Fan-out
    happens partition-locally (no shuffle), and because output rows are
    bounded per input row, Arrow batch memory stays bounded too."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "frame sampling requires a codec library (pyav) "
                "not present in this environment"
            )
        for pdf in batches:
            vid = pdf[pdf["media_type"] == "video"]
            out = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_blob": []}
            for doc_id, blob in zip(vid["doc_id"], vid["blob"]):
                blob = blob or b""
                span = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n_frames)
                    out["frame_blob"].append(blob[i * span : (i + 1) * span])
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, n_chunks int, sample_rate int, chunk_blob binary"
)


def chunk_audio(
    media: DataFrame,
    sample_rate: int = 16000,
    chunk_seconds: float = 1.0,
    bytes_per_sample: int = 2,
    fake: bool = True,
) -> DataFrame:
    """Audio chunking for audio rows: split a waveform blob into fixed-length
    sample windows (the shape an ASR/embedding stage consumes) — completes
    the image/video/audio triad. One input row fans out into
    ``ceil(n_bytes / chunk_bytes)`` rows, partition-locally, with the last
    chunk zero-padded to constant length so downstream batch memory is
    exactly predictable. The PCM decode itself is stubbed (fake mode treats
    the blob as raw PCM; real mode raises until a codec library is present).
    """
    chunk_bytes = int(sample_rate * chunk_seconds) * bytes_per_sample

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "audio decode requires a codec library (soundfile/ffmpeg) "
                "not present in this environment"
            )
        for pdf in batches:
            aud = pdf[pdf["media_type"] == "audio"]
            out = {
                "doc_id": [],
                "chunk_idx": [],
                "n_chunks": [],
                "sample_rate": [],
                "chunk_blob": [],
            }
            for doc_id, blob in zip(aud["doc_id"], aud["blob"]):
                blob = blob or b""
                n_chunks = max(-(-len(blob) // chunk_bytes), 1)
                for i in range(n_chunks):
                    piece = blob[i * chunk_bytes : (i + 1) * chunk_bytes]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["n_chunks"].append(n_chunks)
                    out["sample_rate"].append(sample_rate)
                    out["chunk_blob"].append(piece.ljust(chunk_bytes, b"\0"))
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=AUDIO_CHUNK_SCHEMA)


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           strlen(text) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM-side half of the media pipeline (blob sizing, checksums, type
    tagging) — oracle-checked; the Python decode half is covered by
    tests/test_multimodal.py."""
    return media_table(spark, sf_dir).select(
        "doc_id", "media_type", "n_bytes", "checksum"
    )
