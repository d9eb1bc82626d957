"""Multimodal plumbing tests: binary schema, mapInPandas batch shape, stubbed
decode determinism, and the loud real-mode stub."""

import pytest

from polars_ad_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    media_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    m = media_table(spark, SF_DIR)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "blob": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
        "checksum": "string",
    }
    row = m.filter(m.doc_id == 0).first()
    assert row.media_type == "image"  # doc_id % 3 == 0 -> image (deterministic tag)
    assert isinstance(row.blob, (bytes, bytearray))
    assert row.n_bytes == len(row.blob)


def test_extract_features_end_to_end(spark):
    feats = extract_features(media_table(spark, SF_DIR))
    assert dict(feats.dtypes)["feature"] == "array<float>"
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)


def test_decode_media_deterministic_fake():
    blob = "hello multimodal world".encode()
    assert decode_media(blob, "image") == decode_media(blob, "image")
    assert len(decode_media(b"", "audio")) == FEATURE_DIM


def test_decode_media_real_mode_is_loud():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"x", "image", fake=False)


def test_resize_images_fixed_output(spark):
    from polars_ad_etl_spark.operators.multimodal import media_table, resize_images

    media = media_table(spark, SF_DIR)
    out = resize_images(media, width=4, height=4).collect()
    n_images = media.filter("media_type = 'image'").count()
    assert len(out) == n_images
    assert all(len(r.pixels) == 16 for r in out)
    # deterministic: same input -> same pixels
    again = resize_images(media, width=4, height=4).collect()
    assert sorted((r.doc_id, bytes(r.pixels)) for r in out) == sorted(
        (r.doc_id, bytes(r.pixels)) for r in again
    )


def test_sample_frames_fan_out(spark):
    from polars_ad_etl_spark.operators.multimodal import media_table, sample_frames

    media = media_table(spark, SF_DIR)
    frames = sample_frames(media, n_frames=3)
    n_videos = media.filter("media_type = 'video'").count()
    assert frames.count() == n_videos * 3
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)


def test_resize_and_frames_real_mode_loud(spark):
    import pytest as _pytest

    from polars_ad_etl_spark.operators.multimodal import media_table, sample_frames

    media = media_table(spark, SF_DIR).limit(3)
    with _pytest.raises(Exception):
        sample_frames(media, fake=False).collect()


def test_chunk_audio_fixed_length_padded(spark):
    """Audio chunking: every chunk is exactly chunk_bytes long (last one
    zero-padded), fan-out is ceil(n_bytes/chunk_bytes), indices contiguous."""
    from polars_ad_etl_spark.operators.multimodal import chunk_audio, media_table

    media = media_table(spark, SF_DIR)
    sr, secs, bps = 100, 0.5, 2  # chunk_bytes = 100
    chunks = chunk_audio(
        media, sample_rate=sr, chunk_seconds=secs, bytes_per_sample=bps
    )
    rows = chunks.collect()
    assert rows, "no audio rows chunked"
    chunk_bytes = int(sr * secs) * bps
    assert all(len(r.chunk_blob) == chunk_bytes for r in rows)
    assert all(r.sample_rate == sr for r in rows)

    sizes = {
        r.doc_id: r.n_bytes
        for r in media.filter("media_type = 'audio'").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        want = max(-(-sizes[doc_id] // chunk_bytes), 1)
        assert len(rs) == want
        assert sorted(r.chunk_idx for r in rs) == list(range(want))
        assert all(r.n_chunks == want for r in rs)


def test_chunk_audio_real_mode_loud(spark):
    import pytest

    from polars_ad_etl_spark.operators.multimodal import chunk_audio, media_table

    with pytest.raises(Exception, match="codec|NotImplemented"):
        chunk_audio(media_table(spark, SF_DIR), fake=False).collect()
