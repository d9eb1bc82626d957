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
