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


def test_chunk_audio_real_mode_loud_on_non_wav(spark):
    import pytest

    from polars_ad_etl_spark.operators.multimodal import chunk_audio, media_table

    # media_table blobs are raw text bytes, not WAV containers -> real mode
    # must refuse loudly rather than chunk garbage
    with pytest.raises(Exception, match="codec|NotImplemented"):
        chunk_audio(media_table(spark, SF_DIR), fake=False).collect()


# ------------------------------------------------- real stdlib codec paths


def test_wav_roundtrip_nonuniform():
    from polars_ad_etl_spark.operators.media_codecs import decode_wav, encode_wav

    samples = [((i * 37 + 11) % 2048) - 1024 for i in range(501)]  # odd length
    blob = encode_wav(samples, sample_rate=12000)
    meta, got = decode_wav(blob)
    assert (meta.sample_rate, meta.n_channels, meta.sample_width) == (12000, 1, 2)
    assert meta.n_frames == 501
    assert meta.duration_ms == 501 * 1000 // 12000
    assert got == samples


def test_wav_stereo_roundtrip():
    from polars_ad_etl_spark.operators.media_codecs import decode_wav, encode_wav

    samples = [v for i in range(100) for v in (i, -i)]  # L/R interleaved
    blob = encode_wav(samples, sample_rate=8000, n_channels=2)
    meta, got = decode_wav(blob)
    assert meta.n_channels == 2
    assert meta.n_frames == 100
    assert got == samples


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (4, 4), (5, 2), (7, 3)])
def test_bmp_roundtrip_all_padding_widths(w, h):
    # w=1,5,7 exercise nonzero row padding; w=4 exercises zero padding
    from polars_ad_etl_spark.operators.media_codecs import decode_bmp, encode_bmp

    pixels = [
        ((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5 + 1) % 256)
        for y in range(h)
        for x in range(w)
    ]
    meta, got = decode_bmp(encode_bmp(w, h, pixels))
    assert (meta.width, meta.height, meta.bits_per_pixel) == (w, h, 24)
    assert got == pixels


def test_png_header_parse():
    import struct
    import zlib

    from polars_ad_etl_spark.operators.media_codecs import (
        decode_png_header,
        sniff_media_container,
    )

    ihdr = struct.pack(">IIBB", 640, 480, 8, 2) + b"\x00\x00\x00"
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    blob = b"\x89PNG\r\n\x1a\n" + chunk
    assert sniff_media_container(blob) == "png"
    meta = decode_png_header(blob)
    assert (meta.width, meta.height, meta.bit_depth, meta.color_type) == (640, 480, 8, 2)


def test_sniff_media_container():
    from polars_ad_etl_spark.operators.media_codecs import (
        encode_bmp,
        encode_wav,
        sniff_media_container,
    )

    assert sniff_media_container(encode_bmp(1, 1, [(1, 2, 3)])) == "bmp"
    assert sniff_media_container(encode_wav([0], 8000)) == "wav"
    assert sniff_media_container(b"plain text") == "unknown"


def test_decode_media_real_wav_and_bmp():
    from polars_ad_etl_spark.operators.media_codecs import encode_bmp, encode_wav
    from polars_ad_etl_spark.operators.multimodal import FEATURE_DIM, decode_media

    wav = encode_wav([1024] * 400, sample_rate=8000)
    feats = decode_media(wav, "audio", fake=False)
    assert len(feats) == FEATURE_DIM
    assert all(abs(f - 1024 / 32768.0) < 1e-9 for f in feats)

    bmp = encode_bmp(6, 4, [(90, 90, 90)] * 24)
    feats = decode_media(bmp, "image", fake=False)
    assert all(abs(f - 90 / 255.0) < 1e-9 for f in feats)


def test_resize_images_real_mode_actual_pixels(spark):
    """Real-mode resize decodes genuine BMPs and nearest-neighbor-resamples
    the actual pixel grid: a half-black/half-white source image must come
    out half-0 / half-255 after downsampling."""
    import pandas as pd

    from polars_ad_etl_spark.operators.media_codecs import encode_bmp
    from polars_ad_etl_spark.operators.multimodal import resize_images

    w, h = 16, 8
    pixels = [
        (0, 0, 0) if x < w // 2 else (255, 255, 255)
        for y in range(h)
        for x in range(w)
    ]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "media_type": ["image"],
                "blob": [encode_bmp(w, h, pixels)],
            }
        )
    )
    (row,) = resize_images(media, width=4, height=2, fake=False).collect()
    assert bytes(row.pixels) == bytes([0, 0, 255, 255] * 2)


def test_chunk_audio_real_mode_uses_file_rate(spark):
    """Real-mode chunking parses the WAV header and chunks at the file's own
    sample rate, not the nominal parameter."""
    import pandas as pd

    from polars_ad_etl_spark.operators.media_codecs import encode_wav
    from polars_ad_etl_spark.operators.multimodal import chunk_audio

    rate, n = 4000, 4000 + 123  # 1.0s + a partial chunk
    samples = [(i % 256) - 128 for i in range(n)]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [7],
                "media_type": ["audio"],
                "blob": [encode_wav(samples, sample_rate=rate)],
            }
        )
    )
    rows = chunk_audio(
        media, sample_rate=999, chunk_seconds=1.0, fake=False
    ).collect()
    assert len(rows) == 2
    assert all(r.sample_rate == rate for r in rows)  # file rate wins
    chunk_bytes = rate * 2
    assert all(len(r.chunk_blob) == chunk_bytes for r in rows)
    # payload round-trip: concatenated chunks minus padding == original PCM
    import struct as _struct

    joined = b"".join(
        bytes(r.chunk_blob) for r in sorted(rows, key=lambda r: r.chunk_idx)
    )
    got = list(_struct.unpack(f"<{n}h", joined[: n * 2]))
    assert got == samples
    assert all(b == 0 for b in joined[n * 2 :])  # zero padding


def test_synth_real_media_table_blobs_parse(spark):
    from polars_ad_etl_spark.operators.media_codecs import sniff_media_container
    from polars_ad_etl_spark.operators.multimodal import synth_real_media_table

    rows = synth_real_media_table(spark, SF_DIR).limit(12).collect()
    assert rows
    for r in rows:
        want = {0: "bmp", 1: "wav", 2: "mp4"}[r.doc_id % 3]
        assert sniff_media_container(bytes(r.blob)) == want


def test_mp4_box_roundtrip():
    """MP4 container metadata round-trips through the stdlib box parser:
    dimensions, timescale/duration, and the mdat payload byte-for-byte."""
    from polars_ad_etl_spark.operators import media_codecs as mc

    blob = mc.encode_mp4(320, 180, 1800, payload=bytes(range(50)))
    assert mc.sniff_media_container(blob) == "mp4"
    meta, payload = mc.decode_mp4(blob)
    assert (meta.width, meta.height) == (320, 180)
    assert (meta.timescale, meta.duration_units) == (600, 1800)
    assert meta.duration_ms == 3000
    assert payload == bytes(range(50))


def test_mp4_corrupt_box_raises():
    from polars_ad_etl_spark.operators import media_codecs as mc

    import pytest as _pytest

    blob = mc.encode_mp4(16, 9, 600)
    with _pytest.raises(ValueError):
        mc.decode_mp4(blob[:20])  # truncated mid-box
    with _pytest.raises(ValueError):
        mc.decode_mp4(b"\x00\x00\x00\x04ftyp")  # size < 8


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (4, 2), (5, 2), (7, 3)])
def test_avi_roundtrip_all_padding_widths(w, h):
    """AVI frame-pixel roundtrip: every frame's RGB grid survives the
    DIB pack (BGR, bottom-up, 4-byte row padding) and unpack."""
    from polars_ad_etl_spark.operators import media_codecs as mc

    frames = [
        [
            ((x * 7 + y * 13 + f) % 256, (x * 3 + f * 5) % 256, (y * 5 + 1) % 256)
            for y in range(h)
            for x in range(w)
        ]
        for f in range(3)
    ]
    blob = mc.encode_avi(w, h, frames, usec_per_frame=50_000)
    assert mc.sniff_media_container(blob) == "avi"
    meta, got = mc.decode_avi(blob)
    assert (meta.width, meta.height, meta.n_frames) == (w, h, 3)
    assert meta.duration_ms == 150
    assert got == frames


def test_avi_roundtrip_property():
    """Property: any (w, h, frames) grid round-trips exactly through the
    RIFF encoder/parser."""
    from hypothesis import given, settings, strategies as st

    from polars_ad_etl_spark.operators import media_codecs as mc

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        n=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, n, seed):
        frames = [
            [
                ((seed + f * 31 + i * 7) % 256, (seed // 3 + i) % 256, (f * 11) % 256)
                for i in range(w * h)
            ]
            for f in range(n)
        ]
        meta, got = mc.decode_avi(mc.encode_avi(w, h, frames))
        assert (meta.width, meta.height, meta.n_frames) == (w, h, n)
        assert got == frames

    check()


def test_avi_corrupt_raises():
    from polars_ad_etl_spark.operators import media_codecs as mc

    blob = mc.encode_avi(2, 2, [[(0, 0, 0)] * 4])
    with pytest.raises(ValueError):
        mc.decode_avi(b"RIFF\x00\x00\x00\x00WAVE")  # wrong RIFF form
    with pytest.raises(ValueError):
        mc.decode_avi(blob[:40])  # truncated mid-header
    with pytest.raises(ValueError):
        mc.encode_avi(2, 2, [[(0, 0, 0)] * 3])  # wrong pixel count


def test_sample_frames_real_mode_decodes_avi(spark):
    """Real-mode frame sampling decodes genuine AVI containers and emits the
    actual RGB pixel bytes of evenly-sampled frames."""
    import pandas as pd

    from polars_ad_etl_spark.operators import media_codecs as mc
    from polars_ad_etl_spark.operators.multimodal import sample_frames

    w, h = 3, 2
    frames = [[(f * 40, f * 40 + 1, f * 40 + 2)] * (w * h) for f in range(6)]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [5],
                "media_type": ["video"],
                "blob": [mc.encode_avi(w, h, frames)],
            }
        )
    )
    rows = sorted(
        sample_frames(media, n_frames=3, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    # even sampling over 6 source frames -> source indices 0, 2, 4
    for out_idx, src in zip(range(3), (0, 2, 4)):
        want = bytes(
            ch for px in frames[src] for ch in px
        )
        assert bytes(rows[out_idx].frame_blob) == want


def test_multimodal_video_frames_registry(spark):
    """The registry query emits one row per decoded frame with the decoded
    pixel sum matching the synthesis arithmetic."""
    from polars_ad_etl_spark.operators.multimodal import multimodal_video_frames

    rows = multimodal_video_frames(spark, SF_DIR).collect()
    assert rows
    for r in rows[:30]:
        d, f = r.doc_id, r.frame_idx
        assert r.width == 3 + d % 5 and r.height == 2 + d % 4
        assert r.n_frames == 2 + d % 3
        want = (3 + d % 5) * (2 + d % 4) * (
            (d * 7 + f * 13) % 256 + (d * 3 + f * 5) % 256 + (d * 11 + f * 2) % 256
        )
        assert r.frame_pixel_sum == want
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for d, idxs in by_doc.items():
        assert sorted(idxs) == list(range(2 + d % 3))


def test_mp4_roundtrip_property():
    """Property: any (width, height, duration, payload) round-trips through
    the box encoder/parser exactly."""
    from hypothesis import given, settings, strategies as st

    from polars_ad_etl_spark.operators import media_codecs as mc

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 8192),
        h=st.integers(1, 8192),
        dur=st.integers(0, 2**31 - 1),
        payload=st.binary(max_size=512),
    )
    def check(w, h, dur, payload):
        meta, got = mc.decode_mp4(mc.encode_mp4(w, h, dur, payload=payload))
        assert (meta.width, meta.height, meta.duration_units) == (w, h, dur)
        assert got == payload

    check()


def test_gif_lzw_roundtrip_property():
    """Property: random-noise frames (crossing several LZW code-size
    boundaries) survive the pure-Python GIF LZW encode/decode exactly."""
    from hypothesis import given, settings, strategies as st

    from polars_ad_etl_spark.operators import media_codecs as mc

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        n=st.integers(1, 3),
        ncolors=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, n, ncolors, seed):
        import random

        rnd = random.Random(seed)
        palette = [
            (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(ncolors)
        ]
        frames = [
            [palette[rnd.randrange(ncolors)] for _ in range(w * h)]
            for _ in range(n)
        ]
        meta, got = mc.decode_gif(mc.encode_gif(w, h, frames, delay_cs=5))
        assert (meta.width, meta.height, meta.n_frames) == (w, h, n)
        assert got == frames

    check()


def test_gif_large_noise_crosses_code_size_boundaries():
    """A 64x64 256-color noise frame forces the LZW dictionary through
    multiple code-size increments (and exercises long chains)."""
    import random

    from polars_ad_etl_spark.operators import media_codecs as mc

    rnd = random.Random(12)
    w = h = 64
    frames = [
        [(rnd.randrange(256), 0, 0) for _ in range(w * h)],
        [(rnd.randrange(256), 0, 0) for _ in range(w * h)],
    ]
    # palette stays <= 256 (red channel only) while 8k pixels push the
    # dictionary through every code size up to 12 bits
    colors = {px for f in frames for px in f}
    assert len(colors) <= 256
    meta, got = mc.decode_gif(mc.encode_gif(w, h, frames))
    assert got == frames


def test_gif_corrupt_raises():
    import pytest as _pytest

    from polars_ad_etl_spark.operators import media_codecs as mc

    blob = mc.encode_gif(2, 2, [[(1, 2, 3)] * 4])
    with _pytest.raises(ValueError):
        mc.decode_gif(b"NOTAGIF!")
    with _pytest.raises(ValueError):
        mc.encode_gif(2, 2, [[(1, 2, 3)] * 3])  # wrong pixel count


def test_sample_frames_real_mode_decodes_gif(spark):
    """Real-mode frame sampling decodes genuine GIF containers too."""
    import pandas as pd

    from polars_ad_etl_spark.operators import media_codecs as mc
    from polars_ad_etl_spark.operators.multimodal import sample_frames

    w, h = 3, 2
    frames = [[(f * 30, 255 - f * 30, f)] * (w * h) for f in range(4)]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [9],
                "media_type": ["video"],
                "blob": [mc.encode_gif(w, h, frames)],
            }
        )
    )
    rows = sorted(
        sample_frames(media, n_frames=2, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    # even sampling over 4 source frames -> source indices 0, 2
    for out_idx, src in zip(range(2), (0, 2)):
        want = bytes(ch for px in frames[src] for ch in px)
        assert bytes(rows[out_idx].frame_blob) == want


def test_png_full_roundtrip_all_filters_property():
    """Property: random truecolor images survive encode/decode under EVERY
    scanline filter (None/Sub/Up/Average/Paeth) — five independent
    encodings of the same image must all decode identically."""
    from hypothesis import given, settings, strategies as st

    from polars_ad_etl_spark.operators import media_codecs as mc

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, seed):
        import random

        rnd = random.Random(seed)
        pixels = [
            (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(w * h)
        ]
        for ft in range(5):
            meta, got = mc.decode_png(mc.encode_png(w, h, pixels, filter_type=ft))
            assert (meta.width, meta.height) == (w, h), ft
            assert got == pixels, ft

    check()


def test_png_corrupt_and_unsupported_raise():
    import pytest as _pytest

    from polars_ad_etl_spark.operators import media_codecs as mc

    with _pytest.raises(ValueError):
        mc.encode_png(2, 2, [(0, 0, 0)] * 3)  # wrong pixel count
    with _pytest.raises(ValueError):
        mc.encode_png(2, 2, [(0, 0, 0)] * 4, filter_type=9)
    blob = mc.encode_png(2, 2, [(1, 2, 3)] * 4)
    with _pytest.raises(ValueError):
        mc.decode_png(blob[:20])  # truncated


def test_decode_media_real_png_and_gif():
    """Real-mode feature extraction consumes full PNG pixels and GIF
    frames now (not just headers)."""
    from polars_ad_etl_spark.operators import media_codecs as mc
    from polars_ad_etl_spark.operators.multimodal import FEATURE_DIM, decode_media

    png = mc.encode_png(5, 4, [(120, 120, 120)] * 20, filter_type=4)
    feats = decode_media(png, "image", fake=False)
    assert len(feats) == FEATURE_DIM
    assert all(abs(f - 120 / 255.0) < 1e-9 for f in feats)

    gif = mc.encode_gif(4, 3, [[(60, 60, 60)] * 12] * 2)
    feats = decode_media(gif, "video", fake=False)
    assert all(abs(f - 60 / 255.0) < 1e-9 for f in feats)


def test_bmp_png_codec_cross_parity():
    """The BMP and PNG codecs must agree pixel-for-pixel on the same
    image: encode identical truecolor pixels through both containers,
    decode both, compare — cross-validating two independent codec
    implementations against each other."""
    from polars_ad_etl_spark.operators import media_codecs as mc

    w, h = 7, 5
    pixels = [
        ((x * 37 + y * 91) % 256, (x * 13 + y * 7) % 256, (x * 3 + y * 101) % 256)
        for y in range(h)
        for x in range(w)
    ]
    bmp_meta, bmp_px = mc.decode_bmp(mc.encode_bmp(w, h, pixels))
    png_meta, png_px = mc.decode_png(mc.encode_png(w, h, pixels))
    assert (bmp_meta.width, bmp_meta.height) == (w, h)
    assert (png_meta.width, png_meta.height) == (w, h)
    assert bmp_px == png_px == pixels
