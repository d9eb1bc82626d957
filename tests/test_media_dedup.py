"""Perceptual-hash media near-dup (operators/media_dedup.py).

Correctness against DuckDB is covered by the registry oracles; these tests
pin what the oracle can't see: plan shape (signatures must be one JVM
projection), near-dup semantics (exact copies at Hamming 0, blocked join
never all-pairs), and the real-codec decode path sharing the banding code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_ad_etl_spark.operators import QUERIES
from polars_ad_etl_spark.operators.media_dedup import (
    PH_BUCKET_CAP,
    PH_HAMMING_MAX,
    media_phash_decoded,
    media_phash_signatures,
    phash_pairs_from_sigs,
)
from polars_ad_etl_spark.operators.multimodal import synth_real_media_table

SF = "/root/testdata/sf0.001"


def test_signatures_plan_is_one_jvm_projection(spark):
    # The whole hash program (64 samples -> mean -> 64 bits -> 4 bands) is
    # a single let-bound expression: no shuffle, no explode, no Python.
    df = media_phash_signatures(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_copies_land_at_hamming_zero(spark):
    sigs = media_phash_signatures(spark, SF)
    dups = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(
            (F.col("n") > 1)
            & (F.col("n") <= PH_BUCKET_CAP)
        )
        .first()
    )
    if dups is None:  # corpus without exact dups: nothing to assert
        return
    a, b = sorted(dups.ids)[:2]
    # identical text (modulo the trim/lower the dup-grouping used) may
    # differ in case/whitespace; use raw-identical copies only
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id").isin([int(a), int(b)]))
        .collect()
    }
    if texts[a] != texts[b]:
        return
    pairs = phash_pairs_from_sigs(sigs)
    row = pairs.filter(
        (F.col("doc_a") == int(a)) & (F.col("doc_b") == int(b))
    ).first()
    assert row is not None and row.hamming == 0


def test_blocked_join_is_not_all_pairs(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .count()
    )
    pairs = QUERIES["dedup_media_phash_pairs"](spark, SF).count()
    assert pairs < docs * (docs - 1) / 2
    # and every surviving pair respects the Hamming cut-off
    over = (
        QUERIES["dedup_media_phash_pairs"](spark, SF)
        .filter(F.col("hamming") > PH_HAMMING_MAX)
        .count()
    )
    assert over == 0


def test_decoded_path_shares_banding(spark):
    # Real-codec aHash: BMP luma / WAV amplitude decode via mapInPandas
    # (MP4 pixel decode genuinely needs external codecs, so video rows are
    # excluded here), producing the same signature schema, so the banded
    # pair generator runs unchanged.
    media = synth_real_media_table(spark, SF).filter(
        F.col("media_type") != "video"
    )
    sigs1 = media_phash_decoded(media, fake=False)
    assert sigs1.columns == ["doc_id", "band0", "band1", "band2", "band3"]
    rows1 = sorted(map(tuple, sigs1.collect()))
    rows2 = sorted(map(tuple, media_phash_decoded(media, fake=False).collect()))
    assert rows1 == rows2 and len(rows1) > 0
    for r in rows1:
        assert all(0 <= b <= 0xFFFF for b in r[1:])
    pairs = phash_pairs_from_sigs(sigs1)
    assert pairs.columns == ["doc_a", "doc_b", "hamming"]
    pairs.count()  # executes the banded join end-to-end


def test_fake_decode_path_is_deterministic(spark):
    from polars_ad_etl_spark.operators.multimodal import media_table

    media = media_table(spark, SF)
    a = sorted(map(tuple, media_phash_decoded(media, fake=True).collect()))
    b = sorted(map(tuple, media_phash_decoded(media, fake=True).collect()))
    assert a == b and len(a) > 0


def test_wide_pairs_are_subset_semantics(spark):
    # The wide (two-band composite key) twin blocks strictly harder than
    # the single-band twin: every wide pair must also be a single-band
    # pair (same cap policy aside, buckets only shrink), and exact
    # duplicates (Hamming 0: ALL bands equal) always survive widening.
    from polars_ad_etl_spark.operators.media_dedup import (
        phash_pairs_from_sigs_wide,
    )

    sigs = media_phash_signatures(spark, SF)
    narrow = {
        (r.doc_a, r.doc_b) for r in phash_pairs_from_sigs(sigs).collect()
    }
    wide = {
        (r.doc_a, r.doc_b)
        for r in phash_pairs_from_sigs_wide(sigs).collect()
    }
    assert wide <= narrow
    zero_narrow = {
        (r.doc_a, r.doc_b)
        for r in phash_pairs_from_sigs(sigs).filter("hamming = 0").collect()
    }
    assert zero_narrow <= wide


def test_cross_codec_twins_pair_at_hamming_zero(spark):
    """The decode-normalized property (round-11): the same pixels stored as
    BMP and as PNG must land in one near-dup cluster — every fixture doc's
    (bmp=2d, png=2d+1) twin appears as a pair at Hamming 0, because both
    REAL container decoders round-trip the source pixels exactly. Also pins
    that the fixture actually exercised both codecs (non-empty)."""
    from polars_ad_etl_spark.operators.media_dedup import CC_MOD

    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_fixture = (
        d.filter((F.col("doc_id") >= 0) & (F.col("doc_id") % CC_MOD == 0))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_fixture > 0, "fixture empty at this SF — densify CC_MOD"
    pairs = QUERIES["dedup_media_cross_codec_pairs"](spark, SF)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    ids = [
        r.doc_id
        for r in d.filter(
            (F.col("doc_id") >= 0) & (F.col("doc_id") % CC_MOD == 0)
        )
        .select("doc_id")
        .distinct()
        .collect()
    ]
    for doc_id in ids:
        twin = (doc_id * 2, doc_id * 2 + 1)
        assert got.get(twin) == 0, f"cross-codec twin {twin} not paired"


def test_cross_codec_decoders_see_different_bytes(spark):
    """Guard against a degenerate fixture: the BMP and PNG blobs for the
    same pixels must be genuinely different byte streams (different
    container, different compression), so Hamming-0 pairing above can only
    come from pixel-exact decoding, never byte-identical blobs."""
    from polars_ad_etl_spark.operators import media_codecs as mc
    from polars_ad_etl_spark.operators.media_dedup import PH_BITS, _cc_grays

    px = [(v, v, v) for v in _cc_grays(0)]
    bmp = mc.encode_bmp(PH_BITS, 1, px)
    png = mc.encode_png(PH_BITS, 1, px, filter_type=4)
    assert bmp != png and bmp[:2] == b"BM" and png[1:4] == b"PNG"
    _, pa = mc.decode_bmp(bmp)
    _, pb = mc.decode_png(png)
    assert pa == pb == px
