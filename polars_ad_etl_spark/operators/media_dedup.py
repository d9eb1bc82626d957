"""Perceptual-hash near-dup over the media column (round-10: dedup reaches
the third modality — text had MinHash/SimHash, embeddings had SemDeDup;
media frames get aHash).

The hash program (aHash, average hash): sample 64 evenly-spaced grayscale
values from the decoded frame, set bit i when sample_i >= mean — near-dup
frames differ in few bits, so pairing is Hamming-banded blocking (split the
64 bits into 4 x 16-bit bands; near-dups collide on >= 1 band — the SimHash
prefix-band pattern of dedup.py), then an exact ``bit_count(xor)`` Hamming
verify on the capped candidate pairs. NEVER all-pairs: candidates come from
band-equality equi-joins, hot buckets are capped.

Two decode paths, same downstream banding/pairing code:

- **Registry/oracle path** (this module's ``@register`` queries): the
  media table's blobs are UTF-8 text bytes (multimodal.media_table), and
  the "decoded grayscale samples" are the 64 evenly-spaced CHARACTER CODE
  POINTS of the text — a deterministic fake decode that both engines
  compute identically (``ascii``/``substring``/``length`` verified
  code-point-equal across Spark and DuckDB, astral planes included), so
  DuckDB replays the full hash program and the oracle checks signatures,
  banding, capping, and Hamming arithmetic end to end. The Spark side is
  one JVM projection (no UDF, no explode, no shuffle — plan-pinned).
- **Real-codec path** (:func:`media_phash_decoded`): aHash over genuinely
  decoded WAV/BMP/GIF/AVI samples via the ``mapInPandas`` decode
  (multimodal.decode_media with dim=64), for corpora whose blobs are real
  containers. Same signature schema, so :func:`phash_pairs_from_sigs`
  serves both paths.

Scale: signatures are a projection over the corpus (no shuffle); the pair
join shuffles only (band, 16-bit key) pairs; hot-bucket capping bounds the
worst bucket's fan-out exactly like the MinHash-LSH cap (dedup.py:479).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet

PH_BITS = 64
PH_BANDS = 4
PH_BAND_BITS = PH_BITS // PH_BANDS
PH_HAMMING_MAX = 10  # near-dup cut-off (of 64 bits)
PH_BUCKET_CAP = 64  # hot-band cap: a band value shared by more docs is a
#   degenerate bucket (e.g. the all-bits-one band of trivial payloads);
#   its quadratic pair fan-out is cut, same policy as the LSH cap.


def _pixel_sql(i: int, engine: str) -> str:
    """Grayscale sample i (0..63): the code point of the character at the
    i-th of 64 evenly spaced positions. ``greatest(len-1, 0)`` keeps the
    offset arithmetic non-negative (Spark ``div`` truncates toward zero
    while DuckDB ``//`` floors — they only agree on non-negative
    operands, so the program never produces a negative dividend)."""
    div = "div" if engine == "spark" else "//"
    return (
        f"ascii(substring(text, 1 + ({i} * greatest(length(text) - 1, 0))"
        f" {div} {PH_BITS - 1}, 1))"
    )


def _spark_bands_expr() -> str:
    """All four band values in ONE let-bound SQL expression: the 64 sample
    array and the total are each bound once via single-element transform
    (the CollapseProject lambda-inlining trap — see similarity._nearest_sql
    — would otherwise re-evaluate 64 substrings per bit)."""
    px = ", ".join(
        f"CAST({_pixel_sql(i, 'spark')} AS BIGINT)" for i in range(PH_BITS)
    )
    bands = []
    for k in range(PH_BANDS):
        terms = " + ".join(
            f"(CASE WHEN {PH_BITS} * element_at(p, {PH_BAND_BITS * k + j + 1})"
            f" >= tot THEN {1 << j} ELSE 0 END)"
            for j in range(PH_BAND_BITS)
        )
        bands.append(f"'band{k}', CAST({terms} AS INT)")
    return (
        f"transform(array(array({px})), p -> "
        f"transform(array(aggregate(p, CAST(0 AS BIGINT), (acc, x) -> acc + x)), "
        f"tot -> named_struct({', '.join(bands)}))[0])[0]"
    )


def _duck_sigs_sql() -> str:
    px = ", ".join(
        f"CAST({_pixel_sql(i, 'duck')} AS BIGINT)" for i in range(PH_BITS)
    )
    band_cols = []
    for k in range(PH_BANDS):
        terms = " + ".join(
            f"(CASE WHEN {PH_BITS} * p[{PH_BAND_BITS * k + j + 1}] >= t"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(PH_BAND_BITS)
        )
        band_cols.append(f"CAST({terms} AS INT) AS band{k}")
    return f"""
    base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    px AS (SELECT doc_id, list_value({px}) AS p FROM base),
    tot AS (SELECT doc_id, p, list_sum(p) AS t FROM px),
    sigs AS (SELECT doc_id, {", ".join(band_cols)} FROM tot)"""


MEDIA_PHASH_SIGS_SQL = f"""
    WITH {_duck_sigs_sql()}
    SELECT doc_id, band0, band1, band2, band3 FROM sigs
"""


@register("media_phash_signatures", oracle=MEDIA_PHASH_SIGS_SQL)
def media_phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit aHash per media document as 4 x 16-bit band columns (the
    split IS the index layout: band equality is the candidate key). One
    narrow JVM projection over the corpus: no UDF, no explode, no shuffle
    (plan-pinned by tests/test_media_dedup.py). Null-payload rows carry
    nothing to hash and are excluded by contract."""
    d = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", F.expr(_spark_bands_expr()).alias("ph"))
        .select("doc_id", "ph.*")
    )


def phash_pairs_from_sigs(sigs: DataFrame) -> DataFrame:
    """Hamming-banded near-dup pairs from ANY (doc_id, band0..3) signature
    frame (JVM-hashed registry path and mapInPandas-decoded path share
    this): band-equality candidates (4 equi-join arms via one union),
    hot buckets capped at PH_BUCKET_CAP, exact Hamming distance verified
    with bit_count(xor) per band, pairs kept under PH_HAMMING_MAX."""
    # Materialize the signatures ONCE before the fan-out: the pair plan
    # references sigs from 6+ subtrees (band arms + both Hamming-verify
    # sides); inlining the 64-sample hash expression into each would scan
    # the corpus per subtree and ship a multi-MB task binary per stage
    # (measured: heap OOM deserializing the task binary in a marathon
    # session). Signatures are 5 ints/doc — checkpointing them is the
    # point of computing a sketch.
    sigs = sigs.localCheckpoint(eager=True)
    arms = None
    for k in range(PH_BANDS):
        arm = sigs.select(
            "doc_id",
            F.lit(k).alias("band"),
            F.col(f"band{k}").alias("bkey"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    ok = (
        arms.groupBy("band", "bkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= PH_BUCKET_CAP)
        .select("band", "bkey")
    )
    arms = arms.join(ok, ["band", "bkey"])
    a = arms.select(
        F.col("doc_id").alias("doc_a"), "band", "bkey"
    )
    b = arms.select(
        F.col("doc_id").alias("doc_b"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(PH_BANDS)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(PH_BANDS)],
    )
    hamming = None
    for k in range(PH_BANDS):
        term = F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        hamming = term if hamming is None else hamming + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= PH_HAMMING_MAX)
    )


_DUCK_ARMS = " UNION ALL ".join(
    f"SELECT doc_id, {k} AS band, band{k} AS bkey FROM sigs"
    for k in range(PH_BANDS)
)
_DUCK_HAMMING = " + ".join(
    f"bit_count(xor(sa.band{k}, sb.band{k}))" for k in range(PH_BANDS)
)

MEDIA_PHASH_PAIRS_SQL = f"""
    WITH {_duck_sigs_sql()},
    arms AS ({_DUCK_ARMS}),
    ok AS (
        SELECT band, bkey FROM arms
        GROUP BY band, bkey HAVING COUNT(*) <= {PH_BUCKET_CAP}
    ),
    arms2 AS (SELECT a.* FROM arms a JOIN ok USING (band, bkey)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM arms2 a JOIN arms2 b USING (band, bkey)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST({_DUCK_HAMMING} AS INT) AS hamming
    FROM cand
    JOIN sigs sa ON sa.doc_id = cand.doc_a
    JOIN sigs sb ON sb.doc_id = cand.doc_b
    WHERE {_DUCK_HAMMING} <= {PH_HAMMING_MAX}
"""


@register("dedup_media_phash_pairs", oracle=MEDIA_PHASH_PAIRS_SQL)
def dedup_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup media pairs by perceptual hash: Hamming-banded candidate
    blocking over the aHash signatures, hot buckets capped, exact Hamming
    verify — the full program (sampling, hashing, banding, capping,
    distance) replayed by the DuckDB oracle."""
    return phash_pairs_from_sigs(media_phash_signatures(spark, sf_dir))


# ----------------------------------------------- wide-key (corpus-scale) twin
# Fixed-width banding has a birthday problem: with 4 x 16-bit bands,
# RANDOM band collisions grow ~ 4 * n^2 / 2^17 — measured super-linear in
# the sf sweep (the one honest confirmed entry; the hot-bucket cap bounds
# the worst bucket but not the count of 2-doc buckets). The corpus-scale
# shape widens the blocking key: candidates must match TWO of the four
# bands (C(4,2) = 6 composite 32-bit keys), shrinking random collisions
# by 2^16 (pairs ~ 6 * n^2 / 2^33 — negligible at any harness scale,
# linear in the sweep) at a recall trade: a single-band match no longer
# blocks, so recall comes from any CLEAN PAIR of bands (guaranteed for
# Hamming distance <= 1, probabilistic above — near-dups at distance d
# spread over 4 bands still leave a clean pair unless >= 3 bands are
# touched). The same widen-the-key move MinHash banding makes when a
# corpus outgrows its band space.

_WIDE_PAIRS = [(i, j) for i in range(PH_BANDS) for j in range(PH_BANDS) if i < j]


def phash_pairs_from_sigs_wide(sigs: DataFrame) -> DataFrame:
    """Near-dup pairs blocked on composite two-band (32-bit) keys — the
    corpus-scale variant of :func:`phash_pairs_from_sigs`; same capping,
    same exact Hamming verify and cut-off."""
    # same one-scan materialization rationale as phash_pairs_from_sigs
    sigs = sigs.localCheckpoint(eager=True)
    arms = None
    for bi, (i, j) in enumerate(_WIDE_PAIRS):
        arm = sigs.select(
            "doc_id",
            F.lit(bi).alias("band"),
            (
                F.col(f"band{i}").cast("long") * (1 << PH_BAND_BITS)
                + F.col(f"band{j}")
            ).alias("bkey"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    ok = (
        arms.groupBy("band", "bkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= PH_BUCKET_CAP)
        .select("band", "bkey")
    )
    arms = arms.join(ok, ["band", "bkey"])
    a = arms.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b = arms.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(PH_BANDS)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(PH_BANDS)],
    )
    hamming = None
    for k in range(PH_BANDS):
        term = F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        hamming = term if hamming is None else hamming + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= PH_HAMMING_MAX)
    )


_DUCK_WIDE_ARMS = " UNION ALL ".join(
    f"SELECT doc_id, {bi} AS band,"
    f" CAST(band{i} AS BIGINT) * {1 << PH_BAND_BITS} + band{j} AS bkey"
    " FROM sigs"
    for bi, (i, j) in enumerate(_WIDE_PAIRS)
)

MEDIA_PHASH_PAIRS_WIDE_SQL = f"""
    WITH {_duck_sigs_sql()},
    arms AS ({_DUCK_WIDE_ARMS}),
    ok AS (
        SELECT band, bkey FROM arms
        GROUP BY band, bkey HAVING COUNT(*) <= {PH_BUCKET_CAP}
    ),
    arms2 AS (SELECT a.* FROM arms a JOIN ok USING (band, bkey)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM arms2 a JOIN arms2 b USING (band, bkey)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST({_DUCK_HAMMING} AS INT) AS hamming
    FROM cand
    JOIN sigs sa ON sa.doc_id = cand.doc_a
    JOIN sigs sb ON sb.doc_id = cand.doc_b
    WHERE {_DUCK_HAMMING} <= {PH_HAMMING_MAX}
"""


@register("dedup_media_phash_pairs_wide", oracle=MEDIA_PHASH_PAIRS_WIDE_SQL)
def dedup_media_phash_pairs_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-scale media near-dup pairs: two-band composite blocking
    keys (see section comment) — candidate volume linear in corpus size
    where the single-band twin's random collisions grow quadratically;
    full program oracle-replayed."""
    return phash_pairs_from_sigs_wide(media_phash_signatures(spark, sf_dir))


# ------------------------------------------------- cross-codec dedup proof
# Round-10 verdict task 3: the real-codec path decodes pixels, but nothing
# proved the DECODE-NORMALIZED property — the same image stored in two
# different containers must land in one near-dup cluster. This query is
# that proof, registry-grade: a deterministic fixture derives one 64x1
# grayscale image per selected document (pixel values a pure function of
# doc_id), encodes it BOTH as 24-bit BMP and as zlib/Paeth-filtered PNG,
# runs the REAL container decoders (media_codecs.decode_bmp / decode_png
# via multimodal.decode_media(fake=False)) inside mapInPandas, and feeds
# the decoded signatures through the standard banded pairing. The DuckDB
# oracle replays the pixel function and the hash program WITHOUT any codec
# — so a hash match proves both encode→decode round-trips returned the
# exact source pixels, and every (bmp, png) twin pairs at Hamming 0
# (asserted by tests/test_media_dedup.py on top of the oracle).
#
# Determinism: the decoded luma of a gray pixel (v,v,v) is v/255.0; the
# signature path reconstructs the INTEGER gray (round(s*255) is exact for
# 8-bit values) and applies the integer aHash rule 64*g >= sum(g) — no
# float comparison anywhere, same trick as the ANN family's quantization.
# The pixel function bumps g[0] when sum(g) % 64 == 0 so the >= rule never
# sits on an exact tie (a tie requires 64*g_i == sum).

CC_MOD = 101  # fixture density: one image pair per 101 doc_ids
CC_MAX_ID = 1 << 40  # keeps mid = doc_id*2+1 and the pixel arithmetic
#   far from int64 overflow under ANSI on fuzzed corpora


def _cc_grays(doc_id: int) -> list[int]:
    g = [(doc_id * 37 + i * 11 + doc_id % 7) % 251 for i in range(PH_BITS)]
    if sum(g) % PH_BITS == 0:
        g[0] = (g[0] + 1) % 251
    return g


_CC_SIG_BANDS = []
for _k in range(PH_BANDS):
    _terms = " + ".join(
        f"(CASE WHEN {PH_BITS} * g[{PH_BAND_BITS * _k + _j + 1}] >= t"
        f" THEN {1 << _j} ELSE 0 END)"
        for _j in range(PH_BAND_BITS)
    )
    _CC_SIG_BANDS.append(f"CAST({_terms} AS INT) AS band{_k}")

MEDIA_CROSS_CODEC_SQL = f"""
    WITH ids AS (
        SELECT DISTINCT doc_id FROM documents
        WHERE doc_id >= 0 AND doc_id < {CC_MAX_ID} AND doc_id % {CC_MOD} = 0
    ),
    mids AS (
        SELECT doc_id * 2 AS mid, doc_id AS src FROM ids
        UNION ALL
        SELECT doc_id * 2 + 1 AS mid, doc_id AS src FROM ids
    ),
    g0 AS (
        SELECT mid,
               list_transform(generate_series(0, {PH_BITS - 1}),
                   i -> (src * 37 + i * 11 + src % 7) % 251) AS g
        FROM mids
    ),
    gf AS (
        SELECT mid,
               CASE WHEN list_sum(g) % {PH_BITS} = 0
                    THEN list_concat(list_value((g[1] + 1) % 251), g[2:])
                    ELSE g END AS g
        FROM g0
    ),
    tot AS (SELECT mid, g, list_sum(g) AS t FROM gf),
    sigs AS (SELECT mid AS doc_id, {", ".join(_CC_SIG_BANDS)} FROM tot),
    arms AS ({_DUCK_ARMS}),
    ok AS (
        SELECT band, bkey FROM arms
        GROUP BY band, bkey HAVING COUNT(*) <= {PH_BUCKET_CAP}
    ),
    arms2 AS (SELECT a.* FROM arms a JOIN ok USING (band, bkey)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM arms2 a JOIN arms2 b USING (band, bkey)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST({_DUCK_HAMMING} AS INT) AS hamming
    FROM cand
    JOIN sigs sa ON sa.doc_id = cand.doc_a
    JOIN sigs sb ON sb.doc_id = cand.doc_b
    WHERE {_DUCK_HAMMING} <= {PH_HAMMING_MAX}
"""


@register("dedup_media_cross_codec_pairs", oracle=MEDIA_CROSS_CODEC_SQL)
def dedup_media_cross_codec_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup pairs over a cross-codec twin fixture: each selected
    document's deterministic 64x1 grayscale image, stored as BOTH BMP
    (media id ``doc_id*2``) and PNG (``doc_id*2+1``), decoded by the REAL
    pure-python container decoders at the executors, hashed, and paired by
    the standard banded program. Every twin pairs at Hamming 0 iff both
    codecs round-trip pixels exactly — the decode-normalized property (see
    section comment). The mapInPandas stage is genuine codec work (the
    documented slow path); everything downstream is the shared JVM pairing
    plan."""
    d = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    ids = (
        d.filter(
            (F.col("doc_id") >= 0)
            & (F.col("doc_id") < CC_MAX_ID)
            & (F.col("doc_id") % CC_MOD == 0)
        )
        .select("doc_id")
        .distinct()
    )
    fixture = ids.select(
        "doc_id",
        F.explode(F.array(F.lit("bmp"), F.lit("png"))).alias("codec"),
    )

    # The executor's Python worker does not inherit the driver's sys.path
    # (a driver launched from an arbitrary cwd imports this package via its
    # own path entry); ship the package root by value with the closure and
    # bootstrap it worker-side — the local/shared-FS analogue of
    # sc.addPyFile. All other registry queries are pure JVM plans and never
    # ship closures, so this is the only query that needs it.
    import pathlib

    pkg_root = str(pathlib.Path(__file__).resolve().parents[2])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from polars_ad_etl_spark.operators import media_codecs as mc
        from polars_ad_etl_spark.operators.media_dedup import _cc_grays
        from polars_ad_etl_spark.operators.multimodal import decode_media

        for pdf in batches:
            out = {
                "doc_id": [], "band0": [], "band1": [], "band2": [], "band3": []
            }
            for doc_id, codec in zip(pdf["doc_id"], pdf["codec"]):
                doc_id = int(doc_id)
                px = [(v, v, v) for v in _cc_grays(doc_id)]
                if codec == "bmp":
                    blob, mid = mc.encode_bmp(PH_BITS, 1, px), doc_id * 2
                else:
                    blob, mid = (
                        mc.encode_png(PH_BITS, 1, px, filter_type=4),
                        doc_id * 2 + 1,
                    )
                s = decode_media(
                    blob, f"image/{codec}", fake=False, dim=PH_BITS
                )
                g = [round(v * 255) for v in s]  # exact for 8-bit grays
                t = sum(g)
                out["doc_id"].append(mid)
                for k in range(PH_BANDS):
                    out[f"band{k}"].append(
                        sum(
                            (1 << j)
                            if PH_BITS * g[PH_BAND_BITS * k + j] >= t
                            else 0
                            for j in range(PH_BAND_BITS)
                        )
                    )
            yield pd.DataFrame(out)

    sigs = fixture.mapInPandas(op, schema=PH_SIG_SCHEMA)
    return phash_pairs_from_sigs(sigs)


PH_SIG_SCHEMA = "doc_id long, band0 int, band1 int, band2 int, band3 int"


def media_phash_decoded(media: DataFrame, fake: bool = True) -> DataFrame:
    """aHash signatures over GENUINELY decoded media: 64 grayscale samples
    from the mapInPandas decode path (multimodal.decode_media, dim=64 —
    WAV amplitude / BMP / GIF / AVI frame luma), bits by the same
    sample >= mean rule, packed into the same 4 x 16-bit band schema so
    :func:`phash_pairs_from_sigs` runs unchanged downstream. ``fake=True``
    keeps the deterministic byte-sampled decode for codec-free tests."""
    from polars_ad_etl_spark.operators.multimodal import decode_media

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "band0": [], "band1": [], "band2": [], "band3": []}
            for doc_id, blob, mtype in zip(
                pdf["doc_id"], pdf["blob"], pdf["media_type"]
            ):
                samples = decode_media(blob, mtype, fake=fake, dim=PH_BITS)
                mean = sum(samples) / PH_BITS
                bits = [1 if s >= mean else 0 for s in samples]
                out["doc_id"].append(int(doc_id))
                for k in range(PH_BANDS):
                    band = sum(
                        bits[PH_BAND_BITS * k + j] << j
                        for j in range(PH_BAND_BITS)
                    )
                    out[f"band{k}"].append(band)
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=PH_SIG_SCHEMA)
