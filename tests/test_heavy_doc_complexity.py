"""Complexity smoke on heavy documents — the fast in-suite detector for
the O(n²) text-path regressions the round-8 textfuzz sweep found.

Every operator here was quadratic in document length at least once
(variable-position substr walking UTF-8 from byte 0, DuckDB list-slice
comprehensions, Catalyst lambda inlining re-running a subexpression per
element, unbounded regex runs) and is now linear. The detector is a wall
bound with a ~20× safety margin: on these ~150k-char docs the linear
forms run in ≲2s per engine while any reintroduced quadratic costs
minutes (measured: 23s for a single 100 KB doc through quadratic substr,
>8 min through an inlined split) — so the bound is regime-swing-proof
without being tight enough to flake.
"""

from __future__ import annotations

import time

import pytest

BOUND_S = 90.0
# Round 12: widened 45 -> 90. A full-suite run on this VM measured the
# text_cdc_dedup_gain ORACLE at 66.9s under suite load (isolated rerun of
# the whole file: 16/16 in 14s total), so 45s sat inside the loaded-host
# envelope of a LINEAR path. The detector keeps its margin: the quadratic
# forms this guards against cost minutes on these fixtures (>8 min for an
# inlined split), not tens of seconds.

# one of each heavy shape: many tokens, one giant token, one repeated token
_HEAVY = [
    (1, " ".join(f"tok{i % 997}x{i % 31}" for i in range(30_000)), "en"),
    (2, "y" * 60_000, "en"),
    (3, "spam " * 15_000, "en"),
    (4, "café noël ångström astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 😀 tail of the doc", "en"),
]

QUERIES_UNDER_TEST = [
    "dedup_minhash_signatures",
    "text_cdc_duplicate_chunks",
    "text_cdc_dedup_gain",
    "text_char_trigram_table",
    "text_bpe_train_merges",
    "text_bpe_encode_stats",
    "text_bpe_merge_candidates",
    "text_pii_redaction",
    "text_token_counts",
    "text_boilerplate_ngrams",
    # window-hash text paths: one hash per 8-token window, windows move as
    # 8-byte hashes — must stay linear in token count per doc
    "dedup_duplicate_passages",
    "dedup_duplicate_spans",
    # regex projections that must stay linear on long runs (bounded
    # classes / literal anchors — see the PII local-part lesson)
    "text_encoding_quality",
    "text_url_domains",
    # media perceptual hash: 64 FIXED samples per doc regardless of doc
    # length — must stay flat on 150k-char docs (a per-char walk here
    # would be the substr-quadratic class)
    "media_phash_signatures",
    "dedup_media_phash_pairs",
]


@pytest.fixture(scope="module")
def heavy_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("heavy")
    # single FILE (not a Spark directory): duckdb_conn reads
    # <dir>/documents.parquet as one file, matching the testdata layout
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _, _ in _HEAVY], pa.int64()),
                "text": [t for _, t, _ in _HEAVY],
                "lang": [lang for _, _, lang in _HEAVY],
                "source": ["synthetic"] * len(_HEAVY),
                "n_chars": pa.array(
                    [len(t) for _, t, _ in _HEAVY], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_spark_side_is_linear_on_heavy_docs(spark, heavy_dir, name):
    from polars_ad_etl_spark.operators import QUERIES

    t0 = time.time()
    QUERIES[name](spark, heavy_dir).count()
    wall = time.time() - t0
    assert wall < BOUND_S, (
        f"{name} took {wall:.1f}s on ~150k-char docs — a linear text path "
        f"runs this in ~2s; a reintroduced quadratic (substr walk, slice "
        f"comprehension, inlined lambda subexpression) costs minutes"
    )


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_oracle_side_is_linear_on_heavy_docs(heavy_dir, name):
    from oracle_util import duckdb_conn

    from polars_ad_etl_spark.operators import ORACLES

    con = duckdb_conn(heavy_dir)
    t0 = time.time()
    con.sql(ORACLES[name]).fetchall()
    wall = time.time() - t0
    assert wall < BOUND_S, (
        f"{name} oracle took {wall:.1f}s on ~150k-char docs — the DuckDB "
        f"mirrors must stay slice-free/indexed just like the Spark side"
    )
