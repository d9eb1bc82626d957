"""Labeled streaming embedding admission (streaming/embeddings.py).

The vector sibling of the document ingest decisions: batch-equivalence
modulo the lambda split (near_batch belongs to the compaction), layer
precedence on a synthetic twin fixture, crash-replay idempotency, and
checkpoint restart. All state contracts mirror tests/test_streaming.py's
document pipeline pins.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import shutil
import time

from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.dedup import (
    INCR_SPLIT_PERMILLE,
    _VEC_INCR_SALT,
)
from polars_ad_etl_spark.streaming import (
    corpus_vector_indexes,
    embedding_ingest_decisions,
    read_embeddings_stream,
)
from polars_ad_etl_spark.streaming.embeddings import _admit_vec_batch

SF = "/root/testdata/sf0.001"

DIM = 64


def _is_batch(vec_id: int) -> bool:
    h = int(
        hashlib.md5(f"{_VEC_INCR_SALT}{vec_id}".encode()).hexdigest()[:8], 16
    )
    return h % 1000 >= INCR_SPLIT_PERMILLE


def _basis(i: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[i % DIM] = scale
    return v


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def _write_stream_file(spark, rows, stream_dir, name, when=None):
    w = f"{stream_dir}/../w_{name}"
    _frame(spark, rows).coalesce(1).write.mode("overwrite").parquet(w)
    os.makedirs(stream_dir, exist_ok=True)
    dst = f"{stream_dir}/{name}.parquet"
    shutil.copy(_glob.glob(f"{w}/part-*.parquet")[0], dst)
    if when is not None:
        os.utime(dst, (when, when))


def test_embedding_decisions_match_batch_labels(spark, tmp_path):
    """Stream labels vs the batch keep list on the real sf0.001 table.
    The lambda split and the exact pre-filter make the map:

    - batch ``kept``        -> stream ``kept`` (exactly);
    - stream ``near_corpus``/``exact_corpus`` -> batch ``near_corpus``
      (an exact corpus twin has cosine 1 in the same bucket);
    - stream ``exact_batch`` -> batch ``near_batch`` or ``near_corpus``
      (the earlier identical arrival carried the geometry);
    - stream ``kept``        -> batch ``kept`` or ``near_batch``
      (non-exact within-batch pairs are the compaction's layer).
    """
    from polars_ad_etl_spark.operators.dedup import (
        dedup_incremental_embedding_keep,
    )

    vk, bv = corpus_vector_indexes(spark, SF)
    q = embedding_ingest_decisions(
        read_embeddings_stream(spark, SF),
        vk, bv,
        out_dir=f"{tmp_path}/decisions",
        seen_dir=f"{tmp_path}/seen",
        checkpoint=f"{tmp_path}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.vec_id: r.reason
        for r in spark.read.parquet(f"{tmp_path}/decisions").collect()
    }
    want = {
        r.vec_id: r.reason
        for r in dedup_incremental_embedding_keep(spark, SF).collect()
    }
    assert set(got) == set(want) and got
    for vec_id, batch_reason in want.items():
        s = got[vec_id]
        if batch_reason == "kept":
            assert s == "kept", vec_id
        elif batch_reason == "near_corpus":
            assert s in ("near_corpus", "exact_corpus", "exact_batch"), vec_id
        else:  # near_batch
            assert s in ("kept", "exact_batch"), vec_id
    # and in the reverse direction every stream label lands in its image
    for vec_id, s in got.items():
        b = want[vec_id]
        if s in ("near_corpus", "exact_corpus"):
            assert b == "near_corpus", vec_id
        elif s == "exact_batch":
            assert b in ("near_corpus", "near_batch"), vec_id


def test_embedding_decisions_layers_and_state(spark, tmp_path):
    """Synthetic fixture exercising every layer across two micro-batches,
    including the cross-batch seen-index: exact corpus twin, scaled
    (cosine-1) near-corpus vector, kept vector; then exact twins of a
    DROPPED and of a KEPT earlier arrival — both must label exact_batch."""
    cids = [i for i in range(1, 400) if not _is_batch(i)]
    bids = [i for i in range(1, 400) if _is_batch(i)]
    v_c = _basis(0)
    v_near = _basis(0, 2.0)  # cosine 1 vs corpus, same sign bucket
    v_new = _basis(1)
    v_new2 = _basis(2)

    stream_dir = f"{tmp_path}/stream_src/embeddings.parquet"
    now = time.time()
    _write_stream_file(
        spark,
        [(bids[0], v_c), (bids[1], v_near), (bids[2], v_new)],
        stream_dir, "f0", now - 60,
    )
    _write_stream_file(
        spark,
        [(bids[3], v_near), (bids[4], v_new), (bids[5], v_new2)],
        stream_dir, "f1", now - 30,
    )
    corpus_dir = f"{tmp_path}/corpus"
    _frame(spark, [(cids[0], v_c)]).coalesce(1).write.parquet(
        f"{corpus_dir}/embeddings.parquet"
    )
    vk, bv = corpus_vector_indexes(spark, corpus_dir)
    q = embedding_ingest_decisions(
        read_embeddings_stream(
            spark, f"{tmp_path}/stream_src", max_files_per_trigger=1
        ),
        vk, bv,
        out_dir=f"{tmp_path}/decisions",
        seen_dir=f"{tmp_path}/seen",
        checkpoint=f"{tmp_path}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.vec_id: r.reason
        for r in spark.read.parquet(f"{tmp_path}/decisions").collect()
    }
    assert got == {
        bids[0]: "exact_corpus",
        bids[1]: "near_corpus",
        bids[2]: "kept",
        bids[3]: "exact_batch",  # twin of a DROPPED arrival: still exact_batch
        bids[4]: "exact_batch",  # twin of a KEPT arrival
        bids[5]: "kept",
    }


def test_embedding_decisions_same_batch_replay(spark, tmp_path):
    """Crash-replay idempotency: re-invoking the admission with the SAME
    batch_id must reproduce identical decisions (seen read is batch_id <
    current), and a later batch still sees the earlier batch's keys."""
    cids = [i for i in range(1, 400) if not _is_batch(i)]
    bids = [i for i in range(1, 400) if _is_batch(i)]
    corpus_dir = f"{tmp_path}/corpus"
    _frame(spark, [(cids[0], _basis(0))]).coalesce(1).write.parquet(
        f"{corpus_dir}/embeddings.parquet"
    )
    vk, bv = corpus_vector_indexes(spark, corpus_dir)
    out, seen = f"{tmp_path}/decisions", f"{tmp_path}/seen"
    b0 = _frame(
        spark,
        [(bids[0], _basis(1)), (bids[1], _basis(1)), (bids[2], _basis(0))],
    )
    _admit_vec_batch(b0, 0, vk, bv, out, seen)
    first = {
        r.vec_id: (r.reason, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    assert first == {
        bids[0]: ("kept", True),
        bids[1]: ("exact_batch", False),
        bids[2]: ("exact_corpus", False),
    }
    _admit_vec_batch(b0, 0, vk, bv, out, seen)
    assert first == {
        r.vec_id: (r.reason, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    _admit_vec_batch(
        _frame(spark, [(bids[3], _basis(1)), (bids[4], _basis(2))]),
        1, vk, bv, out, seen,
    )
    after = {r.vec_id: r.reason for r in spark.read.parquet(out).collect()}
    assert after[bids[3]] == "exact_batch" and after[bids[4]] == "kept"


def test_embedding_decisions_checkpoint_restart(spark, tmp_path):
    """Restart from the same checkpoint: adjudicated decisions appear
    exactly once, and a post-restart exact twin labels exact_batch via the
    lake-resident seen index."""
    cids = [i for i in range(1, 400) if not _is_batch(i)]
    bids = [i for i in range(1, 400) if _is_batch(i)]
    stream_dir = f"{tmp_path}/stream_src/embeddings.parquet"
    _write_stream_file(
        spark, [(bids[0], _basis(1))], stream_dir, "f0", time.time() - 60
    )
    corpus_dir = f"{tmp_path}/corpus"
    _frame(spark, [(cids[0], _basis(0))]).coalesce(1).write.parquet(
        f"{corpus_dir}/embeddings.parquet"
    )
    vk, bv = corpus_vector_indexes(spark, corpus_dir)

    def start():
        return embedding_ingest_decisions(
            read_embeddings_stream(
                spark, f"{tmp_path}/stream_src", max_files_per_trigger=1
            ),
            vk, bv,
            out_dir=f"{tmp_path}/decisions",
            seen_dir=f"{tmp_path}/seen",
            checkpoint=f"{tmp_path}/ckpt",
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _write_stream_file(
        spark, [(bids[1], _basis(1)), (bids[2], _basis(2))], stream_dir, "f1"
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(f"{tmp_path}/decisions").collect()
    assert len(rows) == len({r.vec_id for r in rows}) == 3
    got = {r.vec_id: r.reason for r in rows}
    assert got == {
        bids[0]: "kept",
        bids[1]: "exact_batch",
        bids[2]: "kept",
    }


def test_seen_index_read_failure_propagates(spark, tmp_path):
    """Round-11 advice (low): 'first batch' is an EXPLICIT missing/empty
    probe of the seen dir; a CORRUPT/unreadable index on a mid-stream batch
    must fail loudly — a swallowed read error would serve an empty seen set
    and permanently mislabel exact_batch duplicates as kept."""
    import pytest

    cids = [i for i in range(1, 100) if not _is_batch(i)]
    bids = [i for i in range(1, 100) if _is_batch(i)]
    corpus_dir = f"{tmp_path}/corpus"
    _frame(spark, [(cids[0], _basis(0))]).coalesce(1).write.parquet(
        f"{corpus_dir}/embeddings.parquet"
    )
    vk, bv = corpus_vector_indexes(spark, corpus_dir)
    out, seen = f"{tmp_path}/decisions", f"{tmp_path}/seen"
    bad = f"{seen}/batch_id=0"
    os.makedirs(bad)
    with open(f"{bad}/part-00000.parquet", "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(Exception):
        _admit_vec_batch(
            _frame(spark, [(bids[0], _basis(1))]), 1, vk, bv, out, seen
        )
    # nothing was adjudicated: the decisions sink stayed unwritten
    assert not os.path.isdir(out)


def test_persisted_vector_indexes_match_derived(spark, tmp_path):
    """Materialized static-side vector indexes (corpus_vector_indexes_
    persisted) must be row-identical to the derived ones, reuse the
    artifact on a second call, and go stale with the source mtime — the
    100 TB shape where a micro-batch reads a compaction-maintained table
    instead of rescanning the corpus per trigger."""
    import os
    import shutil

    from polars_ad_etl_spark.streaming import (
        corpus_vector_indexes,
        corpus_vector_indexes_persisted,
    )

    vk_d, bv_d = corpus_vector_indexes(spark, SF)
    vk_p, bv_p = corpus_vector_indexes_persisted(spark, SF)
    assert sorted(map(tuple, vk_d.collect())) == sorted(
        map(tuple, vk_p.collect())
    )
    assert sorted(
        (r.cid, r.bucket, tuple(r.ce)) for r in bv_d.collect()
    ) == sorted((r.cid, r.bucket, tuple(r.ce)) for r in bv_p.collect())
    src_file = next(
        p for p in vk_p.inputFiles() if p.endswith(".parquet")
    ).replace("file:", "")
    before = os.path.getmtime(src_file)
    corpus_vector_indexes_persisted(spark, SF)
    assert os.path.getmtime(src_file) == before
    twin = tmp_path / "sf"
    twin.mkdir()
    shutil.copyfile(f"{SF}/embeddings.parquet", twin / "embeddings.parquet")
    d1 = corpus_vector_indexes_persisted(spark, str(twin))[0].inputFiles()
    os.utime(twin / "embeddings.parquet", ns=(1, 1))
    d2 = corpus_vector_indexes_persisted(spark, str(twin))[0].inputFiles()
    assert set(d1) != set(d2)


def test_embedding_decisions_identical_with_persisted_indexes(
    spark, tmp_path
):
    from polars_ad_etl_spark.streaming import (
        corpus_vector_indexes,
        corpus_vector_indexes_persisted,
        embedding_ingest_decisions,
        read_embeddings_stream,
    )

    results = {}
    for label, (vk, bv) in (
        ("derived", corpus_vector_indexes(spark, SF)),
        ("persisted", corpus_vector_indexes_persisted(spark, SF)),
    ):
        q = embedding_ingest_decisions(
            read_embeddings_stream(spark, SF), vk, bv,
            out_dir=f"{tmp_path}/{label}/decisions",
            seen_dir=f"{tmp_path}/{label}/seen",
            checkpoint=f"{tmp_path}/{label}/ckpt",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        results[label] = {
            r.vec_id: (r.reason, r.keep)
            for r in spark.read.parquet(
                f"{tmp_path}/{label}/decisions"
            ).collect()
        }
    assert results["derived"] == results["persisted"] and results["derived"]
