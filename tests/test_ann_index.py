"""ANN index persistence contract (sinks/ann_index.py +
operators/similarity_indexed.py).

The ``*_indexed`` twins must be bit-identical to their per-call-training
originals while doing ZERO training work on the query path, reading probe-
pruned posting lists, and never serving a stale artifact. Reference for the
pattern: the bucketed-store reuse contract in sources/star.py.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from polars_ad_etl_spark.cache import private_cache_root
from polars_ad_etl_spark.operators import QUERIES
from polars_ad_etl_spark.operators import similarity as S
from polars_ad_etl_spark.sinks import ann_index as AI

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_index(spark):
    shutil.rmtree(
        private_cache_root("spark_graft_ann_index"), ignore_errors=True
    )
    return AI.build_ann_index(spark, SF)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "base",
    ["sim_ivf_probe_topk", "sim_pq_adc_topk", "sim_ivfpq_topk"],
)
def test_indexed_twin_matches_original(spark, built_index, base):
    # Training is deterministic exact integer arithmetic, so the persisted
    # model must reproduce the per-call-training results bit-for-bit.
    assert _rows(QUERIES[base](spark, SF)) == _rows(
        QUERIES[base + "_indexed"](spark, SF)
    )


def test_query_phase_runs_no_training(spark, built_index, monkeypatch):
    # The reuse contract: once the artifact exists, the trainers are
    # unreachable from the query path — not "fast", UNREACHABLE.
    def _boom(*a, **k):
        raise AssertionError("training invoked on the indexed query path")

    monkeypatch.setattr(S, "kmeans_fixed", _boom)
    monkeypatch.setattr(S, "_pq_train", _boom)
    monkeypatch.setattr(S, "_kmeans_fixed_on", _boom)
    monkeypatch.setattr(S, "_label_centroid_arrays", _boom)
    for name in (
        "sim_ivf_probe_topk_indexed",
        "sim_pq_adc_topk_indexed",
        "sim_ivfpq_topk_indexed",
    ):
        assert QUERIES[name](spark, SF).count() > 0


def test_ivfpq_codes_read_is_partition_pruned(spark, built_index):
    # The codes store is hive-partitioned by coarse cluster and the query
    # carries an explicit cluster IN (probed) predicate, so probe pruning
    # is DIRECTORY pruning at planning time — and the plan never scans the
    # embeddings table at all (candidates are codes, queries were
    # collected driver-side).
    plan = (
        QUERIES["sim_ivfpq_topk_indexed"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "cluster" in plan
    assert "embeddings.parquet" not in plan


def test_ivf_probe_indexed_has_no_centroid_aggregation(spark, built_index):
    # The original recomputes per-label centroids with a posexplode +
    # two-level aggregation over the corpus; the indexed twin reads them
    # from model.json, so its plan must carry no Generate (posexplode).
    plan = (
        QUERIES["sim_ivf_probe_topk_indexed"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan


def test_index_reuse_and_mtime_staleness(spark, built_index, tmp_path):
    # Same corpus -> same artifact dir (reused, not rebuilt); touched
    # corpus file -> different artifact dir (stale index can't be served).
    assert AI.build_ann_index(spark, SF) == built_index
    twin = tmp_path / "sf"
    twin.mkdir()
    shutil.copyfile(
        f"{SF}/embeddings.parquet", twin / "embeddings.parquet"
    )
    d1 = AI.ann_index_dir(twin)
    import os

    os.utime(twin / "embeddings.parquet", ns=(1, 1))
    assert AI.ann_index_dir(twin) != d1


def test_empty_corpus_index_builds_and_serves_empty(spark, tmp_path):
    empty = tmp_path / "sf_empty"
    empty.mkdir()
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(empty / "embeddings.parquet"))
    idx = AI.build_ann_index(spark, empty)
    model = AI.load_ann_model(idx)
    assert model["coarse"] == [] and model["label_centroids"] == []
    for name in (
        "sim_ivf_probe_topk_indexed",
        "sim_pq_adc_topk_indexed",
        "sim_ivfpq_topk_indexed",
    ):
        assert QUERIES[name](spark, str(empty)).count() == 0


# ---------------------------------------------- incremental maintenance
# Contract (round-11): base trains/encodes the corpus half; append encodes
# the batch half against FROZEN models with zero training jobs; the
# composition equals a one-shot corpus-trained build; segments are
# immutable and idempotent; staleness is accounted against the budget.


@pytest.fixture(scope="module")
def built_incr_index(spark):
    # module-scoped like built_index; the cache root may already hold the
    # full-build artifact — distinct key prefixes keep them apart.
    return AI.build_ann_index_incremental(spark, SF)


def test_incremental_twin_matches_one_shot_corpus_build(
    spark, built_incr_index
):
    """base + appended segment must serve exactly the codes a single-shot
    corpus-trained build over ALL vectors would: train on corpus half,
    assign/encode everything with the trained models."""
    from polars_ad_etl_spark.operators import dedup as D
    from pyspark.sql import functions as F2

    e = S.load_embeddings(spark, SF).select("vec_id", "embedding")
    q_full = S._quantized(e)
    q_corpus = q_full.filter(~D._vec_is_batch(F2.col("vec_id")))
    coarse = S._kmeans_fixed_on(q_corpus, S.KMEANS_K, 2)
    _, codebooks = S._pq_train(spark, SF, q_full=q_full, q_train=q_corpus)
    lists = S._assign_quantized(q_full, coarse).select("vec_id", "cluster")
    want = _rows(S._pq_codes_df(q_full, codebooks).join(lists, "vec_id"))
    got = _rows(
        AI.read_codes_incremental(spark, built_incr_index).select(
            *[f.name for f in S._pq_codes_df(q_full, codebooks).schema]
            + ["cluster"]
        )
    )
    assert got == want and got


def test_incremental_query_phase_runs_no_training(
    spark, built_incr_index, monkeypatch
):
    def _boom(*a, **k):
        raise AssertionError("training invoked on the incremental query path")

    monkeypatch.setattr(S, "kmeans_fixed", _boom)
    monkeypatch.setattr(S, "_pq_train", _boom)
    monkeypatch.setattr(S, "_kmeans_fixed_on", _boom)
    monkeypatch.setattr(S, "_label_centroid_arrays", _boom)
    assert QUERIES["sim_ivfpq_topk_indexed_incremental"](spark, SF).count() > 0


def test_append_is_idempotent_and_segment_immutable(spark, built_incr_index):
    import os

    seg = built_incr_index / "segments" / "batch-0"
    before = {
        p: os.path.getmtime(p)
        for p in [str(f) for f in seg.rglob("*") if f.is_file()]
    }
    assert before
    again = AI.append_ann_batch(spark, SF, built_incr_index)
    assert again == seg
    after = {
        p: os.path.getmtime(p)
        for p in [str(f) for f in seg.rglob("*") if f.is_file()]
    }
    assert after == before  # replayed append rewrote nothing


def test_incremental_reuse_and_mtime_staleness(
    spark, built_incr_index, tmp_path
):
    assert AI.build_ann_index_incremental(spark, SF) == built_incr_index
    twin = tmp_path / "sf"
    twin.mkdir()
    shutil.copyfile(f"{SF}/embeddings.parquet", twin / "embeddings.parquet")
    d1 = AI.incr_index_dir(twin)
    import os

    os.utime(twin / "embeddings.parquet", ns=(1, 1))
    assert AI.incr_index_dir(twin) != d1
    # and the incremental key-space never collides with the full build's
    assert AI.incr_index_dir(twin) != AI.ann_index_dir(twin)


def test_unpublished_segment_debris_is_invisible(spark, built_incr_index):
    """Round-11 advice (low): a hard-killed append leaves a dot-prefixed
    ``.build-*`` dir under segments/ (``publish_dir``'s cleanup never runs
    on SIGKILL), and a manifest-less non-dot dir is a publish that never
    completed. Readers and the staleness accounting must see NEITHER — a
    later successful re-append would otherwise serve the real segment AND
    the stale partial, duplicating vec_ids in the posting lists."""
    seg_root = built_incr_index / "segments"
    real = seg_root / "batch-0"
    n_before = AI.read_codes_incremental(spark, built_incr_index).count()
    st_before = AI.index_staleness(built_incr_index)
    debris = seg_root / ".build-batch-0-999-deadbeef"
    partial = seg_root / "batch-partial"
    shutil.copytree(real, debris)
    shutil.copytree(real, partial)
    (partial / "manifest.json").unlink()
    try:
        assert AI.published_segments(built_incr_index) == [real]
        assert (
            AI.read_codes_incremental(spark, built_incr_index).count()
            == n_before
        )
        assert AI.index_staleness(built_incr_index) == st_before
    finally:
        shutil.rmtree(debris)
        shutil.rmtree(partial)


def test_staleness_accounting_against_budget(spark, built_incr_index):
    st = AI.index_staleness(built_incr_index)
    assert st["base_n_vectors"] > 0 and st["appended_n_vectors"] > 0
    # the standard split appends 20 against 80: within the 0.25 budget,
    # but only just — the accounting must see every segment vector
    assert st["fraction"] == pytest.approx(
        st["appended_n_vectors"] / st["base_n_vectors"]
    )
    assert st["budget"] == AI.STALENESS_BUDGET
    assert st["within_budget"] == (st["fraction"] <= st["budget"])


def test_corrupt_codes_fail_loudly_not_empty(spark, tmp_path):
    """Round-10 advice (low): only a missing/empty codes directory may fall
    back to the contract-schema empty frame; a CORRUPT posting store must
    propagate, never silently serve empty results."""
    idx = tmp_path / "ivfpq_corrupt"
    codes = idx / "codes" / "cluster=0"
    codes.mkdir(parents=True)
    (codes / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        AI.read_codes(spark, idx).collect()
    # the legitimate empty cases still return the contract schema
    missing = AI.read_codes(spark, tmp_path / "ivfpq_missing")
    assert missing.count() == 0 and "vec_id" in missing.columns
    empty_dir = tmp_path / "ivfpq_empty"
    (empty_dir / "codes").mkdir(parents=True)
    assert AI.read_codes(spark, empty_dir).count() == 0


# ------------------------------------------------------- compaction job
# Contract (round-12): when the appended fraction exceeds the manifest
# budget, compact_ann_index retrains over ALL served vectors, publishes a
# new base generation atomically (PRIMARY pointer flip), and drops the
# folded segments; under budget (and on replay) it is a no-op.


def _twin_sf(tmp_path):
    twin = tmp_path / "sf"
    twin.mkdir()
    shutil.copyfile(f"{SF}/embeddings.parquet", twin / "embeddings.parquet")
    return twin


def test_compaction_triggers_at_threshold_and_folds(
    spark, tmp_path, monkeypatch
):
    """Over-budget index folds: accounting resets, segments disappear,
    replays (of the compaction AND of the folded append) are no-ops, and
    a resurrected folded-segment directory (crash between pointer flip
    and GC) stays invisible to readers."""
    monkeypatch.setattr(AI, "STALENESS_BUDGET", 0.1)
    twin = _twin_sf(tmp_path)
    idx = AI.build_ann_index_incremental(spark, twin)
    st = AI.index_staleness(idx)
    assert not st["within_budget"]  # ~20/80 appended vs the 0.1 budget
    n_served = AI.read_codes_incremental(spark, idx).count()
    seg_backup = tmp_path / "seg_backup"
    shutil.copytree(idx / "segments" / "batch-0", seg_backup)

    res = AI.compact_ann_index(spark, twin, idx)
    assert res["compacted"] is True
    st2 = AI.index_staleness(idx)
    assert st2["appended_n_vectors"] == 0 and st2["within_budget"]
    assert (
        st2["base_n_vectors"]
        == st["base_n_vectors"] + st["appended_n_vectors"]
    )
    assert AI.read_codes_incremental(spark, idx).count() == n_served
    assert not (idx / "segments" / "batch-0").exists()  # GC ran

    # replay no-op: already under budget
    assert AI.compact_ann_index(spark, twin, idx)["compacted"] is False
    # a replayed append of the FOLDED segment must not re-encode it
    AI.append_ann_batch(spark, twin, idx)
    assert AI.index_staleness(idx)["appended_n_vectors"] == 0
    assert AI.read_codes_incremental(spark, idx).count() == n_served
    # crash window: folded segment dir resurfaces after the pointer flip —
    # the manifest's folded_segments list must keep it invisible
    shutil.copytree(seg_backup, idx / "segments" / "batch-0")
    assert AI.read_codes_incremental(spark, idx).count() == n_served
    assert AI.index_staleness(idx)["appended_n_vectors"] == 0


def test_compaction_noop_under_budget(spark, tmp_path):
    twin = _twin_sf(tmp_path)
    idx = AI.build_ann_index_incremental(spark, twin)
    st = AI.index_staleness(idx)
    assert st["within_budget"]  # 20/80 is inside the default 0.25 budget
    res = AI.compact_ann_index(spark, twin, idx)
    assert res["compacted"] is False
    assert (idx / "segments" / "batch-0").exists()  # nothing folded
    assert not (idx / "PRIMARY").exists()  # generation 0 still primary


def test_compaction_query_phase_equals_full_training(spark, tmp_path):
    """Query-phase equivalence through the fold: before compaction the
    incremental twin serves the corpus-trained composition; after, it
    must serve EXACTLY what per-call training over all vectors serves
    (training is deterministic exact integer arithmetic) — the compacted
    index IS the one-shot full build, bit for bit."""
    twin = _twin_sf(tmp_path)
    sfd = str(twin)
    idx = AI.build_ann_index_incremental(spark, twin)
    before = _rows(QUERIES["sim_ivfpq_topk_indexed_incremental"](spark, sfd))
    assert before
    res = AI.compact_ann_index(spark, twin, idx, force=True)
    assert res["compacted"] is True
    after = _rows(QUERIES["sim_ivfpq_topk_indexed_incremental"](spark, sfd))
    want = _rows(QUERIES["sim_ivfpq_topk"](spark, sfd))
    assert after == want
    # and post-compaction queries still run zero training jobs
    model = AI.load_ann_model(idx)
    assert model["mode"] == "incremental-compacted"


def test_model_json_round_trips_exact_values(spark, built_index):
    # Centroids/codebooks are ints (exact in JSON); label centroids are
    # doubles whose json round-trip must be bit-exact (repr round-trip).
    model = AI.load_ann_model(built_index)
    coarse, q_full = S.kmeans_fixed(spark, SF)
    assert model["coarse"] == coarse
    _, codebooks = S._pq_train(spark, SF, q_full=q_full)
    assert model["codebooks"] == codebooks
    fresh = {
        r["label"]: [float(x) for x in r["ce"]]
        for r in S._label_centroid_arrays(
            S.load_embeddings(spark, SF)
        ).collect()
    }
    persisted = {d["label"]: d["ce"] for d in model["label_centroids"]}
    assert persisted == fresh
