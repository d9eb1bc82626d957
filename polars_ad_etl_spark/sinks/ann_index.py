"""ANN index persistence: the trained-artifact compaction job.

Rounds 5-9 shipped IVF / PQ / IVF-PQ search whose model state (coarse
k-means centroids, per-subspace PQ codebooks, per-label centroids) was
retrained inside every query invocation — correct and bounded, but at
100 TB index *build* is a scheduled job and serving *reads* a persisted
index. This module is that job, mirroring the bucketed-layout pattern
(``sinks/bucketed.py::compact_star_bucketed`` / ``sources/star.py``):

- :func:`build_ann_index` trains ONCE per (embeddings file, mtime, index
  params) and persists, under the uid-keyed private cache root
  (``cache.py``, atomic build-then-rename publish):

  - ``model.json`` — coarse centroids + PQ codebooks + label centroids
    (driver-side model state, K x D scale — kilobytes);
  - ``codes/`` — parquet of (vec_id, code0..code{M-1}) hive-partitioned
    by ``cluster``: the inverted-list layout itself. A probe-pruned query
    filters on ``cluster`` and reads NPROBE/k of the files at planning
    time — at 100 TB the lists ARE the partition layout.

- the ``*_indexed`` registry twins (operators/similarity_indexed.py) load
  this artifact and run ONLY the query phase: no training scan, no
  Lloyd iterations, no centroid aggregation. They are oracle-identical to
  the per-call-training originals because training is deterministic exact
  integer arithmetic (same init, same tie-breaks) — pinned by
  tests/test_ann_index.py, which also proves the reuse contract (a built
  index makes the trainers unreachable from the query path).

Staleness: the artifact path is keyed by source path + mtime_ns + every
index parameter, so regenerated data or changed hyper-parameters can never
serve a stale index — the same contract as the bucketed stores.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_ad_etl_spark.cache import private_cache_root, publish_dir

def _index_params() -> dict:
    from polars_ad_etl_spark.operators import similarity as S

    return {
        "k": S.KMEANS_K,
        "iters": 2,
        "pq_m": S.PQ_M,
        "pq_k": S.PQ_K,
        "q_scale": S.KMEANS_Q_SCALE,
        "q_offset": S.KMEANS_Q_OFFSET,
    }


def ann_index_dir(sf_dir: str | Path) -> Path:
    """The artifact directory for this corpus + parameter set (may not be
    built yet)."""
    src = Path(sf_dir) / "embeddings.parquet"
    p = _index_params()
    key = (
        f"{src.resolve()}:{src.stat().st_mtime_ns}:"
        + ":".join(f"{k}={v}" for k, v in sorted(p.items()))
    )
    root = private_cache_root("spark_graft_ann_index")
    return root / f"ivfpq_{hashlib.md5(key.encode()).hexdigest()[:12]}"


def build_ann_index(spark: SparkSession, sf_dir: str | Path) -> Path:
    """Train-and-persist (or reuse) the IVF-PQ index for ``sf_dir``'s
    embeddings. Idempotent per (file, mtime, params); safe under
    concurrent builders (atomic publish, deterministic content). In
    production this runs as the scheduled post-ingest compaction job; the
    lazy call from the ``*_indexed`` queries just moves the same one-time
    cost onto the first reader."""
    out = ann_index_dir(sf_dir)
    if (out / "model.json").exists():
        return out
    from polars_ad_etl_spark.operators import similarity as S

    coarse, q_full = S.kmeans_fixed(spark, str(sf_dir))
    _, codebooks = S._pq_train(spark, str(sf_dir), q_full=q_full)
    lists = S._assign_quantized(q_full, coarse).select("vec_id", "cluster")
    codes = S._pq_codes_df(q_full, codebooks).join(lists, "vec_id")
    label_cent = [
        {"label": r["label"], "ce": [float(x) for x in r["ce"]]}
        for r in S._label_centroid_arrays(
            S.load_embeddings(spark, str(sf_dir))
        ).collect()
    ]
    model = {
        "params": _index_params(),
        "coarse": coarse,
        "codebooks": codebooks,
        # NULL labels can exist in dirty corpora (edge `nulls` variant);
        # key them after the real labels so the sort is total.
        "label_centroids": sorted(
            label_cent,
            key=lambda d: (d["label"] is None, d["label"] or 0),
        ),
    }
    with publish_dir(out) as tmp:
        # Hive-partition the posting lists by cluster id: probe pruning
        # becomes directory pruning. One file per list at this scale; at
        # corpus scale the writer would also repartition by cluster.
        codes.write.mode("overwrite").partitionBy("cluster").parquet(
            str(tmp / "codes")
        )
        (tmp / "model.json").write_text(
            json.dumps(model), encoding="utf-8"
        )
    return out


def load_ann_model(index_dir: Path) -> dict:
    """Driver-side model state (coarse centroids, codebooks, label
    centroids) — a pure file read, no Spark jobs."""
    return json.loads((index_dir / "model.json").read_text(encoding="utf-8"))


def read_codes(spark: SparkSession, index_dir: Path) -> DataFrame:
    """The persisted posting lists: (vec_id, code0.., cluster). An index
    built over an EMPTY corpus has no partition directories (partitionBy
    writes none for zero rows), so reads fall back to an empty frame with
    the contract schema instead of failing schema inference."""
    from polars_ad_etl_spark.operators import similarity as S

    path = index_dir / "codes"
    # Empty-corpus detection is EXPLICIT (round-10 advice, low): only a
    # missing/empty codes directory falls back to the contract-schema empty
    # frame. A corrupt index, permission error, or transient IO failure
    # propagates — an *_indexed query must fail loudly, not return empty.
    has_parquet = path.is_dir() and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(path)
        for f in files
    )
    if not has_parquet:
        fields = [T.StructField("vec_id", T.LongType())] + [
            T.StructField(f"code{m}", T.IntegerType())
            for m in range(S.PQ_M)
        ] + [T.StructField("cluster", T.IntegerType())]
        return spark.createDataFrame([], T.StructType(fields))
    return spark.read.parquet(str(path))


def read_label_centroids(spark: SparkSession, index_dir: Path) -> DataFrame:
    """Per-label centroids as a (label, ce array<double>) frame built from
    the persisted model — a broadcast-sized local relation, replacing the
    full-corpus centroid aggregation on the query path."""
    cent = load_ann_model(index_dir)["label_centroids"]
    schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("ce", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(d["label"], d["ce"]) for d in cent], schema
    )
