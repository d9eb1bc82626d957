"""Persisted-index ANN twins: the serving path of IVF / PQ / IVF-PQ.

The originals in ``similarity.py`` train their model state (coarse k-means
centroids, PQ codebooks, per-label centroids) inside every invocation —
the right shape for a verification oracle, the wrong shape for serving at
100 TB, where index build is a scheduled job (``sinks/ann_index.py::
build_ann_index``) and queries read the persisted artifact. Each twin here
is oracle-IDENTICAL to its original (training is deterministic exact
integer arithmetic, so persisted-and-reloaded model state is bit-equal to
freshly-trained state — pinned by tests/test_ann_index.py) while its query
phase does ZERO training work:

- no Lloyd iterations, no init collect, no centroid aggregation scan;
- candidate data comes from the persisted ``codes/`` store
  (hive-partitioned by coarse cluster — probe pruning is DIRECTORY
  pruning, visible as PartitionFilters in the scan) or, for IVF probing,
  from the corpus restricted to probed lists;
- the only embeddings-table access is the N_QUERIES query vectors
  (vec_id predicate pushed into the parquet scan) — queries are runtime
  input by definition, not index state.

The reuse contract mirrors the bucketed stores (``sources/star.py``): the
artifact is keyed by (source path, mtime, params), built lazily on first
use or eagerly by the compaction job, and never served stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import ORACLES, register
from polars_ad_etl_spark.operators import similarity as S
from polars_ad_etl_spark.sinks.ann_index import (
    build_ann_index,
    build_ann_index_incremental,
    load_ann_model,
    read_codes,
    read_codes_incremental,
    read_label_centroids,
)


# contracts=False on all three: the oracle strings are taken from the
# registry AFTER contract rewriting (ORACLES stores the rewritten text),
# so re-applying the rewrite would duplicate the __embeddings CTE.
@register(
    "sim_ivf_probe_topk_indexed", oracle=ORACLES["sim_ivf_probe_topk"],
    contracts=False,
)
def sim_ivf_probe_topk_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``sim_ivf_probe_topk`` served from the persisted index: the
    per-label centroids come from ``model.json`` (a broadcast-sized local
    relation) instead of a full-corpus aggregation, so the query phase
    never runs the posexplode/groupBy training subplan (plan-pinned: no
    Generate node)."""
    idx = build_ann_index(spark, sf_dir)
    e = S.load_embeddings(spark, sf_dir)
    return S._ivf_probe_topk_impl(e, read_label_centroids(spark, idx))


@register(
    "sim_pq_adc_topk_indexed", oracle=ORACLES["sim_pq_adc_topk"],
    contracts=False,
)
def sim_pq_adc_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_pq_adc_topk`` served from the persisted index: codebooks from
    ``model.json``, candidate codes from the ``codes/`` store — the scan
    side touches int8-scale codes only, never the vectors (the memory
    economics that make PQ work at scale), and no Lloyd pass runs."""
    idx = build_ann_index(spark, sf_dir)
    codebooks = load_ann_model(idx)["codebooks"]
    codes = read_codes(spark, idx).drop("cluster")
    qrows = S._pq_query_rows(spark, sf_dir)
    lut_rows = [
        (int(r.vec_id), S._pq_flat_lut([int(x) for x in r.qe], codebooks))
        for r in sorted(qrows, key=lambda r: r.vec_id)
    ]
    return S._pq_adc_rank(spark, codes, lut_rows)


@register(
    "sim_ivfpq_topk_indexed", oracle=ORACLES["sim_ivfpq_topk"],
    contracts=False,
)
def sim_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_ivfpq_topk`` served from the persisted index. The probed
    cluster ids are known driver-side (coarse ranking against the
    persisted centroids), so the candidate read carries an explicit
    ``cluster IN (probed)`` predicate — against the hive-partitioned
    ``codes/`` store that is partition-directory pruning: the query plans
    over NPROBE/k of the index files (PartitionFilters pin in
    tests/test_ann_index.py). The subsequent broadcast join applies the
    same restriction per query, so the filter changes bytes read, not
    results."""
    idx = build_ann_index(spark, sf_dir)
    model = load_ann_model(idx)
    coarse, codebooks = model["coarse"], model["codebooks"]
    qrows = S._pq_query_rows(spark, sf_dir)
    lut_rows = S._ivfpq_luts(qrows, coarse, codebooks)
    probed = sorted({cl for _, cl, _ in lut_rows})
    codes = read_codes(spark, idx)
    # empty probe set (empty corpus / no query vectors): isin([]) is not
    # analyzable — the correct candidate set is empty.
    codes = codes.where(
        F.col("cluster").isin(probed) if probed else F.lit(False)
    )
    return S._ivfpq_rank(spark, codes, lut_rows)


def _corpus_train_where() -> str:
    """The 80/20 split's CORPUS predicate over the oracle's quantized ``q``
    CTE — the exact complement of operators/dedup.py::_vec_is_batch, so the
    incremental index and the delta dedup paths partition vectors
    identically."""
    from polars_ad_etl_spark.functions.hashing import portable_hash32_sql
    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _VEC_INCR_SALT,
    )

    h = portable_hash32_sql(
        f"'{_VEC_INCR_SALT}' || CAST(vec_id AS VARCHAR)"
    )
    return f"({h} % 1000) < {INCR_SPLIT_PERMILLE}"


@register(
    "sim_ivfpq_topk_indexed_incremental",
    oracle=S._ivfpq_oracle_sql(train_where=_corpus_train_where()),
)
def sim_ivfpq_topk_indexed_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-PQ served from the INCREMENTALLY-MAINTAINED index
    (sinks/ann_index.py): base build trains coarse centroids + codebooks on
    the CORPUS half of the standard 80/20 hash split and encodes corpus
    vectors; the new-batch half is APPENDED as an immutable segment —
    assigned to frozen cells, encoded with frozen codebooks, zero training
    jobs. Query phase reads base + segment posting lists (both
    hive-partitioned by cluster, probed-cluster directory pruning in each
    branch). The oracle replays the same semantics: unrolled Lloyd with
    training restricted to the corpus predicate, assignments over all
    vectors — so incremental maintenance is proven equal to a one-shot
    corpus-trained rebuild, the same contract the delta dedup paths pin.
    Reference parity: the reference has no vector indexes; this extends the
    commissioned ANN family's production-delta story."""
    idx = build_ann_index_incremental(spark, sf_dir)
    model = load_ann_model(idx)
    coarse, codebooks = model["coarse"], model["codebooks"]
    qrows = S._pq_query_rows(spark, sf_dir)
    lut_rows = S._ivfpq_luts(qrows, coarse, codebooks)
    probed = sorted({cl for _, cl, _ in lut_rows})
    codes = read_codes_incremental(spark, idx)
    codes = codes.where(
        F.col("cluster").isin(probed) if probed else F.lit(False)
    )
    return S._ivfpq_rank(spark, codes, lut_rows)
