"""Bucketed-layout twins for the documents/embeddings tables (round 9).

The events table got its production layout (hive daily partitions +
loader-side pruning) in round 8; this module does the same for the
dedup/ANN tables. Each query here is a *layout twin*: same semantics as a
flat-parquet registry query, but reading the bucketed store from
``sources/star.py`` (``load_documents_bucketed_by_hash`` /
``load_documents_bucketed_by_id`` / ``load_embeddings_bucketed``), so the
plan shows the Exchange eliminated on the bucketed side — the one-time
write shuffle amortized over every downstream join/aggregation. The DuckDB
oracles read the flat table (DuckDB has no bucketing), which is exactly the
differential proof: layout must never change results.

At test scale the store is materialized lazily on first load (once per
source mtime + bucket spec — see ``sources/star.py``); at 100 TB the same
``bucketBy`` write is a scheduled compaction job and these queries only
READ the store — the twins' read-side plans are identical either way,
which is what the plan pins hold.

Plan pins live in tests/test_plan_quality.py:
- exact dedup over the hash-bucketed store: ZERO Exchange in the whole plan
  (the groupBy key IS the bucket key);
- pair-payload / ANN-payload fetch: the bucketed scan side joins with no
  Exchange between its scan and the join (only the small id-list side
  shuffles to match the bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.dedup import (
    LSH_PAIRS_SQL,
    dedup_minhash_lsh_pairs,
)
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.operators.similarity import (
    LSH_TOPK_SQL,
    sim_lsh_bucketed_topk,
)
from polars_ad_etl_spark.sources.star import (
    load_documents_bucketed_by_hash,
    load_documents_bucketed_by_id,
    load_embeddings_bucketed,
)


@register(
    "dedup_exact_documents_bucketed",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_documents_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`dedup.dedup_exact_documents` over the content-hash-bucketed
    store: groupBy(text_hash) on a table bucketed by text_hash satisfies
    the aggregation's distribution requirement straight off the scan — the
    plan has NO Exchange (pinned). At 100 TB this turns every dedup pass
    from a full-corpus shuffle into pure scan work."""
    d = load_documents_bucketed_by_hash(spark, sf_dir)
    return d.groupBy("text_hash").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


@register(
    "dedup_lsh_pairs_bucketed",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL})
    SELECT p.doc_a, p.doc_b, CAST(strlen(d.text) AS INT) AS b_bytes
    FROM pairs p JOIN documents d ON d.doc_id = p.doc_b
    """,
)
def dedup_lsh_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs resolved against the doc_id-bucketed payload
    store (each pair fetches the duplicate's byte size — the metadata a
    keep-heuristic needs). The candidate list is tiny relative to the
    corpus, so the join shuffles ONLY the id list to match the store's
    bucketing; the 100-TB document side never moves (plan-pinned).
    Byte length (Spark ``octet_length`` / DuckDB ``strlen``) rather than
    character length: Spark's ``length`` counts UTF-16 code units where
    DuckDB counts codepoints — byte length is the only length the two
    engines define identically on astral-plane text."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    docs = load_documents_bucketed_by_id(spark, sf_dir).select(
        "doc_id", F.octet_length("text").alias("b_bytes")
    )
    return pairs.join(docs, pairs.doc_b == docs.doc_id).select(
        "doc_a", "doc_b", "b_bytes"
    )


@register(
    "sim_topk_payload_fetch_bucketed",
    oracle=f"""
    WITH topk AS ({LSH_TOPK_SQL})
    SELECT t.query_id, t.neighbor_id, t.cosine, t.rnk, e.label
    FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
    """,
)
def sim_topk_payload_fetch_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search returns ids; serving needs payloads. This twin resolves
    the LSH top-k neighbor ids against the vec_id-bucketed embeddings
    store — the point-join shape every vector-search deployment runs per
    query batch. Only the k x |queries| result rows shuffle to match the
    store's bucketing; the store side is Exchange-free (plan-pinned)."""
    topk = sim_lsh_bucketed_topk(spark, sf_dir)
    emb = load_embeddings_bucketed(spark, sf_dir).select("vec_id", "label")
    return topk.join(emb, topk.neighbor_id == emb.vec_id).select(
        "query_id", "neighbor_id", "cosine", "rnk", "label"
    )
