from polars_ad_etl_spark.streaming.documents import (
    corpus_indexes,
    incremental_ingest_decisions,
    incremental_ingest_stream,
    incremental_ingest_stream_bounded,
    read_documents_stream,
)
from polars_ad_etl_spark.streaming.embeddings import (
    corpus_vector_indexes,
    embedding_ingest_decisions,
    read_embeddings_stream,
)
from polars_ad_etl_spark.streaming.events import (
    read_events_stream,
    hourly_rollup_stream,
    sessionize_stream,
    sliding_rollup_stream,
    enrich_purchases_stream,
    attribute_purchases_stream,
    user_totals_stream,
    dedup_events_stream,
    daily_active_users_stream,
    daily_active_users_approx_stream,
    spend_alerts_stream,
    cep_funnel_stream,
)

__all__ = [
    "corpus_indexes",
    "corpus_vector_indexes",
    "embedding_ingest_decisions",
    "read_embeddings_stream",
    "incremental_ingest_decisions",
    "incremental_ingest_stream",
    "incremental_ingest_stream_bounded",
    "read_documents_stream",
    "daily_active_users_stream",
    "daily_active_users_approx_stream",
    "read_events_stream",
    "hourly_rollup_stream",
    "sessionize_stream",
    "sliding_rollup_stream",
    "enrich_purchases_stream",
    "attribute_purchases_stream",
    "user_totals_stream",
    "dedup_events_stream",
    "spend_alerts_stream",
    "cep_funnel_stream",
]
