"""polars_ad_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `pepsi-monster/polars-ad-etl`
(a single-node eager Polars ETL system), re-expressed Spark-first.

Architecture (see SURVEY.md for the blueprint):

- ``plans/``      config-driven pipeline engine (MultiSourceAdETL equivalent):
                  schema DSL, config validation, the 6-stage dataflow
                  read -> capitalize -> detect-source -> clean -> standardize -> union,
                  all as ONE lazy Catalyst plan per sink.
- ``sources/``    readers: tabular dir scan (csv/xlsx dispatch), parquet star
                  schema loader, Google-Sheets connector (driver-side).
- ``sinks/``      CSV+BOM single-file sink, Sheets upload (driver-side).
- ``functions/``  expression library: semantic shims that reproduce observable
                  Polars semantics (null-keeping remove, extract-as-null,
                  strip-suffix-once), the five reference cleaners, text/vector/
                  hashing expression builders.
- ``operators/``  the generic query surface (joins/aggs/windows/setops/topk)
                  plus the LLM-data-pipeline operators: dedup (exact, minhash,
                  simhash, n-gram jaccard), similarity search, text analysis,
                  multimodal column plumbing.
- ``streaming/``  Structured Streaming slice over the events table.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from polars_ad_etl_spark.session import get_spark  # noqa: F401
