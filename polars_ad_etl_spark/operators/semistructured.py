"""Semi-structured + fuzzy-match operators: JSON property extraction (every
LLM-data pipeline carries JSON metadata columns), edit-distance fuzzy joins,
INTERSECT ALL, and interval range-frame windows.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_ad_etl_spark.functions.exact import dsum, dsum_sql
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sinks.jsonl import write_jsonl
from polars_ad_etl_spark.sources.tabular import read_jsonl
from polars_ad_etl_spark.sources.star import read_star_parquet, load_embeddings, load_events


# ------------------------------------------------------------------- JSON
@register(
    "events_json_props",
    oracle=f"""
    WITH kx AS (
        SELECT event_type, value,
               TRY_CAST(json_extract(props, '$.k') AS DOUBLE) AS kd
        FROM events
        WHERE props IS NOT NULL AND json_valid(props)
    )
    SELECT CAST(FLOOR(kd) AS BIGINT) // 10 AS k_decile,
           event_type,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM kx
    WHERE kd IS NOT NULL AND abs(kd) <= 1e15
    GROUP BY 1, 2
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed property out of the JSON ``props`` column and roll up
    by its decile — schema-on-read over semi-structured payloads, JVM-side
    (get_json_object, no Python). Malformed-payload policy (declared on
    both engines, exercised by the fuzz sweep): unparseable JSON or a
    non-numeric ``k`` contributes nothing — try_cast, never a crash, since
    schema drift in a metadata column must not abort a 100-TB job. Numeric
    ``k`` is FLOORED to an integer (the engines' direct to-BIGINT casts
    disagree: DuckDB rounds 3.7 to 4, Spark's try_cast rejects it); the
    |k| <= 1e15 guard keeps an adversarial '1e400' payload from
    overflowing the integer cast."""
    e = load_events(spark, sf_dir)
    kd = F.get_json_object("props", "$.k").try_cast("double")
    k = F.when(kd.isNotNull() & (F.abs(kd) <= 1e15), F.floor(kd)).cast(
        "long"
    )
    return (
        e.filter(k.isNotNull())
        .groupBy(
            (k / 10).cast("bigint").alias("k_decile"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


# ------------------------------------------------------------ fuzzy match
@register(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS distance
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over the distinct name domain — dedupe
    the domain FIRST (64 names, not 20k rows), then pair. At scale the
    domain-dedup is the difference between joining attributes and joining
    the fact table."""
    p = read_star_parquet(spark, f"{sf_dir}/part.parquet").select("p_name").distinct()
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("a.p_name") < F.col("b.p_name"))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("distance"),
        )
        .filter(F.col("distance") <= 4)
    )


# -------------------------------------------------------- INTERSECT ALL
@register(
    "setop_intersect_all_balances",
    oracle="""
    SELECT CAST(FLOOR(c_acctbal) AS BIGINT) AS bal FROM customer
    INTERSECT ALL
    SELECT CAST(FLOOR(s_acctbal) AS BIGINT) AS bal FROM supplier
    """,
)
def setop_intersect_all_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (min multiplicity, like SQL INTERSECT ALL) on
    floored balances so overlaps actually occur. floor() before the int cast:
    double->bigint CASTs round in DuckDB but truncate in Spark — floor is the
    engine-portable quantizer."""
    c = read_star_parquet(spark, f"{sf_dir}/customer.parquet").select(
        F.floor("c_acctbal").cast("bigint").alias("bal")
    )
    s = read_star_parquet(spark, f"{sf_dir}/supplier.parquet").select(
        F.floor("s_acctbal").cast("bigint").alias("bal")
    )
    return c.intersectAll(s)


# ------------------------------------------------- interval range frames
@register(
    "window_trailing_30d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per customer, total spend in the trailing 30
    days *by event time*, not row count — same-date rows share a frame, so
    the result is deterministic without a row tie-break."""
    o = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    o.createOrReplaceTempView("orders_rf")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_30d_spend
        FROM orders_rf
        """
    )


# --------------------------------------------------- map explode over JSON
@register(
    "events_json_kv_counts",
    oracle="""
    SELECT prop_key, COUNT(*) AS n,
           COUNT(DISTINCT event_type) AS n_types
    FROM (
        SELECT event_type, unnest(json_keys(props)) AS prop_key
        FROM events WHERE props IS NOT NULL AND json_valid(props)
    )
    GROUP BY prop_key
    """,
)
def events_json_kv_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-less JSON: parse props into a MAP and explode to key rows —
    the dynamic-key path where get_json_object's fixed paths don't work.
    All JVM-side (from_json + explode); one shuffle on the key."""
    e = load_events(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return (
        e.filter(F.col("props").isNotNull())
        .select("event_type", F.explode_outer(m).alias("prop_key", "prop_value"))
        .filter(F.col("prop_key").isNotNull())
        .groupBy("prop_key")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


# ------------------------------------------------- array higher-order fns
@register(
    "embedding_array_stats",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4)
               AS l2_norm,
           CAST(list_max(embedding::DOUBLE[]) AS DOUBLE) AS max_elem,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (aggregate/filter/max) over the
    embedding column — per-vector stats computed element-wise in codegen,
    no explode, no shuffle."""
    from polars_ad_etl_spark.functions.vectors import norm

    e = load_embeddings(spark, sf_dir)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(norm(F.col("embedding")), 4).alias("l2_norm"),
        F.array_max(as_double).alias("max_elem"),
        F.size(F.filter(as_double, lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
    )


# ---------------------------------------------------------------- VARIANT
@register(
    "events_props_variant",
    oracle=f"""
    WITH kx AS (
        SELECT event_type,
               TRY_CAST(json_extract(props, '$.k') AS DOUBLE) AS kd
        FROM events
        WHERE props IS NOT NULL AND json_valid(props)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(FLOOR(kd) AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(FLOOR(kd) AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CAST(FLOOR(kd) AS BIGINT)) AS BIGINT) AS sum_k
    FROM kx
    WHERE kd IS NOT NULL AND abs(kd) <= 1e15
    GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through the VARIANT type (Spark 4 /
    open-lakehouse binary JSON): ``parse_json`` once into a variant value,
    ``variant_get`` typed paths out. vs ``get_json_object``
    (``events_json_props``): a variant column parses the text ONCE and
    stores a binary tree, so N path extractions cost N tree walks, not N
    re-parses — at 100 TB with wide metadata payloads that is the scan-time
    difference that pays for the type. The DuckDB oracle reads the same
    paths with its JSON extraction. Malformed-payload policy (see
    events_json_props): try_parse_json / try_variant_get — unparseable or
    non-numeric payloads contribute nothing, never a crash; numeric k is
    floored (variant-get 'long' truncates 3.7 to 3 toward zero while
    DuckDB's direct BIGINT cast rounds to 4 — extracting as double and
    flooring makes the engines agree, negative fractions included)."""
    e = load_events(spark, sf_dir)
    v = F.try_parse_json("props")
    kd = F.try_variant_get(v, "$.k", "double")
    k = F.when(kd.isNotNull() & (F.abs(kd) <= 1e15), F.floor(kd)).cast(
        "long"
    )
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


# ------------------------------------------------------------------ JSONL
# JSONL is the native interchange format of LLM corpora; the engine reads
# it via sources/tabular.py::read_jsonl (and the quarantining variant) and
# writes it via sinks/jsonl.py::write_jsonl. The differential proof of
# round-trip fidelity is a registry query: write the documents table to
# JSONL shards, read it back through the schema'd reader, and
# hash-match a DuckDB oracle that never left parquet — JSON escaping,
# unicode, and null-field dropping (the writer omits null fields; the
# reader resurfaces them as NULLs) must all be lossless or the per-group
# text digests diverge. The JSONL twin materializes once per (source path,
# mtime) under the uid-keyed private cache root (cache.py: 0700 dir,
# ownership-verified, atomic build-then-rename publish — a shared temp path
# was a poisoning/race surface, round-9 advice), same staleness key as the
# bucketed layouts in sources/star.py.

from polars_ad_etl_spark.cache import private_cache_root, publish_dir

# The documents corpus contract (TESTDATA.md schema) for the schema'd JSONL
# read — explicit on purpose: schema inference over JSONL is a second full
# scan of every shard at 100 TB, so corpus readers always declare.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT md5(text)) AS n_distinct_texts,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    GROUP BY lang, source
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus profile computed over a JSONL round-trip
    of the documents table (sources/jsonl.py). The oracle reads the
    original parquet, so any loss in the JSONL writer/reader — mangled
    escapes, dropped rows, a corrupt-quarantined line that should have
    parsed — shows up as a digest mismatch, not a silent corruption."""
    src = Path(sf_dir) / "documents.parquet"
    key = f"{src.resolve()}:{src.stat().st_mtime_ns}"
    root = private_cache_root("spark_graft_jsonl_twins")
    out = root / f"docs_{hashlib.md5(key.encode()).hexdigest()[:12]}"
    if not (out / "_SUCCESS").exists():
        # Build in a unique sibling dir, publish by atomic rename: a reader
        # can never observe a half-written twin, and a concurrent-writer
        # race resolves to exactly one (equivalent) copy.
        with publish_dir(out) as tmp:
            write_jsonl(spark.read.parquet(str(src)), str(tmp), n_shards=4)
    d = read_jsonl(spark, out, DOCUMENTS_JSONL_SCHEMA)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct(F.md5("text")).alias("n_distinct_texts"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
