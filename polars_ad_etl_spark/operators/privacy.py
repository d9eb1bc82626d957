"""Privacy QC: k-anonymity audit over quasi-identifier combinations.

Before a dataset with demographic-ish columns ships to training or
analytics, the standard re-identification check is k-anonymity: every
combination of quasi-identifiers (QIs) must be shared by at least k rows,
otherwise those rows are effectively identifiable and must be suppressed
or generalized. The audit is a single map-side-combinable groupBy on the
QI tuple — at 100 TB it is one shuffle keyed by the QI combination, and
the report (|distinct QI combos| rows) is small by construction.

This complements the content-level ``text_pii_redaction`` scrubber: that
one removes identifiers *inside* values, this one measures identifiability
*across* rows.

Reference parity note: the reference repo has no privacy surface
(SURVEY §2.8); this module is part of the governance extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet

K_ANON = 10


@register(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) >= {K_ANON} AS is_k_anonymous
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name, c_mktsegment
    ORDER BY n_name, c_mktsegment
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity report over the (nation, market segment) quasi-identifier
    pair: every equivalence class with its size and a pass/fail flag at
    k={K}. Groups below k are the re-identification risk surface a release
    gate would suppress or generalize.""".replace("{K}", str(K_ANON))
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet")
    nation = read_star_parquet(spark, f"{sf_dir}/nation.parquet")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            "n_name",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") >= K_ANON).alias("is_k_anonymous"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


@register(
    "privacy_suppression_impact",
    oracle=f"""
    WITH sizes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS gs
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (WHERE gs < {K_ANON}) AS BIGINT)
               AS n_small_groups,
           CAST(SUM(gs) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(gs) FILTER (WHERE gs < {K_ANON}), 0) AS BIGINT)
               AS n_suppressed_rows,
           CAST((1000 * COALESCE(SUM(gs) FILTER (WHERE gs < {K_ANON}), 0))
                // SUM(gs) AS BIGINT) AS suppressed_permille
    FROM sizes
    """,
)
def privacy_suppression_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release-gate summary for [[privacy_k_anonymity]]: how much data
    would k={K} suppression cost — small-group count and the exact permille
    of rows lost. Two stacked aggregations over the same single QI
    shuffle.""".replace("{K}", str(K_ANON))
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet")
    sizes = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("gs")
    )
    small = F.col("gs") < K_ANON
    return sizes.agg(
        F.count("*").alias("n_groups"),
        # count_if / coalesce: COUNT-FILTER / COALESCE-SUM oracle
        # semantics on 0 groups (0, not NULL)
        F.count_if(small).alias("n_small_groups"),
        F.sum("gs").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(small, F.col("gs")).otherwise(0)),
            F.lit(0).cast("long"),
        ).alias("n_suppressed_rows"),
    ).select(
        "n_groups",
        "n_small_groups",
        "n_rows",
        "n_suppressed_rows",
        F.expr("(1000 * n_suppressed_rows) div n_rows").alias(
            "suppressed_permille"
        ),
    )
