"""Skyline (Pareto frontier) queries.

The skyline of a set under (maximize A, minimize B) is the rows no other
row dominates — the classic multi-criteria shortlist ("biggest part for the
money"). The textbook formulation is a quadratic NOT EXISTS self-join; the
scalable formulation used here exploits that domination against a *bounded
discrete* axis (p_size is a small-int attribute) collapses to threshold
comparisons against per-size minima:

    keep(p)  ⇔  p.price == min price at p.size     (no same-size dominator)
             ∧  p.price  < min price at any larger size  (no larger-size
                dominator — strictly larger size dominates at price ≤)

So the plan is: one map-side-combinable groupBy(size) → ≤|sizes| rows, a
triangular self-join ON THE TINY AGGREGATE to get the strictly-larger-size
suffix minima (broadcast, |sizes|² pairs ≈ 2.5k), and one broadcast
semi-filter back onto the base scan. The 100 TB cost is one aggregation +
one broadcast join; the quadratic part never touches base data. For a
continuous dominator axis the same shape works with quantized buckets plus
an exact in-bucket pass (the two-level trick used across this repo).

The DuckDB oracle runs the naive NOT EXISTS, so the threshold rewrite is
proven equivalent, tie semantics included (equal (size, price) rows do not
dominate each other strictly — both survive).

Reference parity note: the reference repo has no skyline/preference surface
(SURVEY §2.8); this is part of the Spark-native extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet


@register(
    "skyline_parts",
    oracle="""
    WITH c AS (
        SELECT p_partkey, p_size,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    )
    SELECT p.p_partkey, p.p_size, p.price_cents
    FROM c p
    WHERE NOT EXISTS (
        SELECT 1 FROM c q
        WHERE q.p_size >= p.p_size AND q.price_cents <= p.price_cents
          AND (q.p_size > p.p_size OR q.price_cents < p.price_cents)
    )
    ORDER BY p.p_size, p.p_partkey
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts under (maximize size, minimize price): the
    value-shopper frontier. See the module docstring for why this runs as
    per-size minima + a broadcast threshold filter instead of the oracle's
    quadratic NOT EXISTS."""
    part = read_star_parquet(spark, f"{sf_dir}/part.parquet")
    c = part.select(
        "p_partkey",
        "p_size",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    per_size = c.groupBy("p_size").agg(F.min("price_cents").alias("min_cents"))
    # strictly-larger-size suffix minimum, computed on the tiny aggregate
    # (|sizes|² candidate pairs — broadcast, never touches base data)
    a = per_size.select(
        F.col("p_size").alias("s"), F.col("min_cents").alias("own_min")
    )
    b = per_size.select(
        F.col("p_size").alias("s2"), F.col("min_cents").alias("m2")
    )
    thresholds = (
        a.join(F.broadcast(b), F.col("s2") > F.col("s"), "left_outer")
        .groupBy("s", "own_min")
        .agg(F.min("m2").alias("larger_min"))
    )
    return (
        c.join(F.broadcast(thresholds), c.p_size == F.col("s"))
        .filter(
            (F.col("price_cents") == F.col("own_min"))
            & (
                F.col("larger_min").isNull()
                | (F.col("price_cents") < F.col("larger_min"))
            )
        )
        .select("p_partkey", "p_size", "price_cents")
        .orderBy("p_size", "p_partkey")
    )
