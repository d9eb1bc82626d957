"""Skew mitigation: salted two-phase aggregation and salted broadcast joins.

AQE's skew-join splitting handles most skew at runtime, but two patterns are
worth owning explicitly at 100 TB:

- **Salted aggregation**: a group-by whose key distribution is power-law
  (one hot advertiser, one hot token) bottlenecks on the reducer owning the
  hot key. Two-phase: group by (key, salt) first — spreading the hot key over
  N reducers — then re-aggregate by key. Decimal-exact sums make the
  two-phase result *identical* to the one-phase result, so salting is purely
  a physical choice (proved by sharing the unsalted oracle).
- **Salted broadcast join** (`replicate_broadcast_join`): when the build side
  is small but the probe side has a hot key, broadcast the build side and let
  every probe partition join locally — no shuffle of the skewed side at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.exact import dsum, dsum_sql
from polars_ad_etl_spark.sources.star import read_star_parquet
from polars_ad_etl_spark.operators.registry import register

DEFAULT_SALTS = 16


def salted_sum(
    df: DataFrame,
    keys: list[str],
    agg_col: Column,
    alias: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase decimal-exact sum, skew-proof. ``spark_partition_id`` salts
    without a random generator, so the plan stays deterministic."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    phase1 = (
        df.groupBy(*keys, salt)
        .agg(F.sum(agg_col.cast("decimal(25,6)")).alias("_partial"))
    )
    return (
        phase1.groupBy(*keys)
        .agg(F.sum("_partial").cast("double").alias(alias))
    )


@register(
    "skew_salted_revenue_by_suppkey",
    oracle=f"""
    SELECT l_suppkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def skew_salted_revenue_by_suppkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation vs the plain one-phase oracle — identical
    answers (exact decimal addition is associative), different physics: the
    hottest supplier key is spread over 16 reducers in phase 1."""
    l = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return salted_sum(l, ["l_suppkey"], revenue, "revenue")


def replicate_broadcast_join(
    probe: DataFrame, build: DataFrame, on: Column
) -> DataFrame:
    """Join a skewed probe side against a small build side with zero shuffle
    of the probe: broadcast the build side explicitly."""
    return probe.join(F.broadcast(build), on)


# --------------------------------------------------------- skew diagnosis
# Before you salt a key, you measure it. The heavy-hitter profile of a
# shuffle key — top keys, their integer-permille share of all rows — is the
# diagnostic that decides between plain hash, AQE skew split, and explicit
# salting. Plan shape: one map-side-combinable count per key, then a
# TakeOrderedAndProject top-k (per-partition k + driver merge, no global
# sort) against a broadcast 1-row total.
_SKEW_TOP_K = 10


@register(
    "profile_key_skew",
    oracle=f"""
    WITH c AS (
        SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
    SELECT key, cnt,
           (1000 * cnt) // t.total AS share_permille,
           (cnt * t.n_keys * 100) // t.total AS x_mean_pct
    FROM c, t
    ORDER BY cnt DESC, key
    LIMIT {_SKEW_TOP_K}
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle key: the top
    10 keys with integer-permille row share and
    percent-of-mean-key-size (100 = perfectly uniform). The decision input
    for the salting/AQE strategies above."""
    l = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    c = l.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    t = c.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "key",
            "cnt",
            F.expr("(1000 * cnt) div total").alias("share_permille"),
            F.expr("(cnt * n_keys * 100) div total").alias("x_mean_pct"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(_SKEW_TOP_K)
    )


@register(
    "profile_join_fanout",
    oracle="""
    WITH a AS (
        SELECT l_orderkey AS k, COUNT(*) AS ca FROM lineitem GROUP BY 1
    ), b AS (
        SELECT o_orderkey AS k, COUNT(*) AS cb FROM orders GROUP BY 1
    ), prod AS (
        SELECT a.k, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
               CAST(ca * cb AS BIGINT) AS fanout
        FROM a JOIN b ON b.k = a.k
    ), tot AS (
        SELECT CAST(SUM(fanout) AS BIGINT) AS total_rows_out FROM prod
    )
    SELECT k, ca, cb, fanout, total_rows_out
    FROM prod, tot
    ORDER BY fanout DESC, k LIMIT 10
    """,
)
def profile_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-explosion diagnostic (the companion to
    [[profile_key_skew]]): for a prospective join key, per-side key counts
    and their product — the exact output-row contribution of each key —
    plus the total join output size, BEFORE running the join. The top-10
    by fanout names the keys that would dominate a blowup. Two map-side-
    combinable aggregates + a join of the (small) per-key count tables;
    the total is a broadcast 1-row aggregate. Run this when a join's
    estimated output explodes — it distinguishes 'one hot key' (salt it)
    from 'uniformly multiplicative' (rethink the join)."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    a = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("ca")
    )
    b = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("cb")
    )
    prod = a.join(b, "k").select(
        "k", "ca", "cb", (F.col("ca") * F.col("cb")).alias("fanout")
    )
    tot = prod.agg(F.sum("fanout").alias("total_rows_out"))
    return (
        prod.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("fanout"), "k")
        .limit(10)
    )
