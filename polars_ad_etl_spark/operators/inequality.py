"""Concentration / inequality statistics — exact integer formulations.

Gini coefficients and Gini-Simpson diversity indexes are the standard
concentration diagnostics for a curation pipeline (is one source dominating
the corpus? is a user's behavior monocultural?) and for revenue analytics
(balance concentration per market). Both are computed here in *exact
integer* arithmetic (cents / counts, permille outputs) so the DuckDB oracle
hash-matches bit-for-bit — the same determinism rule as ``functions.exact``.

Scale notes:
- Gini needs a rank within each group. The window is PARTITIONED by the
  group key (nation), never global; with ~25 nations a per-nation sort is
  the right plan up to billions of customers per nation (the sort is
  spillable and per-partition). If a single group ever outgrows a task, the
  two-level bucketed-cumsum rank (``curation.py::curation_packed_sequences``)
  is the drop-in replacement — same closed form, no per-group sort.
- Simpson is two map-side-combinable aggregations (groupBy(user, type) then
  groupBy(user)); no window, no skew hazard beyond the user key itself.

Reference parity note: the reference repo has no statistics surface
(SURVEY §2.8); this module is part of the Spark-native extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet, load_events


@register(
    "stats_gini_by_nation",
    oracle="""
    WITH cents AS (
        SELECT c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
               c_custkey
        FROM customer
        WHERE c_acctbal > 0
    ), ranked AS (
        SELECT c_nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents, c_custkey) AS r
        FROM cents
    ), agg AS (
        SELECT c_nationkey,
               COUNT(*) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(r * cents) AS BIGINT) AS rank_weighted
        FROM ranked
        GROUP BY c_nationkey
    )
    SELECT n_name,
           n_customers,
           total_cents,
           CAST((1000 * (2 * rank_weighted - (n_customers + 1) * total_cents))
                // (n_customers * total_cents) AS BIGINT) AS gini_permille
    FROM agg JOIN nation ON n_nationkey = c_nationkey
    ORDER BY n_name
    """,
)
def stats_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of positive account balances per nation, in exact
    integer permille: G = (2*Σ r·x − (n+1)*Σx) / (n*Σx) with r the
    ascending within-nation rank. Ties in ``cents`` are broken by custkey;
    the tie-break cannot change the result (tied values contribute the same
    Σ r·x regardless of rank order within the tie), it only makes the
    window deterministic. The rank window is partitioned by nation — never
    a global sort — and the nation dim is broadcast onto the 25-row
    aggregate."""
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet")
    nation = read_star_parquet(spark, f"{sf_dir}/nation.parquet")
    cents = customer.filter(F.col("c_acctbal") > 0).select(
        "c_nationkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
        "c_custkey",
    )
    ranked = cents.withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
        ),
    )
    agg = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("r") * F.col("cents")).alias("rank_weighted"),
    )
    return (
        agg.join(F.broadcast(nation), agg.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "n_customers",
            "total_cents",
            F.expr(
                "(1000 * (2 * rank_weighted - (n_customers + 1) * total_cents))"
                " div (n_customers * total_cents)"
            ).alias("gini_permille"),
        )
        .orderBy("n_name")
    )


@register(
    "events_simpson_diversity",
    oracle="""
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events
        GROUP BY user_id, event_type
    ), per_user AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS n_events,
               COUNT(*) AS n_types,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq
        FROM per_type
        GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           CAST((1000 * (n_events * n_events - sum_sq))
                // (n_events * n_events) AS BIGINT) AS diversity_permille
    FROM per_user
    WHERE n_events >= 20
    ORDER BY diversity_permille, user_id
    LIMIT 100
    """,
)
def events_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson diversity of each user's event-type mix, exact integer
    permille: 1 − Σ pᵢ² = (n² − Σ cᵢ²)/n². The 100 least-diverse active
    users (≥20 events) — the "monoculture" QC cut a behavior pipeline runs
    before training on engagement data. Two map-side-combinable
    aggregations, no window; top-k has a unique (diversity, user_id)
    order."""
    e = load_events(spark, sf_dir)
    per_type = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    per_user = per_type.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return (
        per_user.filter(F.col("n_events") >= 20)
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr(
                "(1000 * (n_events * n_events - sum_sq))"
                " div (n_events * n_events)"
            ).alias("diversity_permille"),
        )
        .orderBy("diversity_permille", "user_id")
        .limit(100)
    )


@register(
    "stats_lorenz_deciles",
    oracle="""
    WITH cents AS (
        SELECT c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
               c_custkey
        FROM customer WHERE c_acctbal > 0
    ), ranked AS (
        SELECT c_nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents, c_custkey) AS r,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
               SUM(cents) OVER (PARTITION BY c_nationkey
                                ORDER BY cents, c_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cents) OVER (PARTITION BY c_nationkey) AS total
        FROM cents
    )
    SELECT n_name, d.decile,
           CAST((1000 * cum) // total AS BIGINT) AS cum_share_permille
    FROM ranked
    JOIN (SELECT UNNEST(range(1, 11)) AS decile) d
      ON ranked.r = (ranked.n * d.decile) // 10
    JOIN nation ON n_nationkey = c_nationkey
    WHERE (ranked.n * d.decile) // 10 >= 1
    ORDER BY n_name, d.decile
    """,
)
def stats_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve points per nation: the cumulative balance share held by
    the bottom ⌊n·d/10⌋ customers at each decile d — the curve whose area
    gap is [[stats_gini_by_nation]]'s Gini. Windows are all partitioned by
    nation (never global); the 10-row decile frame is a broadcast literal;
    arithmetic is exact integer permille. Deciles whose boundary rank
    rounds to zero (tiny groups) are omitted identically by both engines."""
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet")
    nation = read_star_parquet(spark, f"{sf_dir}/nation.parquet")
    cents = customer.filter(F.col("c_acctbal") > 0).select(
        "c_nationkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
        "c_custkey",
    )
    pw = W.partitionBy("c_nationkey")
    ow = pw.orderBy("cents", "c_custkey")
    ranked = cents.select(
        "c_nationkey",
        F.row_number().over(ow).alias("r"),
        F.count("*").over(pw).alias("n"),
        F.sum("cents")
        .over(ow.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("cents").over(pw).alias("total"),
    )
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    return (
        ranked.join(
            F.broadcast(deciles),
            F.col("r") == F.expr("(n * decile) div 10"),
        )
        .filter(F.expr("(n * decile) div 10 >= 1"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "decile",
            F.expr("(1000 * cum) div total").alias("cum_share_permille"),
        )
        .orderBy("n_name", "decile")
    )


@register(
    "stats_weighted_median_price",
    oracle="""
    WITH w AS (
        SELECT p_brand,
               CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
               CAST(p_size AS BIGINT) AS wt,
               p_partkey
        FROM part
    ), cum AS (
        SELECT p_brand, cents, wt,
               SUM(wt) OVER (PARTITION BY p_brand
                             ORDER BY cents, p_partkey
                             ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY p_brand) AS total
        FROM w
    )
    SELECT p_brand,
           CAST(MIN(cents) AS BIGINT) AS weighted_median_cents,
           CAST(MIN(total) AS BIGINT) AS total_weight
    FROM cum
    WHERE 2 * cw >= total
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def stats_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower weighted median of part price per brand, weighted by size —
    the robust "typical price of the material we actually stock" statistic
    (plain median ignores how much of each part exists). Exact selection
    rule: the smallest price whose cumulative weight reaches half the
    total. The cumsum window is partitioned by brand over the part
    DIMENSION (never the fact table); for a fact-scale weighted median the
    two-level bucketed-cumsum decomposition applies unchanged."""
    part = read_star_parquet(spark, f"{sf_dir}/part.parquet")
    w = part.select(
        "p_brand",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
        F.col("p_size").cast("long").alias("wt"),
        "p_partkey",
    )
    pw = W.partitionBy("p_brand")
    cum = w.select(
        "p_brand",
        "cents",
        F.sum("wt")
        .over(
            pw.orderBy("cents", "p_partkey").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        )
        .alias("cw"),
        F.sum("wt").over(pw).alias("total"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("total"))
        .groupBy("p_brand")
        .agg(
            F.min("cents").alias("weighted_median_cents"),
            F.min("total").alias("total_weight"),
        )
        .orderBy("p_brand")
    )


@register(
    "events_pareto_8020",
    oracle="""
    WITH spend AS (
        SELECT user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS r,
               SUM(cents) OVER (ORDER BY cents DESC, user_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM spend
    ), tot AS (
        SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total FROM spend
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(MIN(r) AS BIGINT) AS n_top_users,
           CAST((1000 * MIN(r)) // n AS BIGINT) AS users_permille,
           CAST((1000 * MIN(cum)) // total AS BIGINT) AS spend_permille
    FROM ranked, tot
    WHERE 5 * cum >= 4 * total
    GROUP BY n, total
    """,
)
def events_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 concentration headline: how many top spenders cover 80% of
    purchase value, exactly. The oracle's global DESC cumsum window is
    replaced on the Spark side by ``with_global_rank_cumsum`` (range
    repartition + per-partition windows + broadcast prefix stats — see
    ``functions/distributed_rank.py``), so the plan has NO empty-partitionBy
    window; descending order rides a negated sort key. The crossing row is
    the minimum rank whose cumulative share reaches 4/5, found by a plain
    aggregate over the filtered frame (cum is monotone in rank because
    spends are positive)."""
    from polars_ad_etl_spark.functions.distributed_rank import (
        with_global_rank_cumsum,
    )

    e = load_events(spark, sf_dir)
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"))
        .withColumn("neg_cents", -F.col("cents"))
    )
    ranked = with_global_rank_cumsum(
        spend, ["neg_cents", "user_id"], value_col="cents"
    )
    tot = spend.agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    crossing = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(5 * F.col("cumsum") >= 4 * F.col("total"))
        # grouped (not global) aggregate, mirroring the oracle's GROUP BY:
        # with no spenders there is no crossing row, not a row of NULLs
        .groupBy(F.col("n").alias("n_users"), "total")
        .agg(
            F.min("rank").alias("n_top_users"),
            F.min("cumsum").alias("min_cum"),
        )
    )
    return crossing.select(
        "n_users",
        "n_top_users",
        F.expr("(1000 * n_top_users) div n_users").alias("users_permille"),
        # nullif: an all-zero-cents corpus has total 0 with a crossing row
        # (5*0 >= 4*0) -> NULL share, matching DuckDB // 0
        F.expr("(1000 * min_cum) div nullif(total, 0)").alias(
            "spend_permille"
        ),
    )


@register(
    "supplier_hhi_by_nation",
    oracle="""
    WITH rev AS (
        SELECT s_nationkey,
               l_suppkey,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_nationkey, l_suppkey
    ), agg AS (
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               CAST(SUM(cents) AS BIGINT) AS total,
               SUM(CAST(cents AS HUGEINT) * cents) AS sum_sq
        FROM rev GROUP BY s_nationkey
    )
    SELECT n_name, n_suppliers,
           CAST((1000000 * sum_sq) // (CAST(total AS HUGEINT) * total)
                AS BIGINT) AS hhi_ppm
    FROM agg JOIN nation ON n_nationkey = s_nationkey
    ORDER BY n_name
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue per nation in
    exact parts-per-million: HHI = Σ shareᵢ² = Σ cᵢ² / (Σ cᵢ)². Revenue
    cents squared overflow int64 at 100 TB scale, so the squared sums ride
    DECIMAL(38,0) on the Spark side and HUGEINT in the oracle — both exact
    integer arithmetic; the final ppm result casts back to BIGINT (the
    driver-visible type stays HUGEINT-free). Two stacked aggregations plus
    a broadcast nation join."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    supplier = read_star_parquet(spark, f"{sf_dir}/supplier.parquet")
    nation = read_star_parquet(spark, f"{sf_dir}/nation.parquet")
    rev = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
                    " AS BIGINT)"
                )
            ).alias("cents")
        )
    )
    agg = rev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("cents").alias("total"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("sum_sq"),
    )
    return (
        agg.join(F.broadcast(nation), agg.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "n_suppliers",
            F.expr(
                "CAST((1000000 * sum_sq)"
                " div (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)"
            ).alias("hhi_ppm"),
        )
        .orderBy("n_name")
    )


# --------------------------------------- robust statistics (pair-based)
#
# Theil-Sen and Kendall's tau are the robust complements to the exact
# integer OLS in events_daily_trend: both are functions of DAY PAIRS, so
# the O(n²) pair expansion happens on the bounded daily AGGREGATE
# (|days|² ≈ 900 pairs here; even a decade of days is ~13M pairs), never
# on base data — the same aggregate-then-expand discipline as the hazard
# and skyline queries. For planet-scale day counts the sampled-pairs
# estimator drops in without changing the shape.


@register(
    "events_theilsen_trend",
    oracle="""
    WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), slopes AS (
        SELECT CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS slope
        FROM daily a JOIN daily b ON b.t > a.t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 4) AS theilsen_slope
    FROM slopes
    """,
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the daily-volume trend: the median of all
    pairwise day-slopes — robust to outlier days that wreck the OLS fit
    ([[events_daily_trend]]). Pair slopes are exact doubles (integer
    numerator / integer denominator, identical bitwise in both engines);
    the median uses the round(4) interpolated-percentile contract. See the
    section comment for why the quadratic expansion is safe."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("t")
    ).agg(F.count("*").alias("y"))
    a = daily.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = daily.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    slopes = a.join(F.broadcast(b), F.col("tb") > F.col("ta")).select(
        (
            (F.col("yb") - F.col("ya")).cast("double")
            / (F.col("tb") - F.col("ta"))
        ).alias("slope")
    )
    return slopes.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.percentile("slope", 0.5), 4).alias("theilsen_slope"),
    )


@register(
    "stats_kendall_tau_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
                   AS views,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS purchases
        FROM events GROUP BY 1
    ), pairs AS (
        SELECT CASE WHEN (b.views - a.views) * (b.purchases - a.purchases)
                         > 0 THEN 1 ELSE 0 END AS concordant,
               CASE WHEN (b.views - a.views) * (b.purchases - a.purchases)
                         < 0 THEN 1 ELSE 0 END AS discordant
        FROM daily a JOIN daily b ON b.day > a.day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(concordant) AS BIGINT) AS n_concordant,
           CAST(SUM(discordant) AS BIGINT) AS n_discordant,
           CAST((1000 * (SUM(concordant) - SUM(discordant))) // COUNT(*)
                AS BIGINT) AS tau_permille
    FROM pairs
    """,
)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau between daily view volume and daily purchase volume —
    "do views and purchases move together day to day", as exact integer
    concordant/discordant pair counts and permille tau (tau-a; ties count
    in the denominator identically in both engines). Pair expansion on the
    |days| aggregate only."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("views"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "purchases"
        ),
    )
    a = daily.select(
        F.col("day").alias("da"),
        F.col("views").alias("va"),
        F.col("purchases").alias("pa"),
    )
    b = daily.select(
        F.col("day").alias("db"),
        F.col("views").alias("vb"),
        F.col("purchases").alias("pb"),
    )
    prod = (F.col("vb") - F.col("va")) * (F.col("pb") - F.col("pa"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        F.when(prod > 0, 1).otherwise(0).alias("concordant"),
        F.when(prod < 0, 1).otherwise(0).alias("discordant"),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum("concordant").alias("n_concordant"),
        F.sum("discordant").alias("n_discordant"),
    ).select(
        "n_pairs",
        "n_concordant",
        "n_discordant",
        F.expr(
            "(1000 * (n_concordant - n_discordant)) div n_pairs"
        ).alias("tau_permille"),
    )


@register(
    "stats_percentile_disc_prices",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
        WHERE o_totalprice IS NOT NULL
    ), ranked AS (
        SELECT o_orderpriority, cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cents, o_orderkey) AS r,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM cents
    ), pk AS (
        SELECT o_orderpriority, cents, r, n,
               UNNEST([500, 900, 990]) AS p
        FROM ranked
    )
    SELECT o_orderpriority,
           CAST(MAX(CASE WHEN p = 500 THEN cents END) AS BIGINT) AS p50_cents,
           CAST(MAX(CASE WHEN p = 900 THEN cents END) AS BIGINT) AS p90_cents,
           CAST(MAX(CASE WHEN p = 990 THEN cents END) AS BIGINT) AS p99_cents
    FROM pk
    WHERE r = (p * n + 999) // 1000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def stats_percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (p50/p90/p99 of order price cents per
    priority): the value at rank ⌈p·n⌉ — an actual observed price, never
    an interpolated midpoint, and therefore pure int64 with no float
    contract at all (the complement to the round(4) continuous-percentile
    family). Rank windows partitioned by priority; the three target ranks
    come from exploding a 3-element literal; one pass, conditional-max
    pivot."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    # rank statistics exclude NULL measures (standard percentile semantics)
    cents = orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    pw = W.partitionBy("o_orderpriority")
    ranked = cents.select(
        "o_orderpriority",
        "cents",
        F.row_number()
        .over(pw.orderBy("cents", "o_orderkey"))
        .alias("r"),
        F.count("*").over(pw).alias("n"),
    )
    pk = ranked.withColumn(
        "p", F.explode(F.array(F.lit(500), F.lit(900), F.lit(990)))
    )
    return (
        pk.filter(F.expr("r = (p * n + 999) div 1000"))
        .groupBy("o_orderpriority")
        .agg(
            F.max(F.when(F.col("p") == 500, F.col("cents"))).alias(
                "p50_cents"
            ),
            F.max(F.when(F.col("p") == 900, F.col("cents"))).alias(
                "p90_cents"
            ),
            F.max(F.when(F.col("p") == 990, F.col("cents"))).alias(
                "p99_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "part_xyz_classes",
    oracle="""
    WITH monthly AS (
        SELECT l_partkey,
               date_trunc('month', l_shipdate) AS m,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS s,
               CAST(SUM(q * q) AS BIGINT) AS ss
        FROM monthly GROUP BY 1
    ), classed AS (
        SELECT p.p_brand,
               CASE WHEN 4 * (n * ss - s * s) < s * s THEN 'X'
                    WHEN n * ss - s * s < s * s THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM per_part JOIN part p ON p.p_partkey = l_partkey
    )
    SELECT p_brand,
           CAST(COUNT(*) FILTER (WHERE xyz = 'X') AS BIGINT) AS n_x,
           CAST(COUNT(*) FILTER (WHERE xyz = 'Y') AS BIGINT) AS n_y,
           CAST(COUNT(*) FILTER (WHERE xyz = 'Z') AS BIGINT) AS n_z
    FROM classed GROUP BY p_brand ORDER BY p_brand
    """,
)
def part_xyz_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification (the inventory-planning
    companion to [[supplier_pareto_class]]'s ABC): per part, the squared
    coefficient of variation of monthly shipped quantity, classed X
    (CV² < ¼, steady), Y (< 1), Z (erratic) — entirely via integer
    cross-multiplication (4(n·SS − S²) < S² etc.), no division or floats.
    Two stacked aggregates on the fact, then a part-dimension join and the
    per-brand class census."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    part = read_star_parquet(spark, f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    monthly = lineitem.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q")
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("ss"),
    )
    classed = per_part.join(
        F.broadcast(part), per_part.l_partkey == part.p_partkey
    ).select(
        "p_brand",
        F.when(
            F.expr("4 * (n * ss - s * s) < s * s"), "X"
        )
        .when(F.expr("n * ss - s * s < s * s"), "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("p_brand")
        .agg(
            F.sum((F.col("xyz") == "X").cast("long")).alias("n_x"),
            F.sum((F.col("xyz") == "Y").cast("long")).alias("n_y"),
            F.sum((F.col("xyz") == "Z").cast("long")).alias("n_z"),
        )
        .orderBy("p_brand")
    )


@register(
    "stats_chi2_priority_status",
    oracle="""
    WITH obs AS (
        SELECT o_orderpriority AS r, o_orderstatus AS c,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ), rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rsum FROM obs GROUP BY r),
    ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS csum FROM obs GROUP BY c),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
        SELECT obs.r, obs.c, obs.o, rt.rsum, ct.csum, n.n,
               (obs.o * n.n - rt.rsum * ct.csum)
                   * (obs.o * n.n - rt.rsum * ct.csum)
                   // (rt.rsum * ct.csum) AS cell_num
        FROM obs JOIN rt USING (r) JOIN ct USING (c), n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MIN(n) AS BIGINT) AS n_rows,
           CAST(SUM(cell_num) // MIN(n) AS BIGINT) AS chi2_scaled
    FROM cells
    """,
)
def stats_chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the priority × status
    contingency table, in deterministic integer arithmetic: per cell
    (O·N − R·C)²/(R·C), summed and divided by N — algebraically N·χ²
    rounded cell-wise the same way in both engines (truncating integer
    division; all terms positive). Large ⇒ priority and status are not
    independent. One contingency aggregation + broadcast margins."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("r"),
        F.col("o_orderstatus").alias("c"),
    ).agg(F.count("*").alias("o"))
    rt = obs.groupBy("r").agg(F.sum("o").alias("rsum"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("csum"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(
                "(o * n - rsum * csum) * (o * n - rsum * csum)"
                " div (rsum * csum)"
            ).alias("cell_num"),
            "n",
        )
    )
    return cells.agg(
        F.count("*").alias("n_cells"),
        F.min("n").alias("n_rows"),
        F.expr("sum(cell_num) div min(n)").alias("chi2_scaled"),
    )
