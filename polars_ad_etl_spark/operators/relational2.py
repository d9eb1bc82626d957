"""Advanced relational coverage: more TPC-H query shapes (selective scan-agg,
EXISTS, conditional two-way aggregation, promo-ratio, HAVING-via-subquery,
disjunctive join predicates), pivot, grouping sets, and exact percentiles.

Same determinism discipline as relational.py: decimal-exact float sums,
unique total orders under every LIMIT, shared aliases with the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.exact import dsum, dsum_sql
from polars_ad_etl_spark.sources.star import read_star_parquet
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.operators.relational import _revenue, _t, REVENUE_SQL


# ---------------------------------------------------------------- q6 shape
@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global aggregate —
    the query where predicate pushdown and codegen matter most; no shuffle
    at all beyond the final single-row combine."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------- q4 shape
@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 48)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then a
    low-cardinality count."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------- q12 shape
@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + two-way conditional count aggregation."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------- q14 shape
@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT 100.0 * {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0.0 END")}
               / {dsum_sql(REVENUE_SQL)} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: part join (stats-based build side; part scales
    with SF) + ratio of two exact sums (the division of two bit-identical
    doubles is itself bit-identical)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(_revenue())).alias("promo_revenue_pct"))
    )


# --------------------------------------------------------------- q18 shape
@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING {dsum_sql('l_quantity')} > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-filter (HAVING) + top-k on the aggregate.

    Aggregate-before-join: lineitem reduces to (orderkey, sum_qty) with
    map-side partial sums and the HAVING filter runs *before* any join —
    only qualifying orders (a tiny fraction) ever touch the join, which AQE
    then turns into a broadcast. The naive join-then-group shape would
    shuffle the full customer x orders x lineitem join at 100 TB.
    Legal here because the group key contains o_orderkey, the join key is
    o_orderkey, and orders/customer are unique per key — the per-order sum
    is the same before and after those joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "q18_large_volume_customers_prepart",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING {dsum_sql('l_quantity')} > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers_prepart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Combine-decay twin of ``q18_large_volume_customers`` (SCALING.md
    "partial-aggregation combine decay"): same answer, pre-partitioned
    ``l_orderkey`` profile.

    The original's ``groupBy(l_orderkey)`` groups on a key with ~4 rows
    per group scattered across mappers — rows-per-group-per-mapper ≈ 1, so
    map-side partial aggregation reduces nothing and emits ~one record per
    (mapper, order): shuffle records grow like mappers x orders (the
    measured 21x-records-on-10x-data sweep entry). This twin declares the
    100-TB shape: project to (l_orderkey, l_quantity), ``repartition`` by
    the group key — ONE exchange carrying exactly the input rows, linear
    by construction — then aggregate with no second exchange (Catalyst
    sees the distribution satisfied; pinned by
    tests/test_plan_quality.py::test_prepart_twins_single_wide_exchange).
    The HAVING filter still runs before any join, so only qualifying
    orders (a tiny fraction) reach the orders/customer joins, which AQE
    broadcasts — identical to the original from there on."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.select("l_orderkey", "l_quantity")
        .repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "q18_large_volume_customers_bucketed",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING {dsum_sql('l_quantity')} > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zero-shuffle layout twin of ``q18_large_volume_customers``: the
    per-order quantity profile aggregates over the l_orderkey-bucketed
    (l_orderkey, l_quantity) store (sources/star.py::
    load_lineitem_qty_bucketed), so the wide shuffle the ``_prepart`` twin
    pays per run — and the decaying partial pass the original pays — is
    paid ONCE at layout-write time and never again (pinned: no
    hashpartitioning exchange anywhere in the plan,
    tests/test_plan_quality.py::test_q18_bucketed_zero_wide_exchange).
    The production day-to-day shape when the order profile is a recurring
    workload; same reuse/staleness contract as every bucketed store.

    The enrichment joins broadcast EXPLICITLY: ``big`` is selective by
    construction (the HAVING > 250 keeps a sliver of orders — TPC-H Q18's
    defining property), so hinting it keeps orders/customer on their scan
    side at ANY scale. Without the hint the r12 sf-sweep measured the
    static planner flipping big-join-orders to a sort-merge at sf1.0 —
    1.5M orders rows re-shuffled per run, silently voiding the zero-
    wide-exchange contract the layout exists for (AQE re-broadcasts from
    runtime stats, but only after the map-side shuffle write is paid).
    Static hints are size-independent, so the sf0.01 plan pin
    (test_q18_bucketed_zero_wide_exchange) now proves the shape at every
    SF."""
    from polars_ad_etl_spark.sources.star import load_lineitem_qty_bucketed

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = load_lineitem_qty_bucketed(spark, sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    bigo = F.broadcast(big).join(o, big.l_orderkey == o.o_orderkey)
    return (
        F.broadcast(bigo)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


# --------------------------------------------------------------- q19 shape
@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_sql(REVENUE_SQL)} AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_type = 'PROMO' AND l_quantity >= 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive branches over a join —
    the optimizer extracts the common join key so it's still one equi-join,
    not a cartesian."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(_revenue()).alias("revenue"), F.count("*").alias("n_rows"))
    )


# -------------------------------------------------------------------- pivot
@register(
    "pivot_quantity_by_status",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_quantity_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (never let pivot scan for distinct
    values at scale — that's an extra job over the fact table)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )


# ----------------------------------------------------------- grouping sets
@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql(REVENUE_SQL)} AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets (beyond rollup/cube) via the SQL surface —
    Catalyst expands to a single Expand + hash aggregate, one scan."""
    from polars_ad_etl_spark.functions.grouping import with_empty_grand_total

    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    gs = spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql(REVENUE_SQL)} AS revenue
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    # the sets include (), so the standard empty-input output is its row
    return with_empty_grand_total(gs, li)


# ------------------------------------------------------------- percentiles
@register(
    "stats_percentiles_orders",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def stats_percentiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (matches DuckDB's
    quantile_cont; rounded to absorb interpolation-arithmetic ulps).
    The approximate sibling for 100 TB is approx_percentiles_orders."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", 0.50), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.90), 4).alias("p90"),
    )


# ------------------------------------------------- approximate aggregations
def approx_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family for 100 TB interactive work: HLL distinct counts and
    quantile sketches — single pass, mergeable, bounded memory. This is the
    raw library surface: it emits the sketch VALUES, which are
    engine-specific (HLL register layout / KLL compaction differ per engine
    by design) and therefore can never hash-match a cross-engine oracle.
    The registry entry ``approx_stats_orders`` is the tolerance-gated form
    of this query; ``tests/test_oracle_diff.py::
    test_approx_sketches_within_error_bounds`` additionally asserts the
    relative errors of these raw values numerically."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
    )


@register(
    "approx_stats_orders",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
           TRUE AS parts_rsd5_within_10pct,
           TRUE AS parts_rsd1_within_3pct,
           TRUE AS suppliers_rsd5_within_10pct,
           TRUE AS p50_within_5pct,
           TRUE AS p90_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-gated registry form of the sketch family (raw values:
    :func:`approx_sketch_stats`). Sketch internals are engine-specific, so
    the cross-engine gate is the published ERROR BOUND, not the estimate:
    each sketch and its exact anchor are computed in ONE aggregation pass,
    and the emitted booleans assert the estimate landed inside its bound —
    HLL at default rsd (5%, gated at 2σ = 10%) and at high precision
    (rsd 1%, gated at 3σ = 3%), and the KLL-style quantile sketch at p50
    and p90 (gated at 5% relative). The DuckDB oracle recomputes the exact
    anchors and asserts every boolean is TRUE, so the driver's hash compare
    fails if any sketch drifts out of bound on any group — a real
    differential gate without hashing sketch internals."""
    l = _t(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey").alias("_p5"),
        F.approx_count_distinct("l_partkey", 0.01).alias("_p1"),
        F.approx_count_distinct("l_suppkey").alias("_s5"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_a50"),
        F.percentile_approx("l_extendedprice", 0.9).alias("_a90"),
        F.percentile("l_extendedprice", 0.5).alias("_e50"),
        F.percentile("l_extendedprice", 0.9).alias("_e90"),
    )
    within = lambda approx, exact, tol: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= tol * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        within("_p5", "exact_parts", 0.10).alias("parts_rsd5_within_10pct"),
        within("_p1", "exact_parts", 0.03).alias("parts_rsd1_within_3pct"),
        within("_s5", "exact_suppliers", 0.10).alias("suppliers_rsd5_within_10pct"),
        within("_a50", "_e50", 0.05).alias("p50_within_5pct"),
        within("_a90", "_e90", 0.05).alias("p90_within_5pct"),
    )


@register(
    "approx_stats_error_bounds",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
           TRUE AS parts_within_10pct,
           TRUE AS suppliers_within_10pct,
           TRUE AS median_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_stats_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable companion to ``approx_stats_orders``: compute each
    sketch AND its exact answer in one pass, and emit the exact values plus
    within-bound booleans. The oracle recomputes the exact side and asserts
    the booleans are all TRUE — so the hash comparison fails if any HLL
    estimate drifts past 10% (default rsd is 5%) or the quantile sketch's
    median leaves a 5% relative band. This is how the engine-specific sketch
    family gets a real cross-engine gate without hashing sketch internals."""
    l = _t(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.approx_count_distinct("l_suppkey").alias("_as"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_amed"),
        F.percentile("l_extendedprice", 0.5).alias("_emed"),
    )
    within = lambda approx, exact, tol: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= tol * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        within("_ap", "exact_parts", 0.10).alias("parts_within_10pct"),
        within("_as", "exact_suppliers", 0.10).alias("suppliers_within_10pct"),
        within("_amed", "_emed", 0.05).alias("median_within_5pct"),
    )


# ------------------------------------------- deterministic sampled quantiles
# The reproducible middle ground between exact percentiles (full sort
# pressure) and percentile_approx sketches (engine-specific internals, no
# oracle possible): exact percentiles over a SALTED-HASH 10% sample. The
# sample is a pure function of the key — same rows at any partitioning, on
# any engine — so this "approximate" query is bit-comparable to DuckDB,
# unlike the sketch family. Error bounds follow sampling theory instead of
# sketch theory; at 100 TB the sample keeps the per-group sort at 10% of
# the data, and the filter pushes into the scan.

_SAMPLE_PERMILLE = 100  # keep ~10%


def _sample_pred_sql() -> str:
    from polars_ad_etl_spark.functions.hashing import portable_hash32_sql

    h = portable_hash32_sql("'q' || CAST(o_orderkey AS VARCHAR)")
    return f"{h} % 1000 < {_SAMPLE_PERMILLE}"


@register(
    "approx_sampled_percentiles",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders
    WHERE {_sample_pred_sql()}
    GROUP BY o_orderpriority
    """,
)
def approx_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles over a deterministic 10% hash sample;
    see the section comment for why this is the oracle-checkable
    approximate-quantile path."""
    from polars_ad_etl_spark.functions.hashing import portable_hash32

    o = _t(spark, sf_dir, "orders")
    keep = (
        portable_hash32(
            F.concat(F.lit("q"), F.col("o_orderkey").cast("string"))
        )
        % 1000
        < _SAMPLE_PERMILLE
    )
    return o.filter(keep).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_sampled"),
        F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", 0.50), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.90), 4).alias("p90"),
    )


# ------------------------------------------------------------- histogram
# Fixed-bin histogram — the OLAP profiling primitive. Bucket arithmetic is
# exact: prices quantize to integer cents first (ROUND(x*100) is stable:
# generated prices are 2-decimal, so x*100 sits within an ulp of an
# integer, never near a .5 boundary), then the bin is integer division.
# One map-side-combinable aggregate; bins are the shuffle key.

_HIST_BIN_CENTS = 5_000_000  # $50,000 bins


@register(
    "agg_price_histogram",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                // {_HIST_BIN_CENTS} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price histogram in $50k bins per priority; see the section
    comment for the exact-cents bucket arithmetic."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_orderpriority",
            F.expr(f"bigint(round(o_totalprice * 100)) div {_HIST_BIN_CENTS}")
            .alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


# -------------------------------------------------------- Benford profile
# First-significant-digit distribution of order prices — the classic
# fabricated-data forensic (organic monetary amounts follow Benford's law;
# uniform synthetic ones do not, and THAT deviation is itself the signal a
# profiler reports). Digit extraction goes through integer cents and
# string truncation, so it is engine-exact with no log10 anywhere.
@register(
    "quality_benford_first_digit",
    oracle="""
    SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY 1
    """,
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit counts of order prices (Benford forensic profile); see
    the section comment."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    return o.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))


# -------------------------------------------------------- keyset pagination
# Page N of a sorted listing WITHOUT OFFSET: the cursor predicate
# (price, key) strictly-after-the-last-seen-row pushes into the scan and
# the engine does top-k, while OFFSET must materialize and discard every
# earlier row — the difference between O(page) and O(page * N) on a big
# table. The cursor below is the literal last row of page 1 (fixed so the
# query is deterministic); real callers thread the previous page's last
# (price, key) through.

_PAGE_SIZE = 15


def _page1_cursor_sql() -> str:
    return f"""
    SELECT o_totalprice AS cp, o_orderkey AS ck FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 1 OFFSET {_PAGE_SIZE - 1}
    """


@register(
    "topk_keyset_page2",
    oracle=f"""
    WITH cur AS ({_page1_cursor_sql()})
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o CROSS JOIN cur
    WHERE (o.o_totalprice < cur.cp)
       OR (o.o_totalprice = cur.cp AND o.o_orderkey > cur.ck)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT {_PAGE_SIZE}
    """,
)
def topk_keyset_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 of the price-ranked order listing via a keyset cursor; see
    the section comment."""
    o = _t(spark, sf_dir, "orders")
    cur = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            F.col("o_totalprice").alias("cp"), F.col("o_orderkey").alias("ck")
        )
        .offset(_PAGE_SIZE - 1)
        .limit(1)
    )
    after_cursor = (F.col("o_totalprice") < F.col("cp")) | (
        (F.col("o_totalprice") == F.col("cp"))
        & (F.col("o_orderkey") > F.col("ck"))
    )
    return (
        o.crossJoin(F.broadcast(cur))
        .filter(after_cursor)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(_PAGE_SIZE)
    )


# ---------------------------------------------------------- trimmed mean
# Robust aggregation: drop the lowest and highest 5% of prices per group
# (by exact integer-cents rank, ties broken on the key) and average the
# middle 90% — the outlier-resistant center a reporting layer wants when
# a few corrupt rows would drag a plain mean. All arithmetic is integer
# (cents, ranks, floor division), so the result is engine-exact with no
# percentile interpolation. The per-group rank window funnels each group
# through one task — fine for bounded group counts; at 100 TB swap the
# rank bounds for approx_percentile cutoffs joined back (same shape as
# the RFM quartile note).

_TRIM_PCT = 5


@register(
    "stats_trimmed_mean_prices",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                            o_orderkey
               ) AS rk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
        WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
    FROM ranked
    WHERE rk > n * {_TRIM_PCT} // 100
      AND rk <= n - n * {_TRIM_PCT} // 100
    GROUP BY o_orderpriority
    """,
)
def stats_trimmed_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of order prices per priority in exact integer cents;
    see the section comment."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    # rank statistics exclude NULL measures (standard percentile-family
    # semantics; an unspelled NULL rank position diverges across engines)
    o = o.where(F.col("o_totalprice").isNotNull())
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = W.partitionBy("o_orderpriority").orderBy(cents, "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    lo = F.expr(f"n * {_TRIM_PCT} div 100")
    return (
        ranked.filter((F.col("rk") > lo) & (F.col("rk") <= F.col("n") - lo))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_kept"),
            F.expr("sum(cents) div count(*)").alias("trimmed_mean_cents"),
        )
    )


# ------------------------------------------------- period-over-period
@register(
    "orders_yoy_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               {dsum_sql('o_totalprice')} AS revenue
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    )
    SELECT month_start, revenue,
           LAG(revenue, 12) OVER (ORDER BY month_start) AS revenue_prior_year,
           round(revenue / LAG(revenue, 12) OVER (ORDER BY month_start) - 1.0,
                 6) AS yoy_growth
    FROM monthly
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: a lag-12 window over the
    month-grain aggregate. The global window is scale-safe by construction —
    its input is the |months| aggregate (bounded by the calendar, ~84 rows
    for TPC-H's seven years), which is why it joins the plan lint's bounded
    allowlist. Revenue is decimal-exact so the ratio rounds identically on
    both engines."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    # a calendar lag is undefined for unknown dates: the NULL-date month
    # would shift the lag-12 alignment (and engines order NULLs apart)
    monthly = o.where(F.col("o_orderdate").isNotNull()).groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = W.orderBy("month_start")
    prior = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month_start",
        "revenue",
        prior.alias("revenue_prior_year"),
        F.round(F.col("revenue") / prior - 1.0, 6).alias("yoy_growth"),
    )


# ---------------------------------------------- ISO week calendar parity
@register(
    "orders_iso_week_revenue",
    oracle=f"""
    SELECT CAST(extract(isoyear FROM o_orderdate) AS BIGINT) AS iso_year,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY iso_year, iso_week
    ORDER BY iso_year, iso_week
    """,
)
def orders_iso_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue on the ISO-8601 calendar — the fiscal-reporting grain
    where the year boundary is the hard part (Dec 29 can be week 1 of the
    NEXT iso-year, Jan 1 can be week 52/53 of the previous one; a plain
    year(ts) GROUP BY double-counts those boundary weeks). Spark has
    weekofyear (ISO) but no isoyear extract, so the iso-year comes from the
    ISO "Thursday rule": the year of (date + (4 - isodow)) days — pure date
    arithmetic, proven against DuckDB's native isoyear across the seven
    order-date years. Single map-side-combinable aggregation with exact
    decimal revenue."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    iso_year = F.year(
        F.date_add(d, F.lit(4) - F.expr("extract(dayofweek_iso FROM o_orderdate)").cast("int"))
    ).cast("long")
    return (
        o.groupBy(
            iso_year.alias("iso_year"),
            F.weekofyear(d).cast("long").alias("iso_week"),
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("iso_year", "iso_week")
    )


@register(
    "orders_seasonality_index",
    oracle="""
    WITH monthly AS (
        SELECT CAST(month(o_orderdate) AS BIGINT) AS month_num,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_orders) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_months
        FROM monthly
    )
    SELECT month_num,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST((1000 * n_orders * n_months) // total AS BIGINT)
               AS seasonality_index_permille
    FROM monthly, tot
    ORDER BY month_num
    """,
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each month's order volume over the
    all-month mean, in exact integer permille (1000 = average month) — the
    demand-planning normalization factor. One aggregation to 12 rows plus
    a broadcast 1-row total; index = n·|months|/total avoids any float
    mean."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").cast("long").alias("month_num")
    ).agg(F.count("*").alias("n_orders"))
    tot = monthly.agg(
        F.sum("n_orders").alias("total"), F.count("*").alias("n_months")
    )
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            "month_num",
            "n_orders",
            F.expr("(1000 * n_orders * n_months) div total").alias(
                "seasonality_index_permille"
            ),
        )
        .orderBy("month_num")
    )


@register(
    "orders_open_aging_buckets",
    oracle="""
    WITH horizon AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders
    ), aged AS (
        SELECT o_orderpriority,
               DATEDIFF('day', CAST(o_orderdate AS DATE), h) AS age,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders, horizon WHERE o_orderstatus = 'O'
    ), bucketed AS (
        SELECT o_orderpriority,
               CASE WHEN age <= 90 THEN '000-090'
                    WHEN age <= 365 THEN '091-365'
                    WHEN age <= 730 THEN '366-730'
                    ELSE '731+' END AS age_bucket,
               cents
        FROM aged
    )
    SELECT o_orderpriority, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS open_cents
    FROM bucketed
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def orders_open_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report (the receivables-aging shape): orders still
    in status 'O' bucketed by days outstanding at the data horizon, with
    exact open cents per (priority, bucket) — the working-capital view.
    The horizon is a broadcast scalar aggregate; day arithmetic is tz-free
    date math; bucket labels sort lexicographically by construction."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    horizon = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("h")
    )
    aged = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_orderpriority",
            F.datediff(F.col("h"), F.col("o_orderdate").cast("date")).alias(
                "age"
            ),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    bucket = (
        F.when(F.col("age") <= 90, "000-090")
        .when(F.col("age") <= 365, "091-365")
        .when(F.col("age") <= 730, "366-730")
        .otherwise("731+")
    )
    return (
        aged.groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("open_cents"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


@register(
    "lineitem_discount_response",
    oracle="""
    WITH banded AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
               CAST(round(l_quantity) AS BIGINT) AS qty
        FROM lineitem
    )
    SELECT discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST((1000 * SUM(qty)) // COUNT(*) AS BIGINT) AS qty_per_line_milli
    FROM banded GROUP BY discount_pct ORDER BY discount_pct
    """,
)
def lineitem_discount_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand response curve: ordered quantity per line at each discount
    percentage — the promo-effectiveness readout (a flat curve means
    discounts buy no volume). Exact integer milli-units per band; one
    map-side-combinable aggregation over the fact."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    banded = lineitem.select(
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias(
            "discount_pct"
        ),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
    )
    return (
        banded.groupBy("discount_pct")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("qty").alias("total_qty"),
        )
        .select(
            "discount_pct",
            "n_lines",
            "total_qty",
            F.expr("(1000 * total_qty) div n_lines").alias(
                "qty_per_line_milli"
            ),
        )
        .orderBy("discount_pct")
    )


@register(
    "nation_rank_stability",
    oracle="""
    WITH yearly AS (
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT n_name, yr,
               ROW_NUMBER() OVER (PARTITION BY yr
                                  ORDER BY cents DESC, n_name) AS rk
        FROM yearly
    ), joined AS (
        SELECT a.yr AS yr_from, a.n_name, a.rk AS rk_a, b.rk AS rk_b
        FROM ranked a JOIN ranked b
          ON b.n_name = a.n_name AND b.yr = a.yr + 1
    ), pairs AS (
        SELECT x.yr_from,
               CASE WHEN (x.rk_a - y.rk_a) * (x.rk_b - y.rk_b) < 0
                    THEN 1 ELSE 0 END AS discordant
        FROM joined x JOIN joined y
          ON y.yr_from = x.yr_from AND x.n_name < y.n_name
    )
    SELECT yr_from, yr_from + 1 AS yr_to,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(discordant) AS BIGINT) AS n_discordant,
           CAST(1000 - (1000 * SUM(discordant)) // COUNT(*) AS BIGINT)
               AS stability_permille
    FROM pairs GROUP BY yr_from ORDER BY yr_from
    """,
)
def nation_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year stability of the nation revenue LEAGUE TABLE:
    Kendall-style discordant-pair share between consecutive years'
    rankings (1000 = identical order, 0 = fully reversed) — the metric
    that says whether market-share movements are churn or noise. Ranks are
    per-year windows over the |nations| aggregate; the pair expansion is
    |nations|² per year pair, all on aggregates."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_star_parquet(spark, f"{sf_dir}/nation.parquet")
    yearly = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    from pyspark.sql import Window as W

    ranked = yearly.select(
        "n_name",
        "yr",
        F.row_number()
        .over(W.partitionBy("yr").orderBy(F.desc("cents"), "n_name"))
        .alias("rk"),
    )
    nxt = ranked.select(
        F.col("n_name").alias("nm2"),
        F.col("yr").alias("yr2"),
        F.col("rk").alias("rk_b"),
    )
    joined = ranked.join(
        nxt,
        (F.col("nm2") == F.col("n_name")) & (F.col("yr2") == F.col("yr") + 1),
    ).select(
        F.col("yr").alias("yr_from"), "n_name",
        F.col("rk").alias("rk_a"), "rk_b",
    )
    y = joined.select(
        F.col("yr_from").alias("yf2"),
        F.col("n_name").alias("nm_y"),
        F.col("rk_a").alias("ya"),
        F.col("rk_b").alias("yb"),
    )
    pairs = joined.join(
        F.broadcast(y),
        (F.col("yf2") == F.col("yr_from"))
        & (F.col("n_name") < F.col("nm_y")),
    ).select(
        "yr_from",
        F.when(
            (F.col("rk_a") - F.col("ya")) * (F.col("rk_b") - F.col("yb"))
            < 0,
            1,
        )
        .otherwise(0)
        .alias("discordant"),
    )
    return (
        pairs.groupBy("yr_from")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("discordant").alias("n_discordant"),
        )
        .select(
            "yr_from",
            (F.col("yr_from") + 1).alias("yr_to"),
            "n_pairs",
            "n_discordant",
            F.expr(
                "1000 - (1000 * n_discordant) div n_pairs"
            ).alias("stability_permille"),
        )
        .orderBy("yr_from")
    )


@register(
    "part_supplier_redundancy",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM ps GROUP BY n_suppliers ORDER BY n_suppliers
    """,
)
def part_supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain redundancy histogram: how many parts have 1, 2, 3…
    distinct observed suppliers — single-sourced parts (bucket 1) are the
    procurement risk register. Distinct-count per part then a tiny
    histogram aggregate; both shuffles on high-cardinality keys."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    ps = lineitem.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers")
    )
    return (
        ps.groupBy("n_suppliers")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("n_suppliers")
    )


@register(
    "lineitem_return_rate_by_brand",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
               AS n_returned,
           CAST((1000 * COUNT(*) FILTER (WHERE l_returnflag = 'R'))
                // COUNT(*) AS BIGINT) AS return_permille
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def lineitem_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quality angle on returns: exact permille return rate per
    brand (the customer-grain view is q10) — the table a merchandising
    review sorts by. Part dimension broadcasts; one fact aggregation."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    part = read_star_parquet(spark, f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias(
                "n_returned"
            ),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returned",
            F.expr("(1000 * n_returned) div n_lines").alias(
                "return_permille"
            ),
        )
        .orderBy("p_brand")
    )


@register(
    "orders_quarter_end_loading",
    oracle="""
    WITH q AS (
        SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
               CAST(o_orderdate AS DATE) AS day,
               CAST(date_trunc('quarter', o_orderdate)
                    + INTERVAL 3 MONTH AS DATE) AS next_qtr
        FROM orders
    )
    SELECT qtr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (
               WHERE day >= next_qtr - 7) AS BIGINT) AS n_final_week,
           CAST((1000 * COUNT(*) FILTER (WHERE day >= next_qtr - 7))
                // COUNT(*) AS BIGINT) AS final_week_permille
    FROM q GROUP BY qtr ORDER BY qtr
    """,
)
def orders_quarter_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-end loading ("hockey stick") detector: the share of each
    quarter's orders landing in its final seven days — sustained values
    far above the uniform ~77‰ flag quota-driven pull-ins that distort
    demand signals. Pure tz-free date arithmetic (quarter start + 3
    months − 7 days), one aggregation, exact permille."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    q = orders.select(
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.add_months(
            F.date_trunc("quarter", "o_orderdate").cast("date"), 3
        ).alias("next_qtr"),
    )
    in_final = F.col("day") >= F.date_sub(F.col("next_qtr"), 7)
    return (
        q.groupBy("qtr")
        .agg(
            F.count("*").alias("n_orders"),
            # count_if: the NULL-date quarter group has COUNT-FILTER
            # semantics (0), not SUM-over-all-NULL (NULL)
            F.count_if(in_final).alias("n_final_week"),
        )
        .select(
            "qtr",
            "n_orders",
            "n_final_week",
            F.expr("(1000 * n_final_week) div n_orders").alias(
                "final_week_permille"
            ),
        )
        .orderBy("qtr")
    )
