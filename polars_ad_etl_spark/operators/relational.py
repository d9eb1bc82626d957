"""Generic relational operator surface (SURVEY §7.1 M4): the operator families
the reference lacks but a complete engine needs — joins (broadcast /
shuffle / semi / anti), aggregations (group-by, distinct, rollup, cube),
windows (rank, lag/lead, running frames), sort/limit/top-k, set ops, scalar
string/date/conditional expression programs.

Scale notes baked into each query:
- dimension joins (region/nation/supplier/customer-at-small-sf) are marked
  ``F.broadcast`` — at 100 TB the fact side never shuffles for those;
- fact-fact joins (orders x lineitem) stay sort-merge/shuffle-hash on the
  join key, which AQE re-plans at runtime;
- aggregations use map-side partial aggregation automatically (hash agg);
  decimal-exact sums keep results partition-order-independent, so scale-out
  changes nothing about the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_ad_etl_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet, load_events


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_star_parquet(spark, f"{sf_dir}/{name}.parquet")


def _revenue():
    # built lazily: constructing Columns requires an active SparkSession
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------------- q1
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql(REVENUE_SQL)} AS sum_disc_price,
           {dsum_sql(f'{REVENUE_SQL} * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship aggregate. One scan, hash aggregation
    with map-side combine; only l_* columns in ReadSchema."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_revenue()).alias("sum_disc_price"),
            dsum(_revenue() * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------- q3
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {dsum_sql(REVENUE_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join on the order key, top-10 (unique
    total order for determinism).

    Round 13 (guide §2.3 "aggregate before you shuffle" / §2.4): revenue
    is aggregated per l_orderkey BEFORE the fact-fact join, so the wide
    exchange carries one (orderkey, revenue) row per order instead of
    every lineitem row widened with order columns — and the aggregate's
    output partitioning feeds the join directly. o_orderkey is the orders
    PK (dq_pk_uniqueness is the declared gate), so grouping by l_orderkey
    alone is row-identical to grouping by (l_orderkey, o_orderdate,
    o_orderpriority) after the join. The customer side contributes no
    output columns — a left-semi join on the projected key list replaces
    the inner join (same keep-set on unique c_custkey; NULL keys match
    in neither). No broadcast hints: customer/orders scale with SF, so
    build sides stay Catalyst's stats-based call (auto-broadcast at small
    SF, sort-merge at 100 TB). Decimal revenue sums are exact, so the
    pre-join aggregation is bit-identical to the post-join one.

    Prepart grain (SCALING.md "partial-aggregation combine decay"):
    l_orderkey has ~2 surviving rows per order, so map-side combine emits
    nearly one record per input row THROUGH a transition zone where its
    record count grows super-linearly (measured: 5.3x/4.2x/3.4x records
    per 3x data across the sf0.1→3.0 sweep with the plain groupBy). The
    explicit project + ``repartition(l_orderkey)`` carries exactly the
    filtered input rows — linear by construction — and Catalyst plans
    partial+final agg both ABOVE the exchange, no second shuffle; the
    aggregate's output partitioning then feeds the join."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = (
        l.select("l_orderkey", _revenue().alias("rev"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(dsum("rev").alias("revenue"))
    )
    oc = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    return (
        rev.join(oc, rev.l_orderkey == oc.o_orderkey)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------- q5
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dsum_sql(REVENUE_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way join. Only the fixed-size dims
    (nation=25, region=5 rows at any SF) carry explicit broadcast hints;
    customer/supplier scale with SF and are left to stats + AQE."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


# --------------------------------------------------------------------- q10
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {dsum_sql(REVENUE_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12 (guide §2.3 "aggregate before you shuffle" / §8 "decide on
    small rows, attach payloads once"): revenue is aggregated per customer
    KEY before the customer dimension is joined — c_custkey is the primary
    key, so grouping by it alone and attaching (c_name, c_acctbal, n_name)
    afterwards is row-identical to grouping by all four (decimal sums are
    associative, so the totals are bit-exact). The aggregate's shuffle
    carries (custkey, revenue) pairs instead of lineitem rows widened by
    three dimension strings, and the explicit repartition-by-group-key
    declares the linear 100-TB grain (custkey groups outnumber
    rows-per-mapper at scale, so a partial pass would reduce nothing —
    SCALING.md "partial-aggregation combine decay")."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    lr = l.select("l_orderkey", _revenue().alias("rev"))
    per_cust = (
        lr.join(o, lr.l_orderkey == o.o_orderkey)
        .select("o_custkey", "rev")
        .repartition("o_custkey")
        .groupBy("o_custkey")
        .agg(dsum(F.col("rev")).alias("revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------------------- semi / anti
@register(
    "join_semi_big_lineitems",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def join_semi_big_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join == EXISTS; no payload columns move from the right side."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(l, o.o_orderkey == l.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ------------------------------------------------------------ distinct aggs
@register(
    "agg_distinct_suppliers",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_rollup_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql(REVENUE_SQL)} AS revenue, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_ad_etl_spark.functions.grouping import with_empty_grand_total

    l = _t(spark, sf_dir, "lineitem")
    rolled = l.rollup("l_returnflag", "l_linestatus").agg(
        dsum(_revenue()).alias("revenue"), F.count("*").alias("n_rows")
    )
    return with_empty_grand_total(rolled, l, count_cols=("n_rows",))


@register(
    "agg_cube_quantity",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_ad_etl_spark.functions.grouping import with_empty_grand_total

    l = _t(spark, sf_dir, "lineitem")
    cubed = l.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )
    return with_empty_grand_total(cubed, l, count_cols=("n_rows",))


# ---------------------------------------------------------------- windows
@register(
    "window_rank_parts_by_revenue",
    oracle=f"""
    SELECT * FROM (
        SELECT l_returnflag, l_partkey, revenue,
               RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY revenue DESC, l_partkey) AS rnk
        FROM (
            SELECT l_returnflag, l_partkey, {dsum_sql(REVENUE_SQL)} AS revenue
            FROM lineitem GROUP BY l_returnflag, l_partkey
        )
    ) WHERE rnk <= 5
    """,
)
def window_rank_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 parts per return flag, two-phase (salted) top-k.

    A single window PARTITION BY l_returnflag has only 3 partitions — at
    100 TB that is 3 tasks each ranking ~50M parts. Phase 1 ranks within
    (l_returnflag, l_partkey % 64) — 192-way parallel — and keeps each
    bucket's top-5; phase 2 ranks the <= 960 survivors globally. Exact:
    bucket competitors are a subset of global competitors, so
    bucket_rank <= global_rank, and every global top-5 row survives
    phase 1 (rank ties included).

    Round 12: the aggregation grain adopts the pre-partitioned shape the
    ``_prepart`` twin shipped in round 11 (project to the three needed
    columns, repartition BY THE GROUP KEY, aggregate with the distribution
    already satisfied). Two reasons, both measured: (a) the map-side
    partial pass was the query's combine-decay entry — with parts x flags
    groups outnumbering rows-per-mapper, it emitted ~mappers x groups
    records (62.6x on 10x data in the r10 sweep) while the explicit
    repartition moves exactly the input rows, linear by construction; and
    (b) at bench scale the partial pass ran inside the single-row-group
    scan task (one core), 1.21 s -> 0.79 s best-of-5 with the aggregate
    spread across the session's cores. The decayed shape remains measured
    in the committed r10-r12 sweep artifacts."""
    l = _t(spark, sf_dir, "lineitem")
    by_part = (
        l.select("l_returnflag", "l_partkey", _revenue().alias("rev"))
        .repartition("l_returnflag", "l_partkey")
        .groupBy("l_returnflag", "l_partkey")
        .agg(dsum(F.col("rev")).alias("revenue"))
    )
    order = (F.col("revenue").desc(), F.col("l_partkey"))
    w_local = W.partitionBy(
        "l_returnflag", (F.col("l_partkey") % 64).alias("salt")
    ).orderBy(*order)
    pruned = (
        by_part.withColumn("lrnk", F.rank().over(w_local))
        .filter(F.col("lrnk") <= 5)
        .drop("lrnk")
    )
    w = W.partitionBy("l_returnflag").orderBy(*order)
    return pruned.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 5)


@register(
    "window_rank_parts_by_revenue_prepart",
    oracle=f"""
    SELECT * FROM (
        SELECT l_returnflag, l_partkey, revenue,
               RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY revenue DESC, l_partkey) AS rnk
        FROM (
            SELECT l_returnflag, l_partkey, {dsum_sql(REVENUE_SQL)} AS revenue
            FROM lineitem GROUP BY l_returnflag, l_partkey
        )
    ) WHERE rnk <= 5
    """,
)
def window_rank_parts_by_revenue_prepart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Combine-decay twin of ``window_rank_parts_by_revenue`` (SCALING.md
    "partial-aggregation combine decay"): same answer, pre-partitioned
    aggregation grain.

    The original's ``groupBy(l_returnflag, l_partkey)`` relies on map-side
    partial aggregation, which emits ~one record per (mapper, group); when
    group count (≈ parts x 3 flags, grows with SF) outnumbers
    rows-per-mapper, the partial pass reduces nothing and shuffle records
    grow like mappers x groups — the measured 62.6x-records-on-10x-data
    entry in the sf sweep. This twin declares the 100-TB shape instead:
    project to the three needed columns, ``repartition`` BY THE GROUP KEY
    (one Exchange carrying exactly the input rows — linear by
    construction), then aggregate; Catalyst sees the aggregate's required
    distribution already satisfied and inserts no second exchange
    (pinned: tests/test_plan_quality.py::test_prepart_twins_single_wide_exchange).
    The downstream two-phase salted ranking is unchanged — its inputs are
    one row per part, the already-linear part of the plan."""
    l = _t(spark, sf_dir, "lineitem")
    by_part = (
        l.select("l_returnflag", "l_partkey", _revenue().alias("rev"))
        .repartition("l_returnflag", "l_partkey")
        .groupBy("l_returnflag", "l_partkey")
        .agg(dsum(F.col("rev")).alias("revenue"))
    )
    order = (F.col("revenue").desc(), F.col("l_partkey"))
    w_local = W.partitionBy(
        "l_returnflag", (F.col("l_partkey") % 64).alias("salt")
    ).orderBy(*order)
    pruned = (
        by_part.withColumn("lrnk", F.rank().over(w_local))
        .filter(F.col("lrnk") <= 5)
        .drop("lrnk")
    )
    w = W.partitionBy("l_returnflag").orderBy(*order)
    return pruned.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 5)


@register(
    "window_rank_parts_by_revenue_bucketed",
    oracle=f"""
    SELECT * FROM (
        SELECT l_returnflag, l_partkey, revenue,
               RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY revenue DESC, l_partkey) AS rnk
        FROM (
            SELECT l_returnflag, l_partkey, {dsum_sql(REVENUE_SQL)} AS revenue
            FROM lineitem GROUP BY l_returnflag, l_partkey
        )
    ) WHERE rnk <= 5
    """,
)
def window_rank_parts_by_revenue_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zero-shuffle layout twin of ``window_rank_parts_by_revenue`` — the
    last point on its combine-decay mitigation spectrum (round-11 verdict
    task 1, mirroring q18's: original -> ``_prepart`` -> bucketed store).

    The per-part revenue aggregate runs over the l_partkey-bucketed
    (l_returnflag, l_partkey, rev) store (sources/star.py::
    load_lineitem_rev_bucketed): hashpartitioning(l_partkey) satisfies the
    aggregate's clustered distribution on (l_returnflag, l_partkey), so
    the decaying mappers x groups shuffle the original pays — the ONE
    remaining superlinear sweep entry, 28.9x records on 10x data
    (BENCH_r11_sf3.json) — is paid once at layout-write time and NEVER per
    run (pinned: no exchange below the aggregate,
    tests/test_plan_quality.py::test_window_rank_bucketed_zero_wide_exchange).
    The two-phase salted ranking above it is unchanged; its exchanges
    carry one row per part — the already-linear portion of the plan."""
    from polars_ad_etl_spark.sources.star import load_lineitem_rev_bucketed

    l = load_lineitem_rev_bucketed(spark, sf_dir)
    by_part = l.groupBy("l_returnflag", "l_partkey").agg(
        dsum(F.col("rev")).alias("revenue")
    )
    order = (F.col("revenue").desc(), F.col("l_partkey"))
    w_local = W.partitionBy(
        "l_returnflag", (F.col("l_partkey") % 64).alias("salt")
    ).orderBy(*order)
    pruned = (
        by_part.withColumn("lrnk", F.rank().over(w_local))
        .filter(F.col("lrnk") <= 5)
        .drop("lrnk")
    )
    w = W.partitionBy("l_returnflag").orderBy(*order)
    return pruned.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 5)


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate NULLS FIRST, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total frame; decimal accumulation makes the prefix sums exact,
    so the result is identical under any partitioning. NULL order dates
    sort FIRST — spelled on both engines (Spark's ASC default is
    nulls-first, DuckDB's is nulls-last; an unspelled order diverges the
    prefix sums on NULL-carrying input)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id, user_id,
           LAG(value)       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ------------------------------------------------------------ sort / top-k
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    top-k + merge on the driver, never a full sort at scale."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    ).limit(15)


# ---------------------------------------------------------------- set ops
@register(
    "setop_nations_with_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_customer_only_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, like SQL EXCEPT


@register(
    "setop_union_all_keys",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def setop_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count("*").alias("n"))


# ----------------------------------------------------- scalar expr programs
@register(
    "string_functions_part",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           p_brand || '|' || p_type AS brand_type,
           SUBSTRING(p_type, 1, 4) AS type_prefix,
           REPLACE(p_name, ' ', '_') AS name_snake,
           TRIM(LOWER(p_name)) AS name_lower
    FROM part
    """,
)
def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.5 string-function family (trim/replace/extract/concat/substr)
    as one whole-stage-codegen'd projection."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.lower("p_name")).alias("name_lower"),
    )


@register(
    "date_functions_orders",
    oracle=f"""
    SELECT YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))


@register(
    "case_when_event_buckets",
    oracle=f"""
    SELECT event_type,
           CASE WHEN value IS NULL THEN 'none'
                WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def case_when_event_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.4 when-chain family over the events table."""
    e = load_events(spark, sf_dir)
    bucket = (
        F.when(F.col("value").isNull(), F.lit("none"))
        .when(F.col("value") < 50, F.lit("low"))
        .when(F.col("value") < 150, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n"), dsum("value").alias("total_value")
    )


@register(
    "events_hourly_rollup",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window rollup via F.window — same shape the streaming
    slice runs incrementally (streaming/events.py)."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_sliding_windows",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                          - k * 900000000) AS window_start,
           event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events, generate_series(0, 3) AS t(k)
    GROUP BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in exactly
    4 overlapping windows) — the batch twin of streaming/events.py::
    sliding_rollup_stream. The oracle derives the same 4 slide-aligned
    window starts per event arithmetically on epoch-micros, proving
    F.window's slide/alignment semantics."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# Date-bounded twins of the rollup queries — the shape a day/week-scoped
# production job actually runs over a date-partitioned events layout. The
# bounds route through load_events(since=, until=), which applies them to
# BOTH ts and (when present) the event_date partition column, so on the
# partitioned layout the scan prunes at the catalog (plan-pinned in
# tests/test_scale_layout.py) while on the driver's flat layout the same
# query is a plain pushed-down ts range — which is exactly what these
# oracles differential-check.
EVENTS_WINDOW_SINCE = "2024-01-08"
EVENTS_WINDOW_UNTIL = "2024-01-15"
_EVENTS_BOUND_SQL = (
    f"ts >= TIMESTAMP '{EVENTS_WINDOW_SINCE} 00:00:00' AND "
    f"ts < TIMESTAMP '{EVENTS_WINDOW_UNTIL} 00:00:00'"
)


@register(
    "events_hourly_rollup_bounded",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    WHERE {_EVENTS_BOUND_SQL}
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`events_hourly_rollup` scoped to one week of event time via
    the loader's date bounds — flat layouts push the range to the parquet
    scan; date-partitioned layouts additionally prune whole daily
    directories."""
    e = load_events(
        spark, sf_dir, since=EVENTS_WINDOW_SINCE, until=EVENTS_WINDOW_UNTIL
    )
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_sliding_windows_bounded",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                          - k * 900000000) AS window_start,
           event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events, generate_series(0, 3) AS t(k)
    WHERE {_EVENTS_BOUND_SQL}
    GROUP BY 1, 2
    """,
)
def events_sliding_windows_bounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """:func:`events_sliding_windows` under the same one-week loader
    bounds as the hourly twin."""
    e = load_events(
        spark, sf_dir, since=EVENTS_WINDOW_SINCE, until=EVENTS_WINDOW_UNTIL
    )
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_enriched_purchases",
    oracle="""
    SELECT event_id, user_id, c_mktsegment, value
    FROM events
    JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    """,
)
def events_enriched_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase events enriched with a customer dimension — the batch twin of
    streaming/events.py::enrich_purchases_stream (stream-static broadcast
    join; in streaming the static side is re-resolved per micro-batch)."""
    e = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return e.join(F.broadcast(c), e.user_id == c.c_custkey).select(
        "event_id", "user_id", "c_mktsegment", "value"
    )


@register(
    "events_purchase_click_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def events_purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) self-join: every click by the same user in the hour
    before a purchase — last-touch-window attribution. The equi-key
    (user_id) drives the shuffle; the time range is a post-join filter on
    the sorted streams, so this scales like any key join, not like a cross
    join. The lag is computed in exact microseconds (timestampdiff), which
    both engines agree on bit-for-bit — second-granularity date_diff
    semantics differ (boundary-crossing vs elapsed). Streaming twin:
    streaming/events.py::attribute_purchases_stream (stream-stream join)."""
    e = load_events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("p_ts - INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.expr("timestampdiff(MICROSECOND, c_ts, p_ts)").alias("lag_us"),
    )


@register(
    "events_session_windows",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS session_value
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the native session_window operator (30-minute
    inactivity gap) — the batch twin of streaming/events.py::sessionize_stream.
    The oracle re-derives identical sessions with the classic lag-gap-cumsum
    program, proving the operator's merge semantics."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
