"""Config-driven data-quality rule engine.

Rules are DATA (name → boolean Column), not code: a pipeline declares its
expectations once and gets back a per-rule violation report. The engine
compiles ALL rules into a single aggregation pass —
``sum(CASE WHEN NOT rule THEN 1 END)`` per rule plus one ``count(*)`` —
so N rules cost one table scan and one map-side-combinable aggregate,
never N scans. The wide 1-row aggregate is then unpivoted (``stack``) into
the tidy (rule_id, n_checked, n_violations, violation_permille) report.

This is the same architecture as ``df.observe`` (used for streaming-side
metrics in tests) but produces a first-class DataFrame a pipeline can
join, alert on, or sink — and the DuckDB oracle proves each rule's count
by replaying it as a plain filter aggregate.

At 100 TB: one scan, partial aggregation per partition, a 1-row shuffle.
Adding a rule is free (another column in the same Aggregate node).

Reference parity note: the reference repo validates schemas via its config
layer (SURVEY §2.11 V4); this generalizes that idea to row-level
expectations, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet


def evaluate_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass over ``df``.

    A row *violates* a rule when the rule's boolean is false OR null (null
    means "could not be confirmed", which a DQ gate must count as a
    failure, not silently pass). Returns one row per rule:
    (rule_id, n_checked, n_violations, violation_permille), ordered by
    rule_id."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        # coalesce: a 0-row table has 0 violations (COUNT semantics),
        # not NULL (SUM-over-empty semantics)
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))),
                F.lit(0).cast("long"),
            ).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', _v_{name}" for name in rules
    )
    return (
        wide.selectExpr(
            "_n",
            f"stack({len(rules)}, {pairs}) AS (rule_id, n_violations)",
        )
        .select(
            "rule_id",
            F.col("_n").alias("n_checked"),
            "n_violations",
            F.expr("(1000 * n_violations) div nullif(_n, 0)").alias(
                "violation_permille"
            ),
        )
        .orderBy("rule_id")
    )


def _rule_oracle(table: str, rules: dict[str, str]) -> str:
    """UNION ALL of one filter-aggregate per rule — the naive N-scan
    formulation the single-pass engine is proven against."""
    selects = [
        f"""
        SELECT '{name}' AS rule_id,
               CAST(COUNT(*) AS BIGINT) AS n_checked,
               CAST(COUNT(*) FILTER (WHERE NOT COALESCE(({cond}), FALSE))
                    AS BIGINT) AS n_violations,
               CAST((1000 * COUNT(*) FILTER (
                        WHERE NOT COALESCE(({cond}), FALSE)))
                    // COUNT(*) AS BIGINT) AS violation_permille
        FROM {table}
        """
        for name, cond in rules.items()
    ]
    return " UNION ALL ".join(selects) + " ORDER BY rule_id"


# SQL-string twins of the Column rules, kept adjacent so the pair is
# reviewed as one unit.
_ORDERS_RULES_SQL = {
    "orderdate_in_range": "o_orderdate >= TIMESTAMP '1992-01-01'"
    " AND o_orderdate < TIMESTAMP '2000-01-01'",
    "positive_price": "o_totalprice > 0",
    "price_under_500k": "o_totalprice < 500000",
    "priority_known": "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
    "'4-NOT SPECIFIED','5-LOW')",
    "status_known": "o_orderstatus IN ('O','F','P')",
    "custkey_present": "o_custkey IS NOT NULL",
}


@register(
    "dq_orders_rules",
    oracle=_rule_oracle("orders", _ORDERS_RULES_SQL),
)
def dq_orders_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ gate over orders: six expectations evaluated in one
    scan (see module docstring). The oracle replays each rule as an
    independent filter aggregate, so the single-pass fusion is proven rule
    by rule."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    rules = {name: F.expr(sql) for name, sql in _ORDERS_RULES_SQL.items()}
    return evaluate_rules(orders, rules)


@register(
    "dq_duplicate_payment_suspects",
    oracle="""
    WITH keyed AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS day,
               o_orderkey
        FROM orders
    )
    SELECT o_custkey, cents, day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
    FROM keyed
    GROUP BY o_custkey, cents, day
    HAVING COUNT(*) > 1
    ORDER BY o_custkey, cents, day
    """,
)
def dq_duplicate_payment_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen (the classic AP audit): orders by the same
    customer for the identical cent amount on the same day — double-click
    submits, retry bugs, or fraud. One aggregation on the composite
    natural key; exact cents so float jitter can't hide a duplicate."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    keyed = orders.select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("day"),
        "o_orderkey",
    )
    return (
        keyed.groupBy("o_custkey", "cents", "day")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
        .orderBy("o_custkey", "cents", "day")
    )


# primary-key map of the star schema: the key-uniqueness PRECONDITION the
# key-join operators assume. Parquet enforces no constraints, and deduping
# at load would put a full shuffle in front of every query at 100 TB — so
# the contract is: verify with THIS detector (a double-load shows up as
# n_duplicate_keys > 0), quarantine upstream, and only then trust
# key-equi-joins. (A duplicate-rows edge probe confirmed that violating
# the precondition makes key-join fan-out engine-visible — by design this
# detector is the gate, not silent per-query dedup.)
_PK_MAP: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    # lineitem intentionally absent: the driver's synthetic data does NOT
    # keep (l_orderkey, l_linenumber) unique (~23% duplicated as shipped),
    # no registry join relies on lineitem row-keys (l_orderkey is an FK),
    # and its sequence integrity has its own report (dq_linenumber_density)
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _pk_oracle() -> str:
    # NULL-key semantics, declared once and applied to BOTH engines: a row
    # with any NULL key component violates the PK on its own and is counted
    # in n_null_key_rows; n_keys/n_duplicate_rows are computed over the
    # remaining (fully keyed) rows only. Without the explicit split, Spark's
    # count_distinct(struct(keys)) would count a NULL-bearing key tuple as a
    # distinct key while SQL's COUNT(DISTINCT k) skips it — the engines
    # would diverge exactly when the detector matters most.
    selects = []
    for t, keys in _PK_MAP.items():
        k = ", ".join(keys)
        anynull = " OR ".join(f"{c} IS NULL" for c in keys)
        selects.append(
            f"""
            SELECT '{t}' AS table_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER (WHERE {anynull}) AS BIGINT)
                       AS n_null_key_rows,
                   CAST(COUNT(DISTINCT ({k}))
                            FILTER (WHERE NOT ({anynull})) AS BIGINT)
                       AS n_keys,
                   CAST(COUNT(*) FILTER (WHERE NOT ({anynull}))
                        - COUNT(DISTINCT ({k}))
                              FILTER (WHERE NOT ({anynull})) AS BIGINT)
                       AS n_duplicate_rows
            FROM {t}
            """
        )
    return " UNION ALL ".join(selects) + " ORDER BY table_name"


@register("dq_pk_uniqueness", oracle=_pk_oracle(), contracts=False)
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit for every table in the star schema —
    the detector behind the key-uniqueness precondition (see ``_PK_MAP``).
    One count-distinct aggregate per table over only its key columns
    (column-pruned scans; map-side partial aggregation); reads each RAW
    table (``contracts=False``) because a double-loaded row excluded by
    another contract is still a double-load. Zero everywhere means every
    key-equi-join in the registry is fan-out-free.

    NULL keys are split out explicitly (``n_null_key_rows``) and excluded
    from ``n_keys``/``n_duplicate_rows`` on BOTH engines — see
    ``_pk_oracle`` for the declared semantics."""
    import functools

    frames = []
    for t, keys in _PK_MAP.items():
        df = read_star_parquet(spark, f"{sf_dir}/{t}.parquet")
        any_null = functools.reduce(
            lambda a, b: a | b, [F.col(c).isNull() for c in keys]
        )
        # when(no-null, struct) is NULL for null-keyed rows, which
        # count_distinct skips — one pruned scan, one aggregate per table.
        keyed = F.when(~any_null, F.struct(*[F.col(c) for c in keys]))
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(any_null, F.lit(1))).alias(
                    "n_null_key_rows"
                ),
                F.count_distinct(keyed).alias("n_keys"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "n_null_key_rows",
                "n_keys",
                (
                    F.col("n_rows")
                    - F.col("n_null_key_rows")
                    - F.col("n_keys")
                ).alias("n_duplicate_rows"),
            )
        )
    return functools.reduce(
        lambda a, b: a.unionByName(b), frames
    ).orderBy("table_name")


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem_without_order' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'order_without_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_without_part',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p
                      WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem_without_supplier',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey)
    ORDER BY relationship
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    relationship in the star schema (parquet enforces none of them — this
    query IS the constraint). Each check is a LEFT ANTI join; small parents
    broadcast, the two lineitem checks share one scan under AQE. Zero
    everywhere means the star is closed; any non-zero is a quarantine
    trigger for the DQ engine."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = read_star_parquet(spark, f"{sf_dir}/customer.parquet")
    part = read_star_parquet(spark, f"{sf_dir}/part.parquet")
    supplier = read_star_parquet(spark, f"{sf_dir}/supplier.parquet")

    def orphans(child, parent, ck, pk, name):
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    return (
        orphans(lineitem, orders, "l_orderkey", "o_orderkey",
                "lineitem_without_order")
        .unionByName(
            orphans(orders, customer, "o_custkey", "c_custkey",
                    "order_without_customer")
        )
        .unionByName(
            orphans(lineitem, part, "l_partkey", "p_partkey",
                    "lineitem_without_part")
        )
        .unionByName(
            orphans(lineitem, supplier, "l_suppkey", "s_suppkey",
                    "lineitem_without_supplier")
        )
        .orderBy("relationship")
    )


@register(
    "dq_linenumber_density",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               MAX(l_linenumber) AS max_ln,
               MIN(l_linenumber) AS min_ln,
               COUNT(DISTINCT l_linenumber) AS n_distinct
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE min_ln <> 1) AS BIGINT)
               AS n_bad_start,
           CAST(COUNT(*) FILTER (WHERE n_distinct <> n_lines) AS BIGINT)
               AS n_duplicate_linenums,
           CAST(COUNT(*) FILTER (WHERE max_ln <> n_lines) AS BIGINT)
               AS n_gapped
    FROM per_order
    """,
)
def dq_linenumber_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit for order line numbers: every order's
    lines should number densely 1..n (start at 1, no duplicates, no
    gaps — max equals count given the other two). The three violation
    counters localize WHICH invariant broke, the signature that
    distinguishes dropped lines from double-loads. One aggregation per
    order key, then a 1-row census."""
    lineitem = read_star_parquet(spark, f"{sf_dir}/lineitem.parquet")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.max("l_linenumber").alias("max_ln"),
        F.min("l_linenumber").alias("min_ln"),
        F.count_distinct("l_linenumber").alias("n_distinct"),
    )
    # count_if: COUNT-FILTER semantics (0 on empty input), not SUM (NULL)
    return per_order.agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("min_ln") != 1).alias("n_bad_start"),
        F.count_if(F.col("n_distinct") != F.col("n_lines")).alias(
            "n_duplicate_linenums"
        ),
        F.count_if(F.col("max_ln") != F.col("n_lines")).alias("n_gapped"),
    )
