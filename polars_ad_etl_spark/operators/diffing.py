"""Snapshot diffing + deterministic pseudonymization.

``table_diff`` is the data-reconciliation workhorse: given two snapshots of
a keyed table, emit exactly what changed (added / removed / changed rows) —
the operator behind CDC backfills, migration sign-offs, and "why do the
dashboards disagree" forensics. One FULL OUTER join on the key, change
class decided row-locally; at 100 TB both snapshots shuffle once on the
key (or zero times if both are bucketed on it), and unchanged rows can be
pre-pruned by comparing partition-level content hashes first.

``privacy_pseudonymize_events`` is the privacy-engineering twin of
``privacy_k_anonymity``: replace the raw user id with a salted portable
hash (md5-derived — same mixer the dedup family uses) so downstream
analytics keep referential integrity (same user → same pseudonym, joins
still work) while the raw id never leaves the trust boundary. The query
proves the two invariants that matter: the id space size is preserved
(no collisions collapsed users at this scale) and the per-user event
distribution is untouched.

Reference parity note: the reference repo has neither surface (SURVEY
§2.8); both extend the governance/ops layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.hashing import (
    portable_hash60,
    portable_hash60_sql,
)
from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet, load_events


def table_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``: one row per
    key present in either side, classified as 'added' / 'removed' /
    'changed' / 'unchanged'. Non-key columns are compared null-safely as a
    struct."""
    val_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *key_cols, F.struct(*val_cols).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*val_cols).alias("_new")
    )
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))


@register(
    "diff_orders_snapshots",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ), new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' AND o_totalprice < 50000
                    THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ), classified AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'changed' ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM classified GROUP BY change_type ORDER BY change_type
    """,
)
def diff_orders_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation demo: the orders table "a year later" (new
    rows appended, some open small orders flipped to F) diffed against the
    older snapshot — added/removed/changed/unchanged counts. The oracle
    replays the classification declaratively; the Spark side uses the
    generic ``table_diff`` operator (struct null-safe compare)."""
    orders = read_star_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    old = orders.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).drop("o_orderdate")
    new = (
        orders.filter(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
        )
        .drop("o_orderdate")
        .withColumn(
            "o_orderstatus",
            F.when(
                (F.col("o_orderstatus") == "O")
                & (F.col("o_totalprice") < 50000),
                F.lit("F"),
            ).otherwise(F.col("o_orderstatus")),
        )
    )
    d = table_diff(old, new, ["o_orderkey"])
    return (
        d.groupBy("change_type")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("change_type")
    )


_SALT = "pseud-v1:"


@register(
    "privacy_pseudonymize_events",
    oracle=f"""
    WITH p AS (
        SELECT {portable_hash60_sql(f"'{_SALT}' || CAST(user_id AS VARCHAR)")}
                   AS user_pseudo,
               event_type
        FROM events
    ), per AS (
        SELECT user_pseudo, COUNT(*) AS n_events
        FROM p GROUP BY user_pseudo
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pseudonyms,
           CAST(MIN(n_events) AS BIGINT) AS min_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM per
    """,
)
def privacy_pseudonymize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization audit: user ids replaced by a salted
    portable 60-bit hash, then the invariants a privacy review checks —
    pseudonym count equals the original user count (no collision collapsed
    two users; compare against any user-count query) and the per-user event
    distribution is bit-identical. Rotating the salt re-keys every
    pseudonym at once (the unlinkability lever). Stateless projection +
    one aggregation."""
    e = load_events(spark, sf_dir)
    p = e.select(
        portable_hash60(
            F.concat(F.lit(_SALT), F.col("user_id").cast("string"))
        ).alias("user_pseudo"),
    )
    per = p.groupBy("user_pseudo").agg(F.count("*").alias("n_events"))
    return per.agg(
        F.count("*").alias("n_pseudonyms"),
        F.min("n_events").alias("min_events"),
        F.max("n_events").alias("max_events"),
        F.sum("n_events").alias("total_events"),
    )
