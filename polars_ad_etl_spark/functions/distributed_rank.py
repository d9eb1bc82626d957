"""Exact global order statistics WITHOUT a global-sort window.

``row_number().over(Window.orderBy(...))`` (empty partitionBy) funnels the
whole input through ONE task — the single-partition sort the plan lint
(`plans/audit.py`) exists to catch. This helper provides the scale-safe
equivalent: exact global rank and exact global running sum, computed with
the same distributed-sort machinery Spark's own ``orderBy`` uses:

1. ``repartitionByRange(sort_cols)`` — reservoir-sampled range partitioner,
   balanced even on skewed value distributions;
2. per-partition ``row_number`` / running sum (every window partition is a
   bounded ~n/P slice by construction);
3. global rank/cumsum = local value + the sum of earlier partitions'
   counts/sums, taken from a tiny P-row stats frame whose prefix sums are
   a broadcast triangular self-join — no empty-partitionBy window anywhere
   in the plan.

This is the generalization of the pattern ``user_rfm_segments`` uses for
exact NTILE (`operators/behavior.py`) and ``curation_packed_sequences``
uses for exact offsets; new order-statistics queries should build on this
instead of re-deriving it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def with_global_rank_cumsum(
    df: DataFrame,
    sort_cols: list[str],
    value_col: str | None = None,
    rank_name: str = "rank",
    cumsum_name: str = "cumsum",
) -> DataFrame:
    """Add an exact 1-based global ``rank`` (dense total order over
    ``sort_cols``, which must be a unique key of ``df``) and, if
    ``value_col`` is given, the exact inclusive global running sum of that
    column in the same order — with no global-sort window in the plan.
    ``value_col`` must be integral (exactness of partial sums)."""
    r = df.repartitionByRange(*sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        W.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = r.withColumn("_rn", F.row_number().over(
        W.partitionBy("_pid").orderBy(*sort_cols)
    ))
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if value_col is not None:
        ranked = ranked.withColumn(
            "_lcum", F.sum(value_col).over(local_w)
        )
        aggs.append(F.sum(value_col).alias("_vsum"))
    pstats = r.groupBy("_pid").agg(*aggs)
    b = pstats.select(
        F.col("_pid").alias("_bpid"),
        F.col("_cnt").alias("_bcnt"),
        *( [F.col("_vsum").alias("_bvsum")] if value_col is not None else [] ),
    )
    before = (
        pstats.join(F.broadcast(b), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_before_cnt"),
            *(
                [F.coalesce(F.sum("_bvsum"), F.lit(0)).alias("_before_sum")]
                if value_col is not None
                else []
            ),
        )
    )
    out = ranked.join(F.broadcast(before), "_pid").withColumn(
        rank_name, F.col("_before_cnt") + F.col("_rn")
    )
    if value_col is not None:
        out = out.withColumn(
            cumsum_name, F.col("_before_sum") + F.col("_lcum")
        )
    drop = ["_pid", "_rn", "_before_cnt"] + (
        ["_lcum", "_before_sum"] if value_col is not None else []
    )
    return out.drop(*drop)
