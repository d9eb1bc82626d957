"""Bucketed-table layout: the shuffle-elimination strategy for repeated
big-big joins.

At 100 TB the single most expensive operator is the fact-fact shuffle
(orders ⋈ lineitem on orderkey, events ⋈ events on user). Bucketing
pre-shuffles ONCE at write time: ``bucketBy(N, key)`` hash-partitions rows
into N files per partition and records the layout in the catalog; every
later join or aggregation on the bucket key reads co-located buckets and
skips its Exchange entirely — the write-side shuffle is amortized over every
downstream consumer. ``sortBy`` additionally pre-sorts within buckets so a
sort-merge join skips its Sort too.

This is the managed-table sibling of ``repartition`` (per-query) and
``compact_zordered`` (file-skipping): repartition co-locates for one plan,
bucketing co-locates for a workload. The test
(tests/test_connectors.py::test_bucketed_join_no_shuffle) asserts the
payoff at the plan level: a join of two bucketed tables runs with ZERO
Exchange nodes.

Bucket count guidance: pick N so a bucket of the LARGER table is
~128-512 MB (N = table_bytes / 256 MB); both sides must share N (or one be
a multiple) for bucket-wise joins; too-large N makes small files, too-small
makes spill-prone tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Materialize ``df`` as a catalog-managed parquet table bucketed (and
    optionally sorted) on ``bucket_col`` — the one-time shuffle that every
    later bucket-key join avoids."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; with
    bucketing enabled (default) the plan is Exchange-free."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])
