"""Partitioned parquet sink + reader — the layout decisions that decide
whether a 100 TB table is scannable.

``write_partitioned`` lays data out hive-style (``dt=.../part-*.parquet``) so
date-ranged queries prune partitions at planning time (visible as
``PartitionFilters`` in the scan node); bucketed writes co-locate join keys
so repeated joins on the key skip their shuffles entirely.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str | Path,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> str:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(str(path))
    return str(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed managed table: joins/aggregations on ``bucket_col`` between
    tables bucketed the same way need no shuffle (and no sort, if sorted).
    Requires a warehouse dir — configured by the session factory default."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
    return table


def compact_sorted(
    df: DataFrame,
    path: str | Path,
    sort_cols: list[str],
    target_files: int | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Compaction + clustering sink: the maintenance pass that keeps a
    100 TB table scannable after many small incremental writes.

    ``repartitionByRange`` on the sort keys gives every output file a
    globally DISJOINT key range (range partitioner, sampled bounds), and
    ``sortWithinPartitions`` makes parquet row-group min/max stats tight
    inside each file — so a later read filtered on the sort keys skips
    whole files and row groups instead of scanning them.
    ``maxRecordsPerFile`` caps file size without another shuffle.
    """
    shuffled = (
        df.repartitionByRange(target_files, *sort_cols)
        if target_files
        else df.repartitionByRange(*sort_cols)
    ).sortWithinPartitions(*sort_cols)
    writer = shuffled.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(str(path))
    return str(path)


def read_partitioned(spark: SparkSession, path: str | Path) -> DataFrame:
    return spark.read.parquet(str(path))


def write_events_date_partitioned(
    events: DataFrame, path: str | Path, files_per_day: int = 1
) -> str:
    """The production layout for the events table: hive-style daily
    partitions (``event_date=YYYY-MM-DD/``) derived from ``ts``.

    At 100 TB an events table is ALWAYS laid out like this — a day-bounded
    query must be able to skip every other day's directories at planning
    time (``PartitionFilters`` on the scan), because filtering rows after
    reading a year of parquet is 2 orders of magnitude of wasted I/O.
    ``sources/star.py::load_events(since=, until=)`` routes date bounds to
    the partition column and then drops it, so query code is identical
    over flat and partitioned layouts (plan-pinned by
    tests/test_scale_layout.py).

    ``repartitionByRange`` on (event_date, ts) gives each writer task a
    contiguous time slice, so every daily directory gets ~``files_per_day``
    sorted files instead of one shard from every task (the small-files
    explosion ``partitionBy`` produces under hash layout)."""
    # `or 0`: countDistinct over ZERO rows returns a single row with n=NULL,
    # so an empty events frame must not crash the int() below — it writes an
    # empty (schema-only) dataset through the same single-partition path.
    n_days = events.select(
        F.countDistinct(F.to_date("ts")).alias("n")
    ).first().n or 0
    out = events.withColumn("event_date", F.to_date("ts"))
    out = out.repartitionByRange(
        max(int(n_days) * files_per_day, 1), "event_date", "ts"
    )
    out.write.mode("overwrite").partitionBy("event_date").parquet(str(path))
    return str(path)


def write_documents_source_partitioned(
    docs: DataFrame, path: str | Path, files_per_source: int = 1
) -> str:
    """The production layout for the documents corpus: hive-style
    partitions by ingestion source (``source_part=srcN/``).

    Curation gates filter by source constantly (allowlists, per-source
    quality policies, contamination quarantines); at 100 TB those gates
    must skip the other sources' directories at planning time, exactly as
    day-bounded event queries skip days. The partition column is DERIVED
    (``source_part = source``, mirroring events' ``event_date`` from
    ``ts``) and dropped again by ``sources/star.py::load_documents``, so
    query code and schema are identical over flat and partitioned layouts
    — and the poison-partition proof (tests/test_scale_layout.py) can
    plant a row whose DATA passes the source filter inside an
    out-of-allowlist directory to prove directories are skipped, not
    scanned-then-filtered.

    ``repartitionByRange`` on (source_part, doc_id) gives each writer task
    a contiguous source slice: ~``files_per_source`` files per directory
    instead of one shard from every task."""
    n_src = docs.select(
        F.countDistinct("source").alias("n")
    ).first().n or 0
    out = docs.withColumn("source_part", F.col("source"))
    out = out.repartitionByRange(
        max(int(n_src) * files_per_source, 1), "source_part", "doc_id"
    )
    out.write.mode("overwrite").partitionBy("source_part").parquet(str(path))
    return str(path)


def with_date_partition(df: DataFrame, ts_col: str, name: str = "dt") -> DataFrame:
    """Standard daily-partition derivation from an event-time column."""
    return df.withColumn(name, F.to_date(F.col(ts_col)))


def morton_code(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Z-order (Morton) interleave of two non-negative int columns: bit i of
    each input lands at output bits 2i / 2i+1, so sorting by the code keeps
    rows close in BOTH dimensions — the multi-column locality that a plain
    lexicographic sort cannot give. Built from shift/or expressions only
    (whole-stage codegen); ``bits`` bounds each input's value range.

    Inputs >= 2**bits would alias into unrelated tiles and silently destroy
    the locality/file-skipping guarantee, so out-of-range values raise at
    execution (ANSI-independent: raise_error behind an overflow guard)."""
    limit = 1 << bits
    guard = F.when(
        (a.cast("long") >= limit) | (b.cast("long") >= limit)
        | (a.cast("long") < 0) | (b.cast("long") < 0),
        F.raise_error(
            F.lit(
                f"morton_code: input outside [0, {limit}) for bits={bits}; "
                "raise `bits` or pre-scale the columns"
            )
        ).cast("long"),
    )
    code = guard.otherwise(F.lit(0)).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(
            F.shiftleft(abit, 2 * i).cast("long")
        ).bitwiseOR(F.shiftleft(bbit, 2 * i + 1).cast("long"))
    return code


def compact_zordered(
    df: DataFrame,
    path: str | Path,
    col_a: str,
    col_b: str,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Two-dimensional clustering compaction: range-partition + sort on the
    Morton code of (col_a, col_b), so reads filtered on EITHER column skip
    files (each file covers a compact 2-D tile, tight min/max on both
    columns) — the Z-ORDER maintenance op of lakehouse tables, expressed
    with plain Spark shuffles and a codegen-friendly bit interleave."""
    z = morton_code(F.col(col_a), F.col(col_b))
    tagged = df.withColumn("__z", z)
    shuffled = (
        tagged.repartitionByRange(target_files, "__z")
        if target_files
        else tagged.repartitionByRange("__z")
    ).sortWithinPartitions("__z")
    writer = shuffled.drop("__z").write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(str(path))
    return str(path)
