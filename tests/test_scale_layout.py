"""Physical-layout scale tests: partition pruning, bucketed shuffle-free
joins, and salted aggregation equivalence — the mechanisms that keep plans
viable at 100 TB, exercised and asserted on real plans."""

import pytest
from pyspark.sql import functions as F

from polars_ad_etl_spark.operators import QUERIES
from polars_ad_etl_spark.sinks.parquet import (
    with_date_partition,
    write_bucketed_table,
    write_partitioned,
)
from polars_ad_etl_spark.sources.star import load_events

SF_DIR = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning(spark, tmp_path):
    events = with_date_partition(load_events(spark, SF_DIR), "ts")
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["dt"])

    pruned = spark.read.parquet(path).filter(F.col("dt") == "2024-01-03")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "dt" in plan
    # pruning actually works: only one day's rows are read
    full = load_events(spark, SF_DIR)
    want = full.filter(F.to_date("ts") == "2024-01-03").count()
    assert pruned.count() == want > 0


def test_events_bounded_queries_prune_partitions(spark, tmp_path):
    """The REGISTRY's date-bounded rollup queries, run over the production
    date-partitioned events layout, must prune whole daily directories at
    the catalog: the scan carries PartitionFilters on event_date with both
    bounds, reads only the in-window files, and returns byte-identical
    results to the same query on the flat driver layout."""
    from polars_ad_etl_spark.operators.relational import (
        EVENTS_WINDOW_SINCE,
        EVENTS_WINDOW_UNTIL,
    )
    from polars_ad_etl_spark.sinks.parquet import (
        write_events_date_partitioned,
    )

    layout = str(tmp_path)
    write_events_date_partitioned(
        load_events(spark, SF_DIR), f"{layout}/events.parquet"
    )
    # poison proof that directories are SKIPPED, not scanned-then-filtered:
    # a row whose ts is inside the window, planted in an out-of-window
    # partition directory. A pruning scan never opens that directory, so
    # the row must not appear; an unpruned scan would pass it through the
    # ts filter and shift every count below.
    poison = load_events(spark, SF_DIR).limit(1).withColumn(
        "ts", F.expr(f"TIMESTAMP_NTZ '{EVENTS_WINDOW_SINCE} 12:00:00'")
    )
    poison.write.mode("append").parquet(
        f"{layout}/events.parquet/event_date=2024-01-25"
    )
    for name in (
        "events_hourly_rollup_bounded",
        "events_sliding_windows_bounded",
    ):
        df = QUERIES[name](spark, layout)
        plan = formatted_plan(df)
        scan = plan.split("PartitionFilters:")
        assert len(scan) == 2, f"{name}: no PartitionFilters in scan"
        pf = scan[1].splitlines()[0]
        assert "event_date" in pf and ">=" in pf and "<" in pf, (
            f"{name}: date bounds missing from partition filters: {pf}"
        )
        # schema identical across layouts (event_date dropped by the
        # loader) and results byte-identical to the flat driver layout —
        # which also proves the poison row was pruned away
        flat = QUERIES[name](spark, SF_DIR)
        assert df.columns == flat.columns
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, flat.collect())
        )
    # ...and the poison row IS visible when its directory is in range, so
    # the proof above can't pass vacuously
    wide = load_events(spark, layout, since="2024-01-01", until="2024-02-01")
    flatn = load_events(spark, SF_DIR, since="2024-01-01",
                        until="2024-02-01").count()
    assert wide.count() == flatn + 1


def test_curation_partitioned_prunes_source_directories(spark, tmp_path):
    """The REGISTRY's source-allowlisted curation twin, run over the
    production source-partitioned documents layout, must prune the
    out-of-allowlist sources' directories at the catalog — proven with a
    poison row whose DATA passes the source filter, planted in an
    out-of-allowlist directory: a pruning scan never opens it; an
    unpruned scan-then-filter would pass it through and change the
    result."""
    from polars_ad_etl_spark.operators.dedup import (
        CURATION_SOURCE_ALLOWLIST,
    )
    from polars_ad_etl_spark.sinks.parquet import (
        write_documents_source_partitioned,
    )
    from polars_ad_etl_spark.sources.star import load_documents

    layout = str(tmp_path)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_documents_source_partitioned(
        docs, f"{layout}/documents.parquet"
    )
    # poison: an allowlisted-source row (source='src0', unique text so the
    # dedup window can't absorb it) inside the src19 directory
    poison = docs.limit(1).select(
        F.lit(10_000_000).alias("doc_id"),
        F.lit("poison unique text never seen in the corpus body").alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(47).cast("long").alias("n_chars"),
    )
    poison.write.mode("append").parquet(
        f"{layout}/documents.parquet/source_part=src19"
    )
    df = QUERIES["curation_training_set_partitioned"](spark, layout)
    plan = formatted_plan(df)
    scan = plan.split("PartitionFilters:")
    assert len(scan) == 2, "no PartitionFilters in scan"
    assert "source_part" in scan[1].splitlines()[0]
    flat = QUERIES["curation_training_set_partitioned"](spark, SF_DIR)
    assert df.columns == flat.columns
    # identical to the flat layout — which also proves the poison row was
    # pruned away (directory skipped, not scanned-then-filtered)
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, flat.collect())
    )
    # ...and the poison row IS visible without the partition restriction,
    # so the proof above can't pass vacuously
    wide = load_documents(spark, layout)
    assert (
        wide.filter(F.col("doc_id") == 10_000_000).count() == 1
    )
    # schema is layout-independent (source_part dropped, canonical order)
    assert wide.columns == docs.columns


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        write_bucketed_table(o, "orders_b", "o_orderkey", 4)
        write_bucketed_table(l, "lineitem_b", "l_orderkey", 4)
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = formatted_plan(joined)
        # the join itself must not reshuffle either bucketed side
        join_section = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_agg_matches_plain(spark):
    salted = QUERIES["skew_salted_revenue_by_suppkey"](spark, SF_DIR)
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = l.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)"))
        .cast("double")
        .alias("revenue")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # and it really is two aggregation phases over a salt key
    plan = formatted_plan(salted)
    assert plan.count("HashAggregate") >= 3
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_dynamic_partition_overwrite_is_surgical(spark, tmp_path):
    """Re-loading one day replaces exactly that day's partition and leaves
    every other partition byte-identical — the idempotent-backfill property."""
    from pyspark.sql import functions as F

    from polars_ad_etl_spark.sinks.incremental import write_partition_overwrite

    path = tmp_path / "t"
    base = spark.createDataFrame(
        [("2026-01-01", 1, 10.0), ("2026-01-01", 2, 20.0), ("2026-01-02", 3, 30.0)],
        "dt string, id int, v double",
    )
    write_partition_overwrite(base, path, ["dt"])
    # backfill day 1 with corrected data; day 2 must survive untouched
    fix = spark.createDataFrame(
        [("2026-01-01", 1, 99.0)], "dt string, id int, v double"
    )
    write_partition_overwrite(fix, path, ["dt"])
    got = {
        (str(r.dt), r.id, r.v) for r in spark.read.parquet(str(path)).collect()
    }
    assert got == {("2026-01-01", 1, 99.0), ("2026-01-02", 3, 30.0)}
    # idempotency: re-running the same backfill changes nothing
    write_partition_overwrite(fix, path, ["dt"])
    again = {
        (str(r.dt), r.id, r.v) for r in spark.read.parquet(str(path)).collect()
    }
    assert again == got


def test_stream_foreachbatch_incremental_sink(spark, tmp_path):
    """The streaming incremental sink lands the same rows as the batch
    enrichment query, partitioned by event date."""
    from pyspark.sql import functions as F

    from polars_ad_etl_spark.operators.registry import QUERIES
    from polars_ad_etl_spark.sinks.incremental import stream_to_partitioned_parquet
    from polars_ad_etl_spark.streaming import enrich_purchases_stream, read_events_stream

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf)
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    enriched = enrich_purchases_stream(stream, customer).withColumn(
        "dt", F.lit("static")  # single-file source -> one batch -> aligned
    )
    q = stream_to_partitioned_parquet(
        enriched, tmp_path / "out", ["dt"], tmp_path / "ckpt"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .drop("dt")
        .collect()
    )
    want = sorted(tuple(r) for r in QUERIES["events_enriched_purchases"](spark, sf).collect())
    assert got == want


def test_compact_sorted_disjoint_clustered_files(spark, tmp_path):
    """compact_sorted must (a) hit the target file count, (b) keep all rows,
    (c) produce files with globally DISJOINT sort-key ranges — the property
    that lets a key-filtered read skip whole files via parquet stats."""
    from polars_ad_etl_spark.sinks.parquet import compact_sorted

    e = load_events(spark, SF_DIR).repartition(16)  # simulate small files
    out = tmp_path / "events_compacted"
    compact_sorted(e, out, sort_cols=["ts"], target_files=4)

    back = spark.read.parquet(str(out))
    assert back.count() == e.count()

    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    assert len(per_file) == 4
    spans = sorted([(r.lo, r.hi) for r in per_file])
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo  # disjoint (range-partitioned) key spans


def test_morton_code_locality_and_bounds():
    """Morton interleave: bit-exact on known values, monotone-ish locality —
    points in the same small 2-D tile sort adjacently."""
    from polars_ad_etl_spark.sinks.parquet import morton_code

    # pure-python reference
    def ref(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    assert ref(0, 0) == 0 and ref(1, 0) == 1 and ref(0, 1) == 2 and ref(1, 1) == 3
    assert ref(2, 2) == 12  # next 2x2 tile block


def test_compact_zordered_tiles_both_columns(spark, tmp_path):
    """Z-ordered compaction: each output file's (a, b) bounding box is a
    compact tile — max spans a small fraction of the global range on BOTH
    columns, which plain lexicographic sort cannot achieve for the second
    column."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from polars_ad_etl_spark.sinks.parquet import compact_zordered, morton_code

    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    # spark-side code must equal the python reference
    got = df.select("a", "b", morton_code(F.col("a"), F.col("b")).alias("z")).collect()

    def ref(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    assert all(r.z == ref(r.a, r.b) for r in got)

    out = tmp_path / "zorder"
    compact_zordered(df, out, "a", "b", target_files=16)
    spans_a, spans_b = [], []
    for f in out.glob("*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        mins = {c: None for c in ("a", "b")}
        maxs = {c: None for c in ("a", "b")}
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        spans_a.append(maxs["a"] - mins["a"])
        spans_b.append(maxs["b"] - mins["b"])
    # global ranges: a in [0,63], b in [0,63]; a 16-file Z layout gives
    # tiles covering ~1/4 of each axis
    assert max(spans_a) <= 40 and max(spans_b) <= 40, (spans_a, spans_b)
