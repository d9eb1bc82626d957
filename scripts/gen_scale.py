#!/usr/bin/env python
"""Scale-up generator for the driver's synthetic star schema.

Replicates every fact/feature table of a source SF directory ``factor``
times with DISJOINT key spaces (newkey = key + copy * stride, stride =
the table's contiguous 0-based key range), preserving referential
integrity across customer/orders/lineitem/part/supplier and per-user
event densities — so join and aggregation cardinalities scale exactly
linearly and a sweep over factors measures the ENGINE's scaling, not an
artifact of the data.

Two content columns get copy-dependent rewrites so "bigger" does not mean
"degenerate":

- ``documents.text``: every whitespace token in copy i>0 is suffixed
  ``_i``. Each copy is an isomorphic corpus in a disjoint shingle space:
  within-copy duplicate/near-duplicate structure is preserved exactly
  (MinHash/LSH pair counts scale by ``factor``), while cross-copy shingles
  never collide — replicating identical text instead would square the LSH
  pair count and turn a linear-scaling test into a worst-case skew test.
- ``embeddings.embedding``: copy i>0 adds a deterministic per-coordinate
  perturbation 1e-4*i*sin(vec_id+j) — near the original geometry (IVF and
  LSH bucket structure survives) without exact-duplicate vectors that
  would make ANN distance-0-degenerate.

Dimension tables (region, nation) are copied unchanged: at any real
scale, dims stay small — that is what makes the broadcast-join strategy
hold at 100 TB.

Usage: python scripts/gen_scale.py SRC_DIR OUT_DIR FACTOR [--partition-events]
e.g.   python scripts/gen_scale.py /root/testdata/sf0.1 .localdata/sf1.0 10

``--partition-events`` writes the events table in the production
date-partitioned layout (``event_date=YYYY-MM-DD/`` directories via
sinks/parquet.py::write_events_date_partitioned) instead of flat files —
the layout that lets date-bounded registry queries
(events_*_bounded) prune whole days at the catalog.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> {column: stride-source-column} ; stride is max(key)+1 of the
# source table the column references (contiguous 0-based keys).
KEYMAP = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "part": {"p_partkey": ("part", "p_partkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
DIMS = ("region", "nation")


def _explode_copies(df: DataFrame, factor: int) -> DataFrame:
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("cp"), "*"
    )


def scale_table(
    spark: SparkSession, src: str, name: str, factor: int, strides: dict
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in DIMS or factor == 1:
        return df
    out = _explode_copies(df, factor)
    for col, (stbl, scol) in KEYMAP[name].items():
        out = out.withColumn(
            col, (F.col(col) + F.col("cp") * F.lit(strides[(stbl, scol)])).cast("long")
        )
    if name == "documents":
        # per-copy injective word map: disjoint shingle spaces across copies
        suffixed = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1_"), F.col("cp").cast("string")),
        )
        out = out.withColumn(
            "text", F.when(F.col("cp") == 0, F.col("text")).otherwise(suffixed)
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        out = out.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, j) -> CAST(x + 1e-4 * cp * sin(vec_id + j) AS FLOAT))"
            ),
        )
    return out.drop("cp")


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    partition_events = "--partition-events" in sys.argv[4:]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-scale")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    strides = {}
    for tbl, cols in KEYMAP.items():
        for col, (stbl, scol) in cols.items():
            if (stbl, scol) not in strides:
                strides[(stbl, scol)] = (
                    spark.read.parquet(f"{src}/{stbl}.parquet")
                    .agg(F.max(scol))
                    .collect()[0][0]
                    + 1
                )
    Path(dst).mkdir(parents=True, exist_ok=True)
    for name in list(KEYMAP) + list(DIMS):
        out = scale_table(spark, src, name, factor, strides)
        # file count scales with the factor (source tables are one file per
        # table), keeping per-file size constant — the layout any real
        # ingest produces, and what lets scan parallelism grow with data.
        # A fixed file count instead caps every scan at that many tasks:
        # measured, a single-file 3x table made half the suite SLOWER at
        # 3x than at 10x data. Layout is part of the scaling design.
        n_files = factor if name not in DIMS else 1
        if name == "events" and partition_events:
            from polars_ad_etl_spark.sinks.parquet import (
                write_events_date_partitioned,
            )

            if dict(out.dtypes)["ts"] == "bigint":
                out = out.withColumn(
                    "ts",
                    F.expr(
                        "timestampadd(MICROSECOND, ts div 1000,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
            write_events_date_partitioned(
                out, f"{dst}/{name}.parquet", files_per_day=max(factor // 10, 1)
            )
        else:
            out.repartition(n_files).write.mode("overwrite").parquet(
                f"{dst}/{name}.parquet"
            )
        print(f"{name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
