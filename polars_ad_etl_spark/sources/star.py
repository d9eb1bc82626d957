"""Loader for the driver's TPC-H-ish star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under an sf directory.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def load_events(spark: SparkSession, sf_dir: str | Path) -> DataFrame:
    """The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which the
    vectorized Spark reader rejects. Read nanos as long (runtime-settable
    legacy conf) and floor to microseconds as ``timestamp_ntz`` — naive, so
    the result is independent of the session timezone, matching DuckDB's
    TIMESTAMP_NS semantics (truncated to micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(str(Path(sf_dir) / "events.parquet"))
    if dict(df.dtypes)["ts"] == "bigint":
        # timestampadd on a TIMESTAMP_NTZ base is pure arithmetic — unlike
        # timestamp_micros(...)::timestamp_ntz, it cannot shift with the
        # session timezone (caught by the hostile-tz verification probe).
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    # Event-time contract: a row without a timestamp cannot be placed on
    # the timeline, so it is excluded at the loader (quarantine upstream).
    # The oracle side applies the identical predicate via
    # operators/registry.py::_apply_table_contracts.
    return df.where(F.col("ts").isNotNull())


# Vector-domain bound shared by BOTH engines' contract predicates (the
# Spark filter below and the oracle rewrite in
# operators/registry.py::_TABLE_CONTRACTS) — the single source of truth
# for the exact-integer envelope. test_edge_inputs.py asserts the
# envelope arithmetic against the quantization scales, so raising either
# side without the other fails loudly.
EMBEDDING_MAX_ABS = 16.0


def load_embeddings(spark: SparkSession, sf_dir: str | Path) -> DataFrame:
    """The embeddings table with its vector contract applied: a row is
    excluded when it has no vector (failed encoder batch), a zero vector
    (no cosine direction), or components outside (0, 16] in magnitude
    (NaN/Inf/overflow would poison the exact-integer distance arithmetic;
    real corpus components are < 0.6 — see the envelope math at
    operators/registry.py::_TABLE_CONTRACTS). Declared ONCE here for the
    Spark side; the oracle side gets the equivalent predicate via
    _apply_table_contracts. Both engines compare NaN as the largest
    float, so `max(|x|) <= 16` excludes non-finite vectors identically."""
    df = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))
    amax = F.array_max(F.transform(F.col("embedding"), F.abs))
    return df.where(
        F.col("embedding").isNotNull()
        & (amax > 0)
        & (amax <= EMBEDDING_MAX_ABS)
    )


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str | Path, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    base = Path(sf_dir)
    return {
        name: (
            load_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(str(base / f"{name}.parquet"))
        )
        for name in names
    }


def register_views(spark: SparkSession, sf_dir: str | Path) -> dict[str, DataFrame]:
    """Load + register temp views so queries can be written in SQL too."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
