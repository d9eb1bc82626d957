"""Query registry: the driver contract surface.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable. Queries with an
``oracle`` get hash-compared against DuckDB running that SQL on the same
parquet (tables pre-registered as views: region nation customer supplier part
orders lineitem events documents embeddings). Queries without an oracle get a
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).

Determinism rules for oracle parity (why these queries look the way they do):

- **Float aggregation is done in exact decimal** (``functions.exact``): plain
  double sums are partition-order-dependent in the low bits and would
  hash-mismatch between two correct engines.
- **Every LIMIT/top-k has a unique total order** (tie-break on a key column).
- **Aggregate/computed columns are aliased identically** in Spark and SQL —
  the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
