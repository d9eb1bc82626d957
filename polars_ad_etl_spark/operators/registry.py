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

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Event-time data contract: a row without a timestamp cannot be placed on
# the timeline, so the events surface excludes it everywhere — declared
# ONCE on each engine. Spark side: sources/star.py::load_events filters
# ts IS NOT NULL (every events query goes through it). Oracle side: this
# rewrite routes every events reference through the same predicate, so the
# two engines keep seeing the same relation on NULL-carrying inputs
# (exercised by scripts/edge_sweep.py's `nulls` variant). The rewrite is
# alias-safe (`FROM events e` -> `FROM __events e`) and CTE-safe (the
# shadow name differs from the view name, so there is no circular
# reference and no schema-qualification assumption about the driver's
# DuckDB catalog).
_EVENTS_REF = re.compile(r"\b(FROM|JOIN)(\s+)events\b")
_EVENTS_CTE = "__events AS (SELECT * FROM events WHERE ts IS NOT NULL)"


def _apply_events_contract(sql: str) -> str:
    rewritten, n = _EVENTS_REF.subn(r"\1\2__events", sql)
    if n == 0:
        return sql
    s = rewritten.lstrip()
    low = s[:20].upper()
    if low.startswith("WITH RECURSIVE"):
        return "WITH RECURSIVE " + _EVENTS_CTE + ", " + s[len("WITH RECURSIVE") :].lstrip()
    if low.startswith("WITH"):
        return "WITH " + _EVENTS_CTE + ", " + s[len("WITH") :].lstrip()
    return "WITH " + _EVENTS_CTE + " " + s


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _apply_events_contract(oracle)
        return fn

    return deco
