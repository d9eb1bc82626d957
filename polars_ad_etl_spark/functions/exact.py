"""Exact (order-independent) floating aggregation.

Why: the correctness harness hash-compares Spark results against a DuckDB
oracle. A plain ``SUM(double)`` is order-dependent in the low bits, and Spark
and DuckDB sum in different partition orders — so two *correct* engines
disagree in the last ulp and hash-mismatch.

Fix: sum in exact decimal arithmetic. Each double input is rounded to a fixed
scale (ample for currency-like data), summed exactly (decimal addition is
associative — partition order can't matter), then cast back to double. Both
engines produce the identical rational number, hence the identical double.

This is also the *right* engine behavior at 100 TB: a 1000-executor sum gets a
deterministic answer independent of partitioning, which makes results
reproducible run-to-run.

SQL-side mirror (DuckDB oracle):  CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(25,6)"  # precision ample for sf0.1..100TB sums at scale 6


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    """The DuckDB-side mirror of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
