"""Inline pipeline observability via ``df.observe`` (the Observation API).

Production ETL wants row counts, null rates, and value totals for every run
WITHOUT paying extra passes — ``observe`` attaches accumulator-backed
metrics to the existing plan, collected as a side effect of the action the
pipeline already performs. At 100 TB that difference (0 extra scans vs a
metrics job re-reading the table) is the whole game.

Usage::

    df, obs = observe_quality(df, "ingest", null_cols=["Spend"],
                              sum_col="Spend")
    df.write.parquet(...)          # the pipeline's own action
    metrics = obs.get              # {'n_rows': ..., 'null_Spend': ..., ...}

The returned metrics dict feeds the run log / alerting; a reconciliation
check (rows written == rows observed) costs nothing extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str,
    null_cols: tuple[str, ...] | list[str] = (),
    sum_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach zero-extra-pass quality metrics to ``df``: total rows, a null
    count per ``null_cols`` entry (``null_<col>``), and an exact decimal
    total of ``sum_col`` (``sum_<col>``). Metrics materialize when the
    caller runs ANY action on the returned frame."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
    if sum_col is not None:
        metrics.append(
            F.sum(F.col(sum_col).cast("decimal(25,6)"))
            .cast("double")
            .alias(f"sum_{sum_col}")
        )
    return df.observe(obs, *metrics), obs
