"""Standard-SQL empty-input behavior for ROLLUP / CUBE / GROUPING SETS.

The SQL standard (and DuckDB/Postgres) emit the ``()`` grouping-set row
even when the input relation is empty — a grand-total row with COUNT 0 and
NULL for the other aggregates, exactly like a plain global aggregate.
Spark's Expand-based implementation produces no output rows on empty
input, so the grand-total row silently vanishes (an empty day-partition
turns "total: 0 rows" into "no report at all").

``with_empty_grand_total`` restores the standard row: it synthesizes the
grand-total constants (COUNT-family columns 0, explicit overrides such as
``grouping_id() == 2**k - 1``, everything else NULL cast to the column's
existing type), guarded by an is-the-source-empty probe, and unions it in.

The guard is ``src.limit(1)`` counted — NOT a re-aggregation of the rolled
frame (Catalyst prunes the probe's columns differently, so that variant
canonicalizes to a *different* exchange and re-scans the fact; measured as
a second full FileScan in the physical plan). A LocalLimit(1) scan stops
at the first row it sees, so the guard costs one near-empty task on a
non-empty table of any size and a footer-only sweep on an empty one
(asserted in tests/test_edge_inputs.py).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_empty_grand_total(
    rolled: DataFrame,
    src: DataFrame,
    count_cols: Iterable[str] = (),
    grand_values: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Union the standard grand-total row into ``rolled`` iff ``src`` is
    empty.

    ``rolled`` is the output of a rollup/cube/grouping-sets aggregate over
    ``src`` whose grouping sets include ``()`` — exactly the case where
    Spark's empty-input output (0 rows) diverges from the standard (the
    grand-total row). ``count_cols`` are aggregate output columns whose
    empty-input value is 0 (the COUNT family); ``grand_values`` overrides
    anything else non-NULL on empty input (e.g. a grouping-id column,
    which is ``2**k - 1`` on the grand-total row). All remaining columns —
    grouping keys and NULL-on-empty aggregates like SUM — become typed
    NULLs."""
    count_cols = set(count_cols)
    overrides = dict(grand_values or {})
    probe = (
        src.select(F.lit(1).alias("__one"))
        .limit(1)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("__n_src"))
        .where(F.col("__n_src") == 0)
    )
    sel = []
    for f in rolled.schema.fields:
        if f.name in overrides:
            sel.append(overrides[f.name].cast(f.dataType).alias(f.name))
        elif f.name in count_cols:
            sel.append(F.lit(0).cast(f.dataType).alias(f.name))
        else:
            sel.append(F.lit(None).cast(f.dataType).alias(f.name))
    return rolled.unionByName(probe.select(*sel))
