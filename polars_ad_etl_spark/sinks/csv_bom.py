"""CSV sink with UTF-8 BOM (Excel/Korean-friendly single file).

The reference writes one CSV with a BOM (``df.write_csv(out,
include_bom=True)``, e.g. ``scripts/apsl_internal.py:191``). Spark's
distributed CSV writer has neither a BOM option nor single-file output, so
the sink has two modes (SURVEY §2.9 K1):

- ``single=True`` (default, reference parity): collect via Arrow ``toPandas``
  and write one ``utf-8-sig`` file. Correct for report-sized results; bounded
  by driver memory — callers at scale should aggregate first.
- ``single=False`` (scale path): distributed ``df.write.csv`` part-files, no
  BOM (documented divergence; BOM-per-part would corrupt a concatenated read).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def write_csv_bom(df: DataFrame, path: str | Path, single: bool = True) -> str:
    path = str(path)
    if single:
        df.toPandas().to_csv(path, index=False, encoding="utf-8-sig")
        return path
    df.write.mode("overwrite").option("header", True).csv(path)
    return path
