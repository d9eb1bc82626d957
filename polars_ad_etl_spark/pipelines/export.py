"""Shared export step for the daily pipelines: CSV with UTF-8 BOM, named
``{prefix}_{min_date}–{max_date}.csv`` from the first Date column — the export
loop every reference script ends with (e.g. ``scripts/manaboo_daily.py:108``,
``:145``). The Sheets upload leg is available via sources.sheets (driver-side,
credential-gated)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from polars_ad_etl_spark.sinks.csv_bom import write_csv_bom
from polars_ad_etl_spark.utils import make_date_filename


def export_daily(
    df: DataFrame,
    prefix: str,
    processed_dir: str | Path,
    fmt: str = "csv",
) -> str:
    """Write the merged pipeline result; returns the output path. Note the
    filename is always joined to ``processed_dir`` (the reference's apsl
    script accidentally writes to CWD — SURVEY §2.12 treats joined as the
    intended behavior). ``fmt="xlsx"`` writes a real workbook instead of
    BOM-CSV — same spreadsheet consumer, no Sheets network dependency."""
    if fmt not in ("csv", "xlsx"):
        raise ValueError(f"unknown export format {fmt!r}")
    name = make_date_filename(df, prefix)
    if fmt == "xlsx":
        from polars_ad_etl_spark.sinks.xlsx import write_xlsx

        out = Path(processed_dir) / (Path(name).stem + ".xlsx")
        return write_xlsx(df, out)
    return write_csv_bom(df, Path(processed_dir) / name)
