"""Differential comparison helper: run a registry query on Spark and its
oracle SQL on DuckDB over the same parquet, normalize, and diff — a local
pre-flight of the driver's CORRECTNESS gate."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

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


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            first = next((v for v in s if v is not None), None)
            if isinstance(first, (dt.date, dt.datetime)):
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> str | None:
    """Returns None if equal, else a human-readable diff description."""
    a = _normalize(spark_df.toPandas())
    b = _normalize(con.execute(sql).df())
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} duckdb={list(b.columns)}"
    if len(a) != len(b):
        return f"row counts differ: spark={len(a)} duckdb={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
        else:
            eq = (a[c].isna() & b[c].isna()).to_numpy() | (
                a[c].fillna("<NA>").to_numpy() == b[c].fillna("<NA>").to_numpy()
            )
        if not bool(np.all(eq)):
            idx = int(np.argmin(eq))
            return (
                f"column {c!r} differs at sorted row {idx}: "
                f"spark={av[idx]!r} duckdb={bv[idx]!r}"
            )
    return None
