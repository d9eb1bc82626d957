"""Google Sheets connector (source + sink), API-compatible with the
reference's ``GoogleSheetService`` (``src/google_cloud_client/
google_cloud_client.py``).

Driver-bounded by design: Sheets caps at 10M cells, so collect() at the sink
is inherently safe there (SURVEY §7.3). The gspread/google-auth dependency is
gated behind an import-try — this environment has no network or creds, so the
connector degrades to a clear error while all pure logic (date serial
conversion, value matrix construction, A1 ranges) stays importable and tested.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_ad_etl_spark.utils import shape_to_a1

# Days between 1899-12-30 (the Sheets/Excel serial epoch) and 1970-01-01
# (reference ``google_cloud_client.py:168-178``).
EXCEL_EPOCH_OFFSET = 25569


def dates_to_excel_serial(df: DataFrame) -> DataFrame:
    """Date columns -> Excel/Sheets serial numbers (epoch-days + 25569),
    mirroring the reference's pre-upload conversion
    (``google_cloud_client.py:168-178``)."""
    exprs = {}
    for field in df.schema.fields:
        if isinstance(field.dataType, T.DateType):
            exprs[field.name] = (
                F.datediff(F.col(field.name), F.lit("1970-01-01").cast("date"))
                + EXCEL_EPOCH_OFFSET
            )
    return df.withColumns(exprs) if exprs else df


def dataframe_to_values(df: DataFrame) -> list[list[Any]]:
    """Header + rows as a JSON-safe list-of-lists for ``sheet.update``
    (reference ``google_cloud_client.py:183-188``). Collects — Sheets-bounded."""
    serial = dates_to_excel_serial(df)
    header = list(serial.columns)
    rows = [
        [v.isoformat() if isinstance(v, (_dt.date, _dt.datetime)) else v for v in row]
        for row in serial.collect()
    ]
    return [header] + rows


# Reference default OAuth scopes (``google_cloud_client.py:24-27``).
DEFAULT_SCOPES = (
    "https://www.googleapis.com/auth/spreadsheets",
    "https://www.googleapis.com/auth/drive",
)


class GoogleSheetService:
    """Same public surface as the reference connector: ``get_dataframe``,
    ``clear_range``, ``upload_dataframe`` (``google_cloud_client.py:44-197``)."""

    def __init__(
        self,
        spark: SparkSession,
        credentials_path: str | None = None,
        scopes: list[str] | None = None,
    ):
        self.spark = spark
        self._client = None
        self._credentials_path = credentials_path
        self.scopes = list(scopes) if scopes is not None else list(DEFAULT_SCOPES)

    def _authorize(self):
        if self._client is None:
            try:
                import gspread  # gated: not installed in this environment
            except ImportError as exc:
                raise NotImplementedError(
                    "Google Sheets connector requires gspread + google-auth "
                    "and network access"
                ) from exc
            self._client = gspread.service_account(
                filename=self._credentials_path, scopes=self.scopes
            )
        return self._client

    def get_dataframe(self, sheet_key: str, sheet_name: str, a1_range: str) -> DataFrame:
        """Fetch an A1 range -> first row is the header, rest are data rows ->
        all-string DataFrame (reference ``google_cloud_client.py:44-99``)."""
        ws = self._authorize().open_by_key(sheet_key).worksheet(sheet_name)
        values = ws.get(a1_range)
        return self.rows_to_dataframe(values)

    def rows_to_dataframe(self, values: list[list[Any]]) -> DataFrame:
        """Row-oriented constructor (reference ``google_cloud_client.py:86-89``):
        header list + row lists -> DataFrame with string columns."""
        if not values:
            raise ValueError("empty range: no header row")
        header, rows = values[0], values[1:]
        schema = T.StructType([T.StructField(h, T.StringType(), True) for h in header])
        str_rows = [[None if v == "" else str(v) for v in row] for row in rows]
        return self.spark.createDataFrame(str_rows, schema=schema)

    def clear_range(self, sheet_key: str, sheet_name: str, a1_range: str) -> None:
        """Full-column clear before overwrite (reference
        ``google_cloud_client.py:101-133``)."""
        ws = self._authorize().open_by_key(sheet_key).worksheet(sheet_name)
        ws.batch_clear([a1_range])

    def upload_dataframe(
        self, df: DataFrame, sheet_key: str, sheet_name: str, start_cell: str = "A1"
    ) -> str:
        """Dates -> serials, header+rows matrix, ``sheet.update`` (reference
        ``google_cloud_client.py:135-197``). Returns the written A1 range."""
        values = dataframe_to_values(df)
        ws = self._authorize().open_by_key(sheet_key).worksheet(sheet_name)
        a1 = shape_to_a1(len(values) - 1, len(values[0]), "full_range")
        ws.update(values, a1)
        return a1


class GoogleCloudClient:
    """API-parity wrapper matching the reference's ``GoogleCloudClient``
    (``src/google_cloud_client/google_cloud_client.py:10-37``): accepts a
    service-account JSON path plus an optional OAuth ``scopes`` list
    (defaulting to the reference's spreadsheets+drive pair) and exposes the
    authorized Sheets surface as ``.googlesheet``. Authorization stays lazy
    and credential-gated — constructing the client needs neither gspread nor
    network, so the wrapper is usable (and testable) in air-gapped runs."""

    def __init__(
        self,
        spark: SparkSession,
        service_account_json: str | None = None,
        scopes: list[str] | None = None,
    ):
        self.service_account_json = service_account_json
        self.scopes = list(scopes) if scopes is not None else list(DEFAULT_SCOPES)
        self.googlesheet = GoogleSheetService(
            spark, credentials_path=service_account_json, scopes=self.scopes
        )
