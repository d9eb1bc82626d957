"""XML connector (Spark 4 native ``xml`` format).

Completes the tabular-source family (CSV/Excel/Sheets/JSONL/dir-dispatch —
SURVEY §2.1) with the remaining enterprise feed format. Spark 4 ships XML
read/write built in (the former spark-xml package), so the connector is a
thin policy layer matching this repo's source conventions:

- explicit ``row_tag`` (no magic default),
- optional explicit schema (inference reads the data twice — fine for
  samples, wrong for 100 TB; production callers pass the schema),
- attributes surface with the ``_`` prefix (Spark default), documented
  here so downstream renames are deliberate.

Scale note: XML files are splittable by row-tag scanning in this reader;
one giant document with a single row tag is NOT parallel — feeds should
shard files upstream, same rule as JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read XML rows under ``row_tag``. Pass ``schema`` in production to
    skip the inference pass."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, root_tag: str = "rows"
) -> None:
    """Write a DataFrame as XML (one ``row_tag`` element per row)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )
