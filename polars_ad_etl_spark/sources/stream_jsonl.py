"""Custom Python STREAMING DataSource (Spark 4
``pyspark.sql.datasource.SimpleDataSourceStreamReader`` API): a
deterministic JSONL tail.

The batch Python DataSource surface is covered by ``xlsx_datasource``;
this completes the platform with the streaming half — the API a team uses
to adapt an internal feed (poll-able HTTP queue, vendor SDK, growing log
file) into Structured Streaming without a JVM connector. Offsets are
plain row indexes into the file, which makes every micro-batch
REPLAYABLE: ``readBetweenOffsets(start, end)`` re-reads exactly the same
rows, so checkpoint recovery and exactly-once ``foreachBatch`` sinks work
the way the built-in file source's do (asserted in
tests/test_connectors.py).

Scale notes: the simple-reader variant reads on the DRIVER by design
(Spark ships the rows to executors) — right for control-plane-size feeds
(thousands of rows per poll), wrong for firehoses; a partition-planning
``DataSourceStreamReader`` is the upgrade path, same offset contract.
"""

from __future__ import annotations

import json
from typing import Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

DEFAULT_BATCH_ROWS = 100


class _JsonlTailReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._batch_rows = int(options.get("batchrows", DEFAULT_BATCH_ROWS))
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, start: int, end: int | None) -> list[Tuple]:
        # materialized list, not a generator: Spark pickles the batch when
        # planning partitions, and generators don't pickle
        out = []
        with open(self._path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i < start:
                    continue
                if end is not None and i >= end:
                    break
                if not line.strip():
                    continue
                obj = json.loads(line)
                out.append(tuple(obj.get(name) for name in self._fields))
        return out

    def read(self, start: dict):
        lo = start["row"]
        hi = lo + self._batch_rows
        with open(self._path, encoding="utf-8") as f:
            n = sum(1 for _ in f)
        hi = min(hi, n)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[Tuple]:
        # deterministic replay: the same [start, end) rows, always —
        # the property checkpoint recovery relies on.
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the file is the retained log


class JsonlTailDataSource(DataSource):
    """``spark.dataSource.register(JsonlTailDataSource)`` then
    ``spark.readStream.format("jsonl_tail").schema(s).option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_tail"

    def schema(self) -> str:
        raise NotImplementedError(
            "jsonl_tail requires an explicit .schema(...) — inference on a "
            "growing stream is a race"
        )

    def simpleStreamReader(self, schema: StructType):
        return _JsonlTailReader(schema, self.options)
