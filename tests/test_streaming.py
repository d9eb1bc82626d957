"""Streaming slice validation (SURVEY §5.2 / §7.1 M6): each streaming query is
run to completion on the static events table (memory sink,
processAllAvailable) and must agree with its batch twin — which is itself
oracle-checked against DuckDB in test_oracle_diff."""

import pytest

from polars_ad_etl_spark.operators.registry import QUERIES
from polars_ad_etl_spark.streaming import (
    dedup_events_stream,
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_to_completion(stream_df, name: str, mode: str = "append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _sorted_rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_hourly_rollup_stream_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    # complete mode: the file source delivers everything before the final
    # trigger, so the last emitted result equals the batch answer
    _run_to_completion(hourly_rollup_stream(stream), "hourly_out", mode="complete")
    got = _sorted_rows(spark.sql("SELECT * FROM hourly_out"))
    want = _sorted_rows(QUERIES["events_hourly_rollup"](spark, SF_DIR))
    assert got == want


def test_sessionize_stream_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(sessionize_stream(stream), "sessions_out", mode="complete")
    got = _sorted_rows(spark.sql("SELECT * FROM sessions_out"))
    want = _sorted_rows(QUERIES["events_session_windows"](spark, SF_DIR))
    assert got == want


def test_dedup_stream_emits_each_event_once(spark):
    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(dedup_events_stream(stream), "dedup_out")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").first().n
    ids = spark.sql("SELECT COUNT(DISTINCT event_id) AS n FROM dedup_out").first().n
    from polars_ad_etl_spark.sources.star import load_events

    total = load_events(spark, SF_DIR).count()
    assert n == ids == total


def test_watermark_present_in_plan(spark):
    stream = hourly_rollup_stream(read_events_stream(spark, SF_DIR))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
