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


def test_sliding_rollup_stream_matches_batch(spark):
    from polars_ad_etl_spark.streaming import sliding_rollup_stream

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(sliding_rollup_stream(stream), "sliding_out", mode="complete")
    got = _sorted_rows(spark.sql("SELECT * FROM sliding_out"))
    want = _sorted_rows(QUERIES["events_sliding_windows"](spark, SF_DIR))
    assert got == want


def test_enrich_purchases_stream_matches_batch(spark):
    from polars_ad_etl_spark.streaming import enrich_purchases_stream

    stream = read_events_stream(spark, SF_DIR)
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    _run_to_completion(
        enrich_purchases_stream(stream, customer), "enriched_out"
    )
    got = _sorted_rows(spark.sql("SELECT * FROM enriched_out"))
    want = _sorted_rows(QUERIES["events_enriched_purchases"](spark, SF_DIR))
    assert got == want


def test_user_totals_stateful_stream_matches_batch(spark):
    """applyInPandasWithState running totals: the per-user state after the
    final micro-batch must equal the batch group-by."""
    from pyspark.sql import functions as F

    from polars_ad_etl_spark.sources.star import load_events
    from polars_ad_etl_spark.streaming import user_totals_stream

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(user_totals_stream(stream), "user_totals_out", mode="update")
    # update mode emits one row per user per micro-batch; keep the last
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM user_totals_out").collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in (
            load_events(spark, SF_DIR)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.coalesce(F.sum("value"), F.lit(0.0)).alias("total_value"),
            )
            .collect()
        )
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) < 1e-6, uid


def test_attribute_purchases_stream_matches_batch(spark):
    """Stream-stream interval self-join (purchases x preceding-hour clicks)
    must emit exactly the batch range-join's pairs."""
    from polars_ad_etl_spark.streaming import attribute_purchases_stream

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(attribute_purchases_stream(stream), "attributed_out")
    got = _sorted_rows(spark.sql("SELECT * FROM attributed_out"))
    want = _sorted_rows(
        QUERIES["events_purchase_click_attribution"](spark, SF_DIR)
    )
    assert got == want


def test_daily_active_users_approx_stream_matches_batch(spark):
    """HLL sketches are deterministic for a given input set: the streaming
    approx DAU must equal the identical aggregate run in batch, and land
    within 5% of the exact DAU."""
    from polars_ad_etl_spark.sources.star import load_events
    from polars_ad_etl_spark.streaming import daily_active_users_approx_stream

    import pyspark.sql.functions as F

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(
        daily_active_users_approx_stream(stream), "dau_approx_out", mode="complete"
    )
    got = _sorted_rows(spark.sql("SELECT * FROM dau_approx_out"))

    e = load_events(spark, SF_DIR)
    want = _sorted_rows(
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("dau_approx"))
        .select(F.to_date(F.col("w").start).alias("day"), "dau_approx")
    )
    assert got == want

    exact = {
        r.day: r.dau
        for r in QUERIES["events_rolling_active_users"](spark, SF_DIR).collect()
    }
    for day, approx in got:
        assert abs(approx - exact[day]) <= max(2, 0.05 * exact[day])


def test_daily_active_users_exact_stream_finalized_days(spark):
    """Chained stateful (dedup -> windowed count) in append mode: every
    FINALIZED day (window end behind the final watermark) must match the
    oracle-checked batch DAU exactly; the trailing in-flight day is withheld
    by design."""
    from polars_ad_etl_spark.streaming import daily_active_users_stream

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(daily_active_users_stream(stream), "dau_exact_out")
    got = dict(_sorted_rows(spark.sql("SELECT * FROM dau_exact_out")))
    assert got, "no finalized day emitted"

    batch = {
        r.day: r.dau
        for r in QUERIES["events_rolling_active_users"](spark, SF_DIR).collect()
    }
    for day, dau in got.items():
        assert batch[day] == dau
    # everything except the in-flight tail must have been finalized
    assert len(got) >= len(batch) - 1


def test_stream_upsert_latest_matches_batch_cdc(spark, tmp_path):
    """The foreachBatch keyed-upsert sink must converge to exactly the
    batch CDC latest-per-key answer after the stream drains — and the
    maintained view's version ordering (ts, event_id) matches the batch
    operator's tie-proof struct ordering."""
    from polars_ad_etl_spark.sinks.incremental import stream_upsert_latest

    stream = read_events_stream(spark, SF_DIR)
    view = tmp_path / "latest_view"
    q = stream_upsert_latest(
        stream.select("user_id", "event_id", "ts", "event_type", "value"),
        view,
        key_cols=["user_id"],
        version_cols=["ts", "event_id"],
        checkpoint=tmp_path / "ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _sorted_rows(
        spark.read.parquet(str(view)).select(
            "user_id", "event_id", "event_type"
        )
    )
    want = _sorted_rows(
        QUERIES["cdc_latest_event_per_user"](spark, SF_DIR).select(
            "user_id", "event_id", "event_type"
        )
    )
    assert got == want


def test_upsert_latest_idempotent_on_replay(spark, tmp_path):
    """Replaying the same batch must not change the view (last-writer-wins
    on the version ordering makes the merge idempotent)."""
    from polars_ad_etl_spark.sinks.incremental import upsert_latest_by_key

    batch = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], ["k", "v", "payload"]
    )
    p = tmp_path / "store"
    upsert_latest_by_key(batch, p, ["k"], ["v"])
    first = _sorted_rows(spark.read.parquet(str(p)))
    upsert_latest_by_key(batch, p, ["k"], ["v"])  # replay
    assert _sorted_rows(spark.read.parquet(str(p))) == first
    # a newer version wins; an older one is ignored
    upsert_latest_by_key(
        spark.createDataFrame([(1, 30, "z"), (2, 1, "old")], ["k", "v", "payload"]),
        p, ["k"], ["v"],
    )
    rows = {r.k: (r.v, r.payload) for r in spark.read.parquet(str(p)).collect()}
    assert rows == {1: (30, "z"), 2: (5, "c")}


def test_spend_alerts_stream_modern_state_api(spark):
    """transformWithStateInPandas (the Spark 4 StatefulProcessor API):
    replaying the whole table in one batch must emit exactly one alert per
    user whose total purchase value crosses the threshold, at the final
    level, matching a batch computation.

    The state-server protocol needs google.protobuf; pbcompat resolves it
    (site-packages, else the vendored public runtime) and conftest exports
    it to the workers before the session starts. transformWithState also
    needs the RocksDB state store (multiple column families), set per-query
    here via the runtime conf."""
    from polars_ad_etl_spark.sources.star import load_events
    from polars_ad_etl_spark.streaming import read_events_stream, spend_alerts_stream

    import pyspark.sql.functions as F

    threshold = 100.0
    stream = read_events_stream(spark, SF_DIR)
    alerts = spend_alerts_stream(stream, threshold)
    assert alerts.isStreaming
    assert dict(alerts.dtypes) == {
        "user_id": "bigint",
        "alert_level": "int",
        "total_value": "double",
    }

    from conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("transformWithState needs protobuf (none resolvable)")

    key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocksdb)
    try:
        _run_to_completion(alerts, "alerts_out", mode="update")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        r.user_id: (r.alert_level, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM alerts_out").collect()
    }
    batch = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.coalesce("value", F.lit(0.0))).alias("total"))
        .collect()
    )
    want = {
        r.user_id: (int(r.total // threshold), round(r.total, 6))
        for r in batch
        if r.total >= threshold
    }
    assert set(got) == set(want)
    for uid, (lvl, total) in want.items():
        assert got[uid][0] == lvl, uid
        assert abs(got[uid][1] - total) < 1e-4, uid


def test_stream_and_batch_minhash_expressions_agree(spark):
    """The streaming ingest path computes signatures with an inline array
    expression (documents.py::_SIG_ARRAY_SQL) while the batch path builds
    the same shape through DataFrame stages (dedup.minhash_signatures,
    projection form since round 7). Both derive from the same PERMS
    constants, but the expressions are maintained separately — pin them
    element-for-element equal on real documents so neither can drift."""
    import pyspark.sql.functions as F

    from polars_ad_etl_spark.operators.dedup import K, minhash_signatures
    from polars_ad_etl_spark.streaming.documents import _SIG_ARRAY_SQL

    batch = {
        r.doc_id: tuple(r[i + 1] for i in range(K))
        for r in minhash_signatures(spark, SF_DIR).collect()
    }
    stream_expr = {
        r.doc_id: tuple(r.mh)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.expr(_SIG_ARRAY_SQL).alias("mh"))
        .filter(F.expr("mh[0] IS NOT NULL"))
        .collect()
    }
    assert len(batch) > 0
    # the stream expr yields [NULL x K] for <3-token docs (array_min over
    # an empty hash array), which the batch path drops entirely — compare
    # on the docs both produce a real signature for
    assert set(batch) == set(stream_expr)
    for doc_id, sig in batch.items():
        assert stream_expr[doc_id] == sig, doc_id


def test_pbcompat_statemessage_roundtrip():
    """The (possibly vendored) protobuf runtime must serialize/parse
    Spark's own TWS state-server messages correctly: scalar fields, a
    nested oneof, and the HandleState enum. This pins the wire behavior
    the alias package promises, without needing a streaming query."""
    from conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime resolvable")

    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="totals", schema="v DOUBLE"
            )
        ),
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    call = back.statefulProcessorCall
    assert call.WhichOneof("method") == "getValueState"
    assert call.getValueState.stateName == "totals"
    assert call.getValueState.schema == "v DOUBLE"
    resp = sm.StateResponse(statusCode=0, value=b"\x01\x02")
    got = sm.StateResponse()
    got.ParseFromString(resp.SerializeToString())
    assert got.value == b"\x01\x02"
    assert sm.HandleState.INITIALIZED == 2


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics end-to-end: rows arriving (in a later
    micro-batch) with event times older than the watermark horizon are
    EXCLUDED from the already-finalized append-mode window. This proves
    late-data handling rather than assuming it."""
    import pandas as pd

    import pyspark.sql.functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    out_name = "late_drop_out"

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        # one file per logical batch: the file source triggers per FILE, so
        # a multi-part write would split a batch across micro-batches in
        # arbitrary order and advance the watermark mid-batch
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )

    # batch 1: two hours of on-time data -> hour-10 window can finalize
    write_batch(
        "b1.parquet",
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0),
            (2, "2024-01-01 10:20:00", 2, "click", 1.0),
            (3, "2024-01-01 12:30:00", 3, "click", 1.0),  # advances watermark
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for hour 10 — watermark is already at 11:30
        write_batch(
            "b2.parquet",
            [(4, "2024-01-01 10:40:00", 4, "click", 1.0)],
        )
        q.processAllAvailable()
        # batch 3: advance far enough to flush every remaining window
        write_batch(
            "b3.parquet",
            [(5, "2024-01-01 15:00:00", 5, "click", 1.0)],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.hour_start.strftime("%H"): r.n
        for r in spark.sql(f"SELECT * FROM {out_name}").collect()
    }
    # hour 10 finalized with the two ON-TIME rows; the late row (id=4) was
    # dropped, not re-opened into a correction
    assert got.get("10") == 2
    assert got.get("12") == 1


def test_stream_incremental_agg_exactly_once(spark, tmp_path):
    """Delta-log additive aggregation: the streamed per-type totals equal
    the batch aggregate, a replayed batch cannot double-count (idempotent
    delta overwrite), and compaction preserves totals."""
    import pyspark.sql.functions as F

    from polars_ad_etl_spark.sinks.incremental import (
        compact_agg_deltas,
        read_incremental_agg,
        stream_incremental_agg,
        write_agg_delta,
    )
    from polars_ad_etl_spark.sources.star import load_events

    store = tmp_path / "agg_store"
    q = stream_incremental_agg(
        read_events_stream(spark, SF_DIR),
        store,
        key_cols=["event_type"],
        value_col="value",
        checkpoint=tmp_path / "ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def totals():
        return {
            r.event_type: (r.cnt, round(r.sum_value, 6))
            for r in read_incremental_agg(
                spark, store, ["event_type"]
            ).collect()
        }

    batch = {
        r.event_type: (r.cnt, round(r.sum_value, 6))
        for r in load_events(spark, SF_DIR)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    first = totals()
    assert first == batch

    # replay batch 0: identical partial, overwritten in place -> no change
    replay = (
        load_events(spark, SF_DIR)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    write_agg_delta(replay, store, batch_id=0)
    assert totals() == batch

    compact_agg_deltas(spark, store, ["event_type"])
    assert totals() == batch


def test_cep_funnel_stream_matches_batch(spark):
    """The keyed-state streaming CEP automaton must emit exactly the batch
    recursive-CTE/fold query's match instances when the stream drains."""
    from polars_ad_etl_spark.streaming import cep_funnel_stream

    stream = read_events_stream(spark, SF_DIR)
    _run_to_completion(cep_funnel_stream(stream), "cep_out", mode="append")
    got = _sorted_rows(spark.sql("SELECT * FROM cep_out"))
    want = _sorted_rows(QUERIES["events_cep_funnel_instances"](spark, SF_DIR))
    assert got == want
    assert got, "no match instances emitted"


def test_checkpoint_restart_recovers_exactly_once(spark, tmp_path):
    """Stop a streaming aggregation mid-stream, add more data, restart from
    the SAME checkpoint: the maintained view must equal the full batch
    answer — no lost batches, no double counting (the delta-log sink is
    idempotent under replay)."""
    from pyspark.sql import functions as F

    from polars_ad_etl_spark.sinks.incremental import (
        read_incremental_agg,
        stream_incremental_agg,
    )
    from polars_ad_etl_spark.sources.star import load_events

    events = load_events(spark, SF_DIR).select("event_id", "user_id", "value")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    src = tmp_path / "src"
    store = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    first.coalesce(1).write.mode("append").parquet(str(src))

    stream_schema = "event_id long, user_id long, value double"

    def start():
        s = spark.readStream.schema(stream_schema).parquet(str(src))
        return stream_incremental_agg(
            s, store, ["user_id"], "value", ckpt
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    second.coalesce(1).write.mode("append").parquet(str(src))
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = {
        r.user_id: (r.cnt, round(r.sum_value, 6))
        for r in read_incremental_agg(spark, store, ["user_id"]).collect()
    }
    want = {
        r.user_id: (r.cnt, round(r.sum_value, 6))
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_incremental_ingest_stream_matches_batch_layers(spark):
    """The streaming ingest must admit exactly the documents the batch
    incremental keep-list admits through its three streamable layers
    (bucket_cap=0 disables the batch-only near-batch CC layer). On the
    natural sf0.001 corpus there are no exact batch twins, so first-arrival
    and min-doc_id agree and the comparison is exact."""
    from polars_ad_etl_spark.operators.dedup import (
        dedup_incremental_ingest_admitted,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream,
        read_documents_stream,
    )

    # precondition the exact comparison relies on: no two batch docs share
    # a content hash in this corpus (else first-arrival vs min-doc_id could
    # legitimately disagree on WHICH twin survives) — assert it so a future
    # testdata regeneration fails loudly instead of flaking
    from pyspark.sql import functions as F

    from polars_ad_etl_spark.operators.dedup import _incr_is_batch

    dup_cks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(_incr_is_batch(F.col("doc_id")))
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("ck"))
        .count()
        .filter("ck IS NOT NULL AND count > 1")
        .count()
    )
    assert dup_cks == 0, "testdata now has exact batch twins; compare by ck"

    ck, bk = corpus_indexes(spark, SF_DIR)
    stream = read_documents_stream(spark, SF_DIR)
    _run_to_completion(
        incremental_ingest_stream(stream, ck, bk), "ingest_out"
    )
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM ingest_out").collect()}
    # the oracle-checked batch twin of the stream's admission semantics
    want = {
        r.doc_id
        for r in dedup_incremental_ingest_admitted(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_incremental_ingest_stream_state_across_batches(spark, tmp_path):
    """Cross-micro-batch state: a planted corpus/batch split streamed as two
    files (modification times pin the processing order) must drop an exact
    twin that arrives in a LATER micro-batch than its first occurrence,
    drop exact/near corpus matches, and keep NULL-text docs (surrogate key:
    Spark's null-equal grouping must not collapse them)."""
    import hashlib
    import os
    import time

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream,
        read_documents_stream,
    )

    def is_batch(doc_id):
        h = int(
            hashlib.md5(f"{_INCR_SALT}{doc_id}".encode()).hexdigest()[:8], 16
        )
        return h % 1000 >= INCR_SPLIT_PERMILLE

    cids = [i for i in range(1, 200) if not is_batch(i)]
    bids = [i for i in range(1, 200) if is_batch(i)]
    t_shared = "the quick brown fox jumps over the lazy sleeping dog today"
    t_twin = "an entirely different batch story about seven silver ships sailing"

    def write(rows, path):
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(path)

    # the file source does not recurse into nested directories, so each
    # micro-batch is one FLAT part file copied into the stream dir
    import glob as _glob
    import shutil

    d = f"{tmp_path}/stream_src/documents.parquet"
    os.makedirs(d)
    now = time.time()
    for name, rows, when in (
        ("f0", [(bids[0], t_shared), (bids[2], t_twin), (bids[6], None)],
         now - 60),
        ("f1", [(bids[3], t_twin),
                (bids[1], t_shared.replace(" fox ", "  fox ")),
                (bids[7], None)], now - 30),
    ):
        w = f"{tmp_path}/w_{name}"
        write(rows, w)
        part = _glob.glob(f"{w}/part-*.parquet")[0]
        dst = f"{d}/{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (when, when))

    # static corpus from a separate dir (the established corpus)
    corpus_dir = f"{tmp_path}/corpus"
    write(
        [(cids[0], t_shared),
         (cids[1], "a corpus only story never repeated anywhere else at all")],
        f"{corpus_dir}/documents.parquet",
    )
    ck, bk = corpus_indexes(spark, corpus_dir)

    stream = read_documents_stream(
        spark, f"{tmp_path}/stream_src", max_files_per_trigger=1
    )
    _run_to_completion(
        incremental_ingest_stream(stream, ck, bk), "ingest_state_out"
    )
    got = {
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM ingest_state_out").collect()
    }
    # b0 exact-vs-corpus, b1 near-vs-corpus, b3 exact twin of b2 from the
    # EARLIER micro-batch; both NULL-text docs kept
    assert got == {bids[2], bids[6], bids[7]}


def test_incremental_ingest_checkpoint_restart(spark, tmp_path):
    """Stop the ingest stream, deliver more files, restart from the SAME
    checkpoint: the dropDuplicates state must survive (an exact twin of a
    pre-restart admission stays dropped), and the file sink must hold each
    admitted doc exactly once (no replay duplicates)."""
    import hashlib

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream,
        read_documents_stream,
    )

    def is_batch(doc_id):
        h = int(
            hashlib.md5(f"{_INCR_SALT}{doc_id}".encode()).hexdigest()[:8], 16
        )
        return h % 1000 >= INCR_SPLIT_PERMILLE

    cids = [i for i in range(1, 200) if not is_batch(i)]
    bids = [i for i in range(1, 200) if is_batch(i)]
    t_twin = "an entirely different batch story about seven silver ships sailing"

    def write_flat(rows, dst):
        import glob as _glob
        import os
        import shutil

        w = f"{tmp_path}/w_{os.path.basename(dst)}"
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(w)
        shutil.copy(_glob.glob(f"{w}/part-*.parquet")[0], dst)

    import os

    src = f"{tmp_path}/restart_src/documents.parquet"
    out = f"{tmp_path}/admitted"
    ckpt = f"{tmp_path}/ckpt"
    os.makedirs(src)

    corpus_dir = f"{tmp_path}/corpus"
    os.makedirs(corpus_dir)
    # corpus is a single-file table in its own dir
    write_flat(
        [(cids[0], "a corpus only story never repeated anywhere else at all")],
        f"{corpus_dir}/documents.parquet",
    )
    ck, bk = corpus_indexes(spark, corpus_dir)

    def start():
        stream = read_documents_stream(
            spark, f"{tmp_path}/restart_src", max_files_per_trigger=1
        )
        return (
            incremental_ingest_stream(stream, ck, bk)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write_flat(
        [(bids[0], t_twin), (bids[1], "a first unique document here")],
        f"{src}/f0.parquet",
    )
    q = start()
    q.processAllAvailable()
    q.stop()

    # post-restart file: an exact twin of the PRE-restart admission plus a
    # genuinely new doc
    write_flat(
        [(bids[2], t_twin), (bids[3], "a second unique document arrives")],
        f"{src}/f1.parquet",
    )
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    admitted = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(admitted) == sorted([bids[0], bids[1], bids[3]])
    assert len(admitted) == len(set(admitted))  # exactly-once across restart


def _split_ids(n: int, batch_side: bool):
    """doc_ids on one side of the deterministic incremental split, in id
    order (batch_side=True: the new-batch half the ingest stream keeps)."""
    import hashlib

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )

    out = []
    i = 1
    while len(out) < n:
        h = int(
            hashlib.md5(f"{_INCR_SALT}{i}".encode()).hexdigest()[:8], 16
        )
        if (h % 1000 >= INCR_SPLIT_PERMILLE) == batch_side:
            out.append(i)
        i += 1
    return out


def _batch_ids(n: int):
    return _split_ids(n, batch_side=True)


def test_incremental_ingest_bounded_matches_unbounded_within_horizon(spark):
    """With a horizon wider than the replay (everything arrives within
    seconds), the bounded twin must admit EXACTLY the same doc set as the
    unbounded twin's oracle-checked batch equivalent — the corpus layers
    are shared code and the watermarked layer-1 must not change behavior
    inside the horizon."""
    from polars_ad_etl_spark.operators.dedup import (
        dedup_incremental_ingest_admitted,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream_bounded,
        read_documents_stream,
    )

    ck, bk = corpus_indexes(spark, SF_DIR)
    stream = read_documents_stream(spark, SF_DIR)
    _run_to_completion(
        incremental_ingest_stream_bounded(stream, ck, bk, horizon="60 minutes"),
        "ingest_bounded_out",
    )
    got = {
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM ingest_bounded_out").collect()
    }
    want = {
        r.doc_id
        for r in dedup_incremental_ingest_admitted(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_incremental_ingest_bounded_state_evicts(spark, tmp_path):
    """The production claim of the bounded twin, asserted end-to-end:

    - a twin arriving WITHIN the horizon of its first occurrence is
      dropped (same as the unbounded twin);
    - once the watermark passes first-seen + horizon the key is EVICTED:
      state rows plateau below the total distinct-key count (the unbounded
      twin's state is exactly that count), and a far-apart twin is
      READMITTED — the documented trade-off the corpus-compaction contract
      absorbs.

    Event time is arrival (current_timestamp, pinned per micro-batch), so
    the wall sleeps between file drops ARE the event-time gaps; all
    margins are >2x the 2-second horizon to be regime-proof."""
    import glob as _glob
    import os
    import shutil
    import time

    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream_bounded,
        read_documents_stream,
    )

    ids = iter(_batch_ids(400))
    t_twin = "seven silver ships sailing slowly southward tonight again"

    def write_flat(rows, dst):
        w = f"{tmp_path}/w_{os.path.basename(dst)}"
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(w)
        shutil.copy(_glob.glob(f"{w}/part-*.parquet")[0], dst)

    def fillers(n, tag):
        return [
            (next(ids), f"unique filler {tag} number {k} about topic {tag}{k}")
            for k in range(n)
        ]

    src = f"{tmp_path}/bounded_src/documents.parquet"
    os.makedirs(src)
    corpus_dir = f"{tmp_path}/corpus"
    os.makedirs(corpus_dir)
    write_flat(
        [(_split_ids(1, batch_side=False)[0],
          "a corpus only story never repeated anywhere else at all")],
        f"{corpus_dir}/documents.parquet",
    )
    ck, bk = corpus_indexes(spark, corpus_dir)

    stream = read_documents_stream(
        spark, f"{tmp_path}/bounded_src", max_files_per_trigger=1
    )
    q = (
        incremental_ingest_stream_bounded(stream, ck, bk, horizon="2 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bounded_evict_out")
        .start()
    )
    try:
        a0 = next(ids)
        write_flat([(a0, t_twin)] + fillers(50, "f0"), f"{src}/f0.parquet")
        q.processAllAvailable()
        # twin within horizon: the f1 batch's watermark derives from f0's
        # event time, so a0's key is still live no matter the wall gap
        a1 = next(ids)
        write_flat([(a1, t_twin)] + fillers(50, "f1"), f"{src}/f1.parquet")
        q.processAllAvailable()
        # push the watermark past f0/f1 expiry (gap 5s >> horizon 2s),
        # then once more so the eviction is applied and a far twin lands
        time.sleep(5)
        write_flat(fillers(50, "f2"), f"{src}/f2.parquet")
        q.processAllAvailable()
        time.sleep(5)
        a3 = next(ids)
        write_flat([(a3, t_twin)] + fillers(50, "f3"), f"{src}/f3.parquet")
        q.processAllAvailable()
        progresses = list(q.recentProgress)
    finally:
        q.stop()

    got = {
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM bounded_evict_out").collect()
    }
    assert a0 in got, "first occurrence admitted"
    assert a1 not in got, "twin within horizon must be dropped"
    assert a3 in got, "twin beyond horizon is readmitted (documented)"

    # state plateau: distinct keys ever seen = 201 (50 fillers per file x4
    # plus the shared twin key — a1/a3 share a0's content key); the
    # unbounded twin's state would hold all 201 forever, the bounded store
    # must sit well under that after eviction
    state_rows = [
        sum(s["numRowsTotal"] for s in (p.get("stateOperators") or []))
        for p in progresses
        if p.get("numInputRows", 0) > 0
    ]
    assert state_rows, "no data batches recorded"
    total_distinct = 201
    assert max(state_rows) < total_distinct, (
        f"state never evicted: {state_rows}"
    )
    assert state_rows[-1] < total_distinct * 0.75, (
        f"final state not bounded: {state_rows}"
    )


def test_incremental_ingest_bounded_checkpoint_restart(spark, tmp_path):
    """Restart the BOUNDED ingest from its checkpoint mid-stream: the
    watermarked dedup state must survive (a within-horizon twin delivered
    after the restart stays dropped) and the sink holds each admitted doc
    exactly once."""
    import glob as _glob
    import os
    import shutil

    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_stream_bounded,
        read_documents_stream,
    )

    ids = _batch_ids(6)
    t_twin = "an entirely different batch story about seven silver ships sailing"

    def write_flat(rows, dst):
        w = f"{tmp_path}/w_{os.path.basename(dst)}"
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(w)
        shutil.copy(_glob.glob(f"{w}/part-*.parquet")[0], dst)

    src = f"{tmp_path}/restart_src/documents.parquet"
    out = f"{tmp_path}/admitted"
    ckpt = f"{tmp_path}/ckpt"
    os.makedirs(src)
    corpus_dir = f"{tmp_path}/corpus"
    os.makedirs(corpus_dir)
    write_flat(
        [(_split_ids(1, batch_side=False)[0],
          "a corpus only story never repeated anywhere else at all")],
        f"{corpus_dir}/documents.parquet",
    )
    ck, bk = corpus_indexes(spark, corpus_dir)

    def start():
        stream = read_documents_stream(
            spark, f"{tmp_path}/restart_src", max_files_per_trigger=1
        )
        return (
            incremental_ingest_stream_bounded(
                stream, ck, bk, horizon="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write_flat(
        [(ids[0], t_twin), (ids[1], "a first unique document here")],
        f"{src}/f0.parquet",
    )
    q = start()
    q.processAllAvailable()
    q.stop()

    write_flat(
        [(ids[2], t_twin), (ids[3], "a second unique document arrives")],
        f"{src}/f1.parquet",
    )
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    admitted = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(admitted) == sorted([ids[0], ids[1], ids[3]])
    assert len(admitted) == len(set(admitted))


def test_incremental_decisions_match_batch_labels(spark, tmp_path):
    """The foreachBatch LABELED admission twin must reproduce the batch
    keep-list's precedence labels doc for doc on a replayed file stream —
    modulo the near_batch layer, which belongs to the batch compaction by
    design (lambda split): docs the batch path labels near_batch must
    stream as kept, every other label must match exactly."""
    from polars_ad_etl_spark.operators.dedup import (
        dedup_incremental_keep_list,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_decisions,
        read_documents_stream,
    )

    ck, bk = corpus_indexes(spark, SF_DIR)
    stream = read_documents_stream(spark, SF_DIR)
    q = incremental_ingest_decisions(
        stream, ck, bk,
        out_dir=f"{tmp_path}/decisions",
        seen_dir=f"{tmp_path}/seen",
        checkpoint=f"{tmp_path}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.reason, r.keep)
        for r in spark.read.parquet(f"{tmp_path}/decisions").collect()
    }
    want = {
        r.doc_id: (r.reason, r.keep)
        for r in dedup_incremental_keep_list(spark, SF_DIR).collect()
    }
    assert set(got) == set(want) and got
    for doc_id, (reason, keep) in want.items():
        if reason == "near_batch":
            assert got[doc_id] == ("kept", True), doc_id
        else:
            assert got[doc_id] == (reason, keep), doc_id


def test_incremental_decisions_state_across_batches(spark, tmp_path):
    """Cross-micro-batch labeling: a twin of an earlier micro-batch's doc
    must label exact_batch via the lake-resident seen-index — INCLUDING a
    twin of a doc the earlier batch itself dropped as near_corpus (the
    batch min-doc rule ranks exact_batch above the near layers)."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import time

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_decisions,
        read_documents_stream,
    )

    def is_batch(doc_id):
        h = int(
            hashlib.md5(f"{_INCR_SALT}{doc_id}".encode()).hexdigest()[:8], 16
        )
        return h % 1000 >= INCR_SPLIT_PERMILLE

    cids = [i for i in range(1, 200) if not is_batch(i)]
    bids = [i for i in range(1, 200) if is_batch(i)]
    t_corpus = "the quick brown fox jumps over the lazy sleeping dog today"
    t_near = t_corpus.replace(" fox ", "  fox ")
    t_new = "an entirely different batch story about seven silver ships sailing"

    def write(rows, path):
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(path)

    d = f"{tmp_path}/stream_src/documents.parquet"
    os.makedirs(d)
    now = time.time()
    for name, rows, when in (
        # batch 0: one corpus exact twin, one near-corpus doc, one new doc
        ("f0", [(bids[0], t_corpus), (bids[1], t_near), (bids[2], t_new)],
         now - 60),
        # batch 1: exact twins of the near-corpus doc AND of the new doc
        ("f1", [(bids[3], t_near), (bids[4], t_new)], now - 30),
    ):
        w = f"{tmp_path}/w_{name}"
        write(rows, w)
        part = _glob.glob(f"{w}/part-*.parquet")[0]
        dst = f"{d}/{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (when, when))

    corpus_dir = f"{tmp_path}/corpus"
    write([(cids[0], t_corpus)], f"{corpus_dir}/documents.parquet")
    ck, bk = corpus_indexes(spark, corpus_dir)
    stream = read_documents_stream(
        spark, f"{tmp_path}/stream_src", max_files_per_trigger=1
    )
    q = incremental_ingest_decisions(
        stream, ck, bk,
        out_dir=f"{tmp_path}/decisions",
        seen_dir=f"{tmp_path}/seen",
        checkpoint=f"{tmp_path}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{tmp_path}/decisions").collect()
    }
    assert got == {
        bids[0]: "exact_corpus",
        bids[1]: "near_corpus",
        bids[2]: "kept",
        bids[3]: "exact_batch",  # twin of a DROPPED doc: still exact_batch
        bids[4]: "exact_batch",
    }


def test_incremental_decisions_checkpoint_restart(spark, tmp_path):
    """Restart from the same checkpoint: decisions already adjudicated must
    appear exactly once (idempotent batch_id-partitioned overwrite), and a
    post-restart twin of a pre-restart doc must still label exact_batch
    (the seen-index lives in the lake, outliving the stop)."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import time

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        incremental_ingest_decisions,
        read_documents_stream,
    )

    def is_batch(doc_id):
        h = int(
            hashlib.md5(f"{_INCR_SALT}{doc_id}".encode()).hexdigest()[:8], 16
        )
        return h % 1000 >= INCR_SPLIT_PERMILLE

    cids = [i for i in range(1, 200) if not is_batch(i)]
    bids = [i for i in range(1, 200) if is_batch(i)]
    t_a = "first unique document text about mountains and rivers flowing"
    t_b = "second unique document text regarding oceans and tides turning"

    def write(rows, path):
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(path)

    d = f"{tmp_path}/stream_src/documents.parquet"
    os.makedirs(d)
    w0 = f"{tmp_path}/w_f0"
    write([(bids[0], t_a)], w0)
    shutil.copy(_glob.glob(f"{w0}/part-*.parquet")[0], f"{d}/f0.parquet")
    os.utime(f"{d}/f0.parquet", (time.time() - 60,) * 2)

    corpus_dir = f"{tmp_path}/corpus"
    write([(cids[0], "corpus only text that matches nothing else here")],
          f"{corpus_dir}/documents.parquet")
    ck, bk = corpus_indexes(spark, corpus_dir)

    def start():
        return incremental_ingest_decisions(
            read_documents_stream(
                spark, f"{tmp_path}/stream_src", max_files_per_trigger=1
            ),
            ck, bk,
            out_dir=f"{tmp_path}/decisions",
            seen_dir=f"{tmp_path}/seen",
            checkpoint=f"{tmp_path}/ckpt",
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # deliver: a twin of the pre-restart doc + a new doc, then restart
    w1 = f"{tmp_path}/w_f1"
    write([(bids[1], t_a), (bids[2], t_b)], w1)
    shutil.copy(_glob.glob(f"{w1}/part-*.parquet")[0], f"{d}/f1.parquet")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(f"{tmp_path}/decisions").collect()
    assert len(rows) == len({r.doc_id for r in rows}) == 3
    got = {r.doc_id: r.reason for r in rows}
    assert got == {
        bids[0]: "kept",
        bids[1]: "exact_batch",
        bids[2]: "kept",
    }


def test_doc_seen_index_read_failure_propagates(spark, tmp_path):
    """Round-11 advice (low), document twin of the embeddings pin: a
    corrupt/unreadable seen-index on a mid-stream batch must propagate —
    only a MISSING/EMPTY directory means 'first batch'."""
    import os as _os

    import pytest as _pytest

    from polars_ad_etl_spark.streaming import corpus_indexes
    from polars_ad_etl_spark.streaming.documents import _admit_batch

    corpus_dir = f"{tmp_path}/corpus"
    spark.createDataFrame(
        [(1, "corpus text about rivers", "en", "synthetic", 24)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{corpus_dir}/documents.parquet")
    ck, bk = corpus_indexes(spark, corpus_dir)
    out, seen = f"{tmp_path}/decisions", f"{tmp_path}/seen"
    bad = f"{seen}/batch_id=0"
    _os.makedirs(bad)
    with open(f"{bad}/part-00000.parquet", "wb") as f:
        f.write(b"not a parquet file")
    b = spark.createDataFrame(
        [(2, "new text about mountains", "en", "synthetic", 24)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with _pytest.raises(Exception):
        _admit_batch(b, 1, ck, bk, out, seen)
    assert not _os.path.isdir(out)


def test_incremental_decisions_same_batch_replay(spark, tmp_path):
    """Crash-replay idempotency (round-10 advice, high): foreachBatch
    re-executes a micro-batch with the SAME batch_id when the failure lands
    after the sink writes but before the checkpoint commit. By then the
    batch's own hashes are already in the seen-index, so an unfiltered seen
    read would relabel every replayed doc exact_batch/keep=false and the
    dynamic overwrite would REPLACE the correct decisions with wrong ones.
    Re-invoking the admission with the same batch_id must reproduce
    byte-identical decisions."""
    import hashlib

    from polars_ad_etl_spark.operators.dedup import (
        INCR_SPLIT_PERMILLE,
        _INCR_SALT,
    )
    from polars_ad_etl_spark.streaming import corpus_indexes
    from polars_ad_etl_spark.streaming.documents import _admit_batch

    def is_batch(doc_id):
        h = int(
            hashlib.md5(f"{_INCR_SALT}{doc_id}".encode()).hexdigest()[:8], 16
        )
        return h % 1000 >= INCR_SPLIT_PERMILLE

    cids = [i for i in range(1, 200) if not is_batch(i)]
    bids = [i for i in range(1, 200) if is_batch(i)]
    t_a = "unique replay text concerning glaciers calving into fjords below"
    t_b = "another replay text on deserts shifting under midnight winds"
    t_corpus = "corpus resident replay text about forests regrowing after fire"

    def frame(rows):
        return spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in rows],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )

    corpus_dir = f"{tmp_path}/corpus"
    frame([(cids[0], t_corpus)]).coalesce(1).write.parquet(
        f"{corpus_dir}/documents.parquet"
    )
    ck, bk = corpus_indexes(spark, corpus_dir)

    out, seen = f"{tmp_path}/decisions", f"{tmp_path}/seen"
    # batch 0: a kept doc + its within-batch twin + a corpus twin
    b0 = frame([(bids[0], t_a), (bids[1], t_a), (bids[2], t_corpus)])
    _admit_batch(b0, 0, ck, bk, out, seen)
    first = {
        r.doc_id: (r.reason, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    assert first == {
        bids[0]: ("kept", True),
        bids[1]: ("exact_batch", False),
        bids[2]: ("exact_corpus", False),
    }
    # crash-replay: identical batch, identical batch_id
    _admit_batch(b0, 0, ck, bk, out, seen)
    replayed = {
        r.doc_id: (r.reason, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    assert replayed == first
    # and a LATER batch still sees batch 0's hashes (the filter is
    # batch_id < current, not batch_id != current)
    _admit_batch(frame([(bids[3], t_a), (bids[4], t_b)]), 1, ck, bk, out, seen)
    after = {
        r.doc_id: r.reason for r in spark.read.parquet(out).collect()
    }
    assert after[bids[3]] == "exact_batch" and after[bids[4]] == "kept"


def test_persisted_corpus_indexes(spark, tmp_path):
    """The materialized static-side indexes (corpus_indexes_persisted) must
    be row-identical to the derived ones, be reused without recompute on a
    second call (artifact untouched — mtime-keyed like every derived
    layout), and go stale when the source file's mtime moves."""
    import os
    import shutil

    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        corpus_indexes_persisted,
    )

    ck_d, bk_d = corpus_indexes(spark, SF_DIR)
    ck_p, bk_p = corpus_indexes_persisted(spark, SF_DIR)
    assert sorted(map(tuple, ck_d.collect())) == sorted(
        map(tuple, ck_p.collect())
    )
    assert sorted(map(tuple, bk_d.collect())) == sorted(
        map(tuple, bk_p.collect())
    )
    # reuse: the artifact files are untouched by a second call
    src_file = next(
        p for p in ck_p.inputFiles() if p.endswith(".parquet")
    ).replace("file:", "")
    before = os.path.getmtime(src_file)
    corpus_indexes_persisted(spark, SF_DIR)
    assert os.path.getmtime(src_file) == before
    # staleness: a touched source file keys a different artifact
    twin = tmp_path / "sf"
    twin.mkdir()
    shutil.copyfile(
        f"{SF_DIR}/documents.parquet", twin / "documents.parquet"
    )
    d1 = corpus_indexes_persisted(spark, str(twin))[0].inputFiles()
    os.utime(twin / "documents.parquet", ns=(1, 1))
    d2 = corpus_indexes_persisted(spark, str(twin))[0].inputFiles()
    assert set(d1) != set(d2)


def test_decisions_identical_with_persisted_indexes(spark, tmp_path):
    """The admission pipeline must adjudicate identically whether its
    static side is derived or materialized — the persisted variant exists
    so a 100 TB deployment doesn't rescan the corpus every micro-batch
    (stream-static joins re-evaluate the static side per trigger)."""
    from polars_ad_etl_spark.streaming import (
        corpus_indexes,
        corpus_indexes_persisted,
        incremental_ingest_decisions,
        read_documents_stream,
    )

    results = {}
    for label, (ck, bk) in (
        ("derived", corpus_indexes(spark, SF_DIR)),
        ("persisted", corpus_indexes_persisted(spark, SF_DIR)),
    ):
        q = incremental_ingest_decisions(
            read_documents_stream(spark, SF_DIR), ck, bk,
            out_dir=f"{tmp_path}/{label}/decisions",
            seen_dir=f"{tmp_path}/{label}/seen",
            checkpoint=f"{tmp_path}/{label}/ckpt",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        results[label] = {
            r.doc_id: (r.reason, r.keep)
            for r in spark.read.parquet(
                f"{tmp_path}/{label}/decisions"
            ).collect()
        }
    assert results["derived"] == results["persisted"] and results["derived"]


def test_stateful_user_totals_state_bounded_per_key(spark, tmp_path):
    """Round-13 pinned bound (guide §2.6/§4.5 checklist): the
    applyInPandasWithState running-totals operator keeps EXACTLY ONE tiny
    state row per distinct key, however many micro-batches re-deliver the
    same keys. A leak (state rows scaling with batches x keys, or bytes
    per key growing with event count) is the classic way keyed streaming
    state kills a 100 TB pipeline; this pins the bound end-to-end via the
    engine's own stateOperators progress metrics."""
    import glob as _glob
    import os
    import shutil

    from polars_ad_etl_spark.sources.star import load_events
    from polars_ad_etl_spark.streaming import (
        read_events_stream,
        user_totals_stream,
    )

    # split the static events into 4 chunk files so the same users recur
    # across micro-batches (the sf dir ships ONE file = one trigger)
    src = f"{tmp_path}/events_chunks/events.parquet"
    os.makedirs(src)
    ev = load_events(spark, SF_DIR)
    n_users = ev.select("user_id").distinct().count()
    w = f"{tmp_path}/chunks_w"
    ev.repartition(4).write.mode("overwrite").parquet(w)
    for i, f in enumerate(sorted(_glob.glob(f"{w}/part-*.parquet"))):
        shutil.copy(f, f"{src}/chunk{i}.parquet")

    stream = read_events_stream(
        spark, f"{tmp_path}/events_chunks", max_files_per_trigger=1
    )
    q = (
        user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_bound_out")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p["stateOperators"]]
    finally:
        q.stop()

    assert len(progress) >= 4  # one per chunk file
    rows_per_batch = [
        p["stateOperators"][0]["numRowsTotal"] for p in progress
    ]
    # the bound: state rows never exceed the distinct-key count, and the
    # final batch holds exactly one row per key — NOT keys x batches
    assert max(rows_per_batch) <= n_users
    assert rows_per_batch[-1] == n_users
    # bytes per key stay O(1): the state schema is two scalars, so even
    # with a generous per-row overhead allowance the average must stay
    # far below anything event-count-shaped (events/user ~ hundreds)
    bytes_last = progress[-1]["stateOperators"][0]["memoryUsedBytes"]
    assert bytes_last / max(n_users, 1) < 4096
