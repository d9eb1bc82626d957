"""Streaming incremental ingest: the stream-static twin of the batch
``dedup_incremental_keep_list`` (operators/dedup.py).

Production shape: new documents arrive continuously; each must clear the
same first three drop layers as the batch path — exact-vs-corpus,
exact-vs-earlier-arrivals, near-vs-corpus — before entering the corpus.
The corpus contributes the SAME two static indexes as the batch path (its
distinct content hashes and distinct LSH bucket keys), joined stream-static;
arrival-order state replaces the batch min-doc_id rule for within-stream
exact dups. The fourth batch layer (near-dup WITHIN the new data,
connected components) is deliberately absent: component collapse is a
global fixpoint and belongs to the periodic batch compaction, not the
ingest stream — the standard lambda split, noted here so nobody expects
the stream to do it.

The per-document MinHash signature is computed as a PROJECTION (one
let-bound SQL expression per row: tokens -> 3-gram shingles -> 32-bit
portable hashes -> K permutation minima), because streaming cannot run the
batch path's explode+groupBy signature plan without a watermarked
aggregate. Semantics match the batch signature exactly for docs with >= 3
tokens; shorter docs get NULL minima, which join nothing — the same
"never near-anything" outcome as their absence from the batch bucket
index.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_ad_etl_spark.functions.hashing import MERSENNE_P
from polars_ad_etl_spark.sources.star import read_star_parquet
from polars_ad_etl_spark.operators.dedup import (
    BANDS,
    PERMS,
    ROWS_PER_BAND,
    _banded_keys,
    _incr_is_batch,
    minhash_signatures,
)
from polars_ad_etl_spark.streaming.events import _dir_has_parquet, _is_directory

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# Per-row signature as one parsed SQL expression. Every intermediate
# (tokens, shingles, shingle hashes) is let-bound via single-element
# transform so it evaluates exactly once per row (the CollapseProject
# lambda-inlining trap — see dedup._SHINGLES_SPARK).
_HASH32_SQL = "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)"

_SIG_ARRAY_SQL = (
    "transform(array(filter(split(lower(trim(text)), '\\\\s+'), x -> x != '')), t -> "
    "transform(array(CASE WHEN size(t) >= 3 THEN "
    "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])) "
    "ELSE array() END), sh -> "
    f"transform(array(transform(sh, s -> {_HASH32_SQL})), hs -> "
    "array("
    + ", ".join(
        f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {MERSENNE_P}L))"
        for a, b in PERMS
    )
    + "))[0])[0])[0]"
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the documents parquet (in production: the
    ingest queue — same downstream plan). Explicit schema, directory vs
    single-file layout probed the same way as the events stream."""
    reader = spark.readStream.schema(_DOCS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    path = f"{sf_dir}/documents.parquet"
    if _is_directory(spark, path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(
        str(sf_dir)
    )


def corpus_indexes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The two static corpus-side indexes the ingest stream joins against:
    distinct content hashes and distinct per-band LSH bucket keys of the
    CORPUS half of the hash split. In production both are persisted tables
    maintained by the batch compaction job; here they are derived from the
    same deterministic split as the batch path, so stream and batch agree
    doc for doc."""
    d = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    corpus_ck = (
        d.filter(~_incr_is_batch(F.col("doc_id")))
        .select(F.md5(F.lower(F.trim("text"))).alias("ck"))
        .filter(F.col("ck").isNotNull())
        .distinct()
    )
    sigs = minhash_signatures(spark, sf_dir).filter(
        ~_incr_is_batch(F.col("doc_id"))
    )
    corpus_bk = (
        _banded_keys(sigs)
        .select("band", *[f"h{r}" for r in range(ROWS_PER_BAND)])
        .distinct()
    )
    return corpus_ck, corpus_bk


def corpus_indexes_persisted(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The same two corpus-side indexes as :func:`corpus_indexes`,
    MATERIALIZED: a stream-static join re-evaluates its static side every
    micro-batch, so a derived index is a full corpus scan per trigger —
    fine on a test corpus, a scale-killer at 100 TB. This variant computes
    each index once per (documents file, mtime) into the uid-keyed private
    cache (atomic publish, same hardening as every derived layout) and
    hands back parquet readers: the per-trigger static-side cost drops to
    a small parquet read, and the artifacts are exactly the tables the
    periodic compaction maintains in production. Output-equivalent to the
    derived variant by construction (pinned by
    tests/test_streaming.py::test_persisted_corpus_indexes)."""
    import hashlib

    from polars_ad_etl_spark.cache import private_cache_root, publish_dir

    src = Path(f"{sf_dir}/documents.parquet")
    key = f"{src.resolve()}:{src.stat().st_mtime_ns}"
    root = private_cache_root("spark_graft_stream_indexes")
    out = root / f"docs_{hashlib.md5(key.encode()).hexdigest()[:12]}"
    if not (out / "_PUBLISHED").exists():
        ck, bk = corpus_indexes(spark, sf_dir)
        with publish_dir(out) as tmp:
            ck.write.mode("overwrite").parquet(str(tmp / "ck"))
            bk.write.mode("overwrite").parquet(str(tmp / "bk"))
            (tmp / "_PUBLISHED").write_text("", encoding="utf-8")
    return (
        spark.read.parquet(str(out / "ck")),
        spark.read.parquet(str(out / "bk")),
    )


def _prep_ingest(docs: DataFrame) -> DataFrame:
    """Shared layer-0 prep for both ingest twins: restrict to the new-batch
    half of the split, derive the content hash, and give NULL-text docs a
    per-doc surrogate key so Spark's null-keys-are-equal grouping cannot
    collapse them (the batch layer treats NULL content as equal to
    nothing)."""
    s = docs.filter(_incr_is_batch(F.col("doc_id"))).select(
        "*", F.md5(F.lower(F.trim("text"))).alias("ck")
    )
    return s.withColumn(
        "ck2", F.coalesce("ck", F.concat(F.lit("∅"), F.col("doc_id")))
    )


def _with_near_corpus_flag(s: DataFrame, corpus_bk: DataFrame) -> DataFrame:
    """Append the near-vs-corpus probe as a BOOLEAN column ``near_hit``:
    the row's banded signature minima against the static bucket-key index,
    one broadcast left join per band (key-distinct, so no row
    multiplication), hit when ANY band collides. Shared by the drop path
    (filters on it) and the labeled-decisions path (labels with it)."""
    s = s.withColumn("mh", F.expr(_SIG_ARRAY_SQL))
    for j in range(BANDS):
        bk_j = corpus_bk.filter(F.col("band") == j).select(
            *[F.col(f"h{r}").alias(f"b{j}h{r}") for r in range(ROWS_PER_BAND)],
            F.lit(1).alias(f"hit{j}"),
        )
        cond = None
        for r in range(ROWS_PER_BAND):
            c = F.element_at("mh", j * ROWS_PER_BAND + r + 1) == F.col(
                f"b{j}h{r}"
            )
            cond = c if cond is None else cond & c
        s = s.join(F.broadcast(bk_j), cond, "left_outer").drop(
            *[f"b{j}h{r}" for r in range(ROWS_PER_BAND)]
        )
    near = None
    for j in range(BANDS):
        c = F.col(f"hit{j}").isNotNull()
        near = c if near is None else near | c
    return s.withColumn("near_hit", near).drop(
        "mh", *[f"hit{j}" for j in range(BANDS)]
    )


def _corpus_drop_layers(
    s: DataFrame, corpus_ck: DataFrame, corpus_bk: DataFrame
) -> DataFrame:
    """Shared layers 2-3 for both ingest twins: exact-vs-corpus anti join
    on the hash index, then the per-band near-vs-corpus probe against the
    static bucket-key index."""
    s = s.join(corpus_ck, "ck", "left_anti")
    # the md5-per-shingle signature projection comes AFTER the exact
    # layers on purpose: rows dropped on the 16-byte content key alone
    # (the bulk, on a duplicate-heavy stream) never pay for it, and the
    # stateful Deduplicate operator above would otherwise force it to run
    # pre-state for every arriving row
    s = _with_near_corpus_flag(s, corpus_bk)
    return (
        s.filter(~F.col("near_hit"))
        .select("doc_id", "text", "lang", "source", "n_chars", "ck")
    )


def incremental_ingest_stream(
    docs: DataFrame, corpus_ck: DataFrame, corpus_bk: DataFrame
) -> DataFrame:
    """New-batch documents that survive the three streamable drop layers —
    the rows an ingest job appends to the corpus.

    1. within-stream exact dedup: ``dropDuplicates`` on the content hash
       (first arrival wins — the streaming analogue of the batch min-id
       rule). State is one 16-byte key per distinct document ever seen —
       the same index the corpus side keeps anyway — and it is UNBOUNDED:
       it grows with the distinct-document count for the stream's
       lifetime. For a forever-running ingest, either restart per
       compaction window (the checkpoint-restart test's model: the
       admitted hashes fold into the corpus index, state resets) or use
       :func:`incremental_ingest_stream_bounded` — the SHIPPED
       watermarked twin whose ``dropDuplicatesWithinWatermark`` state is
       bounded by horizon x arrival rate, at the cost of readmitting
       twins that arrive farther apart than the horizon (both behaviors
       pinned by tests/test_streaming.py).
       Batch-equivalence caveat: the batch twin keeps the MIN doc_id of
       an exact-twin group while this layer keeps the FIRST ARRIVAL; the
       two agree on which doc_id is admitted only when arrival order
       follows doc_id order (true for the replay sources here). The SET
       of admitted content is identical either way — only the surviving
       representative's id can differ.
    2. exact-vs-corpus: stream-static LEFT ANTI join on the hash index.
    3. near-vs-corpus: the row's banded signature minima against the
       static bucket-key index, one stream-static left join per band
       (key-distinct, so no row multiplication), dropped if ANY band
       collides. Docs under 3 tokens have NULL minima and join nothing.
    """
    s = _prep_ingest(docs).dropDuplicates(["ck2"])
    return _corpus_drop_layers(s, corpus_ck, corpus_bk)


DECISIONS_SCHEMA = "doc_id long, reason string, keep boolean"


def _admit_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_ck: DataFrame,
    corpus_bk: DataFrame,
    out_dir: str,
    seen_dir: str,
) -> None:
    """One micro-batch of the labeled admission pipeline — module-level so
    the replay-idempotency contract is directly testable (re-invoking with
    the SAME batch_id must reproduce identical decisions).

    Replay safety (round-10 advice, high): the seen-index write for batch N
    lands BEFORE the checkpoint commit, so on a crash-replay of batch N its
    own hashes are already in ``seen_dir``. The seen read therefore filters
    to ``batch_id < N`` — the index is partitioned by batch_id, so the
    filter is partition pruning, and a replayed batch sees exactly the
    state its first execution saw. Both sinks use PER-WRITE dynamic
    partition overwrite (no session-conf mutation — round-10 advice, low),
    so the replay overwrites its own partitions in place.
    """
    from pyspark.sql import Window as W

    spark = batch_df.sparkSession
    s = _prep_ingest(batch_df)
    # First-batch detection is an EXPLICIT directory probe (round-11
    # advice, low): only a missing/empty seen-index directory falls back
    # to the empty frame. A transient IO/permission failure mid-stream
    # must propagate — swallowing it would yield an empty seen set and
    # permanently mislabel exact_batch duplicates as kept.
    if _dir_has_parquet(spark, seen_dir):
        seen = (
            spark.read.parquet(seen_dir)
            .where(F.col("batch_id") < int(batch_id))
            .select("ck2")
            .distinct()
        )
    else:  # first batch: no admitted-hash index yet
        seen = spark.createDataFrame([], "ck2 string")
    w = W.partitionBy("ck2").orderBy("doc_id")
    s = s.withColumn("rn", F.row_number().over(w))
    s = s.join(
        corpus_ck.select("ck", F.lit(1).alias("in_corpus")),
        "ck",
        "left_outer",
    )
    s = s.join(
        seen.select("ck2", F.lit(1).alias("in_seen")), "ck2", "left_outer"
    )
    s = _with_near_corpus_flag(s, corpus_bk)
    reason = (
        F.when(F.col("in_corpus").isNotNull(), F.lit("exact_corpus"))
        .when(
            F.col("in_seen").isNotNull() | (F.col("rn") > 1),
            F.lit("exact_batch"),
        )
        .when(F.col("near_hit"), F.lit("near_corpus"))
        .otherwise(F.lit("kept"))
    )
    decisions = s.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
        F.lit(int(batch_id)).alias("batch_id"),
    ).localCheckpoint(eager=True)
    (
        decisions.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
    # The seen-index records EVERY adjudicated content hash, not just
    # the kept ones: the batch twin's exact_batch layer fires for
    # content matching ANY earlier arrival regardless of that
    # arrival's own fate (its min-doc rule ranks above the near
    # layers), so a later twin of a near_corpus-dropped doc must
    # still label exact_batch, not re-run the near probe.
    (
        _prep_ingest(batch_df)
        .select("ck2")
        .distinct()
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(seen_dir)
    )


def incremental_ingest_decisions(
    docs_stream: DataFrame,
    corpus_ck: DataFrame,
    corpus_bk: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint: str,
):
    """The LABELED streaming admission twin of the batch
    ``dedup_incremental_keep_list`` (operators/dedup.py:1528): a
    ``foreachBatch`` pipeline that admits each micro-batch against the
    corpus hash/bucket indexes and emits one keep/drop DECISION per
    document with the batch path's precedence labels —
    ``exact_corpus`` > ``exact_batch`` > ``near_corpus`` > ``kept``
    (``near_batch``, the within-new-data component collapse, is the batch
    compaction's layer by design — see the module docstring's lambda
    split; batch-equivalence modulo that layer is pinned by
    tests/test_streaming.py::test_incremental_decisions_match_batch_labels).

    State design: this pipeline's cross-batch state (the content hashes
    admitted by earlier micro-batches) lives in the LAKE (``seen_dir``
    parquet), not the streaming state store — it is the same index the
    periodic compaction maintains anyway, so the stream and the compaction
    share one source of truth and the state outlives any checkpoint. That
    is why this pipeline has no heap-vs-RocksDB axis in the streaming
    bench: there is no state store to back (the survivors-only twins
    above are the state-store pipelines); its bench row records per-batch
    decision throughput instead.

    Exactly-once: both sinks are written with ``partitionBy(batch_id)``
    + dynamic partition overwrite, the idempotent-foreachBatch pattern —
    a replayed micro-batch (failure before the checkpoint commit)
    OVERWRITES its own partition instead of appending a duplicate
    (restart-replay pinned by
    test_incremental_decisions_checkpoint_restart).

    Within-batch precedence matches the batch min-doc_id rule exactly
    (a window on the surrogate content key, ordered by doc_id); across
    batches, first-admitted-batch wins — identical to the batch rule
    whenever arrival order follows doc_id order, the same caveat as the
    survivors-only twin.
    """
    def admit(batch_df: DataFrame, batch_id: int) -> None:
        _admit_batch(
            batch_df, batch_id, corpus_ck, corpus_bk, out_dir, seen_dir
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def incremental_ingest_stream_bounded(
    docs: DataFrame,
    corpus_ck: DataFrame,
    corpus_bk: DataFrame,
    horizon: str = "10 minutes",
    event_time_col: str | None = None,
) -> DataFrame:
    """Bounded-state twin of :func:`incremental_ingest_stream` — the shape
    a FOREVER-running ingest deploys at 100 TB/day.

    Layer 1 becomes ``withWatermark(event_time, horizon)`` +
    ``dropDuplicatesWithinWatermark(["ck2"])``: the state store holds one
    16-byte key only until the watermark passes its first-seen event time
    plus the horizon, so state is bounded by ``horizon x distinct-key
    arrival rate`` instead of growing with the stream's lifetime (the
    state-eviction plateau is asserted by
    ``test_incremental_ingest_bounded_state_evicts`` and carried as a
    streaming-bench row). Layers 2-3 (exact-vs-corpus anti join,
    near-vs-corpus banded probe) are byte-identical to the unbounded twin
    — shared helpers, not copies.

    Semantics trade-off, explicit: an exact twin arriving WITHIN the
    horizon of its first occurrence is dropped exactly as in the
    unbounded twin; a twin arriving FARTHER apart is READMITTED (its key
    has been evicted). That is the correct production contract when the
    periodic batch compaction folds admitted hashes into the corpus index
    faster than the horizon — from then on the corpus-side anti join
    (layer 2, stateless) catches the late twin instead of the state
    store. Choose ``horizon`` >= the compaction cadence.

    ``event_time_col``: name of an existing event-time TIMESTAMP column;
    when None (the documents replay source carries none) rows are stamped
    with ``current_timestamp()`` at micro-batch evaluation — a
    processing-time horizon, which is exactly the "time since first seen"
    bound the compaction contract above needs.
    """
    s = _prep_ingest(docs)
    ts = event_time_col
    if ts is None:
        ts = "arrival_ts"
        s = s.withColumn(ts, F.current_timestamp())
    s = s.withWatermark(ts, horizon).dropDuplicatesWithinWatermark(["ck2"])
    return _corpus_drop_layers(s, corpus_ck, corpus_bk)
