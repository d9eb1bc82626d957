"""Training-data curation operators over the ``documents`` table: the
dataset-assembly surface of an LLM data pipeline — deterministic splits,
stratified sampling, document chunking, and weighted dataset mixing.

All selection decisions are *hash-based, not RNG-based*: `rand()`-style
sampling is irreproducible across engines, runs, and partitionings, while an
md5-derived bucket of the document id is a pure function of the data — the
same document always lands in the same split at any scale, on any cluster,
on re-runs with more executors. This is the production-correct choice for
training data (split leakage across re-runs is a real contamination bug),
and it is what makes every operator here oracle-checkable.

Scale notes:
- splits and samples are stateless projections/filters — no shuffle at all;
- chunking fans out via posexplode on a computed chunk index — output rows
  are written partition-local, no shuffle;
- the mix operator is filter + union-all — at 100 TB each source's sampling
  filter is pushed into its own scan and nothing synchronizes.
"""

from __future__ import annotations

from polars_ad_etl_spark.sources.star import read_star_parquet

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.hashing import (
    portable_hash32,
    portable_hash32_sql,
    tokens,
    tokens_sql,
)
from polars_ad_etl_spark.operators.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_star_parquet(spark, f"{sf_dir}/documents.parquet")


# Salted id-hash in [0, 10000): the split/sample decision variable.
_BUCKETS = 10000


def _bucket(col, salt: str):
    return portable_hash32(F.concat(F.lit(salt), col.cast("string"))) % _BUCKETS


def _bucket_sql(expr: str, salt: str) -> str:
    salted = f"'{salt}' || CAST({expr} AS VARCHAR)"
    return f"{portable_hash32_sql(salted)} % {_BUCKETS}"


# ----------------------------------------------------------- hash split
@register(
    "curation_hash_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN b < 9000 THEN 'train'
                WHEN b < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, lang, {_bucket_sql('doc_id', 'split42')} AS b
          FROM documents)
    """,
)
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment from a salted hash of doc_id — a
    stateless projection (no shuffle, no RNG state). Changing the salt
    re-rolls the split; keeping it pins every document's split forever."""
    d = _docs(spark, sf_dir)
    b = _bucket(F.col("doc_id"), "split42")
    split = (
        F.when(b < 9000, F.lit("train"))
        .when(b < 9500, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "lang", split.alias("split"))


# ------------------------------------------------- stratified sampling
# per-language keep-rates (out of _BUCKETS): downsample dominant English,
# keep the rest — the classic language-rebalancing move.
_RATES = {"en": 2500, "de": 10000, "fr": 10000, "es": 10000, "zh": 5000}


@register(
    "curation_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM (SELECT doc_id, lang, n_chars,
                 {_bucket_sql('doc_id', 'sample7')} AS b
          FROM documents)
    WHERE b < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())}
              ELSE 0 END
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language hash-threshold sampling (deterministic stratified
    sample): keep a document iff its salted id-hash falls under the
    language's rate. Unlike ``df.sampleBy`` this is reproducible across
    engines/partitionings and needs no RNG seed plumbing."""
    d = _docs(spark, sf_dir)
    b = _bucket(F.col("doc_id"), "sample7")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(0),
    )
    return d.filter(b < rate).select("doc_id", "lang", "n_chars")


# ----------------------------------------------------------- chunking
_CHUNK = 40  # tokens per chunk
_STRIDE = 30  # overlap = _CHUNK - _STRIDE


@register(
    "curation_doc_chunks",
    oracle=f"""
    SELECT doc_id, k AS chunk_id,
           array_to_string(toks[k * {_STRIDE} + 1 : k * {_STRIDE} + {_CHUNK}], ' ')
               AS chunk_text,
           LEAST(len(toks) - k * {_STRIDE}, {_CHUNK}) AS chunk_tokens
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(0, (len(toks) - 1) // {_STRIDE})) AS k
          FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
          WHERE len(toks) > 0)
    """,
)
def curation_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (40-token chunks, 30-token stride):
    the standard pre-tokenization step for long-document training and RAG
    indexing. The chunk fan-out is a partition-local explode of a computed
    index range — no shuffle; each output row carries its real token count
    (the tail chunk is shorter)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    chunked = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.size("toks") - 1) / F.lit(_STRIDE)).cast("int")
            )
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _STRIDE
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.slice(F.col("toks"), start + 1, _CHUNK)).alias(
            "chunk_text"
        ),
        F.least(F.size("toks") - start, F.lit(_CHUNK))
        .cast("long")
        .alias("chunk_tokens"),
    )


# ------------------------------------------------------- dataset mixing
# source groups with different sampling weights (domain upweighting):
# sources src0..src9 kept at 30%, src10..src19 at 100%.
@register(
    "curation_dataset_mix",
    oracle=f"""
    SELECT doc_id, source, mix_group FROM (
        SELECT doc_id, source, 'low' AS mix_group,
               {_bucket_sql('doc_id', 'mix1')} AS b
        FROM documents
        WHERE TRY_CAST(REPLACE(source, 'src', '') AS BIGINT) < 10
        UNION ALL
        SELECT doc_id, source, 'high' AS mix_group,
               0 AS b
        FROM documents
        WHERE COALESCE(TRY_CAST(REPLACE(source, 'src', '') AS BIGINT) >= 10,
                       TRUE)
    )
    WHERE (mix_group = 'high') OR b < 3000
    """,
)
def curation_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset interleave: each source group gets its own
    deterministic keep-rate, then the groups union. At scale every branch
    is an independent pushed-down scan+filter — mixing N corpora never
    synchronizes them. Sources outside the srcN naming scheme default to
    the keep-all 'high' group (try_cast, declared in the oracle too):
    an unknown domain must be mixed in visibly, not crash the job or be
    dropped silently."""
    d = _docs(spark, sf_dir)
    src_num = F.replace(
        F.col("source"), F.lit("src"), F.lit("")
    ).try_cast("long")
    low = (
        d.filter(src_num < 10)
        .filter(_bucket(F.col("doc_id"), "mix1") < 3000)
        .select("doc_id", "source", F.lit("low").alias("mix_group"))
    )
    high = d.filter(src_num.isNull() | (src_num >= 10)).select(
        "doc_id", "source", F.lit("high").alias("mix_group")
    )
    return low.unionByName(high)


# ------------------------------------------- DSIR-style importance sampling
# Data Selection via Importance Resampling (Xie et al. 2023): weight each
# document by how much its token distribution looks like a *target* slice
# (here: the English subset) relative to the whole corpus, then keep each
# document with probability proportional to its weight. Everything is exact
# integer arithmetic so both engines agree bit-for-bit:
#
#   s(tok)      = ((target_count + 1) * SCALE) div (corpus_count + 1)   -- add-1
#   importance  = sum(s over the doc's tokens) div n_tokens             -- mean
#   sampled     = bucket(doc_id) * SCALE < importance * BUCKETS
#
# The last line is "keep with probability importance / SCALE" rewritten
# multiplication-only (no division, no floats) against the same salted hash
# bucket the split/sample operators use — deterministic under repartitioning,
# reproducible across engines. SCALE is the *theoretical* maximum importance
# (target_count <= corpus_count forces s <= SCALE, so the mean is too), which
# is deliberately used instead of the empirical max: a global MAX scalar
# would force a second full pass over the weight subtree (Spark plans the
# scalar's aggregate as a separate subtree — measured as a duplicated
# scan+join+groupBy in explain()), while the fixed bound keeps the operator
# single-pass at any scale.
#
# Scale: one groupBy(token) builds the ratio table (map-side combinable
# counts; stopword skew is AQE-handled), one token->ratio join, one
# groupBy(doc_id). At 100 TB swap SCALE down (or widen to decimal) so
# (count+1)*SCALE stays in int64 when corpus token counts approach 1e12.

_DSIR_SCALE = 1_000_000


@register(
    "curation_importance_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({tokens_sql('text')}) AS tok FROM documents
    ),
    counts AS (
        SELECT tok, COUNT(*) AS cc,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
        FROM toks GROUP BY tok
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(((c.tc + 1) * {_DSIR_SCALE}) // (c.cc + 1) AS BIGINT) AS s
        FROM toks t JOIN counts c USING (tok)
    ),
    docw AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(s) // COUNT(*) AS BIGINT) AS importance
        FROM scored GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_tokens, w.importance,
           ({_bucket_sql('w.doc_id', 'dsir')} * {_DSIR_SCALE})
               < (w.importance * {_BUCKETS}) AS sampled
    FROM docw w
    """,
)
def curation_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> (n_tokens, integer importance weight vs the English target
    slice, hash-deterministic keep decision). See the section comment for the
    arithmetic and the scale story."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.count("*").alias("cc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tc"),
    )
    scored = toks.join(counts, "tok").select(
        "doc_id",
        F.expr(f"((tc + 1) * {_DSIR_SCALE}) div (cc + 1)").alias("s"),
    )
    docw = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.expr("sum(s) div count(*)").alias("importance"),
    )
    return docw.select(
        "doc_id",
        "n_tokens",
        "importance",
        (
            _bucket(F.col("doc_id"), "dsir") * F.lit(_DSIR_SCALE)
            < F.col("importance") * F.lit(_BUCKETS)
        ).alias("sampled"),
    )


# ------------------------------------------------------------ shard manifest
# The writer step of a training-data pipeline: assign every document to an
# output shard and give it a deterministic position inside that shard — a
# reproducible global shuffle. Both decisions are salted-hash functions of
# doc_id (ties broken by doc_id), so the manifest is a pure function of the
# data: any engine, any partitioning, any re-run emits byte-identical shards.
#
# Scale: the shard count scales with the corpus (shards ~= target file size),
# so the per-shard row_number window stays bounded — each window partition IS
# one output file's worth of rows. One shuffle on (shard).

_SHARDS = 16


@register(
    "curation_shard_manifest",
    oracle=f"""
    SELECT doc_id,
           CAST({_bucket_sql('doc_id', 'shard7')} % {_SHARDS} AS INTEGER)
               AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {_bucket_sql('doc_id', 'shard7')} % {_SHARDS}
               ORDER BY {_bucket_sql('doc_id', 'order3')}, doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM documents
    """,
)
def curation_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> (shard, position) deterministic write manifest; see the
    section comment."""
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    shard = (_bucket(F.col("doc_id"), "shard7") % _SHARDS).cast("int")
    order = _bucket(F.col("doc_id"), "order3")
    w = W.partitionBy(shard).orderBy(order, "doc_id")
    return d.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


# --------------------------------------------------------- sequence packing
# GPT-style sample packing: concatenate the (deterministically ordered)
# token stream and cut it into fixed SEQ_LEN training sequences. What the
# trainer needs per document is its exact global token offset — a global
# running sum, i.e. the classic single-partition-sort trap. Computed here
# as a TWO-LEVEL cumulative sum: per-bucket totals (10k rows) carry the
# coarse prefix in a tiny bounded window, and the exact within-bucket
# prefix is a window partitioned by bucket — 10k parallel sorted
# partitions, never one global sort. Bucket count scales with the corpus,
# so per-partition work stays bounded. Same trick as
# curation_token_budget_sample, extended from bucket granularity to exact
# per-document offsets.

_SEQ_LEN = 512


@register(
    "curation_packed_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_bucket_sql('doc_id', 'pack')} AS bk,
               len({tokens_sql('text')}) AS n
        FROM documents
        WHERE len({tokens_sql('text')}) >= 1
    ),
    intra AS (
        SELECT doc_id, bk, n,
               COALESCE(SUM(n) OVER (
                   PARTITION BY bk ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS intra_before
        FROM t
    ),
    btot AS (SELECT bk, SUM(n) AS bt FROM t GROUP BY bk),
    bcum AS (
        SELECT bk,
               COALESCE(SUM(bt) OVER (
                   ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING
               ), 0) AS before_bk
        FROM btot
    )
    SELECT i.doc_id,
           CAST(i.n AS BIGINT) AS n_tokens,
           CAST(c.before_bk + i.intra_before AS BIGINT) AS start_offset,
           CAST((c.before_bk + i.intra_before) // {_SEQ_LEN} AS BIGINT)
               AS first_seq,
           CAST((c.before_bk + i.intra_before + i.n - 1) // {_SEQ_LEN}
                AS BIGINT) AS last_seq,
           (c.before_bk + i.intra_before) // {_SEQ_LEN}
               <> (c.before_bk + i.intra_before + i.n - 1) // {_SEQ_LEN}
               AS spans_boundary
    FROM intra i JOIN bcum c USING (bk)
    """,
)
def curation_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> exact global token offset and the SEQ_LEN sequence ids it
    lands in; see the section comment for the two-level cumsum."""
    from pyspark.sql import Window as W

    t = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            _bucket(F.col("doc_id"), "pack").alias("bk"),
            F.size(tokens(F.col("text"))).cast("long").alias("n"),
        )
        .filter(F.col("n") >= 1)
    )
    intra_w = (
        W.partitionBy("bk")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = t.withColumn(
        "intra_before", F.coalesce(F.sum("n").over(intra_w), F.lit(0))
    )
    btot = t.groupBy("bk").agg(F.sum("n").alias("bt"))
    bk_w = W.orderBy("bk").rowsBetween(W.unboundedPreceding, -1)
    bcum = btot.select(
        "bk", F.coalesce(F.sum("bt").over(bk_w), F.lit(0)).alias("before_bk")
    )
    start = F.col("before_bk") + F.col("intra_before")
    return intra.join(F.broadcast(bcum), "bk").select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        start.alias("start_offset"),
        F.expr(f"(before_bk + intra_before) div {_SEQ_LEN}").alias("first_seq"),
        F.expr(f"(before_bk + intra_before + n - 1) div {_SEQ_LEN}").alias(
            "last_seq"
        ),
        (
            F.expr(f"(before_bk + intra_before) div {_SEQ_LEN}")
            != F.expr(f"(before_bk + intra_before + n - 1) div {_SEQ_LEN}")
        ).alias("spans_boundary"),
    )


# ------------------------------------------------- data-constrained epochs
# Repeat-factor planning under a token budget (the data-constrained-scaling
# recipe: repeating a source beyond ~4 epochs stops helping, so cap repeats
# and report the shortfall). The budget (BUDGET_X times the corpus) is
# split EQUALLY per source — the rebalancing move that upweights small
# sources — so a small source hits the epoch cap with budget left over
# (unfilled) while a large one gets partial coverage (whole epochs + a
# token tail). Integer arithmetic throughout; everything runs on the
# |sources|-row aggregate (one groupBy(source) at any scale), with the
# corpus total and source count as windows over that tiny frame, never a
# second pass.

_EPOCH_BUDGET_X = 3
_MAX_EPOCHS = 4


@register(
    "curation_epoch_plan",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(SUM(len({tokens_sql('text')})) AS BIGINT)
               AS src_tokens
        FROM documents GROUP BY source
    ),
    t AS (
        SELECT source, src_tokens,
               CAST((SUM(src_tokens) OVER ()) * {_EPOCH_BUDGET_X}
                    // (COUNT(*) OVER ()) AS BIGINT) AS share
        FROM s
    )
    SELECT source, src_tokens,
           CAST(LEAST({_MAX_EPOCHS}, share // src_tokens) AS BIGINT)
               AS full_epochs,
           CAST(CASE WHEN share // src_tokens >= {_MAX_EPOCHS} THEN 0
                     ELSE share % src_tokens END AS BIGINT) AS tail_tokens,
           CAST(share - LEAST({_MAX_EPOCHS}, share // src_tokens)
                    * src_tokens
                - CASE WHEN share // src_tokens >= {_MAX_EPOCHS} THEN 0
                       ELSE share % src_tokens END AS BIGINT)
               AS unfilled_tokens
    FROM t
    """,
)
def curation_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source -> (token count, whole epochs capped at MAX_EPOCHS, fractional
    tail, unfilled budget); see the section comment."""
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("src_tokens")
    )
    w = W.partitionBy()
    t = s.select(
        "source",
        "src_tokens",
        (F.sum("src_tokens").over(w) * _EPOCH_BUDGET_X).alias("_num"),
        F.count("*").over(w).alias("_den"),
    ).select(
        "source",
        "src_tokens",
        F.expr("_num div _den").alias("share"),
    )
    epochs = F.least(
        F.lit(_MAX_EPOCHS).cast("long"), F.expr("share div src_tokens")
    )
    tail = (
        F.when(F.expr("share div src_tokens") >= _MAX_EPOCHS, F.lit(0))
        .otherwise(F.expr("share % src_tokens"))
        .cast("long")
    )
    return t.select(
        "source",
        "src_tokens",
        epochs.alias("full_epochs"),
        tail.alias("tail_tokens"),
        (F.col("share") - epochs * F.col("src_tokens") - tail)
        .cast("long")
        .alias("unfilled_tokens"),
    )


# ------------------------------------------------------ per-group sampling
# "k examples per language" (eval-set assembly, few-shot pools): rank each
# group by a salted hash and keep the first K — a deterministic reservoir
# with no RNG state, reproducible at any partitioning. The window
# partitions on the group key, so parallelism scales with group count; for
# very hot groups the salted-bucket pre-filter (keep only buckets < c)
# would bound the window input first.

_PER_GROUP_K = 20


@register(
    "curation_per_group_sample",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_bucket_sql('doc_id', 'grp9')}, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {_PER_GROUP_K}
    """,
)
def curation_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First K docs per language in salted-hash order; see the section
    comment."""
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    w = W.partitionBy("lang").orderBy(
        _bucket(F.col("doc_id"), "grp9"), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= _PER_GROUP_K)
    )


# ------------------------------------------ weighted priority sampling
#
# Weighted sampling WITHOUT replacement, deterministically: every document
# draws a pseudo-uniform u from the salted id-hash and competes with
# priority ≈ u/weight (the exponential-clocks / A-ES construction — bigger
# weight, stochastically smaller priority). Selection = global bottom-k by
# priority, which Spark executes as TakeOrdered (per-partition top-k then a
# k-row merge — no global sort). Integer arithmetic only: priority =
# ((u+1) * 1e6) div weight, so both engines compute identical priorities
# and the draw is reproducible forever (same salt → same sample at any
# scale/partitioning — the same no-RNG rule as the rest of this module).
_PRIORITY_K = 50


@register(
    "curation_priority_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars, priority
    FROM (SELECT doc_id, lang, n_chars,
                 CAST((({_bucket_sql('doc_id', 'prio9')} + 1) * 1000000)
                      // n_chars AS BIGINT) AS priority
          FROM documents
          WHERE n_chars > 0)
    ORDER BY priority, doc_id LIMIT {_PRIORITY_K}
    """,
)
def curation_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted sample of {K} documents: inclusion
    odds scale with n_chars, selection is exact bottom-k on the integer
    hash priority (ties broken by doc_id). A stateless projection + top-k;
    no RNG state, no shuffle beyond the k-row merge.""".replace(
        "{K}", str(_PRIORITY_K)
    )
    d = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    u = _bucket(F.col("doc_id"), "prio9")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            ((u + F.lit(1)) * F.lit(1_000_000))
            .cast("bigint")
            .alias("_num"),
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr("_num div n_chars").alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(_PRIORITY_K)
    )


# ------------------------------------------------ curation gate funnel
@register(
    "curation_gate_funnel",
    oracle="""
    WITH flags AS (
        SELECT doc_id,
               n_chars BETWEEN 100 AND 10000 AS pass_len,
               lang IN ('en', 'de', 'fr', 'es', 'zh') AS pass_lang,
               doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
                   AS pass_dedup
        FROM documents
    )
    SELECT stage, n_docs FROM (
        SELECT 1 AS ord, 'ingested' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs FROM flags
        UNION ALL
        SELECT 2, 'len_filtered', CAST(COUNT(*) FILTER (WHERE pass_len)
               AS BIGINT) FROM flags
        UNION ALL
        SELECT 3, 'lang_filtered', CAST(COUNT(*) FILTER (
               WHERE pass_len AND pass_lang) AS BIGINT) FROM flags
        UNION ALL
        SELECT 4, 'deduped', CAST(COUNT(*) FILTER (
               WHERE pass_len AND pass_lang AND pass_dedup) AS BIGINT)
        FROM flags
    ) ORDER BY ord
    """,
)
def curation_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's survival funnel: document counts after each
    successive gate (length window → allowed language → exact-dup keep
    rule) — the attrition report every dataset card publishes. All four
    counts come from ONE pass: per-document booleans (the dedup keep flag
    is a window over the md5 hash partition — high-cardinality key, no
    hot spot) then a single aggregate with cumulative-conjunction
    filters, unpivoted to (stage, n_docs)."""
    from pyspark.sql import Window as W

    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    dedup_w = W.partitionBy(F.md5("text"))
    flags = docs.select(
        F.col("n_chars").between(100, 10000).alias("pass_len"),
        F.col("lang").isin("en", "de", "fr", "es", "zh").alias("pass_lang"),
        (F.col("doc_id") == F.min("doc_id").over(dedup_w)).alias(
            "pass_dedup"
        ),
    )
    # count_if: an empty corpus reports 0 at every stage (COUNT-FILTER
    # semantics), not NULL (SUM-over-empty); NULL gate flags (NULL lang)
    # are not counted, same as the oracle's FILTER predicates
    wide = flags.agg(
        F.count(F.lit(1)).alias("c1"),
        F.count_if(F.col("pass_len")).alias("c2"),
        F.count_if(F.col("pass_len") & F.col("pass_lang")).alias("c3"),
        F.count_if(
            F.col("pass_len") & F.col("pass_lang") & F.col("pass_dedup")
        ).alias("c4"),
    )
    return (
        wide.selectExpr(
            "stack(4, 'ingested', c1, 'len_filtered', c2,"
            " 'lang_filtered', c3, 'deduped', c4) AS (stage, n_docs)"
        )
    )
