"""Corpus-quality operators over the ``documents`` table: Gopher-style
repetition scoring, benchmark-contamination n-gram checks, token-budget
selection, and PII redaction — the filter stack a production LLM-data
pipeline runs between raw ingest and training-set assembly. All pure
built-in expressions (no Python UDFs), all oracle-checked.

Scale design (100 TB):
- repetition scores need one shuffle on (doc_id, bigram) with map-side
  combine, then one map-side-combinable per-doc aggregate; everything else
  is a projection;
- the contamination check is the canonical broadcast-asymmetry pattern: the
  benchmark/eval side is tiny by construction, so its distinct n-gram set
  broadcasts and the 100 TB training side is a single scan + broadcast hash
  join — no shuffle of the big side at all;
- token-budget selection is deliberately *bucket-granular* so that the
  running-sum window runs over the 10k-row bucket aggregate, never over the
  document table: a per-document cumulative sum would force a global sort
  into one partition, the classic non-scalable window;
- PII redaction is a pure projection (regexp_count/regexp_replace inside
  whole-stage codegen).
"""

from __future__ import annotations

from polars_ad_etl_spark.sources.star import read_star_parquet

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_ad_etl_spark.functions.hashing import (
    portable_hash32,
    portable_hash32_sql,
    tokens,
    tokens_sql,
)
from polars_ad_etl_spark.operators.registry import register

_BUCKETS = 10000


def _bucket(col, salt: str):
    return portable_hash32(F.concat(F.lit(salt), col.cast("string"))) % _BUCKETS


def _bucket_sql(expr: str, salt: str) -> str:
    salted = f"'{salt}' || CAST({expr} AS VARCHAR)"
    return f"{portable_hash32_sql(salted)} % {_BUCKETS}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_star_parquet(spark, f"{sf_dir}/documents.parquet")


# ------------------------------------------------- repetition scoring
# Gopher-rule thresholds (Rae et al. 2021 use 0.18 for top-2-gram fraction;
# the duplicate-token threshold is tuned to this corpus's vocabulary).
_TOP_BIGRAM_MAX = 0.18
_DUP_TOKEN_MAX = 0.80


@register(
    "text_repetition_scores",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    base AS (
        SELECT doc_id, len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct
        FROM t
    ),
    bg AS (
        SELECT doc_id,
               -- indexed, not toks[i:i+1]: a slice in a comprehension is
               -- O(offset) per element in DuckDB -> quadratic on long docs
               unnest([concat(toks[i], ' ', toks[i+1])
                       for i in generate_series(1, len(toks) - 1)]) AS g
        FROM t
    ),
    bgc AS (
        SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g
    ),
    bstat AS (
        SELECT doc_id, MAX(c) AS top_bigram_n, SUM(c) AS n_bigrams
        FROM bgc GROUP BY doc_id
    )
    SELECT base.doc_id, n_tokens,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
           END AS dup_token_ratio,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                ELSE CAST(top_bigram_n AS DOUBLE) / n_bigrams
           END AS top_bigram_ratio,
           (CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
            END > {_DUP_TOKEN_MAX}
            OR CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                    ELSE CAST(top_bigram_n AS DOUBLE) / n_bigrams
               END > {_TOP_BIGRAM_MAX}) AS flagged
    FROM base LEFT JOIN bstat ON base.doc_id = bstat.doc_id
    """,
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction and
    most-frequent-bigram fraction, plus the keep/flag decision. The
    distinct-token side is a pure projection; the bigram mode needs one
    (doc_id, bigram) count — both aggregates are map-side combinable, and
    nothing is quadratic in document length."""
    t = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    base = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bigrams = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i], toks[i+1]))"
                ),
            ).otherwise(F.array())
        ).alias("g"),
    )
    bstat = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    dup_ratio = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    )
    top_ratio = F.when(
        F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(F.col("top_bigram_n").cast("double") / F.col("n_bigrams"))
    return base.join(bstat, "doc_id", "left_outer").select(
        "doc_id",
        "n_tokens",
        dup_ratio.alias("dup_token_ratio"),
        top_ratio.alias("top_bigram_ratio"),
        ((dup_ratio > _DUP_TOKEN_MAX) | (top_ratio > _TOP_BIGRAM_MAX)).alias(
            "flagged"
        ),
    )


# --------------------------------------------- benchmark contamination
# Simulated benchmark: a deterministic 2% hash-slice of the corpus plays the
# eval set; a training document is contaminated if it shares any 5-gram with
# it. 5-grams (not shorter) keep the check specific: on this corpus 4-grams
# already fire on a quarter of all documents from common phrases, while
# 5-gram hits are exactly the cross-split near-duplicates.
_EVAL_RATE = 200  # of _BUCKETS
_NGRAM = 5

_GRAMS_SPARK = (
    f"CASE WHEN size(toks) >= {_NGRAM} THEN "
    f"array_distinct(transform(sequence(0, size(toks) - {_NGRAM}), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))"
    " ELSE array() END"
)

# indexed elements, not a list slice (O(offset)/element in a comprehension)
_GRAMS_DUCK = (
    "list_distinct([concat_ws(' ', "
    + ", ".join(f"toks[i+{k}]" if k else "toks[i]" for k in range(_NGRAM))
    + f") for i in generate_series(1, len(toks) - {_NGRAM - 1})])"
)


@register(
    "curation_contamination_check",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_bucket_sql('doc_id', 'eval')} AS bk,
               {tokens_sql('text')} AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, bk, unnest({_GRAMS_DUCK}) AS g FROM t
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE bk < {_EVAL_RATE}),
    tr AS (SELECT doc_id, g FROM g WHERE bk >= {_EVAL_RATE})
    SELECT tr.doc_id, COUNT(*) AS n_shared_ngrams
    FROM tr JOIN ev USING (g)
    GROUP BY tr.doc_id
    """,
)
def curation_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark contamination scan: per training document, how many
    distinct 5-grams it shares with the (hash-sliced) eval set. The eval
    n-gram set is small by construction and broadcast; the training side is
    one scan feeding a broadcast hash join — the 100 TB side never
    shuffles. Per-doc n-grams are pre-deduplicated in the projection, so
    the join output is the exact distinct-shared count.

    ``read_docs_spread``: the 5-gram build is per-row-expensive scan work
    and the testdata scan plans one task — scale-adaptive spread, no-op at
    scale (see spread_scan's docstring). The spread exchange hashes on
    ``doc_id``, so the final per-document count aggregate reuses it (guide
    §2.4) instead of planning its own."""
    from polars_ad_etl_spark.sources.star import read_docs_spread

    t = read_docs_spread(spark, sf_dir, key="doc_id").select(
        "doc_id",
        _bucket(F.col("doc_id"), "eval").alias("bk"),
        tokens(F.col("text")).alias("toks"),
    )
    g = t.select("doc_id", "bk", F.explode(F.expr(_GRAMS_SPARK)).alias("g"))
    ev = g.filter(F.col("bk") < _EVAL_RATE).select("g").distinct()
    tr = g.filter(F.col("bk") >= _EVAL_RATE).select("doc_id", "g")
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


# ------------------------------------------------ token-budget selection
# Keep a deterministic ~25% of corpus tokens: documents are prioritized by a
# salted id-hash bucket, whole buckets are admitted while the running token
# total stays under budget.
_BUDGET_FRACTION = 0.25


@register(
    "curation_token_budget_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_bucket_sql('doc_id', 'budget')} AS bk,
               len({tokens_sql('text')}) AS n_tokens
        FROM documents
    ),
    btot AS (
        SELECT bk, SUM(n_tokens) AS bucket_tokens FROM t GROUP BY bk
    ),
    cum AS (
        SELECT bk, SUM(bucket_tokens)
                   OVER (ORDER BY bk ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM btot
    ),
    keep AS (
        SELECT bk FROM cum
        WHERE cum_tokens <= {_BUDGET_FRACTION} * (SELECT SUM(n_tokens) FROM t)
    )
    SELECT doc_id, n_tokens FROM t JOIN keep USING (bk)
    """,
)
def curation_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select documents up to a global token budget (25% of corpus tokens),
    bucket-granular: the cumulative sum runs over the 10k-row bucket
    aggregate, not the documents — a per-document running total would be
    the classic single-partition global-sort window. The kept bucket set
    and the budget scalar are both tiny and broadcast back onto the scan."""
    t = _docs(spark, sf_dir).select(
        "doc_id",
        _bucket(F.col("doc_id"), "budget").alias("bk"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    btot = t.groupBy("bk").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # 10k rows max: the empty-frame window here is deliberate and bounded.
    w = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
    cum = btot.select("bk", F.sum("bucket_tokens").over(w).alias("cum_tokens"))
    budget = t.agg(
        (F.sum("n_tokens") * _BUDGET_FRACTION).alias("budget")
    )
    keep = cum.join(F.broadcast(budget)).filter(
        F.col("cum_tokens") <= F.col("budget")
    ).select("bk")
    return t.join(F.broadcast(keep), "bk").select("doc_id", "n_tokens")


# ------------------------------------------------------ Gopher rule suite
# The document-level quality gate of Rae et al. 2021 (Gopher, Table A1),
# restated for this corpus: word-count bounds, mean-word-length band,
# symbol-to-word ratio, and alphabetic-word fraction. Thresholds are the
# published ones except the minimum word count (20 instead of 50 — this
# corpus is synthetic short text, 10..99 words, and a 50-floor would reject
# half of it; the *rule* is what's under test, not Gopher's web tuning).
# Line-shape rules (bullet/ellipsis line ratios) are omitted: the corpus is
# single-line by construction, so they would be constant-false columns.
_G_MIN_WORDS = 20
_G_MAX_WORDS = 100_000
_G_MIN_MEAN_WLEN = 3.0
_G_MAX_MEAN_WLEN = 10.0
_G_MAX_SYMBOL_RATIO = 0.1
_G_MIN_ALPHA_RATIO = 0.8
_G_SYMBOL_RE = "#|[.][.][.]"  # hash marks and ASCII ellipses, RE2-safe


@register(
    "text_gopher_filters",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_words,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(toks, x -> len(x)))
                              AS DOUBLE) / len(toks)
               END AS mean_word_len,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(regexp_extract_all(text, '{_G_SYMBOL_RE}'))
                              AS DOUBLE) / len(toks)
               END AS symbol_ratio,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(toks,
                                   x -> regexp_matches(x, '[a-z]')))
                              AS DOUBLE) / len(toks)
               END AS alpha_word_ratio
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
           (n_words >= {_G_MIN_WORDS} AND n_words <= {_G_MAX_WORDS}
            AND mean_word_len >= {_G_MIN_MEAN_WLEN}
            AND mean_word_len <= {_G_MAX_MEAN_WLEN}
            AND symbol_ratio <= {_G_MAX_SYMBOL_RATIO}
            AND alpha_word_ratio >= {_G_MIN_ALPHA_RATIO}) AS keep
    FROM m
    """,
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality gate: per-document word count, mean word
    length, symbol-to-word ratio, and alphabetic-word fraction, folded into
    one keep/drop decision. Pure projection — every measure is a
    higher-order array expression over the token array (no shuffle, no
    Python), so at 100 TB this is scan-bound and pushes the text-column
    read down to the parquet scan. The ratio divisions are exact-integer
    over exact-integer, so the doubles are bit-identical across engines
    (no rounding needed). Complements :func:`text_repetition_scores`,
    which covers Gopher's repetition family."""
    t = _docs(spark, sf_dir).select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    zero = F.lit(0.0)
    mean_wlen = F.when(n == 0, zero).otherwise(
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n
    )
    symbol_ratio = F.when(n == 0, zero).otherwise(
        F.regexp_count("text", F.lit(_G_SYMBOL_RE)).cast("double") / n
    )
    alpha_ratio = F.when(n == 0, zero).otherwise(
        F.size(F.filter(F.col("toks"), lambda x: x.rlike("[a-z]"))).cast(
            "double"
        )
        / n
    )
    m = t.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
    )
    return m.select(
        "*",
        (
            (F.col("n_words") >= _G_MIN_WORDS)
            & (F.col("n_words") <= _G_MAX_WORDS)
            & (F.col("mean_word_len") >= _G_MIN_MEAN_WLEN)
            & (F.col("mean_word_len") <= _G_MAX_MEAN_WLEN)
            & (F.col("symbol_ratio") <= _G_MAX_SYMBOL_RATIO)
            & (F.col("alpha_word_ratio") >= _G_MIN_ALPHA_RATIO)
        ).alias("keep"),
    )


# ---------------------------------------------------------- PII redaction
# Patterns restricted to syntax RE2 (DuckDB) and the JVM regex engine parse
# identically: explicit classes, no backrefs, no lookaround.
# The local part is BOUNDED at RFC 5321's 64 chars rather than `+`: with an
# unbounded run the JVM matcher re-consumes the remainder of an
# alphanumeric run at every start position — O(n²) per document, and the
# textfuzz 200 KB single-token doc timed the sweep out. A {1,64} bound
# caps the per-position work; RE2 and the JVM agree on the (leftmost)
# match either way because the constant is shared by query and oracle.
# REDACTION-COVERAGE BOUNDARY: for a local part LONGER than 64 chars the
# leftmost match starts 64 chars before the '@', so the prefix of an
# over-long local part stays unredacted (both engines identically — only
# coverage is affected, never parity). Acceptable per RFC 5321: >64-char
# local parts are not deliverable addresses. If full-run redaction of
# malformed addresses is ever wanted, anchor with a preceding
# non-local-part-char guard instead of widening the bound.
_EMAIL = "[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PHONE = "[+][0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"


@register(
    "text_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                              '{_PHONE}', '<PHONE>', 'g')) AS redacted_hash
    FROM documents
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with per-document match counts; the redacted
    text is emitted as an md5 so the full transform is hash-verified without
    shipping document bodies through the comparator. Pure projection —
    regexp_count + regexp_replace stay in whole-stage codegen; at 100 TB
    this is scan-bound. (This corpus contains no PII, so counts verify at
    zero and the hash verifies the text passes through unmodified — the
    operator's contract, not its workload, is what's under test.)"""
    d = _docs(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


# ------------------------------------------------------ source drift check
# Data-validation step: how far does each source's token distribution sit
# from the corpus distribution? L1 distance in fixed-point integers:
#   fs(t) = count(s,t) * SCALE div n_s      (source frequency)
#   fc(t) = count(t)   * SCALE div n        (corpus frequency)
#   l1(s) = sum_t |fs - fc|
# summed over the FULL vocabulary. Tokens absent from a source contribute
# fc, folded in algebraically — l1(s) = sum_observed(|fs - fc| - fc) + K
# with K = sum_vocab fc a source-independent constant — so the grid of
# (source x vocab) is never materialized and the token stream is scanned
# twice (the dictionary-pass shape: once under the windows, once under the
# K scalar), with every downstream frame bounded by |sources| x |vocab|.
# Exact integer arithmetic end to end; a drifting ingest (new boilerplate,
# wrong language, template change) moves l1 immediately.

_DRIFT_SCALE = 1_000_000


@register(
    "quality_source_drift",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({tokens_sql('text')}) AS tok FROM documents
    ),
    ps AS (
        SELECT source, tok, COUNT(*) AS c_st FROM toks GROUP BY source, tok
    ),
    w AS (
        SELECT source, tok, c_st,
               SUM(c_st) OVER (PARTITION BY source) AS n_s,
               SUM(c_st) OVER (PARTITION BY tok) AS c_t,
               SUM(c_st) OVER () AS n
        FROM ps
    ),
    f AS (
        SELECT source,
               CAST(c_st * {_DRIFT_SCALE} // n_s AS BIGINT) AS fs,
               CAST(c_t * {_DRIFT_SCALE} // n AS BIGINT) AS fc,
               CAST(n_s AS BIGINT) AS n_s
        FROM w
    ),
    vocab AS (
        SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY tok
    ),
    k AS (
        SELECT CAST(SUM(c_t * {_DRIFT_SCALE}
                        // (SELECT COUNT(*) FROM toks)) AS BIGINT) AS kk
        FROM vocab
    )
    SELECT source,
           MIN(n_s) AS n_tokens,
           CAST(SUM(ABS(fs - fc) - fc) + MIN(k.kk) AS BIGINT) AS l1_drift
    FROM f CROSS JOIN k
    GROUP BY source
    """,
)
def quality_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source -> (token count, fixed-point L1 distance from the corpus token
    distribution); see the section comment."""
    d = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    ps = toks.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    w_src = Window.partitionBy("source")
    w_tok = Window.partitionBy("tok")
    w_all = Window.partitionBy()
    f = ps.select(
        "source",
        F.expr(f"c_st * {_DRIFT_SCALE}").alias("num_s"),
        F.sum("c_st").over(w_src).alias("n_s"),
        (F.sum("c_st").over(w_tok) * _DRIFT_SCALE).alias("num_c"),
        F.sum("c_st").over(w_all).alias("n"),
    ).select(
        "source",
        "n_s",
        F.expr("num_s div n_s").alias("fs"),
        F.expr("num_c div n").alias("fc"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c_t"))
    k = vocab.select(
        (F.col("c_t") * _DRIFT_SCALE).alias("num"),
        F.sum("c_t").over(Window.partitionBy()).alias("n"),
    ).agg(F.sum(F.expr("num div n")).alias("kk"))
    return (
        f.crossJoin(F.broadcast(k))
        .groupBy("source")
        .agg(
            F.min("n_s").alias("n_tokens"),
            (F.sum(F.abs(F.col("fs") - F.col("fc")) - F.col("fc")) + F.min("kk")).alias(
                "l1_drift"
            ),
        )
    )


# --------------------------------------------- model-based quality filter
# The "quality classifier" stage (fastText/logistic-style) as it actually
# deploys at 100 TB: training happens offline; what the pipeline runs is a
# LINEAR SCORE over cheap per-document features — a pure projection +
# aggregate, no model runtime. Weights are fixed integers and every feature
# is an exact integer count, so the score is engine-exact (the float
# sigmoid is monotone and therefore unnecessary for thresholding).
_QW = {
    "bias": -40,
    "per_token": 2,          # reward length
    "per_distinct": 3,       # reward vocabulary richness
    "per_dup_token": -6,     # punish repetition (n_tokens - n_distinct)
    "per_stopword": 5,       # reward natural-language function words
}
_QUALITY_KEEP_FP = 100


@register(
    "quality_linear_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    f AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks, x -> x IN
                   ('the','and','of','is','der','die','und','ist',
                    'le','les','et','est','el','los','las','y'))) AS n_stop
        FROM t
    )
    SELECT doc_id, n_tokens, n_distinct, n_stop,
           {_QW['bias']}
             + {_QW['per_token']} * n_tokens
             + {_QW['per_distinct']} * n_distinct
             + {_QW['per_dup_token']} * (n_tokens - n_distinct)
             + {_QW['per_stopword']} * n_stop AS score_fp,
           ({_QW['bias']}
             + {_QW['per_token']} * n_tokens
             + {_QW['per_distinct']} * n_distinct
             + {_QW['per_dup_token']} * (n_tokens - n_distinct)
             + {_QW['per_stopword']} * n_stop) >= {_QUALITY_KEEP_FP} AS keep
    FROM f
    """,
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier apply: integer feature counts x fixed
    integer weights -> exact score + keep decision, one scan, pure
    whole-stage-codegen projection (see section comment)."""
    from polars_ad_etl_spark.operators.textstats import STOPWORDS

    t = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    f = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(
            F.filter("toks", lambda x: F.array_contains(stop_arr, x))
        ).alias("n_stop"),
    )
    score = (
        F.lit(_QW["bias"])
        + _QW["per_token"] * F.col("n_tokens")
        + _QW["per_distinct"] * F.col("n_distinct")
        + _QW["per_dup_token"] * (F.col("n_tokens") - F.col("n_distinct"))
        + _QW["per_stopword"] * F.col("n_stop")
    ).cast("long")
    return f.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "n_stop",
        score.alias("score_fp"),
        (score >= _QUALITY_KEEP_FP).alias("keep"),
    )


# ------------------------------------------------- decontaminated set
@register(
    "curation_decontaminated_set",
    oracle=None,  # set after definition: composes two registered oracles
)
def curation_decontaminated_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage the contamination scan exists FOR: the selected training
    set minus every document sharing any 5-gram with the eval slice — an
    anti-join of two already-verified pipelines (training-set selection's
    dedup+filters, and the broadcast contamination scan). The anti join's
    right side is the contaminated-doc id list (small by construction) and
    broadcasts; the training side stays un-shuffled."""
    from polars_ad_etl_spark.operators.dedup import curation_training_set

    ts = curation_training_set(spark, sf_dir)
    cont = curation_contamination_check(spark, sf_dir).select("doc_id")
    return ts.join(F.broadcast(cont), "doc_id", "left_anti")


def _decontaminated_oracle() -> str:
    # direct-import safety: the composed CTEs live in dedup's registry
    # entries, so make sure that module has registered before reading them
    import polars_ad_etl_spark.operators.dedup  # noqa: F401
    from polars_ad_etl_spark.operators.registry import ORACLES

    return f"""
    WITH ts AS ({ORACLES["curation_training_set"]}),
    cont AS ({ORACLES["curation_contamination_check"]})
    SELECT ts.* FROM ts
    WHERE ts.doc_id NOT IN (SELECT doc_id FROM cont)
    """


from polars_ad_etl_spark.operators.registry import ORACLES as _OR  # noqa: E402

_OR["curation_decontaminated_set"] = _decontaminated_oracle()


# ------------------------------------------------------ corpus datasheet
@register(
    "corpus_datasheet",
    oracle=f"""
    WITH base AS (
        SELECT source, lang,
               md5(lower(trim(text))) AS h,
               len({tokens_sql('text')}) AS nt
        FROM documents
    ),
    per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_texts,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM base GROUP BY source
    ),
    sl AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
    top AS (
        SELECT source, lang AS top_lang FROM (
            SELECT source, lang,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY c DESC, lang) AS rn
            FROM sl
        ) WHERE rn = 1
    )
    SELECT source, n_docs, n_tokens,
           n_tokens // n_docs AS mean_tokens,
           n_distinct_texts, n_langs, top_lang
    FROM per_source JOIN top USING (source)
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheet-for-datasets per ingest source: document/token volumes,
    exact-dedup cardinality (distinct normalized-text hashes — the shuffle
    key is the 16-byte hash, never the text), language spread, and the
    modal language (two-level aggregate + a window over the |source|x|lang|
    aggregate, bounded). This is the one-page summary a data curator reads
    before admitting a source into the training mix."""
    from pyspark.sql import Window as W

    base = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        F.size(tokens(F.col("text"))).alias("nt"),
    )
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.countDistinct("h").alias("n_distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
    )
    sl = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    w = W.partitionBy("source").orderBy(F.desc("c"), "lang")
    top = (
        sl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return per_source.join(top, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens div n_docs").alias("mean_tokens"),
        "n_distinct_texts",
        "n_langs",
        "top_lang",
    )


# ------------------------------------------------ length distribution
@register(
    "curation_length_histogram",
    oracle=f"""
    WITH t AS (
        SELECT source, len({tokens_sql('text')}) AS n_tokens FROM documents
    )
    SELECT source, (n_tokens // 10) * 10 AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
    FROM t
    GROUP BY source, (n_tokens // 10) * 10
    """,
)
def curation_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram per ingest source (10-token buckets) — the
    length-filter tuning input (where do the truncation artifacts and
    boilerplate stubs cluster?). One tokenize pass, one map-side-
    combinable aggregate on the bounded (source, bucket) grid."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    return t.groupBy(
        "source",
        (F.floor(F.col("n_tokens") / 10) * 10).cast("long").alias(
            "bucket_start"
        ),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bucket_tokens"),
    )


# ------------------------------------------------ encoding-quality score
# Mojibake detection (CCNet/RefinedWeb-style encoding gate): web text that
# survived a cp1252-as-latin1 or double-UTF-8 round trip carries three
# machine-detectable artifact classes, each countable with one portable
# regex (explicit codepoint classes / literal alternations — identical
# parse in RE2 and the JVM; every alternative is anchored by a literal,
# so scanning stays linear in document length):
#   1. U+FFFD replacement characters — a decoder already gave up;
#   2. C1 control codepoints U+0080-U+009F — the signature of cp1252
#      bytes decoded as latin-1/UTF-8 (legitimate text never contains
#      them; NEL U+0085 is excluded as it survives some legitimate
#      converters — see the tokenizer contract in functions/hashing.py);
#   3. the high-frequency double-encoding bigrams ("Ã©" for é, "â€™"
#      for a right quote, "Â" before NBSP/°/£ — UTF-8 bytes decoded as
#      latin-1; only fully printable artifacts are listed, the ones
#      ending in a C1 byte are already counted by class 2).
# The permille score is exact integer arithmetic (oracle-hashable). At
# 100 TB this is a pure projection — scan-bound, no shuffle.
_MOJI_REPLACEMENT = "�"
_MOJI_C1 = f"[{chr(0x80)}-{chr(0x84)}{chr(0x86)}-{chr(0x9F)}]"
_MOJI_DOUBLE = (
    "Ã©|Ã¨|Ã¡|Ã³|Ãº"
    "|Ã±|Ã¤|Ã¶|Ã¼"
    "|â€™|â€˜|â€œ"
    "|â€“|â€”|â€¦"
    "|Â°|Â£|Â©|Â®|Â "
)


@register(
    "text_encoding_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_MOJI_REPLACEMENT}')) AS BIGINT)
               AS n_replacement,
           CAST(len(regexp_extract_all(text, '{_MOJI_C1}')) AS BIGINT)
               AS n_c1_controls,
           CAST(len(regexp_extract_all(text, '{_MOJI_DOUBLE}')) AS BIGINT)
               AS n_double_encoded,
           CAST(1000 * (len(regexp_extract_all(text, '{_MOJI_REPLACEMENT}'))
                        + len(regexp_extract_all(text, '{_MOJI_C1}'))
                        + len(regexp_extract_all(text, '{_MOJI_DOUBLE}')))
                // GREATEST(len(text), 1) AS BIGINT) AS mojibake_permille
    FROM documents
    """,
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoding-artifact counts and an exact-integer mojibake
    permille — the encoding gate a web-corpus curation pipeline applies
    before any content filter (see the section comment for the three
    artifact classes). Pure codegen projection; counts verify at zero on
    clean corpora, which is the contract under test (the textfuzz corpus
    carries real C1 bytes through it)."""
    d = _docs(spark, sf_dir)
    n_rep = F.regexp_count("text", F.lit(_MOJI_REPLACEMENT))
    n_c1 = F.regexp_count("text", F.lit(_MOJI_C1))
    n_dbl = F.regexp_count("text", F.lit(_MOJI_DOUBLE))
    return d.select(
        "doc_id",
        n_rep.cast("long").alias("n_replacement"),
        n_c1.cast("long").alias("n_c1_controls"),
        n_dbl.cast("long").alias("n_double_encoded"),
        F.floor(
            (1000 * (n_rep + n_c1 + n_dbl))
            / F.greatest(F.length("text"), F.lit(1))
        ).cast("long").alias("mojibake_permille"),
    )


# ------------------------------------------------ URL / domain extraction
# Web-corpus provenance curation: extract http(s) URL hosts from document
# bodies and aggregate the per-domain footprint (occurrences + distinct
# docs) — the table a domain-level allow/deny list or per-domain quota is
# built from. The host class is written to stay linear in the JVM matcher:
# the literal '://' anchor means the class is only entered after a real
# scheme match, and the class itself is bounded at RFC 1035's 253 chars
# (same lesson as the PII email local part). One extract-all + explode +
# hash aggregate; at 100 TB the aggregate is map-side combinable on the
# domain key.
_URL_HOST = "https?://([A-Za-z0-9.-]{1,253})"


@register(
    "text_url_domains",
    oracle=f"""
    SELECT lower(d) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{_URL_HOST}', 1)) AS d
        FROM documents
    )
    GROUP BY 1
    """,
)
def text_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL footprint over the corpus (occurrences and distinct
    documents), lowercased host key — empty on corpora without URLs,
    which verifies the extraction contract itself."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit(_URL_HOST), 1)
            ).alias("dom"),
        )
        .groupBy(F.lower("dom").alias("domain"))
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
