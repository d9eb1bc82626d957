"""Full-text search primitives: positional inverted index, phrase search,
and the Zipf rank-frequency table.

An inverted index (term → postings with in-document positions) is the core
data structure of text retrieval, and *building* one is a pure shuffle
workload Spark is good at: tokenize (JVM-side ``split``/``posexplode``),
then one map-side-combinable aggregation keyed by (term, doc). Phrase
search is then an equi-join of two postings streams on (doc, position+1) —
no regex rescans of the corpus.

Scale notes (100 TB corpus):
- Index build: one shuffle on (term, doc_id). Stop-word-class terms make
  the *collection* frequency skewed but the aggregation key includes
  doc_id, so no single reducer sees a whole hot term. Output is naturally
  partitionable by term for serving.
- Phrase search: postings are pre-filtered to the query's terms *before*
  the join (predicate pushdown to the scan), so the join input is the
  postings of two terms, not the corpus; the join key (doc_id, pos) is
  unique per side — no expansion.
- Positions are emitted as a comma-joined ordered string (repo convention
  for deterministic collection-valued outputs — struct/array hash layouts
  differ between engines, strings don't).

Reference parity note: the reference repo has no text-search surface
(SURVEY §2.8); this module is part of the training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_ad_etl_spark.operators.registry import register
from polars_ad_etl_spark.sources.star import read_star_parquet

# Shared tokenization CTE: DuckDB zip-unnests the term list with its
# 0-based offsets, mirroring Spark's posexplode exactly.
_TOKENS_CTE = """
    tokens AS (
        SELECT doc_id,
               UNNEST(string_split(text, ' ')) AS term,
               UNNEST(range(len(string_split(text, ' ')))) AS pos
        FROM documents
    )
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, pos) token stream — posexplode is JVM-side and the
    0-based position matches the oracle's ``range(len(...))``."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )


@register(
    "search_inverted_index",
    oracle=f"""
    WITH {_TOKENS_CTE}
    SELECT term, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           STRING_AGG(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions
    FROM tokens
    GROUP BY term, doc_id
    ORDER BY term, doc_id
    """,
)
def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index over the corpus: one row per (term, doc)
    with term frequency and the ordered 0-based position list. Single
    map-side-combinable aggregation; the position list is bounded by
    document length (documents are chunked upstream by
    curation_doc_chunks at 100 TB)."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.groupBy("term", "doc_id")
        .agg(
            F.count("*").alias("tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("pos")),
                    lambda p: p.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
        .orderBy("term", "doc_id")
    )


PHRASE = ("hash", "join")


@register(
    "search_phrase_hits",
    oracle=f"""
    WITH {_TOKENS_CTE}
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM tokens a JOIN tokens b
      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """,
)
def search_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("hash join") via the positional index: postings
    of the two terms equi-joined on (doc_id, adjacent position). Both join
    inputs are filtered to a single term before the shuffle — the plan
    touches two posting lists, never the corpus — and the (doc_id, pos) key
    is unique per side so the join cannot expand."""
    toks = _tokens(spark, sf_dir)
    a = toks.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = toks.filter(F.col("term") == PHRASE[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    hits = a.join(
        b,
        (a.doc_id == b.doc_b) & (b.pos_b == a.pos_a + F.lit(1)),
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.min("pos_a").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "search_zipf_rank",
    oracle=f"""
    WITH {_TOKENS_CTE},
    freq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tokens GROUP BY term
    ), top AS (
        SELECT term, freq FROM freq
        ORDER BY freq DESC, term LIMIT 100
    ), tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM freq)
    SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank,
           term, freq,
           CAST((1000 * SUM(freq) OVER (ORDER BY freq DESC, term
                                        ROWS UNBOUNDED PRECEDING))
                // total AS BIGINT) AS cum_share_permille
    FROM top, tot
    ORDER BY rank
    """,
)
def search_zipf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency head: the top-100 terms with rank and exact
    integer cumulative corpus-share permille. The top-k is a TakeOrdered
    (distributed, no global sort of the vocabulary); the rank/cumsum
    windows then run over the 100-row LIMIT output only (the allowlisted
    bounded-input window class), and the corpus total is a broadcast 1-row
    aggregate."""
    toks = _tokens(spark, sf_dir)
    freq = toks.groupBy("term").agg(F.count("*").alias("freq"))
    top = freq.orderBy(F.desc("freq"), "term").limit(100)
    total = freq.agg(F.sum("freq").alias("total"))
    w = W.orderBy(F.desc("freq"), "term")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_share_permille",
            F.expr("1000 * sum(freq) OVER (ORDER BY freq DESC, term"
                   " ROWS UNBOUNDED PRECEDING)")
            .cast("long"),
        )
        .select(
            "rank",
            "term",
            "freq",
            F.expr("cum_share_permille div total").alias("cum_share_permille"),
        )
        .orderBy("rank")
    )


@register(
    "text_hapax_ratio",
    oracle=f"""
    WITH {_TOKENS_CTE},
    tf AS (
        SELECT d.source, t.term, COUNT(*) AS freq
        FROM tokens t JOIN documents d ON d.doc_id = t.doc_id
        GROUP BY d.source, t.term
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(COUNT(*) FILTER (WHERE freq = 1) AS BIGINT) AS n_hapax,
           CAST((1000 * COUNT(*) FILTER (WHERE freq = 1)) // COUNT(*)
                AS BIGINT) AS hapax_permille
    FROM tf GROUP BY source ORDER BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source: the fraction of each source's
    vocabulary occurring exactly once — high hapax ratio flags noisy or
    OCR-damaged sources, near-zero flags templated/boilerplate ones (the
    companion signal to [[text_vocab_growth_by_source]]'s Heaps curve).
    Two stacked map-side-combinable aggregations keyed by (source, term);
    the source column rides the tokenize projection so no join with the
    documents table is needed on the Spark side."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("freq"))
    return (
        tf.groupBy("source")
        .agg(
            F.count("*").alias("vocab_size"),
            F.sum((F.col("freq") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            "source",
            "vocab_size",
            "n_hapax",
            F.expr("(1000 * n_hapax) div vocab_size").alias(
                "hapax_permille"
            ),
        )
        .orderBy("source")
    )


@register(
    "text_source_vocab_jaccard",
    oracle=f"""
    WITH {_TOKENS_CTE},
    vocab AS (
        SELECT DISTINCT d.source, t.term
        FROM tokens t JOIN documents d ON d.doc_id = t.doc_id
    ), sizes AS (
        SELECT source, COUNT(*) AS v FROM vocab GROUP BY source
    ), inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_common
        FROM vocab a JOIN vocab b
          ON a.term = b.term AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(sa.v + sb.v - n_common AS BIGINT) AS n_union,
           CAST((1000 * n_common) // (sa.v + sb.v - n_common) AS BIGINT)
               AS jaccard_permille
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY source_a, source_b
    """,
)
def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the dataset-mixing
    diagnostic (two sources with near-identical vocabularies add less
    diversity than their token counts suggest). The intersection join is
    keyed by TERM over the deduplicated (source, term) vocabulary — at
    100 TB that table is |sources|·|vocab|, tiny next to the corpus, and
    per-term fan-out is bounded by |sources|². Sizes broadcast onto the
    |sources|² result."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    vocab = (
        docs.select("source", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("v"))
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, ["term"])
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("v").alias("va")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("v").alias("vb")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (F.col("va") + F.col("vb") - F.col("n_common")).alias("n_union"),
            F.expr("(1000 * n_common) div (va + vb - n_common)").alias(
                "jaccard_permille"
            ),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "search_proximity_hits",
    oracle=f"""
    WITH {_TOKENS_CTE}
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(abs(b.pos - a.pos)) AS BIGINT) AS min_distance
    FROM tokens a JOIN tokens b
      ON b.doc_id = a.doc_id
     AND b.pos BETWEEN a.pos - 3 AND a.pos + 3
     AND b.pos <> a.pos
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """,
)
def search_proximity_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search ("hash" NEAR/3 "join", either order): co-occurrence
    pairs within a ±3-token window, from the same pre-filtered posting
    lists as [[search_phrase_hits]]. The position-range predicate rides a
    doc_id equi join (bounded ±3 fan-out per posting), so the plan stays a
    hash join — no interval machinery needed at this window size."""
    toks = _tokens(spark, sf_dir)
    a = toks.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = toks.filter(F.col("term") == PHRASE[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    pairs = a.join(
        b,
        (a.doc_id == b.doc_b)
        & (F.col("pos_b") >= F.col("pos_a") - 3)
        & (F.col("pos_b") <= F.col("pos_a") + 3)
        & (F.col("pos_b") != F.col("pos_a")),
    )
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.abs(F.col("pos_b") - F.col("pos_a")))
            .cast("long")
            .alias("min_distance"),
        )
        .orderBy("doc_id")
    )


@register(
    "search_ranked_retrieval",
    oracle=f"""
    WITH {_TOKENS_CTE},
    tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tokens WHERE term IN ('{PHRASE[0]}', '{PHRASE[1]}')
        GROUP BY 1, 2
    ), df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT doc_id,
           CAST(SUM(tf.tf * ((1000 * n.n) // df.df)) AS BIGINT) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched
    FROM tf JOIN df USING (term), n
    GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def search_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval for the query {"hash", "join"}: score = Σ tf ×
    idf_proxy with the integer idf proxy 1000·N/df (monotone in true IDF —
    ranking-equivalent without logs, hence exactly comparable across
    engines). Postings pre-filtered to the query terms; document frequency
    is a |terms|-row aggregate and the corpus size a broadcast scalar;
    top-20 by (score, doc_id) is TakeOrdered. This is the index-serving
    query completing build → phrase → proximity → ranked."""
    toks = _tokens(spark, sf_dir)
    tf = (
        toks.filter(F.col("term").isin(*PHRASE))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = (
        read_star_parquet(spark, f"{sf_dir}/documents.parquet")
        .agg(F.count("*").alias("n"))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.expr("(1000 * n) div df")
            ).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "text_bigram_lm_table",
    oracle=f"""
    WITH {_TOKENS_CTE},
    bigrams AS (
        SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
        FROM tokens a JOIN tokens b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
    ), totals AS (
        SELECT w1, CAST(SUM(c) AS BIGINT) AS t FROM bigrams GROUP BY w1
    ), ranked AS (
        SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS c,
               CAST((1000 * b.c) // t.t AS BIGINT) AS p_permille,
               ROW_NUMBER() OVER (PARTITION BY b.w1
                                  ORDER BY b.c DESC, b.w2) AS rn
        FROM bigrams b JOIN totals t USING (w1)
    )
    SELECT w1, w2, c, p_permille
    FROM ranked WHERE rn <= 3
    ORDER BY w1, p_permille DESC, w2
    """,
)
def text_bigram_lm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram language-model table: for every context word, its top-3
    next words with exact integer permille conditional probability — the
    word-level sibling of [[text_char_trigram_table]] and the statistical
    core of next-token modeling. Adjacent-position self-join on (doc, pos)
    builds the bigram counts; the per-context top-3 window partitions on
    the context word."""
    toks = _tokens(spark, sf_dir)
    a = toks.select("doc_id", F.col("pos").alias("p"), F.col("term").alias("w1"))
    b = toks.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("term").alias("w2"),
    )
    bigrams = (
        a.join(b, (a.doc_id == b.d2) & (F.col("p2") == F.col("p") + 1))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    totals = bigrams.groupBy("w1").agg(F.sum("c").alias("t"))
    ranked = (
        bigrams.join(F.broadcast(totals), "w1")
        .withColumn("p_permille", F.expr("(1000 * c) div t"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("w1").orderBy(F.desc("c"), "w2")
            ),
        )
    )
    return (
        ranked.filter(F.col("rn") <= 3)
        .select("w1", "w2", "c", "p_permille")
        .orderBy("w1", F.desc("p_permille"), "w2")
    )


@register(
    "text_token_fertility",
    oracle=f"""
    WITH {_TOKENS_CTE},
    per_doc AS (
        SELECT t.doc_id, d.lang, d.n_chars, COUNT(*) AS n_tokens
        FROM tokens t JOIN documents d ON d.doc_id = t.doc_id
        GROUP BY 1, 2, 3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST((1000 * SUM(n_tokens)) // SUM(n_chars) AS BIGINT)
               AS tokens_per_kchar
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens produced per thousand
    characters — the compression-cost metric that decides whether a
    tokenizer (or its vocab allocation) penalizes a language (high
    fertility = more tokens per content unit = more compute per document).
    Exact integer ratio over per-language totals; two stacked
    aggregations."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    # fertility is undefined for a doc with no text: excluded, matching the
    # oracle's token CTE (a NULL text yields no token rows to join back)
    per_doc = docs.where(F.col("text").isNotNull()).select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "total_chars",
            F.expr("(1000 * total_tokens) div total_chars").alias(
                "tokens_per_kchar"
            ),
        )
        .orderBy("lang")
    )


@register(
    "text_char_simpson",
    oracle="""
    WITH chars AS (
        -- ch <> '': DuckDB string_split('', '') yields [''] where Spark's
        -- split yields nothing — an empty document has no characters
        SELECT doc_id, ch FROM (
            SELECT doc_id, UNNEST(string_split(text, '')) AS ch
            FROM documents
        ) WHERE ch <> ''
    ), per_char AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_chars_tok,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq
        FROM per_char GROUP BY doc_id
    )
    SELECT doc_id, n_chars_tok,
           CAST((1000 * (n_chars_tok * n_chars_tok - sum_sq))
                // (n_chars_tok * n_chars_tok) AS BIGINT)
               AS char_diversity_permille
    FROM per_doc
    ORDER BY char_diversity_permille, doc_id
    LIMIT 50
    """,
)
def text_char_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Gini-Simpson diversity per document, lowest-50
    shortlist: near-zero means the document is dominated by a few
    characters (padding spam, ASCII art, corrupted decode) — the
    byte-level sibling of the token-level repetition scores, in exact
    integer permille. Spark's split-on-empty and DuckDB's
    string_split('') both yield per-character arrays, so the explode is
    engine-identical."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = per_char.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars_tok"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_chars_tok",
            F.expr(
                "(1000 * (n_chars_tok * n_chars_tok - sum_sq))"
                " div (n_chars_tok * n_chars_tok)"
            ).alias("char_diversity_permille"),
        )
        .orderBy("char_diversity_permille", "doc_id")
        .limit(50)
    )


@register(
    "search_autocomplete_table",
    oracle=f"""
    WITH {_TOKENS_CTE},
    freq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tokens GROUP BY term
    ), ranked AS (
        SELECT substr(term, 1, 2) AS prefix, term, freq,
               ROW_NUMBER() OVER (PARTITION BY substr(term, 1, 2)
                                  ORDER BY freq DESC, term) AS rn
        FROM freq
    )
    SELECT prefix, term, freq, CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= 3
    ORDER BY prefix, rank
    """,
)
def search_autocomplete_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete/search-suggest table: for every 2-character prefix, the
    top-3 corpus terms by frequency — the precomputed structure a
    type-ahead service serves from (per-prefix ranking, deterministic
    ties). One vocabulary aggregate; the ranking window partitions on the
    prefix key, which is high-cardinality at real vocabulary sizes."""
    toks = _tokens(spark, sf_dir)
    freq = toks.groupBy("term").agg(F.count("*").alias("freq"))
    ranked = freq.select(
        F.substring("term", 1, 2).alias("prefix"),
        "term",
        "freq",
        F.row_number()
        .over(
            W.partitionBy(F.substring("term", 1, 2)).orderBy(
                F.desc("freq"), "term"
            )
        )
        .alias("rank"),
    )
    return (
        ranked.filter(F.col("rank") <= 3)
        .select("prefix", "term", "freq", F.col("rank").cast("long"))
        .orderBy("prefix", "rank")
    )


@register(
    "text_term_position_bias",
    oracle=f"""
    WITH {_TOKENS_CTE},
    lens AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM tokens GROUP BY doc_id
    ), rel AS (
        SELECT t.term,
               (1000 * t.pos) // GREATEST(l.len - 1, 1) AS rel_permille
        FROM tokens t JOIN lens l ON l.doc_id = t.doc_id
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(SUM(rel_permille) // COUNT(*) AS BIGINT)
               AS mean_position_permille
    FROM rel GROUP BY term
    HAVING COUNT(*) >= 20
    ORDER BY mean_position_permille, term
    """,
)
def text_term_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional bias per term: the mean relative in-document position
    (0 = always opens documents, 1000 = always closes them) — terms pinned
    near 0 are header/boilerplate candidates the [[text_boilerplate_ngrams]]
    dictionary should absorb, terms near 1000 are signature/footer
    candidates. Exact integer: per-occurrence permille offset, truncated
    mean per term; one join against the per-doc length aggregate."""
    toks = _tokens(spark, sf_dir)
    lens = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    rel = toks.join(lens, "doc_id").select(
        "term",
        F.expr("(1000 * pos) div greatest(len - 1, 1)").alias(
            "rel_permille"
        ),
    )
    return (
        rel.groupBy("term")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.expr("sum(rel_permille) div count(*)").alias(
                "mean_position_permille"
            ),
        )
        .filter(F.col("n_occurrences") >= 20)
        .orderBy("mean_position_permille", "term")
    )


@register(
    "text_term_burstiness",
    oracle=f"""
    WITH {_TOKENS_CTE},
    per_doc AS (
        SELECT t.term, t.doc_id, COUNT(*) AS c
        FROM tokens t GROUP BY 1, 2
    ), n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    stats AS (
        SELECT term,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS ss,
               CAST(COUNT(*) AS BIGINT) AS docs_present
        FROM per_doc GROUP BY term
    )
    SELECT term, s AS total_occurrences, docs_present,
           CAST((1000 * (nd * ss - s * s)) // (nd * s) AS BIGINT)
               AS fano_permille
    FROM stats, n_docs
    WHERE s >= 100
    ORDER BY fano_permille DESC, term
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Fano factor over per-document counts, absent docs
    counted as zero): variance-to-mean in exact integer permille —
    1000 means Poisson-like scattering (function words), higher means the
    term clusters in few documents (content/topic words), the signal
    behind burstiness-weighted retrieval. The absent-document mass folds
    in algebraically (zeros contribute nothing to Σc or Σc², only to N),
    so no term×document grid materializes — one (term, doc) aggregate and
    a broadcast corpus size."""
    toks = _tokens(spark, sf_dir)
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    nd = (
        read_star_parquet(spark, f"{sf_dir}/documents.parquet")
        .agg(F.count("*").alias("nd"))
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count("*").alias("docs_present"),
    )
    return (
        stats.crossJoin(F.broadcast(nd))
        .filter(F.col("s") >= 100)
        .select(
            "term",
            F.col("s").alias("total_occurrences"),
            "docs_present",
            F.expr("(1000 * (nd * ss - s * s)) div (nd * s)").alias(
                "fano_permille"
            ),
        )
        .orderBy(F.desc("fano_permille"), "term")
    )


@register(
    "corpus_health_scorecard",
    oracle=f"""
    WITH {_TOKENS_CTE},
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
        FROM documents
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab_size,
               CAST(COUNT(*) AS BIGINT) AS total_tokens
        FROM tokens
    ),
    uniq AS (
        SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
        FROM documents
    ),
    langs AS (
        SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    )
    SELECT b.n_docs, b.total_chars, b.mean_chars,
           v.vocab_size, v.total_tokens,
           u.n_unique_texts,
           CAST((1000 * u.n_unique_texts) // b.n_docs AS BIGINT)
               AS unique_permille,
           l.n_langs
    FROM base b, vocab v, uniq u, langs l
    """,
)
def corpus_health_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row executive scorecard a corpus release attaches: volume
    (docs, chars, mean length), vocabulary size and token count,
    exact-duplicate uniqueness share, and language coverage — each number
    the headline of a family verified in depth elsewhere in this registry
    ([[dedup_exact_documents]], [[text_vocab_growth_by_source]],
    [[corpus_datasheet]] is its per-source sibling). Four independent
    1-row aggregates crossed together — every side broadcast."""
    docs = read_star_parquet(spark, f"{sf_dir}/documents.parquet")
    toks = _tokens(spark, sf_dir)
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        # nullif: an empty corpus reports NULL means, not an ANSI error
        F.expr("sum(n_chars) div nullif(count(*), 0)").alias("mean_chars"),
    )
    vocab = toks.agg(
        F.count_distinct("term").alias("vocab_size"),
        F.count("*").alias("total_tokens"),
    )
    uniq = docs.agg(
        F.count_distinct(F.md5("text")).alias("n_unique_texts")
    )
    langs = docs.agg(F.count_distinct("lang").alias("n_langs"))
    return (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(uniq))
        .crossJoin(F.broadcast(langs))
        .select(
            "n_docs",
            "total_chars",
            "mean_chars",
            "vocab_size",
            "total_tokens",
            "n_unique_texts",
            F.expr("(1000 * n_unique_texts) div nullif(n_docs, 0)").alias(
                "unique_permille"
            ),
            "n_langs",
        )
    )
