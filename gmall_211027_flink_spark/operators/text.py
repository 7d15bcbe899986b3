"""Text-analysis operators over the documents table — language ID,
quality scoring, token counting, fingerprinting (training-data-pipeline
operators added on top of the reference surface; the reference's only
text op is the IK keyword tokenizer UDTF, app/func/SplitFunction.java:12-28,
which maps to split+explode — see plans/ads.py keyword query).

All expressions stay JVM-side (split/size/regexp/aggregate) — a 100 TB
corpus runs these as a single map stage with no shuffle, so throughput is
scan-bound. Ratios are single double divisions of exact integer counts
(portable bit-for-bit to the DuckDB oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import ORACLES, query

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "zu", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"),
    "es": ("el", "la", "los", "y", "es", "de", "un", "una", "en", "por"),
}


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# Language ID: stopword-hit-ratio per language + CJK character check.
# ---------------------------------------------------------------------------

def _lang_id_oracle() -> str:
    hit_cols = ",\n".join(
        f"      len(list_filter(w, t -> list_contains([{_sql_list(ws)}], t))) AS hits_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    greatest = ", ".join(f"hits_{lang}" for lang in STOPWORDS)
    case = "\n".join(
        f"        WHEN hits_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in STOPWORDS
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), hits AS (
      SELECT doc_id, lang, len(w) AS n_tokens,
{hit_cols},
      regexp_matches(list_aggregate(w, 'string_agg', ' '), '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
      FROM toks
    ), best AS (
      SELECT *, greatest({greatest}) AS best FROM hits
    )
    SELECT doc_id, lang AS labeled_lang,
      CASE
        WHEN has_cjk THEN 'zh'
{case}
        ELSE 'und' END AS predicted_lang,
      CAST(best AS BIGINT) AS stopword_hits,
      n_tokens
    FROM best
    """


@query("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    df = docs.select("doc_id", "lang", "text", F.split("text", " ").alias("w"))
    for lang, ws in STOPWORDS.items():
        arr = "array(" + ", ".join(f"'{w}'" for w in ws) + ")"
        df = df.withColumn(
            f"hits_{lang}",
            F.expr(f"size(filter(w, t -> array_contains({arr}, t)))"))
    df = df.withColumn("has_cjk", F.col("text").rlike("[\\u4e00-\\u9fff]"))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.when(F.col("has_cjk"), F.lit("zh"))
    for lang in STOPWORDS:
        pred = pred.when((F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return df.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("bigint").alias("stopword_hits"),
        F.size("w").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword / repetition signals.
# ---------------------------------------------------------------------------

@query(
    "text_quality_score",
    bench=True,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains([{_sql_list(STOPWORDS["en"])}], t))) AS stop_hits,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
      CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
      CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
      CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
      CASE WHEN n_tokens >= 10 AND n_tokens <= 1000
             AND CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.3
           THEN 1 ELSE 0 END AS quality_pass
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    en = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + ")"
    t = docs.select(
        "doc_id", "n_chars",
        F.split("text", " ").alias("w"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).alias("n_punct"),
    ).select(
        "doc_id", "n_chars", "n_punct",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.expr(f"size(filter(w, t -> array_contains({en}, t)))").alias("stop_hits"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    return t.select(
        "doc_id", "n_chars", "n_tokens",
        distinct_ratio.alias("distinct_ratio"),
        (F.col("stop_hits").cast("double") / F.col("n_tokens").cast("double"))
            .alias("stopword_ratio"),
        (F.col("n_punct").cast("double") / F.col("n_chars").cast("double"))
            .alias("punct_ratio"),
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000)
               & (distinct_ratio > 0.3), 1).otherwise(0).alias("quality_pass"),
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex segmentation.
# ---------------------------------------------------------------------------

@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_estimate"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: full digest + positional rolling sketch.
# The rolling sketch takes every 4th word-3-gram's md5 and keeps the
# lexicographic min — a winnowing-style representative fingerprint.
# ---------------------------------------------------------------------------

@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id, md5(text) AS full_md5, string_split(text, ' ') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, full_md5,
             MIN(CASE WHEN i % 4 = 1
                 THEN md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS winnow_min
      FROM t, UNNEST(generate_series(1, greatest(len(w)-2, 0))) AS s(i)
      GROUP BY 1, 2
    )
    SELECT doc_id, full_md5, winnow_min,
           substr(full_md5, 1, 4) AS shard_bucket
    FROM grams
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.md5("text").alias("full_md5"),
                    F.split("text", " ").alias("w"))
    return t.select(
        "doc_id", "full_md5",
        F.expr(
            "array_min(transform(filter("
            " if(size(w) >= 3, sequence(1, size(w)-2), cast(array() as array<int>)),"
            " i -> i % 4 = 1),"
            " i -> md5(concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2)))))"
        ).alias("winnow_min"),
        F.substring("full_md5", 1, 4).alias("shard_bucket"),
    )


# ---------------------------------------------------------------------------
# Repetition ratio: the boilerplate/spam signal (most-frequent-token
# share + duplicate word-3-gram fraction). Computed ENTIRELY map-side
# with higher-order functions — per-doc O(distinct·n) beats two shuffles
# of exploded tokens at corpus scale, and the corpus never moves.
# ---------------------------------------------------------------------------

@query(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT doc_id,
             len(w) AS n_tokens,
             list_max(list_transform(list_distinct(w),
               t -> len(list_filter(w, x -> x = t)))) AS max_tok,
             greatest(len(w) - 2, 0) AS n3,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS d3
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(max_tok AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_share,
           CASE WHEN n3 > 0
                THEN 1.0 - CAST(d3 AS DOUBLE) / CAST(n3 AS DOUBLE)
                ELSE 0.0 END AS dup_3gram_ratio
    FROM m
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.expr("array_max(transform(array_distinct(w),"
               " t -> size(filter(w, x -> x = t))))").alias("max_tok"),
        F.expr("greatest(size(w) - 2, 0)").alias("n3"),
        F.expr("size(array_distinct(transform("
               " if(size(w) >= 3, sequence(1, size(w)-2), cast(array() as array<int>)),"
               " i -> concat_ws(' ', element_at(w,i), element_at(w,i+1),"
               " element_at(w,i+2)))))").alias("d3"),
    )
    return m.select(
        "doc_id", "n_tokens",
        (F.col("max_tok").cast("double") / F.col("n_tokens").cast("double"))
            .alias("top_token_share"),
        F.when(F.col("n3") > 0,
               F.lit(1.0) - F.col("d3").cast("double") / F.col("n3").cast("double"))
         .otherwise(F.lit(0.0)).alias("dup_3gram_ratio"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top-3 highest-scoring terms per document
# (tf = in-doc count, idf = ln(N / df)). Scale shape: one explode →
# two-phase (doc,term) count, the document-frequency table is a second
# small agg broadcast back, ranking is a per-doc window. The idf double
# is rounded to 6 dp BEFORE ranking so Spark and DuckDB rank identically
# (raw float ordering could flip on last-bit differences — same
# convention as the ANN cosine ranking in similarity.py).
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


@query(
    "text_tfidf_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, rk AS rank, term, tfidf
    FROM ranked WHERE rk <= {TFIDF_TOP_K}
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count("*").alias("n"))
    tf = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "term").crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# Text normalization (the cleanup pass before dedup/tokenization):
# lowercase, collapse whitespace runs, strip leading/trailing space —
# emitted with a changed flag and the normalized length so downstream
# stats don't re-scan. Pure JVM expressions; the oracle runs the same
# regex (\s+ means the same class in Java regex and RE2).
# ---------------------------------------------------------------------------

@query(
    "text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                AS BIGINT) AS norm_len,
           (trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> text)
             AS changed
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("norm_len"),
        (norm != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Document chunking: fixed-size overlapping word windows (size 50,
# stride 40) — the context-window chunking pass an LLM training/RAG
# pipeline runs on every document. One map-side explode per doc (chunk
# count = ceil(max(words-overlap,1)/stride)); chunk_idx keeps provenance
# so chunks can be traced back and de-overlapped. The final (short)
# chunk is kept — dropping tails silently loses corpus (No silent caps).
# ---------------------------------------------------------------------------

CHUNK_SIZE = 50
CHUNK_STRIDE = 40


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(t.i AS BIGINT) AS chunk_idx,
             array_to_string(w[1 + t.i * {CHUNK_STRIDE} :
                               t.i * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
               AS chunk_text,
             least(len(w) - t.i * {CHUNK_STRIDE}, {CHUNK_SIZE}) AS n_tokens
      FROM toks,
           UNNEST(generate_series(0,
             CAST(ceil(greatest(len(w) - {CHUNK_SIZE}, 0)
                       / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_idx, chunk_text, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.expr(
        f"cast(ceil(greatest(size(w) - {CHUNK_SIZE}, 0) / "
        f"cast({CHUNK_STRIDE} as double)) as bigint)")
    return (
        w.select(
            "doc_id", "w",
            F.explode(F.expr(
                f"sequence(cast(0 as bigint), "
                f"cast(ceil(greatest(size(w) - {CHUNK_SIZE}, 0) / "
                f"cast({CHUNK_STRIDE} as double)) as bigint))")).alias("chunk_idx"))
        .select(
            "doc_id", "chunk_idx",
            F.expr(f"concat_ws(' ', slice(w, cast(1 + chunk_idx * {CHUNK_STRIDE} as int),"
                   f" {CHUNK_SIZE}))").alias("chunk_text"),
            F.least(F.size("w") - F.col("chunk_idx").cast("int") * CHUNK_STRIDE,
                    F.lit(CHUNK_SIZE)).cast("bigint").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# Rule-based quality FILTERING (Gopher/C4-style keep-or-drop with a drop
# reason, vs text_quality_score's continuous score): each rule is a pure
# JVM expression over the split-once word array; precedence is fixed so
# the verdict is deterministic. At 100 TB this is one map stage — the
# conditional aggregation at the end is a 5x|lang| grid.
# ---------------------------------------------------------------------------

QF_MIN_WORDS = 20
QF_MAX_WORDS = 80
QF_STOP_RATIO_PCT = 5          # stopword hits must be >= 5% of words
QF_DISTINCT_RATIO_PCT = 50     # distinct words must be >= 50% of words
_QF_STOPS = ("the", "a", "of", "and", "to", "in", "is",
             "on", "for", "with")


@query(
    "quality_filter_rules",
    oracle=f"""
    WITH t AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    verdicts AS (
      SELECT lang,
        CASE
          WHEN len(w) < {QF_MIN_WORDS} THEN 'too_short'
          WHEN len(w) > {QF_MAX_WORDS} THEN 'too_long'
          WHEN len(list_filter(w, x -> list_contains([{_sql_list(_QF_STOPS)}], x)))
               * 100 < len(w) * {QF_STOP_RATIO_PCT} THEN 'low_stopword'
          WHEN len(list_distinct(w)) * 100
               < len(w) * {QF_DISTINCT_RATIO_PCT} THEN 'repetitive'
          ELSE 'kept'
        END AS verdict
      FROM t
    )
    SELECT lang, verdict, COUNT(*) AS doc_ct
    FROM verdicts GROUP BY 1, 2
    """,
)
def quality_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.split("text", " ").alias("w"))
    stops = _sql_list(_QF_STOPS)
    nw = F.size("w")
    stop_hits = F.expr(
        f"size(filter(w, x -> array_contains(array({stops}), x)))")
    distinct_ct = F.size(F.array_distinct("w"))
    verdict = (
        F.when(nw < QF_MIN_WORDS, "too_short")
        .when(nw > QF_MAX_WORDS, "too_long")
        .when(stop_hits * 100 < nw * QF_STOP_RATIO_PCT, "low_stopword")
        .when(distinct_ct * 100 < nw * QF_DISTINCT_RATIO_PCT, "repetitive")
        .otherwise("kept"))
    return (
        docs.select("lang", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count("*").alias("doc_ct"))
    )


# ---------------------------------------------------------------------------
# Unigram (word) entropy per document — the cheap perplexity proxy a
# quality pipeline uses before any model-based filter. Two keyed
# aggregations (word counts per doc, then the entropy fold); both shuffle
# on doc_id only, so the corpus distributes evenly at any scale.
#
# EXACTNESS (hardened round 10, float-discipline sweep): the entropy
# fold was an UNORDERED double SUM of p*log2(p) terms — the
# stats_cramers_v failure class. Each term is deterministic per
# (doc, word) row from exact integer (c, n); it is half-up-quantized to
# BIGINT at 1e-9 BEFORE the sum, the sum is exact (order-free), and the
# emitted entropy is the single deterministic double -sum/1e9.
# ---------------------------------------------------------------------------

@query(
    "text_word_entropy",
    oracle="""
    WITH wc AS (
      SELECT doc_id, t.word, COUNT(*) AS c
      FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
      GROUP BY 1, 2
    ),
    n AS (SELECT doc_id, SUM(c) AS n FROM wc GROUP BY 1)
    SELECT wc.doc_id,
           CAST(n.n AS BIGINT) AS n_words,
           CAST(-SUM(CAST(floor((c / CAST(n.n AS DOUBLE))
                                * log2(c / CAST(n.n AS DOUBLE))
                                * 1000000000 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000000.0 AS entropy
    FROM wc JOIN n ON wc.doc_id = n.doc_id
    GROUP BY 1, 2
    """,
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
          .groupBy("doc_id", "word").agg(F.count("*").alias("c")))
    n = wc.groupBy(F.col("doc_id").alias("n_doc")).agg(
        F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    tq = F.floor(p * F.log2(p) * F.lit(1000000000.0)
                 + F.lit(0.5)).cast("bigint")
    return (
        wc.join(n, F.col("doc_id") == F.col("n_doc"))
        .groupBy("doc_id", F.col("n").cast("bigint").alias("n_words"))
        .agg(((-F.sum(tq)).cast("double") / F.lit(1000000000.0))
             .alias("entropy"))
    )


# ---------------------------------------------------------------------------
# PII detection/redaction: find long digit runs (account-number-shaped
# identifiers) and redact them. Regex stays in the RE2/Java-regex common
# subset so the DuckDB oracle matches byte-for-byte; at 100 TB this is a
# pure map stage over the scanned column. The test corpus's PII-shaped
# column is customer.c_name ('Customer#000000042').
# ---------------------------------------------------------------------------

PII_DIGIT_RUN = "[0-9]{6,}"


@query(
    "pii_redact_ids",
    oracle=f"""
    SELECT c_custkey,
           regexp_replace(c_name, '{PII_DIGIT_RUN}', '<ID>', 'g')
             AS redacted,
           len(regexp_extract_all(c_name, '{PII_DIGIT_RUN}')) AS pii_ct
    FROM customer
    """,
)
def pii_redact_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", PII_DIGIT_RUN, "<ID>").alias("redacted"),
        F.size(F.expr(f"regexp_extract_all(c_name, '{PII_DIGIT_RUN}', 0)"))
         .cast("bigint").alias("pii_ct"))


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics — the tokenizer-training prep pass: global
# word counts and adjacent-pair (bigram) counts, the exact aggregation a
# BPE trainer's first merge iteration reads. Both are explode+groupBy on
# content keys — fully distributed, partial-aggregated map-side; the
# top-k is orderBy+limit (TakeOrdered, no global sort). Deterministic
# tiebreak on the token text keeps LIMIT stable across engines.
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 50


@query(
    "vocab_bigram_counts",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bigrams AS (
      SELECT w[i] || ' ' || w[i+1] AS bigram
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    )
    SELECT bigram, COUNT(*) AS pair_ct
    FROM bigrams GROUP BY 1
    ORDER BY pair_ct DESC, bigram
    LIMIT {VOCAB_TOP_K}
    """,
)
def vocab_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w"))
    # guard 1-word docs: Spark's sequence(1, 0) infers step -1 and
    # yields [1, 0] (element_at(w, 0) then throws); DuckDB's
    # generate_series(1, 0) is empty. The case keeps both engines empty.
    bigrams = docs.select(F.explode(F.expr(
        "case when size(w) >= 2 then"
        " transform(sequence(1, size(w) - 1),"
        "  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
        " else array() end"
    )).alias("bigram"))
    return (
        bigrams.groupBy("bigram").agg(F.count("*").alias("pair_ct"))
        .orderBy(F.desc("pair_ct"), "bigram")
        .limit(VOCAB_TOP_K)
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (CCNet-style quality signal): train an
# add-one-smoothed bigram model ON THE CORPUS ITSELF, then score each
# document by its mean bigram log-probability — low scores flag
# machine-garbled / unnatural-token-order text that length and stopword
# heuristics miss. (CCNet/KenLM score against a reference-corpus model;
# the operator takes any (w1 -> count) / (bigram -> count) tables, so
# swapping in Wikipedia counts is a join-input change, not a new plan.)
#
# Scale shape: counts are two-phase aggs; scoring joins each bigram
# INSTANCE to the model on the bigram key (hash shuffle — the model side
# can exceed broadcast size at corpus scale) and the unigram context
# count rides along from a second, smaller join; per-doc mean is one
# final groupBy(doc_id).
#
# EXACTNESS (hardened round 10, float-discipline sweep): the per-doc
# mean was an UNORDERED double SUM of ln terms — the stats_cramers_v
# failure class. Each logprob is deterministic per bigram instance
# from exact integer (c2, c1, v); it is half-up-quantized to BIGINT at
# 1e-9 BEFORE the sum (order-free exact sum), and avg_logprob is the
# single deterministic double sum/(n*1e9). The downstream
# quality_threshold_calibration percentile + cutoff compares therefore
# see identical doubles in both engines.
# ---------------------------------------------------------------------------

@query(
    "text_lm_score",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    inst AS (
      SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bigram
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    ),
    uni AS (
      SELECT w1, COUNT(*) AS c1 FROM
        (SELECT doc_id, unnest(w) AS w1 FROM toks) GROUP BY 1
    ),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    big AS (SELECT bigram, COUNT(*) AS c2 FROM inst GROUP BY 1)
    SELECT i.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(floor(ln(CAST(b.c2 + 1 AS DOUBLE)
                                  / (u.c1 + vocab.v))
                               * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 1000000000.0) AS avg_logprob
    FROM inst i
    JOIN big b ON b.bigram = i.bigram
    JOIN uni u ON u.w1 = i.w1
    CROSS JOIN vocab
    GROUP BY 1
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w"))
    inst = docs.select(
        "doc_id",
        F.explode(F.expr(
            "case when size(w) >= 2 then"
            " transform(sequence(1, size(w) - 1),"
            "  i -> struct(element_at(w, i) as w1,"
            "   concat_ws(' ', element_at(w, i), element_at(w, i + 1))"
            "   as bigram))"
            " else array() end")).alias("p")
    ).select("doc_id", "p.w1", "p.bigram")
    uni = (docs.select(F.explode("w").alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("c1")))
    vocab = uni.agg(F.count("*").alias("v"))
    big = inst.groupBy("bigram").agg(F.count("*").alias("c2"))
    logprob = F.log((F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")))
    lq = F.floor(logprob * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint")
    return (
        inst.join(big, "bigram")
        # no broadcast hint on uni: a web-scale vocab is GBs (Zipf keeps
        # it sublinear but not broadcast-small); AQE broadcasts when it
        # actually fits
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             (F.sum(lq).cast("double")
              / (F.count("*") * F.lit(1000000000.0))).alias("avg_logprob"))
    )


# ---------------------------------------------------------------------------
# PMI collocations: rank adjacent word pairs by pointwise mutual
# information — the classic phrase-mining signal (Church & Hanks 1990)
# a tokenizer-vocabulary pipeline runs to promote multi-word units.
#
# Scale shape: two two-phase counts (unigrams, adjacent bigrams — both
# map-side partial), the two scalar totals ride in as broadcast rows,
# the bigram->unigram joins are keyed hash joins (vocab can exceed
# broadcast size; AQE decides), and the final top-k is a rank over one
# small filtered set. PMI is ln of double ratios of exact counts with
# the repo's 6-dp boundary round; ties at equal rounded PMI break on
# the bigram string, so the top-k cut is a total order in both engines.
# ---------------------------------------------------------------------------

PMI_MIN_PAIR_CT = 5     # ignore rare pairs (PMI explodes on singletons)
PMI_TOP_K = 50


@query(
    "vocab_pmi_topk",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
    inst AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    ),
    uni AS (
      SELECT w1 AS word, COUNT(*) AS c FROM
        (SELECT unnest(w) AS w1 FROM toks) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM inst) AS n2
    ),
    big AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM inst GROUP BY 1, 2
      HAVING COUNT(*) >= {PMI_MIN_PAIR_CT}
    ),
    scored AS (
      SELECT b.w1 || ' ' || b.w2 AS bigram, b.c2 AS pair_ct,
             round(ln((CAST(b.c2 AS DOUBLE) / t.n2)
                      / ((CAST(ua.c AS DOUBLE) / t.n1)
                         * (CAST(ub.c AS DOUBLE) / t.n1))), 6) AS pmi
      FROM big b
      JOIN uni ua ON ua.word = b.w1
      JOIN uni ub ON ub.word = b.w2
      CROSS JOIN tot t
    )
    SELECT bigram, pair_ct, pmi FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS rk
      FROM scored
    ) WHERE rk <= {PMI_TOP_K}
    """,
)
def vocab_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k adjacent-pair collocations by PMI (pair count >= threshold)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w"))
    inst = docs.select(F.explode(F.expr(
        "case when size(w) >= 2 then"
        " transform(sequence(1, size(w) - 1),"
        "  i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))"
        " else array() end")).alias("p")).select("p.w1", "p.w2")
    uni = (docs.select(F.explode("w").alias("word"))
           .groupBy("word").agg(F.count("*").alias("c")))
    tot = uni.agg(F.sum("c").cast("bigint").alias("n1")).crossJoin(
        inst.agg(F.count("*").cast("bigint").alias("n2")))
    big = (inst.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
           .filter(F.col("c2") >= PMI_MIN_PAIR_CT))
    ua = uni.select(F.col("word").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("word").alias("w2"), F.col("c").alias("cb"))
    scored = (big.join(ua, "w1").join(ub, "w2")
              .crossJoin(F.broadcast(tot))
              .select(
                  F.concat_ws(" ", "w1", "w2").alias("bigram"),
                  F.col("c2").alias("pair_ct"),
                  F.round(F.log(
                      (F.col("c2").cast("double") / F.col("n2"))
                      / ((F.col("ca").cast("double") / F.col("n1"))
                         * (F.col("cb").cast("double") / F.col("n1")))), 6)
                   .alias("pmi")))
    w = Window.orderBy(F.desc("pmi"), "bigram")
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= PMI_TOP_K)
            .select("bigram", "pair_ct", "pmi"))


# ---------------------------------------------------------------------------
# Quality-threshold calibration: instead of hand-picking an LM-score
# cutoff, set it so a TARGET fraction of the corpus survives (the CCNet
# recipe: keep the best X% by perplexity), then report the per-language
# keep rates that cutoff implies — the skew report a curation run reads
# before freezing the threshold (a global cutoff silently starves
# languages the LM models badly).
#
# Scale shape: scores come from the driver-proven text_lm_score plan;
# the exact interpolated percentile is one single-reduction aggregate
# over the scalar score column (at 100 TB swap in approx_percentile —
# same plan, bounded-error knob); the cutoff broadcasts back as one row
# and the verdict count is a (lang) two-phase agg. Both engines compute
# the same (n-1)*p linear interpolation (Spark `percentile` == DuckDB
# `quantile_cont`), re-synced by the 6-dp boundary round.
# ---------------------------------------------------------------------------

QCAL_KEEP_TARGET = 0.8      # keep the top 80% of docs by LM score


@query(
    "quality_threshold_calibration",
    oracle=f"""
    WITH scores AS ({{lm}}),
    cut AS (
      SELECT round(quantile_cont(avg_logprob, {1 - QCAL_KEEP_TARGET}), 6)
        AS threshold
      FROM scores
    )
    SELECT d.lang, cut.threshold,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN s.avg_logprob >= cut.threshold
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN s.avg_logprob >= cut.threshold
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS keep_rate
    FROM scores s
    JOIN documents d ON d.doc_id = s.doc_id
    CROSS JOIN cut
    GROUP BY 1, 2
    """,
)
def quality_threshold_calibration(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Keep-rate-calibrated LM-score cutoff + per-language keep rates."""
    scores = text_lm_score(spark, sf_dir)
    cut = scores.agg(F.round(
        F.expr(f"percentile(avg_logprob, {1 - QCAL_KEEP_TARGET})"), 6)
        .alias("threshold"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = F.sum(F.when(F.col("avg_logprob") >= F.col("threshold"), 1)
                 .otherwise(0))
    return (scores.join(docs, "doc_id")
            .crossJoin(F.broadcast(cut))
            .groupBy("lang", "threshold")
            .agg(F.count("*").alias("n_docs"),
                 kept.cast("bigint").alias("n_kept"),
                 F.round(kept.cast("double") / F.count("*"), 6)
                  .alias("keep_rate")))


ORACLES["quality_threshold_calibration"] = (
    ORACLES["quality_threshold_calibration"].format(
        lm=ORACLES["text_lm_score"]))


# ---------------------------------------------------------------------------
# BPE tokenizer induction, step 1: corpus-weighted adjacent-symbol-pair
# counts. This is the distributed-expensive half of BPE training
# (Sennrich et al. 2016): count every adjacent character pair weighted
# by word frequency; the argmax pair becomes the next merge rule. The
# driver-side training loop then applies the merge and re-counts —
# each round is exactly this plan over a (small, cached) vocab table,
# so the gate query covers the round shape once.
#
# Scale shape: the word-frequency table is the only corpus-sized agg
# (two-phase count over the token explode); pair expansion runs over
# the VOCAB (Zipf: orders of magnitude smaller than the corpus) with
# integer weights — all-exact arithmetic, no float boundary at all.
# ---------------------------------------------------------------------------

BPE_TOP_K = 50


@query(
    "bpe_top_merges",
    oracle=f"""
    WITH wc AS (
      SELECT w1 AS word, COUNT(*) AS ct FROM
        (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
      GROUP BY 1
    ),
    p AS (
      SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2, ct
      FROM wc, UNNEST(generate_series(1, len(word) - 1)) AS t(i)
      WHERE len(word) >= 2
    ),
    agg AS (
      SELECT c1 || c2 AS merge_pair, CAST(SUM(ct) AS BIGINT) AS pair_ct
      FROM p GROUP BY 1
    )
    SELECT merge_pair, pair_ct FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pair_ct DESC, merge_pair) AS rk
      FROM agg
    ) WHERE rk <= {BPE_TOP_K}
    """,
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k BPE merge candidates (adjacent char pairs, corpus-weighted)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .groupBy("word").agg(F.count("*").alias("ct")))
    p = wc.select(
        "ct",
        F.explode(F.expr(
            "case when length(word) >= 2 then"
            " transform(sequence(1, length(word) - 1),"
            "  i -> concat(substring(word, i, 1), substring(word, i + 1, 1)))"
            " else array() end")).alias("merge_pair"))
    agg = (p.groupBy("merge_pair")
           .agg(F.sum("ct").cast("bigint").alias("pair_ct")))
    w = Window.orderBy(F.desc("pair_ct"), "merge_pair")
    return (agg.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= BPE_TOP_K)
            .select("merge_pair", "pair_ct"))


# ---------------------------------------------------------------------------
# BPE tokenizer induction, full loop: K iterated merge rounds (Sennrich
# et al. 2016) — each round counts adjacent symbol pairs over the
# (small, Zipf-compressed) vocab table, picks the argmax pair
# (tie-break: count DESC, then pair lexicographic), and applies it
# left-to-right greedy non-overlapping; the vocabulary of symbols grows
# by one per round. bpe_top_merges above proves one counting step; this
# proves the ROUND ITERATION, the way min_label_components proves
# bounded label rounds.
#
# Scale shape: the corpus is touched ONCE (the word-count agg); all K
# rounds run over the distinct-word vocab (orders of magnitude smaller
# than the corpus), localCheckpoint'd per round to truncate lineage.
# The only driver collect is the 1-row argmax per round (bounded: K
# rows total). Merge application is F.aggregate — a JVM-side Catalyst
# higher-order fold, no Python UDF.
#
# Greedy-application equivalence note: the fold merges a pair whenever
# the accumulator top is s1 and the current symbol is s2 — leftmost-
# first non-overlapping, identical to the oracle's islands-parity rule
# (consecutive overlapping match positions only arise when s1 == s2,
# where odd-ranked positions within each run merge).
# ---------------------------------------------------------------------------

BPE_SEQ_ROUNDS = 8


def _bpe_cte_body() -> str:
    """Unrolled K-round BPE training loop in pure SQL: per round, pair
    counts via LEAD, scalar-subquery argmax, islands-parity greedy
    merge application, and a post-merge distinct-symbol count. Shared
    by the merge-sequence and fertility oracles (different final
    SELECTs over the same chain)."""
    # every CTE MATERIALIZED: DuckDB would otherwise INLINE the chain,
    # and the per-round multi-references (st twice, b twice, ...)
    # compound exponentially across 8 unrolled rounds — thousands of
    # duplicated parquet scans (observed as fd exhaustion)
    parts = ["""
    WITH wc AS MATERIALIZED (
      SELECT w1 AS word, COUNT(*) AS ct FROM
        (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
      WHERE w1 <> '' GROUP BY 1
    ),
    seq0 AS MATERIALIZED (
      SELECT word, ct, i AS pos, substr(word, i, 1) AS sym
      FROM wc, UNNEST(generate_series(1, len(word))) AS t(i)
    )"""]
    for r in range(1, BPE_SEQ_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
    nx{r} AS MATERIALIZED (
      SELECT word, ct, pos, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
      FROM seq{p}
    ),
    pc{r} AS MATERIALIZED (
      SELECT sym AS s1, nsym AS s2, CAST(SUM(ct) AS BIGINT) AS pct
      FROM nx{r} WHERE nsym IS NOT NULL GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
      SELECT s1, s2, pct FROM pc{r} ORDER BY pct DESC, s1, s2 LIMIT 1
    ),
    mk{r} AS MATERIALIZED (
      SELECT n.*, CASE WHEN n.sym = (SELECT s1 FROM b{r})
                        AND n.nsym = (SELECT s2 FROM b{r})
                   THEN 1 ELSE 0 END AS m
      FROM nx{r} n
    ),
    st{r} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos, ROW_NUMBER() OVER (
                 PARTITION BY word, grp ORDER BY pos) AS rn
        FROM (SELECT word, pos, pos - ROW_NUMBER() OVER (
                       PARTITION BY word ORDER BY pos) AS grp
              FROM mk{r} WHERE m = 1)
      ) WHERE rn % 2 = 1
    ),
    seq{r} AS MATERIALIZED (
      SELECT m.word, m.ct,
             ROW_NUMBER() OVER (PARTITION BY m.word ORDER BY m.pos) AS pos,
             CASE WHEN a.pos IS NOT NULL THEN m.sym || m.nsym
                  ELSE m.sym END AS sym
      FROM mk{r} m
      LEFT JOIN st{r} a ON a.word = m.word AND a.pos = m.pos
      LEFT JOIN st{r} b ON b.word = m.word AND b.pos = m.pos - 1
      WHERE b.pos IS NULL
    ),
    vs{r} AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS n FROM seq{r})""")
    return "".join(parts)


def _bpe_seq_oracle() -> str:
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, s1 || s2 AS merge_pair, "
        f"pct AS pair_ct, (SELECT n FROM vs{r}) AS n_symbols FROM b{r}"
        for r in range(1, BPE_SEQ_ROUNDS + 1))
    return f"{_bpe_cte_body()}\n    {unions}"


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared K-round training loop: returns (merge_rows, wc, vocab) —
    the learned rules, the word-count table, and the post-merge symbol
    table (ct, syms)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word").agg(F.count("*").alias("ct"))
          .localCheckpoint())
    vocab = wc.select(
        "ct",
        F.expr("transform(sequence(1, length(word)),"
               " i -> substring(word, i, 1))").alias("syms"))
    vocab = vocab.localCheckpoint()
    rows = []
    for r in range(1, BPE_SEQ_ROUNDS + 1):
        pairs = (vocab.filter(F.size("syms") >= 2)
                 .select("ct", F.explode(F.expr(
                     "transform(sequence(1, size(syms) - 1),"
                     " i -> struct(element_at(syms, i) as s1,"
                     "  element_at(syms, i + 1) as s2))")).alias("p"))
                 .groupBy("p.s1", "p.s2")
                 .agg(F.sum("ct").cast("bigint").alias("pct")))
        # 1-row bounded driver collect per round: the argmax merge rule
        best = (pairs.orderBy(F.desc("pct"), "s1", "s2").limit(1)
                .collect())[0]
        s1, s2, pct = best.s1, best.s2, best.pct
        vocab = vocab.select(
            "ct",
            F.aggregate(
                "syms",
                F.expr("cast(array() as array<string>)"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(s1))
                    & (x == F.lit(s2)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(F.lit(s1 + s2)))
                ).otherwise(F.concat(acc, F.array(x)))).alias("syms"))
        vocab = vocab.localCheckpoint()
        n_sym = (vocab.select(F.explode("syms").alias("s"))
                 .agg(F.countDistinct("s")).collect()[0][0])
        rows.append((r, s1 + s2, int(pct), int(n_sym)))
    return rows, wc, vocab


@query("bpe_merge_sequence", oracle=_bpe_seq_oracle())
def bpe_merge_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K = BPE_SEQ_ROUNDS learned merge rules in order, each with
    its corpus-weighted pair count and the distinct-symbol vocabulary
    size after applying it (feeds vocab_coverage_curve-style budget
    planning: how fast does coverage grow per merge)."""
    rows, _wc, _vocab = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        rows, "round bigint, merge_pair string, pair_ct bigint, "
              "n_symbols bigint")


def _bpe_fertility_oracle() -> str:
    r = BPE_SEQ_ROUNDS
    return f"""{_bpe_cte_body()},
    after AS (
      SELECT word, MAX(ct) AS ct, COUNT(*) AS ns
      FROM seq{r} GROUP BY word
    )
    SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM wc) AS n_word_tokens,
      round((SELECT CAST(SUM(ct * len(word)) AS DOUBLE) FROM wc)
            / (SELECT CAST(SUM(ct) AS DOUBLE) FROM wc), 6)
        AS chars_per_word,
      round((SELECT CAST(SUM(ct * ns) AS DOUBLE) FROM after)
            / (SELECT CAST(SUM(ct) AS DOUBLE) FROM after), 6)
        AS syms_per_word
    """


@query("bpe_apply_fertility", oracle=_bpe_fertility_oracle())
def bpe_apply_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: corpus-weighted symbols-per-word
    before (= chars) and after the BPE_SEQ_ROUNDS learned merges — the
    compression read a tokenizer team takes to size a merge budget.
    All sums are exact integers; two 6-dp divisions at the boundary.
    NOTE: words absent from ``after`` can't exist — every wc word has
    >= 1 symbol, so both denominators are the same corpus word count.
    """
    _rows, wc, vocab = _bpe_train(spark, sf_dir)
    before = wc.agg(
        F.sum("ct").cast("bigint").alias("n_word_tokens"),
        F.round(F.sum(F.col("ct") * F.length("word")).cast("double")
                / F.sum("ct").cast("double"), 6).alias("chars_per_word"))
    after = vocab.agg(
        F.round(F.sum(F.col("ct") * F.size("syms")).cast("double")
                / F.sum("ct").cast("double"), 6).alias("syms_per_word"))
    return before.crossJoin(after)


# ---------------------------------------------------------------------------
# Language-ID confusion audit: cross-tab of labeled vs predicted
# language from the same stopword/CJK heuristic as text_lang_id — the
# accuracy read a pipeline takes before trusting the cheap classifier
# to route documents at scale (per-cell counts + per-label recall).
# ---------------------------------------------------------------------------

@query(
    "text_lang_confusion_audit",
    oracle=f"""
    WITH pred AS ({{langid}})
    SELECT labeled_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           round(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY labeled_lang), 6)
             AS label_share
    FROM pred
    GROUP BY 1, 2
    """.format(langid=_lang_id_oracle()),
)
def text_lang_confusion_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    pred = text_lang_id(spark, sf_dir)
    w = Window.partitionBy("labeled_lang")
    return (pred.groupBy("labeled_lang", "predicted_lang")
            .agg(F.count("*").cast("bigint").alias("doc_ct"))
            .withColumn(
                "label_share",
                F.round(F.col("doc_ct").cast("double")
                        / F.sum("doc_ct").over(w), 6)))


# ---------------------------------------------------------------------------
# URL canonicalization + dedup accounting: the first dedup key a web
# corpus uses is the CANONICAL URL (case-folded host, default port and
# fragment dropped, tracking params stripped, trailing slash removed) —
# crawls re-fetch the same page under dozens of surface forms. The
# corpus has no URL column, so deterministic surface forms are
# synthesized from (source, doc_id) with the SAME shared formula in
# both engines (the multimodal synthesis posture); each engine then
# canonicalizes with its OWN string pipeline, so any divergence in the
# canonicalization logic — not the synthesis — breaks the counts.
# All string expressions are JVM-side; one groupBy(source) shuffle.
# ---------------------------------------------------------------------------

_URL_SYNTH_DUCK = """
      'https://'
      || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
      || '.Example.COM'
      || CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END
      || '/p/' || CAST(doc_id // 10 AS VARCHAR)
      || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN '?utm_source=news&id=' || CAST((doc_id // 10) % 100 AS VARCHAR)
              WHEN doc_id % 3 = 1
              THEN '?id=' || CAST((doc_id // 10) % 100 AS VARCHAR)
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END
"""


@query(
    "text_url_canonicalize",
    oracle=f"""
    WITH raw AS (
      SELECT source, {_URL_SYNTH_DUCK} AS url FROM documents
    ),
    defrag AS (
      SELECT source, regexp_replace(url, '#.*$', '') AS u FROM raw
    ),
    split AS (
      SELECT source, substr(u, 9) AS rest0 FROM defrag
    ),
    hosted AS (
      SELECT source,
             replace(lower(substr(rest0, 1, strpos(rest0, '/') - 1)),
                     ':443', '') AS host,
             substr(rest0, strpos(rest0, '/')) AS rest
      FROM split
    ),
    qsplit AS (
      SELECT source, host,
             CASE WHEN strpos(rest, '?') > 0
                  THEN substr(rest, 1, strpos(rest, '?') - 1)
                  ELSE rest END AS path,
             CASE WHEN strpos(rest, '?') > 0
                  THEN substr(rest, strpos(rest, '?'))
                  ELSE '' END AS qs
      FROM hosted
    ),
    canon AS (
      SELECT source,
             'https://' || host
             || regexp_replace(path, '/+$', '')
             || regexp_replace(regexp_replace(qs, 'utm_source=[^&]*&', ''),
                               '\\?utm_source=[^&]*$', '') AS curl
      FROM qsplit
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST(COUNT(*) - COUNT(DISTINCT curl) AS BIGINT) AS dup_urls
    FROM canon GROUP BY 1
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    m = F.col("doc_id")
    grp = F.expr("cast(div(doc_id, 10) as string)")
    gid = F.expr("cast(div(doc_id, 10) % 100 as string)")
    raw = F.concat(
        F.lit("https://"),
        F.when(m % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(m % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), grp,
        F.when(m % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(m % 3 == 0, F.concat(F.lit("?utm_source=news&id="), gid))
         .when(m % 3 == 1, F.concat(F.lit("?id="), gid))
         .otherwise(F.lit("")),
        F.when(m % 5 == 0, F.lit("#sec2")).otherwise(F.lit("")))
    u = F.regexp_replace(raw, "#.*$", "")
    rest0 = F.substring(u, 9, 1 << 20)
    slash = F.instr(rest0, "/")
    host = F.replace(F.lower(F.substring(rest0, F.lit(1), slash - 1)),
                     F.lit(":443"), F.lit(""))
    rest = F.substring(rest0, slash, F.lit(1 << 20))
    qpos = F.instr(rest, "?")
    path = F.when(qpos > 0,
                  F.substring(rest, F.lit(1), qpos - 1)).otherwise(rest)
    qs = F.when(qpos > 0,
                F.substring(rest, qpos, F.lit(1 << 20))).otherwise(F.lit(""))
    qs = F.regexp_replace(
        F.regexp_replace(qs, "utm_source=[^&]*&", ""),
        "[?]utm_source=[^&]*$", "")
    canon = F.concat(F.lit("https://"), host,
                     F.regexp_replace(path, "/+$", ""), qs)
    return (d.select("source", canon.alias("curl"))
            .groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_urls"),
                 F.countDistinct("curl").cast("bigint").alias("n_canonical"),
                 (F.count("*") - F.countDistinct("curl")).cast("bigint")
                  .alias("dup_urls")))


# ---------------------------------------------------------------------------
# Boilerplate n-gram detection: the phrases that recur across the MOST
# documents (nav bars, license footers, cookie banners in a real crawl)
# — C4/Gopher-style pipelines strip them before dedup because they
# dominate shingle space and glue unrelated docs into near-dup
# clusters. Document frequency of distinct 8-grams, top-20 with their
# df ratio. Plan: per-doc distinct grams are map-side dedup'd before
# the one gram-keyed shuffle; top-20 is TakeOrdered, no global sort.
# ---------------------------------------------------------------------------

BOILER_N = 8
BOILER_TOPK = 20


def _register_boilerplate() -> None:
    from gmall_211027_flink_spark.registry import query as _q

    @_q(
        "curation_boilerplate_ngrams",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id,
                 array_to_string(w[i:i + {BOILER_N} - 1], ' ') AS gram
          FROM toks, UNNEST(generate_series(1, len(w) - {BOILER_N} + 1))
                       AS t(i)
          WHERE len(w) >= {BOILER_N}
        ),
        df AS (
          SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
          FROM grams GROUP BY 1
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT gram, doc_freq,
               round(CAST(doc_freq AS DOUBLE) / t.n_docs, 6) AS df_ratio
        FROM df, tot t
        ORDER BY doc_freq DESC, gram
        LIMIT {BOILER_TOPK}
        """,
    )
    def curation_boilerplate_ngrams(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("w"))
        grams = (docs.filter(F.size("w") >= BOILER_N)
                 .select("doc_id", F.explode(F.expr(
                     f"transform(sequence(1, size(w) - {BOILER_N} + 1),"
                     f" i -> concat_ws(' ', slice(w, i, {BOILER_N})))"
                 )).alias("gram"))
                 .distinct())
        df = grams.groupBy("gram").agg(
            F.count("*").cast("bigint").alias("doc_freq"))
        tot = (load_table(spark, sf_dir, "documents")
               .agg(F.count("*").cast("bigint").alias("n_docs")))
        return (df.crossJoin(F.broadcast(tot))
                .select("gram", "doc_freq",
                        F.round(F.col("doc_freq").cast("double")
                                / F.col("n_docs"), 6).alias("df_ratio"))
                .orderBy(F.desc("doc_freq"), "gram")
                .limit(BOILER_TOPK))


_register_boilerplate()


# ---------------------------------------------------------------------------
# Flesch reading-ease (Flesch 1948): 206.835 - 1.015*(words/sentences)
# - 84.6*(syllables/words), with the standard cheap proxies — syllable
# ~= vowel-group count, sentence ~= terminal-punctuation run. A core
# curation signal next to the Gopher rules and LM quality score:
# readability bands are how corpus mixes balance encyclopedic vs
# conversational text. All three counts are integers from shared regex
# literals (identical character-class semantics in Java regex and
# DuckDB's RE2), so the per-doc score is one deterministic double
# expression; per-source means use the round-then-DECIMAL-sum
# convention. Map-side everything + one source-keyed aggregation.
# ---------------------------------------------------------------------------

FLESCH_EASY = 60.0      # scores >= this read as "plain English"


@query(
    "text_flesch_readability",
    oracle=f"""
    WITH counts AS (
      SELECT source,
             len(string_split(text, ' ')) AS words,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS sents
      FROM documents
    ),
    scored AS (
      SELECT source,
             round(206.835
                   - 1.015 * (CAST(words AS DOUBLE) / sents)
                   - 84.6 * (CAST(syll AS DOUBLE) / words), 6) AS flesch
      FROM counts WHERE words > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(flesch AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_flesch,
           round(CAST(SUM(CASE WHEN flesch >= {FLESCH_EASY}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS easy_share
    FROM scored GROUP BY source ORDER BY source
    """,
)
def text_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease profile (vowel-group syllable
    proxy, punctuation-run sentence proxy)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    syll = F.size(F.expr(
        "regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1))
    scored = (d.select("source", words.alias("words"),
                       syll.alias("syll"), sents.alias("sents"))
              .filter(F.col("words") > 0)
              .select("source", F.round(
                  206.835
                  - 1.015 * (F.col("words").cast("double") / F.col("sents"))
                  - 84.6 * (F.col("syll").cast("double") / F.col("words")),
                  6).alias("flesch")))
    fdec = F.col("flesch").cast("decimal(38,6)")
    return (scored.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.round(F.sum(fdec).cast("double") / F.count("*"), 6)
                 .alias("avg_flesch"),
                 F.round(F.sum(F.when(F.col("flesch") >= FLESCH_EASY, 1)
                               .otherwise(0)).cast("double")
                         / F.count("*"), 6).alias("easy_share"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Feature-hash collision audit (r8) — the hashing trick (used by the
# DSIR bucket LMs in sampling.py) maps an open vocabulary into
# FH_BUCKETS fixed buckets; its statistical cost is collisions. This
# audit reports, per bucket, how many DISTINCT terms share it and how
# much token mass it carries — the load table you check before
# trusting any hashed-feature model (a hot bucket conflating frequent
# terms silently biases the LM ratio). Pure integer counting; the
# term->bucket hash is md5-prefix mod, identical in both engines.
# Scale: one (term) distinct + one (bucket) groupBy — bucket grain is
# constant-size output.
# ---------------------------------------------------------------------------

FH_BUCKETS = 256


@query(
    "text_feature_hash_collision_audit",
    oracle=f"""
    WITH toks AS (
      SELECT t.term, CAST(('0x' || substr(md5(t.term), 1, 4))::BIGINT
                          % {FH_BUCKETS} AS BIGINT) AS b
      FROM (SELECT UNNEST(string_split(text, ' ')) AS term
            FROM documents) t
    )
    SELECT b AS bucket,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_distinct_terms,
           CAST(COUNT(*) AS BIGINT) AS token_mass
    FROM toks GROUP BY 1
    """,
)
def text_feature_hash_collision_audit(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Per-bucket distinct-term collisions and token mass for the
    {FH_BUCKETS}-bucket hashing trick (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("term"))
    b = (F.conv(F.substring(F.md5("term"), 1, 4), 16, 10)
         .cast("bigint") % FH_BUCKETS)
    return (toks.select("term", b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.countDistinct("term").cast("bigint")
                 .alias("n_distinct_terms"),
                 F.count("*").cast("bigint").alias("token_mass")))


# ---------------------------------------------------------------------------
# Hapax legomena ratio (r9) — lexical-richness profiling per source:
# the share of a source's vocabulary that occurs exactly once (hapax)
# or twice (dis legomena) there. Template-generated or boilerplate-
# heavy sources show collapsed hapax mass; natural prose runs ~40-60%
# (Zipf's tail). The cheap stylometric screen next to the Zipf fit
# (round 5) — that op fits the head, this one reads the tail.
#
# Exactness: pure integer counting over the standard token shuffle;
# ratios are single 6-dp rounds of identical integers.
# ---------------------------------------------------------------------------

@query(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT source, t.word
      FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
    ),
    wc AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis,
           round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_ratio,
           round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio
    FROM wc GROUP BY 1 ORDER BY 1
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis legomena share + type-token ratio per source
    (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select("source",
                      F.explode(F.split("text", " ")).alias("word"))
          .groupBy("source", "word")
          .agg(F.count("*").cast("bigint").alias("c")))
    return (wc.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("vocab"),
                 F.sum("c").cast("bigint").alias("n_tokens"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_hapax"),
                 F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
                 .cast("bigint").alias("n_dis"),
                 F.round(F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                         .cast("double") / F.count("*"), 6)
                 .alias("hapax_ratio"),
                 F.round(F.count("*").cast("double") / F.sum("c"), 6)
                 .alias("type_token_ratio"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Yule's K lexical-richness characteristic (r10) — Yule 1944: K =
# 10^4 * (sum_m m^2 V_m - N) / N^2, the repeat-rate statistic that is
# (unlike type-token ratio, round 2) insensitive to corpus length —
# the per-language vocabulary-concentration readout a data-mixing
# pipeline compares across sources. Since sum_m m^2 V_m is just the
# sum of squared per-word counts, everything is one exact integer
# aggregation per (lang, word) then per lang; K is a deterministic
# double from exact BIGINTs, floor(x*1e6 + 0.5)-quantized.
# ---------------------------------------------------------------------------

@query(
    "text_yules_k",
    oracle="""
    WITH wc AS (
      SELECT d.lang, t.word, CAST(COUNT(*) AS BIGINT) AS m
      FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(word)
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT lang, CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * m) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM wc GROUP BY 1
    )
    SELECT lang, n AS n_tokens, vocab,
           CAST(CAST(floor(10000.0 * (s2 - n)
                           / (CAST(n AS DOUBLE) * n) * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS yules_k
    FROM agg ORDER BY lang
    """,
)
def text_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Yule's K from exact squared word counts (see block
    comment)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
          .groupBy("lang", "word")
          .agg(F.count("*").cast("bigint").alias("m")))
    agg = wc.groupBy("lang").agg(
        F.sum("m").cast("bigint").alias("n"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("s2"),
        F.count("*").cast("bigint").alias("vocab"))
    return (agg.select(
        "lang", F.col("n").alias("n_tokens"), "vocab",
        (F.floor(F.lit(10000.0) * (F.col("s2") - F.col("n"))
                 / (F.col("n").cast("double") * F.col("n"))
                 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("yules_k"))
        .orderBy("lang"))


# ---------------------------------------------------------------------------
# Character-trigram entropy per language (r10) — the sub-word
# counterpart of text_word_entropy: language scripts differ far more
# in character n-gram structure than in word length, so per-lang
# trigram entropy is the standard corpus-mix diagnostic (and the
# feature family under the round-2 n-gram language ID). EXACTNESS:
# trigram counts are exact integers; each p*log2(p) term is
# deterministic per (lang, trigram) and floor(t*1e9 + 0.5)-quantized
# BEFORE the order-free integer sum (float-discipline rule).
# Scale: explode is map-side; both aggregations shuffle on content
# keys (lang, trigram) with partial aggregation.
# ---------------------------------------------------------------------------

@query(
    "text_char_trigram_entropy",
    oracle="""
    WITH tri AS (
      SELECT d.lang, substr(d.text, t.i, 3) AS g
      FROM documents d,
           UNNEST(generate_series(1, len(d.text) - 2)) AS t(i)
    ),
    tc AS (
      SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM tri GROUP BY 1, 2
    ),
    n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY 1)
    SELECT tc.lang,
           any_value(n.n) AS n_trigrams,
           CAST(COUNT(*) AS BIGINT) AS distinct_trigrams,
           CAST(-SUM(CAST(floor((c / CAST(n.n AS DOUBLE))
                                * log2(c / CAST(n.n AS DOUBLE))
                                * 1000000000 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000000.0 AS trigram_entropy
    FROM tc JOIN n USING (lang)
    GROUP BY 1 ORDER BY 1
    """,
)
def text_char_trigram_entropy(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-language character-trigram entropy with quantized-term
    sums (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    tri = docs.select(
        "lang",
        F.explode(F.expr(
            "case when length(text) >= 3 then"
            " transform(sequence(1, length(text) - 2),"
            "  i -> substring(text, i, 3))"
            " else array() end")).alias("g"))
    tc = tri.groupBy("lang", "g").agg(
        F.count("*").cast("bigint").alias("c"))
    n = tc.groupBy(F.col("lang").alias("nl")).agg(
        F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    tq = F.floor(p * F.log2(p) * F.lit(1000000000.0)
                 + F.lit(0.5)).cast("bigint")
    return (tc.join(n, F.col("lang") == F.col("nl"))
            .groupBy("lang")
            .agg(F.first("n").alias("n_trigrams"),
                 F.count("*").cast("bigint").alias("distinct_trigrams"),
                 ((-F.sum(tq)).cast("double") / F.lit(1000000000.0))
                 .alias("trigram_entropy"))
            .orderBy("lang"))


# ---------------------------------------------------------------------------
# Zipf slope fit (r10) — the log-log rank/frequency regression over the
# corpus's top-100 words: natural corpora run slope ~ -1 (Zipf's law);
# a synthetic or templated corpus shows up as a flat or kinked fit —
# the vocabulary-shape audit next to Yule's K. EXACTNESS: the top-100
# cut is a total order (freq DESC, word); ln(rank) and ln(freq) are
# deterministic per row from exact integers and are half-up-quantized
# to BIGINT at 1e-9; the OLS slope/intercept use exact
# HUGEINT/DECIMAL(38,0) moment identities over those integers,
# floor(x*1e6 + 0.5)-quantized at the boundary. Bounded 100-row math
# after one (word) two-phase count.
# ---------------------------------------------------------------------------

ZIPF_TOP_K = 100


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH wc AS (
      SELECT t.word, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
      GROUP BY 1
    ),
    top AS (
      SELECT word, c,
             CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT)
               AS rnk
      FROM wc
      ORDER BY c DESC, word LIMIT {ZIPF_TOP_K}
    ),
    q AS (
      SELECT CAST(floor(ln(rnk) * 1000000000 + 0.5) AS BIGINT) AS xq,
             CAST(floor(ln(c) * 1000000000 + 0.5) AS BIGINT) AS yq
      FROM top
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
             SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
             SUM(CAST(xq AS HUGEINT) * xq) AS sxx
      FROM q
    )
    SELECT n AS n_words,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS zipf_slope,
           CAST(CAST(floor(
             (CAST(sy AS DOUBLE) / n
              - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                * sx / n) / ln(10) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS log10_intercept
    FROM m
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS Zipf slope over the top-{ZIPF_TOP_K} word log-log curve
    (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .groupBy("word").agg(F.count("*").cast("bigint").alias("c")))
    top = (wc.orderBy(F.desc("c"), "word").limit(ZIPF_TOP_K)
           .select("c", F.row_number().over(
               Window.orderBy(F.desc("c"), "word"))
               .cast("bigint").alias("rnk")))
    q = top.select(
        F.floor(F.log(F.col("rnk").cast("double")) * F.lit(1000000000.0)
                + F.lit(0.5)).cast("bigint").alias("xq"),
        F.floor(F.log(F.col("c").cast("double")) * F.lit(1000000000.0)
                + F.lit(0.5)).cast("bigint").alias("yq"))
    m = q.agg(F.count("*").cast("bigint").alias("n"),
              F.sum("xq").cast("bigint").alias("sx"),
              F.sum("yq").cast("bigint").alias("sy"),
              F.sum(F.col("xq").cast("decimal(38,0)") * F.col("yq"))
              .alias("sxy"),
              F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq"))
              .alias("sxx"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast("double")
    den = (d38("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast("double")
    slope = num / den
    q6 = lambda c: (F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                    .cast("bigint").cast("double") / F.lit(1000000.0))
    intercept = ((F.col("sy").cast("double") / F.col("n")
                  - slope * F.col("sx") / F.col("n"))
                 / F.lit(math.log(10.0)))
    return m.select(F.col("n").alias("n_words"),
                    q6(slope).alias("zipf_slope"),
                    q6(intercept).alias("log10_intercept"))


# ---------------------------------------------------------------------------
# MATTR — moving-average type-token ratio (r11; Covington & McFall
# 2010). Plain TTR (round 2) shrinks with document length; MATTR slides
# a fixed W-token window and averages the per-window TYPE counts, which
# makes lexical diversity comparable across lengths — the per-source
# readout a corpus mixer actually wants. EXACTNESS: every window's
# distinct count is an exact integer; MATTR = sum(types) / (W * n_win)
# is one quantized rational per source. Docs shorter than W contribute
# no window (documented). SCALE: the window expansion is
# tokens-per-doc * W rows — bounded by the ~100-token docs, map-side
# explode + one content-keyed shuffle; no cross-doc blowup.
# ---------------------------------------------------------------------------

MATTR_W = 25


@query(
    "text_mattr_sliding",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    win AS (
      SELECT t.doc_id, t.source, s.i AS start,
             u.j AS pos, t.w[u.j] AS word
      FROM toks t,
           UNNEST(generate_series(1, len(t.w) - {MATTR_W} + 1)) AS s(i),
           UNNEST(generate_series(s.i, s.i + {MATTR_W} - 1)) AS u(j)
    ),
    types AS (
      SELECT doc_id, source, start,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
      FROM win GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(n_types) AS BIGINT) AS sum_types,
           CAST(CAST(floor(CAST(SUM(n_types) AS DOUBLE)
                           / (COUNT(*) * {MATTR_W})
                           * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS mattr
    FROM types GROUP BY 1 ORDER BY 1
    """,
)
def text_mattr_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (window 25) per source (see
    block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source",
                       F.split("text", " ").alias("w")) \
        .filter(F.size("w") >= MATTR_W)  # short docs: no window (Spark
    # sequence(1, n<1) would generate a DESCENDING range; DuckDB's
    # generate_series is empty — the filter makes both sides empty)
    win = (toks
           .select("doc_id", "source", "w",
                   F.explode(F.sequence(
                       F.lit(1), F.size("w") - MATTR_W + 1)).alias("start"))
           .select("doc_id", "source", "start",
                   F.explode(F.expr(
                       f"slice(w, start, {MATTR_W})")).alias("word")))
    types = (win.groupBy("doc_id", "source", "start")
             .agg(F.countDistinct("word").cast("bigint").alias("n_types")))
    return (types.groupBy("source")
            .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                 F.count("*").cast("bigint").alias("n_windows"),
                 F.sum("n_types").cast("bigint").alias("sum_types"),
                 (F.floor(F.sum("n_types").cast("double")
                          / (F.count("*") * MATTR_W)
                          * F.lit(1000000.0) + F.lit(0.5))
                  .cast("bigint").cast("double") / F.lit(1000000.0))
                 .alias("mattr"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Word burstiness — Fano factor (r11; Church & Gale 1995). A word that
# appears 100 times spread evenly across documents behaves differently
# from one that appears 100 times inside three documents; the Fano
# factor F = Var/Mean of per-document counts (zeros included) is the
# classic dispersion readout (F ~ 1 Poisson, >> 1 bursty) that drives
# stopword/keyword separation in curation. EXACTNESS: with N docs and
# per-doc counts c, F = (N * sum(c^2) - tot^2) / (N * tot) — every term
# an exact BIGINT off the (word, doc) count grid; absent docs contribute
# 0 to both sums, so no dense N x vocab expansion is ever materialized.
# Top-20 by total with explicit (total DESC, word) tie-break.
# ---------------------------------------------------------------------------

@query(
    "text_burstiness_fano",
    oracle="""
    WITH wc AS (
      SELECT t.word, d.doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(word)
      GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    agg AS (
      SELECT word, CAST(SUM(c) AS BIGINT) AS tot,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_docs_present
      FROM wc GROUP BY 1
    ),
    top AS (
      SELECT word, tot, s2, n_docs_present,
             row_number() OVER (ORDER BY tot DESC, word) AS rk
      FROM agg
    )
    SELECT t.word, t.tot, t.n_docs_present,
           CAST(CAST(floor(
             (CAST(nd.n AS DOUBLE) * t.s2 - CAST(t.tot AS DOUBLE) * t.tot)
             / (CAST(nd.n AS DOUBLE) * t.tot) * 1000000 + 0.5)
             AS BIGINT) AS DOUBLE) / 1000000.0 AS fano
    FROM top t, nd WHERE t.rk <= 20
    ORDER BY t.tot DESC, t.word
    """,
)
def text_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano dispersion factor of per-document counts for the 20 most
    frequent words (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count("*").cast("bigint").alias("n"))
    wc = (docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("word"))
          .groupBy("word", "doc_id")
          .agg(F.count("*").cast("bigint").alias("c")))
    agg = wc.groupBy("word").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.count("*").cast("bigint").alias("n_docs_present"))
    top = agg.select(
        "*", F.row_number().over(
            Window.orderBy(F.desc("tot"), F.asc("word"))).alias("rk")) \
        .filter(F.col("rk") <= 20)
    return (top.crossJoin(F.broadcast(nd))
            .select("word", "tot", "n_docs_present",
                    (F.floor((F.col("n").cast("double") * F.col("s2")
                              - F.col("tot").cast("double") * F.col("tot"))
                             / (F.col("n").cast("double") * F.col("tot"))
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("fano"))
            .orderBy(F.desc("tot"), F.asc("word")))


# ---------------------------------------------------------------------------
# Mendenhall word-length spectrum (r11; Mendenhall 1887 — the original
# stylometric signature). The distribution of word LENGTHS is stable
# per language/style and cheap to compute at any scale; per-lang length
# shares are the fingerprint a mixer compares against a reference
# corpus. EXACTNESS: pure integer counts; shares floor-quantized.
# Lengths capped at 15 (everything longer pools into the 15 bucket) so
# the output stays a fixed <= 15-row spectrum per lang.
# ---------------------------------------------------------------------------

@query(
    "text_mendenhall_spectrum",
    oracle="""
    WITH w AS (
      SELECT d.lang, LEAST(len(t.word), 15) AS wlen
      FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(word)
    ),
    c AS (
      SELECT lang, wlen, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1, 2
    ),
    n AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT c.lang, c.wlen, c.cnt,
           CAST(CAST(floor(CAST(c.cnt AS DOUBLE) / n.n * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS share
    FROM c JOIN n USING (lang)
    ORDER BY c.lang, c.wlen
    """,
)
def text_mendenhall_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language word-length spectrum (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).select(
        "lang",
        F.least(F.length("word"), F.lit(15)).cast("bigint").alias("wlen"))
    c = w.groupBy("lang", "wlen").agg(F.count("*").cast("bigint").alias("cnt"))
    n = c.groupBy("lang").agg(F.sum("cnt").cast("bigint").alias("n"))
    return (c.join(n, "lang")
            .select("lang", "wlen", "cnt",
                    (F.floor(F.col("cnt").cast("double") / F.col("n")
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("share"))
            .orderBy("lang", "wlen"))


# ---------------------------------------------------------------------------
# Bigram novelty decay (r11) — the "how fast does new content dry up"
# curve: ingest documents in doc_id order, call a bigram NOVEL in the
# first document where it appears, and report per corpus-decile the
# share of distinct bigrams that are first occurrences. The shape of
# this curve is the standard diminishing-returns diagnostic for corpus
# growth (novelty ~ Heaps' law derivative). EXACTNESS: first occurrence
# = MIN(doc_id) per bigram (exact argmin by key); deciles are integer
# buckets doc_id * 10 // (max_doc_id + 1); shares floor-quantized.
# SCALE: two content-keyed aggregations (bigram grid, then decile),
# both with partial aggregation; no ordering dependence beyond the
# key-side MIN.
# ---------------------------------------------------------------------------

@query(
    "text_bigram_novelty_decay",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT DISTINCT t.doc_id, t.w[i.i] || ' ' || t.w[i.i + 1] AS g
      FROM toks t, UNNEST(generate_series(1, len(t.w) - 1)) AS i(i)
    ),
    first AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM bg
              GROUP BY 1),
    mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS m FROM documents),
    dd AS (
      SELECT b.doc_id * 10 // (mx.m + 1) AS decile,
             CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END AS novel
      FROM bg b JOIN first f USING (g), mx
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           CAST(CAST(floor(CAST(SUM(novel) AS DOUBLE) / COUNT(*)
                           * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS novelty_rate
    FROM dd GROUP BY 1 ORDER BY 1
    """,
)
def text_bigram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of first-occurrence bigrams per corpus decile in doc_id
    ingest order (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("w")) \
        .filter(F.size("w") >= 2)  # single-token docs have no bigram
    # (Spark sequence(1, 0) DESCENDS — DuckDB generate_series is empty)
    bg = (toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .alias("g")).distinct())
    first = bg.groupBy("g").agg(F.min("doc_id").cast("bigint")
                                .alias("first_doc"))
    mx = docs.agg(F.max("doc_id").cast("bigint").alias("m"))
    dd = (bg.join(first, "g").crossJoin(F.broadcast(mx))
          .select(F.expr("doc_id * 10 div (m + 1)").alias("decile"),
                  F.when(F.col("first_doc") == F.col("doc_id"), 1)
                  .otherwise(0).alias("novel")))
    return (dd.groupBy("decile")
            .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                 F.sum("novel").cast("bigint").alias("n_novel"),
                 (F.floor(F.sum("novel").cast("double") / F.count("*")
                          * F.lit(1000000.0) + F.lit(0.5))
                  .cast("bigint").cast("double") / F.lit(1000000.0))
                 .alias("novelty_rate"))
            .orderBy("decile"))
