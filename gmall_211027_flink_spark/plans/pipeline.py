"""End-to-end training-data curation pipeline as ONE composed query:
quality filter -> eval-suite exclusion -> exact n-gram decontamination
-> exact dedup (keep-first) -> per-language training manifest.

This is the composition a real curation run executes nightly; each
stage reuses the SAME constants/expressions as its stand-alone operator
(operators/text.py quality rules, operators/curation.py eval carve-out
and 5-gram decontamination, operators/dedup.py md5 keep-first), so the
composed result stays consistent with the per-stage driver rows.

Scale shape: stages 1-2 are map-side verdicts; decontamination is the
broadcast eval-gram semi-join (corpus never shuffles); dedup is one
hash-groupBy on the md5 digest over ONLY the surviving docs (each stage
shrinks the data the next stage shuffles — the ordering is the
optimization); the manifest is a final two-phase count grid. Every
count is exact; the one retention ratio rounds at the 6-dp boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.operators.curation import EVAL_MOD, NGRAM
from gmall_211027_flink_spark.operators.text import (
    QF_DISTINCT_RATIO_PCT,
    QF_MAX_WORDS,
    QF_MIN_WORDS,
    QF_STOP_RATIO_PCT,
    _QF_STOPS,
    _sql_list,
)
from gmall_211027_flink_spark.registry import query


def _manifest_oracle() -> str:
    stops = _sql_list(_QF_STOPS)
    return f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w, md5(text) AS h,
             doc_id % {EVAL_MOD} = 0 AS is_eval
      FROM documents
    ),
    q AS (
      SELECT *,
        CASE
          WHEN len(w) < {QF_MIN_WORDS} THEN 'too_short'
          WHEN len(w) > {QF_MAX_WORDS} THEN 'too_long'
          WHEN len(list_filter(w, x -> list_contains([{stops}], x)))
               * 100 < len(w) * {QF_STOP_RATIO_PCT} THEN 'low_stopword'
          WHEN len(list_distinct(w)) * 100
               < len(w) * {QF_DISTINCT_RATIO_PCT} THEN 'repetitive'
          ELSE 'kept'
        END AS verdict
      FROM t
    ),
    eval_grams AS (
      SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
               || w[i+3] || ' ' || w[i+4] AS g
      FROM t, UNNEST(generate_series(1,
               greatest(len(w) - {NGRAM - 1}, 0))) AS s(i)
      WHERE is_eval
    ),
    contaminated AS (
      SELECT DISTINCT doc_id
      FROM q, UNNEST(generate_series(1,
               greatest(len(w) - {NGRAM - 1}, 0))) AS s(i)
      WHERE NOT is_eval AND verdict = 'kept'
        AND w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
              || ' ' || w[i+4] IN (SELECT g FROM eval_grams)
    ),
    survivors AS (
      SELECT q.*, c.doc_id IS NOT NULL AS is_cont
      FROM q LEFT JOIN contaminated c USING (doc_id)
      WHERE NOT q.is_eval
    ),
    deduped AS (
      SELECT s.*,
        CASE WHEN verdict = 'kept' AND NOT is_cont THEN
          doc_id > MIN(CASE WHEN verdict = 'kept' AND NOT is_cont
                            THEN doc_id END)
                     OVER (PARTITION BY h)
        ELSE FALSE END AS is_dup
      FROM survivors s
    ),
    evals AS (
      SELECT lang, COUNT(*) AS n_eval FROM t WHERE is_eval GROUP BY 1
    ),
    agg AS (
      SELECT lang,
        COUNT(*) AS n_train,
        SUM(CASE WHEN verdict <> 'kept' THEN 1 ELSE 0 END)
          AS n_quality_dropped,
        SUM(CASE WHEN verdict = 'kept' AND is_cont THEN 1 ELSE 0 END)
          AS n_contaminated,
        SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_dropped,
        SUM(CASE WHEN verdict = 'kept' AND NOT is_cont AND NOT is_dup
                 THEN 1 ELSE 0 END) AS n_kept,
        SUM(CASE WHEN verdict = 'kept' AND NOT is_cont AND NOT is_dup
                 THEN len(w) ELSE 0 END) AS kept_tokens
      FROM deduped
      GROUP BY lang
    )
    SELECT a.lang,
      CAST(a.n_train + coalesce(ev.n_eval, 0) AS BIGINT) AS n_total,
      CAST(coalesce(ev.n_eval, 0) AS BIGINT) AS n_eval,
      CAST(a.n_quality_dropped AS BIGINT) AS n_quality_dropped,
      CAST(a.n_contaminated AS BIGINT) AS n_contaminated,
      CAST(a.n_dup_dropped AS BIGINT) AS n_dup_dropped,
      CAST(a.n_kept AS BIGINT) AS n_kept,
      CAST(a.kept_tokens AS BIGINT) AS kept_tokens,
      round(CAST(a.n_kept AS DOUBLE) / a.n_train, 6) AS retention
    FROM agg a LEFT JOIN evals ev USING (lang)
    """


@query("pipeline_training_manifest", oracle=_manifest_oracle())
def pipeline_training_manifest(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("w"),
        F.md5("text").alias("h"),
        (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"))
    stops = _sql_list(_QF_STOPS)
    nw = F.size("w")
    stop_hits = F.expr(
        f"size(filter(w, x -> array_contains(array({stops}), x)))")
    distinct_ct = F.size(F.array_distinct("w"))
    verdict = (
        F.when(nw < QF_MIN_WORDS, "too_short")
        .when(nw > QF_MAX_WORDS, "too_long")
        .when(stop_hits * 100 < nw * QF_STOP_RATIO_PCT, "low_stopword")
        .when(distinct_ct * 100 < nw * QF_DISTINCT_RATIO_PCT,
              "repetitive")
        .otherwise("kept"))
    q = docs.withColumn("verdict", verdict)

    grams_expr = F.expr(
        f"array_distinct(transform("
        f" if(size(w) >= {NGRAM}, sequence(1, size(w)-{NGRAM - 1}),"
        "  cast(array() as array<int>)),"
        " i -> concat_ws(' ', element_at(w,i), element_at(w,i+1),"
        " element_at(w,i+2), element_at(w,i+3), element_at(w,i+4))))")
    eval_grams = (q.filter("is_eval")
                  .select(F.explode(grams_expr).alias("g")).distinct())
    contaminated = (q.filter(~F.col("is_eval")
                             & (F.col("verdict") == "kept"))
                    .select("doc_id", F.explode(grams_expr).alias("g"))
                    .join(F.broadcast(eval_grams), "g", "left_semi")
                    .select("doc_id").distinct()
                    .withColumn("is_cont", F.lit(True)))

    survivors = (q.filter(~F.col("is_eval"))
                 .join(F.broadcast(contaminated), "doc_id", "left")
                 .withColumn("is_cont",
                             F.coalesce("is_cont", F.lit(False))))
    # keep-first dedup over ONLY the clean quality-kept docs: the min
    # kept doc_id per digest broadcasts back as the canonical marker
    canon = (survivors
             .filter((F.col("verdict") == "kept") & ~F.col("is_cont"))
             .groupBy("h").agg(F.min("doc_id").alias("canon_id")))
    deduped = (survivors.join(canon, "h", "left")
               .withColumn(
                   "is_dup",
                   F.when((F.col("verdict") == "kept") & ~F.col("is_cont"),
                          F.col("doc_id") > F.col("canon_id"))
                   .otherwise(F.lit(False))))

    eval_ct = (docs.filter("is_eval").groupBy("lang")
               .agg(F.count("*").alias("n_eval")))
    kept = (F.col("verdict") == "kept") & ~F.col("is_cont") \
        & ~F.col("is_dup")
    manifest = (deduped.groupBy("lang").agg(
        F.count("*").alias("n_train"),
        F.sum(F.when(F.col("verdict") != "kept", 1).otherwise(0))
         .cast("bigint").alias("n_quality_dropped"),
        F.sum(F.when((F.col("verdict") == "kept") & F.col("is_cont"), 1)
              .otherwise(0)).cast("bigint").alias("n_contaminated"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("bigint")
         .alias("n_dup_dropped"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint")
         .alias("n_kept"),
        F.sum(F.when(kept, F.size("w")).otherwise(0)).cast("bigint")
         .alias("kept_tokens"),
        F.round(F.sum(F.when(kept, 1).otherwise(0)).cast("double")
                / F.count("*"), 6).alias("retention")))
    return (manifest.join(F.broadcast(eval_ct), "lang", "left")
            .withColumn("n_eval",
                        F.coalesce("n_eval", F.lit(0)).cast("bigint"))
            .select("lang",
                    (F.col("n_train") + F.col("n_eval")).cast("bigint")
                    .alias("n_total"),
                    "n_eval", "n_quality_dropped", "n_contaminated",
                    "n_dup_dropped", "n_kept", "kept_tokens",
                    "retention"))
