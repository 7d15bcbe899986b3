"""Reproducible sampling / dataset-split operators — a training-data
pipeline must be able to (a) carve train/val/test deterministically and
(b) downsample strata to target rates, such that re-running on the same
corpus (or an appended superset) yields the same assignment for every
unchanged row. That rules out `df.sample` (partition-order dependent):
the standard tool is a CONTENT-KEYED HASH BUCKET — split membership is a
pure function of the row key, so it is stable under repartitioning,
appends, and engine changes.

Scale: the assignment is one map-side expression (no shuffle, no state);
the per-stratum report below is an ordinary two-phase agg. The hash is
md5-derived integer math, identical in Spark and DuckDB, so the gate
proves bit-level reproducibility ACROSS ENGINES — the property that
makes a split auditable years later.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import query

TRAIN_PCT = 80
VAL_PCT = 10   # test gets the remainder


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from a key column: first 8 hex chars
    of md5(key as string) as an integer, mod buckets. Portable: DuckDB's
    ('0x' || substr(md5(x), 1, 8))::BIGINT % buckets is identical."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )


def assign_split(df: DataFrame, key: str,
                 train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT) -> DataFrame:
    """Add a `split` column (train/val/test) keyed on ``key``."""
    b = hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
         .when(b < train_pct + val_pct, "val")
         .otherwise("test"),
    )


@query(
    "sample_split_stratified",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < {TRAIN_PCT} THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS doc_ct,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY lang) AS share
    FROM assigned GROUP BY 1, 2
    """,
)
def sample_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = assign_split(load_table(spark, sf_dir, "documents"), "doc_id")
    from pyspark.sql import Window
    w = Window.partitionBy("lang")
    return (
        docs.groupBy("lang", "split").agg(F.count("*").alias("doc_ct"))
        .withColumn("share",
                    F.col("doc_ct").cast("double") / F.sum("doc_ct").over(w))
    )


# ---------------------------------------------------------------------------
# Rate-targeted stratified downsampling: keep each stratum (language) at
# its own target rate — the corpus-rebalancing pass (e.g. cap English,
# keep all low-resource languages). Same content-keyed hash bucket as
# assign_split, so the kept set is stable under repartition/append and
# identical across engines; a kept doc stays kept when rates only move
# upward (nested samples — buckets below the old rate stay below the
# new one).
# ---------------------------------------------------------------------------

STRATUM_RATES = {"en": 40, "de": 60, "fr": 60, "es": 60, "zh": 100}


@query(
    "sample_stratified_downsample",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 <
                  CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 60
                            WHEN 'fr' THEN 60 WHEN 'es' THEN 60
                            WHEN 'zh' THEN 100 ELSE 0 END
                  THEN 1 ELSE 0 END AS kept
      FROM documents
    )
    SELECT lang,
           CAST(SUM(kept) AS BIGINT) AS kept_ct,
           COUNT(*) AS total_ct,
           CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS realized_rate
    FROM assigned GROUP BY 1
    """,
)
def sample_stratified_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, r in STRATUM_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    kept = (hash_bucket(F.col("doc_id")) < rate).cast("int")
    return (
        docs.select("lang", kept.alias("kept"))
        .groupBy("lang")
        .agg(F.sum("kept").cast("bigint").alias("kept_ct"),
             F.count("*").alias("total_ct"),
             (F.sum("kept").cast("double") / F.count("*"))
              .alias("realized_rate"))
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle (training-order randomization): training
# wants corpus order decorrelated from crawl/source order, reproducibly
# — the same seed must give the same order on any cluster, any
# partitioning, any engine. df.orderBy(rand()) fails all of that, and a
# true global sort serializes. The standard shape: shard by a keyed
# hash (shards = the parallel read units downstream), order within each
# shard by an independent salted hash. Shuffle quality is the hash's;
# reproducibility is bit-level (md5 integer math, same as the split
# assigner above); scale cost is one hash shuffle + per-shard sort —
# no global bottleneck, and re-seeding is a salt change.
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 8
SHUFFLE_SALT = "seed42"


@query(
    "sample_deterministic_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {SHUFFLE_SHARDS} AS shard,
             md5('{SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)) AS ord_key
      FROM documents
    )
    SELECT shard,
           ROW_NUMBER() OVER (PARTITION BY shard
                              ORDER BY ord_key, doc_id) AS position,
           doc_id
    FROM keyed
    """,
)
def sample_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), SHUFFLE_SHARDS).alias("shard"),
        F.md5(F.concat(F.lit(SHUFFLE_SALT),
                       F.col("doc_id").cast("string"))).alias("ord_key"))
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return keyed.select(
        "shard", F.row_number().over(w).alias("position"), "doc_id")


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis / PPSWOR):
# top-n per stratum by the exponential key  -ln(u) / w  with u a
# content-keyed deterministic uniform — docs with larger weight
# (n_chars here: prefer long documents) win proportionally more often,
# no replacement, reproducible across engines and runs. The 100 TB
# shape: one map pass computes keys, per-stratum top-n is a bounded
# window (every stratum's candidate set streams through its partition;
# for a single giant stratum switch the window to the two-phase
# per-partition-top-n + merge used by ann_cosine_topk_pandas).
# u = (first-8-hex-of-md5 + 0.5) / 2^32  in (0,1) — same md5 keying as
# hash_bucket, so DuckDB reproduces it bit-for-bit; ln is 1-ulp across
# engines and keys are ~1e-5 apart at this corpus, so raw-double
# ranking with a doc_id tie-break is cross-engine stable.
# ---------------------------------------------------------------------------

PPSWOR_N = 5


@query(
    "sample_weighted_ppswor",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  + 0.5) / 4294967296.0)
               / GREATEST(n_chars, 1) AS k
      FROM documents
    )
    SELECT source, rk, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rk
      FROM keyed
    ) WHERE rk <= {PPSWOR_N}
    """,
)
def sample_weighted_ppswor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    v = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("bigint").cast("double") + 0.5) / (2.0 ** 32)
    k = -F.log(v) / F.greatest(F.col("n_chars"), F.lit(1))
    keyed = docs.select("source", "doc_id", "n_chars", k.alias("k"))
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    return (keyed.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= PPSWOR_N)
            .select("source", "rk", "doc_id", "n_chars"))


# ---------------------------------------------------------------------------
# Dataset snapshot diff: classify every primary key across two corpus
# versions as added / removed / changed / unchanged — the audit a
# pipeline runs between crawl refreshes before retraining ("how much
# actually moved?"), and the input to incremental reprocessing (only
# added+changed docs re-enter the dedup/quality stages).
#
# The v2 snapshot here is derived deterministically from v1 so both
# engines see identical inputs: doc_id % 11 == 3 dropped (removals),
# doc_id % 7 == 0 re-texted (changes), and a doc_id+offset slice
# re-keyed (additions). The operator itself is version-agnostic: a full
# outer join on the pk comparing content digests. At 100 TB both
# snapshots are bucketed by pk at write time, so the diff is a
# zero-shuffle co-located merge (operators/bucketing.py shape) and the
# per-status counts are two-phase aggs.
# ---------------------------------------------------------------------------

SNAP_ADD_OFFSET = 1_000_000


def snapshot_diff(old: DataFrame, new: DataFrame, pk: str,
                  digest_col: str, carry: list[str] | None = None) -> DataFrame:
    """(pk, status, *carry) for every key in either snapshot; digest_col
    is a precomputed content-hash column present in both frames.

    Presence is judged by explicit side markers, NOT by digest
    null-ness — a NULL digest (e.g. md5 of a NULL payload) on both
    sides must classify as unchanged, not added. ``carry`` columns are
    taken from the new side when present, else the old side.
    """
    carry = carry or []
    o = old.select(F.col(pk).alias("k"), F.col(digest_col).alias("oh"),
                   F.lit(1).alias("in_old"),
                   *[F.col(c).alias(f"o_{c}") for c in carry])
    n = new.select(F.col(pk).alias("k"), F.col(digest_col).alias("nh"),
                   F.lit(1).alias("in_new"),
                   *[F.col(c).alias(f"n_{c}") for c in carry])
    status = (F.when(F.col("in_old").isNull(), F.lit("added"))
              .when(F.col("in_new").isNull(), F.lit("removed"))
              .when(~F.col("oh").eqNullSafe(F.col("nh")), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return (o.join(n, "k", "full_outer")
            .select("k", status.alias("status"),
                    *[F.coalesce(f"n_{c}", f"o_{c}").alias(c)
                      for c in carry]))


@query(
    "dataset_snapshot_diff",
    oracle=f"""
    WITH v1 AS (SELECT doc_id, md5(text) AS h, source FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2') ELSE md5(text)
             END AS h,
             source
      FROM documents WHERE doc_id % 11 <> 3
      UNION ALL
      SELECT doc_id + {SNAP_ADD_OFFSET}, md5(text), source
      FROM documents WHERE doc_id % 13 = 5
    ),
    d AS (
      SELECT COALESCE(v1.doc_id, v2.doc_id) AS k,
             COALESCE(v2.source, v1.source) AS source,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN v1.h IS DISTINCT FROM v2.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT source, status, COUNT(*) AS n_docs
    FROM d GROUP BY 1, 2
    """,
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source added/removed/changed/unchanged counts between two
    deterministic snapshot versions of the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h"), "source")
    v2 = (docs.filter(F.col("doc_id") % 11 != 3)
          .select("doc_id",
                  F.when(F.col("doc_id") % 7 == 0,
                         F.md5(F.concat(F.col("text"), F.lit(" v2"))))
                   .otherwise(F.md5("text")).alias("h"),
                  "source")
          .unionAll(docs.filter(F.col("doc_id") % 13 == 5)
                    .select((F.col("doc_id") + SNAP_ADD_OFFSET)
                            .alias("doc_id"),
                            F.md5("text").alias("h"), "source")))
    d = snapshot_diff(v1, v2, "doc_id", "h", carry=["source"])
    return d.groupBy("source", "status").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# Deterministic per-group "reservoir": exactly k docs per language,
# chosen by content-hash rank — the distributed stand-in for reservoir
# sampling (same uniform-without-replacement guarantee, but stateless
# and re-runnable: the sample is a pure function of content, not of
# arrival order). One shuffle on lang; at 100 TB the per-lang rank is
# a top-k (takeOrdered) per partition-group, never a full sort of the
# corpus, because row_number over (hash) prunes to k after the window.
# ---------------------------------------------------------------------------

RESERVOIR_K = 5


@query(
    "sample_reservoir_per_group",
    oracle=f"""
    SELECT lang, rnk, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(text || CAST(doc_id AS VARCHAR)), doc_id)
               AS rnk
      FROM documents
    ) WHERE rnk <= {RESERVOIR_K}
    """,
)
def sample_reservoir_per_group(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("text"), F.col("doc_id").cast("string"))),
        F.col("doc_id"))
    return (docs.select("lang", "doc_id",
                        F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= RESERVOIR_K)
            .select("lang", "rnk", "doc_id"))


# ---------------------------------------------------------------------------
# Split-leakage audit: the check a training pipeline runs after
# assigning train/val/test — if the split key is the ROW id, duplicate
# CONTENT can land on both sides of the split and leak eval answers
# into training. Reports, for both keyings (row-id vs content-hash),
# how many content groups straddle >1 split. The content-keyed assigner
# (assign_split on md5(text) — sample_split_stratified's posture) must
# show ZERO leaky groups by construction; the row-id keying quantifies
# the leakage the naive choice would cause.
#
# Scale: one groupBy on the content digest (constant-size key) with
# COUNT(DISTINCT split) (bounded cardinality 3) — a single two-phase
# aggregation either way.
# ---------------------------------------------------------------------------

@query(
    "sample_split_leakage_audit",
    oracle=f"""
    WITH assigned AS (
      SELECT md5(text) AS h,
        CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT % 100 < {TRAIN_PCT} THEN 'train'
             WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
             ELSE 'test' END AS split_by_id,
        CASE WHEN ('0x' || substr(md5(text), 1, 8))
                  ::BIGINT % 100 < {TRAIN_PCT} THEN 'train'
             WHEN ('0x' || substr(md5(text), 1, 8))
                  ::BIGINT % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
             ELSE 'test' END AS split_by_content
      FROM documents
    ),
    per_keying AS (
      SELECT 'doc_id' AS keying, h, COUNT(*) AS n_docs,
             COUNT(DISTINCT split_by_id) AS n_splits
      FROM assigned GROUP BY 2
      UNION ALL
      SELECT 'content', h, COUNT(*), COUNT(DISTINCT split_by_content)
      FROM assigned GROUP BY 2
    )
    SELECT keying,
           CAST(COUNT(*) AS BIGINT) AS n_content_groups,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_groups,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END)
                AS BIGINT) AS n_docs_affected
    FROM per_keying GROUP BY 1
    """,
)
def sample_split_leakage_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.md5("text").alias("h"))

    def split_col(key):
        b = hash_bucket(key)
        return (F.when(b < TRAIN_PCT, "train")
                .when(b < TRAIN_PCT + VAL_PCT, "val")
                .otherwise("test"))

    assigned = docs.select(
        "h",
        split_col(F.col("doc_id")).alias("split_by_id"),
        split_col(F.col("text")).alias("split_by_content"))
    per = None
    for keying, col in (("doc_id", "split_by_id"),
                        ("content", "split_by_content")):
        g = (assigned.groupBy("h")
             .agg(F.count("*").alias("n_docs"),
                  F.countDistinct(col).alias("n_splits"))
             .select(F.lit(keying).alias("keying"), "n_docs", "n_splits"))
        per = g if per is None else per.unionAll(g)
    return (per.groupBy("keying")
            .agg(F.count("*").cast("bigint").alias("n_content_groups"),
                 F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
                 .cast("bigint").alias("n_leaky_groups"),
                 F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs"))
                       .otherwise(0)).cast("bigint")
                 .alias("n_docs_affected")))


# ---------------------------------------------------------------------------
# Temperature-based mixture resampling (the multilingual rebalancing
# rule from XLM-R / mT5: q_s = p_s^alpha / sum p^alpha with alpha < 1
# flattening the source distribution): per-source keep RATES are
# derived FROM the data (unlike mixture_weighted_sample's fixed weight
# table), then applied with the same content-keyed ppm threshold so the
# kept set is deterministic and engine-portable. floor(x + 0.5) for the
# ppm threshold (never round() on doubles — the repo's quantization
# convention); the one pow() rides through a 6-dp boundary like every
# ln() in this repo.
#
# Scale: counts are one two-phase aggregation; the per-source rate
# table is broadcast-sized; keep verdicts are a map-side hash compare.
# ---------------------------------------------------------------------------

TEMP_ALPHA = "0.7"     # identical literal text in both engines
TEMP_TARGET_FRAC = 2   # keep ~1/2 of the corpus overall


@query(
    "sample_temperature_rates",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total FROM counts),
    q AS (
      SELECT c.source, c.n,
             pow(CAST(c.n AS DOUBLE) / t.total, {TEMP_ALPHA}) AS pw,
             t.total
      FROM counts c CROSS JOIN tot t
    ),
    z AS (SELECT SUM(pw) AS zsum FROM q),
    rates AS (
      SELECT source, n, total,
             CAST(floor(least(1.0,
               (total / {TEMP_TARGET_FRAC}.0) * (pw / z.zsum) / n)
               * 1000000 + 0.5) AS BIGINT) AS rate_ppm
      FROM q CROSS JOIN z
    )
    SELECT r.source,
           CAST(r.n AS BIGINT) AS n_docs,
           round(CAST(r.n AS DOUBLE) / r.total, 6) AS p_source,
           r.rate_ppm,
           CAST(SUM(CASE WHEN ('0x' || substr(md5(d.text
                    || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000000 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_ct
    FROM documents d JOIN rates r USING (source)
    GROUP BY 1, 2, 3, 4
    """,
)
def sample_temperature_rates(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    q = (counts.crossJoin(F.broadcast(tot))
         .withColumn("pw", F.pow(F.col("n").cast("double")
                                 / F.col("total"),
                                 F.expr(TEMP_ALPHA))))
    z = q.agg(F.sum("pw").alias("zsum"))
    rate = F.floor(
        F.least(F.lit(1.0),
                (F.col("total") / F.expr(f"{TEMP_TARGET_FRAC}.0"))
                * (F.col("pw") / F.col("zsum")) / F.col("n"))
        * 1000000 + 0.5).cast("bigint")
    rates = (q.crossJoin(F.broadcast(z))
             .select("source", "n", "total", rate.alias("rate_ppm")))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("text"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("bigint") % 1000000)
    return (docs.join(F.broadcast(rates), "source")
            .groupBy("source",
                     F.col("n").cast("bigint").alias("n_docs"),
                     F.round(F.col("n").cast("double") / F.col("total"),
                             6).alias("p_source"),
                     "rate_ppm")
            .agg(F.sum(F.when(bucket < F.col("rate_ppm"), 1)
                       .otherwise(0)).cast("bigint").alias("kept_ct")))


# ---------------------------------------------------------------------------
# Chronological train/test split with EMBARGO: train strictly before
# t1, test at/after t2, the [t1, t2) gap dropped — the temporal-leakage
# discipline for forecasting/eval on time series (a random split leaks
# the future into train; an adjacent split leaks through autocorrelated
# boundary windows — the embargo buys a decorrelation gap). Companion
# to sample_split_leakage_audit, which checks CONTENT leakage.
#
# The audit row reports the realized gap in seconds (must cover the
# embargo) and how many users span both sides — expected nonzero (the
# same user existing on both sides is fine; the same TIME would not
# be), reported so the modeler sees the entity overlap they're
# accepting. All counts exact; one corpus pass + one tiny distinct-user
# semi-join.
# ---------------------------------------------------------------------------

EMBARGO_T1 = "2024-01-20"
EMBARGO_T2 = "2024-01-22"


@query(
    "sample_time_split_embargo",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN ts <  TIMESTAMP '{EMBARGO_T1} 00:00:00' THEN 'train'
                  WHEN ts >= TIMESTAMP '{EMBARGO_T2} 00:00:00' THEN 'test'
                  ELSE 'embargo' END AS split
      FROM events
    ),
    m AS (
      SELECT
        CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_train,
        CAST(SUM(CASE WHEN split = 'embargo' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_embargo,
        CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_test,
        MAX(CASE WHEN split = 'train' THEN us END) AS max_train_us,
        MIN(CASE WHEN split = 'test' THEN us END) AS min_test_us
      FROM tagged
    ),
    ov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_users FROM (
        SELECT user_id FROM tagged WHERE split = 'train'
        INTERSECT
        SELECT user_id FROM tagged WHERE split = 'test')
    )
    SELECT n_train, n_embargo, n_test,
           CAST((min_test_us - max_train_us) // 1000000 AS BIGINT)
             AS gap_seconds,
           (min_test_us - max_train_us) >= CAST(172800 AS BIGINT) * 1000000
             AS embargo_ok,
           ov.n_overlap_users
    FROM m CROSS JOIN ov
    """,
)
def sample_time_split_embargo(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id", F.unix_micros("ts").alias("us"),
        F.when(F.col("ts") < F.lit(f"{EMBARGO_T1} 00:00:00")
               .cast("timestamp"), "train")
         .when(F.col("ts") >= F.lit(f"{EMBARGO_T2} 00:00:00")
               .cast("timestamp"), "test")
         .otherwise("embargo").alias("split"))
    m = tagged.agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
         .cast("bigint").alias("n_train"),
        F.sum(F.when(F.col("split") == "embargo", 1).otherwise(0))
         .cast("bigint").alias("n_embargo"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
         .cast("bigint").alias("n_test"),
        F.max(F.when(F.col("split") == "train", F.col("us")))
         .alias("max_train_us"),
        F.min(F.when(F.col("split") == "test", F.col("us")))
         .alias("min_test_us"))
    tr = (tagged.filter(F.col("split") == "train")
          .select("user_id").distinct())
    te = (tagged.filter(F.col("split") == "test")
          .select("user_id").distinct())
    ov = (tr.join(te, "user_id")
          .agg(F.count("*").cast("bigint").alias("n_overlap_users")))
    gap = F.col("min_test_us") - F.col("max_train_us")
    return (m.crossJoin(F.broadcast(ov))
            .select("n_train", "n_embargo", "n_test",
                    F.expr("(min_test_us - max_train_us) div 1000000")
                     .cast("bigint").alias("gap_seconds"),
                    (gap >= F.lit(172800).cast("bigint") * 1000000)
                     .alias("embargo_ok"),
                    "n_overlap_users"))


# ---------------------------------------------------------------------------
# Group-aware holdout (GroupKFold posture): for behavioral data the
# leakage unit is the USER, not the event — if one user's events
# straddle train and test, the model sees the test user's behavior at
# train time. The split key is therefore the group id (user_id): every
# event inherits its group's hash bucket, so straddling is impossible
# BY CONSTRUCTION — and the audit still measures it from the assigned
# data (straddle_groups must be 0) rather than trusting the
# construction. Complements sample_split_leakage_audit (content
# leakage) and sample_time_split_embargo (temporal leakage).
#
# Scale shape: split assignment is a map-side hash expression; the
# audit is one groupBy(user_id) + one groupBy(split) — same cost class
# as any distinct-count over the fact table.
# ---------------------------------------------------------------------------

@query(
    "sample_group_holdout",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < {TRAIN_PCT} THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    ),
    per AS (
      SELECT split, COUNT(DISTINCT user_id) AS group_ct,
             COUNT(*) AS event_ct
      FROM assigned GROUP BY 1
    ),
    str AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS straddle_groups FROM (
        SELECT user_id FROM assigned
        GROUP BY user_id HAVING COUNT(DISTINCT split) > 1
      )
    )
    SELECT per.split, per.group_ct, per.event_ct, str.straddle_groups
    FROM per, str
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = assign_split(load_table(spark, sf_dir, "events"), "user_id")
    per = (ev.groupBy("split")
           .agg(F.countDistinct("user_id").cast("bigint").alias("group_ct"),
                F.count("*").cast("bigint").alias("event_ct")))
    straddle = (ev.groupBy("user_id")
                .agg(F.countDistinct("split").alias("n_splits"))
                .filter(F.col("n_splits") > 1)
                .agg(F.count("*").cast("bigint").alias("straddle_groups")))
    return per.crossJoin(F.broadcast(straddle))


# ---------------------------------------------------------------------------
# Class-balanced downsampling: cap every label at the minority class's
# size — the classifier-training rebalance pass. The kept set is the
# bottom-m rows per label under the content-keyed md5 order (stable
# under repartition/append, identical across engines, and NESTED: if m
# grows, previously-kept rows stay kept). One window rank per label
# after a broadcast of the 10-row class-size table.
# ---------------------------------------------------------------------------

@query(
    "sample_class_balance",
    oracle="""
    WITH sized AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
    ),
    m AS (SELECT MIN(n) AS m FROM sized),
    ranked AS (
      SELECT label,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM embeddings
    )
    SELECT r.label,
           CAST(COUNT(*) AS BIGINT) AS total_ct,
           CAST(SUM(CASE WHEN r.rn <= m.m THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_ct,
           round(CAST(SUM(CASE WHEN r.rn <= m.m THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS keep_rate
    FROM ranked r, m GROUP BY r.label
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    m = (e.groupBy("label").count()
         .agg(F.min("count").alias("m")))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id")
    ranked = e.withColumn("rn", F.row_number().over(w))
    return (ranked.crossJoin(F.broadcast(m))
            .groupBy("label")
            .agg(F.count("*").cast("bigint").alias("total_ct"),
                 F.sum(F.when(F.col("rn") <= F.col("m"), 1).otherwise(0))
                  .cast("bigint").alias("kept_ct"),
                 F.round(F.sum(F.when(F.col("rn") <= F.col("m"), 1)
                               .otherwise(0)).cast("double")
                         / F.count("*"), 6).alias("keep_rate")))


# ---------------------------------------------------------------------------
# Weighted sampling without replacement by PRIORITY (Efraimidis &
# Spirakis 2006): each row draws u ~ Uniform(0,1] and gets key
# u^(1/w); the K largest keys are a weighted sample without
# replacement. Equivalently (and numerically safer) rank by
# -ln(u)/w ASCENDING — an exponential race where weight w runs at
# rate w. Deterministic u comes from the repo's md5 convention
# (content-derived, replay-identical), so the "random" sample is
# reproducible across runs/engines — the property a training-data
# pipeline needs for auditable corpus draws.
#
# Scale: rank is a map-side expression; the top-K cut is orderBy+LIMIT
# which Spark executes as TakeOrdered (per-partition bottom-K, driver
# merge of K*P candidates) — no global sort. The rank is quantized to
# an int64 grid BEFORE the cut with doc_id as the total-order
# tie-break. GRID CHOICE (cross-engine float boundary): ln comes from
# each engine's libm (JVM Math.log is 1-ulp, not correctly rounded),
# so -ln(u)/w can differ by ~2 ulp ≈ 7e-15 absolute between engines.
# On the repo's standard 6-dp grid (x1e6) that is ≤ ~1e-8 grid units —
# it rides through floor(x+0.5) exactly like every other 6-dp-rounded
# transcendental here. A finer 1e12 grid would amplify the same drift
# to ~7e-3 grid units, a real flip risk at a .5 boundary (ADVICE r7).
# The coarser grid costs nothing semantically: collisions at 6 dp are
# rare and broken by doc_id identically in both engines.
# ---------------------------------------------------------------------------

WPS_K = 100
WPS_SPACE = 1 << 32      # 8 hex chars of md5 -> u in (0, 1]


@query(
    "sample_weighted_priority",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             CAST(floor(
               -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT + 1) / {float(WPS_SPACE)})
               / GREATEST(n_chars, 1) * 1e6 + 0.5) AS BIGINT) AS rank_q
      FROM documents
    )
    SELECT doc_id, source, n_chars, rank_q
    FROM keyed
    ORDER BY rank_q, doc_id
    LIMIT {WPS_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {WPS_K}-doc weighted sample (weight = n_chars) via
    Efraimidis-Spirakis priority keys on a content-derived uniform."""
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                 16, 10).cast("bigint") + 1) / F.lit(float(WPS_SPACE)))
    rank_q = F.floor(
        -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)) * 1e6 + 0.5
    ).cast("bigint")
    return (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source", "n_chars",
                    rank_q.alias("rank_q"))
            .orderBy("rank_q", "doc_id")
            .limit(WPS_K))


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al.,
# NeurIPS 2023): score every raw document by how target-like it is
# under hashed n-gram language models, w(doc) = sum over hashed
# feature buckets of n_b(doc) * log(p_target(b) / p_raw(b)), with
# Laplace smoothing. Target here = the 'en' slice; raw = the whole
# corpus; features = unigrams hashed into DSIR_BUCKETS buckets. This
# is the standard pretraining-data selection op between dedup and
# mixing.
#
# Scale shape: one token explode -> (doc, bucket) counts (the only
# corpus-sized shuffle); the two bucket LMs are DSIR_BUCKETS-row
# aggregates (broadcast); the per-doc weight is an exact DECIMAL dot
# product of integer counts with 6-dp-rounded log-ratios — the per-doc
# sum is order-insensitive (no float accumulation across buckets), so
# the top-K cut is engine-stable with the usual doc_id tie-break.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256
DSIR_K = 25
DSIR_TARGET_LANG = "en"


@query(
    "sample_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 4))
               ::BIGINT % {DSIR_BUCKETS} AS b
      FROM documents
    ),
    doc_b AS (
      SELECT doc_id, lang, source, b, COUNT(*) AS n_b
      FROM toks GROUP BY 1, 2, 3, 4
    ),
    raw_lm AS (
      SELECT b, COUNT(*) AS ct FROM toks GROUP BY 1
    ),
    tgt_lm AS (
      SELECT b, COUNT(*) AS ct FROM toks
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1
    ),
    tots AS (
      SELECT (SELECT COUNT(*) FROM toks) AS raw_tot,
             (SELECT COUNT(*) FROM toks
              WHERE lang = '{DSIR_TARGET_LANG}') AS tgt_tot
    ),
    llr AS (
      SELECT r.b,
             CAST(round(
               ln((COALESCE(t.ct, 0) + 1.0)
                  / (tots.tgt_tot + {DSIR_BUCKETS}))
               - ln((r.ct + 1.0) / (tots.raw_tot + {DSIR_BUCKETS})), 6)
               AS DECIMAL(18,6)) AS llr_b
      FROM raw_lm r LEFT JOIN tgt_lm t USING (b), tots
    ),
    weights AS (
      SELECT d.doc_id, d.lang, d.source,
             CAST(SUM(d.n_b * l.llr_b) AS DOUBLE) AS w
      FROM doc_b d JOIN llr l USING (b)
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, lang, source, round(w, 6) AS dsir_weight,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY round(w, 6) DESC, doc_id)
                    AS rk
          FROM weights)
    WHERE rk <= {DSIR_K}
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DSIR_K} most target-like docs by hashed-unigram DSIR
    log-importance against the '{DSIR_TARGET_LANG}' slice."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text")
    toks = (docs.select("doc_id", "lang", "source",
                        F.explode(F.split("text", " ")).alias("term"))
            .select("doc_id", "lang", "source",
                    (F.conv(F.substring(F.md5("term"), 1, 4), 16, 10)
                     .cast("bigint") % DSIR_BUCKETS).alias("b")))
    toks = toks.localCheckpoint(eager=False)    # reused by 4 subplans
    doc_b = toks.groupBy("doc_id", "lang", "source", "b").agg(
        F.count("*").alias("n_b"))
    raw_lm = toks.groupBy("b").agg(F.count("*").alias("raw_ct"))
    tgt_lm = (toks.filter(F.col("lang") == DSIR_TARGET_LANG)
              .groupBy("b").agg(F.count("*").alias("tgt_ct")))
    tots = toks.agg(
        F.count("*").alias("raw_tot"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)
              .otherwise(0)).alias("tgt_tot"))
    llr = (raw_lm.join(tgt_lm, "b", "left")
           .crossJoin(F.broadcast(tots))
           .select("b", F.round(
               F.log((F.coalesce(F.col("tgt_ct"), F.lit(0)) + 1.0)
                     / (F.col("tgt_tot") + DSIR_BUCKETS))
               - F.log((F.col("raw_ct") + 1.0)
                       / (F.col("raw_tot") + DSIR_BUCKETS)), 6)
               .cast("decimal(18,6)").alias("llr_b")))
    weights = (doc_b.join(F.broadcast(llr), "b")
               .groupBy("doc_id", "lang", "source")
               .agg(F.sum(F.col("n_b") * F.col("llr_b"))
                    .cast("double").alias("w")))
    rk = F.row_number().over(
        Window.orderBy(F.desc(F.round("w", 6)), "doc_id"))
    return (weights.withColumn("rk", rk)
            .filter(F.col("rk") <= DSIR_K)
            .select("doc_id", "lang", "source",
                    F.round("w", 6).alias("dsir_weight"),
                    F.col("rk").cast("bigint").alias("rk")))


# ---------------------------------------------------------------------------
# Effective sample size audit (r8) — the importance-sampling
# concentration diagnostic for length-proportional (PPS) document
# sampling: sampling documents with probability proportional to token
# count (the seq-packing-friendly design) concentrates mass on long
# documents; ESS = (SUM w)^2 / SUM w^2 says how many EFFECTIVE
# documents each source still contributes. ess_ratio near 1 = nearly
# uniform lengths; near 1/n = one giant document dominates. This is
# the number a curation pipeline checks before trusting any
# weighted-sample estimate (Kish 1965).
#
# Exactness: w = token count (BIGINT); both moments are exact DECIMAL
# sums; ESS is one division of exact decimals, rounded at 6 dp —
# identical doubles in both engines.
# ---------------------------------------------------------------------------

@query(
    "sample_ess_audit",
    oracle="""
    WITH w AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS sum_tokens,
           round(CAST(SUM(tok) AS DOUBLE) * CAST(SUM(tok) AS DOUBLE)
                 / CAST(SUM(tok * tok) AS DOUBLE), 6) AS ess,
           round(CAST(SUM(tok) AS DOUBLE) * CAST(SUM(tok) AS DOUBLE)
                 / CAST(SUM(tok * tok) AS DOUBLE) / COUNT(*), 6)
             AS ess_ratio
    FROM w GROUP BY 1
    """,
)
def sample_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of token-count (PPS) weights per
    source — the weighted-sampling concentration diagnostic."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("tok"))
    s = F.sum("tok").cast("double")
    s2 = F.sum(F.col("tok") * F.col("tok")).cast("double")
    return (w.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("tok").cast("bigint").alias("sum_tokens"),
                 F.round(s * s / s2, 6).alias("ess"),
                 F.round(s * s / s2 / F.count("*"), 6).alias("ess_ratio")))


# ---------------------------------------------------------------------------
# Neyman allocation (r9) — Neyman 1934: the optimal stratified-sample
# budget split n_h proportional to N_h * S_h (stratum size x stratum
# std), the design that minimizes the estimator variance for a fixed
# total budget. Run over documents stratified by source with n_chars
# as the survey variable: sources that are BIG and INTERNALLY DIVERSE
# get the samples; uniform sources get few. The integerization uses
# the largest-remainder (Hamilton) method so allocations sum exactly
# to the budget.
#
# Determinism: S_h comes from exact integer moments (N Sx2 - Sx^2);
# every double (weight, quota, remainder) is the identical expression
# over identical integers in both engines, and the remainder ranking
# tie-breaks on source name. Scale: one shuffle to source grain
# (~20 rows); everything after is constant-size.
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 1000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH mom AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sx2
      FROM documents GROUP BY 1
    ),
    wgt AS (
      SELECT source, n,
             n * sqrt((n * sx2 - sx * sx)
                      / (CAST(n AS DOUBLE) * (n - 1))) AS w
      FROM mom WHERE n > 1
    ),
    tot AS (SELECT SUM(w) AS wtot FROM wgt),
    quota AS (
      SELECT source, n, w,
             {NEYMAN_BUDGET} * w / t.wtot AS q,
             CAST(FLOOR({NEYMAN_BUDGET} * w / t.wtot) AS BIGINT) AS base
      FROM wgt, tot t
    ),
    short AS (
      SELECT CAST({NEYMAN_BUDGET} - SUM(base) AS BIGINT) AS extra
      FROM quota
    ),
    ranked AS (
      SELECT source, n, q, base,
             row_number() OVER (ORDER BY q - base DESC, source) AS rk
      FROM quota
    )
    SELECT source, n AS stratum_size,
           round(q, 6) AS quota,
           CAST(base + CASE WHEN rk <= s.extra THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc
    FROM ranked, short s ORDER BY source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder Neyman allocation of {NEYMAN_BUDGET} samples
    across document sources (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    mom = (docs.groupBy("source")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("n_chars").cast("bigint").alias("sx"),
                F.sum(F.col("n_chars") * F.col("n_chars"))
                .cast("bigint").alias("sx2")))
    wgt = (mom.filter(F.col("n") > 1)
           .select("source", "n",
                   (F.col("n") * F.sqrt(
                       (F.col("n") * F.col("sx2")
                        - F.col("sx") * F.col("sx"))
                       / (F.col("n").cast("double") * (F.col("n") - 1))))
                   .alias("w")))
    tot = wgt.agg(F.sum("w").alias("wtot"))
    quota = (wgt.crossJoin(F.broadcast(tot))
             .select("source", "n", "w",
                     (NEYMAN_BUDGET * F.col("w") / F.col("wtot")).alias("q"))
             .withColumn("base", F.floor(F.col("q")).cast("bigint")))
    short = quota.agg((F.lit(NEYMAN_BUDGET) - F.sum("base"))
                      .cast("bigint").alias("extra"))
    # ~20 sources: single-task rank window on a constant-size frame
    ranked = quota.withColumn(
        "rk", F.row_number().over(
            Window.orderBy((F.col("q") - F.col("base")).desc(), "source")))
    return (ranked.crossJoin(F.broadcast(short))
            .select("source", F.col("n").alias("stratum_size"),
                    F.round("q", 6).alias("quota"),
                    (F.col("base")
                     + F.when(F.col("rk") <= F.col("extra"), 1)
                     .otherwise(0)).cast("bigint").alias("n_alloc"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# K-center coreset selection (r10) — farthest-first traversal (Gonzalez
# 1985), the 2-approximation every coreset / diverse-subset pipeline
# starts from: pick the minimum-id vector, then 7 times pick the point
# FARTHEST from the chosen set (argmax of the running min-distance).
# The selected ids are the training-data coreset; the last selection
# distance is the coverage radius bound.
#
# EXACTNESS: centers are DATA POINTS, so every distance is the exact
# integer SUM_dims (qx_a - qx_b)^2 over 1e-9-quantized components
# (HUGEINT/DECIMAL(38,0)); argmax ties break on smallest vec_id. Both
# engines walk the identical selection sequence — no float anywhere.
#
# Scale: each round is ONE broadcast of the newly chosen center's 64
# scalar rows + a map-side least() update of the per-vector running
# min — O(rounds * n * d) with no pairwise blowup; the argmax is a
# TakeOrdered(1). The driver-side center-id collect is the documented
# bounded-scalar pattern (8 scalars total).
# ---------------------------------------------------------------------------

KCENTER_K = 8


def _kcenter_oracle() -> str:
    d2 = ("SUM(CAST(e.qx - c.qx AS HUGEINT) * (e.qx - c.qx))")
    ctes = ["""
    ex AS (
      SELECT e.vec_id, CAST(g.i - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                         * 1000000000 + 0.5) AS BIGINT) AS qx
      FROM embeddings e,
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    ),
    s0 AS (SELECT MIN(vec_id) AS cid FROM ex)"""]
    ctes.append(f"""
    m1 AS MATERIALIZED (
      SELECT e.vec_id, {d2} AS dmin
      FROM ex e JOIN ex c ON c.vec_id = (SELECT cid FROM s0)
                         AND c.dim = e.dim
      GROUP BY 1
    )""")
    for t in range(1, KCENTER_K):
        ctes.append(f"""
    s{t} AS MATERIALIZED (
      SELECT vec_id AS cid, dmin AS sel_d2
      FROM m{t} ORDER BY dmin DESC, vec_id LIMIT 1
    )""")
        if t < KCENTER_K - 1:
            ctes.append(f"""
    m{t + 1} AS MATERIALIZED (
      SELECT m.vec_id, LEAST(m.dmin, d.d) AS dmin
      FROM m{t} m JOIN (
        SELECT e.vec_id, {d2} AS d
        FROM ex e JOIN ex c ON c.vec_id = (SELECT cid FROM s{t})
                           AND c.dim = e.dim
        GROUP BY 1
      ) d ON d.vec_id = m.vec_id
    )""")
    sel = ["SELECT 0 AS sel_round, (SELECT cid FROM s0) AS vec_id,"
           " CAST(0 AS HUGEINT) AS sel_d2"]
    sel += [f"SELECT {t}, (SELECT cid FROM s{t}),"
            f" (SELECT sel_d2 FROM s{t})"
            for t in range(1, KCENTER_K)]
    union = " UNION ALL ".join(sel)
    return f"""
    WITH {','.join(ctes)}
    SELECT CAST(sel_round AS BIGINT) AS sel_round,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(sel_d2 AS BIGINT) AS sel_d2q
    FROM ({union}) ORDER BY 1
    """


@query("sample_kcenter_coreset", oracle=_kcenter_oracle())
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first {KCENTER_K}-center coreset over the embedding
    corpus, exact-integer distances (see block comment)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double)"
            " * 1000000000 + 0.5) as bigint))")).alias("dim_i", "qx")
    ).select("vec_id", F.col("dim_i").cast("bigint").alias("dim"), "qx") \
     .localCheckpoint()

    def d_to(cid: int) -> DataFrame:
        c = ex.filter(F.col("vec_id") == cid).select(
            "dim", F.col("qx").alias("cqx"))
        diff = F.col("qx") - F.col("cqx")
        return (ex.join(F.broadcast(c), "dim")
                .groupBy("vec_id")
                .agg(F.sum(diff.cast("decimal(38,0)") * diff).alias("d")))

    first = ex.agg(F.min("vec_id")).first()[0]   # bounded-scalar collect
    chosen = [(0, int(first), 0)]
    mdf = d_to(first).withColumnRenamed("d", "dmin").localCheckpoint()
    for t in range(1, KCENTER_K):
        top = (mdf.orderBy(F.desc("dmin"), "vec_id").limit(1)
               .first())                          # bounded-scalar collect
        chosen.append((t, int(top["vec_id"]), int(top["dmin"])))
        if t < KCENTER_K - 1:
            nd = d_to(int(top["vec_id"]))
            mdf = (mdf.join(nd, "vec_id")
                   .select("vec_id",
                           F.least("dmin", "d").alias("dmin"))
                   .localCheckpoint())
    out = spark.createDataFrame(
        [(r, v, d) for r, v, d in chosen],
        "sel_round bigint, vec_id bigint, sel_d2q bigint")
    return out.orderBy("sel_round")


# ---------------------------------------------------------------------------
# Systematic interval sampling (r11) — the classic every-k-th design:
# order the frame by a stable key, take rows at a fixed stride from a
# fixed anchor. Complements the probabilistic samplers in this module
# (PPSWOR, reservoir, stratified): systematic sampling is the one a
# warehouse uses when it needs REPRODUCIBLE row picks without storing
# per-row randomness — the stride/anchor ARE the sample definition.
# The audit compares exact sample vs population means (cents) and the
# largest realized key gap (stride uniformity). EXACTNESS: rank by the
# unique o_orderkey (total order), integer stride arithmetic, exact
# sums; readouts quantized. SCALE (reworked r12, re-capped r13): the
# rank is the TWO-LEVEL grid_rank (operators/ranks.py) over key-range
# blocks — no single-task sort.  The block WIDTH is derived from the
# observed max key so the block COUNT is capped at SYSTEMATIC_BLOCKS
# regardless of row count (ADVICE r12: a fixed 8192-key width made the
# grid data-proportional, ~1e8 blocks at 100 TB, which would have
# broken grid_rank's bounded-grid premise).  One metadata-cheap
# max(o_orderkey) aggregate buys a grid that never exceeds ~4k rows at
# any scale; the sample's key-gap maximum is likewise two-level
# (within-block lag windows partitioned by block, block-boundary gaps
# stitched on the same capped block grid).
# ---------------------------------------------------------------------------

SYSTEMATIC_STRIDE = 97
SYSTEMATIC_ANCHOR = 13
SYSTEMATIC_BLOCKS = 4096   # hard cap on the rank/block grid cardinality


@query(
    "sample_systematic_interval",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rk
      FROM orders
    ),
    samp AS (
      SELECT * FROM ranked
      WHERE (rk - 1) % {SYSTEMATIC_STRIDE} = {SYSTEMATIC_ANCHOR}
    ),
    gaps AS (
      SELECT o_orderkey - lag(o_orderkey) OVER (ORDER BY rk) AS keygap
      FROM samp
    )
    SELECT CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_pop,
           CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_sample,
           CAST(CAST(floor(CAST((SELECT SUM(cents) FROM ranked) AS DOUBLE)
                           / (SELECT COUNT(*) FROM ranked)
                           * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS mean_cents_pop,
           CAST(CAST(floor(CAST((SELECT SUM(cents) FROM samp) AS DOUBLE)
                           / (SELECT COUNT(*) FROM samp)
                           * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS mean_cents_sample,
           CAST((SELECT MAX(keygap) FROM gaps) AS BIGINT) AS max_key_gap
    """,
)
def sample_systematic_interval(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Every-97th systematic sample from anchor 13 on the orderkey
    order; mean-vs-population and stride-uniformity audit (see block
    comment)."""
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    orders = load_table(spark, sf_dir, "orders")
    # count-capped block width: ceil((max_key + 1) / SYSTEMATIC_BLOCKS),
    # floored at 1 — the block grid is <= SYSTEMATIC_BLOCKS + 1 rows at
    # ANY data scale (the max() agg is a map-side-partial scalar; its
    # 1-row result rides a broadcast cross join onto every row)
    wdf = orders.agg(F.expr(
        f"cast(greatest((max(o_orderkey) + {SYSTEMATIC_BLOCKS})"
        f" div {SYSTEMATIC_BLOCKS}, 1) as bigint)").alias("_bw"))
    ranked = grid_rank(
        orders.select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint").alias("cents"))
        .crossJoin(F.broadcast(wdf)),
        ["o_orderkey"], F.expr("o_orderkey div _bw"))
    samp = ranked.filter(
        (F.col("rk") - 1) % SYSTEMATIC_STRIDE == SYSTEMATIC_ANCHOR)
    # two-level key-gap max: consecutive sampled keys either share a
    # width-_bw block (partitioned lag) or straddle blocks (lag of the
    # per-block first/last keys over the capped block grid)
    sb = samp.withColumn("blk", F.expr("o_orderkey div _bw"))
    within = sb.select(
        (F.col("o_orderkey")
         - F.lag("o_orderkey").over(Window.partitionBy("blk")
                                    .orderBy("o_orderkey")))
        .alias("keygap"))
    bounds = sb.groupBy("blk").agg(
        F.min("o_orderkey").alias("first_k"),
        F.max("o_orderkey").alias("last_k"))
    boundary = bounds.select(
        (F.col("first_k")
         - F.lag("last_k").over(Window.orderBy("blk"))).alias("keygap"))
    gaps = within.unionByName(boundary)
    pop = ranked.agg(
        F.count("*").cast("bigint").alias("n_pop"),
        F.sum("cents").cast("bigint").alias("sc"))
    sm = samp.agg(
        F.count("*").cast("bigint").alias("n_sample"),
        F.sum("cents").cast("bigint").alias("ss"))
    gp = gaps.agg(F.max("keygap").cast("bigint").alias("max_key_gap"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return (pop.crossJoin(F.broadcast(sm)).crossJoin(F.broadcast(gp))
            .select("n_pop", "n_sample",
                    q6(F.col("sc").cast("double") / F.col("n_pop"))
                    .alias("mean_cents_pop"),
                    q6(F.col("ss").cast("double") / F.col("n_sample"))
                    .alias("mean_cents_sample"),
                    "max_key_gap"))
