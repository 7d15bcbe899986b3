"""Embedding-space corpus curation beyond candidate search: SemDeDup
cluster-pruning and Johnson-Lindenstrauss random projection.

Two training-data-pipeline operators the similarity/kmeans modules
don't cover (§2.11 beyond-reference surface; the reference Flink repo
has no ML operators):

- ``semdedup_prune`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  k-means-cluster the embedding corpus, then drop near-duplicate
  vectors *within* each cluster (cosine >= tau against any lower-id
  cluster-mate). The clustering is what makes semantic dedup tractable
  at 100 TB: the quadratic pair comparison is confined to one cluster,
  and K is chosen so |cluster| ~ corpus/K stays bounded (K grows with
  the corpus; the per-cluster work is then constant and the whole op is
  one cluster-keyed shuffle). Reuses the driver-proven Lloyd trainer
  (`operators/kmeans.py`) so the cluster assignment itself is
  oracle-checked.

- ``embedding_random_projection`` — JL sign projection (Achlioptas
  2003): project 64-d embeddings to 16-d with a deterministic {+1,-1}
  matrix derived from integer arithmetic (identical in Spark and
  DuckDB — no RNG), and audit pairwise-distance distortion on a fixed
  vector sample. This is the standard pre-ANN compression step: 4x
  smaller vectors -> 4x cheaper brute-force scoring and smaller LSH
  sketch input, with distance distortion bounded by JL. The projection
  itself is pure map-side array math (zero shuffle, zero UDF); the
  audit's pair join is over a broadcast-sized sample.

Determinism/oracle conventions follow kmeans.py: element-order
`aggregate` sums (sequential in both engines), 6-dp rounds at compare
boundaries, DECIMAL sums for order-insensitive means, explicit
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.operators.kmeans import (
    _FINAL_ASSIGN, _assign, _kmeans_ctes, _long_form, train_centroids)
from gmall_211027_flink_spark.operators.similarity import _with_norm
from gmall_211027_flink_spark.registry import query

# SemDeDup cosine threshold. The synthetic embedding corpus has no true
# near-duplicates (max in-cluster cosine ~0.51 at sf0.01, ~0.60 at
# sf0.1), so tau sits at the top of the observed similarity range to
# exercise the prune path end-to-end; a production run on a real corpus
# uses tau ~0.95+ — a constant change, same plan.
SEMDEDUP_TAU = 0.45

IN_DIM = 64      # embeddings table dimensionality (TESTDATA.md)
OUT_DIM = 16     # JL target dimensionality
JL_SAMPLE = 50   # vec_id < JL_SAMPLE form the distortion-audit pairs

# Deterministic {+1,-1} matrix entry for (in-dim d, out-dim j): mix the
# indices through an odd modulus, then take parity. Pure BIGINT
# arithmetic -> bit-identical in Spark and DuckDB, no RNG state. (Odd
# modulus matters: parity of d*odd + j*odd alone is just parity(d+j).)
_SIGN = ("(CASE WHEN ((CAST({d} AS BIGINT) * 1315423911"
         " + CAST({j} AS BIGINT) * 2654435761)"
         " % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END)")


@query(
    "semdedup_prune",
    oracle=f"""
    WITH {_kmeans_ctes()},
    {_FINAL_ASSIGN},
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    pruned AS (
      SELECT DISTINCT b.vec_id, b.c AS cluster
      FROM afin a JOIN afin b ON a.c = b.c AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_dot_product(ea.emb, eb.emb)
                  / (ea.norm * eb.norm), 6) >= {SEMDEDUP_TAU}
    )
    SELECT f.c AS cluster, COUNT(*) AS n_vecs,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COUNT(p.vec_id) AS BIGINT) AS n_kept,
           round(CAST(COUNT(*) - COUNT(p.vec_id) AS DOUBLE) / COUNT(*), 6)
             AS keep_rate
    FROM afin f LEFT JOIN pruned p ON p.vec_id = f.vec_id
    GROUP BY 1
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: per-cluster near-duplicate pruning summary.

    A vector is pruned when some lower-id vector in the SAME k-means
    cluster has cosine >= tau with it (keep-first, deterministic).
    Output: one row per cluster with population, pruned/kept counts and
    keep rate.

    Scale shape: assignment is the broadcast-centroid map stage from
    `kmeans_lloyd` (corpus never shuffles); the pair join is keyed on
    cluster id, so the quadratic comparison is confined per-cluster —
    at 100 TB you raise K so clusters stay ~1e4 vectors and the join
    stays balanced (K here is the gate-scale 8, which makes the
    cluster key low-cardinality; AQE skew-split covers the demo case).
    """
    cent = train_centroids(spark, sf_dir)
    assign = (_assign(_long_form(spark, sf_dir), cent)
              .select("vec_id", F.col("c").alias("cluster")))
    e = (_with_norm(load_table(spark, sf_dir, "embeddings"))
         .select("vec_id", "emb", "norm"))
    m = e.join(assign, "vec_id")
    a = m.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"),
                 F.col("norm").alias("a_norm"), "cluster")
    b = m.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"),
                 F.col("norm").alias("b_norm"), "cluster")
    dot = F.expr("aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y),"
                 " cast(0 as double), (acc, x) -> acc + x)")
    pruned = (a.join(b, ["cluster"])
              .filter(F.col("a_id") < F.col("b_id"))
              .withColumn("cosine",
                          F.round(dot / (F.col("a_norm") * F.col("b_norm")), 6))
              .filter(F.col("cosine") >= SEMDEDUP_TAU)
              .select("cluster", F.col("b_id").alias("vec_id"))
              .distinct())
    return (assign.join(pruned.withColumn("is_pruned", F.lit(1))
                        .select("vec_id", "is_pruned"), "vec_id", "left")
            .groupBy("cluster")
            .agg(F.count("*").alias("n_vecs"),
                 F.count("is_pruned").alias("n_pruned"),
                 (F.count("*") - F.count("is_pruned")).alias("n_kept"),
                 F.round((F.count("*") - F.count("is_pruned"))
                         .cast("double") / F.count("*"), 6)
                  .alias("keep_rate")))


def project_embeddings(df: DataFrame) -> DataFrame:
    """JL sign-projection: (vec_id, proj: array<double>[OUT_DIM]).

    Pure map-side expression — the full-corpus projection never
    shuffles and never leaves the JVM. ``df`` needs an ``emb``
    array<double> column (see `_with_norm`).
    """
    # Spark arrays: emb[d] subscript is 0-based.
    terms = " + ".join(
        f"emb[{d}] * {_SIGN.format(d=d, j='j')}" for d in range(IN_DIM))
    proj = (f"transform(sequence(0, {OUT_DIM - 1}),"
            f" j -> {terms})")
    return df.select("vec_id", F.expr(proj).alias("proj"))


def _jl_oracle() -> str:
    # DuckDB lists are 1-based; d below is the 0-based logical index.
    terms = " + ".join(
        f"emb[{d + 1}] * {_SIGN.format(d=d, j='(j - 1)')}"
        for d in range(IN_DIM))
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE vec_id < {JL_SAMPLE}
    ),
    p AS (
      SELECT vec_id, emb,
             list_transform(generate_series(1, {OUT_DIM}),
                            j -> {terms}) AS proj
      FROM e
    ),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        sqrt(list_sum(list_transform(generate_series(1, {IN_DIM}),
             i -> (a.emb[i] - b.emb[i]) * (a.emb[i] - b.emb[i])))) AS d_orig,
        sqrt(list_sum(list_transform(generate_series(1, {OUT_DIM}),
             i -> (a.proj[i] - b.proj[i]) * (a.proj[i] - b.proj[i]))))
          AS d_proj
      FROM p a JOIN p b ON a.vec_id < b.vec_id
    ),
    r AS (
      SELECT round(d_proj / (sqrt({OUT_DIM}.0) * d_orig), 6) AS ratio
      FROM pairs WHERE d_orig > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_ratio,
           MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio
    FROM r
    """


@query("embedding_random_projection", oracle=_jl_oracle())
def embedding_random_projection(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """JL 64->16 projection + distance-distortion audit (one row).

    ``ratio`` is pairwise euclidean distance after projection over
    sqrt(OUT_DIM) x the original distance — expectation 1.0 under the
    JL lemma; mean/min/max over the fixed ``vec_id < JL_SAMPLE`` pair
    set quantify how much ANN recall a 4x compression would cost
    BEFORE re-running the (much more expensive) `ann_*_recall` audits
    on projected vectors. The audit join is over a broadcast-sized
    sample; the projection operator itself (`project_embeddings`) is
    corpus-wide and shuffle-free.
    """
    e = (_with_norm(load_table(spark, sf_dir, "embeddings"))
         .filter(F.col("vec_id") < JL_SAMPLE)
         .select("vec_id", "emb"))
    p = e.join(project_embeddings(e), "vec_id")
    a = p.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"),
                 F.col("proj").alias("a_proj"))
    b = p.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"),
                 F.col("proj").alias("b_proj"))
    d_orig = F.expr(
        "sqrt(aggregate(zip_with(a_emb, b_emb, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, x) -> acc + x))")
    d_proj = F.expr(
        "sqrt(aggregate(zip_with(a_proj, b_proj, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, x) -> acc + x))")
    pairs = (a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
             .withColumn("d_orig", d_orig).withColumn("d_proj", d_proj)
             .filter(F.col("d_orig") > 0)
             .withColumn("ratio", F.round(
                 F.col("d_proj") / (F.lit(float(OUT_DIM) ** 0.5)
                                    * F.col("d_orig")), 6)))
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum(F.col("ratio").cast("decimal(18,6)")).cast("double")
                / F.count("*"), 6).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"))


# ---------------------------------------------------------------------------
# Recall cost of the 4x compression: brute-force top-k in the PROJECTED
# 16-d space vs the exact 64-d ranking. This is the measurement that
# decides whether the JL-projected corpus can replace the full-width
# one for candidate generation (recall ~1 -> score in 16-d and
# re-rank only the top candidates in 64-d; recall low -> raise OUT_DIM).
# Same shape as ann_ivf_recall: the exact baseline reuses the
# driver-proven ann_cosine_topk oracle verbatim.
# ---------------------------------------------------------------------------

def _projected_recall_oracle() -> str:
    from gmall_211027_flink_spark.operators.similarity import (
        N_QUERIES, TOP_K)
    from gmall_211027_flink_spark.registry import ORACLES
    terms = " + ".join(
        f"emb[{d + 1}] * {_SIGN.format(d=d, j='(j - 1)')}"
        for d in range(IN_DIM))
    return f"""
    WITH p AS (
      SELECT vec_id,
             list_transform(generate_series(1, {OUT_DIM}),
                            j -> {terms}) AS proj
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    ),
    pn AS (
      SELECT vec_id, proj,
             sqrt(list_dot_product(proj, proj)) AS norm FROM p
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.proj, c.proj) / (q.norm * c.norm), 6)
               AS cosine
      FROM pn q JOIN pn c ON q.vec_id < {N_QUERIES}
                         AND c.vec_id <> q.vec_id
    ),
    proj_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= {TOP_K}
    ),
    exact AS ({ORACLES["ann_cosine_topk"]})
    SELECT e.query_id, COUNT(*) AS exact_k,
           COUNT(pt.neighbor_id) AS found_ct,
           round(CAST(COUNT(pt.neighbor_id) AS DOUBLE) / COUNT(*), 6)
             AS recall_at_k
    FROM exact e
    LEFT JOIN proj_topk pt ON pt.query_id = e.query_id
                          AND pt.neighbor_id = e.neighbor_id
    GROUP BY 1
    """


@query("ann_projected_recall", oracle=_projected_recall_oracle())
def ann_projected_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of brute-force top-k in JL-projected 16-d space vs the
    exact 64-d ranking, per query vector."""
    from pyspark.sql import Window

    from gmall_211027_flink_spark.operators.similarity import (
        N_QUERIES, TOP_K, ann_cosine_topk)

    e = (_with_norm(load_table(spark, sf_dir, "embeddings"))
         .select("vec_id", "emb"))
    p = (project_embeddings(e)
         .withColumn("norm", F.expr(
             "sqrt(aggregate(proj, cast(0 as double),"
             " (acc, x) -> acc + x * x))")))
    q = (p.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("proj").alias("qp"), F.col("norm").alias("qn")))
    c = p.select(F.col("vec_id").alias("neighbor_id"), "proj", "norm")
    dot = F.expr("aggregate(zip_with(qp, proj, (x, y) -> x * y),"
                 " cast(0 as double), (acc, x) -> acc + x)")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               "neighbor_id")
    proj_topk = (c.join(F.broadcast(q),
                        F.col("neighbor_id") != F.col("query_id"))
                 .withColumn("cosine",
                             F.round(dot / (F.col("qn") * F.col("norm")), 6))
                 .withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= TOP_K)
                 .select("query_id", "neighbor_id",
                         F.lit(1).alias("hit")))
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return (exact.join(proj_topk, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("*").alias("exact_k"),
                 F.count("hit").alias("found_ct"),
                 F.round(F.count("hit").cast("double") / F.count("*"), 6)
                  .alias("recall_at_k")))


# ---------------------------------------------------------------------------
# MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
# diversified top-k: greedily pick the candidate maximizing
# lambda*sim(query, d) - (1-lambda)*max_{s in selected} sim(d, s) —
# the standard de-redundancy re-rank over an ANN candidate pool
# (retrieval-augmented data curation picks diverse exemplars, not five
# copies of the same cluster).
#
# Determinism/oracle: the greedy loop is UNROLLED to MMR_K fixed
# selection rounds (kmeans.py convention); the similarity INPUTS are
# 6-dp rounded but the mmr score itself is NOT — 0.7 x a 6-dp value
# lands exactly on 7-decimal half-way ties where the engines' round()
# disagree (found by the gate), while the unrounded IEEE combination
# of identical inputs is bit-identical in both engines. Ties break on
# neighbor_id, so both engines pick identical items. Scale shape: the
# candidate pool per query is the TOP_POOL ANN prefilter (broadcast-
# sized per query), each round is one window argmax per query — the
# greedy is O(k * pool) per query and embarrassingly parallel across
# queries.
# ---------------------------------------------------------------------------

MMR_K = 3          # selections per query (unrolled rounds)
MMR_LAMBDA = 0.7
MMR_POOL = 10      # ANN prefilter pool size fed to the greedy


def _mmr_oracle() -> str:
    from gmall_211027_flink_spark.operators.similarity import N_QUERIES
    sel_ctes = []
    for r in range(1, MMR_K + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT query_id, neighbor_id FROM s{i}" for i in range(1, r))
        if r == 1:
            score = f"({MMR_LAMBDA} * cosine)"
            pen_join = ""
        else:
            score = (f"({MMR_LAMBDA} * p.cosine"
                     f" - {1 - MMR_LAMBDA} * pen.mx)")
            pen_join = f"""
      JOIN (
        SELECT p2.query_id, p2.neighbor_id, MAX(pp.cos_nn) AS mx
        FROM pool p2
        JOIN ({prev_sel}) sel ON sel.query_id = p2.query_id
        JOIN pairsim pp ON pp.a = p2.neighbor_id AND pp.b = sel.neighbor_id
        GROUP BY 1, 2
      ) pen ON pen.query_id = p.query_id AND pen.neighbor_id = p.neighbor_id"""
        not_sel = (f" WHERE NOT EXISTS (SELECT 1 FROM ({prev_sel}) ps"
                   f" WHERE ps.query_id = p.query_id"
                   f" AND ps.neighbor_id = p.neighbor_id)"
                   if r > 1 else "")
        sel_ctes.append(f"""
    s{r} AS (
      SELECT query_id, neighbor_id, {r} AS pick, score FROM (
        SELECT p.query_id, p.neighbor_id, {score} AS score,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                                  ORDER BY {score} DESC, p.neighbor_id) AS rk
        FROM pool p{pen_join}{not_sel}
      ) WHERE rk = 1
    )""")
    picks = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1))
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    pool AS (
      SELECT query_id, neighbor_id, cosine FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.emb, c.emb) / (q.norm * c.norm), 6)
                 AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.emb, c.emb)
                                / (q.norm * c.norm), 6) DESC, c.vec_id) AS rk
        FROM e q JOIN e c ON q.vec_id < {N_QUERIES}
                         AND c.vec_id <> q.vec_id
      ) WHERE rk <= {MMR_POOL}
    ),
    pairsim AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6)
               AS cos_nn
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id IN (SELECT DISTINCT neighbor_id FROM pool)
        AND b.vec_id IN (SELECT DISTINCT neighbor_id FROM pool)
    ),
    {",".join(sel_ctes)}
    SELECT query_id, pick, neighbor_id, score FROM ({picks})
    """


@query("ann_mmr_diversified", oracle=_mmr_oracle())
def ann_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-MMR_K per query over an ANN candidate pool."""
    from pyspark.sql import Window

    from gmall_211027_flink_spark.operators.similarity import N_QUERIES

    e = _with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "emb", "norm")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), "emb", "norm")
    dot_qc = F.expr("aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
                    " cast(0 as double), (acc, x) -> acc + x)")
    wq = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                "neighbor_id")
    pool = (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cosine",
                        F.round(dot_qc / (F.col("qnorm") * F.col("norm")), 6))
            .withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") <= MMR_POOL)
            .select("query_id", "neighbor_id", "cosine")
            .localCheckpoint())
    pool_ids = pool.select(F.col("neighbor_id").alias("vec_id")).distinct()
    pe = e.join(pool_ids, "vec_id")
    pa = pe.select(F.col("vec_id").alias("a"), F.col("emb").alias("aemb"),
                   F.col("norm").alias("anorm"))
    pb = pe.select(F.col("vec_id").alias("b"), F.col("emb").alias("bemb"),
                   F.col("norm").alias("bnorm"))
    dot_ab = F.expr("aggregate(zip_with(aemb, bemb, (x, y) -> x * y),"
                    " cast(0 as double), (acc, x) -> acc + x)")
    pairsim = (pa.join(pb, F.col("a") != F.col("b"))
               .withColumn("cos_nn",
                           F.round(dot_ab / (F.col("anorm") * F.col("bnorm")), 6))
               .select("a", "b", "cos_nn").localCheckpoint())
    selected = None   # (query_id, pick, neighbor_id, score)
    for r in range(1, MMR_K + 1):
        if selected is None:
            scored = pool.withColumn(
                "score", F.lit(MMR_LAMBDA) * F.col("cosine"))
        else:
            pen = (pool.join(selected.select("query_id",
                                             F.col("neighbor_id").alias("sid")),
                             "query_id")
                   .join(pairsim, (F.col("neighbor_id") == F.col("a"))
                         & (F.col("sid") == F.col("b")))
                   .groupBy("query_id", "neighbor_id")
                   .agg(F.max("cos_nn").alias("mx")))
            scored = (pool.join(pen, ["query_id", "neighbor_id"])
                      .join(selected.select(
                          "query_id",
                          F.col("neighbor_id").alias("neighbor_id"),
                          F.lit(1).alias("_taken")),
                          ["query_id", "neighbor_id"], "left_anti")
                      .withColumn("score",
                                  F.lit(MMR_LAMBDA) * F.col("cosine")
                                  - F.lit(1 - MMR_LAMBDA) * F.col("mx")))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   "neighbor_id")
        pick = (scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select("query_id", F.lit(r).alias("pick"),
                        "neighbor_id", "score"))
        selected = pick if selected is None else \
            selected.unionByName(pick).localCheckpoint()
    return selected
