"""Similarity search over an embedding column (`array<float>`) —
brute-force cosine top-k baseline + a bucketed (LSH/IVF-style) scale path.

Scale design:

- **Brute force** is the correctness baseline: broadcast the (small)
  query set against the corpus — one pass, no shuffle of the corpus,
  per-row JVM-side arithmetic (``zip_with``/``aggregate``, no Python).
  At 100 TB corpus this is a single map stage + a top-k aggregation.
- **Sign-LSH buckets**: each vector gets a b-bit sketch (signs of its
  first b components — a fixed, data-independent set of hyperplanes);
  queries probe only their bucket. Candidate generation becomes an
  equi-join on the sketch, so the corpus never moves — the classic
  IVF/LSH trade of recall for a ~2^b fanout cut.

Determinism/oracle note: cosine is computed in double, rounded to 6 dp
*before* ranking, ties broken by vec_id — so Spark and DuckDB rank
identically (raw float ranking could flip on last-bit differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import ORACLES, query

N_QUERIES = 20     # vec_id < 20 are the query set
TOP_K = 5
LSH_BITS = 8


def _with_norm(df: DataFrame) -> DataFrame:
    """Add double-precision embedding + its L2 norm (JVM-side, no UDF)."""
    return (
        df.withColumn("emb", F.expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("norm", F.expr(
            "sqrt(aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x))"))
    )


_DOT = "aggregate(zip_with(q.emb, c.emb, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (baseline).
# ---------------------------------------------------------------------------

@query(
    "ann_cosine_topk",
    bench=True,
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb) / (q.norm * c.norm), 6) AS cosine
      FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, rk AS rank, neighbor_id, cosine
    FROM ranked WHERE rk <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), "emb", "norm")
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (F.col("qnorm") * F.col("norm")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# Sign-LSH bucketed ANN (scale path): probe only the query's bucket.
# ---------------------------------------------------------------------------

@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
             list_aggregate(
               list_transform(embedding[1:{LSH_BITS}],
                              x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
               'string_agg', '') AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
             round(list_dot_product(q.emb, c.emb) / (q.norm * c.norm), 6) AS cosine
      FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, bucket, rk AS rank, neighbor_id, cosine
    FROM ranked WHERE rk <= {TOP_K}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket",
        F.expr(
            f"concat_ws('', transform(slice(embedding, 1, {LSH_BITS}),"
            " x -> case when x >= 0 then '1' else '0' end))"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"), "bucket")
    c = e.select(F.col("vec_id").alias("neighbor_id"), "emb", "norm",
                 F.col("bucket").alias("cbucket"))
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    scored = (
        c.join(F.broadcast(q),
               (F.col("bucket") == F.col("cbucket"))
               & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cosine", F.round(dot / (F.col("qnorm") * F.col("norm")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "bucket", F.col("rank").alias("rank"),
                "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs (cosine >= threshold) among the whole
# corpus, via LSH buckets (no all-pairs).
# ---------------------------------------------------------------------------

@query(
    "embedding_near_dup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
             list_aggregate(
               list_transform(embedding[1:{LSH_BITS}],
                              x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
               'string_agg', '') AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6) AS cosine
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6) >= 0.4
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket",
        F.expr(
            f"concat_ws('', transform(slice(embedding, 1, {LSH_BITS}),"
            " x -> case when x >= 0 then '1' else '0' end))"),
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.emb, b.emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    cosine = F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"),
            cosine.alias("cosine"))
        .filter(F.col("cosine") >= 0.4)
    )


# ---------------------------------------------------------------------------
# IVF-style ANN (scale path #2): partition the corpus into K cells around
# fixed centroids, probe only the NPROBE nearest cells per query. This is
# the inverted-file layout: at 100 TB the corpus is written partitioned
# by cell, so a probe reads NPROBE/K of the data (partition pruning on
# the cell column); the cell assignment itself is one broadcast-map pass.
# Centroids here are a deterministic sample (the first K vectors) so the
# DuckDB oracle reproduces them exactly; production would plug k-means
# centroids into the same plan.
# ---------------------------------------------------------------------------

K_CENTROIDS = 8
NPROBE = 2


@query(
    "ann_ivf_probe",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS da
      FROM embeddings
    ),
    cen AS (
      SELECT vec_id AS cid, emb AS cemb, da AS dc FROM e
      WHERE vec_id < {K_CENTROIDS}
    ),
    dist AS (
      SELECT e.vec_id, cen.cid,
             round(e.da - 2 * list_dot_product(e.emb, cen.cemb) + cen.dc, 6) AS d2
      FROM e CROSS JOIN cen
    ),
    ranked_cells AS (
      SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY d2, cid) AS crk
      FROM dist
    ),
    cells AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE crk = 1),
    probes AS (
      SELECT vec_id AS query_id, cid AS cell FROM ranked_cells
      WHERE crk <= {NPROBE} AND vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb)
                   / (sqrt(q.da) * sqrt(c.da)), 6) AS cosine
      FROM probes p
      JOIN cells cc ON cc.cell = p.cell
      JOIN e c ON c.vec_id = cc.vec_id AND c.vec_id <> p.query_id
      JOIN e q ON q.vec_id = p.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, rk AS rank, neighbor_id, cosine
    FROM ranked WHERE rk <= {TOP_K}
    """,
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("emb", F.expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("da", F.expr(
            "aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x)"))
        .select("vec_id", "emb", "da")
    )
    cen = (e.filter(F.col("vec_id") < K_CENTROIDS)
           .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"),
                   F.col("da").alias("dc")))
    dac = F.expr(
        "aggregate(zip_with(emb, cemb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    # one broadcast-map pass assigns every vector to its cell; the same
    # ranked frame yields the query probe lists (rk <= NPROBE)
    dist = (e.crossJoin(F.broadcast(cen))
            .withColumn("d2", F.round(F.col("da") - 2 * dac + F.col("dc"), 6)))
    wcell = Window.partitionBy("vec_id").orderBy("d2", "cid")
    ranked_cells = dist.select(
        "vec_id", "cid", F.row_number().over(wcell).alias("crk"))
    cells = ranked_cells.filter(F.col("crk") == 1) \
        .select("vec_id", F.col("cid").alias("cell"))
    probes = (ranked_cells
              .filter((F.col("crk") <= NPROBE) & (F.col("vec_id") < N_QUERIES))
              .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell")))
    q = (e.join(probes, e.vec_id == probes.query_id)
         .select("query_id", "cell", F.col("emb").alias("qemb"),
                 F.col("da").alias("qda")))
    c = (e.join(cells, "vec_id")
         .select(F.col("vec_id").alias("neighbor_id"), "emb", "da", "cell"))
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    scored = (
        c.join(F.broadcast(q),
               (c.cell == q.cell) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cosine", F.round(dot / (F.sqrt("qda") * F.sqrt("da")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k, Arrow/Pandas-vectorized variant: mapInPandas
# over corpus partitions with the (tiny, bounded) query matrix shipped as
# a broadcast numpy array; each Arrow batch scores against all queries in
# ONE BLAS matmul and emits only its per-partition top-k per query, so
# the final exact window ranks npartitions*k candidates instead of the
# full corpus (top-k over per-partition top-ks is exact because the
# order (cosine DESC, neighbor_id) is total). Same oracle as the HOF
# form — the two implementations must agree bit-for-bit after the 6-dp
# round. This is the shape to prefer when vectors are wide (matmul amortizes
# Arrow transfer); the JVM higher-order-function form wins when vectors
# are short (no Python boundary at all). Measured tradeoff in SCALE.md.
# ---------------------------------------------------------------------------

@query("ann_cosine_topk_pandas", oracle=ORACLES["ann_cosine_topk"])
def ann_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrows = (e.filter(F.col("vec_id") < N_QUERIES)
             .orderBy("vec_id").collect())          # bounded: N_QUERIES rows
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    bc = spark.sparkContext.broadcast((qids, Q, qnorm))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        qids_, Q_, qnorm_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            norms = np.sqrt((M * M).sum(axis=1))
            cos = np.round((M @ Q_.T) / (norms[:, None] * qnorm_[None, :]), 6)
            parts = []
            for j, qid in enumerate(qids_):
                mask = ids != qid
                cj, ij = cos[mask, j], ids[mask]
                k = min(TOP_K, len(cj))
                if k == 0:
                    continue
                # exact per-partition top-k under (cosine DESC, id ASC)
                order = np.lexsort((ij, -cj))[:k]
                parts.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ij[order],
                    "cosine": cj[order]}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    cand = e.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF recall audit — the ANN twin of dedup_minhash_recall (SCALE.md §7):
# measure recall@TOP_K of the NPROBE-cell IVF probe against the exact
# brute-force ranking, per query. This is the knob-tuning query a
# pipeline runs on a sample before committing (K_CENTROIDS, NPROBE) to
# a full-corpus pass: recall too low -> raise NPROBE (probe cost grows
# linearly) or train better centroids; recall 1.0 with tiny probe sets
# -> cells can be split further. Both inputs are TOP_K x N_QUERIES rows,
# so the audit join is trivially small at any corpus size.
# ---------------------------------------------------------------------------

@query(
    "ann_ivf_recall",
    oracle=f"""
    WITH exact AS ({{exact}}),
    ivf AS ({{ivf}})
    SELECT e.query_id,
           COUNT(*) AS exact_k,
           COUNT(i.neighbor_id) AS found_ct,
           round(CAST(COUNT(i.neighbor_id) AS DOUBLE) / COUNT(*), 6)
             AS recall
    FROM exact e
    LEFT JOIN ivf i ON i.query_id = e.query_id
                   AND i.neighbor_id = e.neighbor_id
    GROUP BY 1
    """.format(exact=ORACLES["ann_cosine_topk"],
               ivf=ORACLES["ann_ivf_probe"]),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (ann_ivf_probe(spark, sf_dir)
           .select(F.col("query_id").alias("i_q"),
                   F.col("neighbor_id").alias("i_n"),
                   F.lit(1).alias("hit")))
    return (
        exact.join(ivf, (F.col("query_id") == F.col("i_q"))
                   & (F.col("neighbor_id") == F.col("i_n")), "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("exact_k"),
             F.count("hit").alias("found_ct"),
             F.round(F.count("hit").cast("double") / F.count("*"), 6)
              .alias("recall"))
    )


# ---------------------------------------------------------------------------
# Per-class centroids (class prototypes / one k-means step / the "mean
# pooling by label" every embedding pipeline runs). Emitted in LONG form
# (label, dim, centroid) — element-wise aggregation over array columns
# distributes as posexplode → two-phase avg per (label, dim) → nothing
# but scalars ever shuffles, and the output shape sidesteps array
# construction-order parity questions. At 100 TB: the explode is
# map-side ×dim row amplification of scalar rows (8 B values), partial
# aggregation collapses it before the exchange, and the final state is
# |labels|×dim cells regardless of corpus size.
#
# EXACTNESS (hardened round 10, float-discipline sweep): avg(DOUBLE)
# was an UNORDERED float accumulation — the stats_cramers_v failure
# class. Each component is half-up-quantized to an integer
# qx = floor(x*1e9 + 0.5) per row (deterministic, both engines), the
# per-(label, dim) SUM is exact BIGINT (order-free), and the emitted
# centroid is the single deterministic double CAST(sum)/(n*1e9).
# Headroom: |sum| <= n*1e9 stays under 2^53 for n up to ~9e6 vectors
# per label (document counts here are thousands).
# ---------------------------------------------------------------------------

@query(
    "ann_label_centroids",
    oracle="""
    SELECT e.label, CAST(g.i - 1 AS BIGINT) AS dim,
           CAST(SUM(CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                                * 1000000000 + 0.5) AS BIGINT))
                AS DOUBLE)
             / (COUNT(*) * 1000000000.0) AS centroid,
           COUNT(*) AS n_vecs
    FROM embeddings e,
         UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    GROUP BY 1, 2
    """,
)
def ann_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(
            F.expr("transform(embedding, x -> cast(x as double))")
        ).alias("dim", "x"))
    qx = F.floor(F.col("x") * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint")
    return (
        e.groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg((F.sum(qx).cast("double")
              / (F.count("*") * F.lit(1000000000.0))).alias("centroid"),
             F.count("*").alias("n_vecs"))
    )


# ---------------------------------------------------------------------------
# Nearest-centroid confusion audit: assign every vector to its nearest
# class centroid and cross-tab against the true label — the purity
# check for centroid classifiers and (same math) for how well IVF cells
# line up with labels. Long-form join shape: exploded (vec, dim, x)
# scalar rows join centroids on dim, partial-agg squared distance per
# (vec, candidate), argmin with a (d2, label) total order. At 100 TB
# prefer the broadcast-matrix mapInPandas form (ann_cosine_topk_pandas)
# — one matmul per Arrow batch — over the x|labels| row amplification;
# the SQL shape here is the oracle-checkable reference semantics.
# ---------------------------------------------------------------------------

@query(
    "ann_nearest_centroid_confusion",
    oracle="""
    WITH cen AS (
      SELECT e.label, CAST(g.i - 1 AS BIGINT) AS dim,
             CAST(SUM(CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                                  * 1000000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings e,
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
      GROUP BY 1, 2
    ),
    ex AS (
      SELECT e.vec_id, e.label AS true_label, CAST(g.i - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                         * 1000000000 + 0.5) AS BIGINT) AS qx
      FROM embeddings e,
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    ),
    d AS (
      SELECT ex.vec_id, ex.true_label, c.label AS cand,
             SUM(CAST(ex.qx * c.n - c.sq AS HUGEINT)
                 * (ex.qx * c.n - c.sq)) AS num,
             any_value(c.n) AS n
      FROM ex JOIN cen c ON c.dim = ex.dim
      GROUP BY 1, 2, 3
    ),
    assign AS (
      SELECT vec_id, true_label, cand,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY (2 * num + n * n * 1000000000)
                                         // (2 * n * n * 1000000000),
                                         cand) AS rk
      FROM d
    )
    SELECT true_label, cand AS assigned_label, COUNT(*) AS vec_ct
    FROM assign WHERE rk = 1 GROUP BY 1, 2
    """,
)
def ann_nearest_centroid_confusion(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # EXACTNESS (round-10 sweep): with centroid = sq/(n*1e9) kept in
    # RATIONAL form, the squared distance ordering is
    #   d2 ~ SUM_dims (qx*n - sq)^2 / (n^2 * 1e18)
    # whose numerator is an exact DECIMAL(38,0)/HUGEINT sum; the argmin
    # ranks on the half-up 1e-9-quantized integer d2 — the unordered
    # double d2 SUM feeding a rank boundary is gone.
    emb = load_table(spark, sf_dir, "embeddings")
    qx_expr = F.floor(F.col("x") * F.lit(1000000000.0)
                      + F.lit(0.5)).cast("bigint")
    long_q = emb.select(
        "vec_id", "label",
        F.posexplode(
            F.expr("transform(embedding, x -> cast(x as double))")
        ).alias("dim_i", "x")
    ).select("vec_id", "label",
             F.col("dim_i").cast("bigint").alias("dim"),
             qx_expr.alias("qx"))
    cen = (long_q.groupBy(F.col("label").alias("cand"), "dim")
           .agg(F.sum("qx").cast("bigint").alias("sq"),
                F.count("*").cast("bigint").alias("n")))
    ex = long_q.select("vec_id", F.col("label").alias("true_label"),
                       "dim", "qx")
    diff = F.col("qx") * F.col("n") - F.col("sq")
    d = (ex.join(F.broadcast(cen), "dim")
         .groupBy("vec_id", "true_label", "cand")
         .agg(F.sum(diff.cast("decimal(38,0)") * diff).alias("num"),
              F.first("n").alias("n")))
    d = d.withColumn("d2q", F.expr(
        "(2 * num + cast(n as decimal(38,0)) * n * 1000000000)"
        " div (2 * cast(n as decimal(38,0)) * n * 1000000000)"))
    w = Window.partitionBy("vec_id").orderBy("d2q", "cand")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("true_label", F.col("cand").alias("assigned_label"))
        .agg(F.count("*").alias("vec_ct"))
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training pairs: for each query
# vector, the top-k most-similar corpus vectors with a DIFFERENT label
# (the near-miss negatives that make embedding/classifier training
# sharp; same recipe as DPR/contrastive retrieval data prep — similar
# enough to confuse, labeled differently). Same broadcast-query scan
# shape as ann_cosine_topk with the label-inequality pushed into the
# join, so non-candidates are dropped before scoring.
# ---------------------------------------------------------------------------

@query(
    "ann_hard_negatives",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             round(list_dot_product(q.emb, c.emb) / (q.norm * c.norm), 6)
               AS cosine
      FROM e q JOIN e c ON q.vec_id < {N_QUERIES}
                       AND c.label <> q.label
    )
    SELECT query_id, query_label, rk AS rank, negative_id,
           negative_label, cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, negative_id) AS rk
      FROM scored
    ) WHERE rk <= {TOP_K}
    """,
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k different-label near neighbors per query (hard negatives)."""
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("query_label"),
        F.col("emb").alias("qemb"), F.col("norm").alias("qnorm"))
    c = e.select(F.col("vec_id").alias("negative_id"),
                 F.col("label").alias("negative_label"), "emb", "norm")
    dot = F.expr("aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
                 " cast(0 as double), (acc, x) -> acc + x)")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               "negative_id")
    return (c.join(F.broadcast(q),
                   F.col("negative_label") != F.col("query_label"))
            .withColumn("cosine",
                        F.round(dot / (F.col("qnorm") * F.col("norm")), 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "query_label", "rank", "negative_id",
                    "negative_label", "cosine"))


# ---------------------------------------------------------------------------
# Int8 symmetric quantization audit: per-vector absmax scale, codes in
# [-127, 127], reconstruction error — the storage-compression check run
# before shipping a quantized ANN index (4x memory cut at 100 TB means
# the corpus side of every ANN probe above fits 4x more vectors per
# executor).
#
# Determinism: codes are floor(x/scale + 0.5) — floor on doubles is
# exact in both engines (no decimal-repr HALF_UP ambiguity, the round-4
# MMR lesson); code_l1 is an exact integer check that the two engines
# derived IDENTICAL codes, so mse/max_abs_err only have to agree at the
# usual 6-dp boundary. absmax/max are order-insensitive; the error sum
# mirrors the list_dot_product <-> aggregate() fold pairing used by
# every ANN oracle in this module. All map-side: zero shuffles.
# ---------------------------------------------------------------------------

@query(
    "embedding_int8_quant_audit",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    s AS (
      SELECT vec_id, emb,
             list_aggregate(list_transform(emb, x -> abs(x)), 'max') / 127.0
               AS scale
      FROM e
    ),
    q AS (
      SELECT vec_id, emb, scale,
             CASE WHEN scale = 0 THEN list_transform(emb, x -> 0.0)
                  ELSE list_transform(emb, x -> floor(x / scale + 0.5))
             END AS codes
      FROM s
    ),
    err AS (
      SELECT vec_id, scale, codes,
             list_transform(list_zip(emb, codes),
                            p -> p[1] - p[2] * scale) AS e
      FROM q
    )
    SELECT vec_id,
           CAST(len(codes) AS BIGINT) AS n_dims,
           round(scale, 6) AS scale,
           CAST(list_aggregate(list_transform(codes, x -> abs(x)), 'sum')
                AS BIGINT) AS code_l1,
           round(list_dot_product(e, e) / len(codes), 6) AS mse,
           round(list_aggregate(list_transform(e, x -> abs(x)), 'max'), 6)
             AS max_abs_err
    FROM err
    """,
)
def embedding_int8_quant_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("emb"))
    s = e.withColumn(
        "scale",
        F.expr("array_max(transform(emb, x -> abs(x)))") / 127.0)
    q = s.withColumn(
        "codes",
        F.expr("if(scale = 0, transform(emb, x -> cast(0.0 as double)),"
               " transform(emb, x -> floor(x / scale + 0.5)))"))
    err = q.withColumn(
        "e", F.expr("zip_with(emb, codes, (x, c) -> x - c * scale)"))
    return err.select(
        "vec_id",
        F.size("codes").cast("bigint").alias("n_dims"),
        F.round("scale", 6).alias("scale"),
        F.expr("aggregate(transform(codes, x -> abs(x)),"
               " cast(0 as double), (acc, x) -> acc + x)")
         .cast("bigint").alias("code_l1"),
        F.round(
            F.expr("aggregate(zip_with(e, e, (x, y) -> x * y),"
                   " cast(0 as double), (acc, x) -> acc + x)")
            / F.size("codes"), 6).alias("mse"),
        F.round(F.expr("array_max(transform(e, x -> abs(x)))"), 6)
         .alias("max_abs_err"))


# ---------------------------------------------------------------------------
# IVF nprobe tuning sweep: mean recall@k vs the exact ranking for
# nprobe in {1, 2, 4} — the tuning CURVE (not just the point audit
# ann_ivf_recall gives at NPROBE) an ANN deployment reads to pick the
# recall/cost trade-off before scaling out. Candidate generation and
# cell assignment are computed ONCE; each sweep point only widens the
# probe filter, so the sweep costs barely more than a single audit.
# Per-sweep-point mean recall is a ratio of exact integer counts.
# ---------------------------------------------------------------------------

NPROBE_SWEEP = (1, 2, 4)


def _ivf_probe_sql(nprobe: int) -> str:
    """The ann_ivf_probe oracle with its probe width swapped — the text
    is reused verbatim so the sweep can never drift from the audited
    single-point operator."""
    base = ORACLES["ann_ivf_probe"]
    assert f"crk <= {NPROBE}" in base
    return base.replace(f"crk <= {NPROBE}", f"crk <= {nprobe}")


def _sweep_oracle() -> str:
    points = "\n      UNION ALL\n".join(
        f"""SELECT {n} AS nprobe, e.query_id,
             COUNT(i.neighbor_id) AS found_ct, COUNT(*) AS exact_k
          FROM ({ORACLES["ann_cosine_topk"]}) e
          LEFT JOIN ({_ivf_probe_sql(n)}) i
            ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
          GROUP BY 1, 2"""
        for n in NPROBE_SWEEP)
    return f"""
    WITH per_query AS (
      {points}
    )
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(found_ct) AS DOUBLE) / SUM(exact_k), 6)
             AS mean_recall
    FROM per_query GROUP BY 1
    """


@query("ann_ivf_nprobe_sweep", oracle=_sweep_oracle())
def ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("emb",
                    F.expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("da", F.expr(
            "aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x)"))
        .select("vec_id", "emb", "da"))
    cen = (e.filter(F.col("vec_id") < K_CENTROIDS)
           .select(F.col("vec_id").alias("cid"),
                   F.col("emb").alias("cemb"), F.col("da").alias("dc")))
    dac = F.expr(
        "aggregate(zip_with(emb, cemb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    dist = (e.crossJoin(F.broadcast(cen))
            .withColumn("d2",
                        F.round(F.col("da") - 2 * dac + F.col("dc"), 6)))
    wcell = Window.partitionBy("vec_id").orderBy("d2", "cid")
    ranked_cells = dist.select(
        "vec_id", "cid", F.row_number().over(wcell).alias("crk"))
    cells = (ranked_cells.filter(F.col("crk") == 1)
             .select("vec_id", F.col("cid").alias("cell")))
    exact = (ann_cosine_topk(spark, sf_dir)
             .select("query_id", "neighbor_id"))

    max_np = max(NPROBE_SWEEP)
    probes = (ranked_cells
              .filter((F.col("crk") <= max_np)
                      & (F.col("vec_id") < N_QUERIES))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("cid").alias("cell"), "crk"))
    q = (e.join(probes, e.vec_id == probes.query_id)
         .select("query_id", "cell", "crk",
                 F.col("emb").alias("qemb"), F.col("da").alias("qda")))
    c = (e.join(cells, "vec_id")
         .select(F.col("vec_id").alias("neighbor_id"), "emb", "da",
                 "cell"))
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    # score each candidate once at the widest probe width; narrower
    # sweep points re-rank the SUBSET with crk <= nprobe
    scored = (c.join(F.broadcast(q),
                     (c.cell == q.cell)
                     & (F.col("neighbor_id") != F.col("query_id")))
              .withColumn("cosine",
                          F.round(dot / (F.sqrt("qda") * F.sqrt("da")),
                                  6))
              .select("query_id", "neighbor_id", "cosine", "crk"))
    out = None
    for n in NPROBE_SWEEP:
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                   "neighbor_id")
        topk = (scored.filter(F.col("crk") <= n)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= TOP_K)
                .select(F.col("query_id").alias("i_q"),
                        F.col("neighbor_id").alias("i_n"),
                        F.lit(1).alias("hit")))
        per_q = (exact.join(topk,
                            (F.col("query_id") == F.col("i_q"))
                            & (F.col("neighbor_id") == F.col("i_n")),
                            "left")
                 .groupBy("query_id")
                 .agg(F.count("hit").alias("found_ct"),
                      F.count("*").alias("exact_k"))
                 .select(F.lit(n).cast("bigint").alias("nprobe"),
                         "found_ct", "exact_k"))
        out = per_q if out is None else out.unionAll(per_q)
    return (out.groupBy("nprobe")
            .agg(F.count("*").cast("bigint").alias("n_queries"),
                 F.round(F.sum("found_ct").cast("double")
                         / F.sum("exact_k"), 6).alias("mean_recall")))


# ---------------------------------------------------------------------------
# Binary-sketch (sign-bit) retrieval audit: quantize every embedding to
# its per-dimension SIGN (1 bit/dim — 32x smaller than int8, 256x
# smaller than float32) and rank candidates by Hamming similarity,
# then measure recall@k against the exact cosine top-k. The trick that
# keeps everything exact: with signs encoded as +-1.0, the sign-vector
# dot product equals (matches - mismatches) = 2*matches - dim, so
# Hamming rank == +-1-dot rank and both engines compute identical
# INTEGER-VALUED doubles — no float boundary at all until the final
# recall division.
#
# Scale: the sketch is map-side; ranking is the brute-force audit shape
# (broadcast N_QUERIES sign vectors over the corpus, one window top-k)
# — at 100 TB the sketch feeds a Hamming-bucketed index instead; this
# query is the quality gate that justifies (or rejects) that switch.
# ---------------------------------------------------------------------------

def _signbit_recall_oracle() -> str:
    return f"""
    WITH cos AS ({ORACLES["ann_cosine_topk"]}),
    s AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CASE WHEN x >= 0 THEN CAST(1.0 AS DOUBLE)
                         ELSE CAST(-1.0 AS DOUBLE) END) AS sb
      FROM embeddings
    ),
    ham AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.sb, c.sb) AS sdot
      FROM s q JOIN s c ON q.vec_id < {N_QUERIES}
                       AND c.vec_id <> q.vec_id
    ),
    hr AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sdot DESC, neighbor_id) AS rk
      FROM ham
    ),
    htop AS (SELECT query_id, neighbor_id FROM hr WHERE rk <= {TOP_K})
    SELECT c.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_overlap,
           round(CAST(COUNT(h.neighbor_id) AS DOUBLE) / {TOP_K}, 6)
             AS recall
    FROM cos c
    LEFT JOIN htop h ON h.query_id = c.query_id
                    AND h.neighbor_id = c.neighbor_id
    GROUP BY 1
    """


@query("ann_signbit_recall", oracle=_signbit_recall_oracle())
def ann_signbit_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (load_table(spark, sf_dir, "embeddings")
         .withColumn("sb", F.expr(
             "transform(embedding, x -> case when x >= cast(0 as float)"
             " then cast(1.0 as double) else cast(-1.0 as double) end)"))
         .select("vec_id", "sb"))
    q = (s.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("sb").alias("qb")))
    c = s.select(F.col("vec_id").alias("neighbor_id"), "sb")
    sdot = F.expr(
        "aggregate(zip_with(qb, sb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    ham = (c.join(F.broadcast(q),
                  F.col("neighbor_id") != F.col("query_id"))
           .withColumn("sdot", sdot))
    w = Window.partitionBy("query_id").orderBy(F.desc("sdot"),
                                               "neighbor_id")
    htop = (ham.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select(F.col("query_id").alias("h_q"),
                    F.col("neighbor_id").alias("h_n"),
                    F.lit(1).alias("hit")))
    exact = ann_cosine_topk(spark, sf_dir).select("query_id",
                                                  "neighbor_id")
    return (exact.join(htop, (F.col("query_id") == F.col("h_q"))
                       & (F.col("neighbor_id") == F.col("h_n")), "left")
            .groupBy("query_id")
            .agg(F.count("hit").cast("bigint").alias("n_overlap"),
                 F.round(F.count("hit").cast("double") / TOP_K, 6)
                  .alias("recall")))


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: modern embedding models (MRL-trained)
# front-load information so the FIRST k dims alone rank nearly as well
# as the full vector — serving stacks exploit this by retrieving with a
# 4x-cheaper truncated dot product and re-ranking with the full one.
# Before trusting that switch on a new corpus, measure it: top-k recall
# of first-16-dims cosine against the exact 64-dim top-k. Same
# broadcast-probe plan as the sign-bit audit (corpus never shuffles;
# only the per-query overlap counts leave the stage).
# ---------------------------------------------------------------------------

MATRYOSHKA_DIMS = 16


def _matryoshka_recall_oracle() -> str:
    return f"""
    WITH cos AS ({ORACLES["ann_cosine_topk"]}),
    s AS (
      SELECT vec_id, (embedding::DOUBLE[])[1:{MATRYOSHKA_DIMS}] AS tr
      FROM embeddings
    ),
    tc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.tr, c.tr)
                   / (sqrt(list_dot_product(q.tr, q.tr))
                      * sqrt(list_dot_product(c.tr, c.tr))), 6) AS tcos
      FROM s q JOIN s c ON q.vec_id < {N_QUERIES}
                       AND c.vec_id <> q.vec_id
    ),
    tr AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY tcos DESC, neighbor_id) AS rk
      FROM tc
    ),
    ttop AS (SELECT query_id, neighbor_id FROM tr WHERE rk <= {TOP_K})
    SELECT c.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           round(CAST(COUNT(t.neighbor_id) AS DOUBLE) / {TOP_K}, 6)
             AS recall
    FROM cos c
    LEFT JOIN ttop t ON t.query_id = c.query_id
                    AND t.neighbor_id = c.neighbor_id
    GROUP BY 1
    """


@query("ann_matryoshka_recall", oracle=_matryoshka_recall_oracle())
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (load_table(spark, sf_dir, "embeddings")
         .withColumn("tr", F.expr(
             f"transform(slice(embedding, 1, {MATRYOSHKA_DIMS}),"
             " x -> cast(x as double))"))
         .withColumn("tnorm", F.expr(
             "sqrt(aggregate(tr, cast(0 as double),"
             " (acc, x) -> acc + x * x))"))
         .select("vec_id", "tr", "tnorm"))
    q = (s.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("tr").alias("qtr"), F.col("tnorm").alias("qn")))
    c = s.select(F.col("vec_id").alias("neighbor_id"), "tr", "tnorm")
    tdot = F.expr(
        "aggregate(zip_with(qtr, tr, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    scored = (c.join(F.broadcast(q),
                     F.col("neighbor_id") != F.col("query_id"))
              .withColumn("tcos", F.round(
                  tdot / (F.col("qn") * F.col("tnorm")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("tcos"),
                                               "neighbor_id")
    ttop = (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select(F.col("query_id").alias("t_q"),
                    F.col("neighbor_id").alias("t_n"),
                    F.lit(1).alias("hit")))
    exact = ann_cosine_topk(spark, sf_dir).select("query_id",
                                                  "neighbor_id")
    return (exact.join(ttop, (F.col("query_id") == F.col("t_q"))
                       & (F.col("neighbor_id") == F.col("t_n")), "left")
            .groupBy("query_id")
            .agg(F.count("hit").cast("bigint").alias("n_overlap"),
                 F.round(F.count("hit").cast("double") / TOP_K, 6)
                  .alias("recall")))


# ---------------------------------------------------------------------------
# IVF cell-imbalance audit: the partition-balance check a pipeline runs
# BEFORE trusting an IVF layout at scale — a skewed cell assignment
# means one partition holds most of the corpus and probe latency
# collapses to brute force on the hot cell (the ANN analog of join-key
# skew). Reports min/max/avg cell population and the exact Gini
# coefficient over cell sizes (integer arithmetic until the final
# division; the k×k pair sum is over K_CENTROIDS rows, driver-trivial).
# ---------------------------------------------------------------------------

def _ivf_imbalance_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS da
      FROM embeddings
    ),
    cen AS (
      SELECT vec_id AS cid, emb AS cemb, da AS dc FROM e
      WHERE vec_id < {K_CENTROIDS}
    ),
    dist AS (
      SELECT e.vec_id, cen.cid,
             round(e.da - 2 * list_dot_product(e.emb, cen.cemb) + cen.dc, 6) AS d2
      FROM e CROSS JOIN cen
    ),
    ranked_cells AS (
      SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY d2, cid) AS crk
      FROM dist
    ),
    sizes AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked_cells WHERE crk = 1 GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(ABS(a.n - b.n)) AS BIGINT) AS absdiff
      FROM sizes a CROSS JOIN sizes b
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(MIN(n) AS BIGINT) AS min_cell,
             CAST(MAX(n) AS BIGINT) AS max_cell
      FROM sizes
    )
    SELECT t.k AS k_cells, t.n_total, t.min_cell, t.max_cell,
           round(CAST(t.max_cell AS DOUBLE) * t.k / t.n_total, 6)
             AS max_over_avg,
           round(CAST(p.absdiff AS DOUBLE) / (2 * t.k * t.n_total), 6)
             AS gini
    FROM tot t, pairs p
    """


@query("ann_ivf_imbalance_audit", oracle=_ivf_imbalance_oracle())
def ann_ivf_imbalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (load_table(spark, sf_dir, "embeddings")
         .withColumn("emb", F.expr(
             "transform(embedding, x -> cast(x as double))"))
         .withColumn("da", F.expr(
             "aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x)"))
         .select("vec_id", "emb", "da"))
    cen = (e.filter(F.col("vec_id") < K_CENTROIDS)
           .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"),
                   F.col("da").alias("dc")))
    dac = F.expr(
        "aggregate(zip_with(emb, cemb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    wcell = Window.partitionBy("vec_id").orderBy("d2", "cid")
    sizes = (e.crossJoin(F.broadcast(cen))
             .withColumn("d2", F.round(F.col("da") - 2 * dac + F.col("dc"), 6))
             .withColumn("crk", F.row_number().over(wcell))
             .filter(F.col("crk") == 1)
             .groupBy("cid")
             .agg(F.count("*").cast("bigint").alias("n")))
    a = sizes.select(F.col("n").alias("na"))
    b = sizes.select(F.col("n").alias("nb"))
    pairs = (a.crossJoin(b)
             .agg(F.sum(F.abs(F.col("na") - F.col("nb")))
                  .cast("bigint").alias("absdiff")))
    tot = sizes.agg(F.count("*").cast("bigint").alias("k"),
                    F.sum("n").cast("bigint").alias("n_total"),
                    F.min("n").cast("bigint").alias("min_cell"),
                    F.max("n").cast("bigint").alias("max_cell"))
    return (tot.crossJoin(F.broadcast(pairs))
            .select(F.col("k").alias("k_cells"), "n_total", "min_cell",
                    "max_cell",
                    F.round(F.col("max_cell").cast("double") * F.col("k")
                            / F.col("n_total"), 6).alias("max_over_avg"),
                    F.round(F.col("absdiff").cast("double")
                            / (2 * F.col("k") * F.col("n_total")), 6)
                     .alias("gini")))


# ---------------------------------------------------------------------------
# Per-dimension embedding profile: mean/std/extent of every coordinate
# across the corpus — the triage that catches dead dimensions (std≈0),
# mis-scaled shards, and drift between embedding-model versions (this
# corpus is unit-normalized, so the NORM is a useless diagnostic — the
# per-dimension distribution is where anomalies show). Determinism:
# components rounded to 6dp feed DECIMAL(38,6) sums, so the per-dim
# moments are order-insensitive; one corpus pass via posexplode, one
# 64-key aggregation.
# ---------------------------------------------------------------------------

def _dim_profile_oracle() -> str:
    # components are quantized floor(x·1e6 + 0.5) — the repo's standard
    # tie-unambiguous integer code (round() half-vs-even differs between
    # engines at exact .5 boundaries, measured as 1e-6 std drift) — so
    # every moment is BIGINT-exact and the final double math is
    # bit-identical on both sides
    return """
    WITH c AS (
      SELECT CAST(i - 1 AS BIGINT) AS dim,
             CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5)
                  AS BIGINT) AS x6
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    m AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x6) AS BIGINT) AS s6,
             CAST(SUM(x6 * x6) AS BIGINT) AS q12,
             CAST(MIN(x6) AS BIGINT) AS mn6, CAST(MAX(x6) AS BIGINT) AS mx6
      FROM c GROUP BY 1
    )
    SELECT dim, n,
           round(CAST(s6 AS DOUBLE) / 1e6 / n, 6) AS mean,
           round(sqrt((CAST(q12 AS DOUBLE) / 1e12
                       - CAST(s6 AS DOUBLE) / 1e6 * CAST(s6 AS DOUBLE)
                         / 1e6 / n) / (n - 1)), 6) AS std,
           round(CAST(mn6 AS DOUBLE) / 1e6, 6) AS min_val,
           round(CAST(mx6 AS DOUBLE) / 1e6, 6) AS max_val
    FROM m
    """


@query("embedding_dim_profile", oracle=_dim_profile_oracle())
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "embeddings")
         .select(F.posexplode(F.expr(
             "transform(embedding, x -> cast(floor(cast(x as double)"
             " * 1000000 + 0.5) as bigint))")).alias("dim", "x6"))
         .select(F.col("dim").cast("bigint").alias("dim"), "x6"))
    m = (c.groupBy("dim")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("x6").cast("bigint").alias("s6"),
              F.sum(F.col("x6") * F.col("x6")).cast("bigint").alias("q12"),
              F.min("x6").cast("bigint").alias("mn6"),
              F.max("x6").cast("bigint").alias("mx6")))
    s = F.col("s6").cast("double") / 1e6
    q = F.col("q12").cast("double") / 1e12
    return m.select(
        "dim", "n",
        F.round(s / F.col("n"), 6).alias("mean"),
        F.round(F.sqrt((q - s * s / F.col("n")) / (F.col("n") - 1)), 6)
         .alias("std"),
        F.round(F.col("mn6").cast("double") / 1e6, 6).alias("min_val"),
        F.round(F.col("mx6").cast("double") / 1e6, 6).alias("max_val"))


# ---------------------------------------------------------------------------
# Two-stage retrieve-then-rerank: the standard serving plan matryoshka
# truncation enables — stage 1 ranks the corpus with the cheap 16-dim
# dot product and keeps RERANK_CAND candidates, stage 2 reranks only
# those with the full 64-dim cosine. The output is the reranked top-k
# with a per-row flag marking whether it appears in the exact top-k, so
# the gate pins BOTH the mechanics and the quality of the cascade.
# Scale shape: stage 1 is the broadcast-probe plan (corpus never
# shuffles); stage 2 touches RERANK_CAND × N_QUERIES rows only.
# ---------------------------------------------------------------------------

RERANK_CAND = 50


def _two_stage_oracle() -> str:
    return f"""
    WITH exact AS ({ORACLES["ann_cosine_topk"]}),
    s AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             (embedding::DOUBLE[])[1:{MATRYOSHKA_DIMS}] AS tr
      FROM embeddings
    ),
    stage1 AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_dot_product(q.tr, c.tr)
                              / (sqrt(list_dot_product(q.tr, q.tr))
                                 * sqrt(list_dot_product(c.tr, c.tr))), 6)
                        DESC, c.vec_id) AS rk1
      FROM s q JOIN s c ON q.vec_id < {N_QUERIES}
                       AND c.vec_id <> q.vec_id
    ),
    cand AS (SELECT query_id, neighbor_id FROM stage1
             WHERE rk1 <= {RERANK_CAND}),
    stage2 AS (
      SELECT cd.query_id, cd.neighbor_id,
             round(list_dot_product(q.emb, c.emb)
                   / (sqrt(list_dot_product(q.emb, q.emb))
                      * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM cand cd
      JOIN s q ON q.vec_id = cd.query_id
      JOIN s c ON c.vec_id = cd.neighbor_id
    ),
    reranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM stage2
    )
    SELECT r.query_id, CAST(r.rk AS BIGINT) AS rank, r.neighbor_id,
           r.cosine,
           (e.neighbor_id IS NOT NULL) AS in_exact_topk
    FROM reranked r
    LEFT JOIN exact e ON e.query_id = r.query_id
                     AND e.neighbor_id = r.neighbor_id
    WHERE r.rk <= {TOP_K}
    """


@query("ann_two_stage_rerank", oracle=_two_stage_oracle())
def ann_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (load_table(spark, sf_dir, "embeddings")
         .withColumn("emb", F.expr(
             "transform(embedding, x -> cast(x as double))"))
         .withColumn("tr", F.expr(
             f"slice(emb, 1, {MATRYOSHKA_DIMS})"))
         .withColumn("nfull", F.expr(
             "sqrt(aggregate(emb, cast(0 as double),"
             " (acc, x) -> acc + x * x))"))
         .withColumn("ntr", F.expr(
             "sqrt(aggregate(tr, cast(0 as double),"
             " (acc, x) -> acc + x * x))"))
         .select("vec_id", "emb", "tr", "nfull", "ntr"))
    q = (s.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("tr").alias("qtr"), F.col("ntr").alias("qntr"),
                 F.col("emb").alias("qemb"), F.col("nfull").alias("qn")))
    c = s.select(F.col("vec_id").alias("neighbor_id"), "emb", "tr",
                 "nfull", "ntr")
    tdot = F.expr("aggregate(zip_with(qtr, tr, (x, y) -> x * y),"
                  " cast(0 as double), (acc, x) -> acc + x)")
    w1 = Window.partitionBy("query_id").orderBy(F.desc("tcos"),
                                                "neighbor_id")
    cand = (c.join(F.broadcast(q),
                   F.col("neighbor_id") != F.col("query_id"))
            .withColumn("tcos", F.round(
                tdot / (F.col("qntr") * F.col("ntr")), 6))
            .withColumn("rk1", F.row_number().over(w1))
            .filter(F.col("rk1") <= RERANK_CAND))
    fdot = F.expr("aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
                  " cast(0 as double), (acc, x) -> acc + x)")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                "neighbor_id")
    reranked = (cand
                .withColumn("cosine", F.round(
                    fdot / (F.col("qn") * F.col("nfull")), 6))
                .withColumn("rank", F.row_number().over(w2))
                .filter(F.col("rank") <= TOP_K)
                .select("query_id", F.col("rank").cast("bigint")
                        .alias("rank"), "neighbor_id", "cosine"))
    exact = (ann_cosine_topk(spark, sf_dir)
             .select(F.col("query_id").alias("e_q"),
                     F.col("neighbor_id").alias("e_n"),
                     F.lit(True).alias("hit")))
    return (reranked.join(
        exact, (F.col("query_id") == F.col("e_q"))
        & (F.col("neighbor_id") == F.col("e_n")), "left")
        .select("query_id", "rank", "neighbor_id", "cosine",
                F.coalesce("hit", F.lit(False)).alias("in_exact_topk")))


# ---------------------------------------------------------------------------
# Label-centroid drift between corpus halves: split by vec_id parity
# (stand-in for "shard A vs shard B" / "yesterday vs today"), compute
# each label's centroid in both halves from integer-quantized component
# sums, and report the L2 distance — the embedding-model drift monitor
# that fires when a re-embedded shard lands in a different region of
# space. Per-dim squared diffs are rounded to 6dp then DECIMAL-summed,
# so the 64-term accumulation is order-insensitive.
# ---------------------------------------------------------------------------

def _centroid_drift_oracle() -> str:
    return """
    WITH c AS (
      SELECT label, vec_id % 2 AS half, CAST(i - 1 AS BIGINT) AS dim,
             CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5)
                  AS BIGINT) AS x6
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    m AS (
      SELECT label, half, dim, CAST(SUM(x6) AS BIGINT) AS s6,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1, 2, 3
    ),
    p AS (
      SELECT a.label, a.dim,
             a.s6 / 1e6 / a.n AS ca, b.s6 / 1e6 / b.n AS cb,
             a.n AS n_a, b.n AS n_b
      FROM m a JOIN m b ON a.label = b.label AND a.dim = b.dim
      WHERE a.half = 0 AND b.half = 1
    )
    SELECT label,
           CAST(MAX(n_a) AS BIGINT) AS n_even,
           CAST(MAX(n_b) AS BIGINT) AS n_odd,
           round(sqrt(CAST(SUM(CAST(round((ca - cb) * (ca - cb), 6)
                                    AS DECIMAL(38,6))) AS DOUBLE)), 6)
             AS centroid_l2
    FROM p GROUP BY 1
    """


@query("embedding_label_centroid_drift", oracle=_centroid_drift_oracle())
def embedding_label_centroid_drift(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "embeddings")
         .select("label", (F.col("vec_id") % 2).alias("half"),
                 F.posexplode(F.expr(
                     "transform(embedding, x -> cast(floor(cast(x as double)"
                     " * 1000000 + 0.5) as bigint))")).alias("dim", "x6")))
    m = (c.groupBy("label", "half",
                   F.col("dim").cast("bigint").alias("dim"))
         .agg(F.sum("x6").cast("bigint").alias("s6"),
              F.count("*").cast("bigint").alias("n")))
    a = m.filter(F.col("half") == 0).select(
        "label", "dim", (F.col("s6").cast("double") / 1e6 / F.col("n"))
        .alias("ca"), F.col("n").alias("n_a"))
    b = m.filter(F.col("half") == 1).select(
        F.col("label").alias("lb"), F.col("dim").alias("db"),
        (F.col("s6").cast("double") / 1e6 / F.col("n")).alias("cb"),
        F.col("n").alias("n_b"))
    p = a.join(b, (a.label == b.lb) & (a.dim == b.db))
    term = F.round((F.col("ca") - F.col("cb"))
                   * (F.col("ca") - F.col("cb")), 6).cast("decimal(38,6)")
    return (p.groupBy("label")
            .agg(F.max("n_a").cast("bigint").alias("n_even"),
                 F.max("n_b").cast("bigint").alias("n_odd"),
                 F.round(F.sqrt(F.sum(term).cast("double")), 6)
                  .alias("centroid_l2")))


# ---------------------------------------------------------------------------
# Per-dimension clip audit (r9) — the preprocessing check before
# feeding embeddings to a quantizer or a mixed-precision trainer: for
# every dimension, the exact p1/p99 order statistics (on the repo's
# 1e6 integer grid) and how many values a clip at those bounds would
# touch. A dimension whose tails carry >> 2% of mass has outliers that
# will eat the int8 range (the round-6 int8 audit measures the
# aftermath; THIS measures the cause).
#
# Exactness: order statistics at integer ranks ceil(q*n) on quantized
# integers — no interpolation, engine-exact. Scale: one posexplode
# shuffle to (dim) grain; per-dim windows are parallel across the 64
# dims (partitioned, never global).
# ---------------------------------------------------------------------------

@query(
    "embedding_clip_audit",
    oracle="""
    WITH ex AS (
      SELECT u.i - 1 AS dim,
             CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS q
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS u(i)
    ),
    ranked AS (
      SELECT dim, q,
             row_number() OVER (PARTITION BY dim ORDER BY q) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY dim) AS BIGINT) AS n
      FROM ex
    ),
    bounds AS (
      SELECT dim, any_value(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(0.01 * any_value_n) AS BIGINT)
                 THEN q END) AS lo,
             MAX(CASE WHEN rk = CAST(ceil(0.99 * any_value_n) AS BIGINT)
                 THEN q END) AS hi
      FROM (SELECT dim, q, rk, n,
                   MAX(n) OVER (PARTITION BY dim) AS any_value_n
            FROM ranked)
      GROUP BY 1
    )
    SELECT CAST(e.dim AS BIGINT) AS dim,
           round(b.lo / 1e6, 6) AS p01,
           round(b.hi / 1e6, 6) AS p99,
           CAST(SUM(CASE WHEN e.q < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN e.q > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           CAST(SUM(CASE WHEN e.q < b.lo OR e.q > b.hi THEN 1 ELSE 0 END)
                * 1000000 // any_value(b.n) AS BIGINT) AS clip_ppm
    FROM ex e JOIN bounds b USING (dim)
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def embedding_clip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p1/p99 clip bounds + tail mass per embedding dimension
    (see block comment)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode(F.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000"
        " + 0.5) as bigint))")).alias("dim", "q"))
    wd = Window.partitionBy("dim")
    ranked = ex.select(
        "dim", "q",
        F.row_number().over(wd.orderBy("q")).alias("rk"),
        F.count("*").over(wd).cast("bigint").alias("n"))
    bounds = (ranked.groupBy("dim")
              .agg(F.first("n").alias("n"),
                   F.max(F.when(F.col("rk")
                                == F.ceil(0.01 * F.col("n")).cast("bigint"),
                                F.col("q"))).alias("lo"),
                   F.max(F.when(F.col("rk")
                                == F.ceil(0.99 * F.col("n")).cast("bigint"),
                                F.col("q"))).alias("hi")))
    return (ex.join(F.broadcast(bounds), "dim")
            .groupBy(F.col("dim").cast("bigint").alias("dim"),
                     F.round(F.col("lo") / 1e6, 6).alias("p01"),
                     F.round(F.col("hi") / 1e6, 6).alias("p99"))
            .agg(F.sum(F.when(F.col("q") < F.col("lo"), 1).otherwise(0))
                 .cast("bigint").alias("n_below"),
                 F.sum(F.when(F.col("q") > F.col("hi"), 1).otherwise(0))
                 .cast("bigint").alias("n_above"),
                 F.expr("CAST(SUM(CASE WHEN q < lo OR q > hi THEN 1 ELSE 0"
                        " END) * 1000000 div first(n) AS BIGINT)")
                 .alias("clip_ppm"))
            .orderBy("dim"))


# ---------------------------------------------------------------------------
# kNN regression readout (r10) — the numeric sibling of the round-3
# kNN label vote: predict each query document's length (n_chars) as
# the mean over its exact top-{TOP_K} cosine neighbors and report the
# absolute error — the "can the embedding space predict a numeric
# attribute" probe a feature-store audit runs. EXACTNESS: the neighbor
# set is the proven ann_cosine_topk cut (6-dp cosine + id tie-break);
# the prediction is an exact integer SUM over k neighbors with a
# deterministic /k readout, floor(x*1e6 + 0.5)-quantized; the error is
# exact at x_k scale (|k*actual - sum|).
# Scale: broadcast Q query vectors, one corpus map + per-query top-k
# (TakeOrdered); the n_chars join is a broadcast of Q*k rows.
# ---------------------------------------------------------------------------

@query(
    "ml_knn_regression_chars",
    oracle=f"""
    WITH exact AS ({{base}}),
    joined AS (
      SELECT e.query_id, d.n_chars
      FROM exact e JOIN documents d ON d.doc_id = e.neighbor_id
    ),
    pred AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM joined GROUP BY 1
    )
    SELECT p.query_id, p.k, p.sum_chars,
           CAST(CAST(floor(CAST(p.sum_chars AS DOUBLE) / p.k * 1000000
                           + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS pred_chars,
           CAST(d.n_chars AS BIGINT) AS actual_chars,
           CAST(ABS(p.k * CAST(d.n_chars AS BIGINT) - p.sum_chars)
                AS BIGINT) AS abs_err_xk
    FROM pred p JOIN documents d ON d.doc_id = p.query_id
    ORDER BY 1
    """.format(base=ORACLES["ann_cosine_topk"]),
)
def ml_knn_regression_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-mean prediction of document length from embedding
    neighbors (see block comment)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    nb = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    pred = (nb.join(docs.withColumnRenamed("doc_id", "neighbor_id"),
                    "neighbor_id")
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("k"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars")))
    return (pred.join(docs.withColumnRenamed("doc_id", "query_id")
                      .withColumnRenamed("n_chars", "actual_chars"),
                      "query_id")
            .select("query_id", "k", "sum_chars",
                    (F.floor(F.col("sum_chars").cast("double")
                             / F.col("k") * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("pred_chars"),
                    F.col("actual_chars").cast("bigint")
                    .alias("actual_chars"),
                    F.abs(F.col("k") * F.col("actual_chars")
                          - F.col("sum_chars")).cast("bigint")
                    .alias("abs_err_xk"))
            .orderBy("query_id"))
