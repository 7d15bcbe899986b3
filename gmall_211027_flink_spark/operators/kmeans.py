"""Distributed Lloyd's k-means over the embedding corpus + an IVF-ANN
variant whose coarse quantizer is the TRAINED centroids.

This closes the operational loop documented in SCALE.md §7 ("recall
below floor -> train real centroids into the same plan"): `ann_ivf_probe`
uses data-independent cells (the first-K vectors); `kmeans_lloyd` trains
proper centroids with a fixed, deterministic number of Lloyd iterations;
`ann_ivf_kmeans_recall` re-runs the IVF probe with those centroids and
measures recall@k against the exact baseline — all three are
oracle-checked against DuckDB.

Scale design (the reference has no ML operators; this is §2.11
beyond-reference surface for a training-data pipeline):

- **Long-form element rows** (vec_id, dim, x) — same shape as
  `ann_label_centroids`: every aggregation is over scalars, partial
  (map-side) aggregation collapses the xK row amplification before any
  exchange, and centroid state is K x dim cells regardless of corpus
  size.
- **Centroids broadcast every iteration** (K x dim rows ~ KBs); the
  corpus NEVER shuffles during assignment — one broadcast-join map
  stage per iteration, exactly the Lloyd-on-MapReduce shape.
- **`localCheckpoint` per iteration** truncates the growing lineage —
  the same bounded-round discipline as `operators/graph.py` (pointer
  jumping); without it the plan doubles per iteration.
- **Determinism / oracle parity** (hardened round 10, float-discipline
  sweep — the whole loop is now EXACT INTEGER arithmetic): a FIXED
  iteration count (no convergence test), deterministic init
  (vec_id < K); components are half-up-quantized once to
  qx = floor(x*1e9 + 0.5) BIGINT; centroids are kept in RATIONAL form
  (sq = SUM qx, n = count) so the squared distance ordering is the
  exact HUGEINT/DECIMAL(38,0) numerator SUM_dims (qx*n - sq)^2 over
  denominator n^2*1e18, argmin'd on the half-up 1e-9-quantized integer
  d2q with a (d2q, cluster) total-order tie-break. No float enters
  until the final readout (inertia = SUM(d2q)/1e9, silhouette ratios),
  which is a deterministic double from identical integers. The old
  design (round doubles to 6 dp each step to "re-sync" engines) was
  the stats_cramers_v failure class: unordered double SUMs whose
  partial-agg merge order could cross the rounding boundary.
  The DuckDB oracle is the SAME loop unrolled into a CTE chain by
  `_kmeans_ctes` — one generator, two engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.session import checkpoint
from gmall_211027_flink_spark.operators.similarity import (
    N_QUERIES, TOP_K)
from gmall_211027_flink_spark.registry import ORACLES, query

K_CLUSTERS = 8
N_ITER = 2       # fixed Lloyd iterations (see determinism note above)
NPROBE = 2       # cells probed per query in the trained-IVF variant


# ---------------------------------------------------------------------------
# Shared oracle generator: the unrolled Lloyd loop as DuckDB CTEs.
# ---------------------------------------------------------------------------

def _kmeans_ctes(n_iter: int = N_ITER, k: int = K_CLUSTERS) -> str:
    """CTE chain `ex, c0, d1, a1, c1, ... c{n}` mirroring the Spark loop.

    `ex` is the long-form element table; `c{i}` the centroids after i
    updates; `d{i}`/`a{i}` the per-iteration distances/assignments.
    """
    ctes = [f"""
    ex AS (
      SELECT e.vec_id, CAST(g.i - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                         * 1000000000 + 0.5) AS BIGINT) AS qx
      FROM embeddings e,
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    ),
    c0 AS (
      SELECT vec_id AS c, dim, qx AS sq, CAST(1 AS BIGINT) AS n
      FROM ex WHERE vec_id < {k}
    )"""]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes.append(f"""
    d{it} AS (
      SELECT vec_id, c, (2 * num + nn) // (2 * nn) AS d2q FROM (
        SELECT ex.vec_id, p.c,
               SUM(CAST(ex.qx * p.n - p.sq AS HUGEINT)
                   * (ex.qx * p.n - p.sq)) AS num,
               any_value(p.n) * any_value(p.n) * 1000000000 AS nn
        FROM ex JOIN {prev} p ON p.dim = ex.dim
        GROUP BY 1, 2)
    ),
    a{it} AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2q, c) AS rk
        FROM d{it}
      ) WHERE rk = 1
    ),
    c{it} AS (
      SELECT a.c, ex.dim, CAST(SUM(ex.qx) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex JOIN a{it} a ON a.vec_id = ex.vec_id
      GROUP BY 1, 2
    )""")
    return ",".join(ctes)


# Final assignment against the trained centroids (re-used by the
# queries below): exact-integer distances + argmin, keeping the
# 1e-9-quantized d2q for the inertia sum.
_FINAL_ASSIGN = f"""
    dfin AS (
      SELECT vec_id, c, (2 * num + nn) // (2 * nn) AS d2q FROM (
        SELECT ex.vec_id, p.c,
               SUM(CAST(ex.qx * p.n - p.sq AS HUGEINT)
                   * (ex.qx * p.n - p.sq)) AS num,
               any_value(p.n) * any_value(p.n) * 1000000000 AS nn
        FROM ex JOIN c{N_ITER} p ON p.dim = ex.dim
        GROUP BY 1, 2)
    ),
    afin AS (
      SELECT vec_id, c, d2q FROM (
        SELECT vec_id, c, d2q,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2q, c) AS rk
        FROM dfin
      ) WHERE rk = 1
    )"""


def _distances(ex: DataFrame, cent: DataFrame,
               keys: list[str] | None = None) -> DataFrame:
    """Exact-integer squared distances: (vec_id[, m], c, d2q) rows.

    d2q = half-up(1e9 * SUM_dims (qx/1e9 - sq/(n*1e9))^2), computed as
    the exact DECIMAL(38,0) numerator SUM (qx*n - sq)^2 over the
    integer denominator n^2*1e9 — order-free, engine-exact.
    """
    join_keys = (keys or []) + ["dim"]
    grp = ["vec_id"] + (keys or []) + ["c"]
    diff = F.col("qx") * F.col("n") - F.col("sq")
    d = (ex.join(F.broadcast(cent), join_keys)
         .groupBy(*grp)
         .agg(F.sum(diff.cast("decimal(38,0)") * diff).alias("num"),
              F.first("n").alias("n")))
    return d.withColumn("d2q", F.expr(
        "(2 * num + n * n * 1000000000) div (2 * n * n * 1000000000)")
    ).drop("num", "n")


def _assign(ex: DataFrame, cent: DataFrame) -> DataFrame:
    """One Lloyd assignment step: (vec_id, c, d2q) argmin rows."""
    d = _distances(ex, cent)
    w = Window.partitionBy("vec_id").orderBy("d2q", "c")
    return (d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1).select("vec_id", "c", "d2q"))


def _long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double)"
            " * 1000000000 + 0.5) as bigint))")).alias("dim_i", "qx"),
    ).select("vec_id", F.col("dim_i").cast("bigint").alias("dim"), "qx")


def train_centroids(spark: SparkSession, sf_dir: str,
                    n_iter: int = N_ITER) -> DataFrame:
    """Lloyd's loop -> trained rational-centroid frame (c, dim, sq, n)."""
    ex = _long_form(spark, sf_dir)
    cent = (ex.filter(F.col("vec_id") < K_CLUSTERS)
            .select(F.col("vec_id").alias("c"), "dim",
                    F.col("qx").alias("sq"),
                    F.lit(1).cast("bigint").alias("n")))
    for _ in range(n_iter):
        assign = _assign(ex, cent)
        cent = checkpoint(
            ex.join(assign.select("vec_id", "c"), "vec_id")
            .groupBy("c", "dim")
            .agg(F.sum("qx").cast("bigint").alias("sq"),
                 F.count("*").cast("bigint").alias("n")))
        # K x dim rows: truncate the per-iteration lineage growth
        # (graph.py's bounded-round discipline); reliable on clusters
        # via SPARK_GRAFT_CHECKPOINT_DIR (session.checkpoint, r16)
    return cent


@query(
    "kmeans_lloyd",
    oracle=f"""
    WITH {_kmeans_ctes()},
    {_FINAL_ASSIGN}
    SELECT c AS cluster, COUNT(*) AS n_vecs,
           CAST(SUM(d2q) AS DOUBLE) / 1000000000.0 AS inertia
    FROM afin GROUP BY 1
    """,
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (K=8, 2 Lloyd iterations, vec_id<K init) cluster summary.

    Output: one row per surviving cluster with its population and exact
    integer-summed inertia (sum of 1e-9-quantized squared distances).
    """
    ex = _long_form(spark, sf_dir)
    cent = train_centroids(spark, sf_dir)
    final = _assign(ex, cent)
    return (final.groupBy(F.col("c").alias("cluster"))
            .agg(F.count("*").alias("n_vecs"),
                 (F.sum("d2q").cast("double") / F.lit(1000000000.0))
                 .alias("inertia")))


# ---------------------------------------------------------------------------
# IVF with the trained quantizer: assign corpus + queries to trained
# cells, probe NPROBE nearest cells, exact-rank within candidates, and
# report recall@TOP_K vs the brute-force baseline — the measurement a
# pipeline runs to decide whether trained cells beat the data-independent
# `ann_ivf_probe` layout (SCALE.md records both).
# ---------------------------------------------------------------------------

@query(
    "ann_ivf_kmeans_recall",
    oracle=f"""
    WITH {_kmeans_ctes()},
    dall AS (
      SELECT vec_id, c, (2 * num + nn) // (2 * nn) AS d2q FROM (
        SELECT ex.vec_id, p.c,
               SUM(CAST(ex.qx * p.n - p.sq AS HUGEINT)
                   * (ex.qx * p.n - p.sq)) AS num,
               any_value(p.n) * any_value(p.n) * 1000000000 AS nn
        FROM ex JOIN c{N_ITER} p ON p.dim = ex.dim
        GROUP BY 1, 2)
    ),
    ranked_cells AS (
      SELECT vec_id, c,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2q, c) AS crk
      FROM dall
    ),
    cells AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crk = 1),
    probes AS (
      SELECT vec_id AS query_id, c AS cell FROM ranked_cells
      WHERE crk <= {NPROBE} AND vec_id < {N_QUERIES}
    ),
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    scored AS (
      SELECT p.query_id, cc.vec_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb) / (q.norm * c.norm), 6)
               AS cosine
      FROM probes p
      JOIN cells cc ON cc.cell = p.cell AND cc.vec_id <> p.query_id
      JOIN e c ON c.vec_id = cc.vec_id
      JOIN e q ON q.vec_id = p.query_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= {TOP_K}
    ),
    exact AS ({ORACLES["ann_cosine_topk"]})
    SELECT e.query_id, COUNT(*) AS exact_k,
           COUNT(i.neighbor_id) AS found_ct,
           round(CAST(COUNT(i.neighbor_id) AS DOUBLE) / COUNT(*), 6)
             AS recall
    FROM exact e
    LEFT JOIN ivf i ON i.query_id = e.query_id
                   AND i.neighbor_id = e.neighbor_id
    GROUP BY 1
    """,
)
def ann_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.operators.similarity import ann_cosine_topk

    ex = _long_form(spark, sf_dir)
    cent = train_centroids(spark, sf_dir)
    d = _distances(ex, cent)
    wcell = Window.partitionBy("vec_id").orderBy("d2q", "c")
    ranked_cells = d.select("vec_id", "c",
                            F.row_number().over(wcell).alias("crk"))
    cells = (ranked_cells.filter(F.col("crk") == 1)
             .select("vec_id", F.col("c").alias("cell")))
    probes = (ranked_cells
              .filter((F.col("crk") <= NPROBE) & (F.col("vec_id") < N_QUERIES))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("c").alias("cell")))
    e = (load_table(spark, sf_dir, "embeddings")
         .withColumn("emb", F.expr("transform(embedding, x -> cast(x as double))"))
         .withColumn("norm", F.expr(
             "sqrt(aggregate(emb, cast(0 as double), (acc, x) -> acc + x * x))"))
         .select("vec_id", "emb", "norm"))
    q = (e.join(probes, e.vec_id == probes.query_id)
         .select("query_id", "cell", F.col("emb").alias("qemb"),
                 F.col("norm").alias("qnorm")))
    c = (e.join(cells, "vec_id")
         .select(F.col("vec_id").alias("neighbor_id"), "emb", "norm", "cell"))
    dot = F.expr(
        "aggregate(zip_with(qemb, emb, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)")
    scored = (
        c.join(F.broadcast(q),
               (c.cell == q.cell) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cosine", F.round(dot / (F.col("qnorm") * F.col("norm")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    ivf = (scored.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= TOP_K)
           .select(F.col("query_id").alias("i_q"),
                   F.col("neighbor_id").alias("i_n"),
                   F.lit(1).alias("hit")))
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
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
# Product quantization (Jégou, Douze & Schmid 2011, "Product
# quantization for nearest neighbor search"): split the 64-dim vector
# into PQ_M contiguous subspaces, train an independent PQ_K-centroid
# codebook per subspace (same deterministic Lloyd rules as above, just
# keyed by subspace), encode every vector as PQ_M small codes, and
# answer queries by ADC — asymmetric distance computation: the query
# stays exact, each database vector's distance is the sum of its
# codes' per-subspace distances read from a (query x subspace x code)
# lookup table. Completes the ANN compression family: int8 scalar
# quantization (embedding_int8_quant_audit), 1-bit sign sketches
# (ann_signbit_recall), and now the codebook path that real
# billion-vector indexes (FAISS IVF-PQ) ship.
#
# Memory arithmetic at 100 TB: 64 float32 dims = 256 B/vector; PQ_M=4
# codes of log2(8)=3 bits = 12 bits -> ~170x compression, and the ADC
# lookup table is N_QUERIES x PQ_M x PQ_K rows (a few hundred —
# broadcast), so query cost is one map-side join over the CODES table,
# never the raw vectors. Embeddings are unit-norm, so L2 ADC ranking
# is cosine ranking (L2^2 = 2 - 2cos) — recall@k is measured against
# the same exact cosine baseline as the other ANN audits.
#
# Determinism: fixed iterations, vec_id<PQ_K init per subspace, 6-dp
# rounds before every argmin with (d2, c) tie-breaks, ADC sums in
# DECIMAL(18,6) (4 rounded terms, order-proof).
# ---------------------------------------------------------------------------

PQ_M = 4          # subspaces
PQ_SUBDIM = 16    # dims per subspace (64 / PQ_M)
PQ_K = 8          # codes per subspace codebook
PQ_ITER = 2       # fixed Lloyd iterations per codebook


def _pq_ctes(n_iter: int = PQ_ITER, k: int = PQ_K) -> str:
    """CTE chain for PQ_M independent Lloyd loops, keyed by subspace m
    (same rules as `_kmeans_ctes`, with m carried through every step)."""
    ctes = [f"""
    ex AS (
      SELECT e.vec_id, CAST(g.i - 1 AS BIGINT) AS dim,
             CAST((g.i - 1) // {PQ_SUBDIM} AS BIGINT) AS m,
             CAST(floor(CAST(e.embedding[g.i] AS DOUBLE)
                         * 1000000000 + 0.5) AS BIGINT) AS qx
      FROM embeddings e,
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    ),
    p0 AS (
      SELECT m, vec_id AS c, dim, qx AS sq, CAST(1 AS BIGINT) AS n
      FROM ex WHERE vec_id < {k}
    )"""]
    for it in range(1, n_iter + 1):
        prev = f"p{it - 1}"
        ctes.append(f"""
    pd{it} AS (
      SELECT vec_id, m, c, (2 * num + nn) // (2 * nn) AS d2q FROM (
        SELECT ex.vec_id, ex.m, p.c,
               SUM(CAST(ex.qx * p.n - p.sq AS HUGEINT)
                   * (ex.qx * p.n - p.sq)) AS num,
               any_value(p.n) * any_value(p.n) * 1000000000 AS nn
        FROM ex JOIN {prev} p ON p.dim = ex.dim AND p.m = ex.m
        GROUP BY 1, 2, 3)
    ),
    pa{it} AS (
      SELECT vec_id, m, c FROM (
        SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2q, c) AS rk
        FROM pd{it}
      ) WHERE rk = 1
    ),
    p{it} AS (
      SELECT a.m, a.c, ex.dim, CAST(SUM(ex.qx) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex JOIN pa{it} a ON a.vec_id = ex.vec_id AND a.m = ex.m
      GROUP BY 1, 2, 3
    )""")
    return ",".join(ctes)


@query(
    "ann_pq_recall",
    oracle=f"""
    WITH {_pq_ctes()},
    pdfin AS (
      SELECT vec_id, m, c, (2 * num + nn) // (2 * nn) AS d2q FROM (
        SELECT ex.vec_id, ex.m, p.c,
               SUM(CAST(ex.qx * p.n - p.sq AS HUGEINT)
                   * (ex.qx * p.n - p.sq)) AS num,
               any_value(p.n) * any_value(p.n) * 1000000000 AS nn
        FROM ex JOIN p{PQ_ITER} p ON p.dim = ex.dim AND p.m = ex.m
        GROUP BY 1, 2, 3)
    ),
    codes AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2q, c) AS rk
        FROM pdfin
      ) WHERE rk = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, m, c, d2q FROM pdfin
      WHERE vec_id < {N_QUERIES}
    ),
    adc AS (
      SELECT l.query_id, cd.vec_id AS neighbor_id,
             CAST(SUM(l.d2q) AS BIGINT) AS adist
      FROM codes cd
      JOIN lut l ON l.m = cd.m AND l.c = cd.code
                AND cd.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    pq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, neighbor_id) AS rk
        FROM adc
      ) WHERE rk <= {TOP_K}
    ),
    exact AS ({ORACLES["ann_cosine_topk"]})
    SELECT e.query_id, COUNT(*) AS exact_k,
           COUNT(i.neighbor_id) AS found_ct,
           round(CAST(COUNT(i.neighbor_id) AS DOUBLE) / COUNT(*), 6)
             AS recall
    FROM exact e
    LEFT JOIN pq i ON i.query_id = e.query_id
                  AND i.neighbor_id = e.neighbor_id
    GROUP BY 1
    """,
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of PQ({PQ_M}x{PQ_K}) ADC search vs the exact
    cosine baseline, one row per query."""
    from gmall_211027_flink_spark.operators.similarity import ann_cosine_topk

    ex = (_long_form(spark, sf_dir)
          .withColumn("m", (F.col("dim") / PQ_SUBDIM).cast("bigint"))
          .localCheckpoint())
    cent = (ex.filter(F.col("vec_id") < PQ_K)
            .select("m", F.col("vec_id").alias("c"), "dim",
                    F.col("qx").alias("sq"),
                    F.lit(1).cast("bigint").alias("n")))

    def subspace_d(cent_df: DataFrame) -> DataFrame:
        return _distances(ex, cent_df, keys=["m"])

    wm = Window.partitionBy("vec_id", "m").orderBy("d2q", "c")
    for _ in range(PQ_ITER):
        assign = (subspace_d(cent)
                  .withColumn("rk", F.row_number().over(wm))
                  .filter(F.col("rk") == 1).select("vec_id", "m", "c"))
        cent = (ex.join(assign, ["vec_id", "m"])
                .groupBy("m", "c", "dim")
                .agg(F.sum("qx").cast("bigint").alias("sq"),
                     F.count("*").cast("bigint").alias("n"))
                .localCheckpoint())

    # dfin feeds BOTH the code assignment and the query LUT — one
    # materialization instead of two corpus-sized aggregations
    dfin = subspace_d(cent).localCheckpoint()
    codes = (dfin.withColumn("rk", F.row_number().over(wm))
             .filter(F.col("rk") == 1)
             .select("vec_id", "m", F.col("c").alias("code")))
    lut = (dfin.filter(F.col("vec_id") < N_QUERIES)
           .select(F.col("vec_id").alias("query_id"), "m", "c", "d2q"))
    adc = (codes.join(
        F.broadcast(lut),
        (codes.m == lut.m) & (codes.code == lut.c)
        & (codes.vec_id != lut.query_id))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2q").cast("bigint").alias("adist")))
    wq = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    pq = (adc.withColumn("rk", F.row_number().over(wq))
          .filter(F.col("rk") <= TOP_K)
          .select(F.col("query_id").alias("i_q"),
                  F.col("neighbor_id").alias("i_n"), F.lit(1).alias("hit")))
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return (
        exact.join(pq, (F.col("query_id") == F.col("i_q"))
                   & (F.col("neighbor_id") == F.col("i_n")), "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("exact_k"),
             F.count("hit").alias("found_ct"),
             F.round(F.count("hit").cast("double") / F.count("*"), 6)
              .alias("recall"))
    )


# ---------------------------------------------------------------------------
# Simplified silhouette (r9) — the centroid-based silhouette variant
# (a = distance to own centroid, b = nearest OTHER centroid; s =
# (b - a)/max(a, b)) that scales where the classic pairwise silhouette
# cannot: O(n*k) instead of O(n^2). The cluster-quality readout a
# pipeline checks after the Lloyd rounds above — clusters whose mean s
# hugs 0 are boundary soup, not structure. Because assignment IS the
# argmin, a <= b and s >= 0 here; the interesting signal is the
# boundary mass (s < 0.2).
#
# Determinism: distances are the exact-integer d2q the Lloyd oracle
# uses (s is scale-invariant, so ranking/ratios on the 1e9-scaled
# integers equal the unscaled ones); each point's s is rounded to 6 dp
# and the cluster mean is an exact DECIMAL sum of those rounded terms
# over the count (order-free, the repo rule). Scale: one broadcast
# join of k*d centroids; never a point-point pair.
# ---------------------------------------------------------------------------

@query(
    "ml_silhouette_simplified",
    oracle=f"""
    WITH {_kmeans_ctes()},
    {_FINAL_ASSIGN},
    own AS (
      SELECT vec_id, c, d2q AS a2 FROM afin
    ),
    nearest_other AS (
      SELECT d.vec_id, MIN(d.d2q) AS b2
      FROM dfin d JOIN own o ON o.vec_id = d.vec_id AND d.c <> o.c
      GROUP BY 1
    ),
    scored AS (
      SELECT o.c,
             CAST(round((sqrt(n.b2) - sqrt(o.a2))
                        / NULLIF(sqrt(GREATEST(o.a2, n.b2)), 0), 6)
                  AS DECIMAL(12,6)) AS s
      FROM own o JOIN nearest_other n USING (vec_id)
    )
    SELECT c AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette,
           CAST(SUM(CASE WHEN s < 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boundary
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def ml_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette over the trained Lloyd
    centroids (see block comment)."""
    ex = _long_form(spark, sf_dir)
    cent = train_centroids(spark, sf_dir)
    dfin = _distances(ex, cent)
    w = Window.partitionBy("vec_id").orderBy("d2q", "c")
    own = (dfin.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1)
           .select("vec_id", "c", F.col("d2q").alias("a2")))
    other = (dfin.join(own.select("vec_id",
                                  F.col("c").alias("own_c")), "vec_id")
             .filter(F.col("c") != F.col("own_c"))
             .groupBy("vec_id").agg(F.min("d2q").alias("b2")))
    s = F.round((F.sqrt("b2") - F.sqrt("a2"))
                / F.nullif(F.sqrt(F.greatest("a2", "b2")), F.lit(0.0)), 6)
    scored = (own.join(other, "vec_id")
              .select("c", s.cast("decimal(12,6)").alias("s")))
    return (scored.groupBy(F.col("c").alias("cluster"))
            .agg(F.count("*").cast("bigint").alias("n_vecs"),
                 F.round(F.sum("s").cast("double") / F.count("*"), 6)
                 .alias("mean_silhouette"),
                 F.sum(F.when(F.col("s") < 0.2, 1).otherwise(0))
                 .cast("bigint").alias("n_boundary"))
            .orderBy("cluster"))
