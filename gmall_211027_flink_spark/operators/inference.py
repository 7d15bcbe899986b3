"""Classical inference tests, round 11: agreement, paired-binary,
robust location, and ordered-trend statistics.

Beyond-reference statistics family (reference parity anchor: the ADS
aggregation tier, e.g. app/ads/* in the reference, is a BI readout
layer; these are the hypothesis-test readouts a data-quality pipeline
runs on the same aggregates).  Every test here follows the module
discipline of
``operators/aggregates.py`` (DAY-GRAIN CONTRACT; exact-integer cores;
floor(x*1e6+0.5) readout quantization; 2x integer ranks for tie
averages; doubles only at the final projection, computed from exact
BIGINTs with the same expression shape in both engines).

SCALE: every statistic reduces the fact scan to a bounded grid first —
a 2x2 agreement table, a per-customer flag pair, the <= ~350-row weekly
grain (DAY-GRAIN CONTRACT) — so the post-aggregation math is
constant-size regardless of input rows.  The one quadratic expansion
(Walsh averages for Hodges-Lehmann) is over weekly DIFFS: ~59k pairs at
any SF, by construction of the bounded calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import query

# Cohen's kappa raters (documents table): two independent quality
# heuristics judging the same item — the standard agreement audit before
# trusting a cheap labeler.
KAPPA_CHARS_T = 300
KAPPA_TOKENS_T = 55


@query(
    "stats_cohens_kappa",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {KAPPA_CHARS_T} THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(string_split(text, ' ')) >= {KAPPA_TOKENS_T}
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ),
    cell AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS a,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS c,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r
    )
    SELECT a, b, c, d, n,
           CAST(CAST(floor(CAST(a + d AS DOUBLE) / n * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS po,
           CAST(CAST(floor(
               (CAST((a + b) AS DOUBLE) * (a + c)
                + CAST((c + d) AS DOUBLE) * (b + d))
               / (CAST(n AS DOUBLE) * n) * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS pe,
           CAST(CAST(floor(
               CAST(2 * (a * d - b * c) AS DOUBLE)
               / (CAST((a + b) AS DOUBLE) * (b + d)
                  + CAST((a + c) AS DOUBLE) * (c + d))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS kappa
    FROM cell
    """,
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary document-quality raters.

    kappa = 2(ad-bc) / ((a+b)(b+d) + (a+c)(c+d)) — the exact closed
    form for 2x2 tables; every cell is an exact BIGINT, the readouts
    are floor-quantized doubles of identical expression shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        F.when(F.col("n_chars") >= KAPPA_CHARS_T, 1).otherwise(0)
        .cast("bigint").alias("ra"),
        F.when(F.size(F.split("text", " ")) >= KAPPA_TOKENS_T, 1)
        .otherwise(0).cast("bigint").alias("rb"))
    cell = r.agg(
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("n"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return cell.select(
        "a", "b", "c", "d", "n",
        q6((F.col("a") + F.col("d")).cast("double") / F.col("n"))
        .alias("po"),
        q6(((F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c"))
            + (F.col("c") + F.col("d")).cast("double") * (F.col("b") + F.col("d")))
           / (F.col("n").cast("double") * F.col("n"))).alias("pe"),
        q6((2 * (F.col("a") * F.col("d") - F.col("b") * F.col("c")))
           .cast("double")
           / ((F.col("a") + F.col("b")).cast("double") * (F.col("b") + F.col("d"))
              + (F.col("a") + F.col("c")).cast("double") * (F.col("c") + F.col("d"))))
        .alias("kappa"))


@query(
    "stats_mcnemar_paired",
    oracle="""
    WITH span AS (
      SELECT (MIN(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)))
              + MAX(datediff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)))) // 2 AS dmid
      FROM orders
    ),
    flags AS (
      SELECT c.c_custkey,
             MAX(CASE WHEN datediff('day', DATE '1970-01-01',
                                    CAST(o.o_orderdate AS DATE)) < s.dmid
                      THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN datediff('day', DATE '1970-01-01',
                                    CAST(o.o_orderdate AS DATE)) >= s.dmid
                      THEN 1 ELSE 0 END) AS h2
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      CROSS JOIN span s
      GROUP BY 1
    ),
    cell AS (
      SELECT CAST(SUM(h1 * (1 - h2)) AS BIGINT) AS b,
             CAST(SUM((1 - h1) * h2) AS BIGINT) AS c,
             CAST(SUM(h1 * h2) AS BIGINT) AS a,
             CAST(SUM((1 - h1) * (1 - h2)) AS BIGINT) AS d
      FROM flags
    )
    SELECT a, b, c, d,
           CAST(CAST(floor(
               CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS chi2,
           CAST(CAST(floor(
               CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS DOUBLE)
               / (b + c) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS chi2_cc
    FROM cell
    """,
)
def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired customer activity (first vs second
    half of the calendar): chi2 = (b-c)^2/(b+c) on the exact discordant
    counts, plus the continuity-corrected variant.  Customers with no
    orders land in the concordant (0,0) cell via the left join.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    day = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    span = orders.agg(
        F.expr("(min(datediff(o_orderdate, date'1970-01-01'))"
               " + max(datediff(o_orderdate, date'1970-01-01'))) div 2")
        .cast("bigint").alias("dmid"))
    flags = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
             .crossJoin(F.broadcast(span))
             .groupBy("c_custkey")
             .agg(F.max(F.when(day < F.col("dmid"), 1).otherwise(0))
                  .alias("h1"),
                  F.max(F.when(day >= F.col("dmid"), 1).otherwise(0))
                  .alias("h2")))
    cell = flags.agg(
        F.sum(F.col("h1") * (1 - F.col("h2"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("h1")) * F.col("h2")).cast("bigint").alias("c"),
        F.sum(F.col("h1") * F.col("h2")).cast("bigint").alias("a"),
        F.sum((1 - F.col("h1")) * (1 - F.col("h2")))
        .cast("bigint").alias("d"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    bc = F.col("b") - F.col("c")
    return cell.select(
        "a", "b", "c", "d",
        q6((bc * bc).cast("double") / (F.col("b") + F.col("c")))
        .alias("chi2"),
        q6(((F.abs(bc) - 1) * (F.abs(bc) - 1)).cast("double")
           / (F.col("b") + F.col("c"))).alias("chi2_cc"))


@query(
    "stats_hodges_lehmann",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT wk, cents - lag(cents) OVER (ORDER BY wk) AS dv,
             CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t
      FROM wkly
    ),
    dd AS (SELECT t, dv FROM d WHERE dv IS NOT NULL),
    walsh AS (
      SELECT i.dv + j.dv AS w2
      FROM dd i JOIN dd j ON i.t <= j.t
    ),
    ranked AS (
      SELECT w2, CAST(row_number() OVER (ORDER BY w2) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM walsh
    )
    SELECT CAST(any_value(m) AS BIGINT) AS n_walsh,
           CAST(CAST(floor(
             CAST(SUM(CASE WHEN m % 2 = 1 AND rk = (m + 1) // 2
                           THEN 2 * w2
                           WHEN m % 2 = 0 AND rk IN (m // 2, m // 2 + 1)
                           THEN w2 ELSE 0 END) AS DOUBLE) / 4
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS hl_cents
    FROM ranked
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Hodges-Lehmann estimator of the weekly revenue-change
    location: the median of all Walsh averages (d_i + d_j)/2, i <= j.

    Exact core: Walsh sums d_i + d_j are exact cents; the median is
    picked by integer rank over the ~59k-pair bounded grid (DAY-GRAIN
    CONTRACT: the weekly calendar bounds the quadratic expansion, not
    the data volume).  Odd m takes the middle value doubled, even m the
    two middles summed — either way a single exact integer divided by 4
    at the readout.
    """
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("cents")))
    # bounded weekly series: DAY-GRAIN CONTRACT (aggregates.py docstring)
    w = Window.orderBy("wk")
    d = wkly.select(
        (F.col("cents") - F.lag("cents").over(w)).alias("dv"),
        F.row_number().over(w).cast("bigint").alias("t"))
    dd = d.filter(F.col("dv").isNotNull())
    i = dd.select(F.col("t").alias("ti"), F.col("dv").alias("di"))
    j = dd.select(F.col("t").alias("tj"), F.col("dv").alias("dj"))
    walsh = (i.join(j, F.col("ti") <= F.col("tj"))
             .select((F.col("di") + F.col("dj")).alias("w2")))
    ranked = walsh.select(
        "w2",
        F.row_number().over(Window.orderBy("w2")).cast("bigint").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("m"))
    pick = F.expr(
        "CASE WHEN m % 2 = 1 AND rk = (m + 1) div 2 THEN 2 * w2 "
        "WHEN m % 2 = 0 AND rk IN (m div 2, m div 2 + 1) THEN w2 "
        "ELSE 0 END")
    return ranked.agg(
        F.any_value("m").cast("bigint").alias("n_walsh"),
        (F.floor(F.sum(pick).cast("double") / F.lit(4.0)
                 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("hl_cents"))


@query(
    "stats_page_trend_test",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dw,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY wk HAVING COUNT(*) = 7
    ),
    r AS (
      SELECT d.wk, d.dw,
             CAST(2 * rank() OVER (PARTITION BY d.wk ORDER BY d.cents)
                  + COUNT(*) OVER (PARTITION BY d.wk, d.cents) - 1
               AS BIGINT) AS r2
      FROM daily d JOIN complete USING (wk)
    ),
    colsum AS (
      SELECT dw, CAST(SUM(r2) AS BIGINT) AS r2sum FROM r GROUP BY 1
    ),
    agg AS (
      SELECT CAST(SUM((dw + 1) * r2sum) AS BIGINT) AS l2,
             CAST((SELECT COUNT(*) FROM complete) AS BIGINT) AS b
      FROM colsum
    )
    SELECT b AS n_blocks, l2 AS page_l_x2,
           b * 224 AS null_mean_x2,
           CAST(CAST(floor(
             (CAST(l2 AS DOUBLE) - b * 224) / 2
             / sqrt(CAST(b AS DOUBLE) * 49 * 8 * 48 / 144)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS z_score
    FROM agg
    """,
)
def stats_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ordered day-of-week revenue trend across
    complete weekly blocks.

    Treatments are the k=7 weekdays in calendar order (DuckDB dayofweek
    0=Sunday; Spark dayofweek-1 — the repo's normalization); within
    each complete week the daily revenues get exact 2x tie-averaged
    integer ranks; L = sum_j j * R_j.  Null moments (untied): E[L] =
    b*k(k+1)^2/4 = 112b, so E[2L] = 224b; Var(L) = b*k^2(k+1)(k^2-1)/144
    = b*392/3 (derived from Var(r_j)=(k^2-1)/12, Cov=-(k+1)/12).  Ties are practically impossible on exact
    revenue cents; the 2x rank machinery still handles them, only the
    variance formula assumes none (documented).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("cents")))
    complete = (daily.groupBy("wk").agg(F.count("*").alias("ndw"))
                .filter(F.col("ndw") == 7).select("wk"))
    # <= ~350 blocks x 7: DAY-GRAIN CONTRACT (aggregates.py docstring)
    r = (daily.join(complete, "wk")
         .select("wk", "dw", "cents",
                 (2 * F.rank().over(Window.partitionBy("wk")
                                    .orderBy("cents"))
                  + F.count("*").over(Window.partitionBy("wk", "cents"))
                  - 1).cast("bigint").alias("r2")))
    colsum = r.groupBy("dw").agg(F.sum("r2").cast("bigint").alias("r2sum"))
    b_df = complete.agg(F.count("*").cast("bigint").alias("b"))
    agg = (colsum.agg(F.sum((F.col("dw") + 1) * F.col("r2sum"))
                      .cast("bigint").alias("l2"))
           .crossJoin(F.broadcast(b_df)))
    z = ((F.col("l2").cast("double") - F.col("b") * 224) / F.lit(2.0)
         / F.sqrt(F.col("b").cast("double") * F.lit(49.0) * F.lit(8.0)
                  * F.lit(48.0) / F.lit(144.0)))
    return agg.select(
        F.col("b").alias("n_blocks"), F.col("l2").alias("page_l_x2"),
        (F.col("b") * 224).alias("null_mean_x2"),
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative test (r11): are order sizes
# (line-item counts) stochastically ordered across the five priority
# classes?  JT = sum over group pairs i<j of the Mann-Whitney count
# #{x in Gi < y in Gj} + 1/2 #ties.  EXACTNESS: the fact scan reduces
# to the (priority, n_items) count grid (<= ~60 cells); 2*JT, E[2*JT] =
# sum_{i<j} ni*nj, and the three tie-correction aggregates are exact
# BIGINTs off that grid; the tie-corrected variance (Hollander-Wolfe
# 6.19) and z are doubles of identical expression shape in both
# engines.  SCALE: one groupBy to the grid, constant-size math after.
# ---------------------------------------------------------------------------

@query(
    "stats_jonckheere_terpstra",
    oracle="""
    WITH sz AS (
      SELECT o.o_orderpriority AS g, c.v
      FROM orders o
      JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS v
            FROM lineitem GROUP BY 1) c ON c.l_orderkey = o.o_orderkey
    ),
    grid AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM sz GROUP BY 1, 2
    ),
    jt AS (
      SELECT CAST(SUM(CASE WHEN a.v < b.v THEN 2 * a.cnt * b.cnt
                           WHEN a.v = b.v THEN a.cnt * b.cnt
                           ELSE 0 END) AS BIGINT) AS jt2
      FROM grid a JOIN grid b ON a.g < b.g
    ),
    gn AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS ni FROM grid GROUP BY 1),
    tv AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM grid GROUP BY 1),
    moms AS (
      SELECT CAST((SELECT SUM(ni) FROM gn) AS BIGINT) AS n,
             CAST((SELECT SUM(a.ni * b.ni) FROM gn a
                   JOIN gn b ON a.g < b.g) AS BIGINT) AS e2,
             CAST((SELECT SUM(ni * (ni - 1) * (2 * ni + 5)) FROM gn)
               AS BIGINT) AS a_g,
             CAST((SELECT SUM(t * (t - 1) * (2 * t + 5)) FROM tv)
               AS BIGINT) AS a_t,
             CAST((SELECT SUM(ni * (ni - 1) * (ni - 2)) FROM gn)
               AS BIGINT) AS b_g,
             CAST((SELECT SUM(t * (t - 1) * (t - 2)) FROM tv)
               AS BIGINT) AS b_t,
             CAST((SELECT SUM(ni * (ni - 1)) FROM gn) AS BIGINT) AS c_g,
             CAST((SELECT SUM(t * (t - 1)) FROM tv) AS BIGINT) AS c_t
    )
    SELECT j.jt2 AS jt_x2, m.e2 AS null_mean_x2, m.n,
           CAST(CAST(floor(
             (CAST(j.jt2 AS DOUBLE) - m.e2) / 2 / sqrt(
               (CAST(m.n AS DOUBLE) * (m.n - 1) * (2 * m.n + 5)
                - m.a_g - m.a_t) / 72
               + CAST(m.b_g AS DOUBLE) * m.b_t
                 / (36.0 * m.n * (m.n - 1) * (m.n - 2))
               + CAST(m.c_g AS DOUBLE) * m.c_t
                 / (8.0 * m.n * (m.n - 1)))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS z_score
    FROM jt j, moms m
    """,
)
def stats_jonckheere_terpstra(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Tie-corrected Jonckheere-Terpstra z for ordered priority groups
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sz = (orders.join(
        li.groupBy("l_orderkey").agg(F.count("*").cast("bigint").alias("v")),
        orders.o_orderkey == F.col("l_orderkey"))
        .select(F.col("o_orderpriority").alias("g"), "v"))
    grid = (sz.groupBy("g", "v").agg(F.count("*").cast("bigint").alias("cnt"))
            .localCheckpoint())
    a = grid.select(F.col("g").alias("ga"), F.col("v").alias("va"),
                    F.col("cnt").alias("ca"))
    b = grid.select(F.col("g").alias("gb"), F.col("v").alias("vb"),
                    F.col("cnt").alias("cb"))
    jt = (a.join(b, F.col("ga") < F.col("gb"))
          .agg(F.sum(F.when(F.col("va") < F.col("vb"),
                            2 * F.col("ca") * F.col("cb"))
                     .when(F.col("va") == F.col("vb"),
                           F.col("ca") * F.col("cb"))
                     .otherwise(0)).cast("bigint").alias("jt2")))
    gn = grid.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("ni"))
    tv = grid.groupBy("v").agg(F.sum("cnt").cast("bigint").alias("t"))
    ga_ = gn.select(F.col("g").alias("g1"), F.col("ni").alias("n1"))
    gb_ = gn.select(F.col("g").alias("g2"), F.col("ni").alias("n2"))
    e2 = (ga_.join(gb_, F.col("g1") < F.col("g2"))
          .agg(F.sum(F.col("n1") * F.col("n2")).cast("bigint").alias("e2")))
    gmom = gn.agg(
        F.sum("ni").cast("bigint").alias("n"),
        F.sum(F.col("ni") * (F.col("ni") - 1) * (2 * F.col("ni") + 5))
        .cast("bigint").alias("a_g"),
        F.sum(F.col("ni") * (F.col("ni") - 1) * (F.col("ni") - 2))
        .cast("bigint").alias("b_g"),
        F.sum(F.col("ni") * (F.col("ni") - 1)).cast("bigint").alias("c_g"))
    tmom = tv.agg(
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
        .cast("bigint").alias("a_t"),
        F.sum(F.col("t") * (F.col("t") - 1) * (F.col("t") - 2))
        .cast("bigint").alias("b_t"),
        F.sum(F.col("t") * (F.col("t") - 1)).cast("bigint").alias("c_t"))
    m = (jt.crossJoin(F.broadcast(e2)).crossJoin(F.broadcast(gmom))
         .crossJoin(F.broadcast(tmom)))
    nd = F.col("n").cast("double")
    var = ((nd * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("a_g") - F.col("a_t")) / F.lit(72.0)
           + F.col("b_g").cast("double") * F.col("b_t")
           / (F.lit(36.0) * F.col("n") * (F.col("n") - 1) * (F.col("n") - 2))
           + F.col("c_g").cast("double") * F.col("c_t")
           / (F.lit(8.0) * F.col("n") * (F.col("n") - 1)))
    z = (F.col("jt2").cast("double") - F.col("e2")) / F.lit(2.0) / F.sqrt(var)
    return m.select(
        F.col("jt2").alias("jt_x2"), F.col("e2").alias("null_mean_x2"),
        "n",
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Chow structural-break test (r11): does the weekly-revenue-on-time OLS
# line break at the calendar midpoint?  F = ((SSR_f - SSR_1 - SSR_2)/k)
# / ((SSR_1 + SSR_2)/(n - 2k)), k = 2.  EXACTNESS: per segment the five
# moments n, St, Sy, Stt, Sty, Syy are exact (Syy as DECIMAL(38,0) —
# weekly cents squared exceeds BIGINT); each SSR is then the same
# double expression Syy - Sy^2/n - (Sty - St*Sy/n)^2/(Stt - St^2/n) in
# both engines — identical int inputs, identical shape, identical
# doubles.  DAY-GRAIN CONTRACT bounds the series (~344 weeks).
# ---------------------------------------------------------------------------

_CHOW_MOMS = """
      SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
"""

_CHOW_SSR = ("(CAST({p}.syy AS DOUBLE) - CAST({p}.sy AS DOUBLE) * {p}.sy"
             " / {p}.n - (CAST({p}.sty AS DOUBLE) - CAST({p}.st AS DOUBLE)"
             " * {p}.sy / {p}.n) * (CAST({p}.sty AS DOUBLE)"
             " - CAST({p}.st AS DOUBLE) * {p}.sy / {p}.n)"
             " / (CAST({p}.stt AS DOUBLE) - CAST({p}.st AS DOUBLE) * {p}.st"
             " / {p}.n))")


@query(
    "stats_chow_test",
    oracle=f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t, y,
             CAST(COUNT(*) OVER () AS BIGINT) AS w
      FROM wkly
    ),
    mf AS ({_CHOW_MOMS} FROM idx),
    m1 AS ({_CHOW_MOMS} FROM idx WHERE t <= w // 2),
    m2 AS ({_CHOW_MOMS} FROM idx WHERE t > w // 2)
    SELECT CAST(mf.n AS BIGINT) AS n_weeks,
           CAST(m1.n AS BIGINT) AS n_seg1,
           CAST(CAST(floor(
             ({_CHOW_SSR.format(p='mf')} - {_CHOW_SSR.format(p='m1')}
              - {_CHOW_SSR.format(p='m2')}) / 2
             / (({_CHOW_SSR.format(p='m1')} + {_CHOW_SSR.format(p='m2')})
                / (mf.n - 4))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS f_stat
    FROM mf, m1, m2
    """,
)
def stats_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow F-test for a weekly-revenue trend break at the calendar
    midpoint (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("y")))
    # bounded weekly series: DAY-GRAIN CONTRACT (aggregates.py docstring)
    idx = wkly.select(
        F.row_number().over(Window.orderBy("wk")).cast("bigint").alias("t"),
        "y",
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("w")
    ).localCheckpoint()

    def moms(df: DataFrame, p: str) -> DataFrame:
        return df.agg(
            F.count("*").cast("bigint").alias(f"{p}_n"),
            F.sum("t").cast("bigint").alias(f"{p}_st"),
            F.sum("y").cast("bigint").alias(f"{p}_sy"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias(f"{p}_stt"),
            F.sum(F.col("t") * F.col("y")).cast("bigint").alias(f"{p}_sty"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("decimal(38,0)").alias(f"{p}_syy"))

    mf = moms(idx, "mf")
    m1 = moms(idx.filter(F.col("t") <= F.expr("w div 2")), "m1")
    m2 = moms(idx.filter(F.col("t") > F.expr("w div 2")), "m2")
    all_ = mf.crossJoin(F.broadcast(m1)).crossJoin(F.broadcast(m2))

    def ssr(p: str):
        syy = F.col(f"{p}_syy").cast("double")
        sy = F.col(f"{p}_sy").cast("double")
        st = F.col(f"{p}_st").cast("double")
        sty = F.col(f"{p}_sty").cast("double")
        stt = F.col(f"{p}_stt").cast("double")
        n = F.col(f"{p}_n")
        num = sty - st * sy / n
        return syy - sy * sy / n - num * num / (stt - st * st / n)

    f_stat = ((ssr("mf") - ssr("m1") - ssr("m2")) / F.lit(2.0)
              / ((ssr("m1") + ssr("m2")) / (F.col("mf_n") - 4)))
    return all_.select(
        F.col("mf_n").alias("n_weeks"), F.col("m1_n").alias("n_seg1"),
        (F.floor(f_stat * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("f_stat"))


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling (r11; Pettitt 1976) — the tail-sensitive
# sibling of stats_ks_drift (same source-parity cohorts on document
# length, deliberately, so the two drift readouts are comparable):
# A^2 = (1/(n*m)) * sum_{i=1}^{N-1} (N*M_i - n*i)^2 / (i*(N-i)) over
# the pooled order statistics, where M_i counts cohort-a items among
# the first i.  Ties are resolved by the FIXED convention a-before-b
# (then doc_id) inside equal values — both engines implement the same
# total order, so M_i is deterministic.  EXACTNESS: each term is a
# rational of exact BIGINTs, half-up quantized to 1e9 as DECIMAL(38,0)
# intermediates (numerators reach ~5e25), then exactly summed; A^2 is
# one quantized readout.  SCALE (reworked r12): the pooled rank and
# the running cohort count come from ONE two-level grid_rank pass
# (operators/ranks.py) over the bounded n_chars value grid — no
# single-task sort; the only global window runs over the grid
# aggregate (gated by test_plan_quality.py's unpartitioned-Window
# sweep).
# ---------------------------------------------------------------------------

@query(
    "stats_anderson_darling",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             CASE WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0
                  THEN 0 ELSE 1 END AS coh
      FROM documents
    ),
    pooled AS (
      SELECT n_chars, coh,
             CAST(row_number() OVER (ORDER BY n_chars, coh, doc_id)
               AS BIGINT) AS i,
             CAST(SUM(1 - coh) OVER (ORDER BY n_chars, coh, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS mi,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn,
             CAST(SUM(1 - coh) OVER () AS BIGINT) AS na
      FROM d
    ),
    terms AS (
      SELECT nn, na,
             (CAST(nn * mi - na * i AS DECIMAL(38,0))
              * (nn * mi - na * i) * 2000000000 + i * (nn - i))
             // (2 * i * (nn - i)) AS t9
      FROM pooled WHERE i < nn
    )
    SELECT any_value(na) AS n_a, any_value(nn - na) AS n_b,
           CAST(CAST(floor(
             CAST(SUM(t9) AS DOUBLE)
             / (CAST(any_value(na) AS DOUBLE) * (any_value(nn)
                - any_value(na)))
             / 1000000000 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS a2
    FROM terms
    """,
)
def stats_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A^2 on document length across
    source-parity cohorts (see block comment)."""
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "n_chars",
        F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, 0)
        .otherwise(1).alias("coh"))
    tot = d.agg(F.count("*").cast("bigint").alias("nn"),
                F.sum(1 - F.col("coh")).cast("bigint").alias("na"))
    # two-level pooled rank + running cohort-A count over the bounded
    # n_chars value grid (operators/ranks.py; no single-task sort)
    pooled = (grid_rank(d, ["n_chars", "coh", "doc_id"],
                        F.col("n_chars"),
                        cums={"mi": (1 - F.col("coh"))}, out_rk="i")
              .crossJoin(F.broadcast(tot))
              .select("i", "mi", "nn", "na"))
    d38 = "decimal(38,0)"
    terms = (pooled.filter(F.col("i") < F.col("nn"))
             .select("nn", "na",
                     F.expr(
                         f"(cast(nn * mi - na * i as {d38})"
                         f" * (nn * mi - na * i) * 2000000000"
                         f" + i * (nn - i)) div (2 * i * (nn - i))")
                     .alias("t9")))
    return terms.agg(
        F.any_value("na").cast("bigint").alias("n_a"),
        (F.any_value("nn") - F.any_value("na")).cast("bigint").alias("n_b"),
        (F.floor(F.sum("t9").cast("double")
                 / (F.any_value("na").cast("double")
                    * (F.any_value("nn") - F.any_value("na")))
                 / F.lit(1000000000.0) * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0)).alias("a2"))


# ---------------------------------------------------------------------------
# Two-sample Cramér-von Mises (r11; Anderson 1962 rank form) — the
# third member of the ECDF-distance family (KS = sup, AD =
# tail-weighted integral, CvM = unweighted integral), on the SAME
# source-parity cohorts so the three drift readouts are directly
# comparable.  U = n * sum_i (r_i - i)^2 + m * sum_j (s_j - j)^2 over
# pooled ranks (fixed a-before-b tie order, as stats_anderson_darling);
# T = U/(n*m*N) - (4nm - 1)/(6N).  EXACTNESS: U is an exact BIGINT;
# T is one quantized double of identical shape.  SCALE (reworked r12):
# pooled rank r AND within-cohort rank i come from one two-level
# grid_rank pass over the bounded n_chars grid (i is the row's own
# cohort's inclusive cumsum) — no single-task sort, no 2-partition
# skew window.
# ---------------------------------------------------------------------------

@query(
    "stats_cramer_von_mises",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             CASE WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0
                  THEN 0 ELSE 1 END AS coh
      FROM documents
    ),
    pooled AS (
      SELECT coh,
             CAST(row_number() OVER (ORDER BY n_chars, coh, doc_id)
               AS BIGINT) AS r,
             CAST(row_number() OVER (PARTITION BY coh
                                     ORDER BY n_chars, doc_id)
               AS BIGINT) AS i
      FROM d
    ),
    sums AS (
      SELECT CAST(SUM(CASE WHEN coh = 0 THEN (r - i) * (r - i)
                           ELSE 0 END) AS BIGINT) AS da,
             CAST(SUM(CASE WHEN coh = 1 THEN (r - i) * (r - i)
                           ELSE 0 END) AS BIGINT) AS db,
             CAST(SUM(1 - coh) AS BIGINT) AS n,
             CAST(SUM(coh) AS BIGINT) AS m
      FROM pooled
    )
    SELECT n AS n_a, m AS n_b,
           n * da + m * db AS u_stat,
           CAST(CAST(floor(
             (CAST(n * da + m * db AS DOUBLE)
              / (CAST(n AS DOUBLE) * m * (n + m))
              - (4.0 * n * m - 1) / (6.0 * (n + m)))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS t_stat
    FROM sums
    """,
)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample CvM T on document length across source-parity
    cohorts (see block comment)."""
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "n_chars",
        F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, 0)
        .otherwise(1).alias("coh"))
    # two-level pooled rank; the within-cohort rank i falls out of the
    # SAME pass as the running per-cohort counts (i = the cohort's own
    # inclusive cumsum at this row) — no 2-partition skew window
    pooled = (grid_rank(d, ["n_chars", "coh", "doc_id"],
                        F.col("n_chars"),
                        cums={"ca": (1 - F.col("coh")),
                              "cb": F.col("coh")}, out_rk="r")
              .select("coh", "r",
                      F.when(F.col("coh") == 0, F.col("ca"))
                      .otherwise(F.col("cb")).cast("bigint").alias("i")))
    dd = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    sums = pooled.agg(
        F.sum(F.when(F.col("coh") == 0, dd).otherwise(0))
        .cast("bigint").alias("da"),
        F.sum(F.when(F.col("coh") == 1, dd).otherwise(0))
        .cast("bigint").alias("db"),
        F.sum(1 - F.col("coh")).cast("bigint").alias("n"),
        F.sum("coh").cast("bigint").alias("m"))
    u = F.col("n") * F.col("da") + F.col("m") * F.col("db")
    nn = F.col("n") + F.col("m")
    t = (u.cast("double") / (F.col("n").cast("double") * F.col("m") * nn)
         - (F.lit(4.0) * F.col("n") * F.col("m") - 1)
         / (F.lit(6.0) * nn))
    return sums.select(
        F.col("n").alias("n_a"), F.col("m").alias("n_b"),
        u.cast("bigint").alias("u_stat"),
        (F.floor(t * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("t_stat"))


# ---------------------------------------------------------------------------
# Two-proportion z-test (r11) — the A/B workhorse: purchase-share of
# events in the first vs second calendar half, pooled-variance z.
# EXACTNESS: all four counts exact; z is one quantized double from
# exact BIGINTs (identical expression shape).  SCALE: one scan, one
# 2x2 reduction.
# ---------------------------------------------------------------------------

@query(
    "stats_two_proportion_z",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
      FROM events
    ),
    b AS (SELECT (MIN(day) + MAX(day)) // 2 AS dmid FROM ev),
    cell AS (
      SELECT CAST(SUM(CASE WHEN day < dmid THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN day < dmid THEN y ELSE 0 END) AS BIGINT)
               AS x1,
             CAST(SUM(CASE WHEN day >= dmid THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN day >= dmid THEN y ELSE 0 END) AS BIGINT)
               AS x2
      FROM ev, b
    )
    SELECT n1, x1, n2, x2,
           CAST(CAST(floor(
             (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM cell
    """,
)
def stats_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z on purchase share across calendar
    halves (see block comment)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"),
        F.expr("unix_micros(ts) div 86400000000").alias("day"))
    b = ev.agg(F.expr("(min(day) + max(day)) div 2").alias("dmid"))
    cell = ev.crossJoin(F.broadcast(b)).agg(
        F.sum(F.when(F.col("day") < F.col("dmid"), 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("day") < F.col("dmid"), F.col("y"))
              .otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("day") >= F.col("dmid"), 1).otherwise(0))
        .cast("bigint").alias("n2"),
        F.sum(F.when(F.col("day") >= F.col("dmid"), F.col("y"))
              .otherwise(0)).cast("bigint").alias("x2"))
    p = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1")
                                                      + F.col("n2"))
    z = ((F.col("x1").cast("double") / F.col("n1")
          - F.col("x2").cast("double") / F.col("n2"))
         / F.sqrt(p * (1 - p) * (F.lit(1).cast("double") / F.col("n1")
                                 + F.lit(1).cast("double") / F.col("n2"))))
    return cell.select(
        "n1", "x1", "n2", "x2",
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Welch ANOVA (r11) — the heteroscedastic one-way F: stats_anova_oneway
# assumes equal variances; Welch's W (1951) weights groups by n_i/s_i^2
# and is the robust default when variances differ.  Completes the
# Welch family (welch_ttest r7).  EXACTNESS: per-group n, sum, sum^2 in
# exact BIGINT cents (sum^2 in DECIMAL(38,0)); means/variances/weights
# are doubles of identical expression shape; readouts 6-dp quantized.
# SCALE: one groupBy to 5 segment rows.
# ---------------------------------------------------------------------------

@query(
    "stats_welch_anova",
    oracle="""
    WITH g AS (
      SELECT cu.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
               AS DECIMAL(38,0)) AS ss
      FROM g GROUP BY 1
    ),
    w AS (
      SELECT seg, n,
             CAST(s AS DOUBLE) / n AS mean,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
               AS var,
             n / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (n - 1)) AS wi
      FROM m
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(wi) AS sw, SUM(wi * mean) AS swm
      FROM w
    ),
    parts AS (
      SELECT t.k, t.sw,
             SUM(w.wi * (w.mean - t.swm / t.sw)
                 * (w.mean - t.swm / t.sw)) AS num,
             SUM((1 - w.wi / t.sw) * (1 - w.wi / t.sw) / (w.n - 1))
               AS hsum
      FROM w, tot t GROUP BY 1, 2
    )
    SELECT k AS n_groups,
           CAST(CAST(floor(
             (num / (k - 1))
             / (1 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1) * hsum)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS w_stat,
           CAST(CAST(floor(
             (CAST(k AS DOUBLE) * k - 1) / (3.0 * hsum)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS df2
    FROM parts
    """,
)
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way W on order totals across market
    segments (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    g = (orders.join(F.broadcast(cust),
                     orders.o_custkey == cust.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("bigint").alias("cents")))
    m = g.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)").alias("ss"))
    var = ((F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n"))
           / (F.col("n") - 1))
    w = m.select("seg", "n",
                 (F.col("s").cast("double") / F.col("n")).alias("mean"),
                 var.alias("var"),
                 (F.col("n") / var).alias("wi"))
    tot = w.agg(F.count("*").cast("bigint").alias("k"),
                F.sum("wi").alias("sw"),
                F.sum(F.col("wi") * F.col("mean")).alias("swm"))
    joined = w.crossJoin(F.broadcast(tot))
    dev = F.col("mean") - F.col("swm") / F.col("sw")
    parts = joined.groupBy("k", "sw").agg(
        F.sum(F.col("wi") * dev * dev).alias("num"),
        F.sum((1 - F.col("wi") / F.col("sw"))
              * (1 - F.col("wi") / F.col("sw")) / (F.col("n") - 1))
        .alias("hsum"))
    kd = F.col("k").cast("double")
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return parts.select(
        F.col("k").alias("n_groups"),
        q6((F.col("num") / (F.col("k") - 1))
           / (1 + F.lit(2.0) * (F.col("k") - 2) / (kd * F.col("k") - 1)
              * F.col("hsum"))).alias("w_stat"),
        q6((kd * F.col("k") - 1) / (F.lit(3.0) * F.col("hsum")))
        .alias("df2"))


# ---------------------------------------------------------------------------
# Bartlett's test (r11) — the PARAMETRIC variance-equality test next to
# the robust stats_levene_test (same segments, deliberately): T =
# ((N-k) ln Sp^2 - sum (n_i - 1) ln S_i^2) / (1 + (sum 1/(n_i-1) -
# 1/(N-k)) / (3(k-1))).  EXACTNESS: per-segment moments exact (sum^2 in
# DECIMAL(38,0)); each (n_i - 1) * ln S_i^2 term is deterministic per
# segment and 1e-9-quantized to BIGINT before the order-free sum (the
# entropy-term discipline); the final scalar assembly is one quantized
# double.  SCALE: one groupBy to 5 rows.
# ---------------------------------------------------------------------------

@query(
    "stats_bartlett_test",
    oracle="""
    WITH g AS (
      SELECT cu.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
               AS DECIMAL(38,0)) AS ss
      FROM g GROUP BY 1
    ),
    v AS (
      SELECT seg, n,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
               AS s2,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS dev
      FROM m
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             SUM(dev) AS devtot,
             CAST(SUM(CAST(floor((n - 1) * ln(s2) * 1000000000 + 0.5)
                  AS BIGINT)) AS BIGINT) AS lnterm9,
             SUM(CAST(1 AS DOUBLE) / (n - 1)) AS invsum
      FROM v
    )
    SELECT k AS n_groups, nn AS n_rows,
           CAST(CAST(floor(
             ((nn - k) * ln(devtot / (nn - k))
              - CAST(lnterm9 AS DOUBLE) / 1000000000)
             / (1 + (invsum - CAST(1 AS DOUBLE) / (nn - k))
                    / (3.0 * (k - 1)))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS t_stat
    FROM agg
    """,
)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-equality T on order totals across market
    segments (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    g = (orders.join(F.broadcast(cust),
                     orders.o_custkey == cust.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("bigint").alias("cents")))
    m = g.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)").alias("ss"))
    dev = (F.col("ss").cast("double")
           - F.col("s").cast("double") * F.col("s") / F.col("n"))
    v = m.select("seg", "n", dev.alias("dev"),
                 (dev / (F.col("n") - 1)).alias("s2"))
    agg = v.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("dev").alias("devtot"),
        F.sum(F.floor((F.col("n") - 1) * F.log(F.col("s2"))
                      * F.lit(1000000000.0) + F.lit(0.5))
              .cast("bigint")).cast("bigint").alias("lnterm9"),
        F.sum(F.lit(1).cast("double") / (F.col("n") - 1)).alias("invsum"))
    t = (((F.col("nn") - F.col("k"))
          * F.log(F.col("devtot") / (F.col("nn") - F.col("k")))
          - F.col("lnterm9").cast("double") / F.lit(1000000000.0))
         / (1 + (F.col("invsum")
                 - F.lit(1).cast("double") / (F.col("nn") - F.col("k")))
            / (F.lit(3.0) * (F.col("k") - 1))))
    return agg.select(
        F.col("k").alias("n_groups"), F.col("nn").alias("n_rows"),
        (F.floor(t * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("t_stat"))


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test (r11) — the ORDERED counterpart of the
# 2xk proportion chi-square: is the share of multi-item orders (y =
# n_items >= 4) monotone across the five priority classes with scores
# t = 1..5?  T = sum t_i (x_i - n_i * p) with pooled p; Var(T) =
# p(1-p) [sum t_i^2 n_i - (sum t_i n_i)^2 / N].  EXACTNESS: the 2x5
# count grid is exact; T is assembled as the exact integer
# N * sum(t_i x_i) - X * sum(t_i n_i) (= N^2 p-scaled T), variance from
# exact integer sums; z is one quantized double of identical shape.
# SCALE: one groupBy to 5 rows.
# ---------------------------------------------------------------------------

@query(
    "stats_cochran_armitage",
    oracle="""
    WITH base AS (
      SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS t,
             CASE WHEN c.n_items >= 4 THEN 1 ELSE 0 END AS y
      FROM orders o
      JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem GROUP BY 1) c ON c.l_orderkey = o.o_orderkey
    ),
    g AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS x
      FROM base GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(x) AS BIGINT) AS xx,
             CAST(SUM(t * x) AS BIGINT) AS tx,
             CAST(SUM(t * n) AS BIGINT) AS tn,
             CAST(SUM(t * t * n) AS BIGINT) AS ttn
      FROM g
    )
    SELECT nn AS n_rows, xx AS n_pos,
           nn * tx - xx * tn AS t_num_xn,
           CAST(CAST(floor(
             (CAST(nn AS DOUBLE) * tx - CAST(xx AS DOUBLE) * tn)
             / nn
             / sqrt((CAST(xx AS DOUBLE) / nn)
                    * (1 - CAST(xx AS DOUBLE) / nn)
                    * (ttn - CAST(tn AS DOUBLE) * tn / nn))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM s
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage z for a proportion trend across ordered
    priority scores (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_items = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_items"))
    base = (orders.join(n_items, orders.o_orderkey == F.col("l_orderkey"))
            .select(F.substring("o_orderpriority", 1, 1).cast("bigint")
                    .alias("t"),
                    F.when(F.col("n_items") >= 4, 1).otherwise(0)
                    .cast("bigint").alias("y")))
    g = base.groupBy("t").agg(F.count("*").cast("bigint").alias("n"),
                              F.sum("y").cast("bigint").alias("x"))
    s = g.agg(F.sum("n").cast("bigint").alias("nn"),
              F.sum("x").cast("bigint").alias("xx"),
              F.sum(F.col("t") * F.col("x")).cast("bigint").alias("tx"),
              F.sum(F.col("t") * F.col("n")).cast("bigint").alias("tn"),
              F.sum(F.col("t") * F.col("t") * F.col("n"))
              .cast("bigint").alias("ttn"))
    p = F.col("xx").cast("double") / F.col("nn")
    z = ((F.col("nn").cast("double") * F.col("tx")
          - F.col("xx").cast("double") * F.col("tn")) / F.col("nn")
         / F.sqrt(p * (1 - p)
                  * (F.col("ttn")
                     - F.col("tn").cast("double") * F.col("tn")
                     / F.col("nn"))))
    return s.select(
        F.col("nn").alias("n_rows"), F.col("xx").alias("n_pos"),
        (F.col("nn") * F.col("tx") - F.col("xx") * F.col("tn"))
        .cast("bigint").alias("t_num_xn"),
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# TOST equivalence test (r11; Schuirmann 1987) — the inferential dual
# of the difference tests above: REJECTING here means the two calendar
# halves' mean order values are EQUIVALENT within +/-delta (2% of the
# pooled mean).  Two one-sided Welch t statistics; equivalence holds
# when min(t_lower, -t_upper) exceeds the critical value — the readout
# emits both t's and the margin, all from exact BIGINT/DECIMAL moments
# with identical double shape.
# ---------------------------------------------------------------------------

@query(
    "stats_tost_equivalence",
    oracle="""
    WITH o AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day
      FROM orders
    ),
    b AS (SELECT (MIN(day) + MAX(day)) // 2 AS dmid FROM o),
    m AS (
      SELECT CASE WHEN day < dmid THEN 1 ELSE 2 END AS half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
               AS DECIMAL(38,0)) AS ss
      FROM o, b GROUP BY 1
    ),
    w AS (
      SELECT MAX(CASE WHEN half = 1 THEN CAST(s AS DOUBLE) / n END)
               AS m1,
             MAX(CASE WHEN half = 2 THEN CAST(s AS DOUBLE) / n END)
               AS m2,
             MAX(CASE WHEN half = 1 THEN
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
               / (n - 1) / n END) AS v1,
             MAX(CASE WHEN half = 2 THEN
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
               / (n - 1) / n END) AS v2,
             CAST(SUM(s) AS DOUBLE) / SUM(n) AS gm
      FROM m
    )
    SELECT CAST(CAST(floor((m1 - m2) * 1000000 + 0.5) AS BIGINT)
             AS DOUBLE) / 1000000.0 AS mean_diff_cents,
           CAST(CAST(floor(0.02 * gm * 1000000 + 0.5) AS BIGINT)
             AS DOUBLE) / 1000000.0 AS delta_cents,
           CAST(CAST(floor(
             ((m1 - m2) + 0.02 * gm) / sqrt(v1 + v2) * 1000000 + 0.5)
             AS BIGINT) AS DOUBLE) / 1000000.0 AS t_lower,
           CAST(CAST(floor(
             ((m1 - m2) - 0.02 * gm) / sqrt(v1 + v2) * 1000000 + 0.5)
             AS BIGINT) AS DOUBLE) / 1000000.0 AS t_upper
    FROM w
    """,
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuirmann TOST for mean-equivalence of the two calendar halves
    within +/-2% of the pooled mean (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"),
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"))
    b = o.agg(F.expr("(min(day) + max(day)) div 2").alias("dmid"))
    m = (o.crossJoin(F.broadcast(b))
         .groupBy(F.when(F.col("day") < F.col("dmid"), 1).otherwise(2)
                  .alias("half"))
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("cents").cast("bigint").alias("s"),
              F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
              .cast("decimal(38,0)").alias("ss")))
    sem = ((F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n"))
           / (F.col("n") - 1) / F.col("n"))
    w = m.agg(
        F.max(F.when(F.col("half") == 1,
                     F.col("s").cast("double") / F.col("n"))).alias("m1"),
        F.max(F.when(F.col("half") == 2,
                     F.col("s").cast("double") / F.col("n"))).alias("m2"),
        F.max(F.when(F.col("half") == 1, sem)).alias("v1"),
        F.max(F.when(F.col("half") == 2, sem)).alias("v2"),
        (F.sum("s").cast("double") / F.sum("n")).alias("gm"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    se = F.sqrt(F.col("v1") + F.col("v2"))
    diff = F.col("m1") - F.col("m2")
    delta = F.lit(0.02) * F.col("gm")
    return w.select(
        q6(diff).alias("mean_diff_cents"),
        q6(delta).alias("delta_cents"),
        q6((diff + delta) / se).alias("t_lower"),
        q6((diff - delta) / se).alias("t_upper"))


# ---------------------------------------------------------------------------
# Paired sign test (r11) — the assumption-free member of the paired
# family (Wilcoxon signed-rank assumes symmetric differences; the sign
# test needs nothing): S = #positive week-over-week revenue changes of
# n non-zero changes; z = (2S - n)/sqrt(n) with the exact binomial
# counts also emitted.  EXACTNESS: diffs in exact cents, S and n exact
# BIGINTs, z one quantized double.  DAY-GRAIN CONTRACT bounds the
# series.
# ---------------------------------------------------------------------------

@query(
    "stats_sign_test",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT cents - lag(cents) OVER (ORDER BY wk) AS dv FROM wkly
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS s_pos,
             CAST(SUM(CASE WHEN dv <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n,
             CAST(SUM(CASE WHEN dv = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ties
      FROM d WHERE dv IS NOT NULL
    )
    SELECT s_pos, n, n_ties,
           CAST(CAST(floor(
             (2.0 * s_pos - n) / sqrt(CAST(n AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM s
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on week-over-week revenue changes (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("cents")))
    # bounded weekly series: DAY-GRAIN CONTRACT (aggregates.py docstring)
    d = wkly.select(
        (F.col("cents") - F.lag("cents").over(Window.orderBy("wk")))
        .alias("dv")).filter(F.col("dv").isNotNull())
    s = d.agg(
        F.sum(F.when(F.col("dv") > 0, 1).otherwise(0))
        .cast("bigint").alias("s_pos"),
        F.sum(F.when(F.col("dv") != 0, 1).otherwise(0))
        .cast("bigint").alias("n"),
        F.sum(F.when(F.col("dv") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_ties"))
    z = ((F.lit(2.0) * F.col("s_pos") - F.col("n"))
         / F.sqrt(F.col("n").cast("double")))
    return s.select(
        "s_pos", "n", "n_ties",
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Hoeffding's D (r12) — Hoeffding 1948: the rank-based dependence
# measure that catches NON-MONOTONE association (U-shapes, bands) that
# Spearman/Kendall read as zero.  Computed on the bounded weekly grid
# (x = weekly order count, y = weekly revenue), per the SAS PROC CORR
# midrank formulation:
#   D = 30 * ((n-2)(n-3)D1 + D2 - 2(n-2)D3)
#           / (n(n-1)(n-2)(n-3)(n-4))
#   D1 = sum (Qi-1)(Qi-2);  D2 = sum (Ri-1)(Ri-2)(Si-1)(Si-2)
#   D3 = sum (Ri-2)(Si-2)(Qi-1)
# with midranks Ri, Si and the bivariate rank Qi = 1 + sum_{j!=i}
# [both strictly below] + 1/2 [one tie, other below] + 1/4 [both tie].
#
# EXACTNESS: 2x midranks (R2, S2) and 4x bivariate ranks (Q4) keep all
# three sums integer at x16 scale: D1_16 = sum (Q4-4)(Q4-8), D2_16 =
# sum (R2-2)(R2-4)(S2-2)(S2-4), D3_16 = sum (R2-4)(S2-4)(Q4-4); the
# published numerator 30*((n-2)(n-3)D1_16 + D2_16 - 2(n-2)D3_16) and
# denominator 16*n..(n-4) are exact BIGINTs (~1e15 max at the ~350-week
# grid — headroom verified), the double ratio is 9-dp floor-quantized.
# SCALE: one groupBy to the <= ~350-row weekly grid (DAY-GRAIN
# CONTRACT), then an O(n^2) = ~122k-row grid self-join — constant-size
# regardless of corpus.
# ---------------------------------------------------------------------------

@query(
    "stats_hoeffding_d",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT wk, x, y,
             2 * rank() OVER (ORDER BY x)
               + CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) - 1 AS r2,
             2 * rank() OVER (ORDER BY y)
               + CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS s2
      FROM wkly
    ),
    q AS (
      SELECT a.wk, MAX(a.r2) AS r2, MAX(a.s2) AS s2,
             4 + CAST(SUM(CASE
                   WHEN b.wk = a.wk THEN 0
                   WHEN b.x < a.x AND b.y < a.y THEN 4
                   WHEN b.x = a.x AND b.y < a.y THEN 2
                   WHEN b.x < a.x AND b.y = a.y THEN 2
                   WHEN b.x = a.x AND b.y = a.y THEN 1
                   ELSE 0 END) AS BIGINT) AS q4
      FROM r a CROSS JOIN r b
      GROUP BY 1
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((q4 - 4) * (q4 - 8)) AS BIGINT) AS d1_16,
             CAST(SUM((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
               AS BIGINT) AS d2_16,
             CAST(SUM((r2 - 4) * (s2 - 4) * (q4 - 4)) AS BIGINT) AS d3_16
      FROM q
    )
    SELECT n, d1_16, d2_16, d3_16,
           30 * ((n - 2) * (n - 3) * d1_16 + d2_16
                 - 2 * (n - 2) * d3_16) AS d_num,
           16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS d_den,
           CAST(CAST(floor(
             CAST(30 * ((n - 2) * (n - 3) * d1_16 + d2_16
                        - 2 * (n - 2) * d3_16) AS DOUBLE)
             / CAST(16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
                    AS DOUBLE)
             * 1000000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000000.0
             AS hoeffding_d
    FROM sums
    """,
)
def stats_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D between weekly order volume and weekly revenue on
    the bounded week grid (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    # F.floor like the stream store's wk (the seasonal-MK r14
    # shape-identity precedent; == truncation on this non-negative
    # domain, == DuckDB // 7)
    wkly = (orders.groupBy(
        F.floor(F.datediff("o_orderdate", F.lit("1970-01-01"))
                .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("x"),
             (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("y")))
    return hoeffding_readout(wkly)


def hoeffding_readout(wkly: DataFrame) -> DataFrame:
    """Hoeffding's D from a (wk, x, y) weekly grid — the ONE readout
    shape shared by the batch query above and the streaming store
    drain (streaming/windows.py stream_hoeffding_maintenance), the
    seasonal_mk_readout device (r14).  The joint bivariate ranks are
    NOT maintained incrementally — they are recomputed at read time on
    the bounded grid, which is what makes the store additive (x and y
    are plain count / cents sums per week)."""
    # bounded weekly grid: single-task global windows by design
    # (DAY-GRAIN CONTRACT, aggregates.py docstring)
    r = wkly.select(
        "wk", "x", "y",
        (2 * F.rank().over(Window.orderBy("x"))
         + F.count("*").over(Window.partitionBy("x")).cast("bigint") - 1)
        .alias("r2"),
        (2 * F.rank().over(Window.orderBy("y"))
         + F.count("*").over(Window.partitionBy("y")).cast("bigint") - 1)
        .alias("s2"))
    a, b = r.alias("a"), r.alias("b")
    w = (F.when(F.col("b.wk") == F.col("a.wk"), 0)
         .when((F.col("b.x") < F.col("a.x"))
               & (F.col("b.y") < F.col("a.y")), 4)
         .when((F.col("b.x") == F.col("a.x"))
               & (F.col("b.y") < F.col("a.y")), 2)
         .when((F.col("b.x") < F.col("a.x"))
               & (F.col("b.y") == F.col("a.y")), 2)
         .when((F.col("b.x") == F.col("a.x"))
               & (F.col("b.y") == F.col("a.y")), 1)
         .otherwise(0))
    q = (a.crossJoin(b)
         .groupBy(F.col("a.wk").alias("wk"))
         .agg(F.max(F.col("a.r2")).alias("r2"),
              F.max(F.col("a.s2")).alias("s2"),
              (F.lit(4) + F.sum(w).cast("bigint")).alias("q4")))
    sums = q.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("q4") - 4) * (F.col("q4") - 8))
        .cast("bigint").alias("d1_16"),
        F.sum((F.col("r2") - 2) * (F.col("r2") - 4)
              * (F.col("s2") - 2) * (F.col("s2") - 4))
        .cast("bigint").alias("d2_16"),
        F.sum((F.col("r2") - 4) * (F.col("s2") - 4) * (F.col("q4") - 4))
        .cast("bigint").alias("d3_16"))
    num = 30 * ((F.col("n") - 2) * (F.col("n") - 3) * F.col("d1_16")
                + F.col("d2_16") - 2 * (F.col("n") - 2) * F.col("d3_16"))
    den = (16 * F.col("n") * (F.col("n") - 1) * (F.col("n") - 2)
           * (F.col("n") - 3) * (F.col("n") - 4))
    return sums.select(
        "n", "d1_16", "d2_16", "d3_16",
        num.alias("d_num"), den.alias("d_den"),
        (F.floor(num.cast("double") / den.cast("double")
                 * F.lit(1000000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000000.0))
        .alias("hoeffding_d"))


# ---------------------------------------------------------------------------
# Ansari-Bradley dispersion test (r12) — Ansari & Bradley 1960: do two
# samples share a SCALE (spread), assuming a common median?  The
# rank-from-both-ends score s_i = min(rank_i, N+1-rank_i) piles small
# scores onto the extremes, so a group with larger dispersion collects
# a smaller score sum.  Demo: are WEEKEND daily order volumes more
# dispersed than weekday volumes?  (The DOW seasonality family's
# variance-side sibling; Page/Friedman test location, this tests
# spread.)
#
# EXACTNESS: 2x pooled midranks r2 = 2*rank + t - 1; 2x scores
# s2 = min(r2, 2(N+1) - r2); AB2 = sum_{weekend} s2.  Inference uses
# the exact permutation moments of a linear rank statistic (tie-safe by
# construction, no untied-formula approximation): E[AB2] = m*S2/N,
# Var[AB2] = m*nn*(N*SS4 - S2^2)/(N^2 (N-1)) with S2 = sum s2, SS4 =
# sum s2^2 — published as the exact BIGINT z-numerator N*AB2 - m*S2
# plus the 6-dp quantized z.  N*SS4 ~ 3.4e13 at the ~2400-day grid:
# BIGINT headroom verified.  SCALE: one groupBy to the bounded day
# grid, single-task rank window by the DAY-GRAIN CONTRACT.
# ---------------------------------------------------------------------------

@query(
    "stats_ansari_bradley",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT d, y,
             CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS wkend
      FROM daily
    ),
    r AS (
      SELECT wkend, y,
             2 * rank() OVER (ORDER BY y)
               + CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS r2,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn
      FROM g
    ),
    s AS (
      SELECT wkend, LEAST(r2, 2 * (nn + 1) - r2) AS s2 FROM r
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(wkend) AS BIGINT) AS m,
             CAST(SUM(wkend * s2) AS BIGINT) AS ab2,
             CAST(SUM(s2) AS BIGINT) AS sum_s2,
             CAST(SUM(s2 * s2) AS BIGINT) AS ss4
      FROM s
    )
    SELECT n AS n_days, m AS n_weekend, ab2,
           n * ab2 - m * sum_s2 AS z_num_x_n,
           CAST(CAST(floor(
             CAST(n * ab2 - m * sum_s2 AS DOUBLE)
             / sqrt(CAST(m AS DOUBLE) * (n - m)
                    * CAST(n * ss4 - sum_s2 * sum_s2 AS DOUBLE)
                    / (n - 1))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM agg
    """,
)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley scale test: weekend vs weekday daily order-volume
    dispersion with exact permutation moments (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.datediff("o_orderdate", F.lit("1970-01-01"))
        .cast("bigint").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y")))
    return ansari_bradley_readout(daily)


def ansari_bradley_readout(daily: DataFrame) -> DataFrame:
    """Ansari-Bradley z from a (d, y) day grid — the ONE readout shape
    shared by the batch query above and the streaming store drain
    (streaming/windows.py stream_ansari_maintenance, which drains the
    SAME _drained_daily_count_store the Theil/Cox-Stuart/Mood twins
    maintain), the seasonal_mk_readout device (r14).  The pooled
    rank-from-both-ends scores are recomputed at read time on the
    bounded grid; the weekend grouping falls out of d itself."""
    # 1970-01-01 is a Thursday: (epoch_day + 4) % 7 gives 0=Sunday,
    # 6=Saturday — pure integer DOW, identical in both engines
    g = daily.select(
        "y", F.when(((F.col("d") + 4) % 7).isin(0, 6), 1).otherwise(0)
        .alias("wkend"))
    # bounded day grid: single-task pooled rank window by design
    # (DAY-GRAIN CONTRACT, aggregates.py docstring)
    r = g.select(
        "wkend",
        (2 * F.rank().over(Window.orderBy("y"))
         + F.count("*").over(Window.partitionBy("y")).cast("bigint") - 1)
        .alias("r2"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("nn"))
    s = r.select(
        "wkend",
        F.least(F.col("r2"), 2 * (F.col("nn") + 1) - F.col("r2"))
        .alias("s2"))
    agg = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("wkend").cast("bigint").alias("m"),
        F.sum(F.col("wkend") * F.col("s2")).cast("bigint").alias("ab2"),
        F.sum("s2").cast("bigint").alias("sum_s2"),
        F.sum(F.col("s2") * F.col("s2")).cast("bigint").alias("ss4"))
    z_num = F.col("n") * F.col("ab2") - F.col("m") * F.col("sum_s2")
    z = (z_num.cast("double")
         / F.sqrt(F.col("m").cast("double") * (F.col("n") - F.col("m"))
                  * (F.col("n") * F.col("ss4")
                     - F.col("sum_s2") * F.col("sum_s2")).cast("double")
                  / (F.col("n") - 1)))
    return agg.select(
        F.col("n").alias("n_days"), F.col("m").alias("n_weekend"), "ab2",
        z_num.alias("z_num_x_n"),
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Kendall's coefficient of concordance W (r12) — Kendall & Babington
# Smith 1939: do the b weekly "judges" agree on how the k=7 weekdays
# rank by revenue?  Completes the Friedman/Page corner of the DOW
# seasonality family: Friedman asks "is there ANY dow effect", Page
# asks "is it a MONOTONE trend", W reports the agreement STRENGTH in
# [0, 1] (and chi2 = b(k-1)W is exactly the Friedman statistic).
#
# EXACTNESS: within-week 2x midranks (the Page machinery verbatim);
# with R2_j = sum of 2x ranks per weekday and per-week tie correction
# T_w = sum_g (t^3 - t) over tie groups:
#   W = (3*sum R2_j^2 - 3*b^2*k*(k+1)^2) / (b^2*k*(k^2-1) - b*sum T)
# (the x2 rank scale turns the textbook 12*S numerator into 3*sum R2^2
# exactly).  All terms BIGINT (~1.6e8 max); W and chi2 = b*(k-1)*W are
# 6-dp floor-quantized doubles of identical shape.  SCALE: complete
# weeks only, <= ~350 blocks x 7 — DAY-GRAIN CONTRACT.
# ---------------------------------------------------------------------------

KENDALL_W_K = 7   # treatments = the 7 weekdays


@query(
    "stats_kendalls_w",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dw,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY 1 HAVING COUNT(*) = {KENDALL_W_K}
    ),
    r AS (
      SELECT d.wk, d.dw, d.cents,
             2 * rank() OVER (PARTITION BY d.wk ORDER BY d.cents)
               + CAST(COUNT(*) OVER (PARTITION BY d.wk, d.cents)
                      AS BIGINT) - 1 AS r2
      FROM daily d JOIN complete USING (wk)
    ),
    colsum AS (
      SELECT dw, CAST(SUM(r2) AS BIGINT) AS r2sum FROM r GROUP BY 1
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT) AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM r GROUP BY wk, cents)
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM complete) AS b,
             (SELECT CAST(SUM(r2sum * r2sum) AS BIGINT) FROM colsum)
               AS sum_r2_sq,
             (SELECT tsum FROM ties) AS tie_sum
    )
    SELECT b AS n_blocks, sum_r2_sq, tie_sum,
           CAST(CAST(floor(
             CAST(3 * sum_r2_sq
                  - 3 * b * b * {KENDALL_W_K}
                      * {(KENDALL_W_K + 1) ** 2} AS DOUBLE)
             / CAST(b * b * {KENDALL_W_K * (KENDALL_W_K ** 2 - 1)}
                    - b * tie_sum AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS w,
           CAST(CAST(floor(
             CAST(b AS DOUBLE) * {KENDALL_W_K - 1}
             * (CAST(3 * sum_r2_sq
                     - 3 * b * b * {KENDALL_W_K}
                         * {(KENDALL_W_K + 1) ** 2} AS DOUBLE)
                / CAST(b * b * {KENDALL_W_K * (KENDALL_W_K ** 2 - 1)}
                       - b * tie_sum AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS friedman_chi2
    FROM agg
    """,
)
def stats_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W (concordance of weekly weekday-revenue rankings)
    with exact tie correction (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    # F.floor like the stream store's wk (the seasonal-MK r14
    # shape-identity precedent; == truncation on this non-negative
    # domain, == DuckDB // 7)
    daily = (orders.groupBy(
        F.floor(F.datediff("o_orderdate", F.lit("1970-01-01"))
                .cast("bigint") / 7).cast("bigint").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("cents")))
    return kendalls_w_readout(daily)


def kendalls_w_readout(daily: DataFrame) -> DataFrame:
    """Kendall's W from a (wk, dw, cents) weekly-grain grid — the ONE
    readout shape shared by the batch query above and the streaming
    store drain (streaming/windows.py stream_kendalls_w_maintenance,
    which drains the SAME (wk, dw, cents) store shape the Durbin twin
    maintains), the seasonal_mk_readout device (r14).  Within-week
    midranks, the complete-week filter and the tie correction are all
    recomputed at read time on the bounded grid; dw only partitions
    (it never reaches the output), so the store's pure-integer
    (epoch_day + 4) % 7 weekday and the batch side's dayofweek - 1 —
    equal by construction (both 0=Sunday) — are interchangeable."""
    k = KENDALL_W_K
    complete = (daily.groupBy("wk").agg(F.count("*").alias("ndw"))
                .filter(F.col("ndw") == k).select("wk"))
    # <= ~350 blocks x 7: DAY-GRAIN CONTRACT (aggregates.py docstring)
    r = (daily.join(complete, "wk")
         .select("wk", "dw", "cents",
                 (2 * F.rank().over(Window.partitionBy("wk")
                                    .orderBy("cents"))
                  + F.count("*").over(Window.partitionBy("wk", "cents"))
                  .cast("bigint") - 1).alias("r2")))
    colsum = (r.groupBy("dw")
              .agg(F.sum("r2").cast("bigint").alias("r2sum"))
              .agg(F.sum(F.col("r2sum") * F.col("r2sum"))
                   .cast("bigint").alias("sum_r2_sq")))
    ties = (r.groupBy("wk", "cents")
            .agg(F.count("*").cast("bigint").alias("t"))
            .agg(F.coalesce(F.sum(F.col("t") * F.col("t") * F.col("t")
                                  - F.col("t")), F.lit(0))
                 .cast("bigint").alias("tie_sum")))
    b_df = complete.agg(F.count("*").cast("bigint").alias("b"))
    agg = (colsum.crossJoin(F.broadcast(ties))
           .crossJoin(F.broadcast(b_df)))
    w_expr = ((3 * F.col("sum_r2_sq")
               - 3 * F.col("b") * F.col("b") * k * (k + 1) ** 2)
              .cast("double")
              / (F.col("b") * F.col("b") * (k * (k ** 2 - 1))
                 - F.col("b") * F.col("tie_sum")).cast("double"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return agg.select(
        F.col("b").alias("n_blocks"), "sum_r2_sq", "tie_sum",
        q6(w_expr).alias("w"),
        q6(F.col("b").cast("double") * (k - 1) * w_expr)
        .alias("friedman_chi2"))


# ---------------------------------------------------------------------------
# Goodman-Kruskal gamma + Somers' D (r12) — the ordinal-association
# pair that completes the concordant/discordant-pair family begun by
# Kendall's tau (r8) and Jonckheere-Terpstra (r11): gamma ignores ties
# entirely, Somers' D penalizes ties on the DEPENDENT variable (the
# asymmetric "does priority predict basket size" readout), tau-b
# splits the difference symmetrically.  One pair pass serves all four.
#
# Demo: order priority (5 ordered classes) vs order size (lineitem
# count).  EXACTNESS: the fact scan reduces to the (priority, size)
# grid (<= ~60 cells, the Jonckheere grid verbatim); concordant /
# discordant / tied-pair counts come from one grid self-join as exact
# BIGINTs (C ~ 1e10 at sf0.1 — headroom fine); the four ratios are
# 6-dp floor-quantized doubles of identical shape.  SCALE: one groupBy
# to the grid, then constant-size pair math — never an O(n^2) row
# join.
# ---------------------------------------------------------------------------

@query(
    "stats_gamma_somers_d",
    oracle="""
    WITH sz AS (
      SELECT o.o_orderpriority AS g, c.v
      FROM orders o
      JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS v
            FROM lineitem GROUP BY 1) c ON c.l_orderkey = o.o_orderkey
    ),
    grid AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM sz GROUP BY 1, 2
    ),
    pairs AS (
      SELECT
        CAST(SUM(CASE WHEN a.v < b.v THEN a.cnt * b.cnt ELSE 0 END)
          AS BIGINT) AS c_pairs,
        CAST(SUM(CASE WHEN a.v > b.v THEN a.cnt * b.cnt ELSE 0 END)
          AS BIGINT) AS d_pairs,
        CAST(SUM(CASE WHEN a.v = b.v THEN a.cnt * b.cnt ELSE 0 END)
          AS BIGINT) AS ties_y
      FROM grid a JOIN grid b ON a.g < b.g
    ),
    tx AS (
      SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ties_x
      FROM grid a JOIN grid b ON a.g = b.g AND a.v < b.v
    )
    SELECT p.c_pairs, p.d_pairs, t.ties_x, p.ties_y,
           CAST(CAST(floor(
             CAST(p.c_pairs - p.d_pairs AS DOUBLE)
             / CAST(p.c_pairs + p.d_pairs AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS gamma,
           CAST(CAST(floor(
             CAST(p.c_pairs - p.d_pairs AS DOUBLE)
             / CAST(p.c_pairs + p.d_pairs + p.ties_y AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS somers_d_size_given_pri,
           CAST(CAST(floor(
             CAST(p.c_pairs - p.d_pairs AS DOUBLE)
             / CAST(p.c_pairs + p.d_pairs + t.ties_x AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS somers_d_pri_given_size,
           CAST(CAST(floor(
             CAST(p.c_pairs - p.d_pairs AS DOUBLE)
             / sqrt(CAST(p.c_pairs + p.d_pairs + t.ties_x AS DOUBLE)
                    * CAST(p.c_pairs + p.d_pairs + p.ties_y AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS tau_b
    FROM pairs p, tx t
    """,
)
def stats_gamma_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma, both Somers' D directions, and tau-b for
    order priority vs order size on the bounded grid (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cnt = (li.groupBy("l_orderkey")
           .agg(F.count("*").cast("bigint").alias("v")))
    sz = (orders.join(cnt, orders.o_orderkey == cnt.l_orderkey)
          .select(F.col("o_orderpriority").alias("g"), "v"))
    grid = (sz.groupBy("g", "v")
            .agg(F.count("*").cast("bigint").alias("cnt")))
    a, b = grid.alias("a"), grid.alias("b")
    pairs = (a.join(b, F.col("a.g") < F.col("b.g"))
             .agg(F.sum(F.when(F.col("a.v") < F.col("b.v"),
                               F.col("a.cnt") * F.col("b.cnt"))
                        .otherwise(0)).cast("bigint").alias("c_pairs"),
                  F.sum(F.when(F.col("a.v") > F.col("b.v"),
                               F.col("a.cnt") * F.col("b.cnt"))
                        .otherwise(0)).cast("bigint").alias("d_pairs"),
                  F.sum(F.when(F.col("a.v") == F.col("b.v"),
                               F.col("a.cnt") * F.col("b.cnt"))
                        .otherwise(0)).cast("bigint").alias("ties_y")))
    tx = (a.join(b, (F.col("a.g") == F.col("b.g"))
                 & (F.col("a.v") < F.col("b.v")))
          .agg(F.sum(F.col("a.cnt") * F.col("b.cnt"))
               .cast("bigint").alias("ties_x")))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    cd = F.col("c_pairs") - F.col("d_pairs")
    return (pairs.crossJoin(F.broadcast(tx))
            .select(
                "c_pairs", "d_pairs", "ties_x", "ties_y",
                q6(cd.cast("double")
                   / (F.col("c_pairs") + F.col("d_pairs")).cast("double"))
                .alias("gamma"),
                q6(cd.cast("double")
                   / (F.col("c_pairs") + F.col("d_pairs")
                      + F.col("ties_y")).cast("double"))
                .alias("somers_d_size_given_pri"),
                q6(cd.cast("double")
                   / (F.col("c_pairs") + F.col("d_pairs")
                      + F.col("ties_x")).cast("double"))
                .alias("somers_d_pri_given_size"),
                q6(cd.cast("double")
                   / F.sqrt((F.col("c_pairs") + F.col("d_pairs")
                             + F.col("ties_x")).cast("double")
                            * (F.col("c_pairs") + F.col("d_pairs")
                               + F.col("ties_y")).cast("double")))
                .alias("tau_b")))


# ---------------------------------------------------------------------------
# Friedman aligned-ranks test (r12) — Hodges & Lehmann 1962: the power
# upgrade over plain Friedman that Kendall's W (above) sets up.
# Friedman ranks WITHIN each week (7 values at a time, coarse);
# aligned ranks first remove each week's level (align by the block
# mean) and then rank ALL b*k aligned values in one pooled ranking —
# cross-block information survives, so moderate DOW effects that
# within-block ranking dilutes become visible.
#
# EXACTNESS: alignment stays integer by scaling through k: a = k*cents
# - week_sum (same order as cents - mean, no rational mean); pooled 2x
# midranks; Conover's statistic
#   T = (k-1) [sum_j Rj^2 - k b^2 (kb+1)^2 / 4]
#       / { sum_ij R_ij^2 - (1/k) sum_i Ri^2 }
# evaluated from the exact x2-rank sums (Rj = treatment, Ri = block,
# R_ij = pooled midrank) in identical double shape.  The pooled sum of
# squares sum_ij R_ij^2 is computed FROM THE DATA (Conover's tie-exact
# form, ADVICE r12) instead of the untied closed form
# kb(kb+1)(2kb+1)/6 — on untied data the two coincide (sum of i^2);
# on tied aligned cents only the data form is correct.  Ties are
# practically impossible on exact cents; midranks + the data form keep
# even that case deterministic AND exact.  SCALE: complete
# weeks only; one pooled rank window over the <= ~2400-row bounded
# day grid (DAY-GRAIN CONTRACT; input is the daily aggregate, so the
# global window passes the plan gate).
# ---------------------------------------------------------------------------

@query(
    "stats_friedman_aligned_ranks",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dw,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY 1 HAVING COUNT(*) = {KENDALL_W_K}
    ),
    aligned AS (
      SELECT d.wk, d.dw,
             {KENDALL_W_K} * d.cents
               - SUM(d.cents) OVER (PARTITION BY d.wk) AS a
      FROM daily d JOIN complete USING (wk)
    ),
    r AS (
      SELECT wk, dw,
             2 * rank() OVER (ORDER BY a)
               + CAST(COUNT(*) OVER (PARTITION BY a) AS BIGINT) - 1
               AS r2
      FROM aligned
    ),
    sums AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM complete) AS b,
             (SELECT CAST(SUM(rj * rj) AS BIGINT)
              FROM (SELECT CAST(SUM(r2) AS BIGINT) AS rj
                    FROM r GROUP BY dw)) AS sum_rj2_x4,
             (SELECT CAST(SUM(ri * ri) AS BIGINT)
              FROM (SELECT CAST(SUM(r2) AS BIGINT) AS ri
                    FROM r GROUP BY wk)) AS sum_ri2_x4,
             (SELECT CAST(SUM(r2 * r2) AS BIGINT) FROM r)
               AS sum_rij2_x4
    )
    SELECT b AS n_blocks, sum_rj2_x4, sum_ri2_x4, sum_rij2_x4,
           CAST(CAST(floor(
             ({KENDALL_W_K} - 1)
             * (CAST(sum_rj2_x4 AS DOUBLE) / 4
                - {KENDALL_W_K} * CAST(b AS DOUBLE) * b
                  * ({KENDALL_W_K} * b + 1)
                  * ({KENDALL_W_K} * b + 1) / 4)
             / (CAST(sum_rij2_x4 AS DOUBLE) / 4
                - CAST(sum_ri2_x4 AS DOUBLE) / (4 * {KENDALL_W_K}))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS t_stat
    FROM sums
    """,
)
def stats_friedman_aligned_ranks(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Hodges-Lehmann aligned-ranks DOW test over complete weeks (see
    block comment)."""
    k = KENDALL_W_K
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("cents")))
    complete = (daily.groupBy("wk").agg(F.count("*").alias("ndw"))
                .filter(F.col("ndw") == k).select("wk"))
    aligned = (daily.join(complete, "wk")
               .select("wk", "dw",
                       (k * F.col("cents")
                        - F.sum("cents").over(Window.partitionBy("wk")))
                       .alias("a")))
    # pooled rank over the <= ~2400-row bounded grid (DAY-GRAIN
    # CONTRACT; input is the daily aggregate -> plan-gate clean)
    r = aligned.select(
        "wk", "dw",
        (2 * F.rank().over(Window.orderBy("a"))
         + F.count("*").over(Window.partitionBy("a")).cast("bigint") - 1)
        .alias("r2"))
    rj = (r.groupBy("dw").agg(F.sum("r2").cast("bigint").alias("rj"))
          .agg(F.sum(F.col("rj") * F.col("rj")).cast("bigint")
               .alias("sum_rj2_x4")))
    ri = (r.groupBy("wk").agg(F.sum("r2").cast("bigint").alias("ri"))
          .agg(F.sum(F.col("ri") * F.col("ri")).cast("bigint")
               .alias("sum_ri2_x4")))
    # tie-exact pooled sum of squared midranks (ADVICE r12): from the
    # data, not the untied closed form kb(kb+1)(2kb+1)/6
    rij = r.agg(F.sum(F.col("r2") * F.col("r2")).cast("bigint")
                .alias("sum_rij2_x4"))
    b_df = complete.agg(F.count("*").cast("bigint").alias("b"))
    sums = (rj.crossJoin(F.broadcast(ri)).crossJoin(F.broadcast(rij))
            .crossJoin(F.broadcast(b_df)))
    bd = F.col("b").cast("double")
    t = ((k - 1)
         * (F.col("sum_rj2_x4").cast("double") / 4
            - k * bd * F.col("b") * (k * F.col("b") + 1)
            * (k * F.col("b") + 1) / 4)
         / (F.col("sum_rij2_x4").cast("double") / 4
            - F.col("sum_ri2_x4").cast("double") / (4 * k)))
    return sums.select(
        F.col("b").alias("n_blocks"), "sum_rj2_x4", "sum_ri2_x4",
        "sum_rij2_x4",
        (F.floor(t * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("t_stat"))


# ---------------------------------------------------------------------------
# Quade test (r12) — Quade 1979: the block-weighted cousin of aligned
# ranks.  Friedman treats every week as equally informative; Quade
# weights each block by the rank of its RANGE (max-min), so weeks with
# a real spread drive the statistic and flat weeks fade.  Completes
# the within-block family: Friedman (plain), Page (ordered), W
# (agreement strength), aligned ranks (pooled), Quade (weighted).
#
# EXACTNESS: within-week 2x midranks r2; block-range 2x midranks q2
# across weeks (ranges are exact integer cents); the products
# S4_ij = q2_i * (r2_ij - (k+1)) are exact x4-scaled integers, and
# Conover's T3 = (b-1)*B/(A2-B) with A2 = sum S_ij^2, B = (1/b) sum_j
# S_j^2 evaluates from the x16 sums (the 16s cancel in the ratio).
# SCALE: complete weeks only; both rank windows run on bounded grids
# over aggregates (DAY-GRAIN CONTRACT, plan-gate clean).
# ---------------------------------------------------------------------------

@query(
    "stats_quade",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dw,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY 1 HAVING COUNT(*) = {KENDALL_W_K}
    ),
    r AS (
      SELECT d.wk, d.dw, d.cents,
             2 * rank() OVER (PARTITION BY d.wk ORDER BY d.cents)
               + CAST(COUNT(*) OVER (PARTITION BY d.wk, d.cents)
                      AS BIGINT) - 1 AS r2
      FROM daily d JOIN complete USING (wk)
    ),
    rng AS (
      SELECT wk, MAX(cents) - MIN(cents) AS rg FROM r GROUP BY 1
    ),
    q AS (
      SELECT wk,
             2 * rank() OVER (ORDER BY rg)
               + CAST(COUNT(*) OVER (PARTITION BY rg) AS BIGINT) - 1
               AS q2
      FROM rng
    ),
    s AS (
      SELECT r.wk, r.dw,
             q.q2 * (r.r2 - {KENDALL_W_K + 1}) AS s4
      FROM r JOIN q USING (wk)
    ),
    sums AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM complete) AS b,
             CAST(SUM(s4 * s4) AS BIGINT) AS a2_x16,
             (SELECT CAST(SUM(sj * sj) AS BIGINT)
              FROM (SELECT CAST(SUM(s4) AS BIGINT) AS sj
                    FROM s GROUP BY dw)) AS b_x16b
      FROM s
    )
    SELECT b AS n_blocks, a2_x16, b_x16b AS sum_sj2_x16,
           CAST(CAST(floor(
             (b - 1) * (CAST(b_x16b AS DOUBLE) / b)
             / (CAST(a2_x16 AS DOUBLE) - CAST(b_x16b AS DOUBLE) / b)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS t3_stat
    FROM sums
    """,
)
def stats_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade range-weighted within-block DOW test over complete weeks
    (see block comment)."""
    k = KENDALL_W_K
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("cents")))
    complete = (daily.groupBy("wk").agg(F.count("*").alias("ndw"))
                .filter(F.col("ndw") == k).select("wk"))
    r = (daily.join(complete, "wk")
         .select("wk", "dw", "cents",
                 (2 * F.rank().over(Window.partitionBy("wk")
                                    .orderBy("cents"))
                  + F.count("*").over(Window.partitionBy("wk", "cents"))
                  .cast("bigint") - 1).alias("r2")))
    rng = (r.groupBy("wk")
           .agg((F.max("cents") - F.min("cents")).alias("rg")))
    # block-range ranks: bounded week grid over an aggregate
    q = rng.select(
        "wk",
        (2 * F.rank().over(Window.orderBy("rg"))
         + F.count("*").over(Window.partitionBy("rg")).cast("bigint") - 1)
        .alias("q2"))
    s = (r.join(q, "wk")
         .select("wk", "dw",
                 (F.col("q2") * (F.col("r2") - (k + 1))).alias("s4")))
    a2 = s.agg(F.sum(F.col("s4") * F.col("s4")).cast("bigint")
               .alias("a2_x16"))
    bj = (s.groupBy("dw").agg(F.sum("s4").cast("bigint").alias("sj"))
          .agg(F.sum(F.col("sj") * F.col("sj")).cast("bigint")
               .alias("sum_sj2_x16")))
    b_df = complete.agg(F.count("*").cast("bigint").alias("b"))
    sums = a2.crossJoin(F.broadcast(bj)).crossJoin(F.broadcast(b_df))
    t3 = ((F.col("b") - 1)
          * (F.col("sum_sj2_x16").cast("double") / F.col("b"))
          / (F.col("a2_x16").cast("double")
             - F.col("sum_sj2_x16").cast("double") / F.col("b")))
    return sums.select(
        F.col("b").alias("n_blocks"), "a2_x16", "sum_sj2_x16",
        (F.floor(t3 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("t3_stat"))


def seasonal_mk_readout(g: DataFrame) -> DataFrame:
    """Seasonal Mann-Kendall statistic from a (wk, dw, y) grid — the
    ONE readout shape shared by the batch query below and the
    streaming store drain (streaming/windows.py
    stream_mk_maintenance), so their hash-equality against the single
    oracle is structural rather than maintained by hand (review r13).
    The dw column only stratifies; any bijection of day-of-week works.
    """
    a, b = g.alias("a"), g.alias("b")
    s = (a.join(b, (F.col("a.dw") == F.col("b.dw"))
                & (F.col("a.wk") < F.col("b.wk")))
         .agg(F.sum(F.when(F.col("b.y") > F.col("a.y"), 1)
                    .when(F.col("b.y") < F.col("a.y"), -1)
                    .otherwise(0)).cast("bigint").alias("s_stat")))
    nd = g.groupBy("dw").agg(F.count("*").cast("bigint").alias("n"))
    v = nd.agg(F.sum(F.col("n") * (F.col("n") - 1)
                     * (2 * F.col("n") + 5)).cast("bigint").alias("vraw"))
    ties = (g.groupBy("dw", "y")
            .agg(F.count("*").cast("bigint").alias("t"))
            .agg(F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1)
                      * (2 * F.col("t") + 5)).cast("bigint"),
                F.lit(0).cast("bigint")).alias("tcorr")))
    out = (s.crossJoin(F.broadcast(v)).crossJoin(F.broadcast(ties)))
    sgn = (F.when(F.col("s_stat") > 0, 1)
           .when(F.col("s_stat") < 0, -1).otherwise(0))
    z = ((F.col("s_stat").cast("double") - sgn)
         / F.sqrt((F.col("vraw") - F.col("tcorr")).cast("double") / 18))
    return out.select(
        "s_stat",
        (F.col("vraw") - F.col("tcorr")).alias("var_x18"),
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall trend test (r12) — Hirsch & Slack 1984: the
# monotone-trend test that survives seasonality.  Plain Mann-Kendall
# (stats_mann_kendall, r10) compares every pair of observations, so a
# strong DOW cycle reads as noise (or worse, as trend); the seasonal
# form counts sign(y_j - y_i) only WITHIN each day-of-week stratum and
# sums the seven stratum statistics — the cross-season pairs that
# carry no trend information never enter.
#
# EXACTNESS: S_d are exact pair-count integers per stratum (weekly
# grid self-join, i<j on week); the tie-corrected null variance
# Var = sum_d [n_d(n_d-1)(2n_d+5) - sum_t t(t-1)(2t+5)] / 18 and the
# continuity-corrected z = (S - sign(S))/sqrt(Var) are doubles of
# identical shape over exact BIGINTs.  SCALE: one groupBy to the
# (wk, dow) grid, then a per-stratum bounded self-join (~7 x 60k
# pairs) — constant-size regardless of corpus.
# ---------------------------------------------------------------------------

@query(
    "stats_seasonal_mann_kendall",
    oracle="""
    WITH g AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dw,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
               AS BIGINT) AS s_stat
      FROM g a JOIN g b ON a.dw = b.dw AND a.wk < b.wk
    ),
    nd AS (
      SELECT dw, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1
    ),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tcorr
      FROM (SELECT dw, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM g GROUP BY 1, 2)
    ),
    v AS (
      SELECT CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS vraw
      FROM nd
    )
    SELECT s.s_stat,
           v.vraw - t.tcorr AS var_x18,
           CAST(CAST(floor(
             (CAST(s.s_stat AS DOUBLE)
              - CASE WHEN s.s_stat > 0 THEN 1
                     WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
             / sqrt(CAST(v.vraw - t.tcorr AS DOUBLE) / 18)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM s, v, ties t
    """,
)
def stats_seasonal_mann_kendall(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Seasonal (DOW-stratified) Mann-Kendall trend z on weekly-grain
    order volume (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    # F.floor, not truncate-cast: the SAME wk expression as the stream
    # store (streaming/windows.py stream_mk_maintenance), so the
    # store/batch hash-equality is shape-identical rather than relying
    # on epoch days being non-negative, where floor and truncation
    # coincide (review r13)
    g = (orders.groupBy(
        F.floor(F.datediff("o_orderdate", F.lit("1970-01-01"))
                .cast("bigint") / 7).cast("bigint").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dw"))
        .agg(F.count("*").cast("bigint").alias("y")))
    return seasonal_mk_readout(g)


# ---------------------------------------------------------------------------
# Durbin test (r13) — Durbin 1951: the balanced-INCOMPLETE-blocks
# member of the within-block family (Friedman/Page/W/aligned/Quade all
# require every treatment in every block; Durbin is what you run when
# each block only observes a subset).  Design: blocks = complete
# weeks, treatments = the 7 weekdays, and each block keeps only the
# k = 3 weekdays picked by the cyclic Fano difference set {0, 1, 3}
# shifted by the week index — every pair of weekdays co-occurs in
# exactly lambda = b/7 blocks, each weekday appears in r = 3b/7
# blocks, so the design is a true BIBD(7, b, 3, 3b/7, b/7).  Balance
# holds only if the kept weeks' residues wk % 7 are UNIFORM, so the
# selection is per-residue-class: the first q complete weeks of EACH
# residue class, q = the smallest class count — exact balance even
# when incomplete weeks puncture the calendar arbitrarily (a plain
# "first 7*(B div 7) weeks" rule would skew the residue multiset).
#
# EXACTNESS: day-of-week from pure integer arithmetic ((epoch_day + 4)
# % 7 — the stats_ansari_bradley device, identical both engines, never
# the engines' differing dayofweek conventions, which MUST agree here
# because dw enters the Fano SELECTION, not just grouping); within-
# block 2x midranks on exact revenue cents; Conover's tie-exact T1 =
# (t-1) * sum_j (R_j - r(k+1)/2)^2 / (A - C) with A = the pooled sum
# of squared midranks FROM THE DATA and C = bk(k+1)^2/4, evaluated
# x4-scaled (the 4s cancel in the ratio).  SCALE: all windows on the
# bounded (wk, dw) day grid over aggregates — DAY-GRAIN CONTRACT.
# ---------------------------------------------------------------------------

DURBIN_K = 3                  # block size: weekdays observed per week
DURBIN_T = 7                  # treatments: the 7 weekdays
DURBIN_FANO = (0, 1, 3)      # perfect difference set mod 7 -> lambda=1


@query(
    "stats_durbin",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             (datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) + 4) % 7 AS dw,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY 1 HAVING COUNT(*) = {DURBIN_T}
    ),
    classes AS (
      SELECT wk,
             row_number() OVER (PARTITION BY wk % {DURBIN_T}
                                ORDER BY wk) AS rn
      FROM complete
    ),
    qmin AS (
      -- min over ALL 7 residue classes, absent classes counting 0: a
      -- punctured calendar that empties one class must yield q = 0
      -- (no blocks) rather than a silently unbalanced design
      SELECT CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS q
      FROM range({DURBIN_T}) r
      LEFT JOIN (SELECT wk % {DURBIN_T} AS cls, COUNT(*) AS cnt
                 FROM complete GROUP BY 1) c
        ON r.range = c.cls
    ),
    blocks AS (
      SELECT wk FROM classes, qmin WHERE rn <= q
    ),
    kept AS (
      SELECT d.wk, d.dw, d.cents
      FROM daily d JOIN blocks USING (wk)
      WHERE ((d.dw - d.wk % {DURBIN_T}) + {DURBIN_T}) % {DURBIN_T}
              IN {DURBIN_FANO}
    ),
    r AS (
      SELECT wk, dw,
             2 * rank() OVER (PARTITION BY wk ORDER BY cents)
               + CAST(COUNT(*) OVER (PARTITION BY wk, cents)
                      AS BIGINT) - 1 AS r2
      FROM kept
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM blocks) AS b,
             (SELECT CAST(SUM(r2 * r2) AS BIGINT) FROM r) AS a_x4
    ),
    colsum AS (
      SELECT dw, CAST(SUM(r2) AS BIGINT) AS r2sum FROM r GROUP BY 1
    ),
    dev AS (
      SELECT CAST(SUM((r2sum - (SELECT {DURBIN_K} * b FROM agg)
                               // {DURBIN_T} * {DURBIN_K + 1})
                      * (r2sum - (SELECT {DURBIN_K} * b FROM agg)
                                 // {DURBIN_T} * {DURBIN_K + 1}))
                  AS BIGINT) AS d2_x4
      FROM colsum
    )
    SELECT agg.b AS n_blocks,
           CAST({DURBIN_K} * agg.b // {DURBIN_T} AS BIGINT) AS rep_r,
           dev.d2_x4,
           agg.a_x4 - agg.b * {DURBIN_K * (DURBIN_K + 1) ** 2}
             AS a_minus_c_x4,
           CAST(CAST(floor(
             {DURBIN_T - 1} * CAST(dev.d2_x4 AS DOUBLE)
             / CAST(GREATEST(agg.a_x4
                    - agg.b * {DURBIN_K * (DURBIN_K + 1) ** 2}, 1)
                    AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS t1_stat
    FROM agg, dev
    """,
)
def stats_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin BIBD rank test: weekday revenue effect from 3-weekday
    Fano-design blocks over complete weeks (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    # floor(), not truncate-cast: matches DuckDB // on this domain
    # (epoch days from the 1970 anchor are non-negative, where floor
    # and truncation coincide — DuckDB // TRUNCATES toward zero on
    # negatives, measured r14; see multimodal._tdiv for the
    # signed-domain discipline)
    daily = (orders.groupBy(
        F.floor(d_col / 7).cast("bigint").alias("wk"),
        ((d_col + 4) % 7).alias("dw"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("cents")))
    return durbin_readout(daily)


def durbin_readout(daily: DataFrame) -> DataFrame:
    """Durbin T1 from a (wk, dw, cents) day grid — the ONE readout
    shape shared by the batch query above and the streaming store
    drain (streaming/windows.py stream_durbin_maintenance), the
    seasonal_mk_readout device: store/batch hash-equality against the
    single oracle is structural rather than maintained by hand (r14)."""
    t, k = DURBIN_T, DURBIN_K
    spark = daily.sparkSession
    complete = (daily.groupBy("wk").agg(F.count("*").alias("ndw"))
                .filter(F.col("ndw") == t).select("wk"))
    # first q complete weeks of EACH residue class wk % 7 (q = the
    # smallest class count): exact replication balance; the rank
    # windows run PARTITIONED over the bounded complete-weeks aggregate
    classes = complete.select(
        "wk",
        F.row_number().over(Window.partitionBy(F.col("wk") % t)
                            .orderBy("wk")).alias("rn"))
    # min over ALL 7 residue classes, absent classes counting 0: a
    # punctured calendar that empties one class must yield q = 0 (no
    # blocks) rather than a silently unbalanced design (review r13)
    cls_counts = (complete.groupBy((F.col("wk") % t).alias("cls"))
                  .agg(F.count("*").alias("cnt")))
    qmin = (spark.range(t).withColumnRenamed("id", "cls")
            .join(cls_counts, "cls", "left")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint")
                 .alias("q")))
    blocks = (classes.crossJoin(F.broadcast(qmin))
              .filter(F.col("rn") <= F.col("q"))
              .select("wk"))
    kept = (daily.join(blocks, "wk")
            .filter(((((F.col("dw") - F.col("wk") % t) + t) % t)
                     ).isin(*DURBIN_FANO)))
    r = kept.select(
        "wk", "dw",
        (2 * F.rank().over(Window.partitionBy("wk").orderBy("cents"))
         + F.count("*").over(Window.partitionBy("wk", "cents"))
         .cast("bigint") - 1).alias("r2"))
    agg = (blocks.agg(F.count("*").cast("bigint").alias("b"))
           .crossJoin(F.broadcast(
               r.agg(F.sum(F.col("r2") * F.col("r2")).cast("bigint")
                     .alias("a_x4")))))
    colsum = r.groupBy("dw").agg(F.sum("r2").cast("bigint")
                                 .alias("r2sum"))
    dev = (colsum.crossJoin(F.broadcast(agg.select("b")))
           .select((F.col("r2sum")
                    - F.expr(f"{k} * b div {t}") * (k + 1))
                   .alias("devi"))
           .agg(F.sum(F.col("devi") * F.col("devi")).cast("bigint")
                .alias("d2_x4")))
    out = agg.crossJoin(F.broadcast(dev))
    amc = F.col("a_x4") - F.col("b") * (k * (k + 1) ** 2)
    # greatest(amc, 1): all-tied blocks give d2 = 0 AND amc = 0 — the
    # guard turns that 0/0 into the conventional 0 under ANSI mode
    t1 = ((t - 1) * F.col("d2_x4").cast("double")
          / F.greatest(amc, F.lit(1).cast("bigint")).cast("double"))
    return out.select(
        F.col("b").alias("n_blocks"),
        F.expr(f"cast({k} * b div {t} as bigint)").alias("rep_r"),
        "d2_x4",
        amc.alias("a_minus_c_x4"),
        (F.floor(t1 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("t1_stat"))


# ---------------------------------------------------------------------------
# Cox-Stuart trend test (r13) — Cox & Stuart 1955: the sign-test view
# of monotone trend that completes the trend family (Mann-Kendall =
# all pairs, seasonal MK = within-stratum pairs, Cox-Stuart = the n/2
# half-offset pairs only — the cheapest member, and the one with an
# exact binomial null).  Pair day i with day i + ceil(n/2) over the
# OBSERVED daily order counts in date order (odd n drops the middle
# observation, the classic construction); count strict rises/falls,
# drop ties; z = (S+ - S- -/+ 1) / sqrt(m) is the continuity-corrected
# normal approximation of Bin(m, 1/2).
#
# EXACTNESS: the pairing is pure integer rank arithmetic on the
# bounded day grid (row_number over the daily AGGREGATE — plan-gate
# clean); counts exact; z a 6-dp floor-quantized double of identical
# shape.  SCALE: one groupBy to the day grid, one bounded self-join.
# ---------------------------------------------------------------------------

@query(
    "stats_cox_stuart",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT d, y,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    pairs AS (
      SELECT a.y AS y1, b.y AS y2
      FROM idx a JOIN idx b
        ON b.rn = a.rn + (a.n + 1) // 2
      WHERE a.rn <= a.n // 2
    ),
    agg AS (
      SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM idx) AS n_days,
             CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_plus,
             CAST(SUM(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_minus
      FROM pairs
    )
    SELECT n_days, n_plus + n_minus AS n_pairs_used, n_plus, n_minus,
           CAST(CAST(floor(
             (CAST(n_plus - n_minus AS DOUBLE)
              - CASE WHEN n_plus > n_minus THEN 1
                     WHEN n_plus < n_minus THEN -1 ELSE 0 END)
             / sqrt(CAST(GREATEST(n_plus + n_minus, 1) AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM agg
    """,
)
def stats_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart half-offset sign test for monotone trend in daily
    order volume (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.datediff("o_orderdate", F.lit("1970-01-01"))
        .cast("bigint").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y")))
    return cox_stuart_readout(daily)


def cox_stuart_readout(daily: DataFrame) -> DataFrame:
    """Cox-Stuart z from a (d, y) day grid — the ONE readout shape
    shared by the batch query above and the streaming store drain
    (streaming/windows.py stream_cox_stuart_maintenance), the
    seasonal_mk_readout device (r14)."""
    idx = daily.select(
        "d", "y",
        F.row_number().over(Window.orderBy("d")).cast("bigint")
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint")
        .alias("n"))
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (a.join(b, F.col("b.rn")
                    == F.col("a.rn") + F.expr("(a.n + 1) div 2"))
             .filter(F.col("a.rn") <= F.expr("a.n div 2"))
             .select(F.col("a.y").alias("y1"), F.col("b.y").alias("y2")))
    n_df = idx.agg(F.max("n").cast("bigint").alias("n_days"))
    agg = (pairs.agg(
        F.sum(F.when(F.col("y2") > F.col("y1"), 1).otherwise(0))
        .cast("bigint").alias("n_plus"),
        F.sum(F.when(F.col("y2") < F.col("y1"), 1).otherwise(0))
        .cast("bigint").alias("n_minus"))
        .crossJoin(F.broadcast(n_df)))
    diff = F.col("n_plus") - F.col("n_minus")
    sgn = (F.when(F.col("n_plus") > F.col("n_minus"), 1)
           .when(F.col("n_plus") < F.col("n_minus"), -1).otherwise(0))
    # greatest(m, 1): all pairs tied means D = 0 and sgn = 0 — the
    # guard turns that 0/0 into the conventional 0 under ANSI mode
    z = ((diff.cast("double") - sgn)
         / F.sqrt(F.greatest(F.col("n_plus") + F.col("n_minus"),
                             F.lit(1).cast("bigint")).cast("double")))
    return agg.select(
        "n_days",
        (F.col("n_plus") + F.col("n_minus")).alias("n_pairs_used"),
        "n_plus", "n_minus",
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("z_score"))


# ---------------------------------------------------------------------------
# Cochran's Q test (r13) — Cochran 1950: the k-related-samples
# extension of McNemar (stats_mcnemar_paired covers k = 2) that the
# binary-outcome family was missing.  Blocks = customers, treatments =
# the k = 4 calendar quarters, x_ij = 1 iff customer i placed at least
# one order in quarter-of-year j (pooled across years): does ordering
# PROPENSITY carry a seasonal signature?  All-zero / all-one blocks
# contribute nothing (their k*R - R^2 term vanishes), matching the
# textbook treatment of uninformative blocks.
#
# EXACTNESS: Q = (k-1) * sum_j (k*C_j - T)^2 / (k * (k*T - sum_i
# R_i^2)) evaluated from exact BIGINT column totals C_j, row totals
# R_i, grand total T — the x k^2 numerator scaling keeps every term
# integer; the final ratio is a 6-dp floor-quantized double.
# Quarter-of-year from pure month arithmetic ((month-1) div 3 + 1),
# identical both engines.  SCALE: one distinct to (custkey, qoy), one
# groupBy per axis — fact-keyed shuffles, constant-size math after.
# ---------------------------------------------------------------------------

COCHRAN_Q_K = 4   # treatments: the 4 calendar quarters


@query(
    "stats_cochran_q",
    oracle=f"""
    WITH cells AS (
      SELECT DISTINCT o_custkey,
             (month(CAST(o_orderdate AS DATE)) - 1) // 3 + 1 AS qoy
      FROM orders
    ),
    rows_t AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS r FROM cells
      GROUP BY 1
    ),
    cols_t AS (
      -- dense over ALL k quarters, absent ones counting 0 (the Durbin
      -- qmin device): a quarter with zero incidence must still
      -- contribute its (k*0 - T)^2 deviation term (review r13)
      SELECT r.range + 1 AS qoy, CAST(COALESCE(cnt, 0) AS BIGINT) AS c
      FROM range({COCHRAN_Q_K}) r
      LEFT JOIN (SELECT qoy, COUNT(*) AS cnt FROM cells GROUP BY 1) q
        ON r.range + 1 = q.qoy
    ),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_t) AS n_blocks,
             (SELECT CAST(SUM(r) AS BIGINT) FROM rows_t) AS t,
             (SELECT CAST(SUM(r * r) AS BIGINT) FROM rows_t) AS sr2,
             (SELECT CAST(SUM(({COCHRAN_Q_K} * c
                               - (SELECT SUM(r) FROM rows_t))
                              * ({COCHRAN_Q_K} * c
                                 - (SELECT SUM(r) FROM rows_t)))
                     AS BIGINT) FROM cols_t) AS dev2
    )
    SELECT n_blocks, t AS grand_total, sr2 AS sum_r_sq, dev2,
           CAST(CAST(floor(
             {COCHRAN_Q_K - 1} * CAST(dev2 AS DOUBLE)
             / ({COCHRAN_Q_K}
                * CAST(GREATEST({COCHRAN_Q_K} * t - sr2, 1) AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS q_stat
    FROM s
    """,
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for seasonal ordering propensity: customers x
    quarters binary incidence (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cells = (orders.select(
        "o_custkey",
        F.floor((F.month("o_orderdate") - 1) / 3).cast("bigint")
        .alias("q0"))
        .select("o_custkey", (F.col("q0") + 1).alias("qoy"))
        .distinct())
    return cochran_readout(cells)


def cochran_readout(cells: DataFrame) -> DataFrame:
    """Cochran's Q from a distinct (o_custkey, qoy) incidence set —
    the ONE readout shape shared by the batch query above and the
    streaming store drain (streaming/windows.py
    stream_cochran_maintenance), the seasonal_mk_readout device (r14)."""
    k = COCHRAN_Q_K
    spark = cells.sparkSession
    rows_t = (cells.groupBy("o_custkey")
              .agg(F.count("*").cast("bigint").alias("r")))
    rstats = rows_t.agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum("r").cast("bigint").alias("t"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("sr2"))
    # dense over ALL k quarters, absent ones counting 0 (the Durbin
    # qmin device): a quarter with zero incidence must still contribute
    # its (k*0 - T)^2 deviation term (review r13)
    cols_t = (spark.range(1, k + 1).withColumnRenamed("id", "qoy")
              .join(cells.groupBy("qoy")
                    .agg(F.count("*").alias("cnt")), "qoy", "left")
              .select(F.coalesce("cnt", F.lit(0)).cast("bigint")
                      .alias("c")))
    dev2 = (cols_t.crossJoin(F.broadcast(rstats.select("t")))
            .select((k * F.col("c") - F.col("t")).alias("d"))
            .agg(F.sum(F.col("d") * F.col("d")).cast("bigint")
                 .alias("dev2")))
    out = rstats.crossJoin(F.broadcast(dev2))
    # greatest(kT - sr2, 1): if EVERY block is all-ones (each customer
    # orders in all 4 quarters) both dev2 and the denominator are 0 —
    # the guard turns that 0/0 into the conventional 0 under ANSI mode
    q = ((k - 1) * F.col("dev2").cast("double")
         / (k * F.greatest(k * F.col("t") - F.col("sr2"),
                           F.lit(1).cast("bigint")).cast("double")))
    return out.select(
        "n_blocks", F.col("t").alias("grand_total"),
        F.col("sr2").alias("sum_r_sq"), "dev2",
        (F.floor(q * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("q_stat"))


# ---------------------------------------------------------------------------
# Mood's median test (r13) — the count-based two-sample location test
# the scale family's stats_ansari_bradley implies but nobody ran:
# weekend vs weekday daily order volume, scored only by which side of
# the POOLED median each day lands on (the maximally robust, minimally
# powerful member — the right test when outlier days would poison the
# rank sums).  Days AT the median drop (the standard convention).
#
# EXACTNESS: the pooled median is the exact LOWER order statistic at
# rank (n+1) div 2 over the bounded day grid (a single-task rank on
# the daily AGGREGATE — DAY-GRAIN CONTRACT, plan-gate clean); the 2x2
# table counts are exact BIGINTs; Yates-corrected chi-square evaluates
# x2-scaled — N * max(2*|ad - bc| - N, 0)^2 / (4 * margins) — so every
# term before the final ratio is integer.  SCALE: one groupBy to the
# day grid, constant-size math after.
# ---------------------------------------------------------------------------

@query(
    "stats_mood_median",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT y,
             CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS wkend
      FROM daily
    ),
    med AS (
      SELECT y AS m FROM (
        SELECT y, row_number() OVER (ORDER BY y) AS rn,
               COUNT(*) OVER () AS n
        FROM g
      ) WHERE rn = (n + 1) // 2
    ),
    tab AS (
      SELECT
        CAST(SUM(CASE WHEN wkend = 1 AND y > m THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
        CAST(SUM(CASE WHEN wkend = 0 AND y > m THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        CAST(SUM(CASE WHEN wkend = 1 AND y < m THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        CAST(SUM(CASE WHEN wkend = 0 AND y < m THEN 1 ELSE 0 END)
             AS BIGINT) AS dd,
        (SELECT CAST(m AS BIGINT) FROM med) AS median_y
      FROM g, med
    )
    SELECT a AS wkend_above, b AS wkday_above,
           c AS wkend_below, dd AS wkday_below, median_y,
           CAST(CAST(floor(
             CAST(a + b + c + dd AS DOUBLE)
             * CAST(GREATEST(2 * abs(a * dd - b * c)
                             - (a + b + c + dd), 0) AS DOUBLE)
             * CAST(GREATEST(2 * abs(a * dd - b * c)
                             - (a + b + c + dd), 0) AS DOUBLE)
             / (4 * CAST(GREATEST(a + b, 1) AS DOUBLE)
                * GREATEST(c + dd, 1)
                * GREATEST(a + c, 1) * GREATEST(b + dd, 1))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS chi2_yates
    FROM tab
    """,
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: weekend vs weekday daily volume scored by
    the pooled-median split, Yates-corrected chi-square (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.datediff("o_orderdate", F.lit("1970-01-01"))
        .cast("bigint").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y")))
    return mood_median_readout(daily)


def mood_median_readout(daily: DataFrame) -> DataFrame:
    """Mood's-median chi-square from a (d, y) day grid — the ONE
    readout shape shared by the batch query above and the streaming
    store drain (streaming/windows.py stream_mood_maintenance), the
    seasonal_mk_readout device (r14)."""
    g = daily.select(
        "y", F.when(((F.col("d") + 4) % 7).isin(0, 6), 1).otherwise(0)
        .alias("wkend"))
    # pooled LOWER median: exact order statistic on the bounded day
    # grid (DAY-GRAIN CONTRACT; input is the daily aggregate)
    med = (g.select(
        "y",
        F.row_number().over(Window.orderBy("y")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("y").alias("m")))
    tab = (g.crossJoin(F.broadcast(med))
           .agg(F.sum(F.when((F.col("wkend") == 1)
                             & (F.col("y") > F.col("m")), 1)
                      .otherwise(0)).cast("bigint").alias("a"),
                F.sum(F.when((F.col("wkend") == 0)
                             & (F.col("y") > F.col("m")), 1)
                      .otherwise(0)).cast("bigint").alias("b"),
                F.sum(F.when((F.col("wkend") == 1)
                             & (F.col("y") < F.col("m")), 1)
                      .otherwise(0)).cast("bigint").alias("c"),
                F.sum(F.when((F.col("wkend") == 0)
                             & (F.col("y") < F.col("m")), 1)
                      .otherwise(0)).cast("bigint").alias("dd"),
                F.max("m").cast("bigint").alias("median_y")))
    n_all = F.col("a") + F.col("b") + F.col("c") + F.col("dd")
    yat = F.greatest(
        2 * F.abs(F.col("a") * F.col("dd") - F.col("b") * F.col("c"))
        - n_all, F.lit(0))
    # greatest(margin, 1): a zero margin forces |ad-bc| = 0, so the
    # Yates numerator is already 0 — the guard only makes the 0/0 case
    # a conventional 0 under ANSI mode, identically in both engines
    one = F.lit(1).cast("bigint")
    chi2 = (n_all.cast("double") * yat.cast("double") * yat.cast("double")
            / (4 * F.greatest(F.col("a") + F.col("b"), one).cast("double")
               * F.greatest(F.col("c") + F.col("dd"), one)
               * F.greatest(F.col("a") + F.col("c"), one)
               * F.greatest(F.col("b") + F.col("dd"), one)))
    return tab.select(
        F.col("a").alias("wkend_above"), F.col("b").alias("wkday_above"),
        F.col("c").alias("wkend_below"), F.col("dd").alias("wkday_below"),
        "median_y",
        (F.floor(chi2 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("chi2_yates"))
