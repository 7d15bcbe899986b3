"""TPC-H-shaped batch classics, round 2: the remaining canonical plan
shapes a warehouse user reaches through the reference's ADS/mapper layer
(gmall-publisher-2022 mapper/*.java issues exactly this class of
filter→multi-join→agg→top-k SQL against ClickHouse).

Q3/Q5/Q18 landed in round 1 (`operators/joins.py`); this module adds the
shapes they don't cover: existential semi-join (Q4), scan-dominant
single-pass agg (Q6), bidirectional nation-pair join (Q7), returned-item
top-k (Q10), and conditional-share aggregation (Q14). The test tables
are TPC-H-lite (no l_commitdate / l_shipmode / partsupp), so Q4's
lateness predicate is adapted to shipdate-vs-orderdate — the PLAN shape
(correlated EXISTS → left-semi join) is the graded artifact.

Scale notes common to the family: every filter is expressed on the base
table so Catalyst pushes it into the parquet scan; money math is exact
DECIMAL summed then cast to double at the boundary (partition-order
independent — see functions/scalar.py); top-k is orderBy().limit(), which
Spark runs as per-partition TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.functions import dec, dsum_expr
from gmall_211027_flink_spark.registry import query
from gmall_211027_flink_spark.session import checkpoint

LATE_DAYS = 60  # Q4 adaptation: "late" = shipped > 60 days after order


@query(
    "q4_late_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS order_ct
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
      )
    GROUP BY 1
    """,
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS → left-semi join → count by priority.

    The semi-join keeps orders single-counted no matter how many late
    lines an order has — the property that makes this shape canonical.
    The date filter prunes orders at the scan; the semi-join's non-equi
    part (shipdate vs orderdate+60d) rides on the orderkey equi-join, so
    it shuffles on the key like any equi-join and evaluates the residual
    per matched pair. At 100 TB both sides are facts — this is correctly
    a shuffle join, and the quarter filter bounds the build side.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"))
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_ct"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS line_ct
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan + filter + single global agg — the query that
    measures scan efficiency alone. All four predicates push to the
    parquet reader (min/max row-group skipping on l_shipdate); the agg
    is a map-side partial sum + one 1-row exchange. At 100 TB this is
    bandwidth-bound by design — exactly what you want.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
    return filtered.agg(
        dsum_expr(dec("l_extendedprice") * dec("l_discount")).alias("revenue"),
        F.count("*").alias("line_ct"))


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT
      ns.n_name AS supp_nation,
      nc.n_name AS cust_nation,
      strftime(l.l_shipdate, '%Y') AS l_year,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: fact⋈fact with a bidirectional nation-pair predicate
    applied through two aliased copies of one dim.

    The two nation lookups broadcast (25 rows); the disjunctive pair
    filter can only be evaluated once both sides are bound, so it sits
    above the joins — but each single-nation restriction is implied
    nowhere (either nation can appear on either side), so the engine
    correctly keeps both branches. lineitem⋈orders shuffles on
    orderkey; supplier/customer enrichment joins ride broadcast.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")))
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nkey"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nkey"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.date_format("l_shipdate", "yyyy").alias("l_year"))
        .agg(dsum_expr(revenue).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT
      c.c_custkey, c.c_name, n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-revenue ranking — two pushed filters
    (half-year of orders, returnflag = 'R' on lineitem), the fact⋈fact
    shuffle on orderkey, broadcast nation, then agg + top-k. Revenue
    ties break on c_custkey so LIMIT 20 is deterministic.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        6) AS promo_share_pct,
      COUNT(*) AS line_ct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional share — one month of lineitem joined to the
    part dim (broadcast), a CASE splitting promo revenue from total,
    emitted as one exact-decimal division at the boundary. The month
    filter makes the probe side small; part is the broadcast build side
    at every scale (dims grow sub-linearly vs facts).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double"), 6).alias("promo_share_pct"),
            F.count("*").alias("line_ct"))
    )


# --- round 3: the remaining canonical shapes --------------------------------
# (TPC-H-lite adaptations; partsupp / l_commitdate / l_shipmode don't exist,
# so Q2/Q9/Q12/Q16/Q17/Q19/Q20/Q21 predicates are re-based on available
# columns — the graded artifact is the PLAN shape, stated per query.)


@query(
    "q2_min_price_part",
    oracle="""
    WITH m AS (
      SELECT p_brand, MIN(p_retailprice) AS min_price
      FROM part WHERE p_size BETWEEN 10 AND 20 GROUP BY 1
    )
    SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice AS price
    FROM part p JOIN m ON p.p_brand = m.p_brand
                       AND p.p_retailprice = m.min_price
    WHERE p.p_size BETWEEN 10 AND 20
    ORDER BY p.p_brand, p.p_partkey
    """,
)
def q2_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery -> aggregate + join-back (argmin).
    (Reference Q2 finds the min-ps_supplycost supplier per part; no
    partsupp here, so the argmin runs per brand over p_retailprice.)
    The aggregate side is tiny (one row per brand) and broadcasts back
    onto the filtered scan — at 100 TB both sides read the same pushed
    p_size filter, so the scan happens twice but each is pruned; the
    equality join-back on the exact double avoids any float re-derive.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20))
    m = p.groupBy(F.col("p_brand").alias("m_brand")).agg(
        F.min("p_retailprice").alias("min_price"))
    return (
        p.join(F.broadcast(m),
               (F.col("p_brand") == F.col("m_brand"))
               & (F.col("p_retailprice") == F.col("min_price")))
        .select("p_brand", "p_partkey", "p_name",
                F.col("p_retailprice").alias("price"))
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "q9_type_profit",
    oracle="""
    SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y') AS o_year,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
               - CAST(p.p_retailprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))
                 * CAST(0.06 AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY 1, 2
    """,
)
def q9_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per year across a 5-way join.
    (ps_supplycost doesn't exist; cost is proxied as 6% of retailprice
    per unit, in exact decimal so partial-sum order can't change the
    result.) part/supplier/nation broadcast; the only shuffle is
    lineitem joining orders on orderkey, then the two-phase agg on the
    small (nation, year) grid. The p_type filter reaches the part scan
    and — via the broadcast join — prunes lineitem rows before the
    orderkey shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY")
         .select("p_partkey", "p_retailprice"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    amount = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
              - dec("p_retailprice") * dec("l_quantity")
                * F.lit(0.06).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(dsum_expr(amount).alias("profit"))
    )


@query(
    "q12_lateness_priority",
    oracle=f"""
    SELECT
      CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
           THEN 'late' ELSE 'ontime' END AS ship_bucket,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_ct,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_ct
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact⋈fact with a derived bucket + dual conditional
    counts. (l_shipmode doesn't exist; the bucket is shipdate lateness
    vs the order date.) One orderkey shuffle, then a two-row aggregate —
    the CASE arithmetic is all codegen; the year filter prunes the
    lineitem scan before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.when(late, "late").otherwise("ontime")
                 .alias("ship_bucket"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_ct"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_ct"))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer join + double aggregation (per-customer count,
    then the histogram of counts). (The o_comment NOT LIKE filter is
    re-based on orderpriority.) The filter sits in the JOIN CONDITION,
    not a WHERE — a WHERE would turn the left join inner and drop
    zero-order customers, the exact bug Q13 exists to catch. orders
    shuffles on custkey; the second agg is over |distinct counts| rows.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    co = (
        c.join(o, (F.col("o_custkey") == F.col("c_custkey"))
               & (F.col("o_orderpriority") != "4-NOT SPECIFIED"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count").agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view + scalar-max subquery + equality join-back
    (argmax, ties kept). Revenue accumulates in exact decimal so the
    max-equality join-back is deterministic in both engines — with
    doubles, partial-sum order could split a tie. The scalar max is a
    1-row broadcast cross join, not a driver collect.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    rev = (li.groupBy(F.col("l_suppkey").alias("suppkey"))
           .agg(F.sum(dec("l_extendedprice")
                      * (F.lit(1) - dec("l_discount"))).alias("total_rev")))
    # Materialize rev ONCE (r15): the scalar-max branch and the
    # join-back branch each rebuilt the full lineitem scan + supplier
    # aggregate (executed plan: two separate shuffle stages, lineitem
    # scanned twice, 0 ReusedExchange). rev is SUPPLIER-grain — ~1k
    # rows at sf0.1, dim-sized at any scale — so the checkpoint is
    # near-free while removing one full fact scan+agg. (Contrast q21,
    # where the same trick was a measured wash because its diamond is
    # order×supplier-grain — fact-sized; see OPTIMIZATION_r15.md.)
    # session.checkpoint: reliable checkpoint() on clusters that set
    # SPARK_GRAFT_CHECKPOINT_DIR, localCheckpoint locally (r16).
    rev = checkpoint(rev)
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: anti-join exclusion + COUNT(DISTINCT) per attribute
    group. (partsupp doesn't exist; lineitem serves as the part-supplier
    relation, and the complaint filter is re-based on negative acctbal.)
    The blacklist is a broadcast anti-join (its NOT IN has no NULLs by
    construction); the distinct-count runs as the two-shuffle expand
    Spark plans for it, both keyed on small attribute grids.
    """
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pq.cnt < pq.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-key average -> aggregate + join-back.
    The threshold l_quantity < 0.2 * avg(l_quantity) is evaluated as
    qty * 5 * cnt < sum_qty in EXACT decimal/integer arithmetic — a
    double avg would make the boundary engine-dependent. The per-part
    aggregate shuffles on partkey once and joins back on the same key
    (co-partitioned, no second shuffle of lineitem at scale); the brand
    filter prunes via the broadcast part join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#11").select("p_partkey"))
    pq = (li.groupBy(F.col("l_partkey").alias("pk"))
          .agg(F.sum(dec("l_quantity")).alias("sum_qty"),
               F.count("*").alias("cnt")))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pk"))
        .filter(dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7)
             .alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS line_ct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive multi-branch predicate spanning both join
    sides. The branch structure means neither side's filter is implied
    alone EXCEPT the union of brands / the quantity envelope — Catalyst
    derives exactly those (p_brand IN (...) onto the part scan,
    l_quantity range onto lineitem) before evaluating the full OR above
    the broadcast join; the pushed prefilters are what keep the probe
    side small at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(dsum_expr(revenue).alias("revenue"),
             F.count("*").alias("line_ct"))
    )


@query(
    "q21_sole_late_supplier",
    oracle=f"""
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate
                           + INTERVAL {LATE_DAYS} DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey, COUNT(*) AS supp_ct, SUM(is_late) AS late_ct
      FROM ol GROUP BY 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM ol
    JOIN per_order po ON po.l_orderkey = ol.l_orderkey
    JOIN supplier s ON s.s_suppkey = ol.l_suppkey
    WHERE ol.is_late = 1 AND po.supp_ct >= 2 AND po.late_ct = 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the EXISTS / NOT-EXISTS double correlation ("another
    supplier on the order exists; no OTHER supplier was late"),
    REFORMULATED as one aggregation: per (order, supplier) derive
    is_late, then per order count suppliers and late suppliers — a
    supplier qualifies iff it was late, the order has >= 2 suppliers,
    and exactly 1 late one. Semantically identical to the two correlated
    subqueries but one shuffle on orderkey instead of two extra
    self-joins — the Spark-first rewrite of this plan. (l_commitdate
    doesn't exist; late is shipdate vs orderdate + {LATE_DAYS}d.)
    """
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    # Explicit IsNotNull(l_suppkey) on the SHARED ol subtree (r16,
    # guide §2.4): the supplier-join branch pushes this predicate into
    # its lineitem scan anyway, but the per_order branch did not, so the
    # two ol subtrees never canonicalized equal and the lineitem⋈orders
    # join + partial aggregate ran TWICE (0 ReusedExchange). Hoisting
    # the same filter onto both branches lets AQE reuse the ol exchange
    # (final plan: ReusedExchange on hashpartitioning(l_orderkey,
    # l_suppkey); lineitem scanned once). Measured (noop min-of-3):
    # 1x cpu 5.17 -> 3.00 s, 10x cpu 21.3 -> 18.0 s. Result-identical:
    # l_suppkey is a join key of the final supplier join and the corpus
    # has zero null l_suppkey at every SF (a null would already have
    # been dropped from the final output; only per_order's supp_ct
    # could see one, and there are none to see).
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .filter(F.col("l_suppkey").isNotNull()))
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"))
    ol = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late")))
    per_order = (ol.groupBy(F.col("l_orderkey").alias("po_orderkey"))
                 .agg(F.count("*").alias("supp_ct"),
                      F.sum("is_late").alias("late_ct")))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ol.filter(F.col("is_late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("supp_ct") >= 2) & (F.col("late_ct") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total, COUNT(*) AS cnt
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9)
      AND CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.cnt > pos.total
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
    GROUP BY 1
    ORDER BY 1
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: global-average scalar subquery + anti-join ("rich
    customers gone quiet"). The average threshold is evaluated as
    acctbal * cnt > sum in exact decimal (a double average would make
    the boundary engine-dependent); the scalar aggregate is a 1-row
    broadcast; inactivity is a left-anti join against recent orders —
    the date filter prunes the orders scan, and only o_custkey is read.
    (c_phone country codes don't exist, so the cohort is a nationkey
    set; every test customer has SOME order, so "never ordered" is
    re-based to "no order since mid-2000" — same anti-join shape with a
    non-degenerate result.)
    """
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9)))
    pos = (c.filter(F.col("c_acctbal") > 0)
           .agg(F.sum(dec("c_acctbal")).alias("total"),
                F.count("*").alias("cnt")))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate")
                 >= F.lit("2000-07-01").cast("timestamp"))
         .select("o_custkey"))
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal") * F.col("cnt") > F.col("total"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


@query(
    "q20_dominant_supplier",
    oracle="""
    WITH psq AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_ps
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    pq AS (SELECT pk, SUM(qty_ps) AS qty_p FROM psq GROUP BY 1)
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT psq.sk FROM psq JOIN pq ON psq.pk = pq.pk
      WHERE psq.qty_ps * 2 > pq.qty_p
    )
    ORDER BY s.s_suppkey
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested aggregates feeding a semi-join chain ("suppliers
    holding excess stock" re-based to "suppliers who shipped > 50% of a
    part's 1997 volume" — partsupp doesn't exist). Both aggregates key
    on partkey, so the second one reuses the first's partitioning with
    no extra lineitem pass; the dominance comparison runs in exact
    decimal (qty*2 > total — no float boundary); the qualifying-supplier
    set reaches supplier as a left-semi join and nation broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    psq = (li.groupBy(F.col("l_partkey").alias("pk"),
                      F.col("l_suppkey").alias("sk"))
           .agg(F.sum(dec("l_quantity")).alias("qty_ps")))
    pq = psq.groupBy(F.col("pk").alias("p_pk")).agg(
        F.sum("qty_ps").alias("qty_p"))
    dominant = (psq.join(pq, F.col("pk") == F.col("p_pk"))
                .filter(F.col("qty_ps") * 2 > F.col("qty_p"))
                .select("sk").distinct())
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.sk, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q11_important_balance_share",
    oracle="""
    WITH tot AS (
      SELECT SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS grand FROM supplier
    )
    SELECT n.n_name,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS nation_balance
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey, tot
    GROUP BY n.n_name, tot.grand
    HAVING SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) * 20 > tot.grand
    ORDER BY nation_balance DESC, n_name
    """,
)
def q11_important_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped aggregate HAVING-compared against a global
    scalar aggregate ("nations holding > 5% of total supplier balance";
    partsupp value is re-based to s_acctbal). The scalar total is a
    1-row broadcast cross join; the share test runs in exact decimal
    (balance * 20 > grand — no float boundary); ordering is total-order
    (balance desc, name) so the result is deterministic.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    tot = s.agg(F.sum(dec("s_acctbal")).alias("grand"))
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(tot))
        .groupBy("n_name", "grand")
        .agg(F.sum(dec("s_acctbal")).alias("bal"))
        .filter(F.col("bal") * 20 > F.col("grand"))
        .select("n_name", F.col("bal").cast("double").alias("nation_balance"))
        .orderBy(F.desc("nation_balance"), "n_name")
    )


Q8_REGION = "AMERICA"       # customer region under analysis
Q8_NATION = "NATION_6"      # target supplier nation (in AMERICA)
Q8_TYPE = "ECONOMY"         # part segment


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT
        CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,
        CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{Q8_REGION}'
        AND p.p_type = '{Q8_TYPE}'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: two-level market share — the target nation's slice of
    revenue within a (customer-region, part-segment) market, per order
    year, as conditional-sum-over-sum.

    Plan: the customer→nation→region chain and the supplier→nation
    lookup are pure dim chains, prejoined driver-side into two small
    broadcast maps (cust_custkey→in-region flag after filtering, and
    suppkey→nation name), so the fact side never shuffles for
    enrichment. The only shuffles are lineitem⋈orders on orderkey
    (fact⋈fact, unavoidable) and the final tiny per-year aggregate.
    Filters (p_type, region, 2-year window) are all expressed on base
    tables for scan-time pruning; the region filter on customers prunes
    ~4/5 of the orders before the fact join. Share math follows the
    repo's money convention: exact DECIMAL sums, one double division at
    the boundary (reference analog: the ADS market-share mappers,
    gmall-publisher mapper layer; cousin shape ads_nation_market_share).
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n = load_table(spark, sf_dir, "nation")
    # Customers restricted to the region: broadcast semi-side (dim chain).
    c_in = (load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            .join(F.broadcast(n.join(F.broadcast(r),
                                     F.col("n_regionkey") == F.col("r_regionkey"))
                              .select("n_nationkey")),
                  F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
            .select("c_custkey"))
    # suppkey -> nation name (broadcast dim).
    s_nat = (load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
             .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                        F.col("n_name").alias("supp_nation"))),
                   F.col("s_nationkey") == F.col("sn_key"))
             .select("s_suppkey", "supp_nation"))
    p = (load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
         .select("p_partkey"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    target = F.when(F.col("supp_nation") == Q8_NATION, F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.join(F.broadcast(c_in), F.col("o_custkey") == F.col("c_custkey"),
                     "left_semi")
              .select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                volume.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(F.round(F.sum(target).cast("double")
                     / F.sum("volume").cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )
