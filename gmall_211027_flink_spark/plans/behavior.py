"""Behavior-sequence analytics over the events stream — windowed
funnel, sequence-match with negation, top-N + OTHERS rollup, and
audience-segment overlap.

Reference parity: the reference computes per-user behavior paths with
keyed Flink state / CEP (app/dwd/log/DwdTrafficUserJumpDetail.java:44-88
for the CEP pattern, app/dws/...UserUserLoginWindow.java for
login/back-flow per-user sequences) and ships funnel-style reports to
ClickHouse, where the classic analogs are windowFunnel() / sequenceMatch()
/ retention(). Here each is re-expressed as ONE pass of per-user window
functions over the event-time order — no CEP engine, no per-user loops.

The per-user total order is (epoch_second, event_id): running MAX over a
ROWS UNBOUNDED PRECEDING .. 1 PRECEDING frame gives "latest qualifying
event strictly earlier", which turns exists-a-chain questions into
running-state checks. The same frame spec is mirrored verbatim in the
DuckDB oracles, so cross-engine agreement doesn't hinge on tie
conventions. Scale shape: every query is one shuffle on user_id followed
by a per-user sort — the Flink-keyed-stream plan, minus the state
backend; greedy latest-anchor propagation is provably equivalent to the
exists-formulation (a later anchor only extends each deadline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import query

FUNNEL_WINDOW_S = 3600   # all funnel steps within 1h of the anchoring view


@query(
    "ads_window_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    x AS (
      SELECT *, MAX(CASE WHEN event_type = 'view' THEN es END) OVER (
        PARTITION BY user_id ORDER BY es, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      FROM e
    ),
    y AS (
      SELECT *, CASE WHEN event_type = 'click' AND lv IS NOT NULL
                      AND es - lv <= {FUNNEL_WINDOW_S} THEN lv END AS ca
      FROM x
    ),
    z AS (
      SELECT *, MAX(ca) OVER (
        PARTITION BY user_id ORDER BY es, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS am
      FROM y
    ),
    u AS (
      SELECT user_id,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
        MAX(CASE WHEN ca IS NOT NULL THEN 1 ELSE 0 END) AS l2,
        MAX(CASE WHEN event_type = 'purchase' AND am IS NOT NULL
                  AND es - am <= {FUNNEL_WINDOW_S} THEN 1 ELSE 0 END) AS l3
      FROM z GROUP BY 1
    )
    SELECT CAST(CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
                     WHEN l1 = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY 1
    """,
)
def ads_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel('view'->'click'->'purchase', 1h) analog:
    deepest funnel level per user where every step lands within
    FUNNEL_WINDOW_S of the anchoring view, then a level histogram.

    Greedy running-anchor argument: for a click c the only view worth
    keeping is the latest strictly-earlier one (earlier views only
    shrink the deadline), and for a purchase the best click-anchor is
    the max anchoring-view timestamp seen so far — so two running MAXes
    replace the exists-chain self-joins. One shuffle on user_id; both
    window passes share the same sort.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("es"))
    w_prev = (Window.partitionBy("user_id").orderBy("es", "event_id")
              .rowsBetween(Window.unboundedPreceding, -1))
    x = e.withColumn(
        "lv", F.max(F.when(F.col("event_type") == "view",
                           F.col("es"))).over(w_prev))
    y = x.withColumn(
        "ca", F.when((F.col("event_type") == "click")
                     & F.col("lv").isNotNull()
                     & (F.col("es") - F.col("lv") <= FUNNEL_WINDOW_S),
                     F.col("lv")))
    z = y.withColumn("am", F.max("ca").over(w_prev))
    u = z.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
         .alias("l1"),
        F.max(F.when(F.col("ca").isNotNull(), 1).otherwise(0)).alias("l2"),
        F.max(F.when((F.col("event_type") == "purchase")
                     & F.col("am").isNotNull()
                     & (F.col("es") - F.col("am") <= FUNNEL_WINDOW_S),
                     1).otherwise(0)).alias("l3"))
    level = (F.when(F.col("l3") == 1, 3).when(F.col("l2") == 1, 2)
             .when(F.col("l1") == 1, 1).otherwise(0))
    return (u.select(level.cast("bigint").alias("funnel_level"))
            .groupBy("funnel_level")
            .agg(F.count("*").cast("bigint").alias("n_users")))


@query(
    "ads_sequence_match_negation",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS idx
      FROM events
    ),
    x AS (
      SELECT *,
        MAX(CASE WHEN event_type = 'signup' THEN idx END) OVER (
          PARTITION BY user_id ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ls,
        MAX(CASE WHEN event_type = 'error' THEN idx END) OVER (
          PARTITION BY user_id ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS le
      FROM e
    )
    SELECT user_id,
      CAST(MAX(CASE WHEN event_type = 'purchase' AND ls IS NOT NULL
                     AND (le IS NULL OR le < ls)
                    THEN 1 ELSE 0 END) AS BIGINT) AS matched
    FROM x GROUP BY user_id
    """,
)
def ads_sequence_match_negation(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """sequenceMatch analog with negation: per user, does a
    signup -> purchase chain exist with NO error event between the two?

    Events are first given a per-user ordinal (so every comparison is
    on a tie-free total order); the running "latest signup ordinal" /
    "latest error ordinal" pair then makes the negation a single
    comparison: some signup -> purchase chain is error-free iff, at the
    purchase, latest_error < latest_signup (an error inside any EARLIER
    signup's chain also sits after that earlier signup, so checking the
    latest anchor suffices — this greedy/exists equivalence is
    brute-force-verified in tests/test_behavior.py). One shuffle on
    user_id; both window passes share the sort.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("es"))
    w_ord = Window.partitionBy("user_id").orderBy("es", "event_id")
    e = e.withColumn("idx", F.row_number().over(w_ord))
    w_prev = (Window.partitionBy("user_id").orderBy("idx")
              .rowsBetween(Window.unboundedPreceding, -1))
    x = e.select(
        "user_id", "event_type",
        F.max(F.when(F.col("event_type") == "signup", F.col("idx")))
         .over(w_prev).alias("ls"),
        F.max(F.when(F.col("event_type") == "error", F.col("idx")))
         .over(w_prev).alias("le"))
    hit = ((F.col("event_type") == "purchase") & F.col("ls").isNotNull()
           & (F.col("le").isNull() | (F.col("le") < F.col("ls"))))
    return (x.groupBy("user_id")
            .agg(F.max(F.when(hit, 1).otherwise(0)).cast("bigint")
                 .alias("matched")))


TOPN_N = 5


@query(
    "ads_topn_with_others",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue,
             COUNT(*) AS n_orders
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, n_name) AS rnk
      FROM rev
    )
    SELECT CASE WHEN rnk <= {TOPN_N} THEN n_name ELSE 'OTHERS' END
             AS nation_label,
           CAST(CASE WHEN rnk <= {TOPN_N} THEN rnk ELSE {TOPN_N} + 1 END
                AS BIGINT) AS rnk,
           CAST(SUM(revenue) AS DOUBLE) AS revenue,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM ranked
    GROUP BY 1, 2
    """,
)
def ads_topn_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N nations by order revenue with the long tail rolled into one
    OTHERS row — the standard reporting shape the reference ships to its
    ClickHouse ADS layer (e.g. app/ads province/keyword stats).

    Scale: revenue aggregates two-phase to nation grain first (25 rows),
    the rank + OTHERS rollup then run on the tiny aggregate; customer
    and nation dims broadcast into the orders scan. Revenue ties break
    on nation name so the cut is a total order.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (orders
           .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                 orders.o_custkey == F.col("c_custkey"))
           .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .alias("revenue"),
                F.count("*").alias("n_orders")))
    ranked = rev.withColumn(
        "rnk", F.row_number().over(
            Window.orderBy(F.desc("revenue"), F.col("n_name"))))
    label = F.when(F.col("rnk") <= TOPN_N,
                   F.col("n_name")).otherwise(F.lit("OTHERS"))
    rnk_out = (F.when(F.col("rnk") <= TOPN_N, F.col("rnk"))
               .otherwise(F.lit(TOPN_N + 1)))
    return (ranked
            .select(label.alias("nation_label"),
                    rnk_out.cast("bigint").alias("rnk"),
                    "revenue", "n_orders")
            .groupBy("nation_label", "rnk")
            .agg(F.sum("revenue").cast("double").alias("revenue"),
                 F.sum("n_orders").cast("bigint").alias("n_orders")))


@query(
    "ads_segment_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS ct FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           round(CAST(p.n_both AS DOUBLE)
                 / (sa.ct + sb.ct - p.n_both), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def ads_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-segment overlap matrix: for every pair of event types,
    how many users did both, and the Jaccard overlap of the two user
    sets (the bitmap-AND report ClickHouse builds with groupBitmapAnd).

    Scale: user sets dedup map-side to (user, type) pairs first — the
    self-join then carries <= |types| rows per user and the pair space
    is |types| choose 2, so the output is constant-size regardless of
    corpus scale. Segment sizes broadcast back onto the pair rows.
    """
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("ct"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (a.join(b, "user_id")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("n_both")))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("ct").alias("ct_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("ct").alias("ct_b"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .select("type_a", "type_b",
                    F.col("n_both").cast("bigint").alias("n_both"),
                    F.round(F.col("n_both").cast("double")
                            / (F.col("ct_a") + F.col("ct_b")
                               - F.col("n_both")), 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# Pre-purchase paths: the 2-step event-type path leading into each
# purchase (the "top converting paths" report next to the full markov
# transition matrix, ads_path_transition_matrix). Pure lag windows on
# the per-user ordinal — one shuffle, no self-joins; the path space is
# |types|^2 so the output is constant-size at any corpus scale.
# ---------------------------------------------------------------------------

@query(
    "ads_prepurchase_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id
      FROM events
    ),
    lagged AS (
      SELECT event_type,
             lag(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY es, event_id) AS prev1,
             lag(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY es, event_id) AS prev2
      FROM e
    )
    SELECT coalesce(prev2, 'START') || '>' || coalesce(prev1, 'START')
             || '>purchase' AS path,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM lagged WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def ads_prepurchase_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("es"))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    lagged = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"))
    path = F.concat_ws(
        ">",
        F.coalesce("prev2", F.lit("START")),
        F.coalesce("prev1", F.lit("START")),
        F.lit("purchase"))
    return (lagged.filter(F.col("event_type") == "purchase")
            .groupBy(path.alias("path"))
            .agg(F.count("*").cast("bigint").alias("n_purchases")))


# ---------------------------------------------------------------------------
# Hour-of-day x day-of-week traffic heatmap: the seasonality profile
# behind every ops dashboard (and the input to load-aware crawl
# scheduling). One two-phase count over derived calendar keys; the
# share denominator broadcasts back. Output is a constant 7x24 grid.
# ---------------------------------------------------------------------------

@query(
    "ads_hour_dow_heatmap",
    oracle="""
    WITH g AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hod,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS n_purchases
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_events) AS t FROM g)
    SELECT dow, hod, CAST(n_events AS BIGINT) AS n_events, n_purchases,
           round(CAST(n_events AS DOUBLE) / tot.t, 6) AS traffic_share
    FROM g CROSS JOIN tot
    """,
)
def ads_hour_dow_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # dow convention: Spark dayofweek is 1=Sunday..7=Saturday, DuckDB's
    # is 0=Sunday..6=Saturday — subtract 1 here to align on DuckDB's.
    g = (ev.groupBy(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hod"))
         .agg(F.count("*").alias("n_events"),
              F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).cast("bigint").alias("n_purchases")))
    tot = g.agg(F.sum("n_events").alias("t"))
    return (g.crossJoin(F.broadcast(tot))
            .select("dow", "hod",
                    F.col("n_events").cast("bigint").alias("n_events"),
                    "n_purchases",
                    F.round(F.col("n_events").cast("double")
                            / F.col("t"), 6).alias("traffic_share")))


# ---------------------------------------------------------------------------
# RFM customer segmentation: quartile scores on recency / frequency /
# monetary, the classic CRM grid (the reference's publisher layer
# computes per-customer trade stats; RFM is the standard roll-up over
# them). Quartiles are exact ntile over a (metric, custkey) total
# order — deterministic cross-engine; at 100 TB the ntile boundaries
# come from approx_percentile instead (same audit posture as
# stats_histogram_equi_depth).
# ---------------------------------------------------------------------------

@query(
    "ads_rfm_segmentation",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey,
        ntile(4) OVER (ORDER BY recency, o_custkey) AS r_score,
        ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
        ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
        monetary
      FROM per_cust
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def ads_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").cast("bigint").alias("frequency"),
                     F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .cast("decimal(38,2)").alias("monetary")))
    return rfm_readout(per_cust)


def rfm_readout(per_cust: DataFrame) -> DataFrame:
    """RFM segment grid from a per-customer (o_custkey, last_order,
    frequency, monetary) base — the ONE readout shape shared by the
    batch query above and the streaming store drain
    (streaming/windows.py stream_rfm_maintenance), the
    seasonal_mk_readout device (r14) applied to the CUSTOMER-grain
    store family the Cochran twin opened: every base column is
    mergeable (max / sum / sum), so the store commits O(batch) per
    micro-batch and holds exactly one row per customer.  Recency is
    recomputed at read time against the base's own global max order
    date (the max of per-customer maxes IS the table max), so the
    readout needs no side input."""
    maxd = per_cust.agg(F.max("last_order").alias("maxd"))
    scored_base = (per_cust.crossJoin(F.broadcast(maxd))
                   .select("o_custkey", "frequency", "monetary",
                           F.datediff("maxd", "last_order")
                           .alias("recency")))
    scored = scored_base.select(
        "o_custkey", "monetary",
        F.ntile(4).over(Window.orderBy("recency", "o_custkey"))
         .alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "o_custkey"))
         .alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "o_custkey"))
         .alias("m_score"))
    return (scored.groupBy(
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"))
        .agg(F.count("*").cast("bigint").alias("n_customers"),
             F.sum("monetary").cast("double").alias("segment_monetary")))


# ---------------------------------------------------------------------------
# Error-burst detection: 10-minute windows whose global error count is
# >= 2x the mean over active windows — the alerting shape the
# reference's ops side would sink to ClickHouse. One two-phase count on
# the window bucket; the mean rides back as a broadcast scalar, so the
# burst verdict is a map-side comparison of an exact count against one
# double threshold computed identically in both engines.
# ---------------------------------------------------------------------------

@query(
    "dwd_error_burst_windows",
    oracle="""
    WITH wins AS (
      SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS b600,
             COUNT(*) AS error_ct
      FROM events WHERE event_type = 'error'
      GROUP BY 1
    ),
    m AS (SELECT SUM(error_ct) AS tot, COUNT(*) AS n_wins FROM wins)
    SELECT w.b600, CAST(w.error_ct AS BIGINT) AS error_ct,
           round(CAST(m.tot AS DOUBLE) / m.n_wins, 6) AS mean_ct,
           w.error_ct >= 2 * (CAST(m.tot AS DOUBLE) / m.n_wins) AS is_burst
    FROM wins w CROSS JOIN m
    """,
)
def dwd_error_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wins = (ev.filter(F.col("event_type") == "error")
            .groupBy((F.floor(F.unix_timestamp("ts") / 600)).cast("bigint")
                     .alias("b600"))
            .agg(F.count("*").alias("error_ct")))
    m = wins.agg(F.sum("error_ct").alias("tot"),
                 F.count("*").alias("n_wins"))
    mean = F.col("tot").cast("double") / F.col("n_wins")
    return (wins.crossJoin(F.broadcast(m))
            .select("b600",
                    F.col("error_ct").cast("bigint").alias("error_ct"),
                    F.round(mean, 6).alias("mean_ct"),
                    (F.col("error_ct") >= 2 * mean).alias("is_burst")))


# ---------------------------------------------------------------------------
# Last-touch attribution: every purchase is credited to the user's most
# recent NON-purchase event within ATTR_WINDOW_S before it (else
# 'direct') — the marketing-attribution fold ClickHouse sites express
# with argMax over a sessionized stream. One user-keyed shuffle + one
# shared window sort (the behavior-family plan shape); both the touch
# TYPE and its TIME come from the same IGNORE-NULLS running last_value
# over the same frame, so the two reads can't diverge.
# ---------------------------------------------------------------------------

ATTR_WINDOW_S = 3600


@query(
    "ads_last_touch_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER w
               AS lt_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN epoch_us(ts) END IGNORE NULLS) OVER w
               AS lt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    attributed AS (
      SELECT CASE WHEN lt_us IS NOT NULL
                   AND us - lt_us <= CAST({ATTR_WINDOW_S} AS BIGINT)
                                     * 1000000
                  THEN lt_type ELSE 'direct' END AS touch_type
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6)
             AS share
    FROM attributed GROUP BY 1
    """,
)
def ads_last_touch_attribution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.last(F.when(F.col("event_type") != "purchase",
                      F.col("event_type")), ignorenulls=True)
         .over(w).alias("lt_type"),
        F.last(F.when(F.col("event_type") != "purchase", us),
               ignorenulls=True).over(w).alias("lt_us"))
    touch = F.when(
        F.col("lt_us").isNotNull()
        & (F.col("us") - F.col("lt_us") <= ATTR_WINDOW_S * 1_000_000),
        F.col("lt_type")).otherwise("direct")
    attributed = (seq.filter(F.col("event_type") == "purchase")
                  .select(touch.alias("touch_type")))
    w_all = Window.partitionBy(F.lit(1))
    return (attributed.groupBy("touch_type")
            .agg(F.count("*").cast("bigint").alias("n_purchases"))
            .withColumn("share", F.round(
                F.col("n_purchases").cast("double")
                / F.sum("n_purchases").over(w_all), 6)))


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution: the companion to
# last-touch above — each purchase's credit is split 40% to the FIRST
# touch in the window, 40% to the LAST, and 20% evenly across the
# middles (1 touch → 100%, 2 touches → 50/50, none → 'direct').
# Plan: an interval join (user equi-key + time-range conjunct, the J5
# shape — never a cross join), one per-purchase window rank, then a
# map-side credit expression. Determinism: the middle share
# 0.2/(n-2) is rounded to 6dp per credit BEFORE the DECIMAL(38,6)
# sum, so cross-engine accumulation order can't matter.
# ---------------------------------------------------------------------------

@query(
    "ads_position_attribution",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS tid, event_type, epoch_us(ts) AS tus
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT p.pid, t.event_type, t.tus, t.tid
      FROM p JOIN t ON p.user_id = t.user_id
                   AND t.tus < p.pus
                   AND t.tus >= p.pus - CAST({ATTR_WINDOW_S} AS BIGINT)
                                        * 1000000
    ),
    r AS (
      SELECT pid, event_type,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tus, tid) AS rk,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM j
    ),
    credited AS (
      SELECT event_type AS touch_type,
             CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                  WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                  WHEN rk = 1 OR rk = n THEN CAST(0.4 AS DOUBLE)
                  ELSE round(CAST(0.2 AS DOUBLE) / (n - 2), 6) END AS credit
      FROM r
    ),
    direct AS (
      SELECT 'direct' AS touch_type, CAST(1.0 AS DOUBLE) AS credit
      FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid)
    ),
    allc AS (SELECT * FROM credited UNION ALL SELECT * FROM direct)
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(CAST(round(credit, 6) AS DECIMAL(38,6))) AS DOUBLE)
             AS total_credit
    FROM allc GROUP BY 1
    """,
)
def ads_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("pid"),
                 us.alias("pus")))
    t = (ev.filter(F.col("event_type") != "purchase")
         .select(F.col("user_id").alias("t_user"),
                 F.col("event_id").alias("tid"), "event_type",
                 us.alias("tus")))
    j = p.join(t, (F.col("user_id") == F.col("t_user"))
               & (F.col("tus") < F.col("pus"))
               & (F.col("tus") >= F.col("pus")
                  - ATTR_WINDOW_S * 1_000_000))
    wr = Window.partitionBy("pid").orderBy("tus", "tid")
    wn = Window.partitionBy("pid")
    r = j.select("pid", "event_type",
                 F.row_number().over(wr).alias("rk"),
                 F.count("*").over(wn).alias("n"))
    credit = (F.when(F.col("n") == 1, F.lit(1.0))
              .when(F.col("n") == 2, F.lit(0.5))
              .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")),
                    F.lit(0.4))
              .otherwise(F.round(F.lit(0.2) / (F.col("n") - 2), 6)))
    credited = r.select(F.col("event_type").alias("touch_type"),
                        credit.alias("credit"))
    direct = (p.join(j.select("pid").distinct(), "pid", "left_anti")
              .select(F.lit("direct").alias("touch_type"),
                      F.lit(1.0).alias("credit")))
    return (credited.unionByName(direct)
            .groupBy("touch_type")
            .agg(F.count("*").cast("bigint").alias("n_credits"),
                 F.sum(F.round("credit", 6).cast("decimal(38,6)"))
                  .cast("double").alias("total_credit")))


# ---------------------------------------------------------------------------
# Time-decay attribution — third member of the attribution family
# (last-touch r6, position/U-shape r7): each pre-purchase touch gets
# weight 0.5^(age / half-life) and credits are normalized per purchase,
# so recent touches dominate smoothly instead of by cliff. Same plan
# shape as position attribution (one user-keyed interval join, pid-
# keyed windows); the only new math is the pow(), which both engines
# compute from the SAME expression text. Per-purchase normalization
# uses the repo's round-then-DECIMAL-sum convention so the window
# denominator is partition-order-proof.
# ---------------------------------------------------------------------------

DECAY_HALFLIFE_S = 900      # 15 min half-life inside the 1 h window


@query(
    "ads_time_decay_attribution",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS tid, event_type, epoch_us(ts) AS tus
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT p.pid, t.event_type, t.tid,
             CAST(round(
               pow(0.5, (p.pus - t.tus)
                        / ({DECAY_HALFLIFE_S} * 1000000.0)), 6)
               AS DECIMAL(38,6)) AS w
      FROM p JOIN t ON p.user_id = t.user_id
                   AND t.tus < p.pus
                   AND t.tus >= p.pus - CAST({ATTR_WINDOW_S} AS BIGINT)
                                        * 1000000
    ),
    norm AS (
      SELECT pid, event_type,
             round(CAST(w AS DOUBLE)
                   / CAST(SUM(w) OVER (PARTITION BY pid) AS DOUBLE), 6)
               AS credit
      FROM j
    ),
    direct AS (
      SELECT 'direct' AS touch_type, CAST(1.0 AS DOUBLE) AS credit
      FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid)
    ),
    allc AS (
      SELECT event_type AS touch_type, credit FROM norm
      UNION ALL SELECT * FROM direct
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(CAST(credit AS DECIMAL(38,6))) AS DOUBLE)
             AS total_credit
    FROM allc GROUP BY 1
    """,
)
def ads_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("pid"),
                 us.alias("pus")))
    t = (ev.filter(F.col("event_type") != "purchase")
         .select(F.col("user_id").alias("t_user"),
                 F.col("event_id").alias("tid"), "event_type",
                 us.alias("tus")))
    w = F.round(
        F.pow(F.lit(0.5), (F.col("pus") - F.col("tus"))
              / (DECAY_HALFLIFE_S * 1_000_000.0)), 6).cast("decimal(38,6)")
    j = (p.join(t, (F.col("user_id") == F.col("t_user"))
                & (F.col("tus") < F.col("pus"))
                & (F.col("tus") >= F.col("pus")
                   - ATTR_WINDOW_S * 1_000_000))
         .select("pid", "event_type", "tid", w.alias("w")))
    wn = Window.partitionBy("pid")
    norm = j.select(
        F.col("event_type").alias("touch_type"),
        F.round(F.col("w").cast("double")
                / F.sum("w").over(wn).cast("double"), 6).alias("credit"))
    direct = (p.join(j.select("pid").distinct(), "pid", "left_anti")
              .select(F.lit("direct").alias("touch_type"),
                      F.lit(1.0).alias("credit")))
    return (norm.unionByName(direct)
            .groupBy("touch_type")
            .agg(F.count("*").cast("bigint").alias("n_credits"),
                 F.sum(F.col("credit").cast("decimal(38,6)"))
                  .cast("double").alias("total_credit")))


# ---------------------------------------------------------------------------
# Markov-chain REMOVAL-EFFECT attribution (Anderl et al. 2014) — the
# model-based companion to the last-touch / position / time-decay
# heuristics above: build the first-order Markov chain over each
# user's touch journey (START -> touches -> CONV at first purchase,
# or -> LOST), then credit each channel by how much the chain's
# K-step conversion probability DROPS when that channel is removed
# (all transitions into it redirected to LOST).
#
# The metric is defined as the K=MARKOV_STEPS-step conversion
# probability (fixed horizon, like kmeans' fixed iterations — a
# convergence test could flip on cross-engine drift); journeys here
# are far shorter than K, so the horizon is not a practical truncation.
#
# Scale shape: journey -> transition extraction is ONE user-keyed
# shuffle + a lag window; everything after runs on the
# constant-size transition table — and all removal variants iterate
# JOINTLY (state space = variant x state, one join per step, K total
# tiny jobs) instead of one chain per channel. Determinism: transition
# probabilities are 9-dp DECIMAL; each step is an exact decimal
# mat-vec re-rounded to 9 dp — the PCA/power-iteration discipline.
# ---------------------------------------------------------------------------

MARKOV_STEPS = 8
MARKOV_CHANNELS = ("click", "error", "signup", "view")


def _markov_transitions_sql() -> str:
    """CTE fragment producing (src, dst) transition pairs per journey:
    each user's events up to and including the FIRST purchase
    ((eus, event_id)-lexicographic cut), purchase mapped to CONV,
    non-converting journeys closed with a -> LOST edge."""
    return """
    ev AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS eus
      FROM events
    ),
    firstp AS (
      SELECT user_id, eus AS pus, event_id AS pid,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY eus, event_id) AS rk
      FROM ev WHERE event_type = 'purchase'
    ),
    cut AS (SELECT user_id, pus, pid FROM firstp WHERE rk = 1),
    journey AS (
      SELECT e.user_id,
             CASE WHEN e.event_type = 'purchase' THEN 'CONV'
                  ELSE e.event_type END AS st,
             e.eus, e.event_id,
             c.pid IS NOT NULL AS converts
      FROM ev e LEFT JOIN cut c USING (user_id)
      WHERE c.pid IS NULL
         OR e.eus < c.pus OR (e.eus = c.pus AND e.event_id <= c.pid)
    ),
    steps AS (
      SELECT user_id, converts, st,
             COALESCE(LAG(st) OVER (PARTITION BY user_id
                                    ORDER BY eus, event_id),
                      'START') AS prev,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY eus DESC, event_id DESC) AS rev
      FROM journey
    ),
    trans_raw AS (
      SELECT prev AS src, st AS dst FROM steps
      UNION ALL
      SELECT st AS src, 'LOST' AS dst
      FROM steps WHERE rev = 1 AND NOT converts
    )"""


def _markov_oracle() -> str:
    variants = ", ".join(
        ["('full', '')"] + [f"('-{c}', '{c}')" for c in MARKOV_CHANNELS])
    rounds = []
    for it in range(1, MARKOV_STEPS + 1):
        prev = f"p{it - 1}"
        rounds.append(f"""
    p{it} AS MATERIALIZED (
      SELECT t.variant, t.src AS st,
             CAST(round(CAST(SUM(t.p * q.p) AS DOUBLE), 9)
                  AS DECIMAL(12,9)) AS p
      FROM tv t JOIN {prev} q
        ON q.variant = t.variant AND q.st = t.dst
      GROUP BY 1, 2
      UNION ALL
      SELECT variant, 'CONV', CAST(1 AS DECIMAL(12,9)) FROM vlist
      UNION ALL
      SELECT variant, 'LOST', CAST(0 AS DECIMAL(12,9)) FROM vlist
    )""")
    return f"""
    WITH {_markov_transitions_sql()},
    counts AS (
      SELECT src, dst, COUNT(*) AS c FROM trans_raw GROUP BY 1, 2
    ),
    probs AS (
      SELECT src, dst,
             CAST(round(CAST(c AS DOUBLE)
                        / SUM(c) OVER (PARTITION BY src), 9)
                  AS DECIMAL(10,9)) AS p
      FROM counts
    ),
    vlist(variant, removed) AS (VALUES {variants}),
    tv AS MATERIALIZED (
      SELECT v.variant, src,
             CASE WHEN dst = v.removed THEN 'LOST' ELSE dst END AS dst,
             CAST(SUM(p) AS DECIMAL(12,9)) AS p
      FROM probs, vlist v
      GROUP BY 1, 2, 3
    ),
    p0 AS (
      SELECT variant, 'CONV' AS st, CAST(1 AS DECIMAL(12,9)) AS p
      FROM vlist
    ),
    {','.join(rounds)},
    pconv AS MATERIALIZED (
      SELECT variant, CAST(p AS DOUBLE) AS pc
      FROM p{MARKOV_STEPS} WHERE st = 'START'
    ),
    eff AS (
      SELECT substr(v.variant, 2) AS channel,
             round(f.pc, 6) AS p_conv_full,
             round(f.pc - v.pc, 6) AS removal_effect
      FROM pconv v, pconv f
      WHERE f.variant = 'full' AND v.variant <> 'full'
    )
    SELECT channel, p_conv_full, removal_effect,
           round(removal_effect
                 / NULLIF(SUM(removal_effect) OVER (), 0), 6) AS share
    FROM eff ORDER BY channel
    """


@query("ads_markov_attribution", oracle=_markov_oracle())
def ads_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over the first-order journey chain:
    per channel, the drop in {MARKOV_STEPS}-step conversion probability
    when the channel's inbound transitions are redirected to LOST."""
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_id", "event_type",
                  F.unix_micros(F.col("ts")).cast("bigint").alias("eus")))
    wp = Window.partitionBy("user_id").orderBy("eus", "event_id")
    firstp = (ev.filter(F.col("event_type") == "purchase")
              .withColumn("rk", F.row_number().over(wp))
              .filter(F.col("rk") == 1)
              .select("user_id", F.col("eus").alias("pus"),
                      F.col("event_id").alias("pid")))
    journey = (ev.join(firstp, "user_id", "left")
               .filter(F.col("pid").isNull()
                       | (F.col("eus") < F.col("pus"))
                       | ((F.col("eus") == F.col("pus"))
                          & (F.col("event_id") <= F.col("pid"))))
               .select("user_id", "eus", "event_id",
                       F.when(F.col("event_type") == "purchase", "CONV")
                       .otherwise(F.col("event_type")).alias("st"),
                       F.col("pid").isNotNull().alias("converts")))
    wrev = Window.partitionBy("user_id").orderBy(
        F.desc("eus"), F.desc("event_id"))
    steps = journey.select(
        "converts", "st",
        F.coalesce(F.lag("st").over(wp), F.lit("START")).alias("prev"),
        F.row_number().over(wrev).alias("rev"))
    trans_raw = (steps.select(F.col("prev").alias("src"),
                              F.col("st").alias("dst"))
                 .unionByName(
                     steps.filter((F.col("rev") == 1) & ~F.col("converts"))
                     .select(F.col("st").alias("src"),
                             F.lit("LOST").alias("dst"))))
    counts = trans_raw.groupBy("src", "dst").agg(F.count("*").alias("c"))
    wsrc = Window.partitionBy("src")
    probs = counts.select(
        "src", "dst",
        F.round(F.col("c").cast("double") / F.sum("c").over(wsrc), 9)
        .cast("decimal(10,9)").alias("p"))
    vlist = spark.createDataFrame(
        [("full", "")] + [(f"-{c}", c) for c in MARKOV_CHANNELS],
        "variant string, removed string")
    tv = (probs.crossJoin(F.broadcast(vlist))
          .groupBy("variant", "src",
                   F.when(F.col("dst") == F.col("removed"), "LOST")
                   .otherwise(F.col("dst")).alias("dst"))
          .agg(F.sum("p").cast("decimal(12,9)").alias("p"))
          .localCheckpoint(eager=False))       # reused every step
    p = vlist.select("variant", F.lit("CONV").alias("st"),
                     F.lit(1).cast("decimal(12,9)").alias("p"))
    fixed = (vlist.select("variant", F.lit("CONV").alias("st"),
                          F.lit(1).cast("decimal(12,9)").alias("p"))
             .unionByName(vlist.select(
                 "variant", F.lit("LOST").alias("st"),
                 F.lit(0).cast("decimal(12,9)").alias("p"))))
    for _ in range(MARKOV_STEPS):
        vec = (p.withColumnRenamed("st", "dst")
               .withColumnRenamed("p", "pv"))
        stepped = (tv.join(F.broadcast(vec), ["variant", "dst"])
                   .groupBy("variant", F.col("src").alias("st"))
                   .agg(F.round(F.sum(F.col("p") * F.col("pv"))
                                .cast("double"), 9)
                        .cast("decimal(12,9)").alias("p")))
        p = stepped.unionByName(fixed).localCheckpoint(eager=False)
    pconv = (p.filter(F.col("st") == "START")
             .select("variant", F.col("p").cast("double").alias("pc")))
    full = (pconv.filter(F.col("variant") == "full")
            .select(F.col("pc").alias("pc_full")))
    eff = (pconv.filter(F.col("variant") != "full")
           .crossJoin(F.broadcast(full))
           .select(F.expr("substr(variant, 2)").alias("channel"),
                   F.round("pc_full", 6).alias("p_conv_full"),
                   F.round(F.col("pc_full") - F.col("pc"), 6)
                   .alias("removal_effect")))
    wall = Window.partitionBy(F.lit(1))
    return (eff.select(
        "channel", "p_conv_full", "removal_effect",
        F.round(F.col("removal_effect")
                / F.nullif(F.sum("removal_effect").over(wall),
                           F.lit(0.0)), 6).alias("share"))
        .orderBy("channel"))


# ---------------------------------------------------------------------------
# Cohort LTV curve: users cohorted by FIRST-SIGNUP week; for each
# cohort and account-age week, cumulative revenue per cohort user —
# the triangle table behind every retention-revenue dashboard, and the
# natural revenue extension of ads_cohort_retention. Plan: one
# user-keyed shuffle finds each user's cohort anchor; purchases join
# back on the user key (J-shape, equi-join); the cumulative sum runs
# per cohort over WEEK GRAIN (bounded domain) — never over raw events.
# Revenue sums are DECIMAL; per-user normalization is one 6-dp divide.
# ---------------------------------------------------------------------------

LTV_MAX_WEEK = 8


@query(
    "ads_cohort_ltv_curve",
    oracle=f"""
    WITH anchor AS (
      -- NB: DuckDB's // on DOUBLE is plain division (epoch() returns
      -- DOUBLE) — day/week grains need explicit floor+cast
      SELECT user_id,
             MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d0
      FROM events WHERE event_type = 'signup'
      GROUP BY 1
    ),
    cohort_size AS (
      SELECT d0 // 7 AS cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM anchor GROUP BY 1
    ),
    rev AS (
      SELECT a.d0 // 7 AS cohort_week,
             (CAST(floor(epoch(e.ts) / 86400) AS BIGINT) - a.d0) // 7
               AS age_week,
             SUM(CAST(e.value AS DECIMAL(18,2))) AS wk_rev
      FROM events e JOIN anchor a USING (user_id)
      WHERE e.event_type = 'purchase'
        AND CAST(floor(epoch(e.ts) / 86400) AS BIGINT) >= a.d0
        AND (CAST(floor(epoch(e.ts) / 86400) AS BIGINT) - a.d0) // 7
            <= {LTV_MAX_WEEK}
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_week,
             CAST(SUM(wk_rev) OVER (
               PARTITION BY cohort_week ORDER BY age_week
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
      FROM rev
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(c.age_week AS BIGINT) AS age_week,
           s.n_users,
           round(c.cum_rev, 2) AS cum_revenue,
           round(c.cum_rev / s.n_users, 6) AS ltv_per_user
    FROM cum c JOIN cohort_size s USING (cohort_week)
    ORDER BY 1, 2
    """,
)
def ads_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per cohort user by signup-cohort week and
    account-age week (capped at {LTV_MAX_WEEK} weeks)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("div(unix_timestamp(ts), 86400)")
    anchor = (ev.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min(day).alias("d0")))
    cohort_size = (anchor.groupBy(F.expr("div(d0, 7)").alias("cohort_week"))
                   .agg(F.count("*").cast("bigint").alias("n_users")))
    rev = (ev.filter(F.col("event_type") == "purchase")
           .join(anchor, "user_id")
           .withColumn("eday", day)
           .filter(F.col("eday") >= F.col("d0"))
           .withColumn("age_week", F.expr("div(eday - d0, 7)"))
           .filter(F.col("age_week") <= LTV_MAX_WEEK)
           .groupBy(F.expr("div(d0, 7)").alias("cohort_week"), "age_week")
           .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                .alias("wk_rev")))
    wcum = (Window.partitionBy("cohort_week").orderBy("age_week")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = rev.withColumn("cum_rev", F.sum("wk_rev").over(wcum)
                         .cast("double"))
    return (cum.join(cohort_size, "cohort_week")
            .select(F.col("cohort_week").cast("bigint").alias("cohort_week"),
                    F.col("age_week").cast("bigint").alias("age_week"),
                    "n_users",
                    F.round("cum_rev", 2).alias("cum_revenue"),
                    F.round(F.col("cum_rev") / F.col("n_users"), 6)
                    .alias("ltv_per_user"))
            .orderBy("cohort_week", "age_week"))


# ---------------------------------------------------------------------------
# Shapley-value attribution (r9) — the game-theoretic companion to the
# Markov removal-effect model above (Shapley 1953; applied to marketing
# attribution e.g. in Zhao et al. 2018): treat the channel set
# N = {click, error, signup, view} as players, define the coalition
# value v(S) = number of CONVERTING users whose pre-purchase touch set
# is contained in S ("conversions reachable with only S available"),
# and pay each channel its Shapley value
#   phi_i = sum_{S subseteq N\{i}} |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)).
#
# EXACT INTEGER ARITHMETIC: with n = 4 channels every Shapley weight
# has denominator 4! = 24, so phi * 24 is an integer — computed and
# compared as BIGINT (phi itself is reported as one 6-dp round of the
# same integer / 24.0). Efficiency axiom (sum phi = v(N) - v(empty))
# is asserted by a pytest invariant.
#
# Scale shape: ONE user-grain shuffle reduces the corpus to a 16-row
# mask-count table (touch set as a 4-bit mask); the entire coalition
# lattice — 16 coalitions x 16 masks subset-sum, then 4 x 8 marginal
# terms — lives on constant-size frames (broadcast joins; nothing
# corpus-sized ever touches the lattice math). At 100 TB only the
# first aggregation grows.
# ---------------------------------------------------------------------------

SHAPLEY_CHANNELS = ("click", "error", "signup", "view")   # bit 1,2,4,8


@query(
    "ads_shapley_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS eus
      FROM events
    ),
    firstp AS (
      SELECT user_id, eus AS pus, event_id AS pid,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY eus, event_id) AS rk
      FROM ev WHERE event_type = 'purchase'
    ),
    cut AS (SELECT user_id, pus, pid FROM firstp WHERE rk = 1),
    touched AS (
      SELECT e.user_id,
             CAST(COALESCE(SUM(DISTINCT
               CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                                 WHEN 'signup' THEN 4 WHEN 'view' THEN 8
               END), 0) AS BIGINT) AS mask
      FROM cut c JOIN ev e USING (user_id)
      WHERE e.event_type IN ('click', 'error', 'signup', 'view')
        AND (e.eus < c.pus OR (e.eus = c.pus AND e.event_id < c.pid))
      GROUP BY 1
    ),
    -- converters with zero prior touches fall out of `touched`'s join
    -- input rows; re-add them as mask 0 via the cut anti-join
    mask_cnt AS (
      SELECT m.mask, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT c.user_id, COALESCE(t.mask, 0) AS mask
            FROM cut c LEFT JOIN touched t USING (user_id)) m
      GROUP BY 1
    ),
    coalition AS (
      SELECT s.s, CAST(COALESCE(SUM(mc.cnt), 0) AS BIGINT) AS v
      FROM UNNEST(generate_series(0, 15)) AS s(s)
           LEFT JOIN mask_cnt mc ON (mc.mask & ~s.s) = 0
      GROUP BY 1
    ),
    chan AS (
      SELECT * FROM (VALUES ('click', 1), ('error', 2),
                            ('signup', 4), ('view', 8)) AS t(channel, bit)
    ),
    marginal AS (
      SELECT ch.channel,
             CASE bit_count(CAST(co.s AS BIGINT))
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6
             END * (cw.v - co.v) AS term
      FROM chan ch
           JOIN coalition co ON (co.s & ch.bit) = 0
           JOIN coalition cw ON cw.s = co.s + ch.bit
    )
    SELECT m.channel,
           CAST(SUM(m.term) AS BIGINT) AS phi_x24,
           round(CAST(SUM(m.term) AS DOUBLE) / 24.0, 6) AS phi,
           (SELECT v FROM coalition WHERE s = 15) AS v_full,
           (SELECT v FROM coalition WHERE s = 0) AS v_empty
    FROM marginal m GROUP BY 1 ORDER BY 1
    """,
)
def ads_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Shapley attribution over the 4-channel coalition
    lattice (see block comment)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("CAST(unix_micros(ts) AS BIGINT)").alias("eus"))
    wrk = Window.partitionBy("user_id").orderBy("eus", "event_id")
    cut = (ev.filter(F.col("event_type") == "purchase")
           .withColumn("rk", F.row_number().over(wrk))
           .filter(F.col("rk") == 1)
           .select("user_id", F.col("eus").alias("pus"),
                   F.col("event_id").alias("pid")))
    bit = (F.when(F.col("event_type") == "click", 1)
           .when(F.col("event_type") == "error", 2)
           .when(F.col("event_type") == "signup", 4)
           .when(F.col("event_type") == "view", 8))
    touched = (cut.join(ev, "user_id")
               .filter(F.col("event_type").isin(*SHAPLEY_CHANNELS))
               .filter((F.col("eus") < F.col("pus"))
                       | ((F.col("eus") == F.col("pus"))
                          & (F.col("event_id") < F.col("pid"))))
               .select("user_id", bit.alias("bit")).distinct()
               .groupBy("user_id")
               .agg(F.sum("bit").cast("bigint").alias("mask")))
    mask_cnt = (cut.join(touched, "user_id", "left")
                .select(F.coalesce("mask", F.lit(0)).alias("mask"))
                .groupBy("mask")
                .agg(F.count("*").cast("bigint").alias("cnt")))
    sets = spark.range(16).select(F.col("id").alias("s"))
    coalition = (sets.join(
        F.broadcast(mask_cnt),
        F.expr("(mask & ~s) = 0"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("v")))
    chan = spark.createDataFrame(
        [(c, 1 << i) for i, c in enumerate(SHAPLEY_CHANNELS)],
        "channel string, bit int")
    weight = (F.when(F.expr("bit_count(s)") == 0, 6)
              .when(F.expr("bit_count(s)") == 1, 2)
              .when(F.expr("bit_count(s)") == 2, 2).otherwise(6))
    co = coalition.localCheckpoint(eager=False)
    marginal = (F.broadcast(chan)
                .join(F.broadcast(co), F.expr("(s & bit) = 0"))
                .join(F.broadcast(co.select(F.col("s").alias("s2"),
                                            F.col("v").alias("v2"))),
                      F.expr("s2 = s + bit"))
                .select("channel",
                        (weight * (F.col("v2") - F.col("v"))).alias("term")))
    v_full = co.filter("s = 15").select(F.col("v").alias("v_full"))
    v_empty = co.filter("s = 0").select(F.col("v").alias("v_empty"))
    return (marginal.groupBy("channel")
            .agg(F.sum("term").cast("bigint").alias("phi_x24"),
                 F.round(F.sum("term").cast("double") / 24.0, 6)
                 .alias("phi"))
            .crossJoin(F.broadcast(v_full))
            .crossJoin(F.broadcast(v_empty))
            .orderBy("channel"))


# ---------------------------------------------------------------------------
# Difference-in-differences lift (r9) — Card & Krueger 1994 made it
# the workhorse: the causal-reading companion to the attribution
# family above. Treatment group = BUILDING-segment customers, control
# = everyone else; periods split at the corpus's midpoint date; the
# DiD estimate is the treatment group's change in per-customer revenue
# minus the control group's change — the number an experiment
# readout quotes when randomization wasn't available.
#
# Exactness: revenue per (group, period) is an exact DECIMAL(18,2)
# sum; customer counts are exact; the midpoint cut is integer date
# arithmetic; the four per-customer means and the DiD combination are
# the identical double expression over those exact inputs, 6-dp
# rounded once. Scale: one orders-customer broadcast join + a 4-cell
# aggregation.
# ---------------------------------------------------------------------------

@query(
    "ads_did_promo_lift",
    oracle="""
    WITH env AS (
      SELECT CAST(min(o_orderdate) AS DATE)
             + CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                    // 2 AS INTEGER) AS mid
      FROM orders
    ),
    cells AS (
      SELECT c.c_mktsegment = 'BUILDING' AS treated,
             CAST(o.o_orderdate AS DATE) >= e.mid AS post,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey, env e
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated AND NOT post
            THEN CAST(rev AS DOUBLE) / n_cust END) AS t_pre,
        MAX(CASE WHEN treated AND post
            THEN CAST(rev AS DOUBLE) / n_cust END) AS t_post,
        MAX(CASE WHEN NOT treated AND NOT post
            THEN CAST(rev AS DOUBLE) / n_cust END) AS c_pre,
        MAX(CASE WHEN NOT treated AND post
            THEN CAST(rev AS DOUBLE) / n_cust END) AS c_post
      FROM cells
    )
    SELECT round(t_pre, 6) AS treat_pre, round(t_post, 6) AS treat_post,
           round(c_pre, 6) AS control_pre, round(c_post, 6) AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate
    FROM wide
    """,
)
def ads_did_promo_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences per-customer revenue lift, BUILDING vs
    rest across the midpoint-date cut (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_mktsegment") == "BUILDING").alias("treated"))
    env = orders.agg(
        F.expr("date_add(min(o_orderdate),"
               " CAST(datediff(max(o_orderdate), min(o_orderdate)) div 2"
               " AS INT))").alias("mid"))
    cells = (orders.join(F.broadcast(cust), "o_custkey")
             .crossJoin(F.broadcast(env))
             .groupBy("treated",
                      (F.col("o_orderdate") >= F.col("mid")).alias("post"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("rev"),
                  F.count_distinct("o_custkey").cast("bigint")
                  .alias("n_cust")))
    percust = F.col("rev").cast("double") / F.col("n_cust")
    wide = cells.agg(
        F.max(F.when(F.col("treated") & ~F.col("post"), percust))
        .alias("t_pre"),
        F.max(F.when(F.col("treated") & F.col("post"), percust))
        .alias("t_post"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), percust))
        .alias("c_pre"),
        F.max(F.when(~F.col("treated") & F.col("post"), percust))
        .alias("c_post"))
    return wide.select(
        F.round("t_pre", 6).alias("treat_pre"),
        F.round("t_post", 6).alias("treat_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round((F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre")), 6)
        .alias("did_estimate"))


# ---------------------------------------------------------------------------
# RFM segmentation (r10) — the classic customer-value grid (Hughes
# 1994): score each customer 1-3 on Recency (days since last order),
# Frequency (order count), Monetary (lifetime cents) against tercile
# cutoffs, and report the 27-cell population with exact revenue sums.
# Cutoffs are the linear-interpolated terciles over the exact integer
# metric multisets — Spark `percentile` and DuckDB `quantile_cont`
# compute the identical (n-1)*p interpolation (the proven equivalence
# from quality_threshold_calibration); scoring compares exact BIGINTs
# against those deterministic doubles, so no unordered float
# accumulation exists anywhere. Scale: one groupBy(custkey) pass, two
# broadcast scalar rows (cuts + max date), one 27-cell aggregate.
# ---------------------------------------------------------------------------

@query(
    "ads_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(datediff('day', MAX(CAST(o_orderdate AS DATE)),
                           (SELECT MAX(CAST(o_orderdate AS DATE))
                            FROM orders)) AS BIGINT) AS recency_d,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    cuts AS (
      SELECT quantile_cont(recency_d, [1.0/3, 2.0/3]) AS rc,
             quantile_cont(freq, [1.0/3, 2.0/3]) AS fc,
             quantile_cont(cents, [1.0/3, 2.0/3]) AS mc
      FROM cust
    ),
    scored AS (
      SELECT
        -- recency: SMALLER is better -> invert the score
        3 - CASE WHEN recency_d > rc[2] THEN 2
                 WHEN recency_d > rc[1] THEN 1 ELSE 0 END AS r_score,
        1 + CASE WHEN freq > fc[2] THEN 2
                 WHEN freq > fc[1] THEN 1 ELSE 0 END AS f_score,
        1 + CASE WHEN cents > mc[2] THEN 2
                 WHEN cents > mc[1] THEN 1 ELSE 0 END AS m_score,
        cents
      FROM cust, cuts
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def ads_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """27-cell RFM grid over exact integer metrics with interpolated
    tercile cutoffs (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.to_date("o_orderdate")).alias("dmax"))
    cust = (orders.crossJoin(F.broadcast(maxd))
            .groupBy("o_custkey")
            .agg(F.datediff(F.first("dmax"), F.max(F.to_date("o_orderdate")))
                 .cast("bigint").alias("recency_d"),
                 F.count("*").cast("bigint").alias("freq"),
                 F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                       .cast("bigint")).cast("bigint").alias("cents")))
    # cast(1.0/3 as double) would be DECIMAL division (exactly
    # 0.333333) — NOT the oracle's double 1/3; divide doubles instead
    tercs = ("array(cast(1 as double)/3, cast(2 as double)/3)")
    cuts = cust.agg(
        F.expr(f"percentile(recency_d, {tercs})").alias("rc"),
        F.expr(f"percentile(freq, {tercs})").alias("fc"),
        F.expr(f"percentile(cents, {tercs})").alias("mc"))
    scored = (cust.crossJoin(F.broadcast(cuts))
              .select(
                  (3 - F.when(F.col("recency_d") > F.expr("rc[1]"), 2)
                   .when(F.col("recency_d") > F.expr("rc[0]"), 1)
                   .otherwise(0)).cast("bigint").alias("r_score"),
                  (1 + F.when(F.col("freq") > F.expr("fc[1]"), 2)
                   .when(F.col("freq") > F.expr("fc[0]"), 1)
                   .otherwise(0)).cast("bigint").alias("f_score"),
                  (1 + F.when(F.col("cents") > F.expr("mc[1]"), 2)
                   .when(F.col("cents") > F.expr("mc[0]"), 1)
                   .otherwise(0)).cast("bigint").alias("m_score"),
                  "cents"))
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("bigint").alias("n_customers"),
                 F.sum("cents").cast("bigint").alias("revenue_cents"))
            .orderBy("r_score", "f_score", "m_score"))


# ---------------------------------------------------------------------------
# Repeat-purchase interval distribution (r10) — the inter-order gap
# histogram a retention model trains on: per customer, days between
# consecutive orders (event-time ordered with an orderkey tie-break),
# bucketed into weeks (capped at 52+). Pure integer date arithmetic;
# the per-customer LAG window partitions on custkey, so the sort
# distributes across customers at any scale.
# ---------------------------------------------------------------------------

@query(
    "ads_repeat_purchase_intervals",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
             lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
               o_orderkey) AS prev_d
      FROM orders
    ),
    gaps AS (
      SELECT LEAST(CAST(datediff('day', prev_d, d) AS BIGINT) // 7, 52)
               AS gap_wk
      FROM seq WHERE prev_d IS NOT NULL
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gaps)
    SELECT gap_wk, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(CAST(floor(CAST(COUNT(*) AS DOUBLE) / any_value(tot.n)
                           * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS share
    FROM gaps, tot GROUP BY 1 ORDER BY 1
    """,
)
def ads_repeat_purchase_intervals(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Weekly-bucketed inter-order gap histogram (see block comment)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    seq = orders.withColumn("prev_d", F.lag("d").over(w))
    gaps = (seq.filter(F.col("prev_d").isNotNull())
            .select(F.least(F.expr(
                "cast(datediff(d, prev_d) as bigint) div 7"),
                F.lit(52).cast("bigint")).alias("gap_wk")))
    tot = gaps.agg(F.count("*").cast("bigint").alias("n"))
    return (gaps.groupBy("gap_wk")
            .agg(F.count("*").cast("bigint").alias("n_gaps"))
            .crossJoin(F.broadcast(tot))
            .select("gap_wk", "n_gaps",
                    (F.floor(F.col("n_gaps").cast("double") / F.col("n")
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("share"))
            .orderBy("gap_wk"))


# ---------------------------------------------------------------------------
# PSI distribution-drift audit (r10) — the population stability index
# every model monitor runs: per event type, decile the EARLY half's
# value distribution, re-bucket the LATE half on the same cuts, and
# report PSI = sum (p2 - p1) * ln(p2 / p1) with +1 Laplace smoothing
# on the 10-bucket spine. EXACTNESS: values quantized to integer cents
# up front; the epoch-microsecond midpoint split is exact integer
# arithmetic; decile cuts are the proven percentile/quantile_cont
# interpolation over integer multisets; each PSI term is deterministic
# per bucket from exact counts and is floor(t*1e9 + 0.5)-quantized
# BEFORE an exact integer sum (float-discipline rule). Scale: two
# grouped aggregates on (event_type) + a 10-row-per-type spine join.
# ---------------------------------------------------------------------------

PSI_DECILES = [i / 10.0 for i in range(1, 10)]


@query(
    "quality_psi_drift",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) AS eus,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    mid AS (
      SELECT (CAST(MIN(eus) AS BIGINT) + MAX(eus)) // 2 AS m FROM ev
    ),
    halves AS (
      SELECT event_type, cents,
             CASE WHEN eus <= mid.m THEN 0 ELSE 1 END AS half
      FROM ev, mid
    ),
    cuts AS (
      SELECT event_type,
             quantile_cont(cents, {PSI_DECILES}) AS c
      FROM halves WHERE half = 0 GROUP BY 1
    ),
    bucketed AS (
      SELECT h.event_type, h.half,
             1 + CAST(h.cents > c[1] AS INT) + CAST(h.cents > c[2] AS INT)
               + CAST(h.cents > c[3] AS INT) + CAST(h.cents > c[4] AS INT)
               + CAST(h.cents > c[5] AS INT) + CAST(h.cents > c[6] AS INT)
               + CAST(h.cents > c[7] AS INT) + CAST(h.cents > c[8] AS INT)
               + CAST(h.cents > c[9] AS INT) AS b
      FROM halves h JOIN cuts USING (event_type)
    ),
    spine AS (
      SELECT DISTINCT event_type, t.b
      FROM cuts, UNNEST(generate_series(1, 10)) AS t(b)
    ),
    counts AS (
      SELECT s.event_type, s.b,
             CAST(COALESCE(SUM(CASE WHEN bk.half = 0 THEN 1 END), 0)
                  AS BIGINT) + 1 AS c1,
             CAST(COALESCE(SUM(CASE WHEN bk.half = 1 THEN 1 END), 0)
                  AS BIGINT) + 1 AS c2
      FROM spine s LEFT JOIN bucketed bk
        ON bk.event_type = s.event_type AND bk.b = s.b
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM counts GROUP BY 1
    ),
    terms AS (
      SELECT c.event_type,
             CAST(floor((CAST(c.c2 AS DOUBLE) / t.n2
                         - CAST(c.c1 AS DOUBLE) / t.n1)
                        * ln((CAST(c.c2 AS DOUBLE) / t.n2)
                             / (CAST(c.c1 AS DOUBLE) / t.n1))
                        * 1000000000 + 0.5) AS BIGINT) AS tq
      FROM counts c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(SUM(tq) AS BIGINT) AS psi_q_1e9,
           CAST(SUM(tq) AS DOUBLE) / 1000000000.0 AS psi
    FROM terms GROUP BY 1 ORDER BY 1
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-vs-late PSI per event type on decile buckets (see block
    comment)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").cast("bigint").alias("eus"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        .alias("cents"))
    mid = ev.agg(F.expr(
        "(cast(min(eus) as bigint) + max(eus)) div 2").alias("m"))
    halves = (ev.crossJoin(F.broadcast(mid))
              .select("event_type", "cents",
                      F.when(F.col("eus") <= F.col("m"), 0).otherwise(1)
                      .alias("half")))
    cuts = (halves.filter(F.col("half") == 0)
            .groupBy("event_type")
            .agg(F.expr(f"percentile(cents, array({', '.join(str(p) for p in PSI_DECILES)}))")
                 .alias("c")))
    b_expr = F.lit(1)
    for i in range(1, 10):
        b_expr = b_expr + F.expr(f"cast(cents > c[{i - 1}] as int)")
    bucketed = (halves.join(F.broadcast(cuts), "event_type")
                .select("event_type", "half", b_expr.alias("b")))
    spine = (cuts.select("event_type")
             .crossJoin(spark.range(1, 11).select(
                 F.col("id").cast("int").alias("b"))))
    counts = (spine.join(bucketed, ["event_type", "b"], "left")
              .groupBy("event_type", "b")
              .agg((F.coalesce(F.sum(F.when(F.col("half") == 0, 1)),
                               F.lit(0)) + 1).cast("bigint").alias("c1"),
                   (F.coalesce(F.sum(F.when(F.col("half") == 1, 1)),
                               F.lit(0)) + 1).cast("bigint").alias("c2")))
    tot = counts.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"))
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    terms = (counts.join(F.broadcast(tot),
                         F.col("event_type") == F.col("et"))
             .select("event_type",
                     F.floor((p2 - p1) * F.log(p2 / p1)
                             * F.lit(1000000000.0) + F.lit(0.5))
                     .cast("bigint").alias("tq")))
    return (terms.groupBy("event_type")
            .agg(F.sum("tq").cast("bigint").alias("psi_q_1e9"))
            .select("event_type", "psi_q_1e9",
                    (F.col("psi_q_1e9").cast("double")
                     / F.lit(1000000000.0)).alias("psi"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Customer value-tier migration matrix (r10) — the cohort movement
# readout behind the RFM grid: split the order history at its exact
# date midpoint, tier every customer 1-3 by spend terciles WITHIN each
# half (tier 0 = inactive in that half), and cross-tab early vs late
# tiers. The (3 -> 1) and (0 -> 3) cells are the churn-risk /
# new-whale populations a lifecycle campaign targets. EXACTNESS:
# integer cents, exact integer day midpoint, per-half tercile cuts via
# the proven percentile/quantile_cont interpolation over integer
# multisets, full-outer alignment on custkey.
# ---------------------------------------------------------------------------

@query(
    "ads_value_tier_migration",
    oracle="""
    WITH bounds AS (
      SELECT (datediff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE)))
              + datediff('day', DATE '1970-01-01', MAX(CAST(o_orderdate AS DATE))))
               // 2 AS mid
      FROM orders
    ),
    spend AS (
      SELECT o_custkey,
             CASE WHEN datediff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) <= bounds.mid
                  THEN 0 ELSE 1 END AS half,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders, bounds GROUP BY 1, 2
    ),
    cuts AS (
      SELECT half, quantile_cont(cents, [1.0/3, 2.0/3]) AS c
      FROM spend GROUP BY 1
    ),
    tiered AS (
      SELECT s.o_custkey, s.half,
             1 + CASE WHEN s.cents > c[2] THEN 2
                      WHEN s.cents > c[1] THEN 1 ELSE 0 END AS tier
      FROM spend s JOIN cuts USING (half)
    ),
    aligned AS (
      SELECT COALESCE(e.o_custkey, l.o_custkey) AS ck,
             COALESCE(e.tier, 0) AS early_tier,
             COALESCE(l.tier, 0) AS late_tier
      FROM (SELECT * FROM tiered WHERE half = 0) e
      FULL OUTER JOIN (SELECT * FROM tiered WHERE half = 1) l
        ON l.o_custkey = e.o_custkey
    )
    SELECT CAST(early_tier AS BIGINT) AS early_tier,
           CAST(late_tier AS BIGINT) AS late_tier,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM aligned GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ads_value_tier_migration(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Early-vs-late spend-tercile migration matrix (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint").alias("dd"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    bounds = orders.agg(F.expr(
        "(cast(min(dd) as bigint) + max(dd)) div 2").alias("mid"))
    spend = (orders.crossJoin(F.broadcast(bounds))
             .groupBy("o_custkey",
                      F.when(F.col("dd") <= F.col("mid"), 0).otherwise(1)
                      .alias("half"))
             .agg(F.sum("cents").cast("bigint").alias("cents")))
    tercs = "array(cast(1 as double)/3, cast(2 as double)/3)"
    cuts = spend.groupBy("half").agg(
        F.expr(f"percentile(cents, {tercs})").alias("c"))
    tiered = (spend.join(F.broadcast(cuts), "half")
              .select("o_custkey", "half",
                      (1 + F.when(F.col("cents") > F.expr("c[1]"), 2)
                       .when(F.col("cents") > F.expr("c[0]"), 1)
                       .otherwise(0)).cast("bigint").alias("tier")))
    e = (tiered.filter(F.col("half") == 0)
         .select(F.col("o_custkey").alias("eck"),
                 F.col("tier").alias("early_tier")))
    late = (tiered.filter(F.col("half") == 1)
            .select(F.col("o_custkey").alias("lck"),
                    F.col("tier").alias("late_tier")))
    aligned = e.join(late, F.col("eck") == F.col("lck"), "full_outer")
    return (aligned.select(
        F.coalesce("early_tier", F.lit(0)).cast("bigint")
        .alias("early_tier"),
        F.coalesce("late_tier", F.lit(0)).cast("bigint")
        .alias("late_tier"))
        .groupBy("early_tier", "late_tier")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("early_tier", "late_tier"))


# ---------------------------------------------------------------------------
# Time-spine completeness audit (r10) — the gap DETECTOR ahead of the
# round-1 gap-FILLERS (LOCF / interpolate): per event type, how many
# hourly buckets between the stream's first and last hour carry zero
# events, and the longest silent run (the alerting signal for a dead
# producer). Pure integer hour arithmetic + a generate_series spine
# anti-join; the longest run is gaps-and-islands on the missing set.
# ---------------------------------------------------------------------------

@query(
    "quality_time_spine_gaps",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr
      FROM events
    ),
    bounds AS (
      SELECT CAST(MIN(hr) AS BIGINT) AS h0, CAST(MAX(hr) AS BIGINT) AS h1
      FROM ev
    ),
    spine AS (
      SELECT et.event_type, t.h
      FROM bounds, UNNEST(generate_series(h0, h1)) AS t(h),
           (SELECT DISTINCT event_type FROM ev) et
    ),
    observed AS (SELECT DISTINCT event_type, hr FROM ev),
    missing AS (
      SELECT s.event_type, s.h
      FROM spine s LEFT JOIN observed o
        ON o.event_type = s.event_type AND o.hr = s.h
      WHERE o.hr IS NULL
    ),
    runs AS (
      SELECT event_type,
             h - row_number() OVER (PARTITION BY event_type
                                    ORDER BY h) AS anchor
      FROM missing
    ),
    longest AS (
      SELECT event_type, CAST(MAX(run_len) AS BIGINT) AS longest_gap_h
      FROM (SELECT event_type, anchor, COUNT(*) AS run_len
            FROM runs GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS spine_hours,
           CAST(COUNT(*) - COUNT(o.hr) AS BIGINT) AS missing_hours,
           CAST(COALESCE(any_value(l.longest_gap_h), 0) AS BIGINT)
             AS longest_gap_h
    FROM spine s
    LEFT JOIN observed o ON o.event_type = s.event_type AND o.hr = s.h
    LEFT JOIN longest l ON l.event_type = s.event_type
    GROUP BY 1 ORDER BY 1
    """,
)
def quality_time_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-spine gap audit per event type (see block comment)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(unix_micros(ts) as bigint) div 3600000000")
        .alias("hr"))
    bounds = ev.agg(F.min("hr").cast("bigint").alias("h0"),
                    F.max("hr").cast("bigint").alias("h1"))
    types = ev.select("event_type").distinct()
    spine = (types.crossJoin(F.broadcast(bounds))   # bounded spine
             .select("event_type",
                     F.explode(F.sequence("h0", "h1")).alias("h")))
    # alias BOTH columns: spine and observed share lineage (both come
    # from ev), and Spark's self-join column resolution silently
    # mis-binds spine.event_type == observed.event_type otherwise
    observed = ev.distinct().select(
        F.col("event_type").alias("oet"), F.col("hr").alias("oh"))
    joined = spine.join(
        observed, (F.col("event_type") == F.col("oet"))
        & (F.col("h") == F.col("oh")), "left").drop("oet")
    missing = joined.filter(F.col("oh").isNull()).select("event_type", "h")
    runs = missing.withColumn(
        "anchor", F.col("h") - F.row_number().over(
            Window.partitionBy("event_type").orderBy("h")))
    longest = (runs.groupBy("event_type", "anchor")
               .agg(F.count("*").alias("run_len"))
               .groupBy(F.col("event_type").alias("let"))
               .agg(F.max("run_len").cast("bigint")
                    .alias("longest_gap_h")))
    return (joined.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("spine_hours"),
                 (F.count("*") - F.count("oh")).cast("bigint")
                 .alias("missing_hours"))
            .join(longest, F.col("event_type") == F.col("let"), "left")
            .select("event_type", "spine_hours", "missing_hours",
                    F.coalesce("longest_gap_h", F.lit(0)).cast("bigint")
                    .alias("longest_gap_h"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Tukey IQR outlier audit (r11) — the standard box-plot fence audit per
# customer segment: q1/q3 by linear interpolation (Spark `percentile`
# == DuckDB `quantile_cont`, the p*(n-1) rule — parity confirmed r10),
# fences at 1.5*IQR, exact outlier counts.  EXACTNESS: percentiles run
# on exact BIGINT cents, so the interpolated q1/q3 are the same double
# in both engines; fences and comparisons are double-exact (cents are
# integers well under 2^53); counts are exact BIGINTs.
# ---------------------------------------------------------------------------

@query(
    "quality_iqr_outlier_audit",
    oracle="""
    WITH c AS (
      SELECT o.o_custkey, cu.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
    ),
    q AS (
      SELECT seg,
             quantile_cont(cents, [0.25, 0.75]) AS qs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1
    ),
    f AS (
      SELECT seg, n, qs[1] AS q1, qs[2] AS q3,
             qs[1] - 1.5 * (qs[2] - qs[1]) AS lo,
             qs[2] + 1.5 * (qs[2] - qs[1]) AS hi
      FROM q
    )
    SELECT f.seg, f.n,
           CAST(CAST(floor(f.q1 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS q1,
           CAST(CAST(floor(f.q3 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS q3,
           CAST(SUM(CASE WHEN c.cents < f.lo OR c.cents > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN c.cents > f.hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_high
    FROM f JOIN c ON c.seg = f.seg
    GROUP BY 1, 2, 3, 4 ORDER BY 1
    """,
)
def quality_iqr_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey 1.5*IQR fence outlier counts per market segment (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    c = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("bigint").alias("cents")))
    q = c.groupBy("seg").agg(
        F.expr("percentile(cents, array(0.25, 0.75))").alias("qs"),
        F.count("*").cast("bigint").alias("n"))
    f = q.select(
        "seg", "n",
        F.element_at("qs", 1).alias("q1d"),
        F.element_at("qs", 2).alias("q3d")
    ).select(
        "seg", "n", "q1d", "q3d",
        (F.col("q1d") - 1.5 * (F.col("q3d") - F.col("q1d"))).alias("lo"),
        (F.col("q3d") + 1.5 * (F.col("q3d") - F.col("q1d"))).alias("hi"))
    joined = c.join(F.broadcast(f), "seg")
    return (joined.groupBy(
        "seg", "n",
        (F.floor(F.col("q1d") * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0)).alias("q1"),
        (F.floor(F.col("q3d") * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0)).alias("q3"))
        .agg(F.sum(F.when((F.col("cents") < F.col("lo"))
                          | (F.col("cents") > F.col("hi")), 1)
                   .otherwise(0)).cast("bigint").alias("n_outliers"),
             F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
             .cast("bigint").alias("n_high"))
        .orderBy("seg"))


# ---------------------------------------------------------------------------
# Market-basket affinity (r11) — pairwise lift between part TYPES
# within orders: lift(a,b) = N * n_ab / (n_a * n_b) over the distinct
# per-order type sets.  The classic co-occurrence readout (association
# rules' numerator) on exact integer counts; lift is one quantized
# rational per pair.  SCALE: the per-order type set is tiny (<= 25
# types exist), so the within-order pair expansion is bounded per key;
# everything else is content-keyed groupBys with partial aggregation.
# Top 15 pairs by exact lift key with (pair) tie-break.
# ---------------------------------------------------------------------------

@query(
    "ads_basket_affinity",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_type AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ot),
    tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM ot GROUP BY 1),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM ot a JOIN ot b ON a.ok = b.ok AND a.t < b.t
      GROUP BY 1, 2
    ),
    lift AS (
      SELECT p.ta, p.tb, p.c_ab, ca.c AS c_a, cb.c AS c_b,
             (n.n_orders * p.c_ab * 1000000) // (ca.c * cb.c) AS lift6
      FROM pairs p
      JOIN tc ca ON ca.t = p.ta
      JOIN tc cb ON cb.t = p.tb
      CROSS JOIN n
    ),
    top AS (
      SELECT *, row_number() OVER (ORDER BY lift6 DESC, ta, tb) AS rk
      FROM lift
    )
    SELECT ta, tb, c_ab, c_a, c_b,
           CAST(lift6 AS DOUBLE) / 1000000.0 AS lift
    FROM top WHERE rk <= 15 ORDER BY lift DESC, ta, tb
    """,
)
def ads_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 part-type co-purchase pairs by exact integer lift (see
    block comment)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ot = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("p_type").alias("t"))
          .distinct())
    n = ot.agg(F.countDistinct("ok").cast("bigint").alias("n_orders"))
    tc = ot.groupBy("t").agg(F.count("*").cast("bigint").alias("c"))
    a = ot.select(F.col("ok"), F.col("t").alias("ta"))
    b = ot.select(F.col("ok").alias("ok2"), F.col("t").alias("tb"))
    pairs = (a.join(b, (F.col("ok") == F.col("ok2"))
                    & (F.col("ta") < F.col("tb")))
             .groupBy("ta", "tb")
             .agg(F.count("*").cast("bigint").alias("c_ab")))
    lift = (pairs
            .join(F.broadcast(tc.select(F.col("t").alias("ta"),
                                        F.col("c").alias("c_a"))), "ta")
            .join(F.broadcast(tc.select(F.col("t").alias("tb"),
                                        F.col("c").alias("c_b"))), "tb")
            .crossJoin(F.broadcast(n))
            .withColumn("lift6", F.expr(
                "(n_orders * c_ab * 1000000) div (c_a * c_b)")))
    top = lift.select(
        "*", F.row_number().over(
            Window.orderBy(F.desc("lift6"), F.asc("ta"), F.asc("tb")))
        .alias("rk")).filter(F.col("rk") <= 15)
    return (top.select("ta", "tb", "c_ab", "c_a", "c_b",
                       (F.col("lift6").cast("double") / F.lit(1000000.0))
                       .alias("lift"))
            .orderBy(F.desc("lift"), F.asc("ta"), F.asc("tb")))
