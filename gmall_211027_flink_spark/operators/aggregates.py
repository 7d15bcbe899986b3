"""Aggregation operators (SURVEY §2.4 A1-A4, A8-A9).

The reference's DWS layer is keyed/global 10 s tumbling windows with
incremental reduce (e.g. DwsTrafficVcChArIsNewPageViewWindow.java:126-180,
DwsTradeProvinceOrderWindow.java:56-111); its ADS layer is batch SQL
aggregation over ClickHouse (gmall-publisher-2022 mapper/*.java). Both map
onto plain ``groupBy().agg()`` — Catalyst plans partial (map-side) +
final HashAggregate automatically, which at 100 TB is exactly the
pre-aggregation the reference hand-codes with ReduceFunctions.

Window-bucket note: event-time tumbling buckets are computed with the
native ``F.window`` (epoch-aligned), emitted as formatted strings so the
DuckDB oracle (explicit epoch arithmetic) hashes identically.

DAY-GRAIN CONTRACT (shared by every op whose comment says "bounded day
grain" — the EWMA/runs/forecast lag windows, the Kaplan-Meier /
Greenwood / log-rank folds, Kendall tau's pair join, seasonality
indices): these ops first aggregate the corpus down to ONE ROW PER DAY
(map-side partial + one shuffle, O(rows) and fully distributed), and
only then run their unpartitioned window / O(days^2) pair logic on that
summary. The orders table spans ~6.5 years, so the day grid is <= ~2.4k
rows forever — O(days) single-task windows and O(days^2) ~ 3M-pair
joins are constant-bounded BY THE CALENDAR, not by data size, and stay
so at 100 TB. Any new op that adopts this contract must (a) reduce to a
calendar-bounded grain FIRST, and (b) reference this note; an op whose
"grain" grows with the corpus (user, document, key) does NOT qualify
and must partition its windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.functions import dec, dsum, dsum_expr, day_str, bucket_start_str
from gmall_211027_flink_spark.registry import query

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (ADS batch aggregate, A8).
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    bench=True,
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)        AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)   AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)      AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# ADS GMV by day (reference: gmall-publisher TradeStats GMV,
# mapper/TradeStatsMapper.java:12-16 — sum over the order stream per date).
# ---------------------------------------------------------------------------

@query(
    "ads_gmv_by_day",
    oracle="""
    SELECT
      strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
      COUNT(*) AS order_ct,
      COUNT(DISTINCT o_custkey) AS order_uu_ct
    FROM orders
    GROUP BY 1
    """,
)
def ads_gmv_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(day_str("o_orderdate").alias("order_day"))
        .agg(
            dsum("o_totalprice").alias("gmv"),
            F.count("*").alias("order_ct"),
            F.countDistinct("o_custkey").alias("order_uu_ct"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (A9 — reference: sum(if(is_new='1',uv,0)) at
# mapper/TrafficVisitorStatsMapper.java:27; multiIf at TrafficKeywordsMapper).
# ---------------------------------------------------------------------------

@query(
    "ads_conditional_agg",
    oracle="""
    SELECT
      o_orderstatus,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS urgent_gmv,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_ct,
      CAST(SUM(CASE
            WHEN o_orderpriority LIKE '1-%' THEN 3
            WHEN o_orderpriority LIKE '2-%' THEN 2
            ELSE 1 END) AS BIGINT) AS priority_score
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def ads_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").like("1-%")
    high = F.col("o_orderpriority").like("2-%")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(urgent, dec("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
             .cast("double").alias("urgent_gmv"),
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("urgent_ct"),
            F.sum(F.when(urgent, 3).when(high, 2).otherwise(1)).cast("bigint")
             .alias("priority_score"),
        )
    )


# ---------------------------------------------------------------------------
# Keyed tumbling window aggregate (A1/A2 — reference: 10 s tumble keyed by
# (ar,ch,is_new,vc) with 5 summed counters,
# DwsTrafficVcChArIsNewPageViewWindow.java:126-180). Here: 10-minute
# tumbling windows over `events`, keyed by event_type.
# ---------------------------------------------------------------------------

@query(
    "dws_tumble_by_type",
    bench=True,
    oracle="""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS stt,
      event_type,
      COUNT(*) AS pv_ct,
      COUNT(DISTINCT user_id) AS uv_ct,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def dws_tumble_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            bucket_start_str("ts", 600).alias("stt"),
            "event_type",
        )
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            dsum("value").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Global (non-keyed) tumbling window with exact distinct (A3 + A4 —
# reference: windowAll reduce at DwsTrafficPageViewWindow.java:160-181;
# Set<String>-based exact COUNT(DISTINCT) at
# DwsTradeProvinceOrderWindow.java:56-111).
# ---------------------------------------------------------------------------

@query(
    "dws_tumble_global",
    oracle="""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS stt,
      COUNT(*) AS pv_ct,
      COUNT(DISTINCT user_id) AS uv_ct,
      COUNT(DISTINCT event_type) AS type_ct,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1
    """,
)
def dws_tumble_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(bucket_start_str("ts", 3600).alias("stt"))
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.countDistinct("event_type").alias("type_ct"),
            dsum("value").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (beyond the reference — SURVEY §2.4 notes their
# absence; added for completeness of the ADS surface).
# ---------------------------------------------------------------------------

@query(
    "ads_rollup_priority",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS order_ct,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def ads_rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("order_ct"), dsum("o_totalprice").alias("gmv"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "order_ct", "gmv",
        )
    )


# ---------------------------------------------------------------------------
# JSON property extraction + aggregation (P9 / §2.8 map-json functions —
# the reference fastjson-parses `old`/`props`-style payloads everywhere,
# e.g. DwdTradeOrderRefund.java:87-97). events.props is a JSON string.
# ---------------------------------------------------------------------------

@query(
    "events_json_props",
    oracle="""
    SELECT
      CAST(json_extract(props::JSON, '$.k') AS BIGINT) % 10 AS k_bucket,
      COUNT(*) AS event_ct,
      COUNT(DISTINCT user_id) AS uu_ct,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("event_ct"),
            F.countDistinct("user_id").alias("uu_ct"),
            dsum("value").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles / distribution stats (beyond the reference's sums —
# a reporting layer over the DWS store needs these; exact `percentile`
# keeps oracle parity where approx sketches wouldn't).
# ---------------------------------------------------------------------------

@query(
    "stats_quantity_distribution",
    oracle="""
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS q_min,
           quantile_cont(l_quantity, 0.5) AS q_median,
           quantile_cont(l_quantity, 0.9) AS q_p90,
           CAST(MAX(l_quantity) AS DOUBLE) AS q_max
    FROM lineitem
    GROUP BY 1
    """,
)
def stats_quantity_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").cast("double").alias("q_min"),
            F.expr("percentile(l_quantity, 0.5)").alias("q_median"),
            F.expr("percentile(l_quantity, 0.9)").alias("q_p90"),
            F.max("l_quantity").cast("double").alias("q_max"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical (hypertable-style) rollup: the continuous-aggregate
# pattern — facts roll into fine buckets ONCE, coarser answers
# re-aggregate the rollup, never the facts. Only composable metrics
# (sum/count/min/max) live in the rollup; the hourly answer below is
# computed strictly FROM the 10-minute rollup, while the oracle computes
# it directly from the raw events — passing proves the two-level
# aggregation composes exactly. At 100 TB this is the difference between
# scanning a day of raw events and scanning 144 rollup rows per key.
# ---------------------------------------------------------------------------

@query(
    "dws_hierarchical_rollup",
    oracle="""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS hour_stt,
      event_type,
      COUNT(*) AS pv_ct,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
      CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_min,
      CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_max
    FROM events
    GROUP BY 1, 2
    """,
)
def dws_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # level 1: 10-minute rollup (what a continuous aggregate would store)
    ten_min = (
        ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 600) * 600).alias("b600"),
            "event_type")
        .agg(F.count("*").alias("pv_ct"),
             F.sum(dec("value")).alias("value_sum"),
             F.min(dec("value")).alias("value_min"),
             F.max(dec("value")).alias("value_max"))
    )
    # level 2: hourly answer from the rollup alone (sums of sums,
    # min of mins, max of maxes — composable by construction)
    return (
        ten_min.groupBy(
            (F.floor(F.col("b600") / 3600) * 3600).alias("b3600"),
            "event_type")
        .agg(F.sum("pv_ct").cast("bigint").alias("pv_ct"),
             F.sum("value_sum").cast("double").alias("value_sum"),
             F.min("value_min").cast("double").alias("value_min"),
             F.max("value_max").cast("double").alias("value_max"))
        .select(
            F.date_format(F.timestamp_seconds("b3600"), "yyyy-MM-dd HH:mm:ss")
             .alias("hour_stt"),
            "event_type", "pv_ct", "value_sum", "value_min", "value_max")
    )


# ---------------------------------------------------------------------------
# Gap-fill + resample with carry-forward (the hypertable
# `time_bucket_gapfill` / LOCF pattern): a dense 10-minute spine per
# event_type over the table's full time range, empty buckets get
# pv_ct=0 and carry the last seen value_sum forward. The spine is
# generated DISTRIBUTED-side (sequence+explode off a 1-row bounds agg —
# nothing collects to the driver); the fill is one left join against the
# real buckets plus a `last(ignorenulls)` running window. At 100 TB the
# spine is negligible (~52k rows/year/key) and the join broadcasts it.
# ---------------------------------------------------------------------------

@query(
    "dws_gapfill_locf",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(MIN(ts)) / 600) AS BIGINT) AS b0,
             CAST(floor(epoch(MAX(ts)) / 600) AS BIGINT) AS b1
      FROM events
    ),
    spine AS (
      SELECT t.b AS b, et.event_type
      FROM bounds, UNNEST(generate_series(b0, b1)) AS t(b),
           (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
      SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS b, event_type,
             COUNT(*) AS pv, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vs
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT s.b, s.event_type, COALESCE(a.pv, 0) AS pv_ct, a.vs
      FROM spine s LEFT JOIN agg a ON s.b = a.b AND s.event_type = a.event_type
    )
    SELECT strftime(make_timestamp(b * 600 * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
           event_type, pv_ct,
           last_value(vs IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY b
             ROWS UNBOUNDED PRECEDING) AS value_sum_locf,
           (pv_ct = 0) AS gap_filled
    FROM j
    """,
)
def dws_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = F.floor(F.unix_timestamp("ts") / 600).cast("bigint")
    bounds = ev.agg(F.min(b).alias("b0"), F.max(b).alias("b1"))
    types = ev.select("event_type").distinct()
    spine = (bounds.select(F.explode(F.sequence("b0", "b1")).alias("b"))
             .crossJoin(types))
    agg = (ev.groupBy(b.alias("b"), "event_type")
           .agg(F.count("*").alias("pv"),
                F.sum(dec("value")).cast("double").alias("vs")))
    j = (spine.join(agg, ["b", "event_type"], "left")
         .select("b", "event_type",
                 F.coalesce("pv", F.lit(0)).alias("pv_ct"), "vs"))
    w = (Window.partitionBy("event_type").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, 0))
    return j.select(
        F.date_format(F.timestamp_seconds(F.col("b") * 600),
                      "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type", "pv_ct",
        F.last("vs", ignorenulls=True).over(w).alias("value_sum_locf"),
        (F.col("pv_ct") == 0).alias("gap_filled"),
    )


# ---------------------------------------------------------------------------
# Equal-width histogram over a measure (per-key value profiling — the
# dataset-statistics pass a training pipeline runs before filtering).
# Bounds come from a 1-row global agg broadcast into the bucketing
# expression (no collect, no second scan thanks to cache-friendly
# single-pass min/max); bucketing itself is a map-side floor() — the
# whole thing is one narrow pass + one two-phase agg.
# ---------------------------------------------------------------------------

HIST_BUCKETS = 20


@query(
    "stats_value_histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ),
    bucketed AS (
      SELECT event_type,
             CAST(CASE WHEN hi = lo THEN 0
                  ELSE least(floor((value - lo) / ((hi - lo) / {HIST_BUCKETS})),
                             {HIST_BUCKETS - 1}) END AS BIGINT) AS bucket
      FROM events, bounds
    )
    SELECT event_type, bucket, COUNT(*) AS ct,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS share
    FROM bucketed GROUP BY 1, 2
    """,
)
def stats_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / HIST_BUCKETS
    # hi == lo (all values identical) degenerates width to 0; both engines
    # must then agree on a single bucket 0 (ADVICE r1 — Spark's x/0->NULL
    # vs DuckDB's ±inf would otherwise diverge).
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(F.floor((F.col("value") - F.col("lo")) / width),
                F.lit(HIST_BUCKETS - 1)))
    bucketed = (
        ev.crossJoin(F.broadcast(bounds))
        .select("event_type", bucket.cast("bigint").alias("bucket"))
    )
    w = Window.partitionBy("event_type")
    return (
        bucketed.groupBy("event_type", "bucket").agg(F.count("*").alias("ct"))
        .withColumn("share",
                    F.col("ct").cast("double") / F.sum("ct").over(w))
    )


# ---------------------------------------------------------------------------
# OHLC (open/high/low/close) per hour per event_type — the candlestick
# rollup. Open/close are the FIRST/LAST values by (ts, event_id): done
# with a lexicographic struct min/max (one two-phase agg, no window
# sort) — `min(struct(ts, event_id, value))` picks the earliest row's
# value deterministically, ties broken by event_id. The oracle states
# the same selection with row_number, proving the struct-ordering trick
# exact. High/low are decimal-exact min/max.
# ---------------------------------------------------------------------------

@query(
    "dws_ohlc_hourly",
    oracle="""
    WITH b AS (
      SELECT event_type, value, ts, event_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h
      FROM events
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY h, event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY h, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM b
    )
    SELECT strftime(make_timestamp(h * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
           event_type,
           CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS high,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_z = 1 THEN value END) AS DOUBLE) AS close,
           COUNT(*) AS tick_ct
    FROM ranked GROUP BY 1, 2
    """,
)
def dws_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint")
    return (
        ev.groupBy(h.alias("h"), "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("first_row"),
            F.max(dec("value")).cast("double").alias("high"),
            F.min(dec("value")).cast("double").alias("low"),
            F.max(F.struct("ts", "event_id", "value")).alias("last_row"),
            F.count("*").alias("tick_ct"),
        )
        .select(
            F.date_format(F.timestamp_seconds("h"), "yyyy-MM-dd HH:mm:ss")
             .alias("stt"),
            "event_type",
            F.col("first_row.value").alias("open"),
            "high", "low",
            F.col("last_row.value").alias("close"),
            "tick_ct",
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average per event_type (the irregular-sample hypertable
# aggregate): each sample holds its value until the next sample, so
# TWA = Σ(value_i · Δt_i) / Σ(Δt_i) with Δt from lead(ts); the series'
# last sample carries no duration. The value·Δt products and their sum
# run in DECIMAL (associative, partition-order-proof) — doubles appear
# only in the final division, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

@query(
    "stats_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT event_type,
           round(CAST(SUM(v * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE), 6) AS twa,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           COUNT(*) AS sample_ct
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY 1
    """,
)
def stats_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "event_type", dec("value").alias("v"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("v") * F.col("dt_us")).cast("double")
                    / F.sum("dt_us").cast("double"), 6).alias("twa"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.count("*").alias("sample_ct"),
        )
    )


# ---------------------------------------------------------------------------
# Z-score outlier screen per event_type (the numeric-outlier filter a
# training pipeline runs before ingestion). Moments are computed from
# DECIMAL-exact Σx and Σx² (associative, partition-order-proof; doubles
# appear only in the final mean/std arithmetic, rounded to 6 dp), so
# both engines flag the identical rows — a raw double variance would be
# partition-order-dependent and unhashable across engines.
# ---------------------------------------------------------------------------

ZSCORE_CUT = 3.0


@query(
    "stats_zscore_outliers",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT event_type, n,
             round(s1 / n, 6) AS mean,
             round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS std
      FROM m
    )
    SELECT e.event_id, e.event_type,
           CAST(e.value AS DOUBLE) AS value,
           round((e.value - s.mean) / NULLIF(s.std, 0), 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs(round((e.value - s.mean) / NULLIF(s.std, 0), 6)) > {ZSCORE_CUT}
    """,
)
def stats_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    stats = m.select(
        "event_type",
        F.round(F.col("s1") / F.col("n"), 6).alias("mean"),
        F.round(F.sqrt(F.col("s2") / F.col("n")
                       - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))),
                6).alias("std"),
    )
    # NULLIF guard (mirrored in the oracle): a constant-valued stratum has
    # std = 0; without it Spark's non-ANSI x/0 -> NULL silently drops rows
    # while DuckDB's ±inf keeps them — the degenerate case must be defined
    # identically in both engines (ADVICE r1). NULL zscore filters out.
    z = F.round((F.col("value") - F.col("mean"))
                / F.nullif(F.col("std"), F.lit(0.0)), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")  # bounded: one row per type
        .select("event_id", "event_type",
                F.col("value").cast("double").alias("value"),
                z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > ZSCORE_CUT)
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics: the profiling query run BEFORE choosing a join /
# aggregation strategy at scale (salt? AQE skew split? broadcast?). For
# a candidate shuffle key, report the top heavy hitters with their share
# of all rows and the share of the single heaviest key — the two numbers
# that decide whether hash-partitioning on that key is safe. Two-phase
# agg + a 1-row broadcast total; the top-k is TakeOrdered, not a global
# sort.
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


@query(
    "stats_key_skew",
    oracle=f"""
    WITH counts AS (
      SELECT user_id AS key, COUNT(*) AS row_ct FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(row_ct) AS total, COUNT(*) AS distinct_keys
            FROM counts)
    SELECT c.key, c.row_ct,
           round(CAST(c.row_ct AS DOUBLE) / t.total, 6) AS share,
           t.distinct_keys
    FROM counts c, tot t
    ORDER BY c.row_ct DESC, c.key
    LIMIT {SKEW_TOP_K}
    """,
)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.col("user_id").alias("key")) \
               .agg(F.count("*").alias("row_ct"))
    tot = counts.agg(F.sum("row_ct").alias("total"),
                     F.count("*").alias("distinct_keys"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("key", "row_ct",
                F.round(F.col("row_ct").cast("double") / F.col("total"), 6)
                 .alias("share"),
                "distinct_keys")
        .orderBy(F.desc("row_ct"), "key")
        .limit(SKEW_TOP_K)
    )


# ---------------------------------------------------------------------------
# Exact distribution profiling: interpolated percentiles (Spark
# `percentile` == DuckDB `quantile_cont`, both type-7/linear — verified
# equal to 6 dp cross-engine) and Pearson correlation. The exact
# percentile is a per-group sort — fine for grouped profiling where
# each group fits an executor; for a whole-corpus percentile at 100 TB
# switch to approx_percentile (t-digest, mergeable map-side) and accept
# the documented error bound. corr() is a streaming one-pass moment
# computation — fully mergeable, no sort, safe at any scale.
# ---------------------------------------------------------------------------

@query(
    "stats_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY 1
    """,
)
def stats_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
             F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
             F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"))
    )


@query(
    "stats_price_qty_corr",
    # EXACTNESS (hardened round 10, float-discipline sweep): built-in
    # corr()/covar_samp() are UNORDERED float moment accumulations with
    # engine-specific update formulas — the stats_cramers_v failure
    # class. Reworked to the Durbin-Watson discipline: exact integer
    # moments (qty as BIGINT, price as cents), Pearson r and covariance
    # from the textbook identities over exact HUGEINT/DECIMAL(38,0)
    # cross-moments, 6-dp floor(x*1e6+0.5) quantization at the boundary.
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sy,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS sxy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS sxx,
             SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS syy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx
                         AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS qty_price_corr,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / (100.0 * n * (n - 1))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS qty_price_cov,
           n AS line_ct
    FROM m
    """,
)
def stats_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("y"))
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast("double")
    varx = (d38("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast("double")
    vary = (d38("n") * F.col("syy") - d38("sy") * F.col("sy")).cast("double")
    q6 = lambda c: (F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                    .cast("bigint").cast("double") / F.lit(1000000.0))
    return m.select(
        "l_returnflag",
        q6(num / F.sqrt(varx * vary)).alias("qty_price_corr"),
        q6(num / (F.lit(100.0) * F.col("n") * (F.col("n") - 1)))
        .alias("qty_price_cov"),
        F.col("n").alias("line_ct"))


# ---------------------------------------------------------------------------
# Gap-fill with LINEAR INTERPOLATION — the other half of the LOCF query
# above: telemetry consumers (dashboards, anomaly scorers) usually want
# gaps interpolated between the surrounding observations, not held
# flat. Same spine + bucket-agg skeleton; the interpolation needs BOTH
# directions, so each gap row reads the nearest observation backward
# (last ignore-nulls, unbounded preceding) and forward (first
# ignore-nulls, unbounded following) in one windowed pass — still one
# shuffle on the series key. Leading/trailing gaps have no bracketing
# pair and stay NULL (the honest answer; extrapolation is a policy).
# ---------------------------------------------------------------------------

@query(
    "dws_gapfill_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(MIN(ts)) / 600) AS BIGINT) AS b0,
             CAST(floor(epoch(MAX(ts)) / 600) AS BIGINT) AS b1
      FROM events
    ),
    spine AS (
      SELECT t.b AS b, et.event_type
      FROM bounds, UNNEST(generate_series(b0, b1)) AS t(b),
           (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
      SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS b, event_type,
             SUM(CAST(value AS DECIMAL(18,2))) AS vs
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT s.b, s.event_type, a.vs
      FROM spine s LEFT JOIN agg a ON s.b = a.b AND s.event_type = a.event_type
    ),
    br AS (
      SELECT b, event_type, vs,
        last_value(vs IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS UNBOUNDED PRECEDING) AS pv,
        last_value(CASE WHEN vs IS NOT NULL THEN b END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS UNBOUNDED PRECEDING) AS pb,
        first_value(vs IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN vs IS NOT NULL THEN b END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY b
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    -- interpolation numerator pv*(nb-b) + nv*(b-pb) is EXACT decimal
    -- (both engines) and the only float op is ONE double division of
    -- identical inputs, so the raw double is bit-identical across
    -- engines -- no rounding. (round(x, 6) was tried and is WRONG
    -- here: power-of-2 gap widths make exact decimal midpoints like
    -- 33.1896875 common, and Spark rounds half-up where DuckDB rounds
    -- half-even.)
    SELECT strftime(make_timestamp(b * 600 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS stt,
           event_type,
           (vs IS NULL) AS gap_filled,
           CASE
             WHEN vs IS NOT NULL THEN CAST(vs AS DOUBLE)
             WHEN pv IS NULL OR nv IS NULL THEN NULL
             ELSE CAST(pv * (nb - b) + nv * (b - pb) AS DOUBLE)
                  / (nb - pb)
           END AS value_interp
    FROM br
    """,
)
def dws_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = F.floor(F.unix_timestamp("ts") / 600).cast("bigint")
    bounds = ev.agg(F.min(b).alias("b0"), F.max(b).alias("b1"))
    types = ev.select("event_type").distinct()
    spine = (bounds.select(F.explode(F.sequence("b0", "b1")).alias("b"))
             .crossJoin(types))
    agg = (ev.groupBy(b.alias("b"), "event_type")
           .agg(F.sum(dec("value")).alias("vs")))   # stays exact DECIMAL
    j = spine.join(agg, ["b", "event_type"], "left")
    back = (Window.partitionBy("event_type").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, 0))
    fwd = (Window.partitionBy("event_type").orderBy("b")
           .rowsBetween(0, Window.unboundedFollowing))
    b_obs = F.when(F.col("vs").isNotNull(), F.col("b"))
    br = j.select(
        "b", "event_type", "vs",
        F.last("vs", ignorenulls=True).over(back).alias("pv"),
        F.last(b_obs, ignorenulls=True).over(back).alias("pb"),
        F.first("vs", ignorenulls=True).over(fwd).alias("nv"),
        F.first(b_obs, ignorenulls=True).over(fwd).alias("nb"))
    # exact-decimal numerator, one double division (see oracle comment)
    numer = (F.col("pv") * (F.col("nb") - F.col("b"))
             + F.col("nv") * (F.col("b") - F.col("pb")))
    interp = (
        F.when(F.col("vs").isNotNull(), F.col("vs").cast("double"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(numer.cast("double")
                   / (F.col("nb") - F.col("pb"))))
    return br.select(
        F.date_format(F.timestamp_seconds(F.col("b") * 600),
                      "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        F.col("vs").isNull().alias("gap_filled"),
        interp.alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy audit: Spark's approx_count_distinct (HLL++, rsd=2%)
# checked against the EXACT distinct count, per group — the measurement
# a pipeline runs before replacing exact COUNT(DISTINCT) (a full
# shuffle of every key) with the mergeable constant-size sketch at
# 100 TB. The oracle computes the exact side and asserts the 5%
# contract; Spark computes both and reports whether the sketch kept it
# — a red driver row here means the sketch config is outside tolerance
# on this corpus, which is exactly what the audit exists to catch.
# l_orderkey per returnflag is the high-cardinality stressor (beyond
# the sketch's sparse-exact range at sf>=0.1).
# ---------------------------------------------------------------------------

HLL_RSD = 0.02
HLL_TOL_PCT = 5


@query(
    "stats_hll_accuracy_audit",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_ct,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY 1
    """,
)
def stats_hll_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_ct"),
        F.expr(f"approx_count_distinct(l_orderkey, {HLL_RSD})")
         .alias("approx_ct"))
    within = (F.abs(F.col("approx_ct") - F.col("exact_ct"))
              * 100 <= F.col("exact_ct") * HLL_TOL_PCT)
    return agg.select("l_returnflag", "exact_ct",
                      within.alias("approx_within_5pct"))


# ---------------------------------------------------------------------------
# approx_percentile accuracy audit — the quantile twin of the HLL audit
# above: Spark's Greenwald-Khanna sketch guarantees RANK error
# <= 1/accuracy, so the audited claim is that the approximate median's
# value lies between the exact interpolated percentiles at p +/- the
# rank bound (doubled for slack). The oracle can't reproduce the sketch
# (and must not — that's the point of an audit), but it reproduces the
# exact bracket and asserts the verdict column TRUE: if Spark's sketch
# ever violated its bound, the Spark side would emit FALSE and the row
# would hash-mismatch. This is the pre-flight a pipeline runs before
# replacing exact `percentile` (single-reduction, memory-heavy at
# 100 TB) with the mergeable constant-memory sketch.
# ---------------------------------------------------------------------------

APCT_ACCURACY = 100       # GK accuracy knob -> rank error <= 1/100
APCT_P = 0.5


@query(
    "stats_approx_percentile_audit",
    oracle=f"""
    SELECT event_type,
           round(quantile_cont(value, {APCT_P}), 6) AS exact_p50,
           TRUE AS approx_within_rank_bound
    FROM events GROUP BY 1
    """,
)
def stats_approx_percentile_audit(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # bracket at p +/- 2/accuracy: doubled rank-bound slack
    agg = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {APCT_P})").alias("exact_raw"),
        F.expr(f"percentile(value, {APCT_P - 2.0 / APCT_ACCURACY})")
         .alias("lo"),
        F.expr(f"percentile(value, {APCT_P + 2.0 / APCT_ACCURACY})")
         .alias("hi"),
        F.expr(f"approx_percentile(value, {APCT_P}, {APCT_ACCURACY})")
         .alias("approx"))
    within = (F.col("approx") >= F.col("lo")) & (F.col("approx") <= F.col("hi"))
    return agg.select("event_type",
                      F.round("exact_raw", 6).alias("exact_p50"),
                      within.alias("approx_within_rank_bound"))


# ---------------------------------------------------------------------------
# Robust outlier detection via MAD (median absolute deviation): the
# heavy-tail-safe twin of stats_zscore_outliers — mean/stddev are
# dragged by the very outliers they're supposed to flag, while the
# median/MAD pair has a 50% breakdown point (Hampel). Flag rule:
# |x - median| > K * MAD with the standard K=3 on the 1.4826
# consistency-scaled MAD.
#
# Scale shape: two single-reduction exact medians per group (the
# approx_percentile swap documented on the audit above applies here
# identically), then one map-side pass to flag. Output only the flagged
# rows — outliers are by construction a tiny fraction of 100 TB.
# ---------------------------------------------------------------------------

MAD_K = 3.0
MAD_SCALE = 1.4826


@query(
    "stats_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value, m.med,
           round(abs(e.value - m.med) / ({MAD_SCALE} * d.mad), 6)
             AS robust_z
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    WHERE d.mad > 0
      AND abs(e.value - m.med) > {MAD_K} * {MAD_SCALE} * d.mad
    """,
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med"))
    mad = (ev.join(F.broadcast(med), "event_type")
           .groupBy("event_type")
           .agg(F.round(F.expr("percentile(abs(value - med), 0.5)"), 6)
                .alias("mad")))
    dev = F.abs(F.col("value") - F.col("med"))
    return (ev.join(F.broadcast(med), "event_type")
            .join(F.broadcast(mad), "event_type")
            .filter((F.col("mad") > 0)
                    & (dev > MAD_K * MAD_SCALE * F.col("mad")))
            .select("event_id", "event_type", "value", "med",
                    F.round(dev / (MAD_SCALE * F.col("mad")), 6)
                     .alias("robust_z")))


# ---------------------------------------------------------------------------
# Per-group OLS trend (regr_slope / regr_intercept / corr): value vs
# seconds-since-2024-01-01, by event type — the drift/trend monitor an
# ops pipeline runs over metric streams.
#
# Cross-engine determinism: the five moment sums are EXACT (x is a
# bigint second offset, y rides as DECIMAL(18,2); products are summed
# as DECIMAL(38,x) so even 1e12-row groups cannot overflow or lose
# bits) — only the final slope/intercept/corr arithmetic drops to
# double, with identical expression text in both engines, then rounds
# at the 6-dp boundary. Scale: one two-phase aggregation, map-side
# partials carry five numbers per group.
# ---------------------------------------------------------------------------

_TREND_EPOCH0 = 1704067200   # 2024-01-01 00:00:00 UTC


@query(
    "stats_regression_trend",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                      AS DECIMAL(38,0))) AS sx,
             SUM(CAST(value AS DECIMAL(18,2))) AS sy,
             SUM(CAST((CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0})
                      * (CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0})
                      AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                      AS DECIMAL(19,0))
                 * CAST(value AS DECIMAL(18,2))) AS sxy,
             SUM(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS syy
      FROM events GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
      round((CAST(sy AS DOUBLE)
             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS corr
    FROM m
    """,
)
def stats_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(_TREND_EPOCH0))
    y = F.col("value").cast("decimal(18,2)")
    m = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(38,0)")).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum(x.cast("decimal(19,0)") * y).alias("sxy"),
        F.sum(y * y).alias("syy"))
    n_d = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    num = n_d * sxy - sx * sy
    den = n_d * sxx - sx * sx
    slope = num / den
    return m.select(
        "event_type", F.col("n").cast("bigint").alias("n_events"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n_d, 6).alias("intercept"),
        F.round(num / F.sqrt(den * (n_d * syy - sy * sy)), 6)
         .alias("corr"))


# ---------------------------------------------------------------------------
# Equi-depth histogram (decile bins of o_totalprice): the exact-audit
# companion to stats_approx_percentile_audit — ntile over a total order
# gives bit-exact bin boundaries to validate a sketch against.
#
# Scale (reworked r12): the exact ntile no longer needs a global sort —
# ranks come from the TWO-LEVEL grid_rank (operators/ranks.py) over the
# bounded $10k price grid and the ntile bin is recovered from (rk, n)
# by ntile's exact remainder arithmetic (first n%k tiles get the extra
# row), so the exact auditor is itself fully distributed.  The
# production histogram at 100 TB is still approx_percentile (sketch,
# see stats_approx_percentile_audit); this form bounds its error.
# ---------------------------------------------------------------------------

HIST_BINS = 10


@query(
    "stats_histogram_equi_depth",
    oracle=f"""
    WITH ranked AS (
      SELECT o_totalprice,
             ntile({HIST_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
               AS bin
      FROM orders
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM ranked GROUP BY 1
    """,
)
def stats_histogram_equi_depth(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    orders = load_table(spark, sf_dir, "orders")
    n_df = orders.agg(F.count("*").cast("bigint").alias("n"))
    rk = grid_rank(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        F.floor(F.col("o_totalprice") / 10000).cast("bigint"))
    # exact ntile(k) from (rk, n): the first n % k tiles hold
    # n div k + 1 rows, the rest n div k (Spark/DuckDB ntile contract)
    k = HIST_BINS
    # greatest(n div k, 1): when n < k the CASE's THEN branch always
    # fires (rk <= n = (n % k) * 1), but the ELSE divisor must still be
    # nonzero so the expression survives spark.sql.ansi.enabled, which
    # evaluates-and-throws rather than null-on-divide-by-zero
    # (ADVICE r12)
    ranked = (rk.crossJoin(F.broadcast(n_df))
              .select("o_totalprice", F.expr(
                  f"1 + CASE WHEN rk <= (n % {k}) * (n div {k} + 1)"
                  f" THEN (rk - 1) div (n div {k} + 1)"
                  f" ELSE n % {k} + (rk - 1 - (n % {k})"
                  f" * (n div {k} + 1)) div greatest(n div {k}, 1) END")
                  .alias("bin")))
    return (ranked.groupBy(F.col("bin").cast("bigint").alias("bin"))
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi")))


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test: compare the document-length
# distribution of two source cohorts — the distribution-drift monitor a
# data pipeline runs when a crawl source changes behavior between
# snapshots.
#
# Exactness: the empirical CDFs are running sums of exact integer
# counts over the DISTINCT length values (the corpus compresses to
# <= |distinct lengths| rows before any window), so the KS statistic is
# a max over |count_ratio - count_ratio| doubles computed identically
# in both engines; max is order-insensitive. Scale note: the
# single-partition window runs over the compressed value domain, not
# the corpus — for unbounded domains, pre-bin to a fixed grid first.
# ---------------------------------------------------------------------------

KS_ALPHA_C = "1.358"   # c(alpha) at alpha = 0.05 (two-sided)


@query(
    "stats_ks_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT n_chars,
             CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                  THEN 'a' ELSE 'b' END AS cohort
      FROM documents
    ),
    vals AS (
      SELECT n_chars,
             SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS cb
      FROM tagged GROUP BY 1
    ),
    tot AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb FROM vals
    ),
    ecdf AS (
      SELECT n_chars,
             SUM(ca) OVER (ORDER BY n_chars) AS cum_a,
             SUM(cb) OVER (ORDER BY n_chars) AS cum_b
      FROM vals
    )
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           round(MAX(abs(CAST(e.cum_a AS DOUBLE) / t.na
                         - CAST(e.cum_b AS DOUBLE) / t.nb)), 6) AS ks_stat,
           round({KS_ALPHA_C} * sqrt((t.na + t.nb)
                 / (CAST(t.na AS DOUBLE) * t.nb)), 6) AS critical_005,
           CAST(MAX(abs(CAST(e.cum_a AS DOUBLE) / t.na
                        - CAST(e.cum_b AS DOUBLE) / t.nb))
                > {KS_ALPHA_C} * sqrt((t.na + t.nb)
                  / (CAST(t.na AS DOUBLE) * t.nb)) AS BOOLEAN) AS drifted
    FROM ecdf e CROSS JOIN tot t
    GROUP BY t.na, t.nb
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cohort = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0,
        "a").otherwise("b")
    vals = (docs.select("n_chars", cohort.alias("cohort"))
            .groupBy("n_chars")
            .agg(F.sum(F.when(F.col("cohort") == "a", 1).otherwise(0))
                 .alias("ca"),
                 F.sum(F.when(F.col("cohort") == "b", 1).otherwise(0))
                 .alias("cb")))
    tot = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = (Window.orderBy("n_chars")
         .rowsBetween(Window.unboundedPreceding, 0))
    ecdf = vals.select(
        "n_chars",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"))
    d = F.abs(F.col("cum_a").cast("double") / F.col("na")
              - F.col("cum_b").cast("double") / F.col("nb"))
    crit = (F.expr(KS_ALPHA_C)
            * F.sqrt((F.col("na") + F.col("nb"))
                     / (F.col("na").cast("double") * F.col("nb"))))
    return (ecdf.crossJoin(F.broadcast(tot))
            .groupBy(F.col("na").cast("bigint").alias("n_a"),
                     F.col("nb").cast("bigint").alias("n_b"))
            .agg(F.round(F.max(d), 6).alias("ks_stat"),
                 F.round(F.first(crit), 6).alias("critical_005"),
                 (F.max(d) > F.first(crit)).alias("drifted")))


# ---------------------------------------------------------------------------
# Gini concentration of customer revenue — the inequality read behind
# "top 1% of customers drive X% of GMV" (and, in the curation setting,
# source-concentration of a corpus). Exact: revenue rides as
# DECIMAL(18,2), ranks are a total order (revenue, custkey), the
# weighted sum i*x_i accumulates as DECIMAL(38,2), and the Gini formula
# G = (2*S_ix)/(n*S_x) - (n+1)/n drops to double only at the end.
# Scale note: the global rank is the same exact-audit posture as
# stats_histogram_equi_depth — at 100 TB, bucket by approx percentile
# and compute the within-bucket correction.
# ---------------------------------------------------------------------------

@query(
    "stats_gini_revenue",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i
      FROM per_cust
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(rev) AS s,
             SUM(CAST(i AS DECIMAL(19,0)) * rev) AS si
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(s AS DOUBLE) AS total_revenue,
           round(2.0 * CAST(si AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
             AS gini
    FROM m
    """,
)
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .alias("rev")))
    ranked = per_cust.select(
        "rev", F.row_number().over(
            Window.orderBy("rev", "o_custkey")).alias("i"))
    m = ranked.agg(
        F.count("*").alias("n"), F.sum("rev").alias("s"),
        F.sum(F.col("i").cast("decimal(19,0)") * F.col("rev"))
         .alias("si"))
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        s_d.alias("total_revenue"),
        F.round(2.0 * F.col("si").cast("double") / (n_d * s_d)
                - (n_d + 1.0) / n_d, 6).alias("gini"))


# ---------------------------------------------------------------------------
# Benford first-digit audit: observed first-significant-digit shares of
# o_totalprice vs the Benford expectation log10(1 + 1/d) with a
# chi-square distance — the classic books-cooking / synthetic-data
# smell test a warehouse runs on money columns. Exact digit counts
# (string head of the absolute value), expectation as literal doubles
# identical in both engines, 6-dp boundary rounds.
# ---------------------------------------------------------------------------

@query(
    "stats_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT)
                         AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, COUNT(*) AS ct FROM digits GROUP BY 1),
    tot AS (SELECT SUM(ct) AS n FROM obs)
    SELECT o.d AS first_digit,
           CAST(o.ct AS BIGINT) AS observed_ct,
           round(CAST(o.ct AS DOUBLE) / t.n, 6) AS observed_share,
           round(log10(1.0 + 1.0 / o.d), 6) AS benford_share,
           round((CAST(o.ct AS DOUBLE) / t.n - log10(1.0 + 1.0 / o.d))
                 * (CAST(o.ct AS DOUBLE) / t.n - log10(1.0 + 1.0 / o.d))
                 / log10(1.0 + 1.0 / o.d), 6) AS chi2_term
    FROM obs o CROSS JOIN tot t
    """,
)
def stats_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # floor, not a bare double->bigint cast: DuckDB CAST rounds
    # half-even while Spark truncates — floor is identical in both
    d = (F.substring(F.floor(F.abs(F.col("o_totalprice")))
                     .cast("bigint").cast("string"), 1, 1).cast("bigint"))
    obs = (orders.filter(F.col("o_totalprice") >= 1)
           .groupBy(d.alias("d")).agg(F.count("*").alias("ct")))
    tot = obs.agg(F.sum("ct").alias("n"))
    share = F.col("ct").cast("double") / F.col("n")
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return (obs.crossJoin(F.broadcast(tot))
            .select(F.col("d").alias("first_digit"),
                    F.col("ct").cast("bigint").alias("observed_ct"),
                    F.round(share, 6).alias("observed_share"),
                    F.round(benford, 6).alias("benford_share"),
                    F.round((share - benford) * (share - benford)
                            / benford, 6).alias("chi2_term")))


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of hourly event counts — the time-series health
# read (near-zero for memoryless arrivals, high for bursty/diurnal
# load) that decides whether capacity planning can assume Poisson.
# Hourly counts are exact; the lag join is on the hour bucket
# (bucket+1 = next hour, missing hours skipped like the oracle); the
# correlation runs over exact DECIMAL moment sums with double only in
# the final formula (same discipline as stats_regression_trend).
# ---------------------------------------------------------------------------

@query(
    "stats_hourly_autocorr",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             COUNT(*) AS ct
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.ct AS x, b.ct AS y
      FROM hourly a JOIN hourly b ON b.h = a.h + 1
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_hour_pairs,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS lag1_autocorr
    FROM m
    """,
)
def stats_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = (events.groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint").alias("h"))
        .agg(F.count("*").alias("ct")))
    nxt = hourly.select((F.col("h") - 1).alias("h"),
                        F.col("ct").alias("y"))
    pairs = (hourly.join(nxt, "h")
             .select(F.col("ct").alias("x"), "y"))
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"))
    n_d = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_hour_pairs"),
        F.round((n_d * sxy - sx * sy)
                / F.sqrt((n_d * sxx - sx * sx) * (n_d * syy - sy * sy)),
                6).alias("lag1_autocorr"))


# ---------------------------------------------------------------------------
# Mann-Whitney U drift test (rank-based): the nonparametric companion
# to stats_ks_drift over the same two source cohorts — KS reacts to any
# CDF gap, U to a location shift; a pipeline monitors both. Average
# ranks with tie correction.
#
# Exactness: ranks are computed over the COMPRESSED value domain
# (distinct n_chars with per-cohort counts), and the doubled rank sum
# 2*R_a = sum(ca * (2*cum_before + ct + 1)) is pure BIGINT — no float
# enters until the final z formula, which is identical literal ops in
# both engines. Scale: two-phase count agg compresses the corpus to
# |distinct lengths| rows before the (tiny) ranking window.
# ---------------------------------------------------------------------------

@query(
    "stats_mannwhitney_drift",
    oracle="""
    WITH tagged AS (
      SELECT n_chars AS v,
             CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                  THEN 'a' ELSE 'b' END AS cohort
      FROM documents
    ),
    vals AS (
      SELECT v,
             CAST(SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM tagged GROUP BY 1
    ),
    ranked AS (
      SELECT v, ca, cb, ca + cb AS ct,
             COALESCE(SUM(ca + cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS cum
      FROM vals
    ),
    m AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * (2 * cum + ct + 1)) AS BIGINT) AS r2a,
             CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT na AS n_a, nb AS n_b,
      round((CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE)
             * (CAST(na AS DOUBLE) + 1.0)) / 2.0, 6) AS u_stat,
      round(((CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE)
              * (CAST(na AS DOUBLE) + 1.0)) / 2.0
             - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
            / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                   * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0)
                      - CAST(ties AS DOUBLE)
                        / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                           * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)
                              - 1.0)))), 6) AS z_score
    FROM m
    """,
)
def stats_mannwhitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cohort = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, "a").otherwise("b")
    vals = (docs.select(F.col("n_chars").alias("v"), cohort.alias("cohort"))
            .groupBy("v")
            .agg(F.sum(F.when(F.col("cohort") == "a", 1).otherwise(0))
                 .cast("bigint").alias("ca"),
                 F.sum(F.when(F.col("cohort") == "b", 1).otherwise(0))
                 .cast("bigint").alias("cb")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = (vals.withColumn("ct", F.col("ca") + F.col("cb"))
              .withColumn("cum", F.coalesce(
                  F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))))
    m = ranked.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("cum") + F.col("ct") + 1))
         .cast("bigint").alias("r2a"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
         .cast("bigint").alias("ties"))
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    r2a = F.col("r2a").cast("double")
    ties = F.col("ties").cast("double")
    u = (r2a - na * (na + F.lit(1.0))) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma = F.sqrt(na * nb / F.lit(12.0)
                   * ((na + nb + F.lit(1.0))
                      - ties / ((na + nb) * (na + nb - F.lit(1.0)))))
    return m.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.round(u, 6).alias("u_stat"),
        F.round((u - mu) / sigma, 6).alias("z_score"))


# ---------------------------------------------------------------------------
# Chi-square independence test: event_type x day-of-week contingency —
# "is traffic mix independent of weekday?", the categorical-drift
# check next to the numeric KS/U monitors.
#
# Exactness: observed/marginal counts are exact integers; each cell's
# (o-e)^2/e term is rounded to 6 dp FIRST and summed as DECIMAL(18,6)
# (exact, order-insensitive) — the same discipline as the OLS ln sums.
# Scale: the corpus compresses to |types| x 7 cells in one two-phase
# agg; everything after is over <= ~60 rows.
# ---------------------------------------------------------------------------

@query(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    ex AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS rt,
             SUM(o) OVER (PARTITION BY dow) AS ctot,
             SUM(o) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT o, rt, ctot, n,
             CAST(round(
               (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ctot AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ctot AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ctot AS DOUBLE)
                  / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term,
             event_type, dow
      FROM ex
    )
    SELECT round(CAST(SUM(term) AS DOUBLE), 6) AS chi2_stat,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n_events
    FROM terms
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Spark dayofweek: 1 = Sunday; DuckDB: 0 = Sunday — align to DuckDB
    cells = (events.groupBy("event_type",
                            (F.dayofweek("ts") - 1).alias("dow"))
             .agg(F.count("*").alias("o")))
    ex = (cells
          .withColumn("rt", F.sum("o").over(
              Window.partitionBy("event_type")))
          .withColumn("ctot", F.sum("o").over(Window.partitionBy("dow")))
          .withColumn("n", F.sum("o").over(
              Window.partitionBy(F.lit(1)))))
    o_d = F.col("o").cast("double")
    e = (F.col("rt").cast("double") * F.col("ctot").cast("double")
         / F.col("n").cast("double"))
    terms = ex.withColumn(
        "term", F.round((o_d - e) * (o_d - e) / e, 6).cast("decimal(18,6)"))
    return terms.agg(
        F.round(F.sum("term").cast("double"), 6).alias("chi2_stat"),
        ((F.countDistinct("event_type") - 1)
         * (F.countDistinct("dow") - 1)).cast("bigint").alias("dof"),
        F.max("n").cast("bigint").alias("n_events"))


# ---------------------------------------------------------------------------
# CUSUM changepoint scan over daily GMV: the day where the cumulative
# deviation from the global mean peaks — the classic single-changepoint
# locator a monitoring pipeline runs on a KPI series.
#
# Exactness: daily sums and their prefix sums stay DECIMAL end-to-end;
# the only float is cusum_i = CAST(prefix_i) - i * (CAST(total) / n),
# identical literal ops per row in both engines (no float accumulation
# across rows). Argmax carries a day tie-break. Scale: the corpus-sized
# stage is the one two-phase daily agg; the scan window runs over
# |days| rows.
# ---------------------------------------------------------------------------

@query(
    "stats_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS g
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT d, g,
             SUM(g) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS pre,
             ROW_NUMBER() OVER (ORDER BY d) AS i,
             SUM(g) OVER () AS total,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    cus AS (
      SELECT d, i, n,
             CAST(pre AS DOUBLE)
             - CAST(i AS DOUBLE) * (CAST(total AS DOUBLE)
                                    / CAST(n AS DOUBLE)) AS cusum
      FROM pre
    )
    SELECT d AS cp_day, round(cusum, 6) AS cusum_at_cp,
           CAST(n AS BIGINT) AS n_days
    FROM cus
    ORDER BY abs(cusum) DESC, d LIMIT 1
    """,
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .alias("g")))
    w_run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(F.lit(1))
    pre = (daily
           .withColumn("pre", F.sum("g").over(w_run))
           .withColumn("i", F.row_number().over(Window.orderBy("d")))
           .withColumn("total", F.sum("g").over(w_all))
           .withColumn("n", F.count("*").over(w_all)))
    cusum = (F.col("pre").cast("double")
             - F.col("i").cast("double")
             * (F.col("total").cast("double") / F.col("n").cast("double")))
    return (pre.select(F.col("d").alias("cp_day"),
                       F.round(cusum, 6).alias("cusum_at_cp"),
                       F.col("n").cast("bigint").alias("n_days"),
                       cusum.alias("_c"))
            .orderBy(F.abs(F.col("_c")).desc(), "cp_day").limit(1)
            .drop("_c"))


# ---------------------------------------------------------------------------
# Theil-Sen robust trend of daily GMV: median of all pairwise slopes —
# outlier-resistant where OLS (stats_regression_trend) is not; the pair
# a monitoring pipeline keeps side by side (divergence = heavy-tailed
# days dragging OLS).
#
# Scale note: the pair set is O(|days|^2) over the DAY DOMAIN (~2.9M
# pairs for 6.5 years), CONSTANT in corpus size — the corpus-sized
# stage is the one two-phase daily agg. Slopes are identical double
# expressions per pair; the median is an exact order statistic with a
# full (slope, i, j) tie-break, so the selection is a total order in
# both engines.
# ---------------------------------------------------------------------------

@query(
    "stats_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS g
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT d, g, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    slopes AS (
      SELECT a.i AS ia, b.i AS ib,
             (CAST(b.g AS DOUBLE) - CAST(a.g AS DOUBLE))
             / (b.i - a.i) AS s
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, ia, ib) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    )
    SELECT round(s, 6) AS slope_median,
           CAST(n AS BIGINT) AS n_pairs
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def stats_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .alias("g")))
    idx = daily.withColumn("i", F.row_number().over(Window.orderBy("d")))
    a = idx.select(F.col("i").alias("ia"), F.col("g").alias("ga"))
    b = idx.select(F.col("i").alias("ib"), F.col("g").alias("gb"))
    slopes = (a.join(b, F.col("ib") > F.col("ia"))
              .select("ia", "ib",
                      ((F.col("gb").cast("double")
                        - F.col("ga").cast("double"))
                       / (F.col("ib") - F.col("ia"))).alias("s")))
    w_all = Window.partitionBy(F.lit(1))
    ranked = (slopes
              .withColumn("rn", F.row_number().over(
                  Window.orderBy("s", "ia", "ib")))
              .withColumn("n", F.count("*").over(w_all)))
    return (ranked.filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select(F.round("s", 6).alias("slope_median"),
                    F.col("n").cast("bigint").alias("n_pairs")))


# ---------------------------------------------------------------------------
# Table profile: per-column null count, exact distinct count, min/max —
# the completeness/cardinality read every warehouse runs before
# trusting a new snapshot (and the stats a cost-based planner wants).
# ONE corpus pass computes every metric (a single multi-agg row);
# formatting pins cross-engine text: numerics via DECIMAL casts,
# timestamps via an explicit format string.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority")


def _profile_minmax_sql(c: str, fn: str) -> str:
    if c == "o_totalprice":
        return f"CAST(CAST({fn}({c}) AS DECIMAL(18,2)) AS VARCHAR)"
    if c == "o_orderdate":
        return f"strftime({fn}({c}), '%Y-%m-%d %H:%M:%S')"
    return f"CAST({fn}({c}) AS VARCHAR)"


def _profile_oracle() -> str:
    aggs = ["COUNT(*) AS n_rows"]
    for c in _PROFILE_COLS:
        aggs += [
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"{_profile_minmax_sql(c, 'MIN')} AS mn_{c}",
            f"{_profile_minmax_sql(c, 'MAX')} AS mx_{c}",
        ]
    branches = "\n    UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(n_rows AS BIGINT) AS n_rows, "
        f"CAST(nn_{c} AS BIGINT) AS n_nulls, "
        f"CAST(nd_{c} AS BIGINT) AS n_distinct, "
        f"mn_{c} AS min_str, mx_{c} AS max_str FROM m"
        for c in _PROFILE_COLS)
    return f"""
    WITH m AS MATERIALIZED (SELECT {", ".join(aggs)} FROM orders)
    {branches}
    """


@query("stats_table_profile", oracle=_profile_oracle())
def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def mm(c: str, fn):
        if c == "o_totalprice":
            return fn(c).cast("decimal(18,2)").cast("string")
        if c == "o_orderdate":
            return F.date_format(fn(c), "yyyy-MM-dd HH:mm:ss")
        return fn(c).cast("string")

    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            mm(c, F.min).alias(f"mn_{c}"),
            mm(c, F.max).alias(f"mx_{c}"),
        ]
    m = orders.agg(*aggs).localCheckpoint()   # one corpus pass
    out = None
    for c in _PROFILE_COLS:
        row = m.select(
            F.lit(c).alias("column_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col(f"nn_{c}").cast("bigint").alias("n_nulls"),
            F.col(f"nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_str"),
            F.col(f"mx_{c}").alias("max_str"))
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Spearman rank correlation between per-user activity (event count) and
# per-user spend (summed value): "do my most active users spend most?"
# — the monotone-association readout Pearson (stats_price_qty_corr)
# misses under non-linear engagement curves.
#
# Exactness: ties get AVERAGE ranks; the doubled average rank
# 2·avgrank = 2·RANK() + |ties| − 1 is an INTEGER, so the centered
# deviations d = 2·avgrank − (n+1) and all three cross-sums Σdxdy,
# Σdx², Σdy² stay BIGINT (|d| ≤ n keeps Σ under 2^63 to n ≈ 2 M users;
# beyond that the sums move to DECIMAL(38,0) unchanged). The only
# floats are the two final sqrts — identical IEEE ops in both engines.
# Spend sums are per-value DECIMAL(18,6) casts (exact, order-free).
#
# Scale: the corpus-sized stage is the per-user two-phase agg; ranks
# run over |users| rows. The global ORDER BY in the rank window is the
# textbook single-partition pinch at extreme |users| — the fix (range-
# partitioned two-phase ranking, offsets from partition counts) is
# mechanical and orthogonal to the statistic; Catalyst's rangepartition
# sort handles the sizes tested here.
# ---------------------------------------------------------------------------

@query(
    "stats_spearman_corr",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS a,
             SUM(CAST(value AS DECIMAL(18,6))) AS b
      FROM events GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_user),
    ranked AS (
      SELECT
        2 * RANK() OVER (ORDER BY a) - 1
          + COUNT(*) OVER (PARTITION BY a) AS dra,
        2 * RANK() OVER (ORDER BY b) - 1
          + COUNT(*) OVER (PARTITION BY b) AS drb
      FROM per_user
    ),
    d AS (
      SELECT CAST(dra - (SELECT n FROM n) - 1 AS BIGINT) AS dx,
             CAST(drb - (SELECT n FROM n) - 1 AS BIGINT) AS dy
      FROM ranked
    )
    SELECT (SELECT n FROM n) AS n_users,
           CAST(SUM(dx * dy) AS BIGINT) AS sxy,
           round(CAST(SUM(dx * dy) AS DOUBLE)
                 / (sqrt(CAST(SUM(dx * dx) AS DOUBLE))
                    * sqrt(CAST(SUM(dy * dy) AS DOUBLE))), 6)
             AS spearman_rho
    FROM d
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_user = (events.groupBy("user_id")
                .agg(F.count("*").alias("a"),
                     F.sum(F.col("value").cast("decimal(18,6)"))
                     .alias("b")))
    # doubled average rank: 2·RANK − 1 + tie-group size (an integer)
    dra = (2 * F.rank().over(Window.orderBy("a")) - 1
           + F.count("*").over(Window.partitionBy("a")))
    drb = (2 * F.rank().over(Window.orderBy("b")) - 1
           + F.count("*").over(Window.partitionBy("b")))
    ranked = per_user.select(dra.alias("dra"), drb.alias("drb"))
    nrow = per_user.agg(F.count("*").cast("bigint").alias("n"))
    d = (ranked.crossJoin(F.broadcast(nrow))
         .select("n",
                 (F.col("dra") - F.col("n") - 1).cast("bigint").alias("dx"),
                 (F.col("drb") - F.col("n") - 1).cast("bigint").alias("dy")))
    sxy = F.sum(F.col("dx") * F.col("dy"))
    return d.agg(
        F.max("n").alias("n_users"),
        sxy.cast("bigint").alias("sxy"),
        F.round(sxy.cast("double")
                / (F.sqrt(F.sum(F.col("dx") * F.col("dx")).cast("double"))
                   * F.sqrt(F.sum(F.col("dy") * F.col("dy"))
                            .cast("double"))), 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Mutual information (and entropies) of the source × lang contingency:
# how much knowing a document's source tells you about its language —
# the information-theoretic companion to stats_chi2_independence
# (chi2 answers "is there association"; MI answers "how many nats").
# A curation pipeline reads this as a mixture-diversity audit: near-zero
# MI means languages are spread evenly over sources; high MI means
# language coverage collapses when a source is dropped.
#
# Exactness (the chi2 discipline): all counts are exact integers; each
# per-cell term (p·ln terms) is computed in identical double ops, then
# rounded to 6 dp and summed as DECIMAL(18,6) — order-insensitive.
# Scale: one two-phase count over the corpus; everything after runs on
# |sources|×|langs| cells.
# ---------------------------------------------------------------------------

@query(
    "stats_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ),
    ex AS (
      SELECT source, lang, o,
             SUM(o) OVER (PARTITION BY source) AS rt,
             SUM(o) OVER (PARTITION BY lang) AS ct,
             SUM(o) OVER () AS n
      FROM cells
    ),
    mi_terms AS (
      SELECT CAST(round(
        (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
        * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), 6)
        AS DECIMAL(18,6)) AS term
      FROM ex
    ),
    hs_terms AS (
      SELECT CAST(round(
        -(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
        * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        AS DECIMAL(18,6)) AS term
      FROM (SELECT source, COUNT(*) AS rt,
                   CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n
            FROM documents GROUP BY 1)
    ),
    hl_terms AS (
      SELECT CAST(round(
        -(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        AS DECIMAL(18,6)) AS term
      FROM (SELECT lang, COUNT(*) AS ct,
                   CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n
            FROM documents GROUP BY 1)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells,
      (SELECT round(CAST(SUM(term) AS DOUBLE), 6) FROM mi_terms)
        AS mi_nats,
      (SELECT round(CAST(SUM(term) AS DOUBLE), 6) FROM hs_terms)
        AS h_source_nats,
      (SELECT round(CAST(SUM(term) AS DOUBLE), 6) FROM hl_terms)
        AS h_lang_nats,
      round((SELECT CAST(SUM(term) AS DOUBLE) FROM mi_terms)
            / LEAST((SELECT CAST(SUM(term) AS DOUBLE) FROM hs_terms),
                    (SELECT CAST(SUM(term) AS DOUBLE) FROM hl_terms)),
            6) AS nmi
    """,
)
def stats_mutual_information(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").alias("o"))
    ex = (cells
          .withColumn("rt", F.sum("o").over(Window.partitionBy("source")))
          .withColumn("ct", F.sum("o").over(Window.partitionBy("lang")))
          .withColumn("n", F.sum("o").over(Window.partitionBy(F.lit(1)))))
    od, nd = F.col("o").cast("double"), F.col("n").cast("double")
    rtd, ctd = F.col("rt").cast("double"), F.col("ct").cast("double")
    mi_t = ex.select(F.round(
        (od / nd) * F.log(od * nd / (rtd * ctd)), 6)
        .cast("decimal(18,6)").alias("term"))

    def _marg_entropy(col: str) -> DataFrame:
        m = (docs.groupBy(col).agg(F.count("*").alias("c"))
             .withColumn("n", F.sum("c").over(Window.partitionBy(F.lit(1)))))
        p = F.col("c").cast("double") / F.col("n").cast("double")
        return m.select(F.round(-p * F.log(p), 6)
                        .cast("decimal(18,6)").alias("term"))

    mi = mi_t.agg(F.sum("term").cast("double").alias("v"))
    hs = _marg_entropy("source").agg(
        F.sum("term").cast("double").alias("v"))
    hl = _marg_entropy("lang").agg(
        F.sum("term").cast("double").alias("v"))
    nc = cells.agg(F.count("*").cast("bigint").alias("n_cells"))
    return (nc.crossJoin(F.broadcast(mi.select(F.col("v").alias("mi"))))
            .crossJoin(F.broadcast(hs.select(F.col("v").alias("hs"))))
            .crossJoin(F.broadcast(hl.select(F.col("v").alias("hl"))))
            .select("n_cells",
                    F.round("mi", 6).alias("mi_nats"),
                    F.round("hs", 6).alias("h_source_nats"),
                    F.round("hl", 6).alias("h_lang_nats"),
                    F.round(F.col("mi")
                            / F.least("hs", "hl"), 6).alias("nmi")))


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test: the parametric partner of the
# Mann-Whitney drift test above — compares MEANS of two slices (click
# vs purchase event values) without assuming equal variances, with the
# Welch–Satterthwaite degrees of freedom. Determinism contract: the
# per-group (n, Σx, Σx²) come out of EXACT DECIMAL sums (value has 2dp
# → x² has 4dp, both representable), so the double-precision t/df
# arithmetic starts from bit-identical inputs in both engines; the
# final statistics are rounded to 6dp at the compare boundary.
#
# Scale shape: one map-side-combined aggregation over the fact table —
# the same two-phase moment pattern as every stats_* operator here.
# ---------------------------------------------------------------------------

@query(
    "stats_welch_ttest",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    g AS (
      SELECT
        MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'click' THEN s1 END) AS a1,
        MAX(CASE WHEN event_type = 'click' THEN s2 END) AS q1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a2,
        MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS q2
      FROM m
    ),
    d AS (
      SELECT n1, n2,
             a1 / n1 AS m1, a2 / n2 AS m2,
             (q1 - a1 * a1 / n1) / (n1 - 1) AS v1,
             (q2 - a2 * a2 / n2) / (n2 - 1) AS v2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase,
           round(m1, 6) AS mean_click,
           round(m2, 6) AS mean_purchase,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 6) AS welch_df
    FROM d
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("click", "purchase"))
          .select("event_type", F.col("value").cast("decimal(18,2)")
                  .alias("v")))
    m = (ev.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("v").cast("double").alias("s1"),
              F.sum(F.col("v") * F.col("v")).cast("double").alias("s2")))
    g = m.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s2"))).alias("q1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s1"))).alias("a2"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s2"))).alias("q2"))
    d = g.select(
        "n1", "n2",
        (F.col("a1") / F.col("n1")).alias("m1"),
        (F.col("a2") / F.col("n2")).alias("m2"),
        ((F.col("q1") - F.col("a1") * F.col("a1") / F.col("n1"))
         / (F.col("n1") - 1)).alias("v1"),
        ((F.col("q2") - F.col("a2") * F.col("a2") / F.col("n2"))
         / (F.col("n2") - 1)).alias("v2"))
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return d.select(
        F.col("n1").cast("bigint").alias("n_click"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        F.round("m1", 6).alias("mean_click"),
        F.round("m2", 6).alias("mean_purchase"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6)
         .alias("t_stat"),
        F.round(F.pow(se2, 2)
                / (F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                   + F.pow(F.col("v2") / F.col("n2"), 2)
                   / (F.col("n2") - 1)), 6).alias("welch_df"))


# ---------------------------------------------------------------------------
# One-way ANOVA across ALL event types (k groups): does the event type
# explain variance in value? Generalizes the two-sample Welch test
# above. Determinism: per-group (n, Σx, Σx²) are exact decimals; the
# per-group SSB/SSW terms are computed in double from those exact
# inputs, ROUNDED to 6dp, then summed as DECIMAL(38,6) so the
# cross-group accumulation is order-insensitive (groupBy emission order
# differs between engines).
# ---------------------------------------------------------------------------

@query(
    "stats_anova_oneway",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(n) AS DOUBLE) AS gm
      FROM m
    ),
    terms AS (
      SELECT CAST(SUM(CAST(round(n * (s / n - g.gm) * (s / n - g.gm), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS ssb,
             CAST(SUM(CAST(round(q - s * s / n, 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS ssw
      FROM m, g
    )
    SELECT g.k AS k_groups, g.n_total,
           CAST(g.k - 1 AS BIGINT) AS df_between,
           CAST(g.n_total - g.k AS BIGINT) AS df_within,
           round((t.ssb / (g.k - 1)) / (t.ssw / (g.n_total - g.k)), 6)
             AS f_stat
    FROM g, terms t
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type",
                  F.col("value").cast("decimal(18,2)").alias("v")))
    m = (ev.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("v").cast("double").alias("s"),
              F.sum(F.col("v") * F.col("v")).cast("double").alias("q")))
    g = m.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        (F.sum(F.col("s").cast("decimal(38,6)")).cast("double")
         / F.sum("n").cast("double")).alias("gm"))
    terms = (m.crossJoin(F.broadcast(g))
             .select(
                 F.round(F.col("n") * (F.col("s") / F.col("n") - F.col("gm"))
                         * (F.col("s") / F.col("n") - F.col("gm")), 6)
                  .cast("decimal(38,6)").alias("ssb_t"),
                 F.round(F.col("q") - F.col("s") * F.col("s") / F.col("n"), 6)
                  .cast("decimal(38,6)").alias("ssw_t"))
             .agg(F.sum("ssb_t").cast("double").alias("ssb"),
                  F.sum("ssw_t").cast("double").alias("ssw")))
    return (g.crossJoin(F.broadcast(terms))
            .select(F.col("k").alias("k_groups"), "n_total",
                    (F.col("k") - 1).cast("bigint").alias("df_between"),
                    (F.col("n_total") - F.col("k")).cast("bigint")
                     .alias("df_within"),
                    F.round((F.col("ssb") / (F.col("k") - 1))
                            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
                            6).alias("f_stat")))


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily GMV vs its median: is the series'
# above/below-median pattern random, or does it trend/cluster (the
# nonparametric cousin of the CUSUM changepoint scan — CUSUM locates a
# shift, the runs test detects serial dependence)? Everything up to the
# z-statistic is integer/decimal-exact: daily GMV is a DECIMAL sum, the
# median is the exact lower-median row, runs/n1/n2 are counts; ties at
# the median are excluded per the standard test.
# ---------------------------------------------------------------------------

@query(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gmv
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT gmv AS m FROM (
        SELECT gmv, ROW_NUMBER() OVER (ORDER BY gmv, d) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE rn = (n + 1) // 2
    ),
    signs AS (
      SELECT d, CASE WHEN gmv > m THEN 1 ELSE 0 END AS s
      FROM daily, med WHERE gmv <> m
    ),
    runs AS (
      SELECT s, CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                     OR LAG(s) OVER (ORDER BY d) <> s
                     THEN 1 ELSE 0 END AS is_new
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(is_new) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           round(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))),
                 6) AS z_stat
    FROM agg
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The unpartitioned windows below (median rank, lag over days) run
    # over the DAY-GRAIN series — bounded domain (~2.4k rows even for a
    # decade of data), a single small task by design.
    from pyspark.sql import Window

    daily = (load_table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("gmv")))
    wmed = Window.orderBy("gmv", "d")
    med = (daily.select("gmv",
                        F.row_number().over(wmed).alias("rn"),
                        F.count("*").over(
                            Window.partitionBy(F.lit(1))).alias("n"))
           .filter(F.col("rn") == F.expr("div(n + 1, 2)"))
           .select(F.col("gmv").alias("m")))
    signs = (daily.crossJoin(F.broadcast(med))
             .filter(F.col("gmv") != F.col("m"))
             .select("d", F.when(F.col("gmv") > F.col("m"), 1)
                     .otherwise(0).alias("s")))
    wd = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(F.lag("s").over(wd).isNull()
               | (F.lag("s").over(wd) != F.col("s")), 1)
         .otherwise(0).alias("is_new"))
    agg = runs.agg(F.sum("is_new").cast("bigint").alias("r"),
                   F.sum("s").cast("bigint").alias("n1"),
                   (F.count("*") - F.sum("s")).cast("bigint").alias("n2"))
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1)))
    return agg.select(r.alias("n_runs"), n1.alias("n_above"),
                      n2.alias("n_below"),
                      F.round(er, 6).alias("expected_runs"),
                      F.round((r - er) / F.sqrt(var), 6).alias("z_stat"))


# ---------------------------------------------------------------------------
# Day-of-week seasonality index: mean daily GMV per weekday divided by
# the overall mean daily GMV — the multiplicative seasonal profile a
# forecasting pipeline divides out before trend fitting. Exact decimal
# daily sums; the dow convention is aligned to DuckDB's 0=Sunday (Spark
# dayofweek is 1=Sunday, so subtract 1).
# ---------------------------------------------------------------------------

@query(
    "ads_seasonality_dow_index",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS gmv
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(gmv) AS DOUBLE) / COUNT(*) AS overall_mean FROM daily
    ),
    per AS (
      SELECT CAST(dayofweek(d) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(gmv) AS DOUBLE) / COUNT(*) AS dow_mean
      FROM daily GROUP BY 1
    )
    SELECT p.dow, p.n_days, round(p.dow_mean, 6) AS dow_mean,
           round(p.dow_mean / t.overall_mean, 6) AS seasonal_index
    FROM per p, tot t
    """,
)
def ads_seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (load_table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(38,2)").alias("gmv")))
    tot = daily.agg((F.sum("gmv").cast("double")
                     / F.count("*")).alias("overall_mean"))
    per = (daily.groupBy((F.dayofweek("d") - 1).cast("bigint").alias("dow"))
           .agg(F.count("*").cast("bigint").alias("n_days"),
                (F.sum("gmv").cast("double") / F.count("*"))
                .alias("dow_mean")))
    return (per.crossJoin(F.broadcast(tot))
            .select("dow", "n_days",
                    F.round("dow_mean", 6).alias("dow_mean"),
                    F.round(F.col("dow_mean") / F.col("overall_mean"), 6)
                     .alias("seasonal_index")))


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan foreign keys across the schema's
# load-bearing relationships — the data-quality gate an ingest runs
# before joins silently drop (inner) or null-pad (outer) unmatched
# rows. Each relationship is one left-anti join; counts are exact.
# ---------------------------------------------------------------------------

@query(
    "quality_referential_integrity",
    oracle="""
    SELECT 'events.user_id->customer' AS relationship,
           (SELECT COUNT(*) FROM events) AS fact_rows,
           CAST((SELECT COUNT(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = e.user_id))
                AS BIGINT) AS orphan_rows,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = e.user_id))
                AS BIGINT) AS orphan_keys
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT COUNT(*) FROM lineitem),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    """,
)
def quality_referential_integrity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    def audit(name, fact, fk, dim, pk):
        orphans = fact.join(dim, fact[fk] == dim[pk], "left_anti")
        return (fact.agg(F.count("*").alias("fact_rows"))
                .crossJoin(F.broadcast(
                    orphans.agg(
                        F.count("*").cast("bigint").alias("orphan_rows"),
                        F.countDistinct(fk).cast("bigint")
                         .alias("orphan_keys"))))
                .select(F.lit(name).alias("relationship"), "fact_rows",
                        "orphan_rows", "orphan_keys"))

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (audit("events.user_id->customer", ev, "user_id",
                  cust, "c_custkey")
            .unionByName(audit("orders.o_custkey->customer", orders,
                               "o_custkey", cust, "c_custkey"))
            .unionByName(audit("lineitem.l_orderkey->orders", li,
                               "l_orderkey", orders, "o_orderkey")))


# ---------------------------------------------------------------------------
# Order-total consistency audit: does o_totalprice equal the rollup of
# its lines (Σ extendedprice · (1+tax) · (1−discount))? The classic
# cross-table invariant check an ingest runs alongside the referential
# audit above — on real data a drift here means a partial load or a
# currency/rounding bug. All terms are cast to DECIMAL before the
# multiply, so both engines do the same exact arithmetic; the verdict
# uses a 1-cent tolerance. (On this synthetic data the invariant does
# NOT hold — the audit's job is to report that, exactly.)
# ---------------------------------------------------------------------------

@query(
    "quality_order_total_consistency",
    oracle="""
    WITH rolled AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 + CAST(l_tax AS DECIMAL(8,2)))
                 * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS line_total
      FROM lineitem GROUP BY 1
    ),
    cmp AS (
      SELECT o.o_orderstatus,
             ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - r.line_total)
               AS adiff
      FROM orders o JOIN rolled r ON r.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN adiff > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatch,
           CAST(round(MAX(adiff), 2) AS DOUBLE) AS max_abs_diff
    FROM cmp GROUP BY 1
    """,
)
def quality_order_total_consistency(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rolled = (li.groupBy("l_orderkey")
              .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                         * (F.lit(1) + F.col("l_tax").cast("decimal(8,2)"))
                         * (F.lit(1) - F.col("l_discount")
                            .cast("decimal(8,2)"))).alias("line_total")))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("tp"))
    cmp = (o.join(rolled, o.o_orderkey == rolled.l_orderkey)
           .select("o_orderstatus",
                   F.abs(F.col("tp") - F.col("line_total")).alias("adiff")))
    return (cmp.groupBy("o_orderstatus")
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.sum(F.when(F.col("adiff") > 0.01, 1).otherwise(0))
                  .cast("bigint").alias("n_mismatch"),
                 F.round(F.max("adiff"), 2).cast("double")
                  .alias("max_abs_diff")))


# ---------------------------------------------------------------------------
# Q-Q decile comparison between two slices: where the KS test gives one
# max-gap number, the Q-Q table says WHERE the distributions diverge —
# the drift report a data monitor renders. Interpolated quantiles
# (percentile ≡ quantile_cont, the stats_exact_percentiles precedent)
# at the 9 deciles for click vs purchase values, plus their ratio.
# One map-side-combined pass per slice.
# ---------------------------------------------------------------------------

@query(
    "stats_qq_quantiles",
    oracle="""
    WITH a AS (
      SELECT quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qa
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qb
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(i AS BIGINT) AS decile,
           round(a.qa[i], 6) AS q_click,
           round(b.qb[i], 6) AS q_purchase,
           round(a.qa[i] / b.qb[i], 6) AS qq_ratio
    FROM a, b, UNNEST(generate_series(1, 9)) AS t(i)
    """,
)
def stats_qq_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    decs = [i / 10.0 for i in range(1, 10)]

    def side(tag, alias):
        return (ev.filter(F.col("event_type") == tag)
                .agg(F.expr(f"percentile(value, array({','.join(map(str, decs))}))")
                     .alias(alias)))

    a = side("click", "qa").select(
        F.posexplode("qa").alias("i", "q_click"))
    b = side("purchase", "qb").select(
        F.posexplode("qb").alias("j", "q_purchase"))
    return (a.join(b, a.i == b.j)
            .select((F.col("i") + 1).cast("bigint").alias("decile"),
                    F.round("q_click", 6).alias("q_click"),
                    F.round("q_purchase", 6).alias("q_purchase"),
                    F.round(F.col("q_click") / F.col("q_purchase"), 6)
                     .alias("qq_ratio")))


# ---------------------------------------------------------------------------
# Lorenz-curve concentration report: cumulative GMV share of customers
# ranked by spend, read at the deciles — the shape behind the Gini
# number stats_gini_revenue already reports ("top 10% of customers
# carry X% of revenue"). Exact decimal spend sums; the rank cut uses
# integer positions so the decile boundaries are engine-identical.
#
# Scale (restructured per ADVICE r7): the naive plan is ONE
# unpartitioned row_number + running sum over ALL customers — an
# O(customers) single-task sort. Instead, spends are bucketed by a
# MONOTONE value map into PL_BUCKETS range buckets (equal spends land
# in the same bucket, so the bucket order refines to the exact global
# (s DESC, custkey) order): per-bucket count/sum aggregates
# distribute, the prefix scan runs on the constant-size (<=PL_BUCKETS
# rows) bucket summary, and row_number/running-sum windows partition
# BY BUCKET — every per-row stage is distributed; the only single-task
# window touches <=PL_BUCKETS summary rows. Output is bit-identical to
# the global-sort form (decimal sums are exact, order is identical),
# which is what the unchanged oracle checks.
# ---------------------------------------------------------------------------

PL_BUCKETS = 1024

@query(
    "ads_pareto_lorenz",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey) AS rn,
             COUNT(*) OVER () AS n,
             CAST(SUM(s) OVER () AS DOUBLE) AS tot
      FROM spend
    ),
    cum AS (
      SELECT rn, n, tot,
             CAST(SUM(s) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE) AS c
      FROM ranked
    )
    SELECT CAST(dec AS BIGINT) AS top_pct_x10,
           CAST(MAX(CASE WHEN rn <= n * dec // 10 THEN rn END) AS BIGINT)
             AS n_customers,
           round(MAX(CASE WHEN rn <= n * dec // 10 THEN c END)
                 / MAX(tot), 6) AS gmv_share
    FROM cum, UNNEST(generate_series(1, 9)) AS t(dec)
    GROUP BY dec
    """,
)
def ads_pareto_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    spend = (load_table(spark, sf_dir, "orders")
             .groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("s"))
             .localCheckpoint(eager=False))  # reused by 3 subplans
    # Monotone value->bucket map (bucket 0 = highest spends). Float
    # arithmetic here only PARTITIONS the data — any consistent
    # monotone assignment yields the same final order, so there is no
    # cross-engine float boundary. Degenerate all-equal-spend corpora
    # collapse to bucket 0.
    stats = spend.agg(F.min(F.col("s").cast("double")).alias("smin"),
                      F.max(F.col("s").cast("double")).alias("smax"))
    bucketed = (spend.crossJoin(F.broadcast(stats))
                .withColumn("b", F.when(
                    F.col("smax") > F.col("smin"),
                    F.least(F.lit(PL_BUCKETS - 1), F.floor(
                        (F.col("smax") - F.col("s").cast("double"))
                        / (F.col("smax") - F.col("smin")) * PL_BUCKETS)))
                    .otherwise(F.lit(0)))
                .select("o_custkey", "s", "b"))
    # Constant-size bucket summary; the only single-task window below
    # runs over <= PL_BUCKETS rows.
    summary = bucketed.groupBy("b").agg(
        F.count("*").alias("cnt_b"), F.sum("s").alias("sum_b"))
    wprefix = (Window.orderBy("b")
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = summary.select(
        "b",
        F.coalesce(F.sum("cnt_b").over(wprefix), F.lit(0))
         .alias("off_cnt"),
        F.coalesce(F.sum("sum_b").over(wprefix),
                   F.lit(0).cast("decimal(28,2)")).alias("off_sum"))
    # Per-bucket (distributed) local rank + running sum, lifted to the
    # exact global order by the bucket offsets.
    wlocal = Window.partitionBy("b").orderBy(F.desc("s"), "o_custkey")
    ranked = (bucketed.join(offsets, "b")
              .select(
                  (F.col("off_cnt") + F.row_number().over(wlocal))
                  .alias("rn"),
                  (F.col("off_sum") + F.sum("s").over(
                      wlocal.rowsBetween(Window.unboundedPreceding, 0)))
                  .cast("double").alias("c")))
    totals = spend.agg(F.count("*").alias("n"),
                       F.sum("s").cast("double").alias("tot"))
    decs = spark.range(1, 10).withColumnRenamed("id", "dec")
    return (ranked.crossJoin(F.broadcast(totals))
            .crossJoin(F.broadcast(decs))
            .groupBy(F.col("dec").cast("bigint").alias("top_pct_x10"))
            .agg(F.max(F.when(
                F.col("rn") <= F.expr("div(n * dec, 10)"), F.col("rn")))
                .cast("bigint").alias("n_customers"),
                F.round(F.max(F.when(
                    F.col("rn") <= F.expr("div(n * dec, 10)"), F.col("c")))
                    / F.max("tot"), 6).alias("gmv_share")))


# ---------------------------------------------------------------------------
# Duplicate-primary-key audit across every table that declares one —
# the third leg of the DQ family (referential integrity, invariant
# consistency, key uniqueness). A duplicated PK silently doubles rows
# through every downstream join; this is the one-line report that
# catches a replayed ingest. Each table is one distinct-count pass.
# ---------------------------------------------------------------------------

@query(
    "quality_duplicate_pk_audit",
    oracle="""
    SELECT 'events.event_id' AS pk, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_rows
    FROM events
    UNION ALL
    SELECT 'orders.o_orderkey', COUNT(*),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'customer.c_custkey', COUNT(*),
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'documents.doc_id', COUNT(*),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'embeddings.vec_id', COUNT(*),
           CAST(COUNT(DISTINCT vec_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT)
    FROM embeddings
    """,
)
def quality_duplicate_pk_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    def audit(table, pk):
        t = load_table(spark, sf_dir, table)
        return t.agg(
            F.lit(f"{table}.{pk}").alias("pk"),
            F.count("*").alias("n_rows"),
            F.countDistinct(pk).cast("bigint").alias("n_distinct"),
            (F.count("*") - F.countDistinct(pk)).cast("bigint")
             .alias("dup_rows")).select("pk", "n_rows", "n_distinct",
                                        "dup_rows")

    out = audit("events", "event_id")
    for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")]:
        out = out.unionByName(audit(t, k))
    return out


# ---------------------------------------------------------------------------
# Poisson dispersion (burstiness) index: variance-to-mean ratio of
# per-10-minute event counts — ≈1 for a Poisson arrival process, ≫1
# for bursty traffic. The one-number companion to the error-burst
# window detector: it says whether bursts are the regime or the
# exception. Counts are integers; moments come from BIGINT sums, so
# the final double division is engine-identical.
# ---------------------------------------------------------------------------

@query(
    "stats_poisson_dispersion",
    oracle="""
    WITH buckets AS (
      SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM buckets
    )
    SELECT n AS n_buckets, s AS n_events,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_per_bucket,
           round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (n - 1), 6) AS var_per_bucket,
           round(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (n - 1)) / (CAST(s AS DOUBLE) / n), 6)
             AS dispersion_index
    FROM m
    """,
)
def stats_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = (load_table(spark, sf_dir, "events")
               .groupBy(F.floor(F.unix_timestamp("ts") / 600)
                        .cast("bigint").alias("b"))
               .agg(F.count("*").cast("bigint").alias("c")))
    m = buckets.agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("c").cast("bigint").alias("s"),
                    F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"))
    n, s, q = (F.col("n"), F.col("s").cast("double"),
               F.col("q").cast("double"))
    mean = s / n
    var = (q - s * F.col("s") / n) / (n - 1)
    return m.select(F.col("n").alias("n_buckets"),
                    F.col("s").alias("n_events"),
                    F.round(mean, 6).alias("mean_per_bucket"),
                    F.round(var, 6).alias("var_per_bucket"),
                    F.round(var / mean, 6).alias("dispersion_index"))


# ---------------------------------------------------------------------------
# Repeat-purchase rate: share of purchasing users who purchase on more
# than one distinct day — the retention KPI next to back-flow users
# (A5) that every commerce ADS layer publishes. Two distinct-count
# aggregations, integer end to end.
# ---------------------------------------------------------------------------

@query(
    "ads_repeat_purchase_rate",
    oracle="""
    WITH pd AS (
      SELECT user_id,
             CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT)
               AS purchase_days
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS purchasing_users,
           CAST(SUM(CASE WHEN purchase_days > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS repeat_users,
           round(CAST(SUM(CASE WHEN purchase_days > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS repeat_rate
    FROM pd
    """,
)
def ads_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pd_ = (load_table(spark, sf_dir, "events")
           .filter(F.col("event_type") == "purchase")
           .groupBy("user_id")
           .agg(F.countDistinct(F.date_format("ts", "yyyy-MM-dd"))
                .cast("bigint").alias("purchase_days")))
    return pd_.agg(
        F.count("*").cast("bigint").alias("purchasing_users"),
        F.sum(F.when(F.col("purchase_days") > 1, 1).otherwise(0))
         .cast("bigint").alias("repeat_users"),
        F.round(F.sum(F.when(F.col("purchase_days") > 1, 1).otherwise(0))
                .cast("double") / F.count("*"), 6).alias("repeat_rate"))


# ---------------------------------------------------------------------------
# Funnel-order causality audit: purchases by users with NO earlier
# 'view' event are instrumentation bugs (lost events, clock skew,
# replayed sessions) — the data-quality twin of the funnel/attribution
# family, and the audit the reference's publisher would run before
# trusting its conversion ADS tables (reference funnel logic:
# app/dws/DwsTradeTrademarkCategoryUserRefundWindow-style keyed
# rollups assume the stream is causally ordered).
#
# Plan: ONE user-keyed shuffle; the "any view strictly before me" test
# is a conditional running count over the per-user (ts, event_id)
# order — no self-join, constant output (day grain). Event order uses
# MICROSECOND epoch (epoch_us / unix_micros) like the session and
# as-of oracles, so sub-second view-then-purchase sequences are
# adjudicated by true event time, not event_id (ADVICE r7).
# ---------------------------------------------------------------------------

@query(
    "quality_funnel_order_audit",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS eus,
             strftime(ts, '%Y-%m-%d') AS day
      FROM events
    ),
    flagged AS (
      SELECT day, event_type,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY eus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS views_before
      FROM e
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN views_before = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphan,
           round(CAST(SUM(CASE WHEN views_before = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS orphan_rate
    FROM flagged WHERE event_type = 'purchase'
    GROUP BY day ORDER BY day
    """,
)
def quality_funnel_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day count of 'orphan' purchases — purchase events whose user
    has no strictly-earlier view event in the whole stream."""
    e = (load_table(spark, sf_dir, "events")
         .select("user_id", "event_type", "event_id",
                 F.unix_micros(F.col("ts")).cast("bigint").alias("eus"),
                 day_str("ts").alias("day")))
    w = (Window.partitionBy("user_id").orderBy("eus", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = e.withColumn(
        "views_before",
        F.coalesce(F.sum(F.when(F.col("event_type") == "view", 1)
                         .otherwise(0)).over(w), F.lit(0)).cast("bigint"))
    orphan = F.sum(F.when(F.col("views_before") == 0, 1).otherwise(0))
    return (flagged.filter(F.col("event_type") == "purchase")
            .groupBy("day")
            .agg(F.count("*").cast("bigint").alias("n_purchases"),
                 orphan.cast("bigint").alias("n_orphan"),
                 F.round(orphan.cast("double") / F.count("*"), 6)
                 .alias("orphan_rate"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# EWMA control chart on daily revenue (Roberts 1959; the EWMA chart
# from statistical process control): smooth = weighted sum of the last
# EWMA_LAGS days with geometric weights alpha*(1-alpha)^k, anomaly =
# day whose revenue sits more than EWMA_K sigma from the PREVIOUS
# day's smooth (so the tested day never defends itself). The truncated
# explicit-weight form replaces the recursive definition: it is ONE
# window expression instead of an unbounded recurrence, which is what
# makes it a Spark plan — and the truncation error is bounded by
# (1-alpha)^LAGS (~2.8% of weight at 10 lags, identical in both
# engines because the weights are shared decimal literals).
#
# Determinism: the day series is aggregated with DECIMAL sums
# (order-proof); the weighted sum uses IDENTICAL literal weights in
# both engines added in the same lag order; residual moments go
# through the repo's round-then-DECIMAL-sum convention so the sigma
# threshold is bit-stable.
#
# Scale: the corpus pays one day-grain aggregation (map-side
# combined). The lag window runs on the DAY series — a time-bounded
# domain (thousands of rows at ANY corpus size), so the single-series
# window sort is O(days), never O(rows) (DAY-GRAIN CONTRACT, module
# docstring).
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_LAGS = 10
EWMA_K = 3              # sigma multiplier for the control band

# shared literal weights: alpha*(1-alpha)^k, 12 dp, same text in both
# engines so the weighted sums are IEEE-identical
_EWMA_W = [f"{0.3 * (0.7 ** k):.12f}" for k in range(EWMA_LAGS)]


def _ewma_sql_terms(col: str) -> str:
    """num/den SQL for the truncated EWMA at the current row."""
    num = " + ".join(
        f"COALESCE(lag({col}, {k}) OVER w * {w}, 0)"
        for k, w in enumerate(_EWMA_W))
    den = " + ".join(
        f"CASE WHEN lag({col}, {k}) OVER w IS NULL THEN 0 ELSE {w} END"
        for k, w in enumerate(_EWMA_W))
    return f"({num}) / ({den})"


@query(
    "stats_ewma_anomaly",
    oracle=f"""
    WITH day_rev AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1
    ),
    smoothed AS (
      SELECT day, rev,
             {_ewma_sql_terms("rev")} AS ewma
      FROM day_rev
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    resid AS (
      SELECT day, rev, ewma,
             round(rev - lag(ewma, 1) OVER (ORDER BY day), 6) AS r
      FROM smoothed
    ),
    sigma AS (
      SELECT CAST(COUNT(r) AS BIGINT) AS n,
             CAST(SUM(CAST(r AS DECIMAL(38,12))) AS DOUBLE) AS s,
             CAST(SUM(CAST(r * r AS DECIMAL(38,12))) AS DOUBLE) AS q
      FROM resid
    ),
    thr AS (
      SELECT round({EWMA_K} * sqrt((q - s * s / n) / (n - 1)), 6) AS t
      FROM sigma
    )
    SELECT CAST(COUNT(r) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN abs(r) > t.t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(MAX(abs(r)), 6) AS max_abs_resid,
           MIN(t.t) AS threshold
    FROM resid, thr t
    """,
)
def stats_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of daily-revenue anomalies under a {EWMA_K}-sigma EWMA
    control band (alpha={EWMA_ALPHA}, {EWMA_LAGS}-lag truncation)."""
    day_rev = (load_table(spark, sf_dir, "orders")
               .groupBy(day_str("o_orderdate").alias("day"))
               .agg(dsum("o_totalprice").alias("rev")))
    # Unpartitioned lag windows over the DAY-GRAIN series — bounded
    # domain (~2.4k rows/decade), a single small task by design; the
    # per-row work all happened in the distributed groupBy above.
    w = Window.orderBy("day")
    num = None
    den = None
    for k, wt in enumerate(_EWMA_W):
        lagged = F.lag("rev", k).over(w) if k else F.col("rev")
        term = F.coalesce(lagged * F.lit(float(wt)), F.lit(0.0))
        mask = F.when(lagged.isNull(), 0.0).otherwise(float(wt))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    smoothed = day_rev.withColumn("ewma", num / den)
    resid = smoothed.withColumn(
        "r", F.round(F.col("rev") - F.lag("ewma", 1).over(w), 6))
    rdec = F.col("r").cast("decimal(38,12)")
    sigma = resid.agg(
        F.count("r").cast("bigint").alias("n"),
        F.sum(rdec).cast("double").alias("s"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(38,12)"))
         .cast("double").alias("q"))
    thr = sigma.select(F.round(
        EWMA_K * F.sqrt((F.col("q") - F.col("s") * F.col("s") / F.col("n"))
                        / (F.col("n") - 1)), 6).alias("t"))
    return (resid.crossJoin(F.broadcast(thr))
            .agg(F.count("r").cast("bigint").alias("n_days"),
                 F.sum(F.when(F.abs("r") > F.col("t"), 1).otherwise(0))
                 .cast("bigint").alias("n_anomalies"),
                 F.round(F.max(F.abs("r")), 6).alias("max_abs_resid"),
                 F.min("t").alias("threshold")))


# ---------------------------------------------------------------------------
# Bootstrap confidence interval via the POISSON BOOTSTRAP (Oza &
# Russell 2001; Chamandy et al., "Estimating Uncertainty for Massive
# Data Streams", Google 2012) — the bootstrap that works on MapReduce:
# instead of resampling n rows with replacement (needs global
# coordination), each row independently contributes to replica b with
# multiplicity ~ Poisson(1). One pass, map-side: each row emits B
# (replica, m*x, m) partials that partial-aggregate BEFORE the
# shuffle, so the exchange carries B x partitions rows, never B x n.
#
# Determinism: multiplicity comes from md5(o_orderkey:b) mapped through
# the EXACT Poisson(1) CDF thresholds on the 2^32 grid (integer
# literals, identical in both engines, no runtime exp/factorial);
# replica sums are DECIMAL (order-insensitive); the CI bounds are
# order statistics of the B replica means (rank cut with replica-id
# tie-break), not a float quantile interpolation.
# ---------------------------------------------------------------------------

BOOT_B = 64                      # bootstrap replicas
# floor(CDF_Poisson1(k) * 2^32) for k = 0..4; h >= last -> m = 5
BOOT_THRESHOLDS = (1580030168, 3160060337, 3950075421,
                   4213413783, 4279248373)
BOOT_LO_RANK = 2                 # 2nd smallest of 64  ~ 2.5% bound
BOOT_HI_RANK = BOOT_B - 1        # 63rd smallest       ~ 97.5% bound


def _boot_mult_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN {h} < {t} THEN {k}"
        for k, t in enumerate(BOOT_THRESHOLDS))
    return f"(CASE {cases} ELSE 5 END)"


@query(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT b,
             round(CAST(SUM(m * CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) / SUM(m), 6) AS mean_b
      FROM (
        SELECT o_totalprice, b,
               {_boot_mult_sql(
                   "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)"
                   " || ':' || CAST(b AS VARCHAR)), 1, 8))::BIGINT)")} AS m
        FROM orders, UNNEST(generate_series(0, {BOOT_B - 1})) AS t(b)
      )
      GROUP BY b
    ),
    ranked AS (
      SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rk
      FROM reps
    ),
    pt AS (
      SELECT round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*), 6) AS mean_pt
      FROM orders
    )
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicas,
           pt.mean_pt,
           MAX(CASE WHEN rk = {BOOT_LO_RANK} THEN mean_b END) AS ci_lo,
           MAX(CASE WHEN rk = {BOOT_HI_RANK} THEN mean_b END) AS ci_hi
    FROM ranked, pt GROUP BY 1, 2
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~95% Poisson-bootstrap CI for mean order price ({BOOT_B}
    deterministic replicas; bounds are order statistics of the replica
    means)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("o_orderkey").cast("string"),
        F.col("b").cast("string"))), 1, 8), 16, 10).cast("bigint")
    m = F.lit(5)
    for k in range(len(BOOT_THRESHOLDS) - 1, -1, -1):
        m = F.when(h < BOOT_THRESHOLDS[k], k).otherwise(m)
    reps = (orders.select("o_orderkey", "o_totalprice", b)
            .withColumn("m", m)
            .groupBy("b")
            .agg(F.round(
                F.sum(F.col("m") * F.col("o_totalprice")
                      .cast("decimal(18,2)")).cast("double")
                / F.sum("m"), 6).alias("mean_b")))
    ranked = reps.select(
        "mean_b",
        F.row_number().over(Window.orderBy("mean_b", "b")).alias("rk"))
    pt = orders.agg(F.round(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        / F.count("*"), 6).alias("mean_pt"))
    return (ranked.crossJoin(F.broadcast(pt))
            .groupBy("mean_pt")
            .agg(F.max(F.when(F.col("rk") == BOOT_LO_RANK,
                              F.col("mean_b"))).alias("ci_lo"),
                 F.max(F.when(F.col("rk") == BOOT_HI_RANK,
                              F.col("mean_b"))).alias("ci_hi"))
            .select(F.lit(BOOT_B).cast("bigint").alias("n_replicas"),
                    "mean_pt", "ci_lo", "ci_hi"))


# ---------------------------------------------------------------------------
# Two-factor OLS with intercept, closed form: regress l_extendedprice
# on (l_quantity, l_discount) by solving the 3x3 normal equations
# (X'X) beta = X'y with Cramer's rule. The entire regression is ONE
# map-side-partial aggregation producing nine EXACT moment sums
# (inputs are 2-dp decimals, so every product is an exact decimal —
# no float enters until the constant-size determinant arithmetic),
# then constant scalar math. This is the at-scale shape for linear
# models with few features: no gradient loop, no driver iteration,
# one pass. Extends stats_regression_trend (single-factor) to the
# multivariate case. R^2 comes from the same sums
# (SSE = Syy - b1*Sqy_c - b2*Sdy_c over centered moments).
# ---------------------------------------------------------------------------

OLS_MOMENTS = ("n", "sq", "sd", "sy", "sqq", "sqd", "sdd",
               "sqy", "sdy", "syy")


def ols_moments(li: DataFrame) -> DataFrame:
    """One-row EXACT-decimal moment set for the 2-factor OLS — an
    algebraic (SUM-mergeable) summary, which is what lets
    stream_ols_maintenance fold it at ingest (decimal partials merge
    exactly; the double conversion happens once, at solve time)."""
    q = F.col("l_quantity").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.agg(
        F.count("*").cast("decimal(38,4)").alias("n"),
        F.sum(q).cast("decimal(38,4)").alias("sq"),
        F.sum(d).cast("decimal(38,4)").alias("sd"),
        F.sum(y).cast("decimal(38,4)").alias("sy"),
        F.sum(q * q).cast("decimal(38,4)").alias("sqq"),
        F.sum(q * d).cast("decimal(38,4)").alias("sqd"),
        F.sum(d * d).cast("decimal(38,4)").alias("sdd"),
        F.sum(q * y).cast("decimal(38,4)").alias("sqy"),
        F.sum(d * y).cast("decimal(38,4)").alias("sdy"),
        F.sum(y * y).cast("decimal(38,4)").alias("syy"))


def ols_solve(m: DataFrame) -> DataFrame:
    """Closed-form solve from the moment row (Cramer on centered
    moments); all inputs convert decimal->double once, identically in
    both engines."""
    m = m.select(*[F.col(c0).cast("double").alias(c0)
                   for c0 in OLS_MOMENTS])
    c = m.select(
        "n",
        (F.col("sqq") - F.col("sq") * F.col("sq") / F.col("n")).alias("cqq"),
        (F.col("sqd") - F.col("sq") * F.col("sd") / F.col("n")).alias("cqd"),
        (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n")).alias("cdd"),
        (F.col("sqy") - F.col("sq") * F.col("sy") / F.col("n")).alias("cqy"),
        (F.col("sdy") - F.col("sd") * F.col("sy") / F.col("n")).alias("cdy"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
        (F.col("sq") / F.col("n")).alias("mq"),
        (F.col("sd") / F.col("n")).alias("md_"),
        (F.col("sy") / F.col("n")).alias("my"))
    det = F.col("cqq") * F.col("cdd") - F.col("cqd") * F.col("cqd")
    b = c.select(
        "n", "cyy", "cqy", "cdy", "mq", "md_", "my",
        ((F.col("cqy") * F.col("cdd") - F.col("cdy") * F.col("cqd")) / det)
        .alias("b_qty"),
        ((F.col("cdy") * F.col("cqq") - F.col("cqy") * F.col("cqd")) / det)
        .alias("b_disc"))
    return b.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("my") - F.col("b_qty") * F.col("mq")
                - F.col("b_disc") * F.col("md_"), 6).alias("beta0"),
        F.round("b_qty", 6).alias("beta_qty"),
        F.round("b_disc", 6).alias("beta_disc"),
        F.round((F.col("b_qty") * F.col("cqy")
                 + F.col("b_disc") * F.col("cdy")) / F.col("cyy"), 6)
        .alias("r2"))


@query(
    "stats_ols_two_factor",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqy,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sdy,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem
    ),
    c AS (  -- centered second moments
      SELECT n,
             sqq - sq * sq / n AS cqq,
             sqd - sq * sd / n AS cqd,
             sdd - sd * sd / n AS cdd,
             sqy - sq * sy / n AS cqy,
             sdy - sd * sy / n AS cdy,
             syy - sy * sy / n AS cyy,
             sq / n AS mq, sd / n AS md_, sy / n AS my
      FROM m
    ),
    b AS (
      SELECT n, cyy, cqy, cdy, mq, md_, my,
             (cqy * cdd - cdy * cqd) / (cqq * cdd - cqd * cqd) AS b_qty,
             (cdy * cqq - cqy * cqd) / (cqq * cdd - cqd * cqd) AS b_disc
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(my - b_qty * mq - b_disc * md_, 6) AS beta0,
           round(b_qty, 6) AS beta_qty,
           round(b_disc, 6) AS beta_disc,
           round((b_qty * cqy + b_disc * cdy) / cyy, 6) AS r2
    FROM b
    """,
)
def stats_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ols_solve(ols_moments(load_table(spark, sf_dir, "lineitem")))


# ---------------------------------------------------------------------------
# Capture-recapture population estimate (Chapman's corrected
# Lincoln-Petersen): estimate the TRUE distinct-user population from
# two overlapping observation windows — n1 users seen in window 1, n2
# in window 2, m in both => N ~ (n1+1)(n2+1)/(m+1) - 1. The ecology
# estimator is the dedup-world audit for "how many distinct entities
# does the full corpus hold, given two partial crawls" — a
# cross-check against HLL/KMV that needs only two cheap
# distinct-counts and an intersection, all integer arithmetic.
# ---------------------------------------------------------------------------

# Two-day PURCHASE windows: broad windows over all event types catch
# every user (each emits ~2 events/day — m == n1 == n2 == N and the
# estimator is vacuous, measured); purchase-only 2-day captures mark
# ~40-60% of the population, the regime the estimator exists for.
CRC_W1 = (1, 2)
CRC_W2 = (3, 4)


@query(
    "stats_capture_recapture",
    oracle=f"""
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND CAST(strftime(ts, '%d') AS INT) BETWEEN {CRC_W1[0]} AND {CRC_W1[1]}
    ),
    w2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND CAST(strftime(ts, '%d') AS INT) BETWEEN {CRC_W2[0]} AND {CRC_W2[1]}
    ),
    c AS (
      SELECT CAST((SELECT COUNT(*) FROM w1) AS BIGINT) AS n1,
             CAST((SELECT COUNT(*) FROM w2) AS BIGINT) AS n2,
             CAST((SELECT COUNT(*) FROM w1 JOIN w2 USING (user_id))
                  AS BIGINT) AS m,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events
                   WHERE event_type = 'purchase') AS BIGINT) AS true_n
    )
    SELECT n1, n2, m, true_n,
           CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
             AS chapman_estimate,
           CAST(ABS((n1 + 1) * (n2 + 1) // (m + 1) - 1 - true_n)
                AS BIGINT) AS abs_err
    FROM c
    """,
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the distinct-user
    population from two day-of-month observation windows."""
    ev = load_table(spark, sf_dir, "events")
    dom = F.dayofmonth("ts")
    purch = ev.filter(F.col("event_type") == "purchase")
    w1 = (purch.filter(dom.between(*CRC_W1))
          .select("user_id").distinct())
    w2 = (purch.filter(dom.between(*CRC_W2))
          .select("user_id").distinct())
    c = (w1.agg(F.count("*").cast("bigint").alias("n1"))
         .crossJoin(w2.agg(F.count("*").cast("bigint").alias("n2")))
         .crossJoin(w1.join(w2, "user_id")
                    .agg(F.count("*").cast("bigint").alias("m")))
         .crossJoin(purch.agg(F.countDistinct("user_id").cast("bigint")
                              .alias("true_n"))))
    est = F.expr("cast(div((n1 + 1) * (n2 + 1), m + 1) - 1 as bigint)")
    return c.select("n1", "n2", "m", "true_n",
                    est.alias("chapman_estimate"),
                    F.abs(est - F.col("true_n")).cast("bigint")
                    .alias("abs_err"))


# ---------------------------------------------------------------------------
# Kaplan-Meier survival with right-censoring (r8) — "time to second
# order" churn curve. Reference analog: the ADS repeat-purchase /
# retention mappers (gmall-publisher TradeStatsMapper.java) report
# point repeat rates; the KM estimator generalizes them to a full
# censored time-to-event curve, the standard churn deliverable.
#
# Censoring regime: follow-up is capped at KM_HORIZON days and at the
# dataset's last order date, so customers whose second order falls
# beyond their follow-up are right-censored — at sf0.01 that is ~48%
# of subjects, a real mixed regime, not a degenerate one.
#
# Determinism: the survival product S(t) = prod (n_u - d_u)/n_u is
# folded ENTIRELY in scaled-integer arithmetic — each factor is
# round-half-up((n-d)*1e9/n) computed as (2*(n-d)*1e9 + n) DIV (2n),
# and the cumulative product folds with (acc*x + 5e8) DIV 1e9 via
# Spark `aggregate` / DuckDB `list_reduce`. acc*x <= 1e18 < BIGINT
# max; no ln/exp/double enters the pipeline, so the curve is
# engine-exact (the repo convention after the r7 sampling-boundary
# ADVICE). Scale shape: one custkey shuffle for first/second order,
# then everything runs on the <= KM_HORIZON+1-row day grid —
# the unpartitioned windows are bounded day-grain by design
# (DAY-GRAIN CONTRACT, module docstring).
# ---------------------------------------------------------------------------

KM_HORIZON = 180      # days of follow-up after the first order


@query(
    "stats_kaplan_meier_churn",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    life AS (
      SELECT o_custkey, min(o_orderdate) AS f,
             min(CASE WHEN rn = 2 THEN o_orderdate END) AS s
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    subj AS (
      SELECT CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN t_evt ELSE fup END AS t,
             CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN 1 ELSE 0 END AS evt
      FROM (SELECT LEAST({KM_HORIZON}, datediff('day', f, mxd)) AS fup,
                   datediff('day', f, s) AS t_evt
            FROM life, mx)
    ),
    grid AS (
      SELECT CAST(t AS BIGINT) AS t, CAST(SUM(evt) AS BIGINT) AS d,
             CAST(SUM(1 - evt) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d, c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM subj)
               - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS n
      FROM grid
    ),
    fac AS (
      SELECT t, d, c, n,
             (2 * (n - d) * 1000000000 + n) // (2 * n) AS factor
      FROM risk
    )
    SELECT t AS t_days, n AS n_at_risk, d AS events, c AS censored,
           CAST(list_reduce(
             list_prepend(CAST(1000000000 AS BIGINT),
                          list(factor) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)),
             (acc, x) -> (acc * x + 500000000) // 1000000000)
             AS BIGINT) AS survival_q9
    FROM fac WHERE d > 0
    """,
)
def stats_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM survival of time-to-second-order, right-censored at
    {KM_HORIZON} days / dataset end; survival folded in scaled-int
    arithmetic (see block comment) so the curve is engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey"))
    life = (orders.select("o_custkey", "o_orderdate", rn.alias("rn"))
            .groupBy("o_custkey")
            .agg(F.min("o_orderdate").alias("f"),
                 F.min(F.when(F.col("rn") == 2,
                              F.col("o_orderdate"))).alias("s")))
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    obs = (life.crossJoin(F.broadcast(mx))
           .select(F.least(F.lit(KM_HORIZON),
                           F.datediff("mxd", "f")).alias("fup"),
                   F.datediff("s", "f").alias("t_evt")))
    is_evt = F.col("t_evt").isNotNull() & (F.col("t_evt") <= F.col("fup"))
    subj = obs.select(
        F.when(is_evt, F.col("t_evt")).otherwise(F.col("fup")).alias("t"),
        F.when(is_evt, F.lit(1)).otherwise(F.lit(0)).alias("evt"))
    grid = (subj.groupBy(F.col("t").cast("bigint").alias("t"))
            .agg(F.sum("evt").cast("bigint").alias("d"),
                 F.sum(F.lit(1) - F.col("evt")).cast("bigint").alias("c")))
    total = subj.agg(F.count("*").cast("bigint").alias("total"))
    # bounded day-grain (<= KM_HORIZON+1 rows; DAY-GRAIN CONTRACT,
    # module docstring): the unpartitioned
    # ordered windows below run in one task by design
    w_prior = (Window.orderBy("t")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_upto = (Window.orderBy("t")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = (grid.crossJoin(F.broadcast(total))
            .withColumn("n", F.col("total")
                        - F.coalesce(F.sum(F.col("d") + F.col("c"))
                                     .over(w_prior).cast("bigint"),
                                     F.lit(0).cast("bigint")))
            .drop("total"))
    fac = risk.withColumn(
        "factor",
        F.expr("(2 * (n - d) * 1000000000 + n) div (2 * n)"))
    surv = fac.withColumn("fs", F.collect_list("factor").over(w_upto))
    return (surv.filter(F.col("d") > 0)
            .select(F.col("t").alias("t_days"),
                    F.col("n").alias("n_at_risk"),
                    F.col("d").alias("events"),
                    F.col("c").alias("censored"),
                    F.expr("aggregate(fs, CAST(1000000000 AS BIGINT), "
                           "(acc, x) -> (acc * x + 500000000) "
                           "div 1000000000)").alias("survival_q9")))


# ---------------------------------------------------------------------------
# Kendall tau-b (r8) — the concordance companion to stats_spearman_corr
# above: does a day with more orders also take more revenue, measured
# by PAIRS of days rather than ranks. tau-b is the robust choice when
# ties matter (integer order counts tie often); reporting C, D and
# both tie terms makes the statistic auditable, not just a number.
#
# Exactness: the day grid is (day, BIGINT order count, exact
# DECIMAL(18,2) revenue); every pairwise comparison is integer/decimal
# sign arithmetic, so C/D/tie counts are exact BIGINTs in both
# engines; the only floats are the final sqrts (IEEE-correctly-rounded
# — deterministic, unlike ln/exp) and one 6-dp output round.
#
# Scale: the pair stage is a deliberate day×day self-join on the
# BOUNDED day grain (~2.4k rows -> ~3M pairs) — O(days^2) by design,
# per the DAY-GRAIN CONTRACT (module docstring); the corpus-sized work is
# the single groupBy(day). At an unbounded grain the fix is
# merge-sort inversion counting, orthogonal to the statistic.
# ---------------------------------------------------------------------------

@query(
    "stats_kendall_tau",
    oracle="""
    WITH day_grid AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x - b.x) * sign(a.y - b.y) > 0 THEN 1
                  ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * sign(a.y - b.y) < 0 THEN 1
                  ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM day_grid a JOIN day_grid b ON a.d < b.d
    )
    SELECT CAST((SELECT COUNT(*) FROM day_grid) AS BIGINT) AS n_days,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CAST(SUM(tx) AS BIGINT) AS ties_x,
           CAST(SUM(ty) AS BIGINT) AS ties_y,
           round(CAST(SUM(conc) - SUM(disc) AS DOUBLE)
                 / (sqrt(CAST(COUNT(*) - SUM(tx) AS DOUBLE))
                    * sqrt(CAST(COUNT(*) - SUM(ty) AS DOUBLE))), 6)
             AS kendall_tau_b
    FROM pairs
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b of (orders per day, revenue per day) via exact
    pair concordance counting on the bounded day grain."""
    orders = load_table(spark, sf_dir, "orders")
    grid = (orders.groupBy(F.to_date("o_orderdate").alias("d"))
            .agg(F.count("*").cast("bigint").alias("x"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .alias("y")))
    a, b = grid.alias("a"), grid.alias("b")
    # bounded day-grain pair join (~3M pairs), O(days^2) by design
    # (DAY-GRAIN CONTRACT, module docstring)
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.when((F.col("a.x") - F.col("b.x"))
               * F.signum((F.col("a.y") - F.col("b.y")).cast("double"))
               > 0, 1).otherwise(0).alias("conc"),
        F.when((F.col("a.x") - F.col("b.x"))
               * F.signum((F.col("a.y") - F.col("b.y")).cast("double"))
               < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0).alias("tx"),
        F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0).alias("ty"))
    n_days = grid.agg(F.count("*").cast("bigint").alias("n_days"))
    return (pairs.agg(
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        F.sum("tx").cast("bigint").alias("ties_x"),
        F.sum("ty").cast("bigint").alias("ties_y"),
        F.count("*").alias("np"))
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "concordant", "discordant", "ties_x", "ties_y",
                F.round((F.col("concordant") - F.col("discordant"))
                        .cast("double")
                        / (F.sqrt((F.col("np") - F.col("ties_x"))
                                  .cast("double"))
                           * F.sqrt((F.col("np") - F.col("ties_y"))
                                    .cast("double"))), 6)
                .alias("kendall_tau_b")))


# ---------------------------------------------------------------------------
# Forecast backtest (r8) — the audit a forecasting pipeline runs
# BEFORE trusting any model: score the two classic baselines
# (seasonal-naive "same day last week" and naive "yesterday") on the
# daily-GMV history with MAE and MAPE. Every fancier model has to
# beat these numbers; the ADS seasonality index says the pattern
# exists, THIS says how predictable it is.
#
# Exactness: daily GMV is an exact DECIMAL(18,2) sum; absolute errors
# stay decimal; MAE = exact decimal error sum / day count (one 6-dp
# output round of the same double in both engines); MAPE follows the
# repo's sum-of-rounded-terms rule — each per-day ratio is rounded to
# 6 dp FIRST, summed as exact DECIMAL, then divided (order-free).
# Lag windows run on the bounded day grain (single-task by design;
# DAY-GRAIN CONTRACT, module docstring).
# ---------------------------------------------------------------------------

@query(
    "stats_forecast_backtest",
    oracle="""
    WITH day_grid AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT d, y,
             lag(y, 1) OVER (ORDER BY d) AS f_naive1,
             lag(y, 7) OVER (ORDER BY d) AS f_seasonal7
      FROM day_grid
    ),
    scored AS (
      SELECT 'naive1' AS model, ABS(y - f_naive1) AS ae,
             CAST(round(CAST(ABS(y - f_naive1) AS DOUBLE)
                        / CAST(y AS DOUBLE), 6) AS DECIMAL(12,6)) AS ape
      FROM lagged WHERE f_naive1 IS NOT NULL
      UNION ALL
      SELECT 'seasonal7', ABS(y - f_seasonal7),
             CAST(round(CAST(ABS(y - f_seasonal7) AS DOUBLE)
                        / CAST(y AS DOUBLE), 6) AS DECIMAL(12,6))
      FROM lagged WHERE f_seasonal7 IS NOT NULL
    )
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 6) AS mae,
           round(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 6) AS mape
    FROM scored GROUP BY 1
    """,
)
def stats_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/MAPE of the naive-1 and seasonal-naive-7 baselines on
    daily GMV (see block comment for the exactness rules)."""
    orders = load_table(spark, sf_dir, "orders")
    grid = (orders.groupBy(F.to_date("o_orderdate").alias("d"))
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .alias("y")))
    # bounded day grain: unpartitioned lag windows, single-task by
    # design (DAY-GRAIN CONTRACT, module docstring)
    w = Window.orderBy("d")
    lagged = grid.select(
        "d", "y",
        F.lag("y", 1).over(w).alias("f_naive1"),
        F.lag("y", 7).over(w).alias("f_seasonal7"))

    def _score(model: str, fcol: str) -> DataFrame:
        ae = F.abs(F.col("y") - F.col(fcol))
        return (lagged.filter(F.col(fcol).isNotNull())
                .select(F.lit(model).alias("model"), ae.alias("ae"),
                        F.round(ae.cast("double") / F.col("y")
                                .cast("double"), 6)
                        .cast("decimal(12,6)").alias("ape")))

    scored = _score("naive1", "f_naive1").unionAll(
        _score("seasonal7", "f_seasonal7"))
    return (scored.groupBy("model")
            .agg(F.count("*").cast("bigint").alias("n_days"),
                 F.round(F.sum("ae").cast("double") / F.count("*"), 6)
                 .alias("mae"),
                 F.round(F.sum("ape").cast("double") / F.count("*"), 6)
                 .alias("mape")))


# ---------------------------------------------------------------------------
# Functional-dependency audit (r8) — schema archaeology: for each
# candidate X -> Y dependency, count the X groups carrying more than
# one distinct Y. Profilers run exactly this to discover (or refute)
# join keys, denormalization candidates, and silently-broken
# invariants after an upstream schema change; the duplicate-PK audit
# above is the special case X = declared key. The candidate list
# mixes a key-based FD (must hold) with attribute FDs (expected
# violated) so both verdict paths stay exercised.
#
# Exactness: pure integer counting. Scale: one groupBy per candidate
# FD (two-phase count-distinct), outputs one row each — at 100 TB the
# audit cost is the scans, and all candidates over one table could
# share a single multi-aggregate pass if the list grows.
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    # (fd_name, table, lhs column, rhs column)
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("documents.source->lang", "documents", "source", "lang"),
    ("documents.doc_id->lang", "documents", "doc_id", "lang"),
    ("customer.c_mktsegment->c_nationkey", "customer",
     "c_mktsegment", "c_nationkey"),
    ("orders.o_orderstatus->o_orderpriority", "orders",
     "o_orderstatus", "o_orderpriority"),
]

_FD_ORACLE = "\nUNION ALL\n".join(f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(MAX(c) AS BIGINT) AS max_distinct_rhs,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 AS BOOLEAN)
             AS holds
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS c
          FROM {tbl} GROUP BY 1)""" for name, tbl, lhs, rhs
                           in _FD_CANDIDATES)


@query("quality_functional_dependency_audit", oracle=_FD_ORACLE)
def quality_functional_dependency_audit(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Violation counts for the candidate X -> Y dependency list
    (see block comment)."""
    out = None
    for name, tbl, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        grp = (t.groupBy(lhs)
               .agg(F.countDistinct(rhs).alias("c")))
        viol = F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        row = grp.agg(
            F.lit(name).alias("fd"),
            F.count("*").cast("bigint").alias("n_groups"),
            viol.cast("bigint").alias("violating_groups"),
            F.max("c").cast("bigint").alias("max_distinct_rhs"),
            (viol == 0).alias("holds"))
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Log-rank test (r8) — the hypothesis-test companion to
# stats_kaplan_meier_churn: do BUILDING-segment customers churn
# (time-to-second-order) at a different rate than everyone else?
# Standard Mantel-Cox machinery: at every pooled event time, compare
# group-1's observed events with the expectation under the pooled
# hazard, accumulate the hypergeometric variance, and report
# (O1-E1)^2 / V. The honest answer on this corpus is "no difference"
# (segments are assigned independently of behavior) — the test's
# calibration matters more than drama.
#
# Exactness: risk sets and observed counts are exact BIGINTs; each
# per-time expectation/variance term is rounded to 6 dp then summed
# as exact DECIMAL (order-free, the repo's sum-of-rounded-terms
# rule); NULLIF guards the n-1 denominator at the final event time.
# Scale: one custkey shuffle + a broadcast customer-dim join; all
# windows run on the bounded day grid (single-task by design).
# ---------------------------------------------------------------------------

LOGRANK_GROUP1 = "BUILDING"


@query(
    "stats_logrank_test",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    life AS (
      SELECT o_custkey, min(o_orderdate) AS f,
             min(CASE WHEN rn = 2 THEN o_orderdate END) AS s
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    subj AS (
      SELECT CASE WHEN c.c_mktsegment = '{LOGRANK_GROUP1}'
                  THEN 1 ELSE 0 END AS g,
             CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN t_evt ELSE fup END AS t,
             CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN 1 ELSE 0 END AS evt
      FROM (SELECT o_custkey,
                   LEAST({KM_HORIZON}, datediff('day', f, mxd)) AS fup,
                   datediff('day', f, s) AS t_evt
            FROM life, mx) l
      JOIN customer c ON c.c_custkey = l.o_custkey
    ),
    grid AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(SUM(CASE WHEN g = 1 THEN evt ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN g = 0 THEN evt ELSE 0 END) AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN g = 1 THEN 1 - evt ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN g = 0 THEN 1 - evt ELSE 0 END)
                  AS BIGINT) AS c2
      FROM subj GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_0,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2_0
      FROM subj
    ),
    risk AS (
      SELECT t, d1, d2,
             tot.n1_0 - COALESCE(CAST(SUM(d1 + c1) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n1,
             tot.n2_0 - COALESCE(CAST(SUM(d2 + c2) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n2
      FROM grid, tot
    ),
    terms AS (
      SELECT d1, d1 + d2 AS d,
             CAST(round(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2), 6)
                  AS DECIMAL(18,6)) AS e1,
             CAST(round(CAST(d1 + d2 AS DOUBLE)
                        * (CAST(n1 AS DOUBLE) / (n1 + n2))
                        * (1 - CAST(n1 AS DOUBLE) / (n1 + n2))
                        * (n1 + n2 - d1 - d2)
                        / NULLIF(n1 + n2 - 1, 0), 6)
                  AS DECIMAL(18,6)) AS v
      FROM risk WHERE d1 + d2 > 0
    )
    SELECT (SELECT n1_0 FROM tot) AS n_group1,
           (SELECT n2_0 FROM tot) AS n_group2,
           CAST(SUM(d1) AS BIGINT) AS o1,
           CAST(SUM(e1) AS DOUBLE) AS e1,
           CAST(SUM(d) - SUM(d1) AS BIGINT) AS o2,
           CAST(SUM(d) - SUM(e1) AS DOUBLE) AS e2,
           CAST(SUM(v) AS DOUBLE) AS var_o1,
           round((SUM(d1) - CAST(SUM(e1) AS DOUBLE))
                 * (SUM(d1) - CAST(SUM(e1) AS DOUBLE))
                 / CAST(SUM(v) AS DOUBLE), 6) AS logrank_chi2
    FROM terms
    """,
)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test of '{LOGRANK_GROUP1}'-segment vs other
    customers on time-to-second-order (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey"))
    life = (orders.select("o_custkey", "o_orderdate", rn.alias("rn"))
            .groupBy("o_custkey")
            .agg(F.min("o_orderdate").alias("f"),
                 F.min(F.when(F.col("rn") == 2,
                              F.col("o_orderdate"))).alias("s")))
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    seg = cust.select(F.col("c_custkey").alias("o_custkey"),
                      F.when(F.col("c_mktsegment") == LOGRANK_GROUP1, 1)
                      .otherwise(0).alias("g"))
    obs = (life.crossJoin(F.broadcast(mx))
           .join(F.broadcast(seg), "o_custkey")
           .select("g",
                   F.least(F.lit(KM_HORIZON),
                           F.datediff("mxd", "f")).alias("fup"),
                   F.datediff("s", "f").alias("t_evt")))
    is_evt = F.col("t_evt").isNotNull() & (F.col("t_evt") <= F.col("fup"))
    subj = obs.select(
        "g",
        F.when(is_evt, F.col("t_evt")).otherwise(F.col("fup")).alias("t"),
        F.when(is_evt, F.lit(1)).otherwise(F.lit(0)).alias("evt"))
    g1 = F.col("g") == 1
    grid = (subj.groupBy(F.col("t").cast("bigint").alias("t"))
            .agg(F.sum(F.when(g1, F.col("evt")).otherwise(0))
                 .cast("bigint").alias("d1"),
                 F.sum(F.when(~g1, F.col("evt")).otherwise(0))
                 .cast("bigint").alias("d2"),
                 F.sum(F.when(g1, 1 - F.col("evt")).otherwise(0))
                 .cast("bigint").alias("c1"),
                 F.sum(F.when(~g1, 1 - F.col("evt")).otherwise(0))
                 .cast("bigint").alias("c2")))
    tot = subj.agg(
        F.sum(F.when(g1, 1).otherwise(0)).cast("bigint").alias("n1_0"),
        F.sum(F.when(~g1, 1).otherwise(0)).cast("bigint").alias("n2_0"))
    # bounded day grid: unpartitioned window, single-task by design
    w_prior = (Window.orderBy("t")
               .rowsBetween(Window.unboundedPreceding, -1))
    risk = (grid.crossJoin(F.broadcast(tot))
            .select("t", "d1", "d2", "n1_0", "n2_0",
                    (F.col("n1_0") - F.coalesce(
                        F.sum(F.col("d1") + F.col("c1")).over(w_prior)
                        .cast("bigint"), F.lit(0).cast("bigint")))
                    .alias("n1"),
                    (F.col("n2_0") - F.coalesce(
                        F.sum(F.col("d2") + F.col("c2")).over(w_prior)
                        .cast("bigint"), F.lit(0).cast("bigint")))
                    .alias("n2")))
    n = (F.col("n1") + F.col("n2")).cast("double")
    d = (F.col("d1") + F.col("d2")).cast("double")
    p1 = F.col("n1").cast("double") / n
    terms = (risk.filter(F.col("d1") + F.col("d2") > 0)
             .select("n1_0", "n2_0", "d1",
                     (F.col("d1") + F.col("d2")).alias("d"),
                     F.round(d * F.col("n1") / (F.col("n1") + F.col("n2")),
                             6).cast("decimal(18,6)").alias("e1"),
                     F.round(d * p1 * (1 - p1) * (n - d)
                             / F.nullif((F.col("n1") + F.col("n2") - 1)
                                        .cast("double"), F.lit(0.0)), 6)
                     .cast("decimal(18,6)").alias("v")))
    o1 = F.sum("d1").cast("bigint")
    e1 = F.sum("e1").cast("double")
    dd = F.sum("d")
    return terms.agg(
        F.max("n1_0").alias("n_group1"),
        F.max("n2_0").alias("n_group2"),
        o1.alias("o1"), e1.alias("e1"),
        (dd - F.sum("d1")).cast("bigint").alias("o2"),
        (dd.cast("double") - e1).alias("e2"),
        F.sum("v").cast("double").alias("var_o1"),
        F.round((o1.cast("double") - e1) * (o1.cast("double") - e1)
                / F.sum("v").cast("double"), 6).alias("logrank_chi2"))


# ---------------------------------------------------------------------------
# Greenwood confidence band (r8) — the error bars for the KM curve
# above: Var[S(t)] = S(t)^2 * sum_{u<=t} d_u / (n_u (n_u - d_u))
# (Greenwood 1926), reported as the +-1.96 SE band a churn dashboard
# draws around the survival estimate.
#
# Determinism: the variance accumulator follows the KM discipline —
# each Greenwood term is the exact integer d*1e15 DIV (n*(n-d))
# (bounded: d < 9e3 keeps d*1e15 < 2^63; n = d would make the term
# infinite and yields NULL by the nullif guard — impossible here
# while censored subjects remain), the running sum is exact BIGINT,
# and S(t) is the engine-exact survival_q9. The only doubles are the
# final sqrt (IEEE-correctly-rounded) and the 6-dp output rounds of
# identical inputs. Same bounded-day-grid single-task windows as the
# KM op; the chain deliberately mirrors stats_kaplan_meier_churn's.
# ---------------------------------------------------------------------------

@query(
    "stats_km_greenwood_band",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    life AS (
      SELECT o_custkey, min(o_orderdate) AS f,
             min(CASE WHEN rn = 2 THEN o_orderdate END) AS s
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    subj AS (
      SELECT CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN t_evt ELSE fup END AS t,
             CASE WHEN t_evt IS NOT NULL AND t_evt <= fup
                  THEN 1 ELSE 0 END AS evt
      FROM (SELECT LEAST({KM_HORIZON}, datediff('day', f, mxd)) AS fup,
                   datediff('day', f, s) AS t_evt
            FROM life, mx)
    ),
    grid AS (
      SELECT CAST(t AS BIGINT) AS t, CAST(SUM(evt) AS BIGINT) AS d,
             CAST(SUM(1 - evt) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d, c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM subj)
               - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS n
      FROM grid
    ),
    fac AS (
      SELECT t, d, c, n,
             (2 * (n - d) * 1000000000 + n) // (2 * n) AS factor,
             d * 1000000000000000 // NULLIF(n * (n - d), 0) AS gterm
      FROM risk
    ),
    curve AS (
      SELECT t, d, n,
             CAST(list_reduce(
               list_prepend(CAST(1000000000 AS BIGINT),
                            list(factor) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)),
               (acc, x) -> (acc * x + 500000000) // 1000000000)
               AS BIGINT) AS sq,
             CAST(SUM(gterm) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS gsum
      FROM fac
    )
    SELECT t AS t_days,
           round(CAST(sq AS DOUBLE) / 1e9, 6) AS survival,
           round(CAST(sq AS DOUBLE) / 1e9 * CAST(sq AS DOUBLE) / 1e9
                 * CAST(gsum AS DOUBLE) / 1e15, 9) AS greenwood_var,
           round(GREATEST(0, CAST(sq AS DOUBLE) / 1e9
                 - 1.96 * sqrt(CAST(sq AS DOUBLE) / 1e9
                               * CAST(sq AS DOUBLE) / 1e9
                               * CAST(gsum AS DOUBLE) / 1e15)), 6) AS ci_lo,
           round(LEAST(1, CAST(sq AS DOUBLE) / 1e9
                 + 1.96 * sqrt(CAST(sq AS DOUBLE) / 1e9
                               * CAST(sq AS DOUBLE) / 1e9
                               * CAST(gsum AS DOUBLE) / 1e15)), 6) AS ci_hi
    FROM curve WHERE d > 0
    """,
)
def stats_km_greenwood_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM survival with the Greenwood +-1.96 SE confidence band
    (see block comment; chain mirrors stats_kaplan_meier_churn)."""
    orders = load_table(spark, sf_dir, "orders")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey"))
    life = (orders.select("o_custkey", "o_orderdate", rn.alias("rn"))
            .groupBy("o_custkey")
            .agg(F.min("o_orderdate").alias("f"),
                 F.min(F.when(F.col("rn") == 2,
                              F.col("o_orderdate"))).alias("s")))
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    obs = (life.crossJoin(F.broadcast(mx))
           .select(F.least(F.lit(KM_HORIZON),
                           F.datediff("mxd", "f")).alias("fup"),
                   F.datediff("s", "f").alias("t_evt")))
    is_evt = F.col("t_evt").isNotNull() & (F.col("t_evt") <= F.col("fup"))
    subj = obs.select(
        F.when(is_evt, F.col("t_evt")).otherwise(F.col("fup")).alias("t"),
        F.when(is_evt, F.lit(1)).otherwise(F.lit(0)).alias("evt"))
    grid = (subj.groupBy(F.col("t").cast("bigint").alias("t"))
            .agg(F.sum("evt").cast("bigint").alias("d"),
                 F.sum(F.lit(1) - F.col("evt")).cast("bigint").alias("c")))
    total = subj.agg(F.count("*").cast("bigint").alias("total"))
    # bounded day grid: unpartitioned single-task windows by design
    w_prior = (Window.orderBy("t")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_upto = (Window.orderBy("t")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = (grid.crossJoin(F.broadcast(total))
            .withColumn("n", F.col("total")
                        - F.coalesce(F.sum(F.col("d") + F.col("c"))
                                     .over(w_prior).cast("bigint"),
                                     F.lit(0).cast("bigint")))
            .drop("total"))
    fac = (risk
           .withColumn("factor", F.expr(
               "(2 * (n - d) * 1000000000 + n) div (2 * n)"))
           # ADVICE r8: d * 1e15 overflows BIGINT once a single day's
           # event count d exceeds 9223 (d*1e15 < 2^63); at this
           # corpus max(d) is ~tens, but a larger corpus would hard-
           # fail under ANSI with an opaque overflow. Raise a NAMED
           # error at the exact bound instead of relying on a comment.
           .withColumn("gterm", F.expr(
               "CASE WHEN d > 9223 THEN raise_error("
               "'stats_km_greenwood_band: per-day event count d > 9223 "
               "exceeds the d*1e15 BIGINT headroom; split the Greenwood "
               "scale across two factors before rerunning') "
               "ELSE d * 1000000000000000 div nullif(n * (n - d), 0) "
               "END")))
    curve = (fac
             .withColumn("fs", F.collect_list("factor").over(w_upto))
             .withColumn("sq", F.expr(
                 "aggregate(fs, CAST(1000000000 AS BIGINT), "
                 "(acc, x) -> (acc * x + 500000000) div 1000000000)"))
             .withColumn("gsum", F.sum("gterm").over(w_upto)
                         .cast("bigint")))
    s = F.col("sq").cast("double") / F.lit(1e9)
    var = s * s * F.col("gsum").cast("double") / F.lit(1e15)
    return (curve.filter(F.col("d") > 0)
            .select(F.col("t").alias("t_days"),
                    F.round(s, 6).alias("survival"),
                    F.round(var, 9).alias("greenwood_var"),
                    F.round(F.greatest(F.lit(0.0),
                                       s - 1.96 * F.sqrt(var)), 6)
                    .alias("ci_lo"),
                    F.round(F.least(F.lit(1.0),
                                    s + 1.96 * F.sqrt(var)), 6)
                    .alias("ci_hi")))


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index (r8) — per-nation supplier
# market concentration by revenue: HHI = sum over suppliers of
# (revenue share)^2. The antitrust-style complement to Gini/Lorenz
# (which rank customers): near 1/n = fragmented supply, near 1 = one
# supplier owns the nation's market. Curation pipelines compute the
# same statistic over source shares before trusting a mixture.
#
# Exactness: per-supplier revenue is an exact DECIMAL(18,2) sum;
# HHI = SUM(r_i^2) / T^2 with the squares and both sums exact decimal
# (r^2 fits: 18+18+1 = 37 digits), ONE double division at the end,
# rounded 6 dp from identical inputs. One shuffle to (nation,
# supplier) grain; nation rollup is map-side after that.
# ---------------------------------------------------------------------------

@query(
    "ads_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(r) AS DOUBLE) AS total_rev,
           round(CAST(SUM(r * r) AS DOUBLE)
                 / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 6)
             AS hhi
    FROM rev GROUP BY 1
    """,
)
def ads_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue HHI (see block comment)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nation"))
    rev = (li.join(F.broadcast(s), "l_suppkey")
           .groupBy("nation", "l_suppkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("r")))
    return (rev.groupBy(F.col("nation").cast("bigint").alias("nation"))
            .agg(F.count("*").cast("bigint").alias("n_suppliers"),
                 F.sum("r").cast("double").alias("total_rev"),
                 F.round(F.sum(F.col("r") * F.col("r")).cast("double")
                         / (F.sum("r").cast("double")
                            * F.sum("r").cast("double")), 6)
                 .alias("hhi")))


# ---------------------------------------------------------------------------
# Distribution-free median CI by order statistics (r8) — the exact
# binomial-rank interval: the median's 95% CI is the pair of order
# statistics at ranks n/2 -+ 1.96*sqrt(n)/2 (normal approximation to
# Binomial(n, 1/2) — no resampling, no distributional assumption;
# the textbook companion to the Poisson bootstrap above, which
# targets the MEAN). Ranks are computed from n in identical double
# ops then floored/ceiled to exact integers, so both engines pick the
# same rows; values at a rank are unambiguous under the
# (price, orderkey) total order.
#
# Scale (reworked r12): the global row_number is the TWO-LEVEL
# grid_rank (operators/ranks.py) over the bounded $10k price grid —
# bit-identical ranks, no single-task sort (the "mechanical two-phase
# fix" this note used to promise; test_plan_quality.py now gates it).
# ---------------------------------------------------------------------------

@query(
    "stats_median_ci_orderstat",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    ranks AS (
      SELECT n,
             CAST((n + 1) // 2 AS BIGINT) AS k_med,
             CAST(GREATEST(1, floor(n / 2.0
                  - 1.96 * sqrt(CAST(n AS DOUBLE)) / 2)) AS BIGINT) AS k_lo,
             CAST(LEAST(n, ceil(n / 2.0 + 1
                  + 1.96 * sqrt(CAST(n AS DOUBLE)) / 2)) AS BIGINT) AS k_hi
      FROM n
    ),
    ordered AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
      FROM orders
    )
    SELECT r.n, r.k_lo, r.k_med, r.k_hi,
           MAX(CASE WHEN o.rk = r.k_lo THEN o.o_totalprice END) AS ci_lo,
           MAX(CASE WHEN o.rk = r.k_med THEN o.o_totalprice END) AS median,
           MAX(CASE WHEN o.rk = r.k_hi THEN o.o_totalprice END) AS ci_hi
    FROM ordered o, ranks r
    WHERE o.rk IN (r.k_lo, r.k_med, r.k_hi)
    GROUP BY 1, 2, 3, 4
    """,
)
def stats_median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic 95% CI for the median order value (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    n = orders.agg(F.count("*").cast("bigint").alias("n"))
    sq = F.sqrt(F.col("n").cast("double"))
    ranks = n.select(
        "n",
        F.expr("(n + 1) div 2").cast("bigint").alias("k_med"),
        F.greatest(F.lit(1).cast("bigint"),
                   F.floor(F.col("n") / 2.0 - 1.96 * sq / 2)
                   .cast("bigint")).alias("k_lo"),
        F.least(F.col("n"),
                F.ceil(F.col("n") / 2.0 + 1 + 1.96 * sq / 2)
                .cast("bigint")).alias("k_hi"))
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    # two-level rank over the bounded price grid (see block comment)
    ordered = grid_rank(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        F.floor(F.col("o_totalprice") / 10000).cast("bigint"),
    ).select("o_totalprice", "rk")
    j = ordered.crossJoin(F.broadcast(ranks)).filter(
        (F.col("rk") == F.col("k_lo")) | (F.col("rk") == F.col("k_med"))
        | (F.col("rk") == F.col("k_hi")))
    pick = lambda k: F.max(F.when(F.col("rk") == F.col(k),
                                  F.col("o_totalprice")))
    return (j.groupBy("n", "k_lo", "k_med", "k_hi")
            .agg(pick("k_lo").alias("ci_lo"),
                 pick("k_med").alias("median"),
                 pick("k_hi").alias("ci_hi")))


# ---------------------------------------------------------------------------
# Decision-stump induction (r8) — the first supervised-learning
# primitive in the repo (OLS fits a line; this INDUCES a rule): find
# the price threshold that best separates urgent orders, by exact
# Gini impurity reduction over a binned feature. The depth-1 special
# case of tree training, and the exact shape a distributed GBDT
# iteration evaluates per feature (histogram-aggregate then scan
# candidate splits) — at 100 TB the corpus-sized stage is ONE
# histogram aggregate; split search runs on the bounded bin grid.
#
# Determinism: the histogram is exact integer (price quantized to
# cents, bin = cents DIV BIN_CENTS); every candidate's Gini gain is
# computed from exact BIGINT counts in identical double arithmetic —
# same ints in, same doubles out — and the argmax breaks ties on the
# smaller bin, a total order.
# ---------------------------------------------------------------------------

STUMP_BIN_CENTS = 1_000_000      # $10k feature bins


@query(
    "ml_decision_stump_split",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               // {STUMP_BIN_CENTS} AS bin,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    hist AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM pts GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt
      FROM hist
    ),
    cand AS (
      SELECT bin,
             CAST(SUM(n) OVER w AS BIGINT) AS nl,
             CAST(SUM(pos) OVER w AS BIGINT) AS pl,
             tot.nt, tot.pt
      FROM hist, tot
      WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    gains AS (
      SELECT bin, nl, pl, nt - nl AS nr, pt - pl AS pr,
             (1 - (CAST(pt AS DOUBLE) / nt) * (CAST(pt AS DOUBLE) / nt)
                - (CAST(nt - pt AS DOUBLE) / nt)
                  * (CAST(nt - pt AS DOUBLE) / nt))
             - CAST(nl AS DOUBLE) / nt
               * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                    - (CAST(nl - pl AS DOUBLE) / nl)
                      * (CAST(nl - pl AS DOUBLE) / nl))
             - CAST(nt - nl AS DOUBLE) / nt
               * (1 - (CAST(pt - pl AS DOUBLE) / (nt - nl))
                      * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                    - (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl))
                      * (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl)))
               AS gain
      FROM cand WHERE nl > 0 AND nt - nl > 0
    )
    SELECT CAST(bin AS BIGINT) AS split_bin,
           CAST((bin + 1) * {STUMP_BIN_CENTS} AS BIGINT)
             AS split_price_cents,
           round(gain, 9) AS gini_gain,
           nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right
    FROM gains
    ORDER BY gain DESC, bin LIMIT 1
    """,
)
def ml_decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best urgent-vs-not price split by exact Gini gain over $10k
    bins (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.expr(f"cast(floor(o_totalprice * 100 + 0.5) as bigint)"
               f" div {STUMP_BIN_CENTS}").alias("bin"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("y"))
    hist = (pts.groupBy("bin")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum("y").cast("bigint").alias("pos")))
    tot = hist.agg(F.sum("n").cast("bigint").alias("nt"),
                   F.sum("pos").cast("bigint").alias("pt"))
    # bounded bin grid (~60 rows): unpartitioned window by design
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cand = (hist.crossJoin(F.broadcast(tot))
            .select("bin", "nt", "pt",
                    F.sum("n").over(w).cast("bigint").alias("nl"),
                    F.sum("pos").over(w).cast("bigint").alias("pl"))
            .filter((F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)))

    def gini(p, n):
        p, n = p.cast("double"), n.cast("double")
        return 1 - (p / n) * (p / n) - ((n - p) / n) * ((n - p) / n)

    nl, pl = F.col("nl"), F.col("pl")
    nt, pt = F.col("nt"), F.col("pt")
    gain = (gini(pt, nt)
            - nl.cast("double") / nt.cast("double") * gini(pl, nl)
            - (nt - nl).cast("double") / nt.cast("double")
              * gini(pt - pl, nt - nl))
    ranked = (cand.select(
        "bin", "nl", "pl", (nt - nl).alias("nr"), (pt - pl).alias("pr"),
        gain.alias("gain"))
        .withColumn("rk", F.row_number().over(
            Window.orderBy(F.desc("gain"), "bin")))
        .filter(F.col("rk") == 1))
    return ranked.select(
        F.col("bin").cast("bigint").alias("split_bin"),
        ((F.col("bin") + 1) * STUMP_BIN_CENTS).cast("bigint")
        .alias("split_price_cents"),
        F.round("gain", 9).alias("gini_gain"),
        F.col("nl").alias("n_left"), F.col("pl").alias("pos_left"),
        F.col("nr").alias("n_right"), F.col("pr").alias("pos_right"))


# ---------------------------------------------------------------------------
# Durbin-Watson residual autocorrelation (r9) — the canonical "are my
# regression residuals serially correlated" test (Durbin & Watson
# 1950): fit the OLS trend of weekly order volume, then
# DW = sum (e_t - e_{t-1})^2 / sum e_t^2. A DW far below 2 says the
# trend residuals are momentum-laden (demand shocks persist across
# weeks) and naive trend extrapolation will be overconfident.
#
# EXACTNESS: the residual is computed as the exact INTEGER
# E_t = n*Sxx'*y_t - Sxx'*Sy + Sxy'*Sx - n*Sxy'*t  (all BIGINT; the
# common positive scale n*Sxx' cancels in the DW ratio), squares are
# summed in HUGEINT/DECIMAL(38,0), and the single double division is
# 6-dp rounded from identical integers. Week grain (~340 rows) rides
# the DAY-GRAIN CONTRACT (module docstring) — the lag window is
# single-task on a calendar-bounded grid.
# ---------------------------------------------------------------------------

@query(
    "stats_durbin_watson",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT wk, y,
             CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t
      FROM wkly
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS BIGINT) AS sxx,
             CAST(SUM(t * y) AS BIGINT) AS sxy
      FROM idx
    ),
    prim AS (
      SELECT n, sx, sy, n * sxx - sx * sx AS sxxp,
             n * sxy - sx * sy AS sxyp
      FROM tot
    ),
    resid AS (
      SELECT i.t,
             p.n * p.sxxp * i.y - p.sxxp * p.sy + p.sxyp * p.sx
               - p.n * p.sxyp * i.t AS e
      FROM idx i, prim p
    ),
    lagd AS (
      SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM resid
    )
    SELECT (SELECT n FROM prim) AS n_weeks,
           round(CAST(SUM(CASE WHEN ep IS NULL THEN 0
                          ELSE CAST(e - ep AS HUGEINT) * (e - ep) END)
                      AS DOUBLE)
                 / CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE), 6) AS dw,
           round(1.0 - CAST(SUM(CASE WHEN ep IS NULL THEN 0
                            ELSE CAST(e - ep AS HUGEINT) * (e - ep) END)
                            AS DOUBLE)
                 / CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE) / 2.0, 6)
             AS rho1_approx
    FROM lagd
    """,
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of weekly-order-volume OLS residuals
    (exact-integer residuals; see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # calendar-bounded week grid: single-task windows by design
    # (DAY-GRAIN CONTRACT, module docstring)
    idx = wkly.select(
        "wk", "y",
        F.row_number().over(Window.orderBy("wk")).cast("bigint").alias("t"))
    tot = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sxy"))
    prim = tot.select(
        "n", "sx", "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("sxxp"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("sxyp"))
    resid = (idx.crossJoin(F.broadcast(prim))
             .select("t", "n",
                     (F.col("n") * F.col("sxxp") * F.col("y")
                      - F.col("sxxp") * F.col("sy")
                      + F.col("sxyp") * F.col("sx")
                      - F.col("n") * F.col("sxyp") * F.col("t")).alias("e")))
    lagd = resid.select(
        "n", "e", F.lag("e").over(Window.orderBy("t")).alias("ep"))
    dd = F.sum(F.when(F.col("ep").isNull(), F.lit(0).cast("decimal(38,0)"))
               .otherwise((F.col("e") - F.col("ep")).cast("decimal(38,0)")
                          * (F.col("e") - F.col("ep"))))
    ee = F.sum(F.col("e").cast("decimal(38,0)") * F.col("e"))
    return lagd.groupBy().agg(
        F.first("n").alias("n_weeks"),
        F.round(dd.cast("double") / ee.cast("double"), 6).alias("dw"),
        F.round(F.lit(1.0) - dd.cast("double") / ee.cast("double") / 2.0, 6)
        .alias("rho1_approx"))


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test (r9) — Box & Pierce 1970 / Ljung & Box
# 1978: are the first K autocorrelations of weekly order volume jointly
# zero? Q(K) = n(n+2) sum_{k<=K} r_k^2/(n-k). The whiteness check a
# forecasting pipeline runs on model residuals; here run directly on
# the demeaned series (so it doubles as "is there ANY exploitable
# autocorrelation").
#
# EXACTNESS: Z_t = n*y_t - Sy is exact BIGINT; each r_k is one double
# division of exact BIGINT dot products; the cumulative Q is a
# single-task ordered sum over K=8 identical doubles. Week grain ->
# DAY-GRAIN CONTRACT (module docstring).
# ---------------------------------------------------------------------------

LJUNG_BOX_LAGS = 8


@query(
    "stats_ljung_box",
    oracle=f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t
      FROM wkly
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ),
    z AS (
      SELECT i.t, tot.n, tot.n * i.y - tot.sy AS zv FROM idx i, tot
    ),
    rk AS (
      SELECT k.k, any_value(z.n) AS n,
             CAST(SUM(zv * lag_zv) AS BIGINT) AS num,
             (SELECT CAST(SUM(zv * zv) AS BIGINT) FROM z) AS den
      FROM UNNEST(generate_series(1, {LJUNG_BOX_LAGS})) AS k(k)
           JOIN (SELECT t, n, zv,
                        lag(zv, 1) OVER (ORDER BY t) AS l1,
                        lag(zv, 2) OVER (ORDER BY t) AS l2,
                        lag(zv, 3) OVER (ORDER BY t) AS l3,
                        lag(zv, 4) OVER (ORDER BY t) AS l4,
                        lag(zv, 5) OVER (ORDER BY t) AS l5,
                        lag(zv, 6) OVER (ORDER BY t) AS l6,
                        lag(zv, 7) OVER (ORDER BY t) AS l7,
                        lag(zv, 8) OVER (ORDER BY t) AS l8
                 FROM z) z
             ON TRUE
           CROSS JOIN LATERAL (SELECT CASE k.k
                 WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3
                 WHEN 4 THEN l4 WHEN 5 THEN l5 WHEN 6 THEN l6
                 WHEN 7 THEN l7 ELSE l8 END AS lag_zv) lz
      WHERE lag_zv IS NOT NULL
      GROUP BY 1
    ),
    scored AS (
      SELECT k, n, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
               AS r_k,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r_raw
      FROM rk
    )
    SELECT CAST(k AS BIGINT) AS lag_k, r_k,
           round(n * (n + 2.0) * SUM(r_raw * r_raw / (n - k))
                 OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW), 6) AS q_cum
    FROM scored ORDER BY 1
    """,
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over the first {LJUNG_BOX_LAGS} autocorrelations of
    weekly order volume (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    idx = wkly.select(
        "y", F.row_number().over(Window.orderBy("wk"))
        .cast("bigint").alias("t"))
    tot = idx.agg(F.count("*").cast("bigint").alias("n"),
                  F.sum("y").cast("bigint").alias("sy"))
    z = (idx.crossJoin(F.broadcast(tot))
         .select("t", "n",
                 (F.col("n") * F.col("y") - F.col("sy")).alias("zv")))
    # bounded week grid: single-task lag windows by design (DAY-GRAIN
    # CONTRACT, module docstring)
    w = Window.orderBy("t")
    lags = z.select(
        "t", "n", "zv",
        *[F.lag("zv", k).over(w).alias(f"l{k}")
          for k in range(1, LJUNG_BOX_LAGS + 1)])
    den = z.agg(F.sum(F.col("zv") * F.col("zv"))
                .cast("bigint").alias("den"))
    parts = []
    for k in range(1, LJUNG_BOX_LAGS + 1):
        parts.append(
            lags.filter(F.col(f"l{k}").isNotNull())
            .groupBy()
            .agg(F.lit(k).cast("bigint").alias("lag_k"),
                 F.first("n").alias("n"),
                 F.sum(F.col("zv") * F.col(f"l{k}"))
                 .cast("bigint").alias("num")))
    rk = parts[0]
    for p in parts[1:]:
        rk = rk.unionAll(p)
    scored = (rk.crossJoin(F.broadcast(den))
              .select("lag_k", "n",
                      F.round(F.col("num").cast("double")
                              / F.col("den").cast("double"), 6).alias("r_k"),
                      (F.col("num").cast("double")
                       / F.col("den").cast("double")).alias("r_raw")))
    wq = Window.orderBy("lag_k").rowsBetween(Window.unboundedPreceding, 0)
    return (scored.select(
        "lag_k", "r_k",
        F.round(F.col("n") * (F.col("n") + 2.0)
                * F.sum(F.col("r_raw") * F.col("r_raw")
                        / (F.col("n") - F.col("lag_k"))).over(wq), 6)
        .alias("q_cum"))
        .orderBy("lag_k"))


# ---------------------------------------------------------------------------
# Grubbs outlier score (r9) — Grubbs 1950: G = max |y - ybar| / s on
# daily revenue. The single-most-extreme-day screen an ops dashboard
# runs before trusting a daily total (fat-finger refunds, double
# loads). Reported for the top 3 |deviation| days so the tail shape is
# visible, not just the champion.
#
# EXACTNESS: D_t = n*y_t - Sy in exact BIGINT cents; sum of squares in
# HUGEINT/DECIMAL(38,0); G_i = |D_i| * sqrt(n-1) / sqrt(sum D^2) is
# the identical double expression in both engines over identical
# integers, 6-dp rounded. Day grain -> DAY-GRAIN CONTRACT.
# ---------------------------------------------------------------------------

@query(
    "stats_grubbs_outlier",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sy
      FROM daily
    ),
    dev AS (
      SELECT d, cents, t.n, t.n * cents - t.sy AS dd FROM daily, tot t
    ),
    ss AS (
      SELECT CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE) AS sd2 FROM dev
    ),
    ranked AS (
      SELECT d, cents, n, dd,
             row_number() OVER (ORDER BY ABS(dd) DESC, d) AS rk
      FROM dev
    )
    SELECT CAST(rk AS BIGINT) AS rk, strftime(d, '%Y-%m-%d') AS d,
           cents AS revenue_cents,
           round(ABS(CAST(dd AS DOUBLE)) * sqrt(n - 1.0) / sqrt(ss.sd2), 6)
             AS g_score
    FROM ranked, ss WHERE rk <= 3 ORDER BY rk
    """,
)
def stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs G for the 3 most extreme daily-revenue days (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.to_date("o_orderdate").alias("d"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
                  .cast("bigint").alias("cents")))
    tot = daily.agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("cents").cast("bigint").alias("sy"))
    dev = (daily.crossJoin(F.broadcast(tot))
           .select("d", "cents", "n",
                   (F.col("n") * F.col("cents") - F.col("sy")).alias("dd")))
    ss = dev.agg(F.sum(F.col("dd").cast("decimal(38,0)") * F.col("dd"))
                 .cast("double").alias("sd2"))
    # bounded day grain: single-task rank window by design (DAY-GRAIN
    # CONTRACT, module docstring)
    ranked = dev.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.abs("dd").desc(), "d")))
    return (ranked.filter(F.col("rk") <= 3)
            .crossJoin(F.broadcast(ss))
            .select(F.col("rk").cast("bigint").alias("rk"),
                    F.date_format("d", "yyyy-MM-dd").alias("d"),
                    F.col("cents").alias("revenue_cents"),
                    F.round(F.abs(F.col("dd").cast("double"))
                            * F.sqrt(F.col("n") - 1.0)
                            / F.sqrt(F.col("sd2")), 6).alias("g_score"))
            .orderBy("rk"))


# ---------------------------------------------------------------------------
# Cramer's V association (r9) — the normalized effect size the chi2
# independence test (round 6) deliberately left out: V =
# sqrt(chi2 / (N * min(r-1, c-1))) in [0, 1], comparable across table
# shapes. Order priority x line return flag: "does urgency change the
# return outcome" as a single dimensionless number.
#
# EXACTNESS (reworked round 10 after the r9 driver-red hash row): the
# original implementation summed 15 per-cell chi2 terms as raw doubles —
# an UNORDERED float SUM whose result depends on partition merge order
# (ulp-level drift measured across summation orders).  Each chi2 term is
# exactly rational: with expected count E = r*cl/n,
#   (o - E)^2 / E  =  (o*n - r*cl)^2 / (r*cl*n),
# so the rework computes the integer numerator (o*n - r*cl)^2 and
# denominator r*cl*n exactly (DECIMAL(38,0) / HUGEINT), half-up-rounds
# each term to 9 dp AS AN INTEGER term_1e9 = round_half_up(num*1e9/den),
# sums those integers exactly (order-free), then derives chi2 at 6 dp
# and V by a floor(x*1e6+0.5) quantization of the deterministic double
# sqrt — the repo's round-terms-first-then-exact-sum convention (KM
# survival / Greenwood / Durbin-Watson discipline).  Both engines now
# compute identical integers at every compare boundary.
# Headroom: num = diff^2 <= n^4 needs n <= ~3.1e9 for DECIMAL(38,0);
# guarded with a named raise_error at n > 2e9 (Greenwood pattern).
# ---------------------------------------------------------------------------

@query(
    "stats_cramers_v",
    oracle="""
    WITH joined AS (
      SELECT o.o_orderpriority AS pri, l.l_returnflag AS mode
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cells AS (
      SELECT pri, mode, CAST(COUNT(*) AS BIGINT) AS o
      FROM joined GROUP BY 1, 2
    ),
    margins AS (
      SELECT c.pri, c.mode, c.o,
             SUM(c.o) OVER (PARTITION BY c.pri) AS r,
             SUM(c.o) OVER (PARTITION BY c.mode) AS cl,
             SUM(c.o) OVER () AS n
      FROM cells c
    ),
    terms AS (
      SELECT pri, mode, o, r, cl, n,
             CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * cl AS diff,
             CAST(r AS HUGEINT) * cl * n AS den
      FROM margins
    ),
    qt AS (
      SELECT pri, mode, n, den, diff * diff AS num,
             (diff * diff) // den AS q
      FROM terms
    ),
    t9 AS (
      SELECT pri, mode, n,
             q * 1000000000
               + ((num - q * den) * 2000000000 + den) // (den * 2)
               AS term_1e9
      FROM qt
    ),
    chi AS (
      SELECT any_value(n) AS n,
             CAST(COUNT(DISTINCT pri) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT mode) AS BIGINT) AS nc,
             (SUM(term_1e9) + 500) // 1000 AS chi2_x1e6
      FROM t9
    )
    SELECT CAST(n AS BIGINT) AS n_pairs, nr AS n_rows, nc AS n_cols,
           CAST(chi2_x1e6 AS DOUBLE) / 1000000.0 AS chi2,
           CAST(CAST(floor(
               sqrt((CAST(chi2_x1e6 AS DOUBLE) / 1000000.0)
                    / (CAST(n AS DOUBLE) * LEAST(nr - 1, nc - 1)))
               * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS cramers_v
    FROM chi
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V for order priority x return flag (see block comment)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("pri"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_returnflag").alias("mode"))
    cells = (li.join(orders, "l_orderkey")
             .groupBy("pri", "mode")
             .agg(F.count("*").cast("bigint").alias("o")))
    margins = cells.select(
        "pri", "mode", "o",
        F.sum("o").over(Window.partitionBy("pri")).alias("r"),
        F.sum("o").over(Window.partitionBy("mode")).alias("cl"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    d38 = "decimal(38,0)"
    terms = margins.select(
        "pri", "mode", "n",
        F.when(F.col("n") > F.lit(2_000_000_000),
               F.expr("raise_error('stats_cramers_v: n > 2e9 pairs "
                      "exceeds the diff^2 DECIMAL(38,0) headroom; "
                      "rescale the term quantization before rerunning')"
                      ).cast(d38))
        .otherwise(F.col("o").cast(d38) * F.col("n")
                   - F.col("r").cast(d38) * F.col("cl")).alias("diff"),
        (F.col("r").cast(d38) * F.col("cl") * F.col("n")).alias("den"))
    t9 = (terms
          .withColumn("num", F.col("diff") * F.col("diff"))
          .withColumn("q", F.expr("num div den"))
          .withColumn("term_1e9", F.expr(
              "q * 1000000000 "
              "+ ((num - q * den) * 2000000000 + den) div (den * 2)")))
    chi = t9.agg(
        F.first("n").alias("n"),
        F.countDistinct("pri").cast("bigint").alias("nr"),
        F.countDistinct("mode").cast("bigint").alias("nc"),
        F.expr("(CAST(SUM(CAST(term_1e9 AS DECIMAL(38,0))) AS BIGINT)"
               " + 500) div 1000").alias("chi2_x1e6"))
    chi2 = F.col("chi2_x1e6").cast("double") / F.lit(1000000.0)
    v_raw = F.sqrt(chi2 / (F.col("n").cast("double")
                           * F.least(F.col("nr") - 1, F.col("nc") - 1)))
    return chi.select(
        F.col("n").alias("n_pairs"), F.col("nr").alias("n_rows"),
        F.col("nc").alias("n_cols"),
        chi2.alias("chi2"),
        (F.floor(v_raw * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
         .cast("double") / F.lit(1000000.0)).alias("cramers_v"))


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing (r9) — Holt 1957: level +
# trend recursion over weekly order volume with alpha = 1/5, beta =
# 1/10, plus the h = 1..4-week forecasts l + h*b. The next rung above
# the EWMA monitor (round 7), which tracks level only and lags any
# sustained trend.
#
# ENGINE-EXACT FOLD (the Kaplan-Meier discipline): both level and
# trend live in one BIGINT accumulator — acc = l*2^31 + (b + 2^30)
# with l in 1e6 scale (l < 2^32 asserted by construction: weekly
# order counts < 4294 at any SF this corpus reaches; a larger corpus
# must re-scale) — and each step is pure integer arithmetic:
#   l' = (2*y*1e6 + 8*(l + b) + OFF + 5) div 10 - OFF/10... (OFF keeps
#   the numerator positive so div == floor in BOTH engines; Spark div
#   and DuckDB // both truncate toward zero, verified)
#   b' = ((l' - l) + 9*b + OFF + 5) div 10 - OFF/10
# The fold is aggregate() over the ordered week list in Spark and
# list_reduce(list(y ORDER BY wk)) in DuckDB — identical integer
# sequences, identical results, no floats until the 6-dp output round.
# Week grain -> DAY-GRAIN CONTRACT (module docstring).
# ---------------------------------------------------------------------------

# shared fold step; {D} is the engine's integer-division operator
_HOLT_STEP = (
    "CASE WHEN acc = -1 THEN y * 1000000 * 2147483648 + 1073741824 "
    "ELSE "
    "((2*y*1000000 + 8*((acc {D} 2147483648) + (acc % 2147483648"
    " - 1073741824)) + 10995116277760 + 5) {D} 10 - 1099511627776)"
    " * 2147483648 + "
    "((((2*y*1000000 + 8*((acc {D} 2147483648) + (acc % 2147483648"
    " - 1073741824)) + 10995116277760 + 5) {D} 10 - 1099511627776)"
    " - (acc {D} 2147483648)) + 9*(acc % 2147483648 - 1073741824)"
    " + 10995116277760 + 5) {D} 10 - 1099511627776 + 1073741824 "
    "END")


@query(
    "stats_holt_linear_smoothing",
    oracle=f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
             list_reduce(
               list_prepend(CAST(-1 AS BIGINT), list(y ORDER BY wk)),
               (acc, y) -> {_HOLT_STEP.format(D='//')}) AS acc
      FROM wkly
    ),
    state AS (
      SELECT n_weeks, acc // 2147483648 AS l6,
             acc % 2147483648 - 1073741824 AS b6
      FROM folded
    )
    SELECT n_weeks,
           round(l6 / 1e6, 6) AS level,
           round(b6 / 1e6, 6) AS trend,
           round((l6 + 1 * b6) / 1e6, 6) AS forecast_h1,
           round((l6 + 2 * b6) / 1e6, 6) AS forecast_h2,
           round((l6 + 3 * b6) / 1e6, 6) AS forecast_h3,
           round((l6 + 4 * b6) / 1e6, 6) AS forecast_h4
    FROM state
    """,
)
def stats_holt_linear_smoothing(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Holt level+trend fold over weekly order volume in one packed
    BIGINT accumulator (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # one ordered array of the calendar-bounded week grid, folded once
    # (DAY-GRAIN CONTRACT, module docstring)
    step = _HOLT_STEP.format(D="div")
    folded = (wkly
              .agg(F.count("*").cast("bigint").alias("n_weeks"),
                   F.expr("sort_array(collect_list(struct(wk, y)))")
                   .alias("series"))
              .select("n_weeks", F.expr(
                  "aggregate(transform(series, s -> s.y),"
                  f" CAST(-1 AS BIGINT), (acc, y) -> {step})").alias("acc")))
    state = folded.select(
        "n_weeks",
        F.expr("acc div 2147483648").alias("l6"),
        F.expr("acc % 2147483648 - 1073741824").alias("b6"))
    cols = [F.round(F.col("l6") / 1e6, 6).alias("level"),
            F.round(F.col("b6") / 1e6, 6).alias("trend")]
    for h in range(1, 5):
        cols.append(F.round((F.col("l6") + h * F.col("b6")) / 1e6, 6)
                    .alias(f"forecast_h{h}"))
    return state.select("n_weeks", *cols)


# ---------------------------------------------------------------------------
# Cross-field date-order audit (r9) — the referential-integrity
# audit's temporal sibling: per named invariant, how many rows violate
# the date arithmetic the schema implies but nothing enforces
# (lineitems shipped before their order existed, shipments absurdly
# later than the order, orders outside the corpus's date envelope).
# The alerting query a warehouse runs after every load; the rules mix
# must-hold invariants with an SLA-style window expected to have a
# real violation tail, so both verdict paths stay exercised.
#
# Exactness: pure integer date arithmetic + counting. Scale: ONE
# order-lineitem join (the same join every TPC-H query pays), then
# constant-size outputs; the envelope check reuses a broadcast scalar.
# ---------------------------------------------------------------------------

SHIP_SLA_DAYS = 122   # l_shipdate is within [0, 122) days of order date


@query(
    "quality_date_order_audit",
    oracle=f"""
    WITH j AS (
      SELECT o.o_orderdate AS od, l.l_shipdate AS sd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    env AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    checks AS (
      SELECT 'ship_before_order' AS chk,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN sd < od THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
      FROM j
      UNION ALL
      SELECT 'ship_sla_{SHIP_SLA_DAYS}d',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN datediff('day', od, sd)
                           >= {SHIP_SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
      UNION ALL
      SELECT 'order_in_envelope',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(SUM(CASE WHEN o_orderdate < e.lo
                              OR o_orderdate > e.hi THEN 1 ELSE 0 END)
                     AS BIGINT)
              FROM orders, env e)
    )
    SELECT chk, n_rows, n_violations,
           CAST(n_violations * 1000000 // n_rows AS BIGINT)
             AS violation_ppm
    FROM checks ORDER BY chk
    """,
)
def quality_date_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal cross-field invariants over the order->lineitem chain
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (li.select("l_orderkey", F.col("l_shipdate").alias("sd"))
         .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                             F.col("o_orderdate").alias("od")),
               "l_orderkey"))
    c1 = j.agg(
        F.lit("ship_before_order").alias("chk"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("sd") < F.col("od"), 1).otherwise(0))
        .cast("bigint").alias("n_violations"))
    c2 = j.agg(
        F.lit(f"ship_sla_{SHIP_SLA_DAYS}d").alias("chk"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.datediff("sd", "od") >= SHIP_SLA_DAYS, 1)
              .otherwise(0)).cast("bigint").alias("n_violations"))
    env = orders.agg(F.min("o_orderdate").alias("lo"),
                     F.max("o_orderdate").alias("hi"))
    c3 = (orders.crossJoin(F.broadcast(env))
          .agg(F.lit("order_in_envelope").alias("chk"),
               F.count("*").cast("bigint").alias("n_rows"),
               F.sum(F.when((F.col("o_orderdate") < F.col("lo"))
                            | (F.col("o_orderdate") > F.col("hi")), 1)
                     .otherwise(0)).cast("bigint").alias("n_violations")))
    return (c1.unionAll(c2).unionAll(c3)
            .withColumn("violation_ppm",
                        F.expr("CAST(n_violations * 1000000"
                               " div n_rows AS BIGINT)"))
            .orderBy("chk"))


# ---------------------------------------------------------------------------
# Feed freshness-lag audit (r9) — the ops check every ingest dashboard
# renders: per event feed (event_type), how stale is the newest row vs
# the global high-water mark, and did last-week volume hold up against
# the week before (a silent upstream stall shows up as ratio collapse
# long before the lag alarm fires). Exact integer epochs and counts;
# the volume ratio is one 6-dp round of identical integers.
# Scale: two-phase aggregation to the ~5-row feed grain; the global
# watermark is a broadcast scalar.
# ---------------------------------------------------------------------------

@query(
    "quality_freshness_lag_audit",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS eus FROM events
    ),
    wm AS (SELECT max(eus) AS hw FROM ev),
    feed AS (
      SELECT event_type, max(eus) AS feed_max,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM ev GROUP BY 1
    ),
    vol AS (
      SELECT e.event_type,
             CAST(SUM(CASE WHEN e.eus > w.hw - CAST(7*86400 AS BIGINT)*1000000
                      THEN 1 ELSE 0 END) AS BIGINT) AS last_wk,
             CAST(SUM(CASE WHEN e.eus <= w.hw - CAST(7*86400 AS BIGINT)*1000000
                      AND e.eus > w.hw - CAST(14*86400 AS BIGINT)*1000000
                      THEN 1 ELSE 0 END) AS BIGINT) AS prior_wk
      FROM ev e, wm w GROUP BY 1
    )
    SELECT f.event_type,
           CAST((w.hw - f.feed_max) // 60000000 AS BIGINT)
             AS lag_minutes,
           f.n_total, v.last_wk, v.prior_wk,
           round(CASE WHEN v.prior_wk > 0
                 THEN CAST(v.last_wk AS DOUBLE) / v.prior_wk END, 6)
             AS wow_volume_ratio,
           (w.hw - f.feed_max) > CAST(86400 AS BIGINT) * 1000000
             AS stale_24h
    FROM feed f JOIN vol v USING (event_type), wm w
    ORDER BY 1
    """,
)
def quality_freshness_lag_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-feed freshness lag + week-over-week volume ratio
    (see block comment)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(unix_micros(ts) AS BIGINT)").alias("eus"))
    wm = ev.agg(F.max("eus").alias("hw"))
    wk = 7 * 86400 * 1000000
    enriched = ev.crossJoin(F.broadcast(wm))
    feed = (enriched.groupBy("event_type")
            .agg(F.max("eus").alias("feed_max"),
                 F.count("*").cast("bigint").alias("n_total"),
                 F.first("hw").alias("hw"),
                 F.sum(F.when(F.col("eus") > F.col("hw") - wk, 1)
                       .otherwise(0)).cast("bigint").alias("last_wk"),
                 F.sum(F.when((F.col("eus") <= F.col("hw") - wk)
                              & (F.col("eus") > F.col("hw") - 2 * wk), 1)
                       .otherwise(0)).cast("bigint").alias("prior_wk")))
    return (feed.select(
        "event_type",
        F.expr("CAST((hw - feed_max) div 60000000 AS BIGINT)")
        .alias("lag_minutes"),
        "n_total", "last_wk", "prior_wk",
        F.round(F.when(F.col("prior_wk") > 0,
                       F.col("last_wk").cast("double")
                       / F.col("prior_wk")), 6).alias("wow_volume_ratio"),
        ((F.col("hw") - F.col("feed_max"))
         > F.lit(86400 * 1000000).cast("bigint")).alias("stale_24h"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Naive Bayes, exact-integer posterior (r9) — the depth-1 stump above
# learns one numeric split; this learns a 5-binary-feature Bernoulli
# NB classifier (Laplace-smoothed) for "is this doc from a single-
# digit source" on the even-doc_id half and scores the odd half,
# reporting the confusion matrix. The classic cheap lang/quality-
# router shape for a curation pipeline.
#
# WHY IT IS ENGINE-EXACT (no log-space): the posterior comparison
#   N_1 * prod_i L_1i / (N_1+2)^5  vs  N_0 * prod_i L_0i / (N_0+2)^5
# is cross-multiplied into two INTEGER products (L_ci = n_ci + 1 or
# N_c - n_ci + 1), compared as HUGEINT/DECIMAL(38,0) — zero floats in
# the decision path, ties broken toward class 0 in both engines. The
# products stay under ~1e34 at this corpus (5 factors <= N ~ 2.5e3,
# two outer factors) — re-scale before reusing on a corpus beyond
# ~1e6 training docs per class.
#
# Scale: ONE aggregation builds the 2x5 sufficient-statistics table
# (broadcast scalar); scoring is a map-side expression; the confusion
# matrix is a 4-row aggregate.
# ---------------------------------------------------------------------------

_NB_FEATS_DUCK = (
    "n_chars >= 300 AS f1, "
    "regexp_matches(text, '[0-9]') AS f2, "
    "len(string_split(text, ' ')) >= 50 AS f3, "
    "list_contains(string_split(text, ' '), 'the') AS f4, "
    "n_chars % 2 = 0 AS f5")


# shared CTE prefix: feature extraction, train-half sufficient stats,
# and the cross-multiplied integer posterior scores on the test half —
# used verbatim by ml_naive_bayes_binary AND ml_calibration_bins (one
# generator, two outputs; a formatting drift breaks both loudly).
_NB_CTES = f"""
    feat AS (
      SELECT doc_id, length(source) <= 4 AS y, {_NB_FEATS_DUCK}
      FROM documents
    ),
    stats AS (
      SELECT CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN y AND f1 THEN 1 ELSE 0 END) AS BIGINT) AS a1_1,
             CAST(SUM(CASE WHEN y AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS a1_2,
             CAST(SUM(CASE WHEN y AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS a1_3,
             CAST(SUM(CASE WHEN y AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS a1_4,
             CAST(SUM(CASE WHEN y AND f5 THEN 1 ELSE 0 END) AS BIGINT) AS a1_5,
             CAST(SUM(CASE WHEN NOT y AND f1 THEN 1 ELSE 0 END) AS BIGINT) AS a0_1,
             CAST(SUM(CASE WHEN NOT y AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS a0_2,
             CAST(SUM(CASE WHEN NOT y AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS a0_3,
             CAST(SUM(CASE WHEN NOT y AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS a0_4,
             CAST(SUM(CASE WHEN NOT y AND f5 THEN 1 ELSE 0 END) AS BIGINT) AS a0_5
      FROM feat WHERE doc_id % 2 = 0
    ),
    scored AS (
      SELECT f.y,
             CAST(s.n1 AS HUGEINT)
             * (CASE WHEN f.f1 THEN s.a1_1 + 1 ELSE s.n1 - s.a1_1 + 1 END)
             * (CASE WHEN f.f2 THEN s.a1_2 + 1 ELSE s.n1 - s.a1_2 + 1 END)
             * (CASE WHEN f.f3 THEN s.a1_3 + 1 ELSE s.n1 - s.a1_3 + 1 END)
             * (CASE WHEN f.f4 THEN s.a1_4 + 1 ELSE s.n1 - s.a1_4 + 1 END)
             * (CASE WHEN f.f5 THEN s.a1_5 + 1 ELSE s.n1 - s.a1_5 + 1 END)
             * CAST(s.n0 + 2 AS HUGEINT) * (s.n0 + 2) * (s.n0 + 2)
             * (s.n0 + 2) * (s.n0 + 2) AS score1,
             CAST(s.n0 AS HUGEINT)
             * (CASE WHEN f.f1 THEN s.a0_1 + 1 ELSE s.n0 - s.a0_1 + 1 END)
             * (CASE WHEN f.f2 THEN s.a0_2 + 1 ELSE s.n0 - s.a0_2 + 1 END)
             * (CASE WHEN f.f3 THEN s.a0_3 + 1 ELSE s.n0 - s.a0_3 + 1 END)
             * (CASE WHEN f.f4 THEN s.a0_4 + 1 ELSE s.n0 - s.a0_4 + 1 END)
             * (CASE WHEN f.f5 THEN s.a0_5 + 1 ELSE s.n0 - s.a0_5 + 1 END)
             * CAST(s.n1 + 2 AS HUGEINT) * (s.n1 + 2) * (s.n1 + 2)
             * (s.n1 + 2) * (s.n1 + 2) AS score0
      FROM feat f, stats s WHERE f.doc_id % 2 = 1
    )"""


@query(
    "ml_naive_bayes_binary",
    oracle=f"""
    WITH {_NB_CTES}
    SELECT y AS true_single_digit_src,
           score1 > score0 AS pred_single_digit_src,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM scored GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def _nb_query_registered(spark, sf_dir):
    return ml_naive_bayes_binary(spark, sf_dir)


def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, score1, score0) integer posteriors on the test half — the
    Spark mirror of the _NB_CTES prefix, shared by the confusion
    matrix and the calibration query."""
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("y"),
        (F.col("n_chars") >= 300).alias("f1"),
        F.col("text").rlike("[0-9]").alias("f2"),
        (F.size(F.split("text", " ")) >= 50).alias("f3"),
        F.array_contains(F.split("text", " "), "the").alias("f4"),
        (F.col("n_chars") % 2 == 0).alias("f5"))
    aggs = [F.sum(F.when(F.col("y"), 1).otherwise(0))
            .cast("bigint").alias("n1"),
            F.sum(F.when(~F.col("y"), 1).otherwise(0))
            .cast("bigint").alias("n0")]
    for i in range(1, 6):
        aggs.append(F.sum(F.when(F.col("y") & F.col(f"f{i}"), 1)
                          .otherwise(0)).cast("bigint").alias(f"a1_{i}"))
        aggs.append(F.sum(F.when(~F.col("y") & F.col(f"f{i}"), 1)
                          .otherwise(0)).cast("bigint").alias(f"a0_{i}"))
    stats = feat.filter(F.col("doc_id") % 2 == 0).agg(*aggs)

    def _score(cls: str, other: str) -> str:
        factors = [f"CAST(n{cls} AS DECIMAL(38,0))"]
        for i in range(1, 6):
            factors.append(f"(CASE WHEN f{i} THEN a{cls}_{i} + 1"
                           f" ELSE n{cls} - a{cls}_{i} + 1 END)")
        factors.append(f"CAST(n{other} + 2 AS DECIMAL(38,0))")
        factors.extend([f"(n{other} + 2)"] * 4)
        # ADVICE r9: the 11-factor DECIMAL(38,0) chain silently yields
        # NULL (allowPrecisionLoss) past 38 digits, degrading
        # predictions instead of failing. Worst case the product is
        # <= (N+2)^11, so N+2 <= 10^(38/11) ~ 2846 is the hard
        # headroom; raise a NAMED error past it (Greenwood pattern).
        return (f"CASE WHEN greatest(n1, n0) > 2844 THEN raise_error("
                f"'ml_naive_bayes_binary: class count > 2844 exceeds "
                f"the 11-factor DECIMAL(38,0) posterior headroom; "
                f"rescale (e.g. strided subsample per class) before "
                f"rerunning') ELSE {' * '.join(factors)} END")

    return (feat.filter(F.col("doc_id") % 2 == 1)
            .crossJoin(F.broadcast(stats))
            .select("y",
                    F.expr(_score("1", "0")).alias("score1"),
                    F.expr(_score("0", "1")).alias("score0")))


def ml_naive_bayes_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli NB confusion matrix via exact cross-multiplied integer
    posteriors (see block comment)."""
    scored = _nb_scored(spark, sf_dir)
    return (scored.groupBy(
        F.col("y").alias("true_single_digit_src"),
        (F.col("score1") > F.col("score0"))
        .alias("pred_single_digit_src"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("share",
                    F.round(F.col("n").cast("double")
                            / F.sum("n").over(Window.partitionBy()), 6))
        .orderBy("true_single_digit_src", "pred_single_digit_src"))


# ---------------------------------------------------------------------------
# Partial autocorrelation via Durbin-Levinson (r9) — the PACF that
# pairs with the Ljung-Box ACF above: phi_kk isolates the lag-k
# correlation AFTER removing everything explained by lags < k — the
# function an AR-order picker actually reads (ACF says "correlated";
# PACF says "how many AR terms"). Levinson 1947 / Durbin 1960
# recursion, UNROLLED to LJUNG_BOX_LAGS levels by one Python generator
# that emits the identical expression text for BOTH engines (only
# array indexing / literal syntax differ), so every add and divide
# happens in the same written order -> bit-identical IEEE doubles with
# no aggregate-order hazard (sums over the k-1 prior coefficients are
# explicit left-associated chains, never SUM()).
#
# Inputs are the same exact-BIGINT autocorrelation ratios as
# stats_ljung_box; week grain -> DAY-GRAIN CONTRACT (module docstring).
# ---------------------------------------------------------------------------

def _dl_steps(idx, arr, lags: int):
    """Yield (colname, expression) pairs unrolling Durbin-Levinson.
    `idx(name, i)` renders 1-based array indexing; `arr(items)` renders
    an array literal — the only engine-specific syntax."""
    steps = [("kk1", idx("r", 1)), ("p1", arr([idx("r", 1)]))]
    for k in range(2, lags + 1):
        pm = f"p{k - 1}"
        num_terms = " + ".join(
            f"{idx(pm, j)} * {idx('r', k - j)}" for j in range(1, k))
        den_terms = " + ".join(
            f"{idx(pm, j)} * {idx('r', j)}" for j in range(1, k))
        steps.append((f"kk{k}",
                      f"({idx('r', k)} - ({num_terms}))"
                      f" / (1.0 - ({den_terms}))"))
        items = [f"{idx(pm, j)} - kk{k} * {idx(pm, k - j)}"
                 for j in range(1, k)] + [f"kk{k}"]
        steps.append((f"p{k}", arr(items)))
    return steps


def _pacf_oracle() -> str:
    lags = LJUNG_BOX_LAGS
    idx = lambda name, i: f"{name}[{i}]"                      # noqa: E731
    arr = lambda items: "[" + ", ".join(items) + "]"          # noqa: E731
    chain = []
    prev = "base"
    for i, (col, expr) in enumerate(_dl_steps(idx, arr, lags)):
        cte = f"dl{i}"
        chain.append(f"{cte} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = cte
    finals = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag_k, round(kk{k}, 6) AS pacf"
        f" FROM {prev}" for k in range(1, lags + 1))
    chain_sql = ",\n    ".join(chain)
    return f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t
      FROM wkly
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ),
    z AS (SELECT i.t, tot.n * i.y - tot.sy AS zv FROM idx i, tot),
    lagd AS (
      SELECT t, zv,
             {", ".join(f"lag(zv, {k}) OVER (ORDER BY t) AS l{k}"
                        for k in range(1, lags + 1))}
      FROM z
    ),
    rk AS (
      SELECT k.k,
             CAST((SELECT SUM(zv * CASE k.k
               {" ".join(f"WHEN {j} THEN l{j}" for j in range(1, lags + 1))}
               END) FROM lagd) AS DOUBLE)
             / CAST((SELECT SUM(zv * zv) FROM z) AS DOUBLE) AS r
      FROM UNNEST(generate_series(1, {lags})) AS k(k)
    ),
    base AS (SELECT list(r ORDER BY k) AS r FROM rk),
    {chain_sql}
    SELECT lag_k, pacf FROM ({finals}) ORDER BY lag_k
    """


@query("stats_pacf_durbin_levinson", oracle=_pacf_oracle())
def stats_pacf_durbin_levinson(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """PACF of weekly order volume via the unrolled Durbin-Levinson
    recursion (see block comment)."""
    lags = LJUNG_BOX_LAGS
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    idx = wkly.select(
        "y", F.row_number().over(Window.orderBy("wk"))
        .cast("bigint").alias("t"))
    tot = idx.agg(F.count("*").cast("bigint").alias("n"),
                  F.sum("y").cast("bigint").alias("sy"))
    z = (idx.crossJoin(F.broadcast(tot))
         .select("t", (F.col("n") * F.col("y") - F.col("sy")).alias("zv")))
    # bounded week grid: single-task lag windows (DAY-GRAIN CONTRACT)
    w = Window.orderBy("t")
    lagd = z.select(
        "zv", *[F.lag("zv", k).over(w).alias(f"l{k}")
                for k in range(1, lags + 1)])
    den = z.agg(F.sum(F.col("zv") * F.col("zv"))
                .cast("bigint").alias("den"))
    nums = lagd.agg(*[F.sum(F.col("zv") * F.col(f"l{k}"))
                      .cast("bigint").alias(f"num{k}")
                      for k in range(1, lags + 1)])
    base = (nums.crossJoin(F.broadcast(den))
            .selectExpr(
                "array(" + ", ".join(
                    f"cast(num{k} as double) / cast(den as double)"
                    for k in range(1, lags + 1)) + ") AS r"))
    sidx = lambda name, i: f"element_at({name}, {i})"         # noqa: E731
    sarr = lambda items: "array(" + ", ".join(items) + ")"    # noqa: E731
    cur = base
    for col, expr in _dl_steps(sidx, sarr, lags):
        cur = cur.selectExpr("*", f"{expr} AS {col}")
    stack = ", ".join(f"{k}L, round(kk{k}, 6)"
                      for k in range(1, lags + 1))
    return (cur.selectExpr(
        f"stack({lags}, {stack}) AS (lag_k, pacf)")
        .orderBy("lag_k"))


# ---------------------------------------------------------------------------
# NB calibration bins (r9) — a classifier that ranks well can still
# lie about its confidence: bucket the NB posterior P(class 1 | x)
# into deciles and compare each bin's mean predicted probability with
# its actual positive rate (the reliability-diagram table; the ECE
# summand). Shares _NB_CTES / _nb_scored with the confusion-matrix
# query — one sufficient-statistics build, two evaluation readouts.
#
# Determinism: the posterior p = s1/(s1+s0) is one double division of
# the exact integer scores (identical bit pattern in both engines —
# HUGEINT->double and DECIMAL(38,0)->double both round-to-nearest);
# the bin id is floor(p*10) of that identical double; per-bin mean p
# follows the 9-dp-rounded-term decimal-sum rule.
# ---------------------------------------------------------------------------

@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH {_NB_CTES},
    prob AS (
      SELECT y,
             CAST(score1 AS DOUBLE)
               / (CAST(score1 AS DOUBLE) + CAST(score0 AS DOUBLE)) AS p
      FROM scored
    ),
    binned AS (
      SELECT LEAST(9, CAST(FLOOR(p * 10) AS BIGINT)) AS bin, y,
             CAST(round(p, 9) AS DECIMAL(12,9)) AS p9
      FROM prob
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(p9) AS DOUBLE) / COUNT(*), 6) AS mean_pred,
           round(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS actual_rate,
           CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive
    FROM binned GROUP BY 1 ORDER BY 1
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram deciles for the NB posterior
    (see block comment)."""
    scored = _nb_scored(spark, sf_dir)
    prob = scored.select(
        "y",
        (F.col("score1").cast("double")
         / (F.col("score1").cast("double")
            + F.col("score0").cast("double"))).alias("p"))
    binned = prob.select(
        F.least(F.lit(9), F.floor(F.col("p") * 10)).cast("bigint")
        .alias("bin"),
        "y", F.round("p", 9).cast("decimal(12,9)").alias("p9"))
    return (binned.groupBy("bin")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("p9").cast("double") / F.count("*"), 6)
                 .alias("mean_pred"),
                 F.round(F.sum(F.when(F.col("y"), 1).otherwise(0))
                         .cast("double") / F.count("*"), 6)
                 .alias("actual_rate"),
                 F.sum(F.when(F.col("y"), 1).otherwise(0))
                 .cast("bigint").alias("n_positive"))
            .orderBy("bin"))


# ---------------------------------------------------------------------------
# Brown-Forsythe / Levene variance-homogeneity test (r9) — the missing
# prerequisite check for the round-7 ANOVA: ANOVA's pooled-variance
# assumption dies quietly when segments have unequal spread. Brown-
# Forsythe (1974) robustifies Levene by centering on the MEDIAN:
# z = |x - med_g|, then the one-way-ANOVA F on the z values.
#
# Exactness: group medians are exact order statistics on integer
# cents; z is exact BIGINT; the F statistic is the identical double
# formula over exact sums (sum z, sum z^2 in HUGEINT/DECIMAL(38,0)).
# Scale: one shuffle to (segment) grain for the rank windows
# (partitioned across the 5 segments), then constant-size math.
# ---------------------------------------------------------------------------

@query(
    "stats_levene_test",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             o.o_orderkey AS ok
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
      SELECT seg, cents,
             row_number() OVER (PARTITION BY seg
                                ORDER BY cents, ok) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
      FROM j
    ),
    med AS (
      SELECT seg,
             MAX(CASE WHEN rk = CAST(ceil(n / 2.0) AS BIGINT)
                 THEN cents END) AS m
      FROM (SELECT seg, cents, rk, MAX(n) OVER (PARTITION BY seg) AS n
            FROM ranked)
      GROUP BY 1
    ),
    z AS (
      SELECT j.seg, ABS(j.cents - med.m) AS z
      FROM j JOIN med USING (seg)
    ),
    g AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(z) AS BIGINT) AS sz,
             SUM(CAST(z AS HUGEINT) * z) AS szz
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(sz) AS BIGINT) AS stz,
             -- ORDERED folds over the k group terms (round-10
             -- float-discipline sweep): an unordered double SUM's
             -- result depends on partial-agg merge order; folding the
             -- seg-sorted term list fixes the order in both engines.
             list_reduce(list_prepend(0.0,
               list(CAST(sz AS DOUBLE) * sz / n ORDER BY seg)),
               (acc, x) -> acc + x) AS sb,
             list_reduce(list_prepend(0.0,
               list(CAST(szz AS DOUBLE) ORDER BY seg)),
               (acc, x) -> acc + x) AS sw
      FROM g
    )
    SELECT t.k AS n_groups, t.nn AS n_total,
           round(((t.nn - t.k) / (t.k - 1.0))
                 * (t.sb - CAST(t.stz AS DOUBLE) * t.stz / t.nn)
                 / (t.sw - t.sb), 6)
             AS bf_stat
    FROM tot t
    """,
)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe F across market segments on order value
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"))
    j = (orders.join(F.broadcast(cust), "o_custkey")
         .select("seg",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("bigint").alias("cents"),
                 F.col("o_orderkey").alias("ok")))
    ws = Window.partitionBy("seg")
    ranked = j.select(
        "seg", "cents",
        F.row_number().over(ws.orderBy("cents", "ok")).alias("rk"),
        F.count("*").over(ws).cast("bigint").alias("n"))
    med = (ranked.groupBy("seg")
           .agg(F.max(F.when(F.col("rk")
                             == F.ceil(F.col("n") / 2.0).cast("bigint"),
                             F.col("cents"))).alias("m")))
    z = (j.join(F.broadcast(med), "seg")
         .select("seg", F.abs(F.col("cents") - F.col("m")).alias("z")))
    g = (z.groupBy("seg")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("z").cast("bigint").alias("sz"),
              F.sum(F.col("z").cast("decimal(38,0)") * F.col("z"))
              .alias("szz")))
    # ORDERED folds over the k group terms (round-10 float-discipline
    # sweep): sum the seg-sorted term lists so the double accumulation
    # order is fixed — identical in both engines, run to run.
    tot = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("sz").cast("bigint").alias("stz"),
        F.expr("aggregate(array_sort(collect_list(struct(seg,"
               " cast(sz as double) * sz / n as t))),"
               " cast(0 as double), (acc, s) -> acc + s.t)").alias("sb"),
        F.expr("aggregate(array_sort(collect_list(struct(seg,"
               " cast(szz as double) as t))),"
               " cast(0 as double), (acc, s) -> acc + s.t)").alias("sw"))
    between = (F.col("sb") - F.col("stz").cast("double") * F.col("stz")
               / F.col("nn"))
    within = F.col("sw") - F.col("sb")
    return tot.select(
        F.col("k").alias("n_groups"), F.col("nn").alias("n_total"),
        F.round(((F.col("nn") - F.col("k")) / (F.col("k") - 1.0))
                * between / within, 6).alias("bf_stat"))


# ---------------------------------------------------------------------------
# Per-part running inventory balance (r9) — the classic keyed
# running-total DWS view: signed quantity flow (returns negative) per
# part in ship-date order, reporting each part's final balance and its
# running peak/trough. Unlike the global running-GMV window (round 1),
# this one is PARTITIONED BY KEY — the window sort distributes across
# parts, the shape that scales (the day-grain contract explicitly does
# NOT apply: this grain grows with data, so the window must partition,
# and does).
# Exactness: integral quantities as BIGINT; pure integer running sums.
# Output bounded to the top-20 most-active parts (ties on partkey).
# ---------------------------------------------------------------------------

@query(
    "dws_running_balance_per_part",
    oracle="""
    WITH flow AS (
      SELECT l_partkey,
             CASE WHEN l_returnflag = 'R'
                  THEN -CAST(l_quantity AS BIGINT)
                  ELSE CAST(l_quantity AS BIGINT) END AS q,
             CAST(l_quantity AS BIGINT) AS aq,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem
    ),
    run AS MATERIALIZED (
      SELECT l_partkey, q, aq, l_shipdate, l_orderkey, l_linenumber,
             SUM(q) OVER (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS bal
      FROM flow
    ),
    summary AS (
      SELECT l_partkey AS part,
             CAST(SUM(aq) AS BIGINT) AS total_movement,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(MAX(bal) AS BIGINT) AS peak_balance,
             CAST(MIN(bal) AS BIGINT) AS trough_balance
      FROM run GROUP BY 1
    ),
    fin AS (
      SELECT l_partkey AS part, CAST(bal AS BIGINT) AS final_balance
      FROM (SELECT l_partkey, bal,
                   row_number() OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate DESC, l_orderkey DESC,
                              l_linenumber DESC) AS rk
            FROM run)
      WHERE rk = 1
    )
    SELECT s.part, s.n_lines, s.total_movement,
           f.final_balance, s.peak_balance, s.trough_balance
    FROM summary s JOIN fin f USING (part)
    ORDER BY s.total_movement DESC, s.part LIMIT 20
    """,
)
def dws_running_balance_per_part(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Keyed running balance with peak/trough for the 20 most-active
    parts (see block comment)."""
    li = load_table(spark, sf_dir, "lineitem")
    flow = li.select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R",
               -F.col("l_quantity").cast("bigint"))
        .otherwise(F.col("l_quantity").cast("bigint")).alias("q"),
        F.col("l_quantity").cast("bigint").alias("aq"),
        "l_shipdate", "l_orderkey", "l_linenumber")
    wp = (Window.partitionBy("l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber"))
    run = flow.withColumn(
        "bal", F.sum("q").over(wp.rowsBetween(Window.unboundedPreceding, 0)))
    summary = (run.groupBy(F.col("l_partkey").alias("part"))
               .agg(F.sum("aq").cast("bigint").alias("total_movement"),
                    F.count("*").cast("bigint").alias("n_lines"),
                    F.max("bal").cast("bigint").alias("peak_balance"),
                    F.min("bal").cast("bigint").alias("trough_balance")))
    fin = (run.withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("l_partkey")
            .orderBy(F.desc("l_shipdate"), F.desc("l_orderkey"),
                     F.desc("l_linenumber"))))
        .filter(F.col("rk") == 1)
        .select(F.col("l_partkey").alias("part"),
                F.col("bal").cast("bigint").alias("final_balance")))
    return (summary.join(fin, "part")
            .select("part", "n_lines", "total_movement", "final_balance",
                    "peak_balance", "trough_balance")
            .orderBy(F.desc("total_movement"), "part").limit(20))


# ---------------------------------------------------------------------------
# Demand max drawdown (r9) — the finance-borrowed health metric on
# weekly order volume: deepest peak-to-trough decline of the series
# ("demand fell 34% from its running high in week W"). Exact integer
# running max + difference on the calendar-bounded week grid
# (DAY-GRAIN CONTRACT, module docstring); ties broken on earliest
# trough week.
# ---------------------------------------------------------------------------

@query(
    "ads_demand_max_drawdown",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    run AS (
      SELECT wk, y,
             CAST(MAX(y) OVER (ORDER BY wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS peak
      FROM wkly
    ),
    ranked AS (
      SELECT wk, y, peak, peak - y AS dd,
             row_number() OVER (ORDER BY peak - y DESC, wk) AS rk
      FROM run
    )
    SELECT CAST(wk AS BIGINT) AS trough_week, peak AS peak_orders,
           y AS trough_orders, CAST(dd AS BIGINT) AS drawdown,
           round(CAST(dd AS DOUBLE) / peak, 6) AS drawdown_ratio
    FROM ranked WHERE rk = 1
    """,
)
def ads_demand_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deepest weekly-demand drawdown vs the running peak
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # calendar-bounded week grid: single-task windows by design
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    run = wkly.withColumn("peak", F.max("y").over(w).cast("bigint"))
    ranked = run.withColumn(
        "dd", F.col("peak") - F.col("y")).withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.desc("dd"), "wk")))
    return (ranked.filter(F.col("rk") == 1)
            .select(F.col("wk").cast("bigint").alias("trough_week"),
                    F.col("peak").alias("peak_orders"),
                    F.col("y").alias("trough_orders"),
                    F.col("dd").cast("bigint").alias("drawdown"),
                    F.round(F.col("dd").cast("double") / F.col("peak"), 6)
                    .alias("drawdown_ratio")))


# ---------------------------------------------------------------------------
# Additive seasonal decomposition, day-of-week effects (r9) — the
# classical-decomposition step the round-7 seasonality INDEX skips:
# remove the local trend first (centered 7-day moving average), THEN
# average the detrended residual by day of week. The index op answers
# "are Mondays bigger"; this answers "are Mondays bigger than their
# surrounding week", which survives long-run growth.
#
# Exactness: the detrended value is kept as the exact integer
# 7*y - sum7 (never divided per-row); the per-dow effect is one double
# division of exact integer sums, 6-dp rounded. Engines disagree on
# dayofweek numbering (DuckDB 0=Sunday, Spark 1=Sunday) — normalized
# to 0=Sunday in both. Day grain -> DAY-GRAIN CONTRACT.
# ---------------------------------------------------------------------------

@query(
    "stats_seasonal_decompose_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT d, y,
             CAST(SUM(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                               AND 3 FOLLOWING) AS BIGINT) AS s7,
             CAST(COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                                 AND 3 FOLLOWING) AS BIGINT) AS c7
      FROM daily
    ),
    detr AS (
      SELECT CAST(dayofweek(d) AS BIGINT) AS dow,
             7 * y - s7 AS e7
      FROM ma WHERE c7 = 7
    )
    SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(e7) AS DOUBLE) / (7.0 * COUNT(*)), 6)
             AS seasonal_effect
    FROM detr GROUP BY 1 ORDER BY 1
    """,
)
def stats_seasonal_decompose_dow(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Detrended day-of-week effects via centered 7-day MA
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.to_date("o_orderdate").alias("d"))
             .agg(F.count("*").cast("bigint").alias("y")))
    # bounded day grain: single-task MA windows (DAY-GRAIN CONTRACT)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d", "y",
        F.sum("y").over(w7).cast("bigint").alias("s7"),
        F.count("*").over(w7).cast("bigint").alias("c7"))
    detr = (ma.filter(F.col("c7") == 7)
            .select((F.dayofweek("d") - 1).cast("bigint").alias("dow"),
                    (7 * F.col("y") - F.col("s7")).alias("e7")))
    return (detr.groupBy("dow")
            .agg(F.count("*").cast("bigint").alias("n_days"),
                 F.round(F.sum("e7").cast("double")
                         / (7.0 * F.count("*")), 6)
                 .alias("seasonal_effect"))
            .orderBy("dow"))


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch audit (r9) — the first gate of any A/B
# readout: does the hash splitter actually deliver 50/50? A skewed
# split means the assignment is broken (biased hash, crossed
# exposure logging) and every downstream metric is garbage. Chi-square
# on the observed bucket counts with z and the standard |z| > 3 SRM
# alarm. Exact integer counts; identical double formulas.
# ---------------------------------------------------------------------------

@query(
    "ml_ab_test_srm_audit",
    oracle="""
    WITH assign AS (
      SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1))
               ::BIGINT % 2 AS bucket
      FROM customer
    ),
    cnt AS (
      SELECT CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM assign
    )
    SELECT n0, n1, n,
           round(CAST((n0 - n1) AS DOUBLE) * (n0 - n1) / n, 6) AS chi2,
           round((n0 - n / 2.0) / sqrt(n / 4.0), 6) AS z_score,
           ABS((n0 - n / 2.0) / sqrt(n / 4.0)) > 3.0 AS srm_flag
    FROM cnt
    """,
)
def ml_ab_test_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check of the md5 hash splitter
    (see block comment)."""
    cust = load_table(spark, sf_dir, "customer")
    assign = cust.select(
        (F.expr("cast(conv(substring(md5(cast(c_custkey as string)), 1, 1),"
                " 16, 10) as bigint)") % 2).alias("bucket"))
    cnt = assign.agg(
        F.sum(F.when(F.col("bucket") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0"),
        F.sum(F.when(F.col("bucket") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.count("*").cast("bigint").alias("n"))
    z = (F.col("n0") - F.col("n") / 2.0) / F.sqrt(F.col("n") / 4.0)
    return cnt.select(
        "n0", "n1", "n",
        F.round((F.col("n0") - F.col("n1")).cast("double")
                * (F.col("n0") - F.col("n1")) / F.col("n"), 6)
        .alias("chi2"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 3.0).alias("srm_flag"))


# ---------------------------------------------------------------------------
# Robust location estimates (r9) — mean vs 5% trimmed mean vs 5%
# winsorized mean vs median of order value, side by side: the spread
# between them IS the outlier-contamination diagnostic (clean data
# collapses all four together; the Grubbs op above finds WHO, this
# quantifies HOW MUCH the tails move the location estimate).
#
# Exactness: cut points are exact order statistics at integer ranks
# on integer cents; trimmed/winsorized sums are exact BIGINT; each
# mean is one 6-dp-rounded double division of exact integers.
# Scale (reworked r12): the global rank is the TWO-LEVEL grid_rank
# (operators/ranks.py) — per-$10k-band counts, an exclusive prefix
# sweep over that bounded price grid, and a partitioned within-band
# row_number.  Bit-identical ranks, no single-task sort; gated by the
# unpartitioned-Window sweep in tests/test_plan_quality.py.
# ---------------------------------------------------------------------------

@query(
    "stats_robust_means",
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             o_orderkey AS ok
      FROM orders
    ),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents, ok) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM v
    ),
    cuts AS (
      SELECT any_value(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(0.05 * mn) AS BIGINT)
                 THEN cents END) AS lo,
             MAX(CASE WHEN rk = CAST(ceil(0.95 * mn) AS BIGINT)
                 THEN cents END) AS hi,
             MAX(CASE WHEN rk = CAST(ceil(0.5 * mn) AS BIGINT)
                 THEN cents END) AS med
      FROM (SELECT cents, rk, n, MAX(n) OVER () AS mn FROM ranked)
    ),
    agg AS (
      SELECT c.n, c.med,
             CAST(SUM(r.cents) AS BIGINT) AS s_all,
             CAST(SUM(CASE WHEN r.rk > CAST(ceil(0.05 * c.n) AS BIGINT)
                      AND r.rk <= CAST(ceil(0.95 * c.n) AS BIGINT)
                      THEN r.cents ELSE 0 END) AS BIGINT) AS s_trim,
             CAST(SUM(CASE WHEN r.rk > CAST(ceil(0.05 * c.n) AS BIGINT)
                      AND r.rk <= CAST(ceil(0.95 * c.n) AS BIGINT)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
             CAST(SUM(LEAST(GREATEST(r.cents, c.lo), c.hi)) AS BIGINT)
               AS s_wins
      FROM ranked r, cuts c
      GROUP BY 1, 2
    )
    SELECT n AS n_orders,
           round(CAST(s_all AS DOUBLE) / n / 100, 6) AS mean,
           round(CAST(s_trim AS DOUBLE) / n_trim / 100, 6)
             AS trimmed_mean_5pct,
           round(CAST(s_wins AS DOUBLE) / n / 100, 6)
             AS winsorized_mean_5pct,
           round(CAST(med AS DOUBLE) / 100, 6) AS median
    FROM agg
    """,
)
def stats_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / trimmed / winsorized / median of order value from exact
    order statistics (see block comment)."""
    from gmall_211027_flink_spark.operators.ranks import grid_rank

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("ok"))
    n_df = v.agg(F.count("*").cast("bigint").alias("n"))
    ranked = (grid_rank(v, ["cents", "ok"], F.expr("cents div 1000000"))
              .crossJoin(F.broadcast(n_df))
              .select("cents", "rk", "n"))
    cuts = ranked.agg(
        F.first("n").alias("n"),
        F.max(F.when(F.col("rk") == F.ceil(0.05 * F.col("n"))
                     .cast("bigint"), F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rk") == F.ceil(0.95 * F.col("n"))
                     .cast("bigint"), F.col("cents"))).alias("hi"),
        F.max(F.when(F.col("rk") == F.ceil(0.5 * F.col("n"))
                     .cast("bigint"), F.col("cents"))).alias("med"))
    inwin = ((F.col("rk") > F.ceil(0.05 * F.col("n")).cast("bigint"))
             & (F.col("rk") <= F.ceil(0.95 * F.col("n")).cast("bigint")))
    agg = (ranked.drop("n").crossJoin(F.broadcast(cuts))
           .groupBy("n", "med")
           .agg(F.sum("cents").cast("bigint").alias("s_all"),
                F.sum(F.when(inwin, F.col("cents")).otherwise(0))
                .cast("bigint").alias("s_trim"),
                F.sum(F.when(inwin, 1).otherwise(0))
                .cast("bigint").alias("n_trim"),
                F.sum(F.least(F.greatest(F.col("cents"), F.col("lo")),
                              F.col("hi"))).cast("bigint").alias("s_wins")))
    return agg.select(
        F.col("n").alias("n_orders"),
        F.round(F.col("s_all").cast("double") / F.col("n") / 100, 6)
        .alias("mean"),
        F.round(F.col("s_trim").cast("double") / F.col("n_trim") / 100, 6)
        .alias("trimmed_mean_5pct"),
        F.round(F.col("s_wins").cast("double") / F.col("n") / 100, 6)
        .alias("winsorized_mean_5pct"),
        F.round(F.col("med").cast("double") / 100, 6).alias("median"))


# ---------------------------------------------------------------------------
# Column-uniqueness profile (r9) — the key-discovery scan that feeds
# the FD audit above: per candidate column, distinct count, distinct
# ratio, top-value frequency, and the is-key verdict. What a profiler
# prints before anyone writes a JOIN against an undocumented table.
# Exactness: two-phase count-distinct + top-1 frequency per column,
# all integers; ratios are single 6-dp rounds. Scale: one groupBy per
# profiled column — each is the word-count shape, nothing global.
# ---------------------------------------------------------------------------

_UNIQ_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
              "o_orderpriority", "o_orderdate")


@query(
    "quality_uniqueness_profile",
    oracle="""
    WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    profile AS (
      SELECT 'o_orderkey' AS col,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(MAX(cnt) AS BIGINT) AS top_freq
      FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'o_custkey', CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
             CAST(MAX(cnt) AS BIGINT)
      FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'o_orderstatus', CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
             CAST(MAX(cnt) AS BIGINT)
      FROM (SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
             CAST(MAX(cnt) AS BIGINT)
      FROM (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'o_orderdate', CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
             CAST(MAX(cnt) AS BIGINT)
      FROM (SELECT o_orderdate, COUNT(*) AS cnt FROM orders GROUP BY 1)
    )
    SELECT p.col, p.n_distinct,
           round(CAST(p.n_distinct AS DOUBLE) / t.n, 6) AS distinct_ratio,
           p.top_freq,
           round(CAST(p.top_freq AS DOUBLE) / t.n, 6) AS top_value_share,
           p.n_distinct = t.n AS is_unique_key
    FROM profile p, tot t ORDER BY p.col
    """,
)
def quality_uniqueness_profile(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Distinct-ratio / top-frequency / key-ness per orders column
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    tot = orders.agg(F.count("*").cast("bigint").alias("n"))
    parts = []
    for col in _UNIQ_COLS:
        grp = orders.groupBy(col).agg(F.count("*").alias("cnt"))
        parts.append(grp.agg(
            F.lit(col).alias("col"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.max("cnt").cast("bigint").alias("top_freq")))
    profile = parts[0]
    for p in parts[1:]:
        profile = profile.unionAll(p)
    return (profile.crossJoin(F.broadcast(tot))
            .select("col", "n_distinct",
                    F.round(F.col("n_distinct").cast("double")
                            / F.col("n"), 6).alias("distinct_ratio"),
                    "top_freq",
                    F.round(F.col("top_freq").cast("double")
                            / F.col("n"), 6).alias("top_value_share"),
                    (F.col("n_distinct") == F.col("n"))
                    .alias("is_unique_key"))
            .orderBy("col"))


# ---------------------------------------------------------------------------
# New-vs-returning revenue split (r9) — the acquisition/retention
# decomposition every monthly business review opens with: per month,
# revenue from customers' FIRST-ever order vs revenue from repeat
# orders, and the repeat share. Pairs with the cohort-LTV curve (r8):
# that one follows a cohort forward, this one cuts each month across.
# Exactness: the first-order cut is the (o_orderdate, o_orderkey)
# lexicographic minimum per customer (exact integer tie-break);
# revenue sums are exact DECIMAL(18,2). Scale: one customer-grain
# window (distributed by key) + a month-grain rollup.
# ---------------------------------------------------------------------------

@query(
    "ads_new_vs_returning_revenue",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS DATE)) AS fd,
             min(o_orderkey) FILTER (
               WHERE CAST(o_orderdate AS DATE) = fd0) AS fk
      FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                   min(CAST(o_orderdate AS DATE))
                     OVER (PARTITION BY o_custkey) AS fd0
            FROM orders)
      GROUP BY 1
    ),
    tagged AS (
      SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS month,
             o.o_orderkey = f.fk AS is_first,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT month,
           CAST(SUM(CASE WHEN is_first THEN rev ELSE 0 END) AS DOUBLE)
             AS new_revenue,
           CAST(SUM(CASE WHEN NOT is_first THEN rev ELSE 0 END) AS DOUBLE)
             AS returning_revenue,
           CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new_orders,
           CAST(SUM(CASE WHEN NOT is_first THEN 1 ELSE 0 END) AS BIGINT)
             AS n_return_orders,
           round(CAST(SUM(CASE WHEN NOT is_first THEN rev ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(rev) AS DOUBLE), 6)
             AS repeat_share
    FROM tagged GROUP BY 1 ORDER BY 1
    """,
)
def ads_new_vs_returning_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Monthly revenue split by first-ever vs repeat orders
    (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wf = Window.partitionBy("o_custkey")
    with_first = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        F.min(F.to_date("o_orderdate")).over(wf).alias("fd0"))
    firsts = (with_first
              .groupBy("o_custkey")
              .agg(F.min(F.when(F.to_date("o_orderdate") == F.col("fd0"),
                                F.col("o_orderkey"))).alias("fk")))
    tagged = (orders.join(firsts, "o_custkey")
              .select(F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                      (F.col("o_orderkey") == F.col("fk")).alias("is_first"),
                      F.col("o_totalprice").cast("decimal(18,2)")
                      .alias("rev")))
    return (tagged.groupBy("month")
            .agg(F.sum(F.when(F.col("is_first"), F.col("rev"))
                       .otherwise(F.lit(0).cast("decimal(18,2)")))
                 .cast("double").alias("new_revenue"),
                 F.sum(F.when(~F.col("is_first"), F.col("rev"))
                       .otherwise(F.lit(0).cast("decimal(18,2)")))
                 .cast("double").alias("returning_revenue"),
                 F.sum(F.when(F.col("is_first"), 1).otherwise(0))
                 .cast("bigint").alias("n_new_orders"),
                 F.sum(F.when(~F.col("is_first"), 1).otherwise(0))
                 .cast("bigint").alias("n_return_orders"),
                 F.round(F.sum(F.when(~F.col("is_first"), F.col("rev"))
                               .otherwise(F.lit(0).cast("decimal(18,2)")))
                         .cast("double")
                         / F.sum("rev").cast("double"), 6)
                 .alias("repeat_share"))
            .orderBy("month"))


# ---------------------------------------------------------------------------
# CUSUM change-point detection (r10) — Page 1954: the classic "did the
# weekly order level shift, and when" scan the EWMA/Holt monitors
# (rounds 7/9) cannot answer (they track level, not WHERE it broke).
# CUSUM_k = sum_{i<=k} (y_i - mean); the change point is the argmax of
# |CUSUM|. EXACTNESS: with mean = Sy/n rational, n*CUSUM_k =
# n*prefix_k - k_pos*Sy is an exact BIGINT — the argmax ranks on exact
# integers with a week tie-break. Prefix sums ride an ordered window
# over the bounded weekly series (DAY-GRAIN CONTRACT, module
# docstring).
# ---------------------------------------------------------------------------

@query(
    "stats_cusum_weekly_exact",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT wk, y,
             CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t,
             CAST(SUM(y) OVER (ORDER BY wk
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS pre
      FROM wkly
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM wkly
    ),
    cus AS (
      SELECT i.wk, i.t, tot.n, tot.sy,
             tot.n * i.pre - i.t * tot.sy AS cus_n
      FROM idx i, tot
    ),
    best AS (
      SELECT wk, t, n, sy, cus_n,
             row_number() OVER (ORDER BY ABS(cus_n) DESC, wk) AS rk
      FROM cus
    )
    SELECT n AS n_weeks, wk AS change_wk, t AS change_t,
           cus_n AS cusum_scaled,
           CAST(CAST(floor(CAST(ABS(cus_n) AS DOUBLE) / n * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS cusum_abs
    FROM best WHERE rk = 1
    """,
)
def stats_cusum_weekly_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer CUSUM argmax over weekly order volume (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # bounded weekly series: DAY-GRAIN CONTRACT (module docstring)
    w = Window.orderBy("wk")
    idx = wkly.select(
        "wk", "y",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint").alias("pre"))
    tot = wkly.agg(F.count("*").cast("bigint").alias("n"),
                   F.sum("y").cast("bigint").alias("sy"))
    cus = (idx.crossJoin(F.broadcast(tot))
           .withColumn("cus_n", F.col("n") * F.col("pre")
                       - F.col("t") * F.col("sy")))
    best = cus.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.abs("cus_n").desc(),
                                                 "wk")))
    return (best.filter(F.col("rk") == 1)
            .select(F.col("n").alias("n_weeks"),
                    F.col("wk").alias("change_wk"),
                    F.col("t").alias("change_t"),
                    F.col("cus_n").alias("cusum_scaled"),
                    (F.floor(F.abs("cus_n").cast("double") / F.col("n")
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("cusum_abs")))


# ---------------------------------------------------------------------------
# Theil-Sen slope estimator (r10) — Sen 1968: the median of all
# pairwise slopes of the weekly order series; the robust trend the OLS
# trend line (round 5) is sensitive to outliers about. EXACTNESS: each
# pairwise slope dy/dt is half-up-quantized to the exact integer
# slope_q = round(dy*1e9/dt) via integer division with a +1e13*dt
# positivizer (trunc-div == floor-div on positive numerators — both
# engines truncate); the median is the LOWER order statistic at rank
# (n_pairs+1)//2 on the (slope_q, t_i, t_j) total order — no float
# enters until the final /1e9 readout. The ~80k pair set is quadratic
# in the bounded weekly grain (DAY-GRAIN CONTRACT), not in the corpus.
# ---------------------------------------------------------------------------

THEIL_OFF = 10_000_000_000_000     # positivizer: > max |slope_q|


@query(
    "stats_theil_sen_exact",
    oracle=f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.wk AS t1, b.wk AS t2,
             (2 * ((b.y - a.y) * 1000000000 + {THEIL_OFF} * (b.wk - a.wk))
              + (b.wk - a.wk)) // (2 * (b.wk - a.wk)) - {THEIL_OFF}
               AS slope_q
      FROM wkly a JOIN wkly b ON b.wk > a.wk
    ),
    ranked AS (
      SELECT slope_q,
             row_number() OVER (ORDER BY slope_q, t1, t2) AS rk,
             COUNT(*) OVER () AS n_pairs
      FROM pairs
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_q AS slope_q_1e9,
           CAST(slope_q AS DOUBLE) / 1000000000.0 AS slope_per_week
    FROM ranked WHERE rk = (n_pairs + 1) // 2
    """,
)
def stats_theil_sen_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median pairwise slope of weekly order volume, exact-integer
    quantized (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    a = wkly.select(F.col("wk").alias("t1"), F.col("y").alias("y1"))
    b = wkly.select(F.col("wk").alias("t2"), F.col("y").alias("y2"))
    pairs = (a.join(b, F.col("t2") > F.col("t1"))
             .withColumn("slope_q", F.expr(
                 f"(2 * ((y2 - y1) * 1000000000"
                 f" + {THEIL_OFF} * (t2 - t1)) + (t2 - t1))"
                 f" div (2 * (t2 - t1)) - {THEIL_OFF}")))
    # quadratic in the bounded weekly grain only: DAY-GRAIN CONTRACT
    ranked = pairs.select(
        "slope_q",
        F.row_number().over(Window.orderBy("slope_q", "t1", "t2"))
        .alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n_pairs"))
    return (ranked.filter(F.col("rk") == F.expr("(n_pairs + 1) div 2"))
            .select(F.col("n_pairs").cast("bigint").alias("n_pairs"),
                    F.col("slope_q").alias("slope_q_1e9"),
                    (F.col("slope_q").cast("double")
                     / F.lit(1000000000.0)).alias("slope_per_week")))


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (r10) — Mann 1945 / Kendall 1975: the
# non-parametric "is there a monotone trend" companion to Theil-Sen
# (same pair set, sign instead of slope). EXACTNESS: S = sum of pair
# signs is an exact BIGINT; the tie-corrected variance is kept at x18
# scale as an exact integer (n(n-1)(2n+5) - sum t(t-1)(2t+5)); the
# z-score is a deterministic double from those integers, floor(x*1e6
# + 0.5)-quantized at the boundary.
# ---------------------------------------------------------------------------

@query(
    "stats_mann_kendall",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM wkly a JOIN wkly b ON b.wk > a.wk
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tg FROM wkly GROUP BY y)
      WHERE tg > 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wkly)
    SELECT nn.n AS n_weeks, s.s_stat,
           nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
             AS var_x18,
           CAST(CAST(floor(
             CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                  ELSE 0 END
             / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                    / 18.0) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS z_score
    FROM s, ties, nn
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S + tie-corrected z over weekly order volume (see
    block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    a = wkly.select(F.col("wk").alias("t1"), F.col("y").alias("y1"))
    b = wkly.select(F.col("wk").alias("t2"), F.col("y").alias("y2"))
    s = (a.join(b, F.col("t2") > F.col("t1"))
         .agg(F.sum(F.when(F.col("y2") > F.col("y1"), 1)
                    .when(F.col("y2") < F.col("y1"), -1)
                    .otherwise(0)).cast("bigint").alias("s_stat")))
    ties = (wkly.groupBy("y").agg(F.count("*").cast("bigint").alias("tg"))
            .filter(F.col("tg") > 1)
            .agg(F.coalesce(
                F.sum(F.col("tg") * (F.col("tg") - 1)
                      * (2 * F.col("tg") + 5)), F.lit(0))
                .cast("bigint").alias("tie_term")))
    nn = wkly.agg(F.count("*").cast("bigint").alias("n"))
    var_x18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
               - F.col("tie_term"))
    num = (F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
           .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
           .otherwise(0))
    return (s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(nn))
            .select(F.col("n").alias("n_weeks"), "s_stat",
                    var_x18.alias("var_x18"),
                    (F.floor(num / F.sqrt(var_x18 / F.lit(18.0))
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("z_score")))


# ---------------------------------------------------------------------------
# Spearman rank correlation (r10) — monotone association between daily
# order COUNT and daily revenue on the day grain, the rank-based
# companion to Pearson (stats_price_qty_corr) and Kendall tau (r9).
# EXACTNESS: tie-averaged ranks are kept as exact integers at 2x scale
# (2*avgrank = 2*min_rank + tie_ct - 1); Spearman is then the Pearson
# identity over those integer 2-ranks with exact BIGINT/DECIMAL
# moments, floor(x*1e6 + 0.5)-quantized. The rank windows are over the
# bounded daily series (DAY-GRAIN CONTRACT).
# ---------------------------------------------------------------------------

@query(
    "stats_spearman_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT d,
             2 * rank() OVER (ORDER BY cnt)
               + COUNT(*) OVER (PARTITION BY cnt) - 1 AS rx,
             2 * rank() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS ry
      FROM daily
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy
      FROM rk
    )
    SELECT n AS n_days,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS spearman_rho
    FROM m
    """,
)
def stats_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between daily order count and daily revenue via
    exact integer 2x tie-averaged ranks (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.to_date("o_orderdate").alias("d"))
             .agg(F.count("*").cast("bigint").alias("cnt"),
                  F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                        .cast("bigint")).cast("bigint").alias("cents")))
    # bounded daily series: DAY-GRAIN CONTRACT (module docstring)
    rk = daily.select(
        "d",
        (2 * F.rank().over(Window.orderBy("cnt"))
         + F.count("*").over(Window.partitionBy("cnt")) - 1)
        .cast("bigint").alias("rx"),
        (2 * F.rank().over(Window.orderBy("cents"))
         + F.count("*").over(Window.partitionBy("cents")) - 1)
        .cast("bigint").alias("ry"))
    m = rk.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast("double")
    vx = (d38("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast("double")
    vy = (d38("n") * F.col("syy") - d38("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        (F.floor(num / F.sqrt(vx * vy) * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Cross-correlation function (r10) — lead/lag association between two
# daily event series (clicks vs purchases): CCF at lags -7..7 answers
# "do clicks lead purchases, and by how many days" — the diagnostic
# behind attribution windows (rounds 5/7). EXACTNESS: the Ljung-Box
# discipline — per-day counts joined on shifted dates so every
# cross-product n^2*xy - ... is computed from exact integers; r(lag) =
# (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) over the lag's
# aligned overlap, floor(x*1e6 + 0.5)-quantized. The date-shift join
# runs on the bounded daily grain (DAY-GRAIN CONTRACT).
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 7


@query(
    "stats_cross_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags AS (
      SELECT t.lag FROM UNNEST(generate_series(-{CCF_MAX_LAG},
                                               {CCF_MAX_LAG})) AS t(lag)
    ),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + to_days(CAST(l.lag AS INT))
    ),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag_days, n AS n_days,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS ccf
    FROM m ORDER BY 1
    """,
)
def stats_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCF(-{CCF_MAX_LAG}..{CCF_MAX_LAG}) between daily clicks and
    purchases via exact integer moments (see block comment)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("bigint").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("bigint").alias("y")))
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag"))
    a = daily.select("d", "x")
    b = daily.select(F.col("d").alias("bd"), "y")
    pairs = (lags.crossJoin(a)      # bounded spine x day grain
             .join(b, F.expr("bd = date_add(d, lag)")))
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d38("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast("double")
    vx = (d38("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast("double")
    vy = (d38("n") * F.col("syy") - d38("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("lag").cast("bigint").alias("lag_days"),
        F.col("n").alias("n_days"),
        (F.floor(num / F.sqrt(vx * vy) * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0)).alias("ccf")
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# Friedman test (r10) — Friedman 1937: the non-parametric repeated-
# measures ANOVA over (week-block x day-of-week) daily order counts:
# "does weekday rank-order repeat week after week", the blocked
# companion to the seasonal DOW decomposition (r9). Only COMPLETE
# 7-day blocks enter. EXACTNESS: within-block ranks use the exact 2x
# tie-averaged integer trick (2*min_rank + tie_ct - 1, windows
# partitioned per block); with k = 7, n blocks, and column rank sums
# R2_j (at 2x scale), the statistic is the exact rational
#   chi2 = 3 * sum_j R2_j^2 / (n*k*(k+1)) - 3*n*(k+1),
# emitted as a deterministic double, floor(x*1e6 + 0.5)-quantized.
# ---------------------------------------------------------------------------

@query(
    "stats_friedman_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2, 3
    ),
    blocks AS (
      SELECT wk FROM daily GROUP BY wk HAVING COUNT(*) = 7
    ),
    ranked AS (
      SELECT d.wk, d.dow,
             2 * rank() OVER (PARTITION BY d.wk ORDER BY d.y)
               + COUNT(*) OVER (PARTITION BY d.wk, d.y) - 1 AS r2
      FROM daily d JOIN blocks USING (wk)
    ),
    cols AS (
      SELECT dow, CAST(SUM(r2) AS BIGINT) AS r2j FROM ranked GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM blocks)
    SELECT nn.n AS n_blocks,
           CAST(SUM(CAST(r2j AS HUGEINT) * r2j) AS BIGINT) AS sum_r2sq,
           CAST(CAST(floor(
             (3.0 * SUM(CAST(r2j AS HUGEINT) * r2j)
              / (nn.n * 7 * 8) - 3.0 * nn.n * 8)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS friedman_chi2
    FROM cols, nn GROUP BY 1
    """,
)
def stats_friedman_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi2 over complete (week x DOW) blocks of daily order
    counts (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.to_date("o_orderdate").alias("d"),
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"),
        F.dayofweek(F.to_date("o_orderdate")).alias("dow"))
        .agg(F.count("*").cast("bigint").alias("y")))
    blocks = daily.groupBy("wk").agg(F.count("*").alias("ct")) \
        .filter(F.col("ct") == 7).select("wk")
    wb = Window.partitionBy("wk")
    ranked = (daily.join(F.broadcast(blocks), "wk")
              .select("wk", "dow",
                      (2 * F.rank().over(wb.orderBy("y"))
                       + F.count("*").over(
                           Window.partitionBy("wk", "y")) - 1)
                      .cast("bigint").alias("r2")))
    cols = ranked.groupBy("dow").agg(
        F.sum("r2").cast("bigint").alias("r2j"))
    nn = blocks.agg(F.count("*").cast("bigint").alias("n"))
    return (cols.crossJoin(F.broadcast(nn))
            .groupBy(F.col("n").alias("n_blocks"))
            .agg(F.sum(F.col("r2j").cast("decimal(38,0)") * F.col("r2j"))
                 .cast("bigint").alias("sum_r2sq"))
            .select("n_blocks", "sum_r2sq",
                    (F.floor(
                        (F.lit(3.0) * F.col("sum_r2sq")
                         / (F.col("n_blocks") * 7 * 8)
                         - F.lit(3.0) * F.col("n_blocks") * 8)
                        * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("friedman_chi2")))


# ---------------------------------------------------------------------------
# Heaps' law fit (r10) — vocabulary growth V(N) ~ K * N^beta over the
# corpus in doc_id order: the tokenizer-budget planning curve (how
# fast does vocab grow as the corpus doubles). Each word contributes
# at its FIRST document, so V at every checkpoint is one exact
# min-per-word aggregation, and cumulative tokens are exact sums over
# doc_id prefixes — 10 checkpoints, no running window. beta from the
# log-log OLS over the 10 exact points (quantized-log discipline).
# ---------------------------------------------------------------------------

HEAPS_POINTS = 10


@query(
    "text_heaps_law",
    oracle=f"""
    WITH bounds AS (
      SELECT MAX(doc_id) + 1 AS nd FROM documents
    ),
    cuts AS (
      SELECT t.c, (t.c * bounds.nd) // {HEAPS_POINTS} AS cut_id
      FROM bounds, UNNEST(generate_series(1, {HEAPS_POINTS})) AS t(c)
    ),
    dtok AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    firsts AS (
      SELECT t.word, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
      GROUP BY 1
    ),
    pts AS (
      SELECT c.c,
             (SELECT CAST(SUM(tok) AS BIGINT) FROM dtok
              WHERE doc_id < c.cut_id) AS n_tok,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
              WHERE first_doc < c.cut_id) AS v
      FROM cuts c
    ),
    q AS (
      SELECT CAST(floor(ln(n_tok) * 1000000000 + 0.5) AS BIGINT) AS xq,
             CAST(floor(ln(v) * 1000000000 + 0.5) AS BIGINT) AS yq
      FROM pts WHERE n_tok > 0 AND v > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
             SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
             SUM(CAST(xq AS HUGEINT) * xq) AS sxx
      FROM q
    )
    SELECT n AS n_points,
           CAST(CAST(floor(
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS heaps_beta
    FROM m
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps exponent from {HEAPS_POINTS} exact vocabulary-growth
    checkpoints (see block comment)."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg((F.max("doc_id") + 1).alias("nd"))
    cuts = (spark.range(1, HEAPS_POINTS + 1)
            .select(F.col("id").alias("c"))
            .crossJoin(F.broadcast(bounds))
            .select("c", F.expr(f"(c * nd) div {HEAPS_POINTS}")
                    .alias("cut_id")))
    dtok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("tok"))
    firsts = (docs.select("doc_id",
                          F.explode(F.split("text", " ")).alias("word"))
              .groupBy("word")
              .agg(F.min("doc_id").cast("bigint").alias("first_doc")))
    ntok = (cuts.join(dtok, F.col("doc_id") < F.col("cut_id"))
            .groupBy("c").agg(F.sum("tok").cast("bigint").alias("n_tok")))
    vocab = (cuts.join(firsts, F.col("first_doc") < F.col("cut_id"))
             .groupBy(F.col("c").alias("vc"))
             .agg(F.count("*").cast("bigint").alias("v")))
    pts = ntok.join(vocab, F.col("c") == F.col("vc"))
    q = (pts.filter((F.col("n_tok") > 0) & (F.col("v") > 0))
         .select(
             F.floor(F.log(F.col("n_tok").cast("double"))
                     * F.lit(1000000000.0) + F.lit(0.5))
             .cast("bigint").alias("xq"),
             F.floor(F.log(F.col("v").cast("double"))
                     * F.lit(1000000000.0) + F.lit(0.5))
             .cast("bigint").alias("yq")))
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
    return m.select(
        F.col("n").alias("n_points"),
        (F.floor(num / den * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("heaps_beta"))


# ---------------------------------------------------------------------------
# Longest activity streak per user (r10) — the day-grain
# gaps-and-islands classic (consecutive active DAYS, where
# sessionization (r3) works at the second grain): per user, distinct
# active dates, island id = date - row_number (constant within a
# consecutive run), longest run per user, top-20 overall. Pure integer
# date arithmetic; all windows PARTITION BY user so the sort
# distributes; the top-20 cut is a total order (len DESC, user,
# start). This is the engagement metric every retention dashboard
# ships next to DAU/MAU stickiness (r8).
# ---------------------------------------------------------------------------

STREAK_TOP_K = 20


@query(
    "dws_active_user_streaks",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - to_days(CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INT)) AS anchor
      FROM days
    ),
    runs AS (
      SELECT user_id, MIN(d) AS streak_start,
             CAST(COUNT(*) AS BIGINT) AS streak_days
      FROM isl GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, streak_start, streak_days,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC,
                                         streak_start) AS rk
      FROM runs
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(streak_start AS VARCHAR) AS streak_start,
           streak_days
    FROM best WHERE rk = 1
    ORDER BY streak_days DESC, user_id LIMIT {STREAK_TOP_K}
    """,
)
def dws_active_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{STREAK_TOP_K} longest consecutive-active-day streaks
    (see block comment)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    isl = days.withColumn(
        "anchor", F.expr("date_sub(d, row_number() over ("
                         "partition by user_id order by d))"))
    runs = (isl.groupBy("user_id", "anchor")
            .agg(F.min("d").alias("streak_start"),
                 F.count("*").cast("bigint").alias("streak_days")))
    best = runs.withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.desc("streak_days"), "streak_start")))
    return (best.filter(F.col("rk") == 1)
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    F.col("streak_start").cast("string")
                    .alias("streak_start"),
                    "streak_days")
            .orderBy(F.desc("streak_days"), "user_id")
            .limit(STREAK_TOP_K))


# ---------------------------------------------------------------------------
# Kruskal-Wallis test (r10) — the k-sample rank ANOVA completing the
# non-parametric family (Mann-Kendall trend, Spearman association,
# Friedman blocks): do the five market segments draw their DAILY
# revenue from the same distribution? Samples are (segment, day)
# revenue cells on the bounded day grain (DAY-GRAIN CONTRACT); global
# ranks use the exact 2x tie-averaged integer trick; H and its tie
# correction are deterministic doubles from exact BIGINT/HUGEINT sums
# (R2_g^2 / n_g per group, T = sum(t^3 - t)), floor(x*1e6 + 0.5)-
# quantized.
# ---------------------------------------------------------------------------

@query(
    "stats_kruskal_wallis",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT seg,
             2 * rank() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS r2
      FROM cells
    ),
    grp AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(r2) AS BIGINT) AS r2g
      FROM rk GROUP BY 1
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0)
                  AS BIGINT) AS tcorr
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cells
            GROUP BY cents)
      WHERE t > 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cells)
    SELECT nn.n AS n_cells,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           -- per-group R2g^2/(4*ng) half-up-quantized to 1e-6 BEFORE
           -- the (order-free, exact integer) group sum — the round-10
           -- float-discipline rule
           CAST(CAST(floor(
             ((12.0 * (CAST(SUM((2 * CAST(r2g AS HUGEINT) * r2g * 1000000
                                 + 4 * ng) // (8 * ng)) AS DOUBLE)
                       / 1000000.0)
               / (CAST(nn.n AS DOUBLE) * (nn.n + 1)) - 3.0 * (nn.n + 1))
              / (1.0 - CAST(any_value(ties.tcorr) AS DOUBLE)
                       / (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n)))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS kw_h
    FROM grp, ties, nn GROUP BY 1
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across market segments on daily
    revenue cells (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"))
    cells = (orders.join(F.broadcast(cust), "o_custkey")
             .groupBy("seg", F.to_date("o_orderdate").alias("d"))
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("bigint"))
                  .cast("bigint").alias("cents")))
    # bounded (segment x day) grain: DAY-GRAIN CONTRACT
    rk = cells.select(
        "seg",
        (2 * F.rank().over(Window.orderBy("cents"))
         + F.count("*").over(Window.partitionBy("cents")) - 1)
        .cast("bigint").alias("r2"))
    grp = rk.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("r2").cast("bigint").alias("r2g"))
    ties = (cells.groupBy("cents").agg(F.count("*").cast("bigint")
                                       .alias("t"))
            .filter(F.col("t") > 1)
            .agg(F.coalesce(
                F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")
                      * F.col("t") - F.col("t")), F.lit(0))
                .cast("bigint").alias("tcorr")))
    nn = cells.agg(F.count("*").cast("bigint").alias("n"))
    # per-group quantized term (exact integer), then order-free sum
    h_raw = (F.lit(12.0)
             * (F.sum(F.expr(
                 "(2 * cast(r2g as decimal(38,0)) * r2g * 1000000"
                 " + 4 * ng) div (8 * ng)")).cast("double")
                / F.lit(1000000.0))
             / (F.col("n").cast("double") * (F.col("n") + 1))
             - F.lit(3.0) * (F.col("n") + 1))
    corr = (F.lit(1.0) - F.first("tcorr").cast("double")
            / (F.col("n").cast("double") * F.col("n") * F.col("n")
               - F.col("n")))
    return (grp.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(nn))
            .groupBy(F.col("n").alias("n_cells"))
            .agg(F.count("*").cast("bigint").alias("n_groups"),
                 (F.floor(h_raw / corr * F.lit(1000000.0) + F.lit(0.5))
                  .cast("bigint").cast("double") / F.lit(1000000.0))
                 .alias("kw_h")))


# ---------------------------------------------------------------------------
# Mann-Whitney U test (r10) — the 2-sample member of the rank family
# (Kruskal-Wallis is its k-sample generalization): weekend vs weekday
# daily revenue on the day grain. EXACTNESS: 2x tie-averaged integer
# ranks; U at 2x scale is the exact integer U2 = R2_wknd - n1*(n1+1);
# the tie-corrected normal approximation is a deterministic double
# from exact BIGINT/HUGEINT sums, floor(x*1e6 + 0.5)-quantized.
# ---------------------------------------------------------------------------

@query(
    "stats_mann_whitney_u",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS wknd,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    rk AS (
      SELECT wknd,
             2 * rank() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS r2
      FROM daily
    ),
    g AS (
      SELECT CAST(SUM(CASE WHEN wknd = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN wknd = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN wknd = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r2_1
      FROM rk
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0)
                  AS BIGINT) AS tcorr
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily
            GROUP BY cents)
      WHERE t > 1
    )
    SELECT g.n1 AS n_weekend, g.n2 AS n_weekday,
           (g.r2_1 - g.n1 * (g.n1 + 1)) AS u_x2,
           CAST(CAST(floor(
             (CAST(g.r2_1 - g.n1 * (g.n1 + 1) AS DOUBLE) / 2.0
              - CAST(g.n1 AS DOUBLE) * g.n2 / 2.0)
             / sqrt(CAST(g.n1 AS DOUBLE) * g.n2 / 12.0
                    * ((g.n1 + g.n2 + 1)
                       - CAST(ties.tcorr AS DOUBLE)
                         / (CAST(g.n1 + g.n2 AS DOUBLE)
                            * (g.n1 + g.n2 - 1))))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM g, ties
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday Mann-Whitney U on daily revenue via exact 2x
    tie-averaged ranks (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.to_date("o_orderdate").alias("d"),
        # DuckDB dayofweek: 0=Sunday; Spark: 1=Sunday (subtract 1)
        F.when((F.dayofweek(F.to_date("o_orderdate")) - 1).isin(0, 6), 1)
        .otherwise(0).alias("wknd"))
        .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                   .cast("bigint")).cast("bigint").alias("cents")))
    # bounded daily series: DAY-GRAIN CONTRACT (module docstring)
    rk = daily.select(
        "wknd",
        (2 * F.rank().over(Window.orderBy("cents"))
         + F.count("*").over(Window.partitionBy("cents")) - 1)
        .cast("bigint").alias("r2"))
    g = rk.agg(
        F.sum(F.when(F.col("wknd") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("wknd") == 0, 1).otherwise(0))
        .cast("bigint").alias("n2"),
        F.sum(F.when(F.col("wknd") == 1, F.col("r2")).otherwise(0))
        .cast("bigint").alias("r2_1"))
    ties = (daily.groupBy("cents").agg(F.count("*").cast("bigint")
                                       .alias("t"))
            .filter(F.col("t") > 1)
            .agg(F.coalesce(
                F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")
                      * F.col("t") - F.col("t")), F.lit(0))
                .cast("bigint").alias("tcorr")))
    u_x2 = F.col("r2_1") - F.col("n1") * (F.col("n1") + 1)
    n = F.col("n1") + F.col("n2")
    z = ((u_x2.cast("double") / F.lit(2.0)
          - F.col("n1").cast("double") * F.col("n2") / F.lit(2.0))
         / F.sqrt(F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)
                  * ((n + 1) - F.col("tcorr").cast("double")
                     / (n.cast("double") * (n - 1)))))
    return (g.crossJoin(F.broadcast(ties))
            .select(F.col("n1").alias("n_weekend"),
                    F.col("n2").alias("n_weekday"),
                    u_x2.alias("u_x2"),
                    (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("z_score")))


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test (r10) — the paired member completing the
# classical non-parametric family (Mann-Whitney 2-sample, Kruskal-
# Wallis k-sample, Friedman blocked): is the week-over-week change in
# order volume centered at zero? Pairs are consecutive weeks; zero
# differences drop (Wilcoxon convention); |d| ranks use the exact 2x
# tie-averaged integer trick; W+ at 2x scale is an exact BIGINT; the
# tie-corrected normal approximation is a deterministic double from
# exact sums — z = (W2/2 - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 - T/48)
# with T = sum(t^3 - t), floor(x*1e6 + 0.5)-quantized.
# ---------------------------------------------------------------------------

@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT wk, y - lag(y) OVER (ORDER BY wk) AS dv
      FROM wkly
    ),
    nz AS (
      SELECT wk, dv, ABS(dv) AS ad FROM d
      WHERE dv IS NOT NULL AND dv <> 0
    ),
    rk AS (
      SELECT dv,
             2 * rank() OVER (ORDER BY ad)
               + COUNT(*) OVER (PARTITION BY ad) - 1 AS r2
      FROM nz
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN dv > 0 THEN r2 ELSE 0 END) AS BIGINT)
               AS w2_plus
      FROM rk
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0)
                  AS BIGINT) AS tcorr
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM nz GROUP BY ad)
      WHERE t > 1
    )
    SELECT a.n AS n_pairs, a.w2_plus,
           CAST(CAST(floor(
             (CAST(a.w2_plus AS DOUBLE) / 2.0
              - CAST(a.n AS DOUBLE) * (a.n + 1) / 4.0)
             / sqrt(CAST(a.n AS DOUBLE) * (a.n + 1) * (2 * a.n + 1) / 24.0
                    - CAST(t.tcorr AS DOUBLE) / 48.0)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS z_score
    FROM agg a, ties t
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank on week-over-week order-volume changes via
    exact 2x tie-averaged ranks (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # bounded weekly series: DAY-GRAIN CONTRACT (module docstring)
    d = wkly.withColumn(
        "dv", F.col("y") - F.lag("y").over(Window.orderBy("wk")))
    nz = (d.filter(F.col("dv").isNotNull() & (F.col("dv") != 0))
          .select("dv", F.abs("dv").alias("ad")))
    rk = nz.select(
        "dv",
        (2 * F.rank().over(Window.orderBy("ad"))
         + F.count("*").over(Window.partitionBy("ad")) - 1)
        .cast("bigint").alias("r2"))
    agg = rk.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("dv") > 0, F.col("r2")).otherwise(0))
        .cast("bigint").alias("w2_plus"))
    ties = (nz.groupBy("ad").agg(F.count("*").cast("bigint").alias("t"))
            .filter(F.col("t") > 1)
            .agg(F.coalesce(
                F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")
                      * F.col("t") - F.col("t")), F.lit(0))
                .cast("bigint").alias("tcorr")))
    z = ((F.col("w2_plus").cast("double") / F.lit(2.0)
          - F.col("n").cast("double") * (F.col("n") + 1) / F.lit(4.0))
         / F.sqrt(F.col("n").cast("double") * (F.col("n") + 1)
                  * (2 * F.col("n") + 1) / F.lit(24.0)
                  - F.col("tcorr").cast("double") / F.lit(48.0)))
    return (agg.crossJoin(F.broadcast(ties))
            .select(F.col("n").alias("n_pairs"), "w2_plus",
                    (F.floor(z * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("z_score")))


# ---------------------------------------------------------------------------
# Jarque-Bera normality test (r11) — Jarque & Bera 1980: are the daily
# order counts consistent with a normal distribution?  JB =
# n*(b1^2/6 + (b2-3)^2/24) from sample skewness b1 and kurtosis b2 —
# the standard residual-normality gate a forecasting pipeline runs
# before trusting Gaussian prediction intervals.  Completes the moments
# corner of the stats family (location: t/rank tests; spread: Levene/
# Bartlett; shape: this).
#
# EXACTNESS: Z_d = n*y_d - S is exact BIGINT (the classic demeaning
# trick at scale n, so no rational means); m2 = sum Z^2, m3 = sum Z^3,
# m4 = sum Z^4 accumulate in DECIMAL(38,0) (|Z| <~ 1.4e6 at sf0.1 ->
# Z^4 ~ 4e24, x2500 days ~ 1e28, comfortably inside 38 digits).  The
# moment-scale cancellation: b1 and b2 are scale-free in Z (numerator
# and denominator carry the same power of the n factor), so the doubles
# are computed directly from the exact decimal moments with identical
# expression shape in both engines, then 6-dp floor-quantized; JB is
# derived FROM the quantized b1/b2 so both engines start from identical
# doubles.  Day grain (~2.4k rows) rides the DAY-GRAIN CONTRACT
# (module docstring).
# ---------------------------------------------------------------------------

@query(
    "stats_jarque_bera",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
      FROM daily
    ),
    z AS (
      SELECT t.n, CAST(t.n * d.y - t.s AS DECIMAL(38,0)) AS z
      FROM daily d, tot t
    ),
    mom AS (
      SELECT MAX(n) AS n,
             SUM(z * z) AS m2,
             SUM(z * z * z) AS m3,
             SUM(z * z * z * z) AS m4
      FROM z GROUP BY n
    ),
    bq AS (
      SELECT n,
             CAST(CAST(floor(
               CAST(m3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
               / pow(CAST(m2 AS DOUBLE), 1.5) * 1000000 + 0.5)
               AS BIGINT) AS DOUBLE) / 1000000.0 AS b1,
             CAST(CAST(floor(
               CAST(n AS DOUBLE) * CAST(m4 AS DOUBLE)
               / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS b2
      FROM mom
    )
    SELECT n AS n_days, b1 AS skew_b1, b2 AS kurt_b2,
           CAST(CAST(floor(
             CAST(n AS DOUBLE) * (b1 * b1 / 6.0
                                  + (b2 - 3.0) * (b2 - 3.0) / 24.0)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS jb_stat
    FROM bq
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic of daily order counts from
    exact-integer central moments (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.count("*").cast("bigint").alias("y")))
    tot = daily.agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("y").cast("bigint").alias("s"))
    z = (daily.crossJoin(F.broadcast(tot))
         .select("n", (F.col("n") * F.col("y") - F.col("s"))
                 .cast("decimal(38,0)").alias("z")))
    mom = z.groupBy("n").agg(
        F.sum(F.col("z") * F.col("z")).alias("m2"),
        F.sum(F.col("z") * F.col("z") * F.col("z")).alias("m3"),
        F.sum(F.col("z") * F.col("z") * F.col("z") * F.col("z"))
        .alias("m4"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    bq = mom.select(
        "n",
        q6(F.col("m3").cast("double")
           * F.sqrt(F.col("n").cast("double"))
           / F.pow(F.col("m2").cast("double"), F.lit(1.5))).alias("b1"),
        q6(F.col("n").cast("double") * F.col("m4").cast("double")
           / (F.col("m2").cast("double") * F.col("m2").cast("double")))
        .alias("b2"))
    return bq.select(
        F.col("n").alias("n_days"),
        F.col("b1").alias("skew_b1"),
        F.col("b2").alias("kurt_b2"),
        q6(F.col("n").cast("double")
           * (F.col("b1") * F.col("b1") / F.lit(6.0)
              + (F.col("b2") - F.lit(3.0)) * (F.col("b2") - F.lit(3.0))
              / F.lit(24.0))).alias("jb_stat"))


# ---------------------------------------------------------------------------
# Holt-Winters additive-seasonal smoothing (r12) — Winters 1960: the
# seasonal rung above r9's Holt level+trend fold.  Series = DAILY order
# counts on the dense day spine (gap days = 0), season = day-of-week
# (m = 7), alpha = 1/5, beta = 1/10, gamma = 1/5:
#   l' = alpha*(y - s_dow) + (1-alpha)*(l + b)
#   b' = beta*(l' - l)     + (1-beta)*b
#   s'_dow = gamma*(y - l') + (1-gamma)*s_dow
#
# ENGINE-EXACT FOLD (the Holt discipline, widened): state is NINE
# BIGINTs at 1e6 scale (l, b, s0..s6) — too wide for the packed-BIGINT
# trick, so Spark folds a STRUCT accumulator through aggregate() over
# the day-ordered series, and DuckDB replays the identical integer
# recurrence with a RECURSIVE CTE advancing one day per step (the
# Pregel-in-SQL trick, depth = the bounded ~2400-day calendar).  Each
# step is pure integer arithmetic with the positive-offset floor trick
# (OFF = 10*2^40 keeps every numerator positive so `div`/`//` == floor
# in both engines); the SAME Python generator emits both engines'
# expression text, so every add/divide happens in the same order.
# Day-of-week is (epoch_day + 4) % 7 (1970-01-01 is a Thursday;
# 0=Sunday) — pure integer, no calendar functions.
#
# SCALE: one groupBy to the bounded day grid, one single-task fold
# (DAY-GRAIN CONTRACT); forecasts h=1..7 read level + h*trend +
# season[(last_day + h) dow].  Init: l = y_0*1e6, b = 0, s = 0.
# ---------------------------------------------------------------------------

_HW_OFF = 10995116277760        # 10 * 2^40: positive-numerator offset
_HW_OFFD = 1099511627776        # OFF div 10


def _hw_step(D: str, y: str, d: str, l: str, b: str,   # noqa: E741
             s: list[str]) -> tuple[str, str, str, str]:
    """Emit (SP, LN, BN, SN) expression strings for one Holt-Winters
    step; ``D`` is the engine's integer-division operator, ``y``/``d``
    the new observation and its epoch day, ``l``/``b``/``s[0..6]`` the
    accumulator field accessors.  Identical text drives both engines."""
    sp = ("CASE (" + d + " + 4) % 7 "
          + " ".join(f"WHEN {i} THEN {s[i]}" for i in range(7)) + " END")
    ln = (f"(2*({y}*1000000 - ({sp})) + 8*({l} + {b})"
          f" + {_HW_OFF} + 5) {D} 10 - {_HW_OFFD}")
    bn = (f"((({ln}) - {l}) + 9*{b} + {_HW_OFF} + 5) {D} 10"
          f" - {_HW_OFFD}")
    sn = (f"(2*({y}*1000000 - ({ln})) + 8*({sp})"
          f" + {_HW_OFF} + 5) {D} 10 - {_HW_OFFD}")
    return sp, ln, bn, sn


def _hw_oracle() -> str:
    _sp, ln, bn, sn = _hw_step(
        "//", "sp.y", "sp.d", "r.l6", "r.b6",
        [f"r.s{i}" for i in range(7)])
    s_updates = ",\n             ".join(
        f"CASE WHEN (sp.d + 4) % 7 = {i} THEN ({sn}) ELSE r.s{i} END"
        f" AS s{i}" for i in range(7))
    season_cols = ",\n           ".join(
        f"round(s{i} / 1e6, 6) AS season_dow{i}" for i in range(7))
    fc_cols = ",\n           ".join(
        f"round((l6 + {h} * b6 + (CASE (d + {h} + 4) % 7 "
        + " ".join(f"WHEN {i} THEN s{i}" for i in range(7))
        + f" END)) / 1e6, 6) AS forecast_h{h}" for h in range(1, 8))
    return f"""
    WITH RECURSIVE cnt AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi,
                      CAST(COUNT(*) AS BIGINT) AS nd FROM cnt),
    spine AS (
      SELECT g.d, COALESCE(cnt.y, 0) AS y
      FROM (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds) g
      LEFT JOIN cnt USING (d)
    ),
    rec AS (
      SELECT sp.d, sp.y * 1000000 AS l6, CAST(0 AS BIGINT) AS b6,
             {", ".join(f"CAST(0 AS BIGINT) AS s{i}" for i in range(7))}
      FROM spine sp WHERE sp.d = (SELECT lo FROM bounds)
      UNION ALL
      SELECT sp.d, {ln} AS l6, {bn} AS b6,
             {s_updates}
      FROM rec r JOIN spine sp ON sp.d = r.d + 1
    )
    SELECT (SELECT hi - lo + 1 FROM bounds) AS n_days,
           round(l6 / 1e6, 6) AS level,
           round(b6 / 1e6, 6) AS trend,
           {season_cols},
           {fc_cols}
    FROM rec WHERE d = (SELECT hi FROM bounds)
    """


def _hw_spark_exprs() -> tuple[str, str]:
    """(init, merge-lambda) Spark SQL expression strings for the
    Holt-Winters struct fold; shared by the batch query and the
    streaming store (streaming/windows.py) so both engines' folds are
    literally the same text."""
    zero = "CAST(0 AS BIGINT)"
    _sp, ln, bn, sn = _hw_step(
        "div", "e.y", "e.d", "acc.l", "acc.b",
        [f"acc.s{i}" for i in range(7)])
    s_init = ", ".join(f"'s{i}', {zero}" for i in range(7))
    s_upd = ", ".join(
        f"'s{i}', CASE WHEN (e.d + 4) % 7 = {i} THEN ({sn})"
        f" ELSE acc.s{i} END" for i in range(7))
    merge = (f"(acc, e) -> CASE WHEN acc.t = CAST(-1 AS BIGINT)"
             f" THEN named_struct('t', e.d, 'l', e.y * 1000000,"
             f" 'b', {zero}, {s_init})"
             f" ELSE named_struct('t', e.d, 'l', {ln}, 'b', {bn},"
             f" {s_upd}) END")
    init = (f"named_struct('t', CAST(-1 AS BIGINT), 'l', {zero},"
            f" 'b', {zero}, {s_init})")
    return init, merge


def _hw_spark_fold(spine: DataFrame) -> DataFrame:
    """Fold the (d, y) day spine into the 9-field Holt-Winters state
    struct."""
    init, merge = _hw_spark_exprs()
    return (spine
            .agg(F.count("*").cast("bigint").alias("n_days"),
                 F.expr("sort_array(collect_list(struct(d, y)))")
                 .alias("series"))
            .select("n_days",
                    F.expr(f"aggregate(series, {init}, {merge})")
                    .alias("acc")))


def _hw_day_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cnt = (orders.groupBy(
        F.datediff("o_orderdate", F.lit("1970-01-01"))
        .cast("bigint").alias("d"))
        .agg(F.count("*").cast("bigint").alias("y")))
    days = (cnt.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
            .select(F.explode(F.sequence("lo", "hi")).alias("d")))
    return (days.join(cnt, "d", "left")
            .select("d", F.coalesce("y", F.lit(0)).cast("bigint")
                    .alias("y")))


def _hw_readout(state: DataFrame) -> DataFrame:
    season = [F.round(F.col("acc").getField(f"s{i}") / 1e6, 6)
              .alias(f"season_dow{i}") for i in range(7)]
    fc = []
    for h in range(1, 8):
        sh = F.col("acc").getField("s0")
        for i in range(1, 7):
            sh = F.when((F.col("acc").getField("t") + h + 4) % 7 == i,
                        F.col("acc").getField(f"s{i}")).otherwise(sh)
        fc.append(F.round((F.col("acc").getField("l")
                           + h * F.col("acc").getField("b") + sh)
                          / 1e6, 6).alias(f"forecast_h{h}"))
    return state.select(
        "n_days",
        F.round(F.col("acc").getField("l") / 1e6, 6).alias("level"),
        F.round(F.col("acc").getField("b") / 1e6, 6).alias("trend"),
        *season, *fc)


@query("stats_holtwinters_seasonal", oracle=_hw_oracle())
def stats_holtwinters_seasonal(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Holt-Winters additive day-of-week smoothing of daily order
    volume via one exact-integer struct fold (see block comment)."""
    spine = _hw_day_spine(spark, sf_dir)
    return _hw_readout(_hw_spark_fold(spine))


# ---------------------------------------------------------------------------
# Theil's U2 forecast-quality ratio (r12) — Theil 1966: the standard
# "is your forecaster better than naive?" readout that completes the
# Holt / Holt-Winters family: U2 = RMSE(model) / RMSE(naive last-value
# carry-forward), scored here for the SEASONAL-NAIVE forecaster
# f_t = y_{t-7} (the DOW-season baseline every seasonal model must
# beat) on the dense daily spine.  U2 < 1 means the weekly seasonal
# structure is real signal, not noise — the cheap pre-check before
# fitting stats_holtwinters_seasonal at all.
#
# EXACTNESS: both squared-error sums are exact BIGINTs over the day
# grid (scored only where BOTH lags exist, so the two sums cover the
# identical day set); U2 is one quantized sqrt of their double ratio.
# SCALE: lag windows run over the day-grid AGGREGATE (bounded spine,
# plan-gate clean), never over raw facts.
# ---------------------------------------------------------------------------

@query(
    "stats_theils_u",
    oracle="""
    WITH cnt AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM cnt),
    spine AS (
      SELECT g.d, COALESCE(cnt.y, 0) AS y
      FROM (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds) g
      LEFT JOIN cnt USING (d)
    ),
    lagged AS (
      SELECT d, y,
             lag(y, 1) OVER (ORDER BY d) AS y1,
             lag(y, 7) OVER (ORDER BY d) AS y7
      FROM spine
    ),
    scored AS (SELECT * FROM lagged WHERE y7 IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM((y1 - y) * (y1 - y)) AS BIGINT) AS sse_naive,
           CAST(SUM((y7 - y) * (y7 - y)) AS BIGINT) AS sse_seasonal,
           CAST(CAST(floor(
             sqrt(CAST(SUM((y7 - y) * (y7 - y)) AS DOUBLE)
                  / CAST(SUM((y1 - y) * (y1 - y)) AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS u2_seasonal_vs_naive
    FROM scored
    """,
)
def stats_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 of the seasonal-naive (lag-7) vs naive (lag-1)
    forecaster on daily order volume (see block comment)."""
    spine = _hw_day_spine(spark, sf_dir)
    # lag windows over the bounded day-grid aggregate (plan-gate clean)
    w = Window.orderBy("d")
    lagged = spine.select(
        "d", "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"))
    scored = lagged.filter(F.col("y7").isNotNull())
    e1 = (F.col("y1") - F.col("y")) * (F.col("y1") - F.col("y"))
    e7 = (F.col("y7") - F.col("y")) * (F.col("y7") - F.col("y"))
    agg = scored.agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum(e1).cast("bigint").alias("sse_naive"),
        F.sum(e7).cast("bigint").alias("sse_seasonal"))
    return agg.select(
        "n_scored", "sse_naive", "sse_seasonal",
        (F.floor(F.sqrt(F.col("sse_seasonal").cast("double")
                        / F.col("sse_naive").cast("double"))
                 * F.lit(1000000.0) + F.lit(0.5))
         .cast("bigint").cast("double") / F.lit(1000000.0))
        .alias("u2_seasonal_vs_naive"))


# ---------------------------------------------------------------------------
# Page-Hinkley drift monitor (r12) — Page 1954 / Hinkley 1971: the
# sequential mean-shift detector next to CUSUM (stats_cusum_weekly_
# exact tests ONE split retrospectively; Page-Hinkley accumulates
# deviation from the RUNNING mean with a tolerance delta, the form
# monitoring systems actually run online).  m_t = sum_{s<=t} (y_s -
# mean_s - delta); an UPWARD drift fires when m_t - min_{s<=t} m_s
# exceeds lambda.
#
# EXACTNESS: the running mean is floor-quantized per step at 1e6
# ((S_t * 1e6) div t — positive, so div == floor in both engines),
# making every term and cumulative an exact BIGINT; the readout
# publishes PH at x1e6 plus the quantized double and the fired flag.
# delta = 0.5 orders/week (DELTA6), lambda = 50 orders (LAMBDA6).
# SCALE: all windows run over the weekly-count AGGREGATE (bounded
# calendar grid, plan-gate clean).
# ---------------------------------------------------------------------------

PH_DELTA6 = 500_000          # 0.5 weekly orders at 1e6 scale
PH_LAMBDA6 = 50_000_000      # 50 weekly orders at 1e6 scale


@query(
    "stats_page_hinkley",
    oracle=f"""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT wk, y,
             CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS t,
             CAST(SUM(y) OVER (ORDER BY wk
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS s
      FROM wkly
    ),
    terms AS (
      SELECT wk, t,
             y * 1000000 - (s * 1000000) // t - {PH_DELTA6} AS term
      FROM idx
    ),
    m AS (
      SELECT wk, t,
             CAST(SUM(term) OVER (ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS mt
      FROM terms
    ),
    ph AS (
      SELECT wk, t, mt,
             mt - MIN(mt) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ph_t
      FROM m
    ),
    best AS (
      SELECT wk, t, ph_t,
             row_number() OVER (ORDER BY ph_t DESC, t) AS rnk
      FROM ph
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM wkly) AS n_weeks,
           t AS fired_t, wk AS fired_wk,
           ph_t AS ph_x1e6,
           CAST(CAST(floor(CAST(ph_t AS DOUBLE) / 1000000 * 1000000
                           + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS ph_stat,
           ph_t > {PH_LAMBDA6} AS drift_fired
    FROM best WHERE rnk = 1
    """,
)
def stats_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift statistic over weekly order volume
    with an exact integer running-mean fold (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    # all windows over the bounded weekly aggregate (plan-gate clean)
    w = Window.orderBy("wk")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    idx = wkly.select(
        "wk", "y",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.sum("y").over(wrun).cast("bigint").alias("s"))
    terms = idx.select(
        "wk", "t",
        (F.col("y") * 1000000 - F.expr("(s * 1000000) div t")
         - PH_DELTA6).alias("term"))
    wt = Window.orderBy("t")
    wtrun = wt.rowsBetween(Window.unboundedPreceding, 0)
    m = terms.select(
        "wk", "t",
        F.sum("term").over(wtrun).cast("bigint").alias("mt"))
    ph = m.select(
        "wk", "t", "mt",
        (F.col("mt") - F.min("mt").over(wtrun)).alias("ph_t"))
    best = ph.select(
        "wk", "t", "ph_t",
        F.row_number().over(Window.orderBy(F.desc("ph_t"), F.asc("t")))
        .alias("rnk"))
    n_df = wkly.agg(F.count("*").cast("bigint").alias("n_weeks"))
    return (best.filter(F.col("rnk") == 1)
            .crossJoin(F.broadcast(n_df))
            .select("n_weeks",
                    F.col("t").alias("fired_t"),
                    F.col("wk").alias("fired_wk"),
                    F.col("ph_t").alias("ph_x1e6"),
                    (F.floor(F.col("ph_t").cast("double") / 1000000
                             * F.lit(1000000.0) + F.lit(0.5))
                     .cast("bigint").cast("double") / F.lit(1000000.0))
                    .alias("ph_stat"),
                    (F.col("ph_t") > PH_LAMBDA6).alias("drift_fired")))


def _pearson_from_sums(n_dbl, sab, sa, sb, saa, sbb):
    """Pearson r from exact integer sufficient-statistic COLUMNS — the
    one expression shape every correlation query in this module shares
    with its DuckDB oracle (identical parenthesization -> identical
    IEEE doubles; the stats_price_qty_corr discipline).  ``n_dbl`` is
    the count column already cast to double; the rest are column
    names.  Extracted r13 so the cross-engine shape lives in ONE
    place (review r13: it had been copy-pasted three times)."""
    return ((n_dbl * F.col(sab).cast("double")
             - F.col(sa).cast("double") * F.col(sb))
            / F.sqrt((n_dbl * F.col(saa).cast("double")
                      - F.col(sa).cast("double") * F.col(sa))
                     * (n_dbl * F.col(sbb).cast("double")
                        - F.col(sb).cast("double") * F.col(sb))))


# ---------------------------------------------------------------------------
# Partial correlation (r12) — the confounder-control readout the corr
# family was missing: weekly order count x and weekly revenue y BOTH
# trend with time t, so their raw correlation overstates the volume-
# revenue link.  r_xy.t = (r_xy - r_xt*r_yt) / sqrt((1-r_xt^2)
# (1-r_yt^2)) removes the shared linear time trend (first-order
# partial; the Gram-determinant form specializes to this for one
# control variable).
#
# EXACTNESS: all ten sufficient statistics are exact integers on the
# bounded weekly grid — y-involved squares reach ~1e22 at sf0.1 scale,
# so they accumulate as HUGEINT (DuckDB) / DECIMAL(38,0) (Spark), the
# stats_price_qty_corr discipline; every r and the partial are doubles
# of identical expression shape, 6-dp floor-quantized.  SCALE: one
# groupBy to the <= ~350-row weekly grid, constant-size math after.
# ---------------------------------------------------------------------------

@query(
    "stats_partial_correlation",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(wk) AS BIGINT) AS st,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(wk * wk) AS BIGINT) AS stt,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             CAST(SUM(wk * x) AS BIGINT) AS stx,
             SUM(CAST(y AS HUGEINT) * wk) AS sty,
             SUM(CAST(y AS HUGEINT) * x) AS sxy
      FROM wkly
    ),
    r AS (
      SELECT n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)) AS rxy,
             (n * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * sx)
             / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                    * (n * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * sx)) AS rxt,
             (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
             / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)) AS ryt
      FROM s
    )
    SELECT n AS n_weeks,
           CAST(CAST(floor(rxy * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_xy,
           CAST(CAST(floor(rxt * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_xt,
           CAST(CAST(floor(ryt * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_yt,
           CAST(CAST(floor(
             (rxy - rxt * ryt)
             / sqrt((1 - rxt * rxt) * (1 - ryt * ryt))
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS r_xy_given_t
    FROM r
    """,
)
def stats_partial_correlation(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """First-order partial correlation of weekly volume and revenue
    controlling for the week index (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("x"),
             (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("y")))
    d38 = "decimal(38,0)"
    s = wkly.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("wk").cast("bigint").alias("st"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("wk") * F.col("wk")).cast("bigint").alias("stt"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("wk") * F.col("x")).cast("bigint").alias("stx"),
        F.sum(F.col("y").cast(d38) * F.col("wk")).alias("sty"),
        F.sum(F.col("y").cast(d38) * F.col("x")).alias("sxy"))
    n = F.col("n").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        return _pearson_from_sums(n, sab, sa, sb, saa, sbb)

    r = s.select(
        F.col("n"),
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("stx", "st", "sx", "stt", "sxx").alias("rxt"),
        corr("sty", "st", "sy", "stt", "syy").alias("ryt"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return r.select(
        F.col("n").alias("n_weeks"),
        q6(F.col("rxy")).alias("r_xy"),
        q6(F.col("rxt")).alias("r_xt"),
        q6(F.col("ryt")).alias("r_yt"),
        q6((F.col("rxy") - F.col("rxt") * F.col("ryt"))
           / F.sqrt((1 - F.col("rxt") * F.col("rxt"))
                    * (1 - F.col("ryt") * F.col("ryt"))))
        .alias("r_xy_given_t"))


# ---------------------------------------------------------------------------
# Semipartial (part) correlation (r13) — the asymmetric cousin of
# stats_partial_correlation above: the partial removes the control
# from BOTH variables, the semipartial removes it from ONE.  That
# asymmetry is the quantity a regression consumer actually wants —
# r_y(u.t)^2 is exactly the R^2 increment of adding u to a model of y
# that already contains t (the "unique contribution" readout).  Here
# y = weekly revenue, u = weekly distinct customers, t = week index:
# sp_y_u_given_t asks how much customer BREADTH explains revenue once
# breadth's own time trend is removed from breadth alone.
#
# EXACTNESS: same discipline as stats_partial_correlation — exact
# integer sufficient statistics on the bounded weekly grid (y-involved
# products accumulate HUGEINT/DECIMAL(38,0); u = exact COUNT(DISTINCT
# o_custkey)); all three r's and both semipartials are doubles of
# IDENTICAL expression shape, 6-dp floor-quantized.  SCALE: one
# groupBy to the <= ~350-row weekly grid (the distinct is a two-level
# partial aggregate on (wk, custkey)), constant-size math after.
# ---------------------------------------------------------------------------

@query(
    "stats_semipartial_correlation",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS u,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(wk) AS BIGINT) AS st,
             CAST(SUM(u) AS BIGINT) AS su,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(wk * wk) AS BIGINT) AS stt,
             CAST(SUM(u * u) AS BIGINT) AS suu,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             CAST(SUM(wk * u) AS BIGINT) AS stu,
             SUM(CAST(y AS HUGEINT) * wk) AS sty,
             SUM(CAST(y AS HUGEINT) * u) AS suy
      FROM wkly
    ),
    r AS (
      SELECT n,
             (n * CAST(suy AS DOUBLE) - CAST(su AS DOUBLE) * sy)
             / sqrt((n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * su)
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)) AS ruy,
             (n * CAST(stu AS DOUBLE) - CAST(st AS DOUBLE) * su)
             / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * su)) AS rut,
             (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
             / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)) AS ryt
      FROM s
    )
    SELECT n AS n_weeks,
           CAST(CAST(floor(ruy * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_uy,
           CAST(CAST(floor(rut * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_ut,
           CAST(CAST(floor(ryt * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_yt,
           CAST(CAST(floor(
             (ruy - ryt * rut) / sqrt(1 - rut * rut)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS sp_y_u_given_t,
           CAST(CAST(floor(
             (ruy - rut * ryt) / sqrt(1 - ryt * ryt)
             * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS sp_u_y_given_t
    FROM r
    """,
)
def stats_semipartial_correlation(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Semipartial correlations of weekly revenue and distinct-customer
    breadth with the week index as the removed control (see block
    comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        F.floor(F.datediff("o_orderdate", F.lit("1970-01-01"))
                .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("u"),
             (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("y")))
    d38 = "decimal(38,0)"
    s = wkly.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("wk").cast("bigint").alias("st"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("wk") * F.col("wk")).cast("bigint").alias("stt"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("suu"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("wk") * F.col("u")).cast("bigint").alias("stu"),
        F.sum(F.col("y").cast(d38) * F.col("wk")).alias("sty"),
        F.sum(F.col("y").cast(d38) * F.col("u")).alias("suy"))
    n = F.col("n").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        return _pearson_from_sums(n, sab, sa, sb, saa, sbb)

    r = s.select(
        F.col("n"),
        corr("suy", "su", "sy", "suu", "syy").alias("ruy"),
        corr("stu", "st", "su", "stt", "suu").alias("rut"),
        corr("sty", "st", "sy", "stt", "syy").alias("ryt"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return r.select(
        F.col("n").alias("n_weeks"),
        q6(F.col("ruy")).alias("r_uy"),
        q6(F.col("rut")).alias("r_ut"),
        q6(F.col("ryt")).alias("r_yt"),
        q6((F.col("ruy") - F.col("ryt") * F.col("rut"))
           / F.sqrt(1 - F.col("rut") * F.col("rut")))
        .alias("sp_y_u_given_t"),
        q6((F.col("ruy") - F.col("rut") * F.col("ryt"))
           / F.sqrt(1 - F.col("ryt") * F.col("ryt")))
        .alias("sp_u_y_given_t"))


# ---------------------------------------------------------------------------
# Higher-order partial correlation via Gram determinants (r13) — the
# generalization stats_partial_correlation's docstring promises: with
# TWO controls (week index z1 AND distinct-customer breadth z2) the
# recursion formula needs three chained first-order passes, but the
# determinant form reads the answer straight off the 4x4 correlation
# matrix R over (x, y, z1, z2):  r_xy.z1z2 = M12 / sqrt(M11 * M22)
# where Mij are the 3x3 minors of R (delete row i, col j) — the
# cofactor identity -C_xy / sqrt(C_xx C_yy) with the signs folded in.
# Here x = weekly order count, y = weekly revenue: does volume explain
# revenue beyond what the time trend AND customer breadth carry?
#
# EXACTNESS: one aggregate pass collects all 15 exact integer
# sufficient statistics (HUGEINT/DECIMAL(38,0) for the y-involved
# products); the six pairwise r's and the three minors are doubles of
# IDENTICAL expression shape in both engines (same parenthesization —
# IEEE arithmetic is deterministic, the stats_partial_correlation
# precedent); readouts 6-dp floor-quantized.  A pytest cross-checks
# the determinant route against the chained-recursion route to 1e-9.
# SCALE: one groupBy to the <= ~350-row weekly grid, constant after.
# ---------------------------------------------------------------------------

@query(
    "stats_partial_correlation_gram",
    oracle="""
    WITH wkly AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               // 7 AS wk,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS u,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(wk) AS BIGINT) AS st,
             CAST(SUM(u) AS BIGINT) AS su,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             CAST(SUM(wk * wk) AS BIGINT) AS stt,
             CAST(SUM(u * u) AS BIGINT) AS suu,
             SUM(CAST(y AS HUGEINT) * x) AS sxy,
             CAST(SUM(wk * x) AS BIGINT) AS sxt,
             CAST(SUM(u * x) AS BIGINT) AS sxu,
             SUM(CAST(y AS HUGEINT) * wk) AS syt,
             SUM(CAST(y AS HUGEINT) * u) AS syu,
             CAST(SUM(wk * u) AS BIGINT) AS stu
      FROM wkly
    ),
    r AS (
      SELECT n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)) AS r12,
             (n * CAST(sxt AS DOUBLE) - CAST(sx AS DOUBLE) * st)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * st)) AS r13,
             (n * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * su)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * su)) AS r14,
             (n * CAST(syt AS DOUBLE) - CAST(sy AS DOUBLE) * st)
             / sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                    * (n * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * st)) AS r23,
             (n * CAST(syu AS DOUBLE) - CAST(sy AS DOUBLE) * su)
             / sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * su)) AS r24,
             (n * CAST(stu AS DOUBLE) - CAST(st AS DOUBLE) * su)
             / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * su)) AS r34
      FROM s
    ),
    m AS (
      SELECT n, r12, r13, r14, r23, r24, r34,
             r12 * (1 - r34 * r34) - r23 * (r13 - r34 * r14)
               + r24 * (r13 * r34 - r14) AS m12,
             1 * (1 - r34 * r34) - r23 * (r23 - r34 * r24)
               + r24 * (r23 * r34 - r24) AS m11,
             1 * (1 - r34 * r34) - r13 * (r13 - r34 * r14)
               + r14 * (r13 * r34 - r14) AS m22
      FROM r
    )
    SELECT n AS n_weeks,
           CAST(CAST(floor(r12 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_xy,
           CAST(CAST(floor(r34 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS r_z1z2,
           CAST(CAST(floor(m12 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS minor_xy,
           CAST(CAST(floor(m11 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS minor_xx,
           CAST(CAST(floor(m22 * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS minor_yy,
           CAST(CAST(floor(
             m12 / sqrt(m11 * m22) * 1000000 + 0.5) AS BIGINT)
             AS DOUBLE) / 1000000.0 AS r_xy_given_z1z2
    FROM m
    """,
)
def stats_partial_correlation_gram(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Second-order partial correlation of weekly volume and revenue
    controlling for the week index AND distinct-customer breadth, read
    off the 4x4 correlation matrix's minors (see block comment)."""
    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        F.floor(F.datediff("o_orderdate", F.lit("1970-01-01"))
                .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("x"),
             F.countDistinct("o_custkey").cast("bigint").alias("u"),
             (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("decimal(38,0)").cast("bigint").alias("y")))
    d38 = "decimal(38,0)"
    s = wkly.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("wk").cast("bigint").alias("st"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("wk") * F.col("wk")).cast("bigint").alias("stt"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("suu"),
        F.sum(F.col("y").cast(d38) * F.col("x")).alias("sxy"),
        F.sum(F.col("wk") * F.col("x")).cast("bigint").alias("sxt"),
        F.sum(F.col("u") * F.col("x")).cast("bigint").alias("sxu"),
        F.sum(F.col("y").cast(d38) * F.col("wk")).alias("syt"),
        F.sum(F.col("y").cast(d38) * F.col("u")).alias("syu"),
        F.sum(F.col("wk") * F.col("u")).cast("bigint").alias("stu"))
    n = F.col("n").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        return _pearson_from_sums(n, sab, sa, sb, saa, sbb)

    r = s.select(
        F.col("n"),
        corr("sxy", "sx", "sy", "sxx", "syy").alias("r12"),
        corr("sxt", "sx", "st", "sxx", "stt").alias("r13"),
        corr("sxu", "sx", "su", "sxx", "suu").alias("r14"),
        corr("syt", "sy", "st", "syy", "stt").alias("r23"),
        corr("syu", "sy", "su", "syy", "suu").alias("r24"),
        corr("stu", "st", "su", "stt", "suu").alias("r34"))
    c = F.col
    m = r.select(
        "n", "r12", "r34",
        (c("r12") * (1 - c("r34") * c("r34"))
         - c("r23") * (c("r13") - c("r34") * c("r14"))
         + c("r24") * (c("r13") * c("r34") - c("r14"))).alias("m12"),
        (1 * (1 - c("r34") * c("r34"))
         - c("r23") * (c("r23") - c("r34") * c("r24"))
         + c("r24") * (c("r23") * c("r34") - c("r24"))).alias("m11"),
        (1 * (1 - c("r34") * c("r34"))
         - c("r13") * (c("r13") - c("r34") * c("r14"))
         + c("r14") * (c("r13") * c("r34") - c("r14"))).alias("m22"))
    q6 = lambda col: (F.floor(col * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      .cast("bigint").cast("double") / F.lit(1000000.0))
    return m.select(
        F.col("n").alias("n_weeks"),
        q6(c("r12")).alias("r_xy"),
        q6(c("r34")).alias("r_z1z2"),
        q6(c("m12")).alias("minor_xy"),
        q6(c("m11")).alias("minor_xx"),
        q6(c("m22")).alias("minor_yy"),
        q6(c("m12") / F.sqrt(c("m11") * c("m22")))
        .alias("r_xy_given_z1z2"))
