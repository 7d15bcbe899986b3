"""Streaming window aggregation (SURVEY §2.9 W1-W3, §2.4 A1-A4) — the DWS
layer as actual Structured Streaming queries.

The reference's DWS jobs are: watermark (2 s typical) → keyBy → 10 s
tumbling event-time window → incremental reduce → decorate with window
start/end (stt/edt) → ClickHouse
(e.g. DwsTrafficVcChArIsNewPageViewWindow.java:118-180).

Spark shape: ``withWatermark → groupBy(window(...), keys) → agg`` —
partial aggregation happens map-side before the shuffle (the reference's
"来一条聚合一条" incremental reduce, for free), and late rows beyond the
watermark are dropped exactly like the reference (no allowedLateness
anywhere in it — W3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, ts_col: str, window_size: str,
                 watermark: str, keys: list[str],
                 aggs: list[Column]) -> DataFrame:
    """Keyed (or global, keys=[]) tumbling event-time window aggregate,
    decorated with stt/edt strings like the reference's WindowFunction
    wrappers (DwsTrafficVcChArIsNewPageViewWindow.java:152-161)."""
    win = F.window(F.col(ts_col), window_size)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(*aggs)
        .withColumn("stt", F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("edt", F.date_format(F.col("window.end"), "yyyy-MM-dd HH:mm:ss"))
        .drop("window")
    )


def session_agg(events: DataFrame, ts_col: str, gap: str, watermark: str,
                keys: list[str], aggs: list[Column]) -> DataFrame:
    """Session-window aggregate (SURVEY W8 generalization) — Spark's
    native ``session_window`` handles merge-on-arrival."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(*aggs)
        .withColumn("stt", F.date_format(F.col("session_window.start"),
                                         "yyyy-MM-dd HH:mm:ss"))
        .withColumn("edt", F.date_format(F.col("session_window.end"),
                                         "yyyy-MM-dd HH:mm:ss"))
        .drop("session_window")
    )


# ---------------------------------------------------------------------------
# Registered correctness query: the DWS tumbling window run AS A STREAM
# (readStream → watermark → window agg → memory sink), hash-checked
# against the same SQL oracle as the batch form — streaming and batch
# produce identical results by construction (complete output mode).
# ---------------------------------------------------------------------------

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from gmall_211027_flink_spark.registry import query  # noqa: E402


@query(
    "dws_tumble_streaming",
    oracle="""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS stt,
      event_type,
      COUNT(*) AS pv_ct,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def dws_tumble_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events
    stream = stream_events(spark, sf_dir)
    agg = tumbling_agg(
        stream, "ts", "1 hour", "2 seconds", ["event_type"],
        [F.count("*").alias("pv_ct"),
         F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
          .alias("value_sum")],
    ).select("stt", "event_type", "pv_ct", "value_sum")
    name = f"dws_tumble_stream_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Second streaming gate entry: the A5 daily-unique stateful processor
# (applyInPandasWithState) run as a stream, hash-checked against the same
# SQL oracle as the batch row_number form — keyed state and the batch
# window expression provably agree.
# ---------------------------------------------------------------------------

@query(
    "dws_daily_uv_detail_streaming",
    oracle="""
    SELECT user_id, dt, event_id AS first_event_id, event_type AS first_event_type
    FROM (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dws_daily_uv_detail_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.state import daily_unique

    stream = stream_events(spark, sf_dir).withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd"))
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("first_event_type", T.StringType()),
    ])
    renamed = stream.select(
        "user_id", "dt", "ts",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_event_type"),
    )
    uv = daily_unique(renamed, "user_id", "ts", out_schema,
                      order_cols=["ts", "first_event_id"])
    name = f"dws_daily_uv_stream_{_uuid.uuid4().hex[:8]}"
    q = (uv.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Third streaming gate entry: a TRUE stream-stream interval join (J1/J5 —
# reference: DwdTradeOrderDetail.java:182-184 regular join with TTL;
# DataStreamJoinTest.java:48-56 interval join). Both sides watermarked,
# equi-key + event-time range condition (the form Spark requires to
# bound join state — SURVEY §7.3 gap 3: bounds chosen ≥ the reference's
# TTL so match behavior is preserved). Inner-join pairs emit immediately
# (no watermark holdback), so availableNow drains the full result; the
# memory-sink output is then aggregated and hash-checked against the
# SAME SQL oracle as the batch interval join.
# ---------------------------------------------------------------------------

@query(
    "dwd_interval_join_streaming",
    oracle="""
    SELECT
      a.user_id,
      COUNT(*) AS pair_ct,
      MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us,
      MAX(epoch_us(b.ts) - epoch_us(a.ts)) AS max_gap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'error'
    GROUP BY 1
    """,
)
def dwd_interval_join_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    clicks = (stream_events(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("a_ts"))
              .withWatermark("a_ts", "2 seconds"))
    errors = (stream_events(spark, sf_dir)
              .filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
              .withWatermark("b_ts", "2 seconds"))
    pairs = clicks.join(
        errors,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("user_id",
             (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"))
    name = f"dwd_interval_join_stream_{_uuid.uuid4().hex[:8]}"
    q = (pairs.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (spark.table(name).groupBy("user_id")
            .agg(F.count("*").alias("pair_ct"),
                 F.min("gap_us").alias("min_gap_us"),
                 F.max("gap_us").alias("max_gap_us")))


# ---------------------------------------------------------------------------
# Fourth streaming gate entry: `dropDuplicatesWithinWatermark` (A6 —
# reference: first-row-per-key dedup with 5 s state TTL,
# DwsTradePaymentSucWindow.java:74-102). The deduped stream drains to a
# memory sink; per-type distinct users are hash-checked against plain
# COUNT(DISTINCT) SQL. The downstream agg uses countDistinct — NOT
# count(*) — because dropDuplicatesWithinWatermark only guarantees no
# duplicates *within* the watermark horizon: with multiple micro-batches
# a key's state is evicted once the watermark passes and a later
# duplicate re-emits (by design, same as the reference's TTL'd state).
# countDistinct over the drained output absorbs those re-emits, making
# the gate batching-independent (ADVICE r1).
# ---------------------------------------------------------------------------

@query(
    "dwd_stream_dedup_within_watermark",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS uu_ct
    FROM events GROUP BY 1
    """,
)
def dwd_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    deduped = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "2 seconds")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"dwd_stream_dedup_{_uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (spark.table(name).groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("uu_ct")))


# ---------------------------------------------------------------------------
# Fifth streaming gate entry: native `session_window` aggregation run AS A
# STREAM (W8 — the reference counts session starts via last_page_id IS
# NULL, DwsTrafficVcChArIsNewPageViewWindow.java:96-99; this is the
# generalized form: sessions merge on arrival, close when the gap
# exceeds 30 min). Oracle is gaps-and-islands SQL with the break
# condition `gap > 30 min` — mirroring Spark's merge rule exactly
# (session windows that TOUCH merge: an event landing exactly at
# prev_ts + gap extends the session — measured in
# tests/test_r7_additions.py::test_session_window_touch_boundary; with
# microsecond event times an exact tie is vanishingly rare, but the
# oracle should encode the engine's real rule). Output edt = last
# event + gap, Spark's session-end definition.
# ---------------------------------------------------------------------------

@query(
    "dws_session_window_streaming",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
           COUNT(*) AS event_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM sess GROUP BY user_id, session_id
    """,
)
def dws_session_window_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    stream = stream_events(spark, sf_dir)
    agg = session_agg(
        stream, "ts", "30 minutes", "2 seconds", ["user_id"],
        [F.count("*").alias("event_ct"),
         F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
          .alias("value_sum")],
    ).select("user_id", "stt", "edt", "event_ct", "value_sum")
    name = f"dws_session_stream_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Sixth streaming gate entry: 3-way stream UNION → keyed tumbling window
# (U2 — the reference normalizes pv/uv/uj streams into one bean type and
# unions them before a single shared window,
# DwsTrafficVcChArIsNewPageViewWindow.java:115-118). Here three filtered
# derivatives of the source stream are normalized to (ts, metric
# columns), unioned, and summed in one windowed agg — one shuffle for
# all three inputs, matching the reference's single downstream window.
# ---------------------------------------------------------------------------

@query(
    "dws_union_streams_window",
    oracle="""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS stt,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_ct,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_ct
    FROM events
    WHERE event_type IN ('click', 'purchase', 'error')
    GROUP BY 1
    """,
)
def dws_union_streams_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    def leg(event_type: str, c: str, p: str, e: str) -> DataFrame:
        return (stream_events(spark, sf_dir)
                .filter(F.col("event_type") == event_type)
                .select("ts",
                        F.lit(1 if c == "y" else 0).alias("click"),
                        F.lit(1 if p == "y" else 0).alias("purchase"),
                        F.lit(1 if e == "y" else 0).alias("error")))

    unioned = (leg("click", "y", "n", "n")
               .unionByName(leg("purchase", "n", "y", "n"))
               .unionByName(leg("error", "n", "n", "y")))
    agg = tumbling_agg(
        unioned, "ts", "1 hour", "2 seconds", [],
        [F.sum("click").cast("bigint").alias("click_ct"),
         F.sum("purchase").cast("bigint").alias("purchase_ct"),
         F.sum("error").cast("bigint").alias("error_ct")],
    ).select("stt", "click_ct", "purchase_ct", "error_ct")
    name = f"dws_union_stream_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Seventh streaming gate entry: stateful back-flow detection (A5 — the
# reference's returning-user ValueState gap check,
# DwsUserUserLoginWindow.java:117-121) run as a stream; per-day back-flow
# counts hash-match the batch lag()-based SQL oracle.
# ---------------------------------------------------------------------------

@query(
    "dws_backflow_streaming",
    oracle="""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt FROM events GROUP BY 1, 2
    ), gaps AS (
      SELECT user_id, dt,
             date_diff('day',
                       strptime(LAG(dt) OVER (PARTITION BY user_id ORDER BY dt), '%Y-%m-%d'),
                       strptime(dt, '%Y-%m-%d')) AS gap_days
      FROM daily
    )
    SELECT dt, COUNT(*) AS backflow_ct
    FROM gaps WHERE gap_days >= 2 GROUP BY 1
    """,
)
def dws_backflow_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.state import backflow

    stream = stream_events(spark, sf_dir).withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd"))
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.StringType()),
        T.StructField("gap_days", T.IntegerType()),
    ])
    bf = backflow(stream.select("user_id", "dt"), "user_id", out_schema)
    name = f"dws_backflow_stream_{_uuid.uuid4().hex[:8]}"
    q = (bf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (spark.table(name).groupBy("dt")
            .agg(F.count("*").alias("backflow_ct")))


# ---------------------------------------------------------------------------
# Eighth streaming gate entry: CUMULATE windows AS A STREAM. The
# cumulative-end expansion is a stateless map-side explode (each event →
# its remaining 15-min ends within the hour), so the streaming plan is
# exactly the batch plan with a streaming aggregation on top — same
# oracle as the batch dws_cumulate_window.
# ---------------------------------------------------------------------------

@query(
    "dws_cumulate_streaming",
    oracle="""
    WITH c AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
             (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
              + 900 * k.k) AS wend
      FROM events,
           (SELECT UNNEST(generate_series(1, 4)) AS k) k
      WHERE 900 * k.k > epoch(ts) - CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
    )
    SELECT strftime(make_timestamp(h * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(make_timestamp(wend * 1000000), '%Y-%m-%d %H:%M:%S') AS edt,
           event_type,
           COUNT(*) AS pv_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM c GROUP BY 1, 2, 3
    """,
)
def dws_cumulate_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    ev = stream_events(spark, sf_dir)
    epoch = F.unix_timestamp("ts")
    h = (F.floor(epoch / 3600) * 3600).cast("bigint")
    expanded = (
        ev.select("event_type", "value", h.alias("h"),
                  (epoch - h).alias("off"))
        .withColumn("k", F.explode(
            F.expr("sequence(cast(floor(off/900)+1 as int), 4)")))
        .withColumn("wend", F.col("h") + 900 * F.col("k"))
    )
    agg = (
        expanded.groupBy("h", "wend", "event_type")
        .agg(F.count("*").alias("pv_ct"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
              .alias("value_sum"))
        .select(
            F.date_format(F.timestamp_seconds("h"), "yyyy-MM-dd HH:mm:ss")
             .alias("stt"),
            F.date_format(F.timestamp_seconds("wend"), "yyyy-MM-dd HH:mm:ss")
             .alias("edt"),
            "event_type", "pv_ct", "value_sum")
    )
    name = f"dws_cumulate_stream_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Ninth streaming gate entry: OHLC candlestick rollup AS A STREAM —
# open/close via lexicographic struct min/max inside a streaming
# aggregation (incremental: each arriving row folds into the running
# min/max structs — the same "来一条聚合一条" incremental reduce shape as
# the reference's windows). Same oracle as the batch dws_ohlc_hourly.
# ---------------------------------------------------------------------------

@query(
    "dws_ohlc_streaming",
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
def dws_ohlc_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    ev = stream_events(spark, sf_dir)
    h = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint")
    agg = (
        ev.groupBy(h.alias("h"), "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("first_row"),
            F.max(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("high"),
            F.min(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("low"),
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
            "tick_ct")
    )
    name = f"dws_ohlc_stream_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Streaming INGEST dedup — the continuous-crawl version of dedup_exact:
# as document files land, maintain per-content-hash (copy count,
# canonical = min doc_id) as a streaming aggregation. min/count are
# order-insensitive, so the result is deterministic for any micro-batch
# slicing and matches the batch oracle bit-for-bit; at 100 TB the state
# is one row per DISTINCT document (the deduped size, not the crawl
# size) and the aggregation is the same hash-shuffle as the batch op.
# (dropDuplicates would keep an ARBITRARY row per key under streaming —
# aggregate with min instead, exactly for determinism.)
# ---------------------------------------------------------------------------

@query(
    "stream_dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS content_hash,
           COUNT(*) AS copy_ct,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def stream_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (spark.readStream.schema(batch_schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    agg = (stream
           .groupBy(F.md5("text").alias("content_hash"))
           .agg(F.count("*").alias("copy_ct"),
                F.min("doc_id").alias("canonical_doc_id")))
    name = f"stream_dedup_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


from gmall_211027_flink_spark.operators.text import (  # noqa: E402
    QF_DISTINCT_RATIO_PCT as _QF_DIST, QF_MAX_WORDS as _QF_MAX,
    QF_MIN_WORDS as _QF_MIN, QF_STOP_RATIO_PCT as _QF_STOP,
    _QF_STOPS, _sql_list as _qf_sql_list)


@query(
    "stream_quality_filter_documents",
    # Oracle built from the SAME QF_* constants the Spark side imports
    # (operators/text.py) so editing the shared rule thresholds or the
    # stopword list can never desync only this oracle (ADVICE r3).
    oracle=f"""
    WITH t AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    verdicts AS (
      SELECT lang,
        CASE
          WHEN len(w) < {_QF_MIN} THEN 'too_short'
          WHEN len(w) > {_QF_MAX} THEN 'too_long'
          WHEN len(list_filter(w, x -> list_contains(
                 [{_qf_sql_list(_QF_STOPS)}], x)))
               * 100 < len(w) * {_QF_STOP} THEN 'low_stopword'
          WHEN len(list_distinct(w)) * 100 < len(w) * {_QF_DIST}
               THEN 'repetitive'
          ELSE 'kept'
        END AS verdict
      FROM t
    )
    SELECT lang, verdict, COUNT(*) AS doc_ct
    FROM verdicts GROUP BY 1, 2
    """,
)
def stream_quality_filter_documents(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Streaming ingest-time quality filtering: the same Gopher/C4-style
    verdict expressions as the batch quality_filter_rules, applied to a
    document file stream with a running (lang, verdict) count — all
    verdict math is stateless/map-side, so the only state is the tiny
    5x|lang| counter grid and throughput is scan-bound at any corpus
    size. Counts are order-insensitive: deterministic under any
    micro-batch slicing, hash-checked against the batch oracle.
    """
    from gmall_211027_flink_spark.operators.text import (
        QF_DISTINCT_RATIO_PCT, QF_MAX_WORDS, QF_MIN_WORDS,
        QF_STOP_RATIO_PCT, _QF_STOPS, _sql_list)
    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (spark.readStream.schema(batch_schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir)
              .select("lang", F.split("text", " ").alias("w")))
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
    agg = (stream.select("lang", verdict.alias("verdict"))
           .groupBy("lang", "verdict")
           .agg(F.count("*").alias("doc_ct")))
    name = f"stream_qf_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Streaming form of the DwdTradeOrderDetail order graph join (J1/J2 with
# the reference's multi-day idle-state TTL, DwdTradeOrderDetail.java:26:
# 3 days). TPC-H analog: orders (order_info) LEFT OUTER joined to
# lineitem (order_detail), where a line matches only if it ships within
# the 3-day TTL window after the order — the event-time range conjunct
# that replaces Flink's state TTL, bounding BOTH state stores.
#
# The left-outer null padding (orders with no line inside the TTL) only
# flushes once the global watermark passes the order's state expiry
# (o_orderdate + 3 d + delay); rows younger than the final watermark
# stay in state at stream end (Spark's documented outer-join semantics).
# So the DRAINED sink is post-filtered to the closed business period
# o_orderdate < CUTOFF, chosen so CUTOFF + 3 d + delay is far below the
# final watermark (= min(max o_orderdate, max l_shipdate) - delay; the
# testdata maxes are 2001-08-01 / 2001-11-04, giving ~4 weeks of
# margin). The oracle is the plain batch left join with the identical
# TTL conjunct and cutoff — within the closed period, the streaming
# output is EXACTLY the batch join, which is the property the reference
# relies on when it replays history through the same Flink job.
# ---------------------------------------------------------------------------

ODJ_TTL_DAYS = 3                      # reference DwdTradeOrderDetail.java:26
ODJ_CUTOFF = "2001-07-01 00:00:00"    # closed-period cutoff (see above)


@query(
    "dwd_order_detail_join_streaming",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(l.l_orderkey) AS matched_line_ct,
           CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS open_order_ct,
           coalesce(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                    0.0) AS qty_sum
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL {ODJ_TTL_DAYS} DAY
    WHERE o.o_orderdate < TIMESTAMP '{ODJ_CUTOFF}'
    GROUP BY 1
    """,
)
def dwd_order_detail_join_streaming(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.catalog import normalize_event_ts
    from gmall_211027_flink_spark.functions import dec

    def _side(table: str, ts_col: str, cols: list[str]) -> DataFrame:
        schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
        s = (spark.readStream.schema(schema)
             .option("pathGlobFilter", f"{table}.parquet")
             .parquet(sf_dir))
        return (normalize_event_ts(s, ts_col).select(*cols)
                .withWatermark(ts_col, "2 seconds"))

    o = _side("orders", "o_orderdate",
              ["o_orderkey", "o_orderpriority", "o_orderdate"])
    li = _side("lineitem", "l_shipdate",
               ["l_orderkey", "l_quantity", "l_shipdate"])
    joined = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate")
           <= F.col("o_orderdate") + F.expr(f"INTERVAL {ODJ_TTL_DAYS} DAYS")),
        "left_outer",
    ).select("o_orderkey", "o_orderpriority", "o_orderdate",
             "l_orderkey", "l_quantity")
    name = f"dwd_odj_stream_{_uuid.uuid4().hex[:8]}"
    q = (joined.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (
        spark.table(name)
        .filter(F.col("o_orderdate") < F.lit(ODJ_CUTOFF).cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(F.count("l_orderkey").alias("matched_line_ct"),
             F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
              .cast("bigint").alias("open_order_ct"),
             F.coalesce(F.sum(dec("l_quantity")).cast("double"), F.lit(0.0))
              .alias("qty_sum"))
    )


# ---------------------------------------------------------------------------
# Streaming ingest sampling: the content-keyed hash-bucket sampler
# (operators/sampling.py — split membership is a pure function of the
# row key) applied AT INGEST on a document stream, with a per-source
# (kept, total) counter grid. Because the verdict is stateless map-side
# math, streaming output is deterministic under any micro-batch slicing
# and equals the batch sampler bit-for-bit — the property that lets a
# pipeline sample during ingestion instead of landing 100% of a crawl
# first. Only the tiny counter grid is stateful (complete mode).
# ---------------------------------------------------------------------------

STREAM_SAMPLE_PCT = 30


@query(
    "stream_sample_ingest",
    oracle=f"""
    SELECT source,
           COUNT(*) AS total_ct,
           CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8))::BIGINT % 100
                              < {STREAM_SAMPLE_PCT} THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_ct
    FROM documents GROUP BY 1
    """,
)
def stream_sample_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.operators.sampling import hash_bucket

    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (spark.readStream.schema(batch_schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    kept = F.when(hash_bucket(F.col("doc_id")) < STREAM_SAMPLE_PCT, 1) \
            .otherwise(0)
    agg = (stream.select("source", kept.alias("kept"))
           .groupBy("source")
           .agg(F.count("*").alias("total_ct"),
                F.sum("kept").cast("bigint").alias("kept_ct")))
    name = f"stream_sample_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Stream-static join (the reference's lookup-join family S7/J3 in its
# most common Spark deployment shape): a fact STREAM enriched against a
# STATIC dim snapshot — Spark re-plans the static side per micro-batch,
# so a broadcast dim is re-broadcast fresh each batch (the behavior that
# replaces the reference's JDBC lookup cache + TTL, DimUtil.java). No
# watermark needed: stream-static inner joins are stateless (each batch
# joins alone). The drained per-batch rows aggregate to the same result
# as the batch join — checked against the plain SQL oracle.
# ---------------------------------------------------------------------------

@query(
    "dwd_stream_static_dim_join",
    oracle="""
    SELECT p.p_type,
           COUNT(*) AS line_ct,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def dwd_stream_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.functions import dec

    batch_schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    li = (spark.readStream.schema(batch_schema)
          .option("pathGlobFilter", "lineitem.parquet")
          .parquet(sf_dir)
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .select("p_partkey", "p_type"))
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    agg = (li.join(F.broadcast(part),
                   F.col("l_partkey") == F.col("p_partkey"))
           .select("p_type", revenue.alias("rev"))
           .groupBy("p_type")
           .agg(F.count("*").alias("line_ct"),
                F.sum("rev").cast("double").alias("revenue")))
    name = f"dwd_ss_dim_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# APPEND-mode windowed aggregation — the emit-on-watermark path, a
# different engine mechanism from the complete-mode entries above: a
# window's row is emitted exactly once, when the watermark passes its
# end (the reference's default fire-on-window-close trigger — W2's
# actual production semantics; complete mode has no Flink analog).
# The final partial window can never flush (watermark stops at
# max-event-time - delay), so BOTH the drained sink and the oracle
# restrict to windows closing before a literal cutoff inside the closed
# period — same closed-period technique as the TTL left join above.
# ---------------------------------------------------------------------------

TUMBLE_APPEND_CUTOFF = "2024-01-30 00:00:00"   # events span Jan 1-30 24h


@query(
    "dws_tumble_append_streaming",
    oracle=f"""
    SELECT
      strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                              * 1000000),
               '%Y-%m-%d %H:%M:%S') AS stt,
      event_type,
      COUNT(*) AS pv_ct
    FROM events
    WHERE make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                         * 1000000) + INTERVAL 1 HOUR
          <= TIMESTAMP '{TUMBLE_APPEND_CUTOFF}'
    GROUP BY 1, 2
    """,
)
def dws_tumble_append_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    stream = stream_events(spark, sf_dir)
    agg = (stream.withWatermark("ts", "2 seconds")
           .groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count("*").alias("pv_ct"))
           .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("stt"),
                   F.col("window.end").alias("edt_ts"),
                   "event_type", "pv_ct"))
    name = f"dws_tumble_append_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (spark.table(name)
            .filter(F.col("edt_ts")
                    <= F.lit(TUMBLE_APPEND_CUTOFF).cast("timestamp"))
            .select("stt", "event_type", "pv_ct"))


# ---------------------------------------------------------------------------
# Driver-gated form of the incremental aggregate store: the events table
# is folded through IncrementalAggStore in three deterministic
# event-time slices (simulating three micro-batch commits), and the
# final store must hash-match the plain one-shot SQL aggregate. This is
# the O(batch)-per-commit DWS maintenance shape actually deployable at
# 100 TB (complete mode re-emits O(state) every batch).
# ---------------------------------------------------------------------------

@query(
    "dws_incremental_agg_maintenance",
    oracle="""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
           COUNT(*) AS pv_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def dws_incremental_agg_maintenance(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        F.col("value").cast("decimal(18,2)").alias("v"), "ts")
    d = tempfile.mkdtemp(prefix="inc_agg_gate_")
    store = IncrementalAggStore(
        f"{d}/store", ["event_type", "dt"],
        {"pv_ct": ("count", None), "value_sum": ("sum", "v")})
    # three deterministic event-time slices = three commits
    cuts = ["2024-01-11", "2024-01-21"]
    slices = [
        events.filter(F.col("dt") < cuts[0]),
        events.filter((F.col("dt") >= cuts[0]) & (F.col("dt") < cuts[1])),
        events.filter(F.col("dt") >= cuts[1]),
    ]
    for i, sl in enumerate(slices):
        store.write_batch(sl, i)
    return store.read(spark).select(
        "event_type", "dt", "pv_ct",
        F.col("value_sum").cast("double").alias("value_sum"))


# ---------------------------------------------------------------------------
# Incremental NEAR-dup ingest: maintain the MinHash-LSH bucket store one
# micro-batch at a time. Each commit computes the batch's constant-size
# band signatures map-side (operators/dedup.py::bands_for_docs — the
# same math as the driver-proven dedup_minhash_lsh) and min-merges
# (bucket -> canonical doc_id, population) into the keyed store: commit
# cost is O(batch), store size is O(distinct buckets), and because
# MIN/COUNT are order-insensitive the final store is identical for ANY
# slicing/ordering of the crawl — which is what the oracle checks by
# comparing against the one-shot batch computation. The dup verdict
# ("shares a bucket with a lower-id doc") is then a band join against
# the store: at 100 TB the per-batch verdict join touches only the
# batch's buckets (O(batch)); the corpus-wide summary emitted here is
# the end-of-crawl audit read.
# ---------------------------------------------------------------------------

@query(
    "stream_dedup_minhash_incremental",
    oracle=None,  # assigned below (reuses dedup.py band CTE fragments)
)
def stream_dedup_minhash_incremental(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    import tempfile

    from gmall_211027_flink_spark.operators.dedup import (
        bands_for_docs, minhash_bands)
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    import shutil

    from gmall_211027_flink_spark.catalog import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="lsh_store_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["band_id", "band_key"],
            {"min_doc": ("min", "doc_id"), "n_docs": ("count", None)})
        # three deterministic crawl slices = three commits (doc_id mod 3
        # — deliberately interleaved, NOT contiguous ranges, so the
        # order-insensitivity claim is actually exercised)
        for i in range(3):
            sl = bands_for_docs(docs.filter(F.col("doc_id") % 3 == i))
            store.write_batch(sl, i)
        buckets = store.read(spark)
        bands = minhash_bands(spark, sf_dir)
        per_doc = (bands.join(buckets, ["band_id", "band_key"])
                   .groupBy("doc_id")
                   .agg(F.min("min_doc").alias("best_mate")))
        verdicts = per_doc.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("best_mate") < F.col("doc_id"), 1)
                  .otherwise(0))
             .cast("bigint").alias("n_dup_candidates"))
        bucket_stats = buckets.agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
             .cast("bigint").alias("n_collision_buckets"))
        out = (verdicts.crossJoin(bucket_stats)
               .select("n_docs", "n_dup_candidates",
                       (F.col("n_docs") - F.col("n_dup_candidates"))
                       .alias("n_kept"),
                       "n_buckets", "n_collision_buckets"))
        # The store dir must outlive only THIS materialization — force
        # the fold's result out of it before removing (repeated driver
        # runs were accumulating lsh_store_gate_* temp dirs otherwise).
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _lsh_incremental_oracle() -> str:
    from gmall_211027_flink_spark.operators.dedup import (
        _SHINGLES_SQL, _minhash_bands_sql)
    return f"""
    WITH {_SHINGLES_SQL},
    {_minhash_bands_sql()},
    mins AS (
      SELECT band_id, band_key, MIN(doc_id) AS min_doc, COUNT(*) AS c
      FROM bands GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT b.doc_id, MIN(m.min_doc) AS best_mate
      FROM bands b JOIN mins m
        ON m.band_id = b.band_id AND m.band_key = b.band_key
      GROUP BY 1
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM per_doc) AS n_docs,
      (SELECT CAST(SUM(CASE WHEN best_mate < doc_id THEN 1 ELSE 0 END)
              AS BIGINT) FROM per_doc) AS n_dup_candidates,
      (SELECT CAST(SUM(CASE WHEN best_mate >= doc_id THEN 1 ELSE 0 END)
              AS BIGINT) FROM per_doc) AS n_kept,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM mins) AS n_buckets,
      (SELECT CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
       FROM mins) AS n_collision_buckets
    """


from gmall_211027_flink_spark.registry import ORACLES as _OR  # noqa: E402
_OR["stream_dedup_minhash_incremental"] = _lsh_incremental_oracle()


# ---------------------------------------------------------------------------
# Driver-gated form of the streaming SCD2 store: the lineitem changelog
# is folded through scd2_merge_batch in three deterministic event-time
# slices (three commits, same harness shape as
# dws_incremental_agg_maintenance) and the final versioned store must
# hash-match the one-shot batch operator's oracle (dim_scd2_history).
# This promotes the streaming SCD2 path from test-only evidence to a
# driver row: commit cost is O(touched keys) — closed history is
# immutable and untouched keys never re-enter the collapse.
# ---------------------------------------------------------------------------

@query(
    "dim_scd2_stream_maintenance",
    oracle=None,  # assigned below: identical to the batch dim_scd2_history
)
def dim_scd2_stream_maintenance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.streaming.scd2 import scd2_merge_batch

    log = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("pk"), F.col("l_shipdate").alias("ts"),
        F.col("l_linenumber").alias("seq"),
        F.col("l_linestatus").alias("status"))
    store = spark.createDataFrame(
        [], "pk bigint, status string, eff_from timestamp, "
            "eff_to timestamp, is_current int")
    cuts = ["1994-01-01", "1996-01-01"]
    slices = [
        log.filter(F.col("ts") < cuts[0]),
        log.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        log.filter(F.col("ts") >= cuts[1]),
    ]
    for sl in slices:
        # localCheckpoint stands in for the parquet store rewrite the
        # foreachBatch driver (run_scd2_stream) performs per commit
        store = scd2_merge_batch(store, sl).localCheckpoint()
    return store.select(
        "pk", "status",
        F.date_format("eff_from", "yyyy-MM-dd HH:mm:ss")
         .alias("effective_from"),
        F.date_format("eff_to", "yyyy-MM-dd HH:mm:ss").alias("effective_to"),
        "is_current")


def _scd2_stream_oracle() -> str:
    # the batch operator registers in operators/windows.py — import it
    # first so this module works standalone (scripts import it directly)
    import gmall_211027_flink_spark.operators.windows  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["dim_scd2_history"]


_OR["dim_scd2_stream_maintenance"] = _scd2_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming decontamination at ingest: the benchmark suite is STATIC
# (eval docs are fixed before the crawl starts); training documents
# stream in and are checked against the broadcast eval n-gram set as
# they arrive — the real-world deployment shape of decontaminate_ngram
# (operators/curation.py), where re-crawling must not wait for a batch
# decon pass.
#
# Two structured-streaming queries share the file stream: (1) per-lang
# train-doc counters (stateless map + tiny counter grid); (2) the
# contaminated-doc set, found by exploding each arriving doc's distinct
# grams map-side and stream-static LEFT SEMI joining the broadcast eval
# grams — state is O(contaminated docs), bounded by the eval suite's
# near-dup footprint in the corpus, NOT by corpus size. Both folds are
# order-insensitive counts/sets, so the drained result is identical
# under any micro-batch slicing and must hash-match the one-shot batch
# oracle.
# ---------------------------------------------------------------------------

@query(
    "stream_decontaminate_ingest",
    oracle=None,  # assigned below: identical to batch decontaminate_ngram
)
def stream_decontaminate_ingest(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.operators.curation import EVAL_MOD, NGRAM

    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    grams_expr = F.expr(
        f"array_distinct(transform("
        f" if(size(w) >= {NGRAM}, sequence(1, size(w)-{NGRAM - 1}),"
        "  cast(array() as array<int>)),"
        " i -> concat_ws(' ', element_at(w,i), element_at(w,i+1),"
        " element_at(w,i+2), element_at(w,i+3), element_at(w,i+4))))")

    # static side: the fixed benchmark suite's distinct grams
    eval_grams = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                  .filter(F.col("doc_id") % EVAL_MOD == 0)
                  .select(F.split("text", " ").alias("w"))
                  .select(F.explode(grams_expr).alias("g"))
                  .distinct())

    stream = (spark.readStream.schema(batch_schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir)
              .filter(F.col("doc_id") % EVAL_MOD != 0)
              .select("doc_id", "lang", F.split("text", " ").alias("w")))

    run = _uuid.uuid4().hex[:8]
    # (1) stateless per-lang train counters
    t_name = f"sdi_train_{run}"
    qt = (stream.groupBy("lang").agg(F.count("*").alias("train_ct"))
          .writeStream.format("memory").queryName(t_name)
          .outputMode("complete").trigger(availableNow=True).start())
    # (2) contaminated-doc set via map-side gram explode + stream-static
    # semi join against the broadcast eval grams
    c_name = f"sdi_cont_{run}"
    qc = (stream.select("doc_id", "lang", F.explode(grams_expr).alias("g"))
          .join(F.broadcast(eval_grams), "g", "left_semi")
          .groupBy("lang", "doc_id").agg(F.count("*").alias("hits"))
          .writeStream.format("memory").queryName(c_name)
          .outputMode("complete").trigger(availableNow=True).start())
    qt.awaitTermination(600)
    qc.awaitTermination(600)
    cont = (spark.table(c_name).groupBy("lang")
            .agg(F.count("*").alias("contaminated_ct")))
    return (spark.table(t_name).join(cont, "lang", "left")
            .select(
                "lang", "train_ct",
                F.coalesce("contaminated_ct", F.lit(0)).cast("bigint")
                 .alias("contaminated_ct"),
                (F.col("train_ct")
                 - F.coalesce("contaminated_ct", F.lit(0))).cast("bigint")
                 .alias("clean_ct"),
                F.round(F.coalesce("contaminated_ct", F.lit(0))
                        .cast("double") / F.col("train_ct"), 6)
                 .alias("contamination_rate")))


def _stream_decon_oracle() -> str:
    # curation registers later in load_all's order — import it now so
    # its oracle exists (idempotent; ordering is rebuilt at load_all end)
    import gmall_211027_flink_spark.operators.curation  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["decontaminate_ngram"]


_OR["stream_decontaminate_ingest"] = _stream_decon_oracle()


# ---------------------------------------------------------------------------
# Streaming last-value compaction (A7 at ingest): the upsert-kafka
# "last row per key wins" semantics (reference sink DDL,
# e.g. DwdTradeOrderDetail.java upsert sink) maintained INCREMENTALLY —
# each micro-batch folds max(encoded (ts, seq, value)) into the keyed
# store, so commit cost is O(batch), store is O(keys), and because MAX
# over the fixed-width encoding is associative/commutative the final
# compacted state is identical under ANY micro-batch slicing. The
# encoding packs the full payload behind a lexicographic (ts, seq)
# prefix, so the store needs no join-back to recover the winning row.
# ---------------------------------------------------------------------------

@query(
    "stream_last_value_compaction",
    oracle="""
    SELECT user_id, es AS last_es, event_id AS last_event_id,
           event_type AS last_event_type
    FROM (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
             event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC,
                        event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_last_value_compaction(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore, run_incremental_agg)

    def _enc12(c):
        # Spark's lpad TRUNCATES over-width input to len and a negative
        # value's '-' sorts before every digit — either silently corrupts
        # the lexicographic MAX fold.  Guard loudly instead: any value
        # outside [0, 1e12) kills the batch with a clear message.
        s = c.cast("string")
        return (F.when((c >= 0) & (F.length(s) <= 12), F.lpad(s, 12, "0"))
                 .otherwise(F.raise_error(F.concat(F.lit(
                     "last_value_compaction: encode input out of "
                     "[0, 1e12): "), s))))

    enc = F.concat(
        _enc12(F.unix_timestamp("ts")),
        _enc12(F.col("event_id")),
        F.col("event_type"))
    d = tempfile.mkdtemp(prefix="lastval_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["user_id"], {"last_enc": ("max", "enc")})
        stream = stream_events(spark, sf_dir).select(
            "user_id", enc.alias("enc"))
        q = run_incremental_agg(stream, store, f"{d}/ckpt")
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_last_value_compaction timed out")
        out = store.read(spark).select(
            "user_id",
            F.substring("last_enc", 1, 12).cast("bigint").alias("last_es"),
            F.substring("last_enc", 13, 12).cast("bigint")
             .alias("last_event_id"),
            F.substring("last_enc", 25, 100).alias("last_event_type"))
        # gate-harness materialization only (the temp store is removed
        # in `finally`, so the frame must leave it first); production
        # reads the persistent store directly — no driver collect
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Top-k over an incrementally maintained aggregate: per-day GMV sums
# fold O(batch) into the keyed store (same mergeable-decimal discipline
# as dws_incremental_agg_maintenance); the top-5-days-with-ties report
# is a RANK read over the tiny store — the pattern that replaces
# "re-aggregate the fact table for every leaderboard refresh" at 100 TB.
# ---------------------------------------------------------------------------

@query(
    "stream_topk_gmv_maintenance",
    oracle="""
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gmv
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT order_day, CAST(gmv AS DOUBLE) AS gmv,
             rank() OVER (ORDER BY gmv DESC, order_day) AS rnk
      FROM daily
    )
    SELECT order_day, gmv, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def stream_topk_gmv_maintenance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore, run_incremental_agg)

    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    d = tempfile.mkdtemp(prefix="topk_gmv_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["order_day"], {"gmv": ("sum", "gmv_part")})
        stream = (spark.readStream.schema(schema)
                  .option("pathGlobFilter", "orders.parquet")
                  .parquet(sf_dir)
                  .select(
                      F.date_format("o_orderdate", "yyyy-MM-dd")
                       .alias("order_day"),
                      F.col("o_totalprice").cast("decimal(18,2)")
                       .alias("gmv_part")))
        q = run_incremental_agg(stream, store, f"{d}/ckpt")
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_topk_gmv_maintenance timed out")
        w = Window.orderBy(F.desc("gmv"), "order_day")
        out = (store.read(spark)
               .select("order_day", F.col("gmv").cast("double")
                       .alias("gmv"))
               .withColumn("rnk", F.rank().over(w).cast("bigint"))
               .filter(F.col("rnk") <= 5))
        # gate-harness materialization (temp store removed in finally);
        # production reads the persistent store — no driver collect
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming inverted-index statistics maintenance: the BM25 corpus
# statistics (document frequency + total term frequency per query
# term) kept current as documents stream in — the "index at ingest"
# path that lets text_bm25_search (operators/search.py) serve without
# a batch rebuild. Per batch: tokenize map-side, filter to the query
# vocabulary BEFORE any state, reduce to per-(doc, term) counts, fold
# count/sum into the keyed store (O(batch) commit, store O(vocab)).
# COUNT/SUM are order-insensitive, so the drained store equals the
# batch statistics under any micro-batch slicing — which is what the
# oracle checks.
# ---------------------------------------------------------------------------

@query(
    "stream_index_stats_maintenance",
    oracle=None,  # assigned below (shares the term list with search.py)
)
def stream_index_stats_maintenance(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.operators.search import _ALL_TERMS
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore, run_incremental_agg)

    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    d = tempfile.mkdtemp(prefix="idx_stats_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["term"],
            {"df": ("count", None), "tf_total": ("sum", "tf")})
        stream = (spark.readStream.schema(batch_schema)
                  .option("pathGlobFilter", "documents.parquet")
                  .parquet(sf_dir)
                  .select("doc_id",
                          F.explode(F.split("text", " ")).alias("term"))
                  .filter(F.col("term").isin(list(_ALL_TERMS))))

        # The stream itself stays STATELESS (no streaming aggregation
        # state); the per-(doc, term) reduction happens inside each
        # foreachBatch commit — correct because the file source never
        # splits one document across micro-batches, so every (doc,
        # term) posting finalizes within its batch.
        def _fold(batch, epoch_id):
            red = (batch.groupBy("doc_id", "term")
                   .agg(F.count("*").alias("tf"))
                   .select("term", "tf"))
            store.write_batch(red, epoch_id)

        q = (stream.writeStream.foreachBatch(_fold)
             .option("checkpointLocation", f"{d}/ckpt")
             .trigger(availableNow=True).start())
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_index_stats_maintenance timed out")
        import os
        if not os.path.exists(f"{d}/store"):
            # corpus contained NO query-vocabulary postings at all: the
            # store was never materialized — the index is validly empty
            return spark.createDataFrame(
                [], "term string, df bigint, tf_total bigint")
        out = (store.read(spark)
               .select("term", F.col("df").cast("bigint").alias("df"),
                       F.col("tf_total").cast("bigint").alias("tf_total")))
        # gate-harness materialization (temp store removed in finally);
        # production reads the persistent store — no driver collect
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _index_stats_oracle() -> str:
    from gmall_211027_flink_spark.operators.search import _ALL_TERMS
    in_list = ", ".join(f"'{t}'" for t in _ALL_TERMS)
    return f"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE term IN ({in_list})
      GROUP BY 1, 2
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS tf_total
    FROM tf GROUP BY 1
    """


_OR["stream_index_stats_maintenance"] = _index_stats_oracle()


# ---------------------------------------------------------------------------
# Streaming form of the Flink TUMBLE-aligned window join (batch analog:
# operators/joins.py::dwd_window_join_click_error, same oracle): both
# sides watermarked and bucketed by the SAME tumbling window, then
# equi-joined on (user, window). This is the join whose streaming state
# Spark can fully bound from the window equality alone — each side
# holds at most one window past the watermark, vs the interval join's
# range-conditioned retention. Inner pairs emit immediately, so
# availableNow drains the complete result; the memory-sink output is
# aggregated and hash-checked against the SAME SQL oracle as the batch
# operator.
# ---------------------------------------------------------------------------

@query(
    "dwd_window_join_streaming",
    oracle=None,  # assigned below: identical to the batch window join
)
def dwd_window_join_streaming(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events

    clicks = (stream_events(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .select("user_id", F.window("ts", "1 hour").alias("win"),
                      F.col("ts").alias("a_ts"))
              .withWatermark("a_ts", "2 seconds"))
    errors = (stream_events(spark, sf_dir)
              .filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("b_user"),
                      F.window("ts", "1 hour").alias("b_win"),
                      F.col("ts").alias("b_ts"))
              .withWatermark("b_ts", "2 seconds"))
    pairs = (clicks.join(
        errors,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("win") == F.col("b_win")))
        .select("user_id",
                (F.unix_timestamp(F.col("win.start")) / 3600)
                .cast("bigint").alias("b3600")))
    name = f"dwd_window_join_stream_{_uuid.uuid4().hex[:8]}"
    q = (pairs.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("dwd_window_join_streaming timed out")
    return (spark.table(name).groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("pair_ct"),
                 F.countDistinct("b3600").cast("bigint")
                  .alias("window_ct"),
                 F.min("b3600").cast("bigint").alias("first_window"),
                 F.max("b3600").cast("bigint").alias("last_window")))


def _window_join_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.joins  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["dwd_window_join_click_error"]


_OR["dwd_window_join_streaming"] = _window_join_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming windowed funnel (CEP-as-state): the per-user view -> click
# -> purchase funnel level maintained in keyed state
# (streaming/state.py::funnel_levels — two running anchor maxima, the
# stateful twin of the batch window-function form). The drained
# per-batch emissions fold by MAX per user (the level is monotone in
# state), then histogram — hash-checked against the SAME oracle as the
# batch ads_window_funnel.
# ---------------------------------------------------------------------------

@query(
    "dws_funnel_streaming",
    oracle=None,  # assigned below: identical to batch ads_window_funnel
)
def dws_funnel_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from gmall_211027_flink_spark.plans.behavior import FUNNEL_WINDOW_S
    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.state import funnel_levels

    stream = stream_events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("es"), "event_id",
        "event_type")
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("level", T.LongType()),
    ])
    levels = funnel_levels(stream, FUNNEL_WINDOW_S, out_schema)
    name = f"dws_funnel_stream_{_uuid.uuid4().hex[:8]}"
    q = (levels.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("dws_funnel_streaming timed out")
    return (spark.table(name)
            .groupBy("user_id").agg(F.max("level").alias("funnel_level"))
            .groupBy(F.col("funnel_level").cast("bigint")
                     .alias("funnel_level"))
            .agg(F.count("*").cast("bigint").alias("n_users")))


def _funnel_stream_oracle() -> str:
    import gmall_211027_flink_spark.plans.behavior  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["ads_window_funnel"]


_OR["dws_funnel_streaming"] = _funnel_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming CEP bounce detection (W7): the timeout side-output semantics
# of the reference's Flink CEP job (DwdTrafficUserJumpDetail.java:62-107
# — entry = no recent predecessor, bounce = no successor within the
# timeout) run as keyed state over a file stream
# (streaming/bounce.py::bounce_verdicts), then hash-checked against the
# SAME lag()/lead() SQL oracle as the batch dwd_bounce_detection. The
# drain is batching-independent: provisional trailing emissions (NULL
# next gap) are superseded by the resolved row via max() per event.
# ---------------------------------------------------------------------------

@query(
    "dwd_bounce_streaming",
    oracle=None,  # assigned below: identical to batch dwd_bounce_detection
)
def dwd_bounce_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_211027_flink_spark.sources.files import stream_events
    from gmall_211027_flink_spark.streaming.bounce import bounce_verdicts

    stream = stream_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"))
    name = f"dwd_bounce_stream_{_uuid.uuid4().hex[:8]}"
    q = (bounce_verdicts(stream).writeStream.format("memory")
         .queryName(name).outputMode("append")
         .trigger(availableNow=True).start())
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("dwd_bounce_streaming timed out")
    # per-event final verdict: the resolved row's gap beats the
    # provisional NULL (max ignores nulls); surviving NULL = stream
    # ended with no successor = the CEP timeout side-output (bounce)
    events = (spark.table(name)
              .groupBy("user_id", "event_id", "es_us", "prev_gap_us")
              .agg(F.max("next_gap_us").alias("next_gap_us")))
    entries = events.filter(
        F.col("prev_gap_us").isNull()
        | (F.col("prev_gap_us") > 30 * 60 * 1_000_000))
    return (entries.groupBy(
                F.date_format(F.timestamp_micros("es_us"), "yyyy-MM-dd")
                 .alias("dt"))
            .agg(F.count("*").alias("entry_ct"),
                 F.sum(F.when(F.col("next_gap_us").isNull()
                              | (F.col("next_gap_us")
                                 > 10 * 60 * 1_000_000), 1)
                       .otherwise(0)).cast("bigint").alias("bounce_ct")))


def _bounce_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.windows  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["dwd_bounce_detection"]


_OR["dwd_bounce_streaming"] = _bounce_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming CUSUM changepoint monitor: the daily-GMV cumulative-
# deviation scan of stats_cusum_changepoint maintained at ingest —
# per-batch decimal partial sums fold O(batch) into the day-keyed store
# (exact and order-insensitive, so the drained store equals the batch
# daily table under any slicing); the CUSUM scan + argmax runs over the
# |days|-sized store at query time. KS watches the SHAPE of a
# distribution drift; CUSUM locates WHEN a level shift happened — the
# monitoring pair. Hash-checked against the batch oracle.
# ---------------------------------------------------------------------------

@query(
    "stream_cusum_monitor",
    oracle=None,  # assigned below: identical to batch stats_cusum_changepoint
)
def stream_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore, run_incremental_agg)

    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    d = tempfile.mkdtemp(prefix="cusum_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["d"], {"g": ("sum", "g_part")})
        stream = (spark.readStream.schema(schema)
                  .option("pathGlobFilter", "orders.parquet")
                  .parquet(sf_dir)
                  .select(
                      F.date_format("o_orderdate", "yyyy-MM-dd")
                       .alias("d"),
                      F.col("o_totalprice").cast("decimal(18,2)")
                       .alias("g_part")))
        q = run_incremental_agg(stream, store, f"{d}/ckpt")
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_cusum_monitor timed out")
        daily = store.read(spark).select("d", "g")
        w_run = Window.orderBy("d").rowsBetween(
            Window.unboundedPreceding, 0)
        w_all = Window.partitionBy(F.lit(1))
        pre = (daily
               .withColumn("pre", F.sum("g").over(w_run))
               .withColumn("i", F.row_number().over(Window.orderBy("d")))
               .withColumn("total", F.sum("g").over(w_all))
               .withColumn("n", F.count("*").over(w_all)))
        cusum = (F.col("pre").cast("double")
                 - F.col("i").cast("double")
                 * (F.col("total").cast("double")
                    / F.col("n").cast("double")))
        out = (pre.select(F.col("d").alias("cp_day"),
                          F.round(cusum, 6).alias("cusum_at_cp"),
                          F.col("n").cast("bigint").alias("n_days"),
                          cusum.alias("_c"))
               .orderBy(F.abs(F.col("_c")).desc(), "cp_day").limit(1)
               .drop("_c"))
        # gate-harness materialization (temp store removed in finally);
        # production reads the persistent store — no driver collect
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cusum_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_cusum_changepoint"]


_OR["stream_cusum_monitor"] = _cusum_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming distribution-drift monitor: the two-sample KS statistic of
# stats_ks_drift maintained at ingest — per-batch (length, cohort)
# counts fold O(batch) into the keyed store (counts are
# order-insensitive, so the drained store equals the batch counts under
# any slicing); the ecdf + KS read runs over the compressed value
# domain at query time. This is how a crawl watches a source drift
# WITHOUT re-scanning the corpus: state is O(|distinct lengths| x 2).
# ---------------------------------------------------------------------------

@query(
    "stream_ks_drift_monitor",
    oracle=None,  # assigned below: identical to batch stats_ks_drift
)
def stream_ks_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore, run_incremental_agg)

    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    d = tempfile.mkdtemp(prefix="ks_drift_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["n_chars", "cohort"], {"ct": ("count", None)})
        cohort = F.when(
            F.substring("source", 4, 10).cast("int") % 2 == 0,
            "a").otherwise("b")
        stream = (spark.readStream.schema(batch_schema)
                  .option("pathGlobFilter", "documents.parquet")
                  .parquet(sf_dir)
                  .select("n_chars", cohort.alias("cohort")))
        q = run_incremental_agg(stream, store, f"{d}/ckpt")
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_ks_drift_monitor timed out")
        import os
        if not os.path.exists(f"{d}/store"):
            # no documents arrived: nothing to test drift on
            return spark.createDataFrame(
                [], "n_a bigint, n_b bigint, ks_stat double, "
                    "critical_005 double, drifted boolean")
        vals = (store.read(spark)
                .groupBy("n_chars")
                .agg(F.sum(F.when(F.col("cohort") == "a", F.col("ct"))
                           .otherwise(0)).alias("ca"),
                     F.sum(F.when(F.col("cohort") == "b", F.col("ct"))
                           .otherwise(0)).alias("cb")))
        tot = vals.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
        w = (Window.orderBy("n_chars")
             .rowsBetween(Window.unboundedPreceding, 0))
        ecdf = vals.select(
            "n_chars",
            F.sum("ca").over(w).alias("cum_a"),
            F.sum("cb").over(w).alias("cum_b"))
        dd = F.abs(F.col("cum_a").cast("double") / F.col("na")
                   - F.col("cum_b").cast("double") / F.col("nb"))
        from gmall_211027_flink_spark.operators.aggregates import (
            KS_ALPHA_C)
        crit = (F.expr(KS_ALPHA_C)
                * F.sqrt((F.col("na") + F.col("nb"))
                         / (F.col("na").cast("double") * F.col("nb"))))
        out = (ecdf.crossJoin(F.broadcast(tot))
               .groupBy(F.col("na").cast("bigint").alias("n_a"),
                        F.col("nb").cast("bigint").alias("n_b"))
               .agg(F.round(F.max(dd), 6).alias("ks_stat"),
                    F.round(F.first(crit), 6).alias("critical_005"),
                    (F.max(dd) > F.first(crit)).alias("drifted")))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ks_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_ks_drift"]


_OR["stream_ks_drift_monitor"] = _ks_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming winnowing fingerprint index: the MOSS fingerprint set of
# dedup_winnowing_fingerprints maintained at ingest. Winnowing selection
# (window-min over K-gram hashes) is PER-DOCUMENT — a micro-batch
# carrying whole documents computes exactly the fingerprints the batch
# operator would, so each commit appends O(batch fingerprints) to the
# keyed (doc_id, h) store and no cross-document state is touched at
# write time. The cross-document read (stop-gram cap + pair Jaccard,
# winnow_pairs) runs over the drained store and must hash-match the
# one-shot batch oracle — the plagiarism-index analog of the
# MinHash-LSH bucket store (stream_dedup_minhash_incremental).
# Reference anchor: the same ingest-time index maintenance shape as
# DwsTrafficVcChArIsNewPageViewWindow.java:118-180 (incremental reduce),
# applied to the SIGMOD'03 winnowing fingerprint set.
# ---------------------------------------------------------------------------

@query(
    "stream_winnowing_index_store",
    oracle=None,  # assigned below: identical to the batch winnowing op
)
def stream_winnowing_index_store(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.dedup import (
        winnow_fingerprints, winnow_pairs)
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="winnow_store_gate_")
    try:
        # (doc_id, h) is the store grain; n_batches is a trivially
        # mergeable carrier (a fingerprint re-observed on replay would
        # bump it, never duplicate the key — reads stay set-semantic).
        store = IncrementalAggStore(
            f"{d}/store", ["doc_id", "h"], {"n_batches": ("count", None)})
        # three interleaved crawl slices = three commits (doc_id mod 3,
        # NOT contiguous ranges, so slicing-invariance is exercised)
        for i in range(3):
            sl = winnow_fingerprints(docs.filter(F.col("doc_id") % 3 == i))
            store.write_batch(sl, i)
        fp = store.read(spark).select("doc_id", "h")
        out = winnow_pairs(fp)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _winnow_stream_oracle() -> str:
    from gmall_211027_flink_spark.operators.dedup import _WINNOW_ORACLE
    return _WINNOW_ORACLE


_OR["stream_winnowing_index_store"] = _winnow_stream_oracle()


# ---------------------------------------------------------------------------
# Late-data drop gate (W3 — the one SURVEY §2.9 row that was
# test-pass-only, now driver-gated; VERDICT r6 #6): a windowed
# aggregation over a 4-batch file stream where the LAST batch is
# entirely late (its event times precede a watermark advanced two
# batches earlier), so every row in it must be dropped by the watermark
# — the Flink `allowedLateness(0)` default the reference's window jobs
# rely on. The DuckDB oracle aggregates ONLY the on-time slices; if the
# engine failed to drop the late batch, the counts and decimal sums in
# the compared windows would differ and the value hash breaks.
#
# Batch layout (file source, maxFilesPerTrigger=1, mtime-ordered):
#   a: events with us <= mid                      (on time)
#   b: events with us >  mx - 2h                  (advances watermark to mx-10s)
#   c: EMPTY                                      (buffer batch — Spark's late
#      filter in batch N uses the watermark committed by batch N-1, which
#      lags the data by one batch; the empty batch lets b's watermark
#      become the filter watermark before d arrives — measured, not
#      assumed: without the buffer the late rows merge-then-evict in the
#      same batch and are NOT dropped)
#   d: events with mid < us <= mx - 2h            (ALL LATE — dropped)
# Compared set: windows with end <= mx - 1h, hour-aligned and strictly
# below the final watermark, so emission is deterministic regardless of
# the engine's <-vs-<= eviction boundary. Late rows' windows all end
# <= mx - 1h, so they sit INSIDE the compared set — the drop is what
# keeps the hashes equal.
# ---------------------------------------------------------------------------

@query(
    "dws_late_data_drop",
    oracle="""
    WITH b AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us,
             epoch_us(MAX(ts)) AS mx_us
      FROM events
    ),
    inc AS (
      SELECT e.ts, e.value FROM events e, b
      WHERE epoch_us(e.ts) <= b.mid_us
         OR epoch_us(e.ts) > b.mx_us - 7200000000
    ),
    w AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                            * 1000000) AS wstart,
             value
      FROM inc
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
           COUNT(*) AS event_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM w, b
    WHERE epoch_us(wstart) + 3600000000 <= b.mx_us - 3600000000
    GROUP BY 1
    """,
)
def dws_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    mn, mx = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).first()
    mid = (mn + mx) // 2
    hi = mx - 2 * 3600 * 1_000_000
    us = F.unix_micros(F.col("ts"))
    d = tempfile.mkdtemp(prefix="late_drop_gate_")
    try:
        src = f"{d}/src"
        os.makedirs(src)
        slices = [
            ("a", ev.filter(us <= F.lit(mid))),
            ("b", ev.filter(us > F.lit(hi))),
            ("c", ev.limit(0)),                               # buffer batch
            ("d", ev.filter((us > F.lit(mid)) & (us <= F.lit(hi)))),  # LATE
        ]
        for i, (tag, sl) in enumerate(slices):
            stage = f"{d}/stage_{tag}"
            sl.coalesce(1).write.mode("overwrite").parquet(stage)
            parts = [p for p in os.listdir(stage) if p.endswith(".parquet")]
            assert parts, f"slice {tag} wrote no part file"
            for p in parts:
                dst = f"{src}/{tag}_{p}"
                shutil.copy(f"{stage}/{p}", dst)
                os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))
        sch = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        agg = (stream.withWatermark("ts", "10 seconds")
               .groupBy(F.window("ts", "1 hour"))
               .agg(F.count("*").cast("bigint").alias("event_ct"),
                    F.sum(F.col("value").cast("decimal(18,2)"))
                     .cast("double").alias("value_sum"))
               .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                        .alias("stt"),
                       F.unix_micros(F.col("window.end")).alias("end_us"),
                       "event_ct", "value_sum"))
        name = f"dws_late_drop_{_uuid.uuid4().hex[:8]}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("dws_late_data_drop timed out")
        out = (spark.table(name)
               .filter(F.col("end_us") <= F.lit(mx - 3600 * 1_000_000))
               .select("stt", "event_ct", "value_sum"))
        # gate-harness materialization (temp stream dir removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming Count-Min maintenance: the CM grid of
# sketch_countmin_freq_audit maintained at ingest. CM merge is
# cell-wise ADDITION — exactly the mergeable-sum contract of
# IncrementalAggStore keyed by (seed, bucket) — so per-batch partial
# grids fold O(d·w) per commit (never O(vocabulary)), and the drained
# grid is equal under ANY batch slicing to the one-shot batch build.
# The read-time audit (top-20 exact counts vs grid minima) must
# hash-match the batch oracle verbatim.
# ---------------------------------------------------------------------------

@query(
    "stream_countmin_maintenance",
    oracle=None,   # assigned below: identical to batch CM audit
)
def stream_countmin_maintenance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.sketches import (
        CM_DEPTH, CM_TOPK, CM_WIDTH)
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = spark.range(CM_DEPTH).withColumnRenamed("id", "seed")
    bucket = F.expr(
        f"cast(conv(substring(md5(concat(cast(seed as string), ':', token)),"
        f" 1, 15), 16, 10) as bigint) % {CM_WIDTH}")
    d = tempfile.mkdtemp(prefix="cm_store_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["seed", "bucket"], {"cell_cnt": ("sum", "part")})
        # three interleaved crawl slices = three commits (mod-3 slicing,
        # so per-batch partial grids overlap heavily — the merge is
        # genuinely additive, not disjoint appends)
        for i in range(3):
            sl = (docs.filter(F.col("doc_id") % 3 == i)
                  .select(F.explode(F.split("text", " ")).alias("token"))
                  .groupBy("token")
                  .agg(F.count("*").cast("bigint").alias("part"))
                  .crossJoin(F.broadcast(seeds))
                  .select("seed", bucket.alias("bucket"), "part"))
            store.write_batch(sl, i)
        grid = store.read(spark).select("seed", "bucket", "cell_cnt")
        exact = (docs.select(F.explode(F.split("text", " ")).alias("token"))
                 .groupBy("token")
                 .agg(F.count("*").cast("bigint").alias("exact_cnt")))
        top = (exact.orderBy(F.desc("exact_cnt"), F.asc("token"))
               .limit(CM_TOPK))
        probes = (top.crossJoin(F.broadcast(seeds))
                  .select("token", "exact_cnt", "seed",
                          bucket.alias("bucket")))
        out = (probes.join(F.broadcast(grid), ["seed", "bucket"])
               .groupBy("token", "exact_cnt")
               .agg(F.min("cell_cnt").cast("bigint").alias("cm_estimate"))
               .withColumn("overestimate",
                           (F.col("cm_estimate") - F.col("exact_cnt"))
                           .cast("bigint")))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cm_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.sketches  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["sketch_countmin_freq_audit"]


_OR["stream_countmin_maintenance"] = _cm_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming KMV maintenance with BOUNDED state: the bottom-k hash set
# per source kept current at ingest. KMV's merge law makes the state
# k-sized: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ B), so each commit
# unions the k stored hashes with the batch's distinct hashes and
# re-truncates — state never exceeds k rows per source no matter how
# many batches arrive (unlike a naive distinct-hash store that grows
# with cardinality). The drained sketch's estimate must hash-match the
# one-shot batch KMV oracle under the mod-3 slicing.
# ---------------------------------------------------------------------------

@query(
    "stream_kmv_maintenance",
    oracle=None,   # assigned below: identical to batch KMV audit
)
def stream_kmv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.sketches import (
        KMV_HEX, KMV_K, KMV_SPACE)

    events = load_table(spark, sf_dir, "events").select(
        F.lit("events_users").alias("source"),
        F.col("user_id").alias("k"))
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customers").alias("source"), F.col("c_custkey").alias("k"))
    union = events.union(cust).select(F.lit("union").alias("source"), "k")
    keyed = events.union(cust).union(union)
    hashed = keyed.select(
        "source",
        F.expr(f"cast(conv(substring(md5(cast(k as string)), 1, {KMV_HEX}),"
               " 16, 10) as bigint)").alias("h"), "k")
    d = tempfile.mkdtemp(prefix="kmv_store_gate_")
    wk = Window.partitionBy("source").orderBy("h")
    try:
        state = None    # the k-sized per-source bottom-k set
        for i in range(3):
            batch = (hashed.filter(F.col("k") % 3 == i)
                     .select("source", "h").distinct())
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.distinct()
                     .withColumn("rn", F.row_number().over(wk))
                     .filter(F.col("rn") <= KMV_K)
                     .select("source", "h"))
            # commit the k-sized state (the store IS the sketch)
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.groupBy("source").count().agg(
                F.max("count")).first()[0]
            if n > KMV_K:    # named, -O-proof invariant (ADVICE r9)
                raise RuntimeError(
                    f"stream_kmv_maintenance: per-source state grew to "
                    f"{n} rows > k={KMV_K}; the bounded-state fold must "
                    f"re-trim to the k smallest hashes every batch")
        kth = (state.groupBy("source")
               .agg(F.max("h").alias("h_k"),
                    F.count("*").cast("bigint").alias("n_kept")))
        exact = keyed.groupBy("source").agg(
            F.count_distinct("k").cast("bigint").alias("exact_distinct"))
        est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
            F.expr(f"div(({KMV_K} - 1) * cast({KMV_SPACE} as bigint), h_k)"))
        out = (exact.join(kth, "source")
               .select("source", "exact_distinct",
                       est.cast("bigint").alias("kmv_estimate"),
                       F.abs(est.cast("bigint") - F.col("exact_distinct"))
                        .cast("bigint").alias("abs_err")))
        # gate-harness materialization (temp state removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _kmv_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.sketches  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["sketch_kmv_distinct"]


_OR["stream_kmv_maintenance"] = _kmv_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming PCA-scatter maintenance: the scatter-matrix moment set
# (pairwise product sums, per-dim sums, row count) is ALGEBRAIC — each
# partial SUM-merges — so a stream can keep the d^2-row moment store
# current per commit at O(d^2) state regardless of how many vectors
# have flowed. The gate slices the corpus mod 3, folds each slice into
# the store (commit + reread, the replay-guard shape shared with the
# CM/KMV stores), then runs the SAME fixed power iteration on the
# DRAINED store — the principal component must hash-match the one-shot
# batch PCA oracle exactly. This is how an embedding-drift monitor
# maintains PC1 at ingest without ever re-scanning the corpus.
# ---------------------------------------------------------------------------

@query(
    "stream_pca_scatter_maintenance",
    oracle=None,   # assigned below: identical to the batch PCA oracle
)
def stream_pca_scatter_maintenance(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.operators.pca import (
        principal_component, quantized_vecs, scatter_moments)

    vecs = quantized_vecs(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="pca_store_gate_")
    try:
        state = None   # (kind, a, b, m) long-form moment store
        for i in range(3):
            batch = vecs.filter(F.col("vec_id") % 3 == i)
            pp, dimsum, tot = scatter_moments(batch)
            partial = (
                pp.select(F.lit("pp").alias("kind"), "a", "b",
                          F.col("spp").cast("decimal(38,0)").alias("m"))
                .unionByName(dimsum.select(
                    F.lit("dim").alias("kind"),
                    F.col("dim").alias("a"), F.lit(-1).alias("b"),
                    F.col("s").cast("decimal(38,0)").alias("m")))
                .unionByName(tot.select(
                    F.lit("n").alias("kind"), F.lit(-1).alias("a"),
                    F.lit(-1).alias("b"),
                    F.col("n").cast("decimal(38,0)").alias("m"))))
            merged = partial if state is None else \
                state.unionByName(partial)
            state = (merged.groupBy("kind", "a", "b")
                     .agg(F.sum("m").cast("decimal(38,0)").alias("m")))
            # commit the O(d^2) moment store; reread = the next batch
            # folds into the PERSISTED state, not a lineage chain
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n_rows = state.count()
            assert n_rows <= 64 * 64 + 64 + 1, f"store grew: {n_rows}"
        pp = (state.filter(F.col("kind") == "pp")
              .select("a", "b", F.col("m").alias("spp")))
        dimsum = (state.filter(F.col("kind") == "dim")
                  .select(F.col("a").alias("dim"),
                          F.col("m").cast("decimal(28,0)").alias("s")))
        tot = (state.filter(F.col("kind") == "n")
               .select(F.col("m").cast("bigint").alias("n")))
        out = principal_component(pp, dimsum, tot)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _pca_stream_oracle() -> str:
    from gmall_211027_flink_spark.operators.pca import _PCA_ORACLE
    return _PCA_ORACLE


_OR["stream_pca_scatter_maintenance"] = _pca_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming OLS maintenance: the two-factor regression's moment set
# (n, Σq, Σd, Σy, Σq², Σqd, Σd², Σqy, Σdy, Σy²) is algebraic — exact
# decimal partials SUM-merge — so the regression stays current at
# ingest with ONE ROW of state. The gate slices lineitem mod 3, folds
# each slice's moment row into the store (commit + reread), then
# solves from the drained store: betas/R² must hash-match the one-shot
# batch stats_ols_two_factor oracle. The online-model-monitor shape:
# refreshing a drift-watched regression costs O(batch), never a
# corpus rescan.
# ---------------------------------------------------------------------------

@query(
    "stream_ols_maintenance",
    oracle=None,   # assigned below: identical to the batch OLS oracle
)
def stream_ols_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import (
        OLS_MOMENTS, ols_moments, ols_solve)

    li = load_table(spark, sf_dir, "lineitem")
    d = tempfile.mkdtemp(prefix="ols_store_gate_")
    try:
        state = None   # single-row decimal moment store
        for i in range(3):
            part = ols_moments(li.filter(F.col("l_orderkey") % 3 == i))
            merged = part if state is None else \
                state.unionByName(part)
            state = merged.agg(*[
                F.sum(c).cast("decimal(38,4)").alias(c)
                for c in OLS_MOMENTS])
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n_rows = state.count()
            if n_rows != 1:    # named, -O-proof invariant (ADVICE r9)
                raise RuntimeError(
                    f"stream_ols_maintenance: moment store has "
                    f"{n_rows} rows, must stay exactly one")
        out = ols_solve(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ols_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_ols_two_factor"]


_OR["stream_ols_maintenance"] = _ols_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming HLL maintenance with CONSTANT state (r9): the 512-register
# table kept current at ingest. HLL's merge law is register-wise MAX —
# merge(A, B)[j] = max(A[j], B[j]) — so each commit maxes the stored
# registers with the batch's partial registers and state never exceeds
# m = 512 rows no matter how many batches (or how many distinct users)
# arrive. The drained register table's estimate must hash-match the
# one-shot batch sketch_hll_registers oracle under mod-3 user slicing
# (slices overlap in hash space, so the max-merge is genuinely doing
# work, not concatenating disjoint registers).
# ---------------------------------------------------------------------------

@query(
    "stream_hll_maintenance",
    oracle=None,   # assigned below: identical to the batch HLL audit
)
def stream_hll_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.sketches import (
        HLL_M, HLL_RHO_CAP, KMV_HEX)

    events = load_table(spark, sf_dir, "events").select("user_id")
    hashed = events.select(
        "user_id",
        F.expr(f"cast(conv(substring(md5(cast(user_id as string)), 1,"
               f" {KMV_HEX}), 16, 10) as bigint)").alias("h"))
    rho = hashed.select(
        "user_id",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("w")).select(
        "user_id", "bucket",
        F.when(F.col("w") == 0, F.lit(HLL_RHO_CAP))
        .otherwise(F.expr("bit_count((w & -w) - 1) + 1")).alias("r"))
    d = tempfile.mkdtemp(prefix="hll_store_gate_")
    try:
        state = None    # the m-row register table
        for i in range(3):
            batch = (rho.filter(F.col("user_id") % 3 == i)
                     .groupBy("bucket")
                     .agg(F.max("r").cast("bigint").alias("reg")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("bucket")
                     .agg(F.max("reg").cast("bigint").alias("reg")))
            # commit the m-sized state (the store IS the sketch)
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # constant-state invariant on the production query path —
            # a named error, NOT assert, so `python -O` can't strip it
            # (ADVICE r9)
            if n > HLL_M:
                raise RuntimeError(
                    f"stream_hll_maintenance: register state grew to "
                    f"{n} rows > m={HLL_M}; the max-merge fold must "
                    f"keep the state at one row per bucket")
        grid = spark.range(HLL_M).select(F.col("id").alias("bucket"))
        regs = (grid.join(state, "bucket", "left")
                .select("bucket", F.coalesce("reg", F.lit(0))
                        .cast("bigint").alias("reg")))
        zsum = regs.agg(
            F.sum(F.expr(f"shiftleft(cast(1 as bigint),"
                         f" {HLL_RHO_CAP} - cast(reg as int))"))
            .cast("bigint").alias("z_int"),
            F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
            .cast("bigint").alias("zero_regs"))
        exact = events.agg(F.count_distinct("user_id").cast("bigint")
                           .alias("exact_distinct"))
        alpha = 0.7213 / (1 + 1.079 / HLL_M)
        z = F.col("z_int").cast("double") / float(1 << HLL_RHO_CAP)
        out = (zsum.crossJoin(F.broadcast(exact))
               .select(F.lit(HLL_M).cast("bigint").alias("m"),
                       "exact_distinct", "zero_regs",
                       F.round(F.lit(alpha) * HLL_M * HLL_M / z, 6)
                       .alias("est_raw"),
                       F.round(F.when(F.col("zero_regs") > 0,
                                      HLL_M * F.log(F.lit(float(HLL_M))
                                                    / F.col("zero_regs"))),
                               6).alias("est_linear")))
        # gate-harness materialization (temp state removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _hll_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.sketches  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["sketch_hll_registers"]


_OR["stream_hll_maintenance"] = _hll_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Holt maintenance (r9): the level+trend fold kept current at
# ingest with ONE BIGINT of state. Unlike the sketch stores above
# (whose merge is order-free), Holt's recursion is ORDER-SENSITIVE, so
# the stream must deliver event-time-ordered slices — the harness
# commits three consecutive WEEK RANGES (not mod-N slices) and the
# accumulator carries (l, b) across commits; the drained state must
# hash-match the one-shot batch stats_holt_linear_smoothing oracle.
# This is the applyInPandasWithState monotone-event-time contract
# (streaming/state.py) exercised at the aggregate grain.
# ---------------------------------------------------------------------------

@query(
    "stream_holt_maintenance",
    oracle=None,   # assigned below: identical to the batch Holt oracle
)
def stream_holt_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import _HOLT_STEP

    orders = load_table(spark, sf_dir, "orders")
    wkly = (orders.groupBy(
        (F.datediff("o_orderdate", F.lit("1970-01-01"))
         .cast("bigint") / 7).cast("bigint").alias("wk"))
        .agg(F.count("*").cast("bigint").alias("y")))
    lo, hi = wkly.agg(F.min("wk"), F.max("wk")).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_holt_maintenance: orders table has no rows — the "
            "ordered time-range slicing needs a non-empty weekly series")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    step = _HOLT_STEP.format(D="div")
    d = tempfile.mkdtemp(prefix="holt_store_gate_")
    try:
        state = None   # one (n_weeks, acc) row
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            sl = wkly.filter((F.col("wk") >= a) & (F.col("wk") <= b))
            batch = (sl.agg(
                F.count("*").cast("bigint").alias("n_batch"),
                F.expr("sort_array(collect_list(struct(wk, y)))")
                .alias("series")))
            if state is None:
                folded = batch.select(
                    F.col("n_batch").alias("n_weeks"),
                    F.expr("aggregate(transform(series, s -> s.y),"
                           f" CAST(-1 AS BIGINT), (acc, y) -> {step})")
                    .alias("acc"))
            else:
                folded = (batch.crossJoin(F.broadcast(state))
                          .select(
                              (F.col("n_weeks") + F.col("n_batch"))
                              .alias("n_weeks"),
                              F.expr("aggregate(transform(series,"
                                     " s -> s.y), acc,"
                                     f" (acc, y) -> {step})").alias("acc")))
            # commit the single-row state (the store IS the model)
            folded.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n_rows = state.count()
            if n_rows != 1:    # named, -O-proof invariant (ADVICE r9)
                raise RuntimeError(
                    f"stream_holt_maintenance: level/trend store has "
                    f"{n_rows} rows, must stay exactly one packed "
                    f"BIGINT row")
        out_state = state.select(
            "n_weeks",
            F.expr("acc div 2147483648").alias("l6"),
            F.expr("acc % 2147483648 - 1073741824").alias("b6"))
        cols = [F.round(F.col("l6") / 1e6, 6).alias("level"),
                F.round(F.col("b6") / 1e6, 6).alias("trend")]
        for h in range(1, 5):
            cols.append(F.round((F.col("l6") + h * F.col("b6")) / 1e6, 6)
                        .alias(f"forecast_h{h}"))
        out = out_state.select("n_weeks", *cols)
        # gate-harness materialization (temp state removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _holt_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_holt_linear_smoothing"]


_OR["stream_holt_maintenance"] = _holt_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming CUSUM maintenance (r10): keep the change-point monitor's
# sufficient statistics current at ingest. Unlike Holt (one packed
# BIGINT, order-sensitive), CUSUM's state is the WEEKLY COUNT TABLE —
# bounded by the calendar grain, not the corpus — and its merge is
# plain additive (sum counts per week), so slices can arrive in any
# order. After the final commit the exact-integer argmax
# n*prefix_k - k*Sy is computed FROM THE STORE and must hash-match the
# one-shot batch stats_cusum_changepoint oracle.
# ---------------------------------------------------------------------------

@query(
    "stream_cusum_maintenance",
    oracle=None,   # assigned below: identical to the batch CUSUM oracle
)
def stream_cusum_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    wk_col = (F.datediff("o_orderdate", F.lit("1970-01-01"))
              .cast("bigint") / 7).cast("bigint")
    lo, hi = orders.agg(F.min(wk_col), F.max(wk_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_cusum_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_weeks_bound = hi - lo + 1
    d = tempfile.mkdtemp(prefix="cusum_store_gate_")
    try:
        state = None    # the bounded (wk, y) weekly-count table
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders.select(wk_col.alias("wk"))
                     .filter((F.col("wk") >= a) & (F.col("wk") <= b))
                     .groupBy("wk")
                     .agg(F.count("*").cast("bigint").alias("y")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("wk")
                     .agg(F.sum("y").cast("bigint").alias("y")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # bounded-grain invariant, named + -O-proof (ADVICE r9 rule)
            if n > n_weeks_bound:
                raise RuntimeError(
                    f"stream_cusum_maintenance: weekly store grew to "
                    f"{n} rows > calendar bound {n_weeks_bound}")
        # final readout from the drained store — the batch CUSUM math
        w = Window.orderBy("wk")
        idx = state.select(
            "wk", "y",
            F.row_number().over(w).cast("bigint").alias("t"),
            F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint").alias("pre"))
        tot = state.agg(F.count("*").cast("bigint").alias("n"),
                        F.sum("y").cast("bigint").alias("sy"))
        cus = (idx.crossJoin(F.broadcast(tot))
               .withColumn("cus_n", F.col("n") * F.col("pre")
                           - F.col("t") * F.col("sy")))
        best = cus.withColumn(
            "rk", F.row_number().over(
                Window.orderBy(F.abs("cus_n").desc(), "wk")))
        out = (best.filter(F.col("rk") == 1)
               .select(F.col("n").alias("n_weeks"),
                       F.col("wk").alias("change_wk"),
                       F.col("t").alias("change_t"),
                       F.col("cus_n").alias("cusum_scaled"),
                       (F.floor(F.abs("cus_n").cast("double") / F.col("n")
                                * F.lit(1000000.0) + F.lit(0.5))
                        .cast("bigint").cast("double")
                        / F.lit(1000000.0)).alias("cusum_abs")))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cusum_weekly_stream_oracle() -> str:
    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_cusum_weekly_exact"]


_OR["stream_cusum_maintenance"] = _cusum_weekly_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming PSI maintenance (r10): the drift monitor kept current at
# ingest — the natural streaming shape of quality_psi_drift. Batch 1
# (the reference window = the batch query's EARLY half) trains and
# COMMITS the per-type decile cuts; later batches fold only (type,
# bucket) counts into an additive store (order-free merge). The
# drained readout must hash-match the one-shot batch PSI oracle.
# State = |types| * (10 + cut rows) — constant in corpus size.
# ---------------------------------------------------------------------------

@query(
    "stream_psi_maintenance",
    oracle=None,   # assigned below: identical to the batch PSI oracle
)
def stream_psi_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.plans.behavior import PSI_DECILES

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(unix_micros(ts) as bigint)").alias("eus"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        .alias("cents"))
    lo, hi = ev.agg(F.min("eus"), F.max("eus")).first()
    if lo is None or hi is None:
        raise ValueError("stream_psi_maintenance: events table is empty")
    mid = (lo + hi) // 2
    late_cut = mid + (hi - mid) // 2     # split the LATE half in two
    d = tempfile.mkdtemp(prefix="psi_store_gate_")
    try:
        # batch 1: the reference window — train + commit the cuts
        early = ev.filter(F.col("eus") <= mid)
        cuts = (early.groupBy("event_type")
                .agg(F.expr(
                    "percentile(cents, array("
                    + ", ".join(str(p) for p in PSI_DECILES)
                    + "))").alias("c")))
        cuts.write.mode("overwrite").parquet(f"{d}/cuts")
        cuts = spark.read.parquet(f"{d}/cuts")
        b_expr = F.lit(1)
        for i in range(1, 10):
            b_expr = b_expr + F.expr(f"cast(cents > c[{i - 1}] as int)")

        def bucket_counts(df, half):
            return (df.join(F.broadcast(cuts), "event_type")
                    .select("event_type", b_expr.alias("b"))
                    .groupBy("event_type", "b")
                    .agg(F.count("*").cast("bigint").alias("n"))
                    .withColumn("half", F.lit(half)))

        state = bucket_counts(early, 0)
        state.write.mode("overwrite").parquet(f"{d}/state_0")
        state = spark.read.parquet(f"{d}/state_0")
        n_types = cuts.count()
        for i, (a, b) in enumerate(((mid + 1, late_cut),
                                    (late_cut + 1, hi)), start=1):
            batch = ev.filter((F.col("eus") >= a) & (F.col("eus") <= b))
            merged = state.unionByName(bucket_counts(batch, 1))
            state = (merged.groupBy("event_type", "b", "half")
                     .agg(F.sum("n").cast("bigint").alias("n")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            rows = state.count()
            if rows > n_types * 20:   # named, -O-proof invariant
                raise RuntimeError(
                    f"stream_psi_maintenance: store grew to {rows} rows"
                    f" > {n_types * 20} (types x buckets x halves)")
        # drained readout: the batch PSI math over the store
        spine = (cuts.select("event_type")
                 .crossJoin(spark.range(1, 11).select(
                     F.col("id").cast("int").alias("b"))))
        counts = (spine.join(state, ["event_type", "b"], "left")
                  .groupBy("event_type", "b")
                  .agg((F.coalesce(F.sum(F.when(F.col("half") == 0,
                                                F.col("n"))),
                                   F.lit(0)) + 1).cast("bigint")
                       .alias("c1"),
                       (F.coalesce(F.sum(F.when(F.col("half") == 1,
                                                F.col("n"))),
                                   F.lit(0)) + 1).cast("bigint")
                       .alias("c2")))
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
        out = (terms.groupBy("event_type")
               .agg(F.sum("tq").cast("bigint").alias("psi_q_1e9"))
               .select("event_type", "psi_q_1e9",
                       (F.col("psi_q_1e9").cast("double")
                        / F.lit(1000000000.0)).alias("psi"))
               .orderBy("event_type"))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _psi_stream_oracle() -> str:
    import gmall_211027_flink_spark.plans.behavior  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["quality_psi_drift"]


_OR["stream_psi_maintenance"] = _psi_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters (r11) — the DETERMINISTIC
# frequent-items store next to the probabilistic Count-Min
# (stream_countmin_maintenance): MG_K counters, guaranteed
# est <= true <= est + (decrements), no hashing, no collisions.  The
# state is the MERGEABLE-summaries form (Agarwal et al. 2012): per
# batch, add exact batch counts into the counter set, then compact by
# subtracting the (MG_K+1)-th largest count and dropping non-positive
# counters — at most MG_K rows survive by construction (bounded-state
# invariant, named error).  Ties at the compaction boundary drop
# together (value-based), so the fold is engine-deterministic; batch
# slices are calendar thirds, same cut arithmetic in both engines.
# Readout: surviving counters joined with the TRUE exact counts — the
# under-estimate column demonstrates (and the oracle verifies) the MG
# one-sided error.
# ---------------------------------------------------------------------------

MG_K = 8


def _mg_stream_oracle() -> str:
    def mg_round(src: str, out: str) -> str:
        return f"""
    r_{out} AS (
      SELECT user_id, c,
             row_number() OVER (ORDER BY c DESC, user_id) AS rk
      FROM {src}
    ),
    t_{out} AS (
      SELECT COALESCE(MAX(c), 0) AS t FROM r_{out} WHERE rk = {MG_K + 1}
    ),
    {out} AS MATERIALIZED (
      SELECT r.user_id, r.c - t.t AS c
      FROM r_{out} r, t_{out} t WHERE r.c > t.t
    )"""

    return f"""
    WITH ev AS (
      SELECT user_id,
             CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
      FROM events
    ),
    bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi,
             MIN(day) + (MAX(day) - MIN(day)) // 3 AS cut1,
             MIN(day) + 2 * ((MAX(day) - MIN(day)) // 3) AS cut2
      FROM ev
    ),
    b1 AS MATERIALIZED (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev, bounds WHERE day <= cut1 GROUP BY 1
    ),
    b2 AS MATERIALIZED (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev, bounds WHERE day > cut1 AND day <= cut2 GROUP BY 1
    ),
    b3 AS MATERIALIZED (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev, bounds WHERE day > cut2 GROUP BY 1
    ),
    {mg_round('b1', 's1')},
    m2 AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS c FROM (
        SELECT * FROM s1 UNION ALL SELECT * FROM b2) GROUP BY 1
    ),
    {mg_round('m2', 's2')},
    m3 AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS c FROM (
        SELECT * FROM s2 UNION ALL SELECT * FROM b3) GROUP BY 1
    ),
    {mg_round('m3', 's3')},
    truth AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM ev GROUP BY 1
    )
    SELECT s.user_id, CAST(s.c AS BIGINT) AS est_cnt, t.true_cnt,
           t.true_cnt - s.c AS underestimate
    FROM s3 s JOIN truth t USING (user_id)
    ORDER BY est_cnt DESC, user_id
    """


@query("stream_mg_heavy_hitters", oracle=_mg_stream_oracle())
def stream_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MG_K-counter Misra-Gries heavy-hitter store over 3 calendar
    batch slices, with the one-sided-error audit (see block comment)."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.catalog import load_table

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_micros(ts) div 86400000000").alias("day")))
    lo, hi = ev.agg(F.min("day"), F.max("day")).first()
    if lo is None:
        raise ValueError("stream_mg_heavy_hitters: events table empty")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * ((hi - lo) // 3)
    slices = ((lo, cut1), (cut1 + 1, cut2), (cut2 + 1, hi))
    d = tempfile.mkdtemp(prefix="mg_store_gate_")

    def compact(df):
        r = df.select(
            "user_id", "c",
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("user_id"))).alias("rk"))
        t = r.filter(F.col("rk") == MG_K + 1) \
            .agg(F.coalesce(F.max("c"), F.lit(0)).alias("t"))
        return (r.crossJoin(F.broadcast(t))
                .filter(F.col("c") > F.col("t"))
                .select("user_id", (F.col("c") - F.col("t")).alias("c")))

    try:
        state = None
        for i, (a, b) in enumerate(slices):
            batch = (ev.filter((F.col("day") >= a) & (F.col("day") <= b))
                     .groupBy("user_id")
                     .agg(F.count("*").cast("bigint").alias("c")))
            merged = batch if state is None else \
                (state.unionByName(batch).groupBy("user_id")
                 .agg(F.sum("c").cast("bigint").alias("c")))
            state = compact(merged)
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            if n > MG_K:      # bounded-state invariant, -O-proof
                raise RuntimeError(
                    f"stream_mg_heavy_hitters: {n} counters > MG_K "
                    f"{MG_K} — compaction failed")
        truth = ev.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("true_cnt"))
        out = (state.join(truth, "user_id")
               .select("user_id", F.col("c").alias("est_cnt"), "true_cnt",
                       (F.col("true_cnt") - F.col("c"))
                       .alias("underestimate"))
               .orderBy(F.desc("est_cnt"), F.asc("user_id")))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming AMS F2 maintenance (r11) — the tug-of-war sketch kept
# current at ingest: Z_j = sum_x s(x, j) * f_x is LINEAR in the counts,
# so the state is just the K = {AMS_K} Z values and the merge is plain
# addition (order-free, like the CUSUM weekly store).  After the final
# commit the drained readout recomputes the median-of-means estimate
# and the exact F2 and must hash-match the one-shot batch
# sketch_ams_f2 oracle.  Bounded-state invariant: exactly K rows.
# ---------------------------------------------------------------------------

def _ams_sign_expr():
    return ("(1 - 2 * (cast(conv(substring(md5(concat("
            "cast(user_id as string), '-', cast(j as string))), 1, 1),"
            " 16, 10) as bigint) % 2))")


@query("stream_ams_maintenance", oracle=None)  # assigned below
def stream_ams_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.sketches import AMS_K

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_micros(ts) div 86400000000").alias("day")))
    lo, hi = ev.agg(F.min("day"), F.max("day")).first()
    if lo is None:
        raise ValueError("stream_ams_maintenance: events table empty")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * ((hi - lo) // 3)
    slices = ((lo, cut1), (cut1 + 1, cut2), (cut2 + 1, hi))
    d = tempfile.mkdtemp(prefix="ams_store_gate_")
    try:
        state = None                  # (j, zj) — K rows, additive
        for i, (a, b) in enumerate(slices):
            f = (ev.filter((F.col("day") >= a) & (F.col("day") <= b))
                 .groupBy("user_id")
                 .agg(F.count("*").cast("bigint").alias("c")))
            batch = (f.select("user_id", "c",
                              F.explode(F.sequence(F.lit(0),
                                                   F.lit(AMS_K - 1)))
                              .alias("j"))
                     .groupBy("j")
                     .agg(F.sum(F.expr(_ams_sign_expr()) * F.col("c"))
                          .cast("bigint").alias("zj")))
            merged = batch if state is None else \
                (state.unionByName(batch).groupBy("j")
                 .agg(F.sum("zj").cast("bigint").alias("zj")))
            merged.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            if n > AMS_K:             # bounded-state invariant, -O-proof
                raise RuntimeError(
                    f"stream_ams_maintenance: {n} Z rows > K {AMS_K}")
        grp = (state.groupBy(F.expr("j div 4").alias("g"))
               .agg(F.sum(F.col("zj") * F.col("zj")).cast("bigint")
                    .alias("s4")))
        med = grp.select(
            "s4",
            F.row_number().over(Window.orderBy("s4", "g")).alias("rk"))
        est = med.agg(
            F.sum(F.when(F.col("rk").isin(2, 3), F.col("s4"))
                  .otherwise(0)).cast("bigint").alias("mom_x8"))
        truth = (ev.groupBy("user_id")
                 .agg(F.count("*").cast("bigint").alias("c"))
                 .agg(F.sum(F.col("c") * F.col("c")).cast("bigint")
                      .alias("f2")))
        out = (est.crossJoin(F.broadcast(truth))
               .select(F.col("f2").alias("f2_exact"), "mom_x8",
                       (F.floor(F.col("mom_x8").cast("double") / 8
                                / F.col("f2") * F.lit(1000000.0)
                                + F.lit(0.5))
                        .cast("bigint").cast("double")
                        / F.lit(1000000.0)).alias("est_over_exact")))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ams_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.sketches  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["sketch_ams_f2"]


_OR["stream_ams_maintenance"] = _ams_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Count-Sketch maintenance (r12): the signed 5x512 grid of
# sketch_count_sketch maintained at ingest.  Signed-cell merge is still
# plain cell-wise ADDITION (the sign rides inside the per-batch partial
# sum), so IncrementalAggStore's mergeable-sum contract covers it
# unchanged — per-commit work is O(d*w + batch vocabulary), never
# O(corpus vocabulary), and the drained grid equals the one-shot batch
# build under any slicing.  The read-time audit (top-20 exact counts vs
# median-of-rows signed estimates) must hash-match the batch
# sketch_count_sketch oracle verbatim.
# ---------------------------------------------------------------------------

@query(
    "stream_cs_maintenance",
    oracle=None,   # assigned below: identical to batch Count-Sketch audit
)
def stream_cs_maintenance(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.sketches import (
        CM_TOPK, CS_DEPTH, CS_WIDTH)
    from gmall_211027_flink_spark.streaming.incremental import (
        IncrementalAggStore)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = spark.range(CS_DEPTH).withColumnRenamed("id", "seed")
    bucket = F.expr(
        f"cast(conv(substring(md5(concat(cast(seed as string), ':',"
        f" token)), 1, 15), 16, 10) as bigint) % {CS_WIDTH}")
    sign = F.expr(
        f"1 - 2 * (cast(conv(substring(md5(concat(cast(seed as string),"
        f" ':', token)), 16, 1), 16, 10) as bigint) % 2)")
    d = tempfile.mkdtemp(prefix="cs_store_gate_")
    try:
        store = IncrementalAggStore(
            f"{d}/store", ["seed", "bucket"], {"cell_val": ("sum", "part")})
        # mod-3 crawl slices: per-batch partial grids overlap heavily,
        # so the merge is genuinely additive (not disjoint appends) and
        # sign cancellation happens ACROSS commits
        for i in range(3):
            sl = (docs.filter(F.col("doc_id") % 3 == i)
                  .select(F.explode(F.split("text", " ")).alias("token"))
                  .groupBy("token")
                  .agg(F.count("*").cast("bigint").alias("cnt"))
                  .crossJoin(F.broadcast(seeds))
                  .select("seed", bucket.alias("bucket"),
                          (sign * F.col("cnt")).cast("bigint")
                          .alias("part")))
            store.write_batch(sl, i)
        grid = store.read(spark).select("seed", "bucket", "cell_val")
        n_cells = grid.count()
        # constant-state invariant on the production query path — a
        # named error, NOT assert, so `python -O` can't strip it
        if n_cells > CS_DEPTH * CS_WIDTH:
            raise RuntimeError(
                f"stream_cs_maintenance: grid grew to {n_cells} cells "
                f"> d*w = {CS_DEPTH * CS_WIDTH}; the (seed, bucket) "
                f"additive fold must keep the state grid-sized")
        exact = (docs.select(F.explode(F.split("text", " ")).alias("token"))
                 .groupBy("token")
                 .agg(F.count("*").cast("bigint").alias("exact_cnt")))
        top = (exact.orderBy(F.desc("exact_cnt"), F.asc("token"))
               .limit(CM_TOPK))
        probes = (top.crossJoin(F.broadcast(seeds))
                  .select("token", "exact_cnt", "seed",
                          bucket.alias("bucket"), sign.alias("s")))
        est = (probes.join(F.broadcast(grid), ["seed", "bucket"])
               .select("token", "exact_cnt", "seed",
                       (F.col("s") * F.col("cell_val")).alias("est")))
        med = est.select(
            "token", "exact_cnt", "est",
            F.row_number().over(Window.partitionBy("token")
                                .orderBy("est", "seed")).alias("rk"))
        out = (med.filter(F.col("rk") == (CS_DEPTH + 1) // 2)
               .select("token", "exact_cnt",
                       F.col("est").cast("bigint").alias("cs_estimate"),
                       (F.col("est") - F.col("exact_cnt")).cast("bigint")
                       .alias("signed_err")))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cs_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.sketches  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["sketch_count_sketch"]


_OR["stream_cs_maintenance"] = _cs_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Holt-Winters seasonal maintenance (r12): the 9-field
# level+trend+season struct kept current at ingest.  Like the Holt
# store (and unlike the order-free sketch stores), the recurrence is
# ORDER-SENSITIVE, so the harness commits three consecutive DAY RANGES
# of the dense spine and the accumulator struct carries across commits
# — the same aggregate() merge-lambda text as the batch query
# (operators/aggregates.py _hw_spark_exprs), so the drained readout
# must hash-match the batch stats_holtwinters_seasonal oracle exactly.
# State = ONE parquet row (n_days + the struct); a named invariant
# fails if the store ever grows.
# ---------------------------------------------------------------------------

@query(
    "stream_holtwinters_maintenance",
    oracle=None,   # assigned below: identical to the batch HW oracle
)
def stream_holtwinters_maintenance(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.operators.aggregates import (
        _hw_day_spine, _hw_readout, _hw_spark_exprs)

    spine = _hw_day_spine(spark, sf_dir)
    lo, hi = spine.agg(F.min("d"), F.max("d")).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_holtwinters_maintenance: orders table has no rows — "
            "the ordered day-range slicing needs a non-empty spine")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    init, merge = _hw_spark_exprs()
    d = tempfile.mkdtemp(prefix="hw_store_gate_")
    try:
        state = None   # one (n_days, acc-struct) row
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            sl = spine.filter((F.col("d") >= a) & (F.col("d") <= b))
            batch = (sl.agg(
                F.count("*").cast("bigint").alias("n_batch"),
                F.expr("sort_array(collect_list(struct(d, y)))")
                .alias("series")))
            if state is None:
                folded = batch.select(
                    F.col("n_batch").alias("n_days"),
                    F.expr(f"aggregate(series, {init}, {merge})")
                    .alias("acc"))
            else:
                folded = (batch.crossJoin(F.broadcast(state))
                          .select(
                              (F.col("n_days") + F.col("n_batch"))
                              .alias("n_days"),
                              F.expr(f"aggregate(series, acc, {merge})")
                              .alias("acc")))
            # commit the single-row state (the store IS the model)
            folded.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n_rows = state.count()
            if n_rows != 1:    # named, -O-proof invariant
                raise RuntimeError(
                    f"stream_holtwinters_maintenance: state store has "
                    f"{n_rows} rows, must stay exactly one struct row")
        out = _hw_readout(state)
        # gate-harness materialization (temp state removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _hw_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_holtwinters_seasonal"]


_OR["stream_holtwinters_maintenance"] = _hw_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Page-Hinkley maintenance (r12): the drift monitor's state
# kept current at ingest.  Like CUSUM (above), the sufficient state is
# the WEEKLY COUNT TABLE — bounded by the calendar, additive under any
# slicing — so commits merge per-week partial counts and the
# PH statistic (running mean fold, m_t cumulative, running-min gap) is
# computed FROM THE STORE at read time; it must hash-match the batch
# stats_page_hinkley oracle verbatim.
# ---------------------------------------------------------------------------

@query(
    "stream_ph_maintenance",
    oracle=None,   # assigned below: identical to the batch PH oracle
)
def stream_ph_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import (
        PH_DELTA6, PH_LAMBDA6)

    orders = load_table(spark, sf_dir, "orders")
    wk_col = (F.datediff("o_orderdate", F.lit("1970-01-01"))
              .cast("bigint") / 7).cast("bigint")
    lo, hi = orders.agg(F.min(wk_col), F.max(wk_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_ph_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_weeks_bound = hi - lo + 1
    d = tempfile.mkdtemp(prefix="ph_store_gate_")
    try:
        state = None    # the bounded (wk, y) weekly-count table
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders.select(wk_col.alias("wk"))
                     .filter((F.col("wk") >= a) & (F.col("wk") <= b))
                     .groupBy("wk")
                     .agg(F.count("*").cast("bigint").alias("y")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("wk")
                     .agg(F.sum("y").cast("bigint").alias("y")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # bounded-grain invariant, named + -O-proof
            if n > n_weeks_bound:
                raise RuntimeError(
                    f"stream_ph_maintenance: weekly store grew to "
                    f"{n} rows > calendar bound {n_weeks_bound}")
        # final readout from the drained store — the batch PH math
        w = Window.orderBy("wk")
        wrun = w.rowsBetween(Window.unboundedPreceding, 0)
        idx = state.select(
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
            F.row_number().over(
                Window.orderBy(F.desc("ph_t"), F.asc("t"))).alias("rnk"))
        n_df = state.agg(F.count("*").cast("bigint").alias("n_weeks"))
        out = (best.filter(F.col("rnk") == 1)
               .crossJoin(F.broadcast(n_df))
               .select("n_weeks",
                       F.col("t").alias("fired_t"),
                       F.col("wk").alias("fired_wk"),
                       F.col("ph_t").alias("ph_x1e6"),
                       (F.floor(F.col("ph_t").cast("double") / 1000000
                                * F.lit(1000000.0) + F.lit(0.5))
                        .cast("bigint").cast("double")
                        / F.lit(1000000.0)).alias("ph_stat"),
                       (F.col("ph_t") > PH_LAMBDA6).alias("drift_fired")))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ph_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_page_hinkley"]


_OR["stream_ph_maintenance"] = _ph_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Theil's-U maintenance (r12): the forecast-quality monitor
# kept current at ingest.  Sufficient state = the DAILY COUNT TABLE
# (calendar-bounded, additive under any slicing — the CUSUM/PH store
# at day grain); at read time the dense spine is rebuilt from the
# store's own min/max (gap days = 0) and the lag-1 / lag-7 error sums
# must hash-match the batch stats_theils_u oracle verbatim.
# ---------------------------------------------------------------------------

@query(
    "stream_theil_maintenance",
    oracle=None,   # assigned below: identical to the batch Theil oracle
)
def stream_theil_maintenance(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    d = tempfile.mkdtemp(prefix="theil_store_gate_")
    try:
        # the additive (d, y) daily-count store — since r14 built by
        # the ONE shared builder the Cox-Stuart / Mood twins also use
        state = _drained_daily_count_store(
            spark, sf_dir, "stream_theil_maintenance", d)
        # readout from the drained store — the batch Theil's-U math
        # over the dense spine rebuilt from the store's own bounds
        days = (state.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
                .select(F.explode(F.sequence("lo", "hi")).alias("d")))
        spine = (days.join(state, "d", "left")
                 .select("d", F.coalesce("y", F.lit(0)).cast("bigint")
                         .alias("y")))
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
        out = agg.select(
            "n_scored", "sse_naive", "sse_seasonal",
            (F.floor(F.sqrt(F.col("sse_seasonal").cast("double")
                            / F.col("sse_naive").cast("double"))
                     * F.lit(1000000.0) + F.lit(0.5))
             .cast("bigint").cast("double") / F.lit(1000000.0))
            .alias("u2_seasonal_vs_naive"))
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _theil_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.aggregates  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_theils_u"]


_OR["stream_theil_maintenance"] = _theil_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming seasonal Mann-Kendall maintenance (r13): the monotone-
# trend monitor kept current at ingest.  Sufficient state = the
# (wk, dow) COUNT GRID (calendar-bounded — one cell per calendar day —
# and additive under ANY slicing of the input, the stream_theil day-
# store at week x weekday grain); at read time the stratified pair
# counts, tie correction and continuity-corrected z must hash-match
# the batch stats_seasonal_mann_kendall oracle verbatim.  The dow here
# is the pure-integer (epoch_day + 4) % 7 — a bijection of the batch
# side's dayofweek-1, so the stratification (all that matters; dw
# never reaches the output) is identical.
# ---------------------------------------------------------------------------

@query(
    "stream_mk_maintenance",
    oracle=None,   # assigned below: identical to the batch seasonal-MK
)
def stream_mk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_mk_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_cells_bound = hi - lo + 1       # one (wk, dow) cell per day
    d = tempfile.mkdtemp(prefix="mk_store_gate_")
    try:
        state = None    # the bounded (wk, dw, y) weekly-grain grid
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders.select(d_col.alias("dd"))
                     .filter((F.col("dd") >= a) & (F.col("dd") <= b))
                     .groupBy(F.floor(F.col("dd") / 7).cast("bigint")
                              .alias("wk"),
                              ((F.col("dd") + 4) % 7).alias("dw"))
                     .agg(F.count("*").cast("bigint").alias("y")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("wk", "dw")
                     .agg(F.sum("y").cast("bigint").alias("y")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # bounded-grain invariant, named + -O-proof
            if n > n_cells_bound:
                raise RuntimeError(
                    f"stream_mk_maintenance: (wk, dow) store grew to "
                    f"{n} rows > calendar bound {n_cells_bound}")
        # readout from the drained store: the SAME readout callable the
        # batch query uses (operators/inference.py seasonal_mk_readout)
        # over the store's own grid — the hash-equality against the
        # shared oracle is structural, not maintained by hand
        from gmall_211027_flink_spark.operators.inference import (
            seasonal_mk_readout)
        out = seasonal_mk_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _mk_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_seasonal_mann_kendall"]


_OR["stream_mk_maintenance"] = _mk_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Durbin maintenance (r14): the BIBD weekday-effect test
# kept current at ingest.  Sufficient state = the (wk, dow) REVENUE-
# CENTS GRID (calendar-bounded — one cell per calendar day — and
# additive under ANY slicing of the input: cents sum per day is a
# plain SUM, the stream_mk count grid with a money measure); at read
# time the per-residue-class week selection, Fano subset, within-week
# midranks and Conover T1 must hash-match the batch stats_durbin
# oracle verbatim.  The drain goes through the SAME readout callable
# the batch query uses (operators/inference.py durbin_readout), so
# the equality is structural (the seasonal_mk_readout device).
# Since r15 the (wk, dw, cents) store is built by the ONE shared
# builder the Kendall's-W twin also drains — the
# _drained_daily_count_store discipline at weekly-cents grain.
# ---------------------------------------------------------------------------

def _drained_weekly_cents_store(spark: SparkSession, sf_dir: str,
                                label: str, tmp_dir: str) -> DataFrame:
    """Build the additive (wk, dw, cents) weekly-grain revenue grid
    from three input slices with parquet persistence per merge (the
    stream_theil pattern), returning the drained bounded grid.  One
    cell per calendar day with orders; cents is a plain SUM, additive
    under any slicing."""
    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(f"{label}: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_cells_bound = hi - lo + 1       # one (wk, dow) cell per day
    state = None
    for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                (cut2 + 1, hi))):
        batch = (orders
                 .select(d_col.alias("dd"), "o_totalprice")
                 .filter((F.col("dd") >= a) & (F.col("dd") <= b))
                 .groupBy(F.floor(F.col("dd") / 7).cast("bigint")
                          .alias("wk"),
                          ((F.col("dd") + 4) % 7).alias("dw"))
                 .agg((F.sum(F.col("o_totalprice")
                             .cast("decimal(18,2)")) * 100)
                      .cast("decimal(38,0)").cast("bigint")
                      .alias("cents")))
        merged = batch if state is None else state.unionByName(batch)
        state = (merged.groupBy("wk", "dw")
                 .agg(F.sum("cents").cast("bigint").alias("cents")))
        state.write.mode("overwrite").parquet(f"{tmp_dir}/state_{i}")
        state = spark.read.parquet(f"{tmp_dir}/state_{i}")
        n = state.count()
        # bounded-grain invariant, named + -O-proof
        if n > n_cells_bound:
            raise RuntimeError(
                f"{label}: (wk, dow) store grew to {n} rows > "
                f"calendar bound {n_cells_bound}")
    return state


@query(
    "stream_durbin_maintenance",
    oracle=None,   # assigned below: identical to the batch Durbin
)
def stream_durbin_maintenance(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="durbin_store_gate_")
    try:
        state = _drained_weekly_cents_store(
            spark, sf_dir, "stream_durbin_maintenance", d)
        # readout from the drained store: the SAME readout callable the
        # batch query uses (operators/inference.py durbin_readout)
        from gmall_211027_flink_spark.operators.inference import (
            durbin_readout)
        out = durbin_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _durbin_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_durbin"]


_OR["stream_durbin_maintenance"] = _durbin_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Cochran's-Q maintenance (r14): the seasonal ordering-
# propensity test kept current at ingest.  Sufficient state = the
# DISTINCT (custkey, quarter-of-year) INCIDENCE SET — binary incidence
# is idempotent under set-union, so the store merges any slicing of
# the input by union + distinct and never exceeds k = 4 rows per
# customer (the invariant below asserts store <= 4 x distinct
# customers — customer-grain, the minimal sufficient statistic: a
# Flink ValueState<boolean[4]> per customer would hold the same).  At
# scale the store is hash-partitioned by custkey and each merge is a
# co-partitioned distinct.  The drain goes through the SAME readout
# callable the batch query uses (operators/inference.py
# cochran_readout), so the oracle hash-equality is structural.
# ---------------------------------------------------------------------------

@query(
    "stream_cochran_maintenance",
    oracle=None,   # assigned below: identical to the batch Cochran Q
)
def stream_cochran_maintenance(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_cochran_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    d = tempfile.mkdtemp(prefix="cochran_store_gate_")
    try:
        state = None    # the distinct (o_custkey, qoy) incidence set
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders
                     .filter((d_col >= a) & (d_col <= b))
                     .select(
                         "o_custkey",
                         (F.floor((F.month("o_orderdate") - 1) / 3)
                          .cast("bigint") + 1).alias("qoy"))
                     .distinct())
            merged = batch if state is None else state.unionByName(batch)
            state = merged.distinct()
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            n_cust = state.select("o_custkey").distinct().count()
            # per-customer incidence bound, named + -O-proof
            from gmall_211027_flink_spark.operators.inference import (
                COCHRAN_Q_K)
            if n > COCHRAN_Q_K * n_cust:
                raise RuntimeError(
                    f"stream_cochran_maintenance: incidence store grew "
                    f"to {n} rows > {COCHRAN_Q_K} x {n_cust} customers")
        # readout from the drained store: the SAME readout callable the
        # batch query uses (operators/inference.py cochran_readout)
        from gmall_211027_flink_spark.operators.inference import (
            cochran_readout)
        out = cochran_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cochran_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_cochran_q"]


_OR["stream_cochran_maintenance"] = _cochran_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming Cox-Stuart + Mood's-median maintenance (r14 second wave):
# both tests read the SAME sufficient state the Theil store already
# maintains — the DAILY COUNT TABLE (calendar-bounded, additive under
# any slicing) — so these twins complete the day-grain family's
# streaming line (MK, Theil, Durbin, Cochran, Cox-Stuart, Mood all
# have maintenance twins now).  Each drain goes through the batch
# readout callable (cox_stuart_readout / mood_median_readout), so the
# oracle hash-equality is structural.  One shared store-builder keeps
# the 3-slice merge + bounded-grain invariant in ONE place.
# ---------------------------------------------------------------------------

def _drained_daily_count_store(spark: SparkSession, sf_dir: str,
                               label: str, tmp_dir: str) -> DataFrame:
    """Build the additive (d, y) daily-count store from three input
    slices with parquet persistence per merge (the stream_theil
    pattern), returning the drained bounded grid."""
    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(f"{label}: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_days_bound = hi - lo + 1
    state = None
    for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                (cut2 + 1, hi))):
        batch = (orders.select(d_col.alias("d"))
                 .filter((F.col("d") >= a) & (F.col("d") <= b))
                 .groupBy("d")
                 .agg(F.count("*").cast("bigint").alias("y")))
        merged = batch if state is None else state.unionByName(batch)
        state = (merged.groupBy("d")
                 .agg(F.sum("y").cast("bigint").alias("y")))
        state.write.mode("overwrite").parquet(f"{tmp_dir}/state_{i}")
        state = spark.read.parquet(f"{tmp_dir}/state_{i}")
        n = state.count()
        # bounded-grain invariant, named + -O-proof
        if n > n_days_bound:
            raise RuntimeError(
                f"{label}: daily store grew to {n} rows > calendar "
                f"bound {n_days_bound}")
    return state


@query(
    "stream_cox_stuart_maintenance",
    oracle=None,   # assigned below: identical to the batch Cox-Stuart
)
def stream_cox_stuart_maintenance(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="coxstuart_store_gate_")
    try:
        state = _drained_daily_count_store(
            spark, sf_dir, "stream_cox_stuart_maintenance", d)
        from gmall_211027_flink_spark.operators.inference import (
            cox_stuart_readout)
        out = cox_stuart_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cox_stuart_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_cox_stuart"]


_OR["stream_cox_stuart_maintenance"] = _cox_stuart_stream_oracle()


@query(
    "stream_mood_maintenance",
    oracle=None,   # assigned below: identical to the batch Mood median
)
def stream_mood_maintenance(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="mood_store_gate_")
    try:
        state = _drained_daily_count_store(
            spark, sf_dir, "stream_mood_maintenance", d)
        from gmall_211027_flink_spark.operators.inference import (
            mood_median_readout)
        out = mood_median_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _mood_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_mood_median"]


_OR["stream_mood_maintenance"] = _mood_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming rank-stats maintenance (r15): Ansari-Bradley, Kendall's W
# and Hoeffding's D kept current at ingest — the r12 rank-stats family
# joins the maintenance line, settling the VERDICT r14 question of
# whether joint/bivariate-rank statistics admit O(batch) stores.  They
# do, because every one of these batch stats is GRID-FIRST: the only
# corpus-sized pass is a groupBy to a bounded calendar grid whose
# measures are plain counts / cents sums (additive under any slicing);
# the rank machinery — pooled midranks, within-week midranks, joint
# bivariate ranks — is recomputed at READ time on the drained bounded
# grid, never maintained incrementally.  Sufficient state per twin:
#   Ansari-Bradley : the (d, y) daily-count table — the EXACT store
#                    _drained_daily_count_store already maintains for
#                    Theil/Cox-Stuart/Mood (one store, four readouts);
#   Kendall's W    : the (wk, dw, cents) weekly-cents grid — the EXACT
#                    store the Durbin twin maintains
#                    (_drained_weekly_cents_store, shared since r15);
#   Hoeffding's D  : the (wk, x, y) weekly grid with BOTH measures
#                    (x = order count, y = revenue cents), additive
#                    component-wise.
# Each drain goes through the SAME readout callable its batch twin
# uses (ansari_bradley_readout / kendalls_w_readout /
# hoeffding_readout), so the oracle hash-equality is structural.
# What does NOT admit such a store: a rank stat over a grid keyed by
# an UNBOUNDED data dimension with a non-additive measure (e.g.
# per-order medians) — see SCALE.md §20 for the boundary statement.
# ---------------------------------------------------------------------------

@query(
    "stream_ansari_maintenance",
    oracle=None,   # assigned below: identical to the batch Ansari
)
def stream_ansari_maintenance(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="ansari_store_gate_")
    try:
        state = _drained_daily_count_store(
            spark, sf_dir, "stream_ansari_maintenance", d)
        from gmall_211027_flink_spark.operators.inference import (
            ansari_bradley_readout)
        out = ansari_bradley_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ansari_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_ansari_bradley"]


_OR["stream_ansari_maintenance"] = _ansari_stream_oracle()


@query(
    "stream_kendalls_w_maintenance",
    oracle=None,   # assigned below: identical to the batch Kendall W
)
def stream_kendalls_w_maintenance(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="kendallsw_store_gate_")
    try:
        state = _drained_weekly_cents_store(
            spark, sf_dir, "stream_kendalls_w_maintenance", d)
        from gmall_211027_flink_spark.operators.inference import (
            kendalls_w_readout)
        out = kendalls_w_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _kendalls_w_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_kendalls_w"]


_OR["stream_kendalls_w_maintenance"] = _kendalls_w_stream_oracle()


@query(
    "stream_hoeffding_maintenance",
    oracle=None,   # assigned below: identical to the batch Hoeffding
)
def stream_hoeffding_maintenance(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_hoeffding_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_weeks_bound = (hi - lo) // 7 + 2   # calendar weeks spanned
    d = tempfile.mkdtemp(prefix="hoeffding_store_gate_")
    try:
        state = None    # the bounded (wk, x, y) two-measure week grid
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders
                     .select(d_col.alias("dd"), "o_totalprice")
                     .filter((F.col("dd") >= a) & (F.col("dd") <= b))
                     .groupBy(F.floor(F.col("dd") / 7).cast("bigint")
                              .alias("wk"))
                     .agg(F.count("*").cast("bigint").alias("x"),
                          (F.sum(F.col("o_totalprice")
                                 .cast("decimal(18,2)")) * 100)
                          .cast("decimal(38,0)").cast("bigint")
                          .alias("y")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("wk")
                     .agg(F.sum("x").cast("bigint").alias("x"),
                          F.sum("y").cast("bigint").alias("y")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # bounded-grain invariant, named + -O-proof
            if n > n_weeks_bound:
                raise RuntimeError(
                    f"stream_hoeffding_maintenance: week store grew "
                    f"to {n} rows > calendar bound {n_weeks_bound}")
        # readout from the drained store: the SAME readout callable the
        # batch query uses (operators/inference.py hoeffding_readout)
        from gmall_211027_flink_spark.operators.inference import (
            hoeffding_readout)
        out = hoeffding_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _hoeffding_stream_oracle() -> str:
    import gmall_211027_flink_spark.operators.inference  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["stats_hoeffding_d"]


_OR["stream_hoeffding_maintenance"] = _hoeffding_stream_oracle()


# ---------------------------------------------------------------------------
# Streaming RFM maintenance (r15): the CRM segmentation grid kept
# current at ingest — the SECOND customer-grain store, proving the
# shape stream_cochran_maintenance opened generalizes beyond one
# query (VERDICT r14 item 6).  Sufficient state = one row per
# customer holding (last_order, frequency, monetary): every component
# is mergeable (MAX is idempotent/monotone, COUNT and the decimal SUM
# are additive), so the store merges any slicing of the input by a
# co-partitioned groupBy and never exceeds one row per customer (the
# invariant below asserts store <= the customer-dim cardinality — a
# Flink ValueState<(date, long, decimal)> per custkey would hold the
# same).  At scale the store is hash-partitioned by o_custkey and
# each merge is a co-partitioned aggregate; the quartile scoring
# lives ONLY in the readout (ntile needs the full customer
# population, which is exactly what the drained store is).  The drain
# goes through the SAME readout callable the batch query uses
# (plans/behavior.py rfm_readout), so the oracle hash-equality is
# structural.
# ---------------------------------------------------------------------------

@query(
    "stream_rfm_maintenance",
    oracle=None,   # assigned below: identical to the batch RFM
)
def stream_rfm_maintenance(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d_col = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    lo, hi = orders.agg(F.min(d_col), F.max(d_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            "stream_rfm_maintenance: orders table has no rows")
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    n_cust_bound = load_table(spark, sf_dir, "customer").count()
    d = tempfile.mkdtemp(prefix="rfm_store_gate_")
    try:
        state = None    # one (last_order, frequency, monetary)/customer
        for i, (a, b) in enumerate(((lo, cut1), (cut1 + 1, cut2),
                                    (cut2 + 1, hi))):
            batch = (orders
                     .filter((d_col >= a) & (d_col <= b))
                     .groupBy("o_custkey")
                     .agg(F.max("o_orderdate").alias("last_order"),
                          F.count("*").cast("bigint").alias("frequency"),
                          F.sum(F.col("o_totalprice")
                                .cast("decimal(18,2)"))
                          .cast("decimal(38,2)").alias("monetary")))
            merged = batch if state is None else state.unionByName(batch)
            state = (merged.groupBy("o_custkey")
                     .agg(F.max("last_order").alias("last_order"),
                          F.sum("frequency").cast("bigint")
                          .alias("frequency"),
                          F.sum("monetary").cast("decimal(38,2)")
                          .alias("monetary")))
            state.write.mode("overwrite").parquet(f"{d}/state_{i}")
            state = spark.read.parquet(f"{d}/state_{i}")
            n = state.count()
            # customer-grain invariant, named + -O-proof
            if n > n_cust_bound:
                raise RuntimeError(
                    f"stream_rfm_maintenance: customer store grew to "
                    f"{n} rows > customer-dim bound {n_cust_bound}")
        # readout from the drained store: the SAME readout callable the
        # batch query uses (plans/behavior.py rfm_readout)
        from gmall_211027_flink_spark.plans.behavior import rfm_readout
        out = rfm_readout(state)
        # gate-harness materialization (temp store removed in finally)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _rfm_stream_oracle() -> str:
    import gmall_211027_flink_spark.plans.behavior  # noqa: F401

    from gmall_211027_flink_spark.registry import ORACLES
    return ORACLES["ads_rfm_segmentation"]


_OR["stream_rfm_maintenance"] = _rfm_stream_oracle()
