"""As-of join — for each left event, the nearest *prior* right event on
the same key (the time-series join Spark lacks natively; SURVEY notes the
reference has only the ±5 s interval join, DataStreamJoinTest.java:48-56,
so this generalizes J5).

Two implementations with identical semantics (strictly-before match,
(ts, event_id) total order):

- **window carry-forward** (default): union both sides, one window pass
  per key with ``last(..., ignorenulls)`` — a single shuffle on the key,
  fully JVM-side; the plan every engine would pick at scale.
- **applyInPandas + merge_asof**: the grouped-map form — demonstrates
  the Arrow-batched per-group escape hatch for semantics the window form
  can't express (nearest-within-tolerance both directions, multiple
  tolerance columns). Same shuffle shape (groupBy key), Python per group.

Registered query: each 'purchase' event matched to the user's most
recent strictly-earlier 'view' event.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.registry import query

_ASOF_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type, ts,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER w AS prior_view_id,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS prior_view_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS purchase_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       prior_view_id,
       CAST(epoch_us(ts) - prior_view_us AS BIGINT) AS view_to_buy_us
FROM seq
WHERE event_type = 'purchase'
"""


@query("asof_join_window", bench=True, oracle=_ASOF_ORACLE)
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_us = F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    seq = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.last(view_id, ignorenulls=True).over(w).alias("prior_view_id"),
        F.last(view_us, ignorenulls=True).over(w).alias("prior_view_us"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "prior_view_id",
            (F.unix_micros("ts") - F.col("prior_view_us")).cast("bigint")
                .alias("view_to_buy_us"),
        )
    )


_ASOF_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("purchase_id", T.LongType()),
    T.StructField("purchase_ts", T.StringType()),
    T.StructField("prior_view_id", T.LongType()),
    T.StructField("view_to_buy_us", T.LongType()),
])


@query("asof_join_pandas", oracle=_ASOF_ORACLE)
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via grouped-map ``pd.merge_asof`` per user."""
    ev = load_table(spark, sf_dir, "events")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        left = pdf[pdf["event_type"] == "purchase"]
        right = pdf[pdf["event_type"] == "view"]
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in _ASOF_SCHEMA.fields])
        # merge_asof consumes the `on` column — carry the view ts along
        # under its own name so the gap survives the merge
        right = right[["ts", "event_id"]].rename(
            columns={"event_id": "view_event_id"})
        right["view_ts"] = right["ts"]
        merged = pd.merge_asof(
            left, right, on="ts", direction="backward",
            allow_exact_matches=False)
        # exact integer µs via int64 ns (normalize the unit first: Arrow
        # hands pandas datetime64[us] or [ns] depending on version); NaT
        # rows (no prior view) stay NA through the masked assignment
        mask = merged["view_ts"].notna()
        gap_us = pd.Series(pd.NA, index=merged.index, dtype="Int64")
        if mask.any():
            ts_ns = merged.loc[mask, "ts"].astype("datetime64[ns]").astype("int64")
            view_ns = merged.loc[mask, "view_ts"].astype("datetime64[ns]").astype("int64")
            gap_us[mask] = (ts_ns - view_ns) // 1000
        out = pd.DataFrame({
            "user_id": merged["user_id"].astype("int64"),
            "purchase_id": merged["event_id"].astype("int64"),
            "purchase_ts": merged["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "prior_view_id": merged["view_event_id"].astype("Int64"),
            "view_to_buy_us": gap_us,
        })
        return out

    return ev.groupBy("user_id").applyInPandas(per_user, _ASOF_SCHEMA)


# ---------------------------------------------------------------------------
# FORWARD as-of join (merge_asof direction='forward'): for each
# purchase, the user's NEXT strictly-later error event within a
# tolerance — "did this purchase precede a failure?" — the mirror of
# the backward carry: FIRST_VALUE over the FOLLOWING frame, same single
# key shuffle, fully JVM-side.
# ---------------------------------------------------------------------------

ASOF_FWD_TOLERANCE_US = 24 * 3600 * 1_000_000    # 1 day


@query(
    "asof_join_forward",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             FIRST_VALUE(CASE WHEN event_type = 'error' THEN event_id END
                         IGNORE NULLS) OVER w AS next_error_id,
             FIRST_VALUE(CASE WHEN event_type = 'error' THEN epoch_us(ts)
                         END IGNORE NULLS) OVER w AS next_error_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id AS purchase_id,
           CASE WHEN next_error_us - epoch_us(ts)
                     <= {ASOF_FWD_TOLERANCE_US}
                THEN next_error_id END AS next_error_id,
           CASE WHEN next_error_us - epoch_us(ts)
                     <= {ASOF_FWD_TOLERANCE_US}
                THEN CAST(next_error_us - epoch_us(ts) AS BIGINT)
                END AS buy_to_error_us
    FROM seq
    WHERE event_type = 'purchase'
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(1, Window.unboundedFollowing))
    err_id = F.when(F.col("event_type") == "error", F.col("event_id"))
    err_us = F.when(F.col("event_type") == "error", F.unix_micros("ts"))
    seq = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.first(err_id, ignorenulls=True).over(w).alias("next_error_id"),
        F.first(err_us, ignorenulls=True).over(w).alias("next_error_us"))
    gap = F.col("next_error_us") - F.unix_micros("ts")
    within = gap <= ASOF_FWD_TOLERANCE_US
    return (seq.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    F.when(within, F.col("next_error_id"))
                     .alias("next_error_id"),
                    F.when(within, gap).cast("bigint")
                     .alias("buy_to_error_us")))


# ---------------------------------------------------------------------------
# Conversion-latency distribution: quantiles of the view→purchase gap
# the as-of join above computes — "how long before a view converts" is
# the number the attribution window (ATTR_WINDOW_S) should be tuned
# from, closing the loop between the two operators. Interpolated
# percentile over exact BIGINT microsecond gaps.
# ---------------------------------------------------------------------------

@query(
    "ads_conversion_latency_quantiles",
    oracle=f"""
    WITH conv AS ({_ASOF_ORACLE}),
    g AS (SELECT view_to_buy_us FROM conv WHERE view_to_buy_us IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           round(quantile_cont(view_to_buy_us, 0.25), 6) AS p25_us,
           round(quantile_cont(view_to_buy_us, 0.5), 6) AS p50_us,
           round(quantile_cont(view_to_buy_us, 0.75), 6) AS p75_us,
           round(quantile_cont(view_to_buy_us, 0.9), 6) AS p90_us
    FROM g
    """,
)
def ads_conversion_latency_quantiles(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    gaps = (asof_join_window(spark, sf_dir)
            .filter(F.col("view_to_buy_us").isNotNull()))
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_conversions"),
        F.round(F.expr("percentile(view_to_buy_us, 0.25)"), 6)
         .alias("p25_us"),
        F.round(F.expr("percentile(view_to_buy_us, 0.5)"), 6)
         .alias("p50_us"),
        F.round(F.expr("percentile(view_to_buy_us, 0.75)"), 6)
         .alias("p75_us"),
        F.round(F.expr("percentile(view_to_buy_us, 0.9)"), 6)
         .alias("p90_us"))


# ---------------------------------------------------------------------------
# NEAREST as-of join — the third direction: each purchase matched to
# whichever view event (same user) is CLOSEST in time, looking both
# ways, with a tolerance cap. Completes backward (asof_join_window) and
# forward (asof_join_forward): 'nearest' is the semantics sensor-fusion
# and feature-at-inference pipelines usually want. Same single
# user-keyed window pass — BOTH candidates come from one ordered frame
# pair (IGNORE-NULLS last/first), then a constant-width CASE picks the
# smaller |dt| (tie -> the BACKWARD match, the causal default; equal
# distance can't flip across engines because dts are exact integers).
# ---------------------------------------------------------------------------

ASOF_NEAREST_TOL_US = 3_600_000_000   # 1 hour


@query(
    "asof_join_nearest",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS) OVER wb AS prior_id,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
                        IGNORE NULLS) OVER wb AS prior_us,
             FIRST_VALUE(CASE WHEN event_type = 'view' THEN event_id END
                         IGNORE NULLS) OVER wf AS next_id,
             FIRST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
                         IGNORE NULLS) OVER wf AS next_us
      FROM events
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(epoch_us(ts) AS BIGINT) AS pus,
             prior_id, prior_us, next_id, next_us,
             CASE
               WHEN prior_us IS NOT NULL
                    AND (next_us IS NULL
                         OR epoch_us(ts) - prior_us <= next_us - epoch_us(ts))
                 THEN prior_id ELSE next_id END AS near_id,
             CASE
               WHEN prior_us IS NOT NULL
                    AND (next_us IS NULL
                         OR epoch_us(ts) - prior_us <= next_us - epoch_us(ts))
                 THEN CAST(epoch_us(ts) - prior_us AS BIGINT)
               ELSE CAST(next_us - epoch_us(ts) AS BIGINT) END AS near_dt_us,
             CASE
               WHEN prior_us IS NOT NULL
                    AND (next_us IS NULL
                         OR epoch_us(ts) - prior_us <= next_us - epoch_us(ts))
                 THEN 'backward' ELSE 'forward' END AS direction
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT user_id, purchase_id, near_id AS view_id, near_dt_us, direction
    FROM picked
    WHERE near_id IS NOT NULL AND near_dt_us <= {ASOF_NEAREST_TOL_US}
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-view as-of join (both directions, 1 h tolerance,
    backward-preferring integer tie-break)."""
    ev = load_table(spark, sf_dir, "events")
    wb = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    wf = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing))
    vid = F.when(F.col("event_type") == "view", F.col("event_id"))
    vus = F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    seq = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.last(vid, ignorenulls=True).over(wb).alias("prior_id"),
        F.last(vus, ignorenulls=True).over(wb).alias("prior_us"),
        F.first(vid, ignorenulls=True).over(wf).alias("next_id"),
        F.first(vus, ignorenulls=True).over(wf).alias("next_us"))
    pus = F.unix_micros("ts")
    back_wins = (F.col("prior_us").isNotNull()
                 & (F.col("next_us").isNull()
                    | (pus - F.col("prior_us") <= F.col("next_us") - pus)))
    picked = (seq.filter(F.col("event_type") == "purchase")
              .select("user_id",
                      F.col("event_id").alias("purchase_id"),
                      F.when(back_wins, F.col("prior_id"))
                      .otherwise(F.col("next_id")).alias("view_id"),
                      F.when(back_wins, (pus - F.col("prior_us")))
                      .otherwise(F.col("next_us") - pus).cast("bigint")
                      .alias("near_dt_us"),
                      F.when(back_wins, F.lit("backward"))
                      .otherwise(F.lit("forward")).alias("direction")))
    return picked.filter(F.col("view_id").isNotNull()
                         & (F.col("near_dt_us") <= ASOF_NEAREST_TOL_US))
