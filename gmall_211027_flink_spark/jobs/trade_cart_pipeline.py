"""The M1 end-to-end slice (SURVEY §7.2): cart-add DWD job → cart-add-UU
DWS window → ADS rollup, as composable DataFrame transforms.

Reference chain:
- DwdTradeCartAdd.java:37-94 — filter cart_info inserts/updates off the
  CDC envelope, compute the sku_num increment, lookup-join base_dic;
- DwsTradeCartAddUuWindow.java:79-140 — keyed last-cart-date state emits
  each user once per day, then a 10 s global tumbling window counts
  cart-add unique users;
- UserStatsMapper.java:22-25 — ADS reads the windowed rows back out.

Each stage is DataFrame-in/DataFrame-out so the same code runs batch
(tests, backfills) and streaming (foreachBatch/watermarked window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_211027_flink_spark.sources.cdc import delta_int, parse_cdc, project_table


def dwd_cart_add(raw_cdc: DataFrame) -> DataFrame:
    """DWD: cart-add detail rows with the quantity increment."""
    env, _dirty = parse_cdc(raw_cdc)
    cart = project_table(
        env, "cart_info", ("insert", "update"),
        {"id": "bigint", "user_id": "bigint", "sku_id": "bigint",
         "cart_price": "decimal(16,2)", "sku_num": "int",
         "source_type": "string", "create_time": "string"},
    )
    # insert → full sku_num; update → new-minus-old increment; keep only
    # additions (reference: DwdTradeCartAdd.java:56-59 keeps old IS NULL
    # OR new > old — i.e. a positive delta)
    added = cart.withColumn("sku_num_delta", delta_int(cart, "sku_num")) \
        .filter(F.col("sku_num_delta") > 0)
    return added.select("id", "user_id", "sku_id", "cart_price",
                        "sku_num_delta", "source_type", "create_time", "ts")


def enrich_source_dim(cart: DataFrame, base_dic: DataFrame) -> DataFrame:
    """J3 lookup join: source_type → source_type_name via the broadcast
    dictionary dim (reference joins FOR SYSTEM_TIME AS OF against cached
    JDBC base_dic, DwdTradeCartAdd.java:92-94)."""
    dic = base_dic.select(F.col("dic_code").alias("source_type"),
                          F.col("dic_name").alias("source_type_name"))
    return cart.join(F.broadcast(dic), "source_type", "left")


def dws_cart_add_uu(cart: DataFrame, day_col_from: str = "create_time") -> DataFrame:
    """DWS (batch form): first cart-add per (user, day) → per-day unique
    cart-add user count. Streaming form = streaming.state.daily_unique +
    streaming.windows.tumbling_agg."""
    with_day = cart.withColumn("dt", F.substring(day_col_from, 1, 10))
    w = Window.partitionBy("user_id", "dt").orderBy("ts", "id")
    firsts = with_day.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") == 1)
    return firsts.groupBy("dt").agg(
        F.count("*").alias("cart_add_uu_ct"))


def ads_cart_uu(dws: DataFrame) -> DataFrame:
    """ADS: totals over the DWS rows (UserStatsMapper.java:22-25 shape)."""
    return dws.agg(
        F.sum("cart_add_uu_ct").cast("bigint").alias("cart_add_uu_total"),
        F.count("*").alias("days"))
