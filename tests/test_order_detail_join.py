"""DwdTradeOrderDetail 5-way join (J1-J3): batch semantics + the
last-wins upsert absorbing left-join null padding."""

from __future__ import annotations

import json

from gmall_211027_flink_spark.jobs.dwd_trade_order_detail import (
    join_order_detail, split_order_streams,
)
from gmall_211027_flink_spark.streaming.sinks import ParquetUpsertSink


def _env(table, typ, data, ts):
    return json.dumps({"database": "gmall", "table": table, "type": typ,
                       "ts": ts, "data": data})


def _rows():
    return [
        _env("order_detail", "insert",
             {"id": "11", "order_id": "1", "sku_id": "100",
              "sku_name": "phone", "sku_num": "2", "order_price": "999.00",
              "create_time": "2022-02-01 10:00:00", "source_type": "2401"}, 1),
        _env("order_detail", "insert",
             {"id": "12", "order_id": "1", "sku_id": "101",
              "sku_name": "case", "sku_num": "1", "order_price": "19.50",
              "create_time": "2022-02-01 10:00:00", "source_type": "2402"}, 1),
        _env("order_info", "insert",
             {"id": "1", "user_id": "7", "province_id": "3",
              "order_status": "1001",
              "create_time": "2022-02-01 10:00:00"}, 1),
        # only detail 11 参加 an activity; none has a coupon
        _env("order_detail_activity", "insert",
             {"id": "21", "order_detail_id": "11", "activity_id": "5",
              "activity_rule_id": "6"}, 1),
        # unrelated table noise
        _env("cart_info", "insert", {"id": "99"}, 1),
    ]


def test_five_way_join_batch(spark):
    raw = spark.createDataFrame([(r,) for r in _rows()], ["value"])
    streams = split_order_streams(raw)
    dic = spark.createDataFrame(
        [("2401", "用户查询"), ("2402", "商品推广")], ["dic_code", "dic_name"])
    out = join_order_detail(streams, dic)
    rows = {r["order_detail_id"]: r for r in out.collect()}
    assert set(rows) == {11, 12}
    r11 = rows[11]
    assert r11["user_id"] == 7 and r11["order_status"] == "1001"
    assert r11["activity_id"] == 5            # inner info + left activity
    assert r11["coupon_id"] is None           # left join null padding
    assert float(r11["split_total_amount"]) == 1998.0
    assert r11["source_type_name"] == "用户查询"
    assert rows[12]["activity_id"] is None


def test_left_join_retraction_absorbed_by_upsert(spark, tmp_path):
    """Flink emits retract pairs for late left-join matches; Spark emits
    the null-padded row first and the matched row later. The keyed
    last-wins sink converges to the same final table."""
    raw1 = spark.createDataFrame([(r,) for r in _rows()[:3]], ["value"])
    dic = spark.createDataFrame([("2401", "n1"), ("2402", "n2")],
                                ["dic_code", "dic_name"])
    sink = ParquetUpsertSink(str(tmp_path / "dwd_order_detail"),
                             ["order_detail_id"], "ts")
    # batch 1: activity row not yet arrived -> null-padded output
    out1 = join_order_detail(split_order_streams(raw1), dic)
    sink.write_batch(out1, 0)
    assert {r["order_detail_id"]: r["activity_id"]
            for r in sink.read(spark).collect()} == {11: None, 12: None}

    # batch 2: the same detail re-emitted once the activity arrives
    # (ts bumped — the reader-side last-wins rule keeps the newer row)
    raw2 = spark.createDataFrame(
        [(r.replace('"ts": 1', '"ts": 2'),) for r in _rows()], ["value"])
    out2 = join_order_detail(split_order_streams(raw2), dic)
    sink.write_batch(out2, 1)
    got = {r["order_detail_id"]: r["activity_id"]
           for r in sink.read(spark).collect()}
    assert got == {11: 5, 12: None}
