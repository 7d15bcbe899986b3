"""Composed gmall jobs: log 5-way split (P7) and the M1 cart pipeline."""

from __future__ import annotations

import json

from gmall_211027_flink_spark.jobs.dwd_log_split import parse_log, split_log
from gmall_211027_flink_spark.jobs.trade_cart_pipeline import (
    ads_cart_uu, dwd_cart_add, dws_cart_add_uu, enrich_source_dim,
)


def _log_rows():
    common = {"mid": "m1", "uid": "u1", "ch": "web", "is_new": "1",
              "ar": "110000", "vc": "v1", "ba": "b", "md": "x", "os": "ios"}
    return [
        # error log
        json.dumps({"common": common, "err": {"error_code": "500", "msg": "boom"},
                    "page": {"page_id": "home"}, "ts": 1000}),
        # start log
        json.dumps({"common": common, "start": {"entry": "icon",
                    "loading_time": 100, "open_ad_id": "1"}, "ts": 2000}),
        # page log with displays and actions
        json.dumps({"common": common,
                    "page": {"page_id": "good_detail", "last_page_id": "home",
                             "during_time": 5000, "item": "7",
                             "item_type": "sku_id"},
                    "displays": [{"display_type": "promo", "item": "3",
                                  "item_type": "sku_id", "pos_id": "1",
                                  "order": "1"},
                                 {"display_type": "query", "item": "4",
                                  "item_type": "sku_id", "pos_id": "2",
                                  "order": "2"}],
                    "actions": [{"action_id": "cart_add", "item": "7",
                                 "item_type": "sku_id", "ts": 3500}],
                    "ts": 3000}),
        # plain page log
        json.dumps({"common": common, "page": {"page_id": "home"}, "ts": 4000}),
        "garbage{{{",
    ]


def test_log_split_five_ways(spark):
    raw = spark.createDataFrame([(r,) for r in _log_rows()], ["value"])
    clean, dirty = parse_log(raw)
    assert dirty.count() == 1
    streams = split_log(clean)
    assert streams["err"].count() == 1
    assert streams["start"].count() == 1
    assert streams["display"].count() == 2     # exploded
    assert streams["action"].count() == 1
    assert streams["page"].count() == 2        # good_detail + home
    # display rows inherit the parent's page_id and ts
    d = streams["display"].orderBy("order").first()
    assert d["page_id"] == "good_detail" and d["ts"] == 3000
    # action rows take the action's own ts (reference semantics)
    a = streams["action"].first()
    assert a["ts"] == 3500 and a["action_id"] == "cart_add"


def _cart_cdc_rows():
    def env(typ, data, old=None, ts=0):
        e = {"database": "gmall", "table": "cart_info", "type": typ,
             "ts": ts, "data": data}
        if old:
            e["old"] = old
        return json.dumps(e)
    mk = lambda i, u, n, t: {"id": str(i), "user_id": str(u), "sku_id": "1",
                             "cart_price": "10.00", "sku_num": str(n),
                             "source_type": "2401",
                             "create_time": f"2022-02-0{t} 10:00:00"}
    return [
        env("insert", mk(1, 101, 2, 1), ts=1),                       # +2
        env("update", mk(1, 101, 5, 1), old={"sku_num": "2"}, ts=2),  # +3
        env("update", mk(1, 101, 4, 1), old={"sku_num": "5"}, ts=3),  # removal -> dropped
        env("insert", mk(2, 102, 1, 1), ts=4),                       # +1
        env("insert", mk(3, 101, 1, 2), ts=5),                       # day 2
        json.dumps({"table": "order_info", "type": "insert", "ts": 6,
                    "data": {"id": "9"}}),                            # other table
    ]


def test_cart_pipeline_end_to_end(spark):
    raw = spark.createDataFrame([(r,) for r in _cart_cdc_rows()], ["value"])
    cart = dwd_cart_add(raw)
    rows = {(r["id"], r["ts"]): r["sku_num_delta"] for r in cart.collect()}
    assert rows == {(1, 1): 2, (1, 2): 3, (2, 4): 1, (3, 5): 1}

    dic = spark.createDataFrame(
        [("2401", "用户查询"), ("2402", "商品推广")], ["dic_code", "dic_name"])
    enriched = enrich_source_dim(cart, dic)
    assert enriched.filter("source_type_name = '用户查询'").count() == 4

    dws = dws_cart_add_uu(cart)
    per_day = {r["dt"]: r["cart_add_uu_ct"] for r in dws.collect()}
    # day 1: users 101, 102 -> 2; day 2: user 101 -> 1
    assert per_day == {"2022-02-01": 2, "2022-02-02": 1}

    ads = ads_cart_uu(dws).first()
    assert ads["cart_add_uu_total"] == 3 and ads["days"] == 2
