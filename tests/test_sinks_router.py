"""Upsert sink + config-driven dim router (SURVEY S4/S8/W6)."""

from __future__ import annotations

from gmall_211027_flink_spark.sources.cdc import parse_cdc
from gmall_211027_flink_spark.streaming.dim_router import (
    TableProcess, route_batch,
)
from gmall_211027_flink_spark.streaming.sinks import ParquetUpsertSink


def test_upsert_sink_last_wins(spark, tmp_path):
    path = str(tmp_path / "store")
    sink = ParquetUpsertSink(path, ["id"], "ts")

    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11), (1, "a2", 12)], ["id", "val", "ts"])
    sink.write_batch(b1, 0)
    got = {r["id"]: r["val"] for r in sink.read(spark).collect()}
    assert got == {1: "a2", 2: "b"}     # in-batch last-wins by ts

    b2 = spark.createDataFrame([(2, "b2", 20), (3, "c", 21)],
                               ["id", "val", "ts"])
    sink.write_batch(b2, 1)
    got = {r["id"]: r["val"] for r in sink.read(spark).collect()}
    assert got == {1: "a2", 2: "b2", 3: "c"}   # cross-batch upsert


def test_dim_router_routes_configured_tables(spark, tmp_path):
    store = str(tmp_path / "dims")
    raw = spark.createDataFrame([
        ('{"table":"base_trademark","type":"insert","ts":1,'
         '"data":{"id":"1","tm_name":"apple","logo":"x"}}',),
        ('{"table":"base_trademark","type":"update","ts":2,'
         '"data":{"id":"1","tm_name":"apple2","logo":"y"}}',),
        ('{"table":"base_category1","type":"insert","ts":3,'
         '"data":{"id":"5","name":"food"}}',),
        ('{"table":"unconfigured","type":"insert","ts":4,"data":{"id":"9"}}',),
        ('{"table":"base_trademark","type":"delete","ts":5,'
         '"data":{"id":"1"}}',),   # deletes are not routed
    ], ["value"])
    env, _ = parse_cdc(raw)
    configs = [
        TableProcess("base_trademark", "dim_trademark", ["id", "tm_name"], "id"),
        TableProcess("base_category1", "dim_category1", ["id", "name"], "id"),
    ]
    written = route_batch(env, configs, store)
    assert written == {"dim_trademark": 2, "dim_category1": 1}

    tm = spark.read.parquet(f"{store}/dim_trademark").collect()
    assert len(tm) == 1 and tm[0]["tm_name"] == "apple2"
    assert "logo" not in tm[0].asDict()          # column pruning by config
    c1 = spark.read.parquet(f"{store}/dim_category1").collect()
    assert len(c1) == 1 and c1[0]["name"] == "food"
