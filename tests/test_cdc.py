"""CDC envelope parsing / projection / change detection (SURVEY P1-P6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_211027_flink_spark.sources.cdc import (
    changed, delta_int, parse_cdc, project_table, prune_columns,
)


def _raw(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], ["value"])


def test_parse_cdc_splits_dirty(spark):
    raw = _raw(spark, [
        '{"database":"gmall","table":"cart_info","type":"insert",'
        '"ts":1,"data":{"id":"1","sku_num":"2"}}',
        'not json at all',
        '{"no_table_key": true}',
    ])
    clean, dirty = parse_cdc(raw)
    assert clean.count() == 1
    assert dirty.count() == 2


def test_project_table_filters_and_casts(spark):
    raw = _raw(spark, [
        '{"table":"cart_info","type":"insert","ts":1,"data":{"id":"7","sku_num":"3"}}',
        '{"table":"cart_info","type":"delete","ts":2,"data":{"id":"8","sku_num":"1"}}',
        '{"table":"order_info","type":"insert","ts":3,"data":{"id":"9"}}',
    ])
    clean, _ = parse_cdc(raw)
    out = project_table(clean, "cart_info", ("insert", "update"),
                        {"id": "bigint", "sku_num": "int"})
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 7 and rows[0]["sku_num"] == 3
    assert dict(out.dtypes)["id"] == "bigint"


def test_delta_int_update_computes_increment(spark):
    # reference semantics (DwdTradeCartAdd.java:43): insert -> full value,
    # update -> new - old
    raw = _raw(spark, [
        '{"table":"cart_info","type":"insert","ts":1,"data":{"id":"1","sku_num":"5"}}',
        '{"table":"cart_info","type":"update","ts":2,'
        '"data":{"id":"1","sku_num":"9"},"old":{"sku_num":"5"}}',
    ])
    clean, _ = parse_cdc(raw)
    out = clean.withColumn("delta", delta_int(clean, "sku_num")) \
        .orderBy("ts").collect()
    assert [r["delta"] for r in out] == [5, 4]


def test_changed_detects_old_keys(spark):
    raw = _raw(spark, [
        '{"table":"t","type":"update","ts":1,"data":{"id":"1","a":"2"},"old":{"a":"1"}}',
        '{"table":"t","type":"update","ts":2,"data":{"id":"2","b":"2"},"old":{"b":"1"}}',
    ])
    clean, _ = parse_cdc(raw)
    got = clean.filter(changed(F.col("old"), "a")).collect()
    assert len(got) == 1 and got[0]["data"]["id"] == "1"


def test_prune_columns(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["id", "name", "score"])
    out = prune_columns(df, ["id", "score", "not_there"])
    assert out.columns == ["id", "score"]
