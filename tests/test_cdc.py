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


def test_json_and_csv_sources_roundtrip_parquet(spark, sf_dir, tmp_path):
    """Format breadth: the same orders rows written as JSON lines and
    CSV read back (schema-explicit, no inference) identical to the
    parquet source; a malformed CSV row lands in the corrupt column
    instead of failing the read."""
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.sources.files import read_csv, read_json

    orders = load_table(spark, str(sf_dir), "orders").limit(200).cache()
    schema = orders.schema

    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    orders.write.json(jdir)
    orders.selectExpr("*").write.option("header", "true").csv(cdir)

    back_j = read_json(spark, jdir, schema)
    assert back_j.count() == 200
    assert sorted(back_j.columns) == sorted(orders.columns)
    assert back_j.exceptAll(orders).count() == 0

    back_c = read_csv(spark, cdir, schema).drop("_corrupt")
    assert back_c.count() == 200
    # CSV loses sub-second/typing nuances only if schemas are inferred;
    # schema-explicit read must round-trip exactly
    assert back_c.exceptAll(orders).count() == 0

    # corrupt row → quarantine column, not a crash (Spark disallows
    # filtering a raw read on ONLY the corrupt column — cache first,
    # which is what a real quarantine split does anyway)
    bad = tmp_path / "c" / "zz_bad.csv"
    # first line is consumed as this file's header (header=true is
    # per-file); the second is the malformed data row
    bad.write_text("h1,h2,h3,h4,h5,h6\nnot,a,valid,orders,row,extra\n")
    re_read = read_csv(spark, cdir, schema).cache()
    try:
        assert re_read.filter(F.col("_corrupt").isNotNull()).count() >= 1
        assert re_read.filter(F.col("_corrupt").isNull()).count() == 200
    finally:
        re_read.unpersist()
        orders.unpersist()
