"""Stateful streaming processors driven by a file stream with
availableNow — results compared to batch ground truth (SURVEY A5/A6/P8).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.streaming.state import (
    daily_unique, first_wins, new_visitor_fix,
)


@pytest.fixture(scope="module")
def events_stream_path(spark, sf_dir, tmp_path_factory):
    # re-write the events table as a plain-timestamp parquet dir so the
    # streaming reader sees a stable schema (ns->us conversion applied)
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_daily_unique_matches_batch(spark, sf_dir, events_stream_path):
    schema = spark.read.parquet(events_stream_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_stream_path)
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ])
    got = _run_stream(
        spark, daily_unique(stream, "user_id", "ts", out_schema), "uv_detail")

    batch = load_table(spark, sf_dir, "events") \
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    expected = batch.groupBy("user_id", "dt").count()
    # one emitted row per (user, day)
    assert got.count() == expected.count()
    assert got.select("user_id", "dt").distinct().count() == expected.count()


def test_first_wins_single_row_per_key(spark, events_stream_path):
    schema = spark.read.parquet(events_stream_path).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_path)
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ])
    got = _run_stream(
        spark, first_wins(stream, "user_id", "ts", out_schema), "first_wins")
    n_users = spark.read.parquet(events_stream_path) \
        .select("user_id").distinct().count()
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users


def test_new_visitor_fix_rewrites_later_claims(spark, tmp_path):
    src = str(tmp_path / "visits")
    rows = [
        ("u1", "2024-01-01", "1"),   # genuinely new
        ("u1", "2024-01-02", "1"),   # lying -> rewritten to 0
        ("u2", "2024-01-02", "0"),   # old user
        ("u2", "2024-01-03", "1"),   # lying (state backfilled) -> 0
    ]
    spark.createDataFrame(rows, ["mid", "dt", "is_new"]) \
        .write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out_schema = T.StructType([
        T.StructField("mid", T.StringType()),
        T.StructField("dt", T.StringType()),
        T.StructField("is_new", T.StringType()),
    ])
    got = _run_stream(
        spark, new_visitor_fix(stream, "mid", out_schema), "is_new_fix")
    result = {(r["mid"], r["dt"]): r["is_new"] for r in got.collect()}
    assert result[("u1", "2024-01-01")] == "1"
    assert result[("u1", "2024-01-02")] == "0"
    assert result[("u2", "2024-01-02")] == "0"
    assert result[("u2", "2024-01-03")] == "0"
