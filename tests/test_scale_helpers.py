"""Skew-salting helpers + approximate-sketch aggregates (scale levers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.operators.joins import (
    salted_broadcast_join, salted_groupby_count,
)


def test_salted_groupby_count_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {r["l_returnflag"]: r["count"]
             for r in li.groupBy("l_returnflag").count().collect()}
    salted = {r["l_returnflag"]: r["count"]
              for r in salted_groupby_count(li, "l_returnflag").collect()}
    assert salted == plain


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = li.join(part, "l_partkey").count()
    salted = salted_broadcast_join(li, part, "l_partkey").count()
    assert salted == plain


def test_approx_sketches_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]
    assert abs(row["p50_approx"] - row["p50_exact"]) <= 0.5


def test_hll_sketch_rollup_merges_like_raw(spark, sf_dir):
    """Mergeable distinct-count rollup: fine (hour, event_type) buckets
    keep an HLL SKETCH of user_id; the daily answer unions the sketches
    — never re-reads raw events. This is the only distinct-count shape
    that composes hierarchically at 100 TB (plain countDistinct can't be
    re-aggregated; collect_set state is unbounded). Union-of-sketches
    must estimate the day's true distinct count within HLL tolerance,
    and per-type sketches must merge across types identically to a
    sketch built from the raw union."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_format(
        F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 3600) * 3600),
        "yyyy-MM-dd HH:00:00")
    fine = (ev.groupBy(hour.alias("stt"), "event_type")
            .agg(F.hll_sketch_agg("user_id").alias("uv_sketch")))
    day = (fine.groupBy(F.substring("stt", 1, 10).alias("dt"))
           .agg(F.hll_sketch_estimate(F.hll_union_agg("uv_sketch"))
                .alias("uv_est")))
    exact = (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
             .agg(F.countDistinct("user_id").alias("uv")))
    merged = {r["dt"]: r["uv_est"] for r in day.collect()}
    truth = {r["dt"]: r["uv"] for r in exact.collect()}
    assert merged.keys() == truth.keys()
    for dt, uv in truth.items():
        assert abs(merged[dt] - uv) <= max(2, 0.05 * uv), (dt, merged[dt], uv)
