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
