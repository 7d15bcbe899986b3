"""Bucketed-table co-located joins: the write-once-shuffle-never lever.

Asserts on the PHYSICAL PLAN, not just results: a join and a groupBy on
the bucket key over bucketed tables must contain zero shuffle Exchanges.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gmall_211027_flink_spark.catalog import load_table
from gmall_211027_flink_spark.operators.bucketing import (
    executed_plan, shuffle_count, write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(load_table(spark, sf_dir, "lineitem"),
                   "bt_lineitem", "l_orderkey", N_BUCKETS)
    write_bucketed(load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"), "bt_orders", "l_orderkey", N_BUCKETS)
    yield
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("bt_lineitem")
        o = spark.table("bt_orders")
        # join on the bucket key, then aggregate BY the bucket key: the
        # bucketed distribution satisfies both, so the whole plan runs
        # with zero Exchanges (a non-bucket-key groupBy would still
        # shuffle once — that's expected and fine)
        joined = (li.join(o, "l_orderkey")
                  .groupBy("l_orderkey").agg(F.count("*").alias("ct")))
        rows = {r["l_orderkey"]: r["ct"] for r in joined.collect()}
        assert shuffle_count(joined) == 0, executed_plan(joined)

        # ground truth from the plain (shuffling) plan
        li0 = load_table(spark, sf_dir, "lineitem")
        o0 = load_table(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey")
        expected = {r["l_orderkey"]: r["ct"]
                    for r in li0.join(o0, "l_orderkey")
                    .groupBy("l_orderkey").agg(F.count("*").alias("ct"))
                    .collect()}
        assert rows == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    agg = (spark.table("bt_lineitem")
           .groupBy("l_orderkey").agg(F.count("*").alias("ct")))
    agg.collect()
    assert shuffle_count(agg) == 0, executed_plan(agg)


def test_range_sorted_export_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_range_sorted: files must hold disjoint, internally-sorted
    key ranges whose concatenation is the global order — the property
    that makes the export merge-readable and min/max-skippable."""
    import glob as _glob

    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.operators.bucketing import write_range_sorted

    out = str(tmp_path / "sorted_orders")
    df = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    write_range_sorted(df, out, "o_orderkey", num_files=8)

    spans = []
    total = 0
    for f in _glob.glob(f"{out}/part-*.parquet"):
        pdf = spark.read.parquet(f).select("o_orderkey").collect()
        if not pdf:
            continue
        keys = [r[0] for r in pdf]
        assert keys == sorted(keys), f"file {f} not internally sorted"
        spans.append((keys[0], keys[-1]))
        total += len(keys)
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "file key ranges overlap"
    assert total == df.count()


def test_compact_small_files_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.bucketing import (
        compact_small_files)

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    p = str(tmp_path / "frag")
    # simulate 40 micro-batch commits' worth of tiny files
    ev.repartition(40).write.parquet(p)
    before = sorted(r.event_id for r in spark.read.parquet(p).collect())
    stats = compact_small_files(spark, p, target_bytes=64 * 1024 * 1024)
    after_df = spark.read.parquet(p)
    after = sorted(r.event_id for r in after_df.collect())
    assert after == before                      # content preserved
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1            # tiny table -> one file


def test_compact_with_partition_col_keeps_key_clustered(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.bucketing import (
        compact_small_files, shuffle_count)

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    p = str(tmp_path / "frag2")
    ev.repartition(20).write.parquet(p)
    compact_small_files(spark, p, target_bytes=1024,
                        partition_col="user_id")
    # rows with the same user_id must land in the same output file
    df = spark.read.parquet(p).withColumn(
        "f", F.element_at(F.split(F.input_file_name(), "/"), -1))
    n_violations = (df.groupBy("user_id")
                    .agg(F.countDistinct("f").alias("nf"))
                    .filter(F.col("nf") > 1).count())
    assert n_violations == 0
