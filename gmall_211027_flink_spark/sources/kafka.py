"""Kafka source/sink builders (SURVEY §2.1 S1-S5).

The reference's Kafka surface: string consumer with a group id
(utils/MyKafkaUtil.java:24-50, null values → ""), string producer
(:52-56), declarative JSON source DDL (:65-72), upsert-kafka sink with a
PK (:80-89), and the CDC-envelope source table (:91-100).

These builders return lazily-configured readers/writers — no Kafka
broker exists in the test container, so nothing here is executed by the
test suite; the composition (read → from_json(schema) → transforms) is
covered by the file-source tests, which exercise identical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.catalog import CDC_ENVELOPE_SCHEMA, LOG_SCHEMA


def read_topic(spark: SparkSession, brokers: str, topic: str,
               group_id: str, starting: str = "latest") -> DataFrame:
    """S1: value-as-string stream; null values become "" (the reference's
    custom deserializer behavior)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("kafka.group.id", group_id)
        .option("startingOffsets", starting)
        .load()
    )
    return raw.select(
        F.coalesce(F.col("value").cast("string"), F.lit("")).alias("value"),
        "timestamp",
    )


def read_json_topic(spark: SparkSession, brokers: str, topic: str,
                    group_id: str, schema: T.StructType) -> DataFrame:
    """S3: declarative JSON source (Kafka DDL equivalent)."""
    return (
        read_topic(spark, brokers, topic, group_id)
        .select(F.from_json("value", schema).alias("j"), "timestamp")
        .select("j.*", F.col("timestamp").alias("proc_time"))
    )


def read_cdc_topic(spark: SparkSession, brokers: str,
                   topic: str = "topic_db",
                   group_id: str = "spark") -> DataFrame:
    """S5: the Maxwell CDC envelope table with a processing-time column
    (proctime() → the micro-batch's kafka ingest timestamp)."""
    return read_json_topic(spark, brokers, topic, group_id,
                           CDC_ENVELOPE_SCHEMA)


def read_log_topic(spark: SparkSession, brokers: str,
                   topic: str = "topic_log",
                   group_id: str = "spark") -> DataFrame:
    """The behavior-log topic with its nested schema."""
    return read_json_topic(spark, brokers, topic, group_id, LOG_SCHEMA)


def write_topic(df: DataFrame, brokers: str, topic: str,
                checkpoint: str, key_col: str | None = None):
    """S2/S4: append producer; with ``key_col`` set, messages are keyed by
    the PK — against a compacted topic this is the upsert-kafka pattern
    (reader-side last-wins compaction = operators/windows.py A7)."""
    cols = [F.to_json(F.struct("*")).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
