"""Kafka source/sink builders (SURVEY §2.1 S1-S5).

The reference's Kafka surface: string consumer with a group id
(utils/MyKafkaUtil.java:24-50, null values → ""), string producer
(:52-56), declarative JSON source DDL (:65-72), upsert-kafka sink with a
PK (:80-89), and the CDC-envelope source table (:91-100).

No Kafka broker (or connector jar) exists in the test container, so the
builders are factored into PURE parts — the option dict each reader is
configured with, and the column projections applied to the raw (value,
timestamp) stream — plus thin compositions that wire them onto
``spark.readStream.format("kafka")``. The pure parts carry the whole
contract (subscribe/startingOffsets/group id; null→""; JSON schema
projection; keyed sink encoding) and are covered by
tests/test_kafka_contract.py on in-memory frames; the file-source tests
exercise identical downstream plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.catalog import CDC_ENVELOPE_SCHEMA, LOG_SCHEMA


# -- pure contract parts ----------------------------------------------------

def source_options(brokers: str, topic: str, group_id: str,
                   starting: str = "latest") -> dict[str, str]:
    """S1: the exact option set a consumer is configured with (reference:
    group id + topic + latest offsets, MyKafkaUtil.java:24-50)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting,
    }


def value_as_string(raw: DataFrame) -> DataFrame:
    """Null kafka values become "" — the reference's custom deserializer
    returns an empty string for tombstones (MyKafkaUtil.java:30-40) so
    downstream JSON parsing yields a dirty-record, not an NPE."""
    return raw.select(
        F.coalesce(F.col("value").cast("string"), F.lit("")).alias("value"),
        "timestamp",
    )


def json_projection(strings: DataFrame, schema: T.StructType) -> DataFrame:
    """S3: from_json(value, schema) flattened, with the kafka ingest
    timestamp surfaced as ``proc_time`` (the PROCTIME() analog)."""
    return (
        strings
        .select(F.from_json("value", schema).alias("j"), "timestamp")
        .select("j.*", F.col("timestamp").alias("proc_time"))
    )


def sink_columns(key_col: str | None = None) -> list[Column]:
    """S2/S4: kafka producer encoding — whole row as JSON value; with
    ``key_col`` set, messages are keyed by the PK (the upsert-kafka
    pattern against a compacted topic, MyKafkaUtil.java:80-89)."""
    cols = [F.to_json(F.struct("*")).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return cols


# -- stream compositions ----------------------------------------------------

def read_topic(spark: SparkSession, brokers: str, topic: str,
               group_id: str, starting: str = "latest") -> DataFrame:
    """S1: value-as-string stream; null values become ""."""
    raw = (
        spark.readStream.format("kafka")
        .options(**source_options(brokers, topic, group_id, starting))
        .load()
    )
    return value_as_string(raw)


def read_json_topic(spark: SparkSession, brokers: str, topic: str,
                    group_id: str, schema: T.StructType) -> DataFrame:
    """S3: declarative JSON source (Kafka DDL equivalent)."""
    return json_projection(
        read_topic(spark, brokers, topic, group_id), schema)


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
    return (
        df.select(*sink_columns(key_col))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
