"""Kafka builder contract tests — no broker needed (SURVEY S1-S4).

The kafka connector jar isn't in this image, so these tests pin the
PURE parts of the builders: the option dict each reader is configured
with, the null→"" value normalization, the JSON-projection output
schemas, and the keyed producer encoding. The stream compositions wire
exactly these parts onto format("kafka") — asserted by reading the
composition source, not by connecting.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.catalog import CDC_ENVELOPE_SCHEMA, LOG_SCHEMA
from gmall_211027_flink_spark.sources.kafka import (
    json_projection, sink_columns, source_options, value_as_string,
)


def test_source_options_match_reference_contract():
    """group id + subscribe + startingOffsets (MyKafkaUtil.java:24-50)."""
    opts = source_options("h1:9092,h2:9092", "topic_db", "g1")
    assert opts == {
        "kafka.bootstrap.servers": "h1:9092,h2:9092",
        "subscribe": "topic_db",
        "kafka.group.id": "g1",
        "startingOffsets": "latest",
    }
    assert source_options("b", "t", "g", "earliest")["startingOffsets"] \
        == "earliest"


def _raw_frame(spark, values):
    """Mimic the kafka source's (value binary, timestamp) shape."""
    from datetime import datetime
    rows = [(v.encode() if v is not None else None,
             datetime(2024, 1, 1, 0, 0, i)) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("value", T.BinaryType()),
            T.StructField("timestamp", T.TimestampType()),
        ]))


def test_null_value_becomes_empty_string(spark):
    """Tombstone records must surface as "" (the reference's custom
    deserializer, MyKafkaUtil.java:30-40), not null."""
    raw = _raw_frame(spark, ['{"a":1}', None])
    got = [r["value"] for r in value_as_string(raw).collect()]
    assert got == ['{"a":1}', ""]
    assert value_as_string(raw).schema["value"].dataType == T.StringType()


def test_cdc_envelope_projection_schema(spark):
    """S5: the Maxwell envelope columns + proc_time, with MAP-typed
    data/old (MyKafkaUtil.java:91-100)."""
    env = '{"database":"gmall","table":"cart_info","type":"update",' \
          '"ts":1,"data":{"id":"7","sku_num":"3"},"old":{"sku_num":"1"}}'
    out = json_projection(value_as_string(_raw_frame(spark, [env])),
                          CDC_ENVELOPE_SCHEMA)
    fields = {f.name: f.dataType for f in out.schema.fields}
    assert set(fields) == {"database", "table", "type", "ts", "data",
                           "old", "proc_time"}
    assert fields["data"] == T.MapType(T.StringType(), T.StringType())
    assert fields["old"] == T.MapType(T.StringType(), T.StringType())
    assert fields["proc_time"] == T.TimestampType()
    row = out.collect()[0]
    assert row["table"] == "cart_info" and row["data"]["sku_num"] == "3"
    assert row["old"]["sku_num"] == "1"


def test_log_topic_projection_schema(spark):
    """topic_log: nested common/page structs + displays/actions arrays
    (BaseLogApp.java:47-57)."""
    out = json_projection(
        value_as_string(_raw_frame(spark, ['{"ts":1}'])), LOG_SCHEMA)
    names = [f.name for f in out.schema.fields]
    assert "common" in names and "page" in names and "proc_time" in names
    displays = out.schema["displays"].dataType
    assert isinstance(displays, T.ArrayType)


def test_sink_columns_keyed_and_unkeyed(spark):
    """S2/S4: value = whole row as JSON; keyed form prepends the PK as
    a string key (upsert-kafka pattern, MyKafkaUtil.java:80-89)."""
    df = spark.createDataFrame([(7, "a")], ["id", "v"])
    unkeyed = df.select(*sink_columns())
    assert unkeyed.columns == ["value"]
    assert json.loads(unkeyed.collect()[0]["value"]) == {"id": 7, "v": "a"}

    keyed = df.select(*sink_columns("id"))
    assert keyed.columns == ["key", "value"]
    row = keyed.collect()[0]
    assert row["key"] == "7"
    assert json.loads(row["value"]) == {"id": 7, "v": "a"}


def test_compositions_wire_pure_parts_onto_kafka_format():
    """The readers/writer must be exactly format("kafka") + the pure
    contract parts — checked structurally so a drive-by edit can't
    silently fork the tested contract from the shipped one."""
    import inspect

    from gmall_211027_flink_spark.sources import kafka as K

    src = inspect.getsource(K.read_topic)
    assert 'format("kafka")' in src and "source_options(" in src \
        and "value_as_string(" in src
    assert "json_projection(" in inspect.getsource(K.read_json_topic)
    wsrc = inspect.getsource(K.write_topic)
    assert 'format("kafka")' in wsrc and "sink_columns(" in wsrc \
        and "checkpointLocation" in wsrc
