"""Catalog: explicit schemas + loaders for the test tables and for the
reference's streaming envelopes (topic_db CDC, topic_log behavior log).

The reference declares schemas per job as Flink SQL DDL strings
(reference: gmall-realtime utils/MyKafkaUtil.java:91-100 for the CDC
envelope, app/dwd/log/BaseLogApp.java:47-57 for the log). Here every
schema lives in one module and is explicit — no inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# --- streaming envelope schemas (reference parity) ---------------------------

# Maxwell CDC envelope over MySQL business tables
# (reference: utils/MyKafkaUtil.java:91-100 declares
#  {database, table, type, data MAP, old MAP, pt AS PROCTIME()})
CDC_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("database", T.StringType()),
    T.StructField("table", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    T.StructField("old", T.MapType(T.StringType(), T.StringType())),
])

# Behavior-log JSON with nested objects and arrays
# (reference: app/dwd/log/BaseLogApp.java:95-97,160-188 accesses
#  common/page/displays/actions/start/err/ts)
_COMMON = T.StructType([
    T.StructField(f, T.StringType())
    for f in ("ar", "ba", "ch", "is_new", "md", "mid", "os", "uid", "vc")
])
_PAGE = T.StructType([
    T.StructField("during_time", T.LongType()),
    T.StructField("item", T.StringType()),
    T.StructField("item_type", T.StringType()),
    T.StructField("last_page_id", T.StringType()),
    T.StructField("page_id", T.StringType()),
    T.StructField("source_type", T.StringType()),
])
_DISPLAY = T.StructType([
    T.StructField("display_type", T.StringType()),
    T.StructField("item", T.StringType()),
    T.StructField("item_type", T.StringType()),
    T.StructField("pos_id", T.StringType()),
    T.StructField("order", T.StringType()),
])
_ACTION = T.StructType([
    T.StructField("action_id", T.StringType()),
    T.StructField("item", T.StringType()),
    T.StructField("item_type", T.StringType()),
    T.StructField("ts", T.LongType()),
])
LOG_SCHEMA = T.StructType([
    T.StructField("common", _COMMON),
    T.StructField("page", _PAGE),
    T.StructField("displays", T.ArrayType(_DISPLAY)),
    T.StructField("actions", T.ArrayType(_ACTION)),
    T.StructField("start", T.StructType([
        T.StructField("entry", T.StringType()),
        T.StructField("loading_time", T.LongType()),
        T.StructField("open_ad_id", T.StringType()),
    ])),
    T.StructField("err", T.StructType([
        T.StructField("error_code", T.StringType()),
        T.StructField("msg", T.StringType()),
    ])),
    T.StructField("ts", T.LongType()),
])


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to TimestampType regardless
    of how the parquet writer encoded it. Seen encodings across testdata
    generations:
      - int64 TIMESTAMP(NANOS) read as bigint nanos (via
        spark.sql.legacy.parquet.nanosAsLong=true in session.py)
      - timestamp[us] isAdjustedToUTC=false -> Spark TIMESTAMP_NTZ
      - timestamp[us] UTC -> TimestampType already (no-op)
    Event-time ops (unix_micros, withWatermark) require TIMESTAMP; under
    the engine's fixed UTC session timezone the NTZ->TIMESTAMP cast is a
    pure re-tag with identical micros, matching DuckDB's reading.
    """
    from pyspark.sql import functions as F
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # nanos -> micros truncation, same as DuckDB reading nanos
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each test table as a temp view (for spark.sql plans)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
