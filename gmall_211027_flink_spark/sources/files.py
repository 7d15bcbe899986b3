"""File-based sources (test/prod parquet paths + streaming readers).

Every streaming job in this engine takes a DataFrame, not a topic name —
so tests drive them with these file streams (availableNow) while prod
wires sources/kafka.py builders. This is the reference's
stream/table duality (SURVEY §1.3) expressed as dependency injection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_parquet(spark: SparkSession, path: str,
                   schema: T.StructType | None = None) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def stream_json(spark: SparkSession, path: str,
                schema: T.StructType) -> DataFrame:
    return spark.readStream.schema(schema).json(path)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source for smoke tests (reference uses socket/print
    experiments in its test dir; rate is Spark's built-in equivalent)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second).load()
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table (normalizes the ts column the same way
    catalog.load_table does for batch reads — bigint-nanos, TIMESTAMP_NTZ
    and plain TIMESTAMP encodings all surface as TimestampType)."""
    from ..catalog import normalize_event_ts
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the streaming file source requires a directory: point it at sf_dir
    # and glob-filter to the one table file
    stream = (spark.readStream.schema(batch_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    return normalize_event_ts(stream)


def read_json(spark: SparkSession, path: str,
              schema: T.StructType) -> DataFrame:
    """Batch JSON reader with EXPLICIT schema — never inferSchema in a
    pipeline (a schema inferred from one day's files silently drifts on
    the next; the reference's Flink jobs declare every topic's schema in
    DDL for the same reason, MyKafkaUtil.java:65-72)."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, sep: str = ",") -> DataFrame:
    """Batch CSV reader, schema-explicit, PERMISSIVE with a corrupt-
    record column so dirty rows land in a quarantine filter instead of
    killing the job (same dirty-side-output posture as P1)."""
    full = T.StructType(schema.fields
                        + [T.StructField("_corrupt", T.StringType())])
    return (spark.read.schema(full)
            .option("header", str(header).lower())
            .option("sep", sep)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(path))
