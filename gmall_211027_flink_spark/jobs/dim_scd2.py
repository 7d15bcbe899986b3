"""DIM layer with history: CDC envelope stream → SCD Type-2 store.

Reference analog: DimApp (app/dim/DimApp.java) consumes `topic_db`,
filters dim tables off the envelope, and UPSERTS current values into
Phoenix (type-1 — history is lost on every update,
DimSinkFunction.java). This job is the same pipeline with a type-2
tail: the projected dim changelog feeds the incremental merge in
`streaming/scd2.py`, so every historical attribute version survives
with its validity interval — the layout ADS "as-of" queries and
training-data point-in-time joins need.

Wiring: parse_cdc (dirty side dropped to the dirty sink exactly as in
BaseApp) → project_table(dim table, insert+update) → (pk, ts, seq,
status) changelog → run_scd2_stream/foreachBatch merge. Per-PK order is
the topic contract (Maxwell partitions by PK — same assumption as every
reference dwd/dim job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_211027_flink_spark.sources.cdc import parse_cdc, project_table
from gmall_211027_flink_spark.streaming.scd2 import run_scd2_stream


def dim_changelog(raw_cdc: DataFrame, table: str, pk_col: str,
                  tracked_col: str, ts_col: str = "ts",
                  seq_col: str | None = None) -> DataFrame:
    """Envelope stream → (pk, ts, seq, status) SCD2 changelog for one
    dim table. ``tracked_col`` is the attribute whose changes open
    versions; everything else rides type-1 in the current row."""
    env, _dirty = parse_cdc(raw_cdc)
    proj = project_table(env, table, ("insert", "update"), {
        pk_col: "bigint", tracked_col: "string",
    })
    # default seq is a constant: the SCD2 sort key (ts, seq, status)
    # already totalizes equal-ts events by status, and CDC envelopes
    # carry millisecond ts — pass a real seq_col when the source has
    # one (monotonically_increasing_id is unsupported on streams and
    # non-deterministic across retries anyway)
    seq: Column = (F.col(seq_col).cast("int") if seq_col
                   else F.lit(0))
    return proj.select(
        F.col(pk_col).alias("pk"),
        F.timestamp_millis(F.col(ts_col)).alias("ts"),
        seq.alias("seq"),
        F.col(tracked_col).alias("status"))


def run_dim_scd2(raw_cdc_stream: DataFrame, table: str, pk_col: str,
                 tracked_col: str, store_path: str,
                 checkpoint: str) -> "object":
    """End-to-end: envelope stream → changelog → SCD2 store merge."""
    log = dim_changelog(raw_cdc_stream, table, pk_col, tracked_col)
    return run_scd2_stream(log, store_path, checkpoint)
