"""Config-driven dimension router (SURVEY §3.1 DimApp: S6/S8/W6).

The reference streams a MySQL ``table_process`` config table via Flink
CDC, broadcasts it to all tasks, and routes matching CDC rows into
dynamically-created Phoenix dim tables
(app/dim/DimApp.java:66-102, app/func/TableProcessFunction.java:21-173).

Spark-first shape: the config table is tiny — re-read it every
micro-batch inside ``foreachBatch`` (the reference itself tolerates 1 h
lookup-cache staleness) and route each configured source table's rows
into its own keyed upsert store. No broadcast-state machinery needed:
a per-batch local dict is the broadcast.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_211027_flink_spark.streaming.sinks import ParquetUpsertSink


@dataclass
class TableProcess:
    """One row of the reference's table_process config
    (bean/TableProcess.java:29-35)."""
    source_table: str
    sink_table: str
    sink_columns: list[str]
    sink_pk: str


def route_batch(env_batch: DataFrame, configs: list[TableProcess],
                store_root: str, epoch_id: int = 0) -> dict[str, int]:
    """Route one micro-batch of CDC-envelope rows into per-dim upsert
    stores. Returns {sink_table: rows_written}. Matches the reference's
    op-type filter (bootstrap-insert|insert|update,
    TableProcessFunction.java:139)."""
    written: dict[str, int] = {}
    env_batch = env_batch.filter(
        F.col("type").isin("bootstrap-insert", "insert", "update")).cache()
    try:
        for cfg in configs:
            rows = env_batch.filter(F.col("table") == cfg.source_table)
            cols = [F.col("data")[c].alias(c) for c in cfg.sink_columns]
            projected = rows.select(*cols, F.col("ts").alias("_cdc_ts"))
            n = projected.count()
            if n == 0:
                continue
            # Dim tables are small & bounded — 8 buckets keeps per-batch
            # rewrites to the touched buckets without over-splitting.
            sink = ParquetUpsertSink(
                f"{store_root}/{cfg.sink_table}", [cfg.sink_pk], "_cdc_ts",
                num_buckets=8)
            sink.write_batch(projected, epoch_id=epoch_id)
            written[cfg.sink_table] = n
    finally:
        env_batch.unpersist()
    return written


def dim_router(config_loader: Callable[[], list[TableProcess]],
               store_root: str):
    """foreachBatch function: refresh config, route, upsert — the whole
    DimApp loop. ``config_loader`` re-reads the config source each batch
    (JDBC in prod; any callable in tests)."""
    def fn(env_batch: DataFrame, epoch_id: int) -> None:
        route_batch(env_batch, config_loader(), store_root, epoch_id)
    return fn
