"""Bucketed (pre-shuffled) table layout — the co-located-join lever.

The reference hash-partitions every stream by its join/agg key per job
(`keyBy`, e.g. app/dws/DwsTradeProvinceOrderWindow.java:82) — the shuffle
happens on every run. At 100 TB the equivalent Spark lever is to pay the
shuffle ONCE at write time: `bucketBy(N, key)` persists each table
pre-hash-partitioned, and every subsequent join or aggregation on that
key runs shuffle-free (the scan exposes the hash distribution to
Catalyst, which elides the Exchange).

Rules that make it work, encoded in `write_bucketed`:
- both sides of a co-located join need the SAME bucket count and key;
- `sortBy` within buckets lets SortMergeJoin skip its sort too;
- bucket pruning applies to point predicates on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   num_buckets: int = 32, sort: bool = True) -> None:
    """Persist ``df`` as a managed parquet table bucketed by ``key``.

    One shuffle now, zero shuffles for every later join/groupBy on
    ``key`` against a table bucketed with the same (key, num_buckets).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def executed_plan(df: DataFrame) -> str:
    """Final physical plan as text (post-AQE where applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    plan = executed_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange hashpartitioning" in line)


def write_range_sorted(df: DataFrame, path: str, key: str,
                       num_files: int = 32) -> None:
    """Globally-sorted parquet export: repartitionByRange(key) +
    sortWithinPartitions(key). Each output file covers a disjoint key
    range (file i's max < file i+1's min), and rows are sorted inside —
    the layout consumers want for merge-reads, binary-search point
    lookups, and min/max-statistics data skipping.

    This is how a "global ORDER BY export" scales: a true global sort
    into one file serializes on a single writer; range partitioning
    samples the key distribution (RangePartitioner) to cut balanced
    ranges, then every partition sorts independently — one pass, fully
    parallel, and the concatenation of files in range order IS the
    total order.
    """
    (df.repartitionByRange(num_files, key)
       .sortWithinPartitions(key)
       .write.mode("overwrite").parquet(path))


def compact_small_files(spark: SparkSession, path: str,
                        target_bytes: int = 128 * 1024 * 1024,
                        partition_col: str | None = None) -> dict:
    """Small-file compaction — the maintenance pass every streaming sink
    eventually needs: micro-batch commits leave O(batches) tiny parquet
    files, scan parallelism degrades to file count, and the NameNode /
    listing cost grows unbounded. Rewrite the dataset so each output
    file is ~``target_bytes``.

    Mechanics: measure the current on-disk size, compute the file count
    that hits the target, and rewrite via a crash-recoverable
    stage -> swap (unique-suffix dirs; interrupted swaps are repaired on
    the next call) using
    ``repartition(n)`` — or ``repartition(n, partition_col)`` to keep a
    downstream-join key clustered through the rewrite. Returns
    before/after file counts and bytes. At 100 TB this runs per
    partition-directory (bounded unit of work), not whole-table; the
    same stage->swap pattern as ParquetUpsertSink keeps readers
    consistent (parquet dirs are swapped under a rename).
    """
    import os
    import shutil

    def _stats(p: str) -> tuple[int, int]:
        n = b = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    import glob
    import uuid

    import time

    base = path.rstrip("/")
    # Stale stage/backup dirs from a prior CRASHED run would make the
    # renames below fail; clear them first.  Two guards so the sweep
    # can't eat a CONCURRENT run's in-flight dirs: (a) glob.escape the
    # base so paths containing glob metacharacters ([, *, ?) match
    # literally; (b) only reap leftovers older than ``stale_s`` — an
    # in-flight sibling compaction's staged dir is seconds old, a
    # crashed run's leftover is not.  A leftover ._precompact.* means a
    # prior run crashed AFTER moving the live dataset aside but BEFORE
    # promoting its staged copy — restore it if the live path is gone
    # (recovery beats the age gate: the dataset is otherwise lost),
    # else drop it once stale (the live path superseded it).
    stale_s = 3600.0
    now = time.time()

    def _stale(p: str) -> bool:
        try:
            return now - os.path.getmtime(p) > stale_s
        except OSError:
            return False   # vanished underneath us — someone else owns it
    for leftover in glob.glob(glob.escape(base) + "._compacting.*"):
        if _stale(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
    for leftover in glob.glob(glob.escape(base) + "._precompact.*"):
        if not os.path.exists(path):
            os.rename(leftover, path)
        elif _stale(leftover):
            shutil.rmtree(leftover, ignore_errors=True)

    files_before, bytes_total = _stats(path)
    n_out = max(1, -(-bytes_total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    rep = (df.repartition(n_out, partition_col) if partition_col
           else df.repartition(n_out))
    run_id = uuid.uuid4().hex[:12]
    staged = f"{base}._compacting.{run_id}"
    old = f"{base}._precompact.{run_id}"
    rep.write.mode("overwrite").parquet(staged)
    # Two renames can't be one atomic op on POSIX; make the gap
    # recoverable instead: move live aside, promote staged, and roll the
    # original back if promotion fails.  A crash inside the gap leaves a
    # ._precompact.* dir that the stale-leftover sweep above restores on
    # the next invocation, so no state is ever stranded.
    os.rename(path, old)
    try:
        os.rename(staged, path)
    except OSError:
        os.rename(old, path)   # roll back to the original dataset
        shutil.rmtree(staged, ignore_errors=True)
        raise
    shutil.rmtree(old)
    files_after, bytes_after = _stats(path)
    return {"files_before": files_before, "files_after": files_after,
            "bytes_before": bytes_total, "bytes_after": bytes_after}
