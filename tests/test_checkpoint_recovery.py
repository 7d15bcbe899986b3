"""Checkpoint/state recovery (SURVEY W9): a stateful streaming query is
stopped and restarted against the SAME checkpoint; the state store must
carry the dedup state across the restart — no re-emission of keys seen
before the stop, and the union of both runs' output must equal the batch
ground truth over all input.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_211027_flink_spark.streaming.state import daily_unique

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("dt", T.StringType()),
    T.StructField("event_id", T.LongType()),
])
IN_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("dt", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("event_id", T.LongType()),
])


def _row(user, dt, ts, eid):
    return json.dumps({"user_id": user, "dt": dt, "ts": ts, "event_id": eid})


def _run_once(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src))
    uv = daily_unique(stream, "user_id", "ts", OUT_SCHEMA,
                      order_cols=["ts", "event_id"])
    q = (uv.writeStream.format("parquet").option("path", str(out_dir))
         .option("checkpointLocation", str(ckpt))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_state_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    # run 1: users 1 and 2 each emit once on day 1
    (src / "b1.json").write_text("\n".join([
        _row(1, "2024-01-01", 10, 100),
        _row(1, "2024-01-01", 11, 101),   # same day -> suppressed
        _row(2, "2024-01-01", 12, 102),
    ]))
    _run_once(spark, src, ckpt, out)
    got1 = spark.read.schema(OUT_SCHEMA).parquet(str(out)).collect()
    assert {(r["user_id"], r["dt"]) for r in got1} == {(1, "2024-01-01"), (2, "2024-01-01")}

    # run 2 (fresh query object, same checkpoint): a replay of user 1 day 1
    # must be suppressed BY RECOVERED STATE; day 2 and user 3 emit
    (src / "b2.json").write_text("\n".join([
        _row(1, "2024-01-01", 20, 200),   # replay -> state must suppress
        _row(1, "2024-01-02", 21, 201),
        _row(3, "2024-01-01", 22, 202),
    ]))
    _run_once(spark, src, ckpt, out)
    got2 = spark.read.schema(OUT_SCHEMA).parquet(str(out)).collect()
    emitted = {(r["user_id"], r["dt"]) for r in got2}
    assert emitted == {
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-02"), (3, "2024-01-01"),
    }
    # the replayed (1, day1) row was emitted exactly once across both runs
    day1_u1 = [r for r in got2 if r["user_id"] == 1 and r["dt"] == "2024-01-01"]
    assert len(day1_u1) == 1 and day1_u1[0]["event_id"] == 100
