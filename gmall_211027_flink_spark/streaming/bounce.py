"""CEP-equivalent bounce detection, streaming form (SURVEY §2.9 W7).

The reference uses Flink CEP: pattern = session entry (last_page_id IS
NULL) followed by another entry, within(10 s); matches and timeouts are
unioned — both mean "the first entry was a bounce"
(DwdTrafficUserJumpDetail.java:62-107).

Streaming rebuild on ``applyInPandasWithState`` keyed by device id:

- state holds the pending session-entry row (if any);
- a new entry arriving resolves the pending one: bounce if the gap
  exceeds ``bounce_gap_s`` (reference: a second entry within 10 s means
  the first had no engagement → bounce; engagement events cancel);
- a processing-time timeout flushes a pending entry as a bounce (the
  CEP timeout side-output).

The batch variant (lead() over user sequence) lives in
operators/windows.py::dwd_bounce_detection with a full oracle; this
streaming form trades the oracle for true incremental emission.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE = T.StructType([
    T.StructField("pending_ts", T.DoubleType()),   # epoch seconds of entry
    T.StructField("pending_id", T.LongType()),
])

BOUNCE_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("entry_event_id", T.LongType()),
    T.StructField("entry_ts", T.DoubleType()),
    T.StructField("is_bounce", T.BooleanType()),
])


def detect_bounces(entries: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts_s", id_col: str = "event_id",
                   bounce_gap_s: float = 600.0,
                   timeout_ms: int = 30_000) -> DataFrame:
    """``entries`` = session-entry candidate rows with ``ts_s`` epoch
    seconds. Emits one row per entry with its bounce verdict."""

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        uid = key[0]
        pending_ts, pending_id = (state.get if state.exists else (None, None))
        if state.hasTimedOut:
            state.remove()
            if pending_ts is not None:
                yield pd.DataFrame(
                    [(uid, pending_id, pending_ts, True)],
                    columns=["user_id", "entry_event_id", "entry_ts",
                             "is_bounce"])
            return
        # vectorized resolution: each entry i is resolved by entry i+1 —
        # bounce iff the gap to the next entry exceeds the threshold; the
        # last entry stays pending. The carried pending entry is row 0.
        frames = [p[[ts_col, id_col]] for p in pdfs if len(p)]
        if not frames:
            state.setTimeoutDuration(timeout_ms)
            return
        pdf = (frames[0] if len(frames) == 1 else pd.concat(frames))
        pdf = pdf.astype({ts_col: "float64", id_col: "int64"}) \
                 .sort_values([ts_col, id_col])
        ts = pdf[ts_col].to_numpy()
        ids = pdf[id_col].to_numpy()
        if pending_ts is not None:
            ts = np.concatenate(([float(pending_ts)], ts))
            ids = np.concatenate(([int(pending_id)], ids))
        state.update((float(ts[-1]), int(ids[-1])))
        state.setTimeoutDuration(timeout_ms)
        if len(ts) > 1:
            yield pd.DataFrame({
                "user_id": uid,
                "entry_event_id": ids[:-1],
                "entry_ts": ts[:-1],
                "is_bounce": (ts[1:] - ts[:-1]) > bounce_gap_s,
            })

    return (
        entries.groupBy(key_col)
        .applyInPandasWithState(
            fn, BOUNCE_SCHEMA, _STATE, "append",
            GroupStateTimeout.ProcessingTimeTimeout)
    )
