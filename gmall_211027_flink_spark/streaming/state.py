"""Stateful streaming processors (SURVEY §2.4 A5-A6, §2.2 P8, §2.9 W4).

The reference's keyed-state patterns, rebuilt on
``applyInPandasWithState`` (Arrow-batched, grouped state, timeout-driven
eviction — Spark's public stateful API):

- ``daily_unique``   — ValueState<last-seen-date>, emit first row per
  (key, day) (reference: DwdTrafficUniqueVisitorDetail.java:60-109 with
  1-day state TTL; DwsTradeCartAddUuWindow.java:79-112).
- ``first_wins``     — keep only the first row per key (reference:
  DwsTradePaymentSucWindow.java:74-102, 5 s TTL).
- ``new_visitor_fix``— is_new correction: a visitor claiming new on a
  later date than their first visit is rewritten to 0 (reference:
  BaseLogApp.java:68-118).
- ``backflow``       — returning-user detector (reference:
  DwsUserUserLoginWindow.java:83-135).

Scale notes: state lives in the state store keyed by the group column —
the same hash-shuffle the reference's keyBy does; state per key is a few
bytes (a date string). Crucially, state is BOUNDED: every processor
arms a processing-time timeout (``ttl_ms``) that mirrors the
reference's ``StateTtlConfig`` (1-day OnCreateAndWrite,
DwdTrafficUniqueVisitorDetail.java:81-91) — the timeout re-arms on
every write, and a key idle past it is evicted, so on an unbounded key
domain (mid/device ids) state tracks the ACTIVE key set, not the
all-time one. Eviction semantics match the reference's TTL: an evicted
key that returns is treated as never-seen (daily_unique re-emits — the
reference accepts the same; backflow defaults its TTL far above the
back-flow gap so detection survives eviction).

Processor bodies are vectorized pandas (cummax/masks/groupby-head) —
no per-row Python loops inside the Arrow batches.

IMPORTANT — why ``ttl_ms`` defaults to ``None``: Structured Streaming's
``Trigger.AvailableNow`` does NOT terminate while any processing-time
timer is armed — the query spins empty micro-batches waiting for the
timer to fire (measured: 54 empty batches / 30 s on pyspark 4.1). A
drain-style run (availableNow + memory sink — every correctness gate
and test here) must therefore run with ``ttl_ms=None`` or a timer small
enough to fire during the drain. CONTINUOUS deployments should arm
``ttl_ms=RECOMMENDED_TTL_MS[processor]`` — the eviction machinery is
real and tested (see tests/test_streaming_state.py TTL tests, which use
a 1 ms timer that fires between micro-batches).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("last_seen", T.StringType())])

DAY_MS = 24 * 3600 * 1000

# TTLs continuous deployments should arm (mirrors the reference's
# StateTtlConfig values; see module docstring for why the default is
# None): daily_unique/first_wins 1 day
# (DwdTrafficUniqueVisitorDetail.java:81-91), backflow 30 d (>= the
# 8-day gap it must still detect, DwsUserUserLoginWindow.java:117-121).
RECOMMENDED_TTL_MS = {
    "daily_unique": DAY_MS,
    "first_wins": DAY_MS,
    "backflow": 30 * DAY_MS,
}


def _timeout_mode(ttl_ms: int | None) -> str:
    return (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
            else GroupStateTimeout.NoTimeout)


def _concat(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return None
    return frames[0] if len(frames) == 1 else pd.concat(frames)


def daily_unique(events: DataFrame, key_col: str, ts_col: str,
                 output_schema: T.StructType,
                 order_cols: list[str] | None = None,
                 ttl_ms: int | None = None) -> DataFrame:
    """Emit each key's first row per calendar day (incremental UV detail).

    ``events`` must already carry a ``dt`` (yyyy-MM-dd) column derived
    from ``ts_col``; output_schema must be a subset of input columns.
    ``order_cols`` (default ``[ts_col]``) defines "first" — pass a
    tiebreaker column for a total order.

    ``ttl_ms`` bounds state like the reference's 1-day StateTtlConfig:
    a key idle past it is evicted and re-emits on return (same re-emit
    the reference's TTL produces). Continuous jobs should pass
    ``RECOMMENDED_TTL_MS["daily_unique"]`` (1 day); drain-style runs
    must keep ``None`` (see module docstring).
    """
    out_cols = [f.name for f in output_schema.fields]
    order_cols = order_cols or [ts_col]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()          # idle key: evict last-seen date
            return
        last_seen = state.get[0] if state.exists else None
        pdf = _concat(pdfs)
        if pdf is None:
            return
        pdf = pdf.sort_values(order_cols)
        dt = pdf["dt"]
        # first row of each strictly-increasing day prefix: emit when the
        # day exceeds everything seen before it (incl. carried state)
        prev_max = dt.cummax().shift(1)
        mask = prev_max.isna() | (dt > prev_max)
        if last_seen is not None:
            mask &= dt > last_seen
        new_last = dt.max()
        if last_seen is not None and last_seen > new_last:
            new_last = last_seen
        state.update((new_last,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        out = pdf[mask]
        if len(out):
            yield out[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append", _timeout_mode(ttl_ms))
    )


def first_wins(events: DataFrame, key_col: str, ts_col: str,
               output_schema: T.StructType,
               ttl_ms: int | None = None) -> DataFrame:
    """Keep only the first row ever seen per key (changelog de-noising).

    ``ttl_ms`` mirrors the reference's 5 s first-row-dedup TTL
    (DwsTradePaymentSucWindow.java:83-89) at a day's granularity: a key
    idle past it is evicted, and a later duplicate re-emits — the same
    trade the reference makes to bound state on an unbounded key domain.
    Continuous jobs: ``RECOMMENDED_TTL_MS["first_wins"]``; drain-style
    runs keep ``None`` (module docstring).
    """
    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        pdf = _concat(pdfs)
        if pdf is None:
            return
        first_row = pdf.sort_values([ts_col]).head(1)
        state.update(("seen",))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield first_row[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append", _timeout_mode(ttl_ms))
    )


def new_visitor_fix(events: DataFrame, key_col: str,
                    output_schema: T.StructType,
                    ttl_ms: int | None = None) -> DataFrame:
    """is_new correction (P8): first-seen date per key is remembered; any
    later row claiming is_new='1' is rewritten to '0'. Rows must carry
    ``dt`` and ``is_new`` columns.

    Default ``ttl_ms=None`` (no eviction): the reference keeps the
    first-visit date indefinitely (BaseLogApp.java:68-118 has no
    StateTtlConfig) because evicting it would let a lying ``is_new=1``
    through. Pass a TTL to bound state where that trade is acceptable.
    """
    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_dt = state.get[0] if state.exists else None
        pdf = _concat(pdfs)
        if pdf is None:
            return
        pdf = pdf.sort_values(["dt"]).copy()
        if first_dt is None:
            # backfill: an old user arriving with is_new=0 gets a
            # synthetic first date strictly before every real date
            head = pdf.iloc[0]
            first_dt = head["dt"] if head["is_new"] == "1" else ""
        mask = (pdf["is_new"] == "1") & (pdf["dt"] > first_dt)
        pdf.loc[mask, "is_new"] = "0"
        state.update((first_dt,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pdf[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append", _timeout_mode(ttl_ms))
    )


def backflow(events: DataFrame, key_col: str,
             output_schema: T.StructType,
             min_gap_days: int = 2,
             ttl_ms: int | None = None) -> DataFrame:
    """Returning-user ("back-flow") detector — emit a row when a key is
    active again after >= min_gap_days of absence (reference: back-flow
    users with a 7-day ValueState gap check,
    DwsUserUserLoginWindow.java:83-135, `days >= 8` at :117-121; gap
    scaled to this dataset's density). State per key is the last active
    DATE string — constant size, the same footprint as daily_unique.

    Continuous jobs should arm ``RECOMMENDED_TTL_MS["backflow"]`` =
    30 days — comfortably above the back-flow gap, so every detectable
    gap (>= min_gap_days, << 30 d) still has its last-seen date in
    state when the user returns; only keys idle longer than ANY gap
    we'd report are evicted. Drain-style runs keep ``None``.

    ``events`` must carry a ``dt`` (yyyy-MM-dd) column. Output rows are
    (key, dt, gap_days) projected to output_schema.
    """
    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_seen = state.get[0] if state.exists else None
        pdf = _concat(pdfs)
        if pdf is None:
            return
        dts = sorted(pdf["dt"].unique())
        if last_seen is not None:
            dts = [d for d in dts if d > last_seen]
        if not dts:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        # consecutive-day gaps over [last_seen?] + new ascending days;
        # position 0 has no predecessor (no emission for it)
        seq = ([last_seen] if last_seen is not None else []) + dts
        gaps = pd.to_datetime(pd.Series(seq)).diff().dt.days
        state.update((dts[-1],))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if len(seq) > 1:
            emit = pd.DataFrame({
                key_col: key[0],
                "dt": seq[1:],
                "gap_days": gaps.iloc[1:].astype("int64").to_numpy(),
            })
            out = emit[emit["gap_days"] >= min_gap_days]
            if len(out):
                yield out[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append", _timeout_mode(ttl_ms))
    )


FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("lv", T.LongType()),    # latest view epoch-second
    T.StructField("am", T.LongType()),    # best anchoring-view es from a valid click
    T.StructField("l1", T.IntegerType()),
    T.StructField("l2", T.IntegerType()),
    T.StructField("l3", T.IntegerType()),
    T.StructField("me", T.LongType()),    # max event-time seen (monotonicity check)
])


def funnel_levels(events: DataFrame, window_s: int,
                  output_schema: T.StructType,
                  ttl_ms: int | None = None) -> DataFrame:
    """Per-user windowed-funnel level (view -> click -> purchase within
    ``window_s`` of the anchoring view) as KEYED STATE — the streaming
    form of plans/behavior.py::ads_window_funnel's greedy running
    anchors (the CEP pattern the reference builds with Flink CEP,
    DwdTrafficUserJumpDetail.java:44-88, here as two running maxima in
    state). Emits each user's level-so-far once per micro-batch; the
    level is monotone non-decreasing across batches (state carries the
    anchors), so the drained final level is MAX over emissions.

    ASSUMPTION (mirror of Flink CEP's watermark requirement): event
    time must be non-decreasing ACROSS micro-batches per key.  The
    greedy fold never revisits past events, so a view/click anchor
    arriving in a later batch than its purchase would silently lower
    the level.  Rather than trust the caller, the state carries the max
    event-time seen (``me``) and the fold RAISES if a batch delivers an
    event older than a previously processed one — loud failure instead
    of a silently wrong funnel.  (Within a single batch any order is
    fine: the batch is sorted before folding.)

    Input must carry (user_id, es, event_id, event_type). Vectorized
    pandas (cummax/shift) — no per-row loops.
    """
    def fn(key, pdfs, state: GroupState):
        import numpy as np
        if state.hasTimedOut:
            state.remove()
            return
        lv, am, l1, l2, l3, me = (state.get if state.exists
                                  else (None, None, 0, 0, 0, None))
        pdf = _concat(pdfs)
        if pdf is None:
            return
        pdf = pdf.sort_values(["es", "event_id"])
        es = pdf["es"].to_numpy()
        if me is not None and len(es) and int(es[0]) < me:
            raise ValueError(
                f"funnel_levels: out-of-order batch for key {key}: event "
                f"time {int(es[0])} precedes already-folded max {me}; the "
                "greedy anchor fold requires event time non-decreasing "
                "across micro-batches (see docstring)")
        typ = pdf["event_type"].to_numpy()
        neg = np.int64(-(1 << 62))
        # running "latest view strictly earlier", seeded by state
        v = np.where(typ == "view", es, neg)
        lv_run = np.maximum.accumulate(v)
        lv_prev = np.concatenate(([neg], lv_run[:-1]))
        if lv is not None:
            lv_prev = np.maximum(lv_prev, lv)
        is_click = typ == "click"
        ca = np.where(is_click & (lv_prev > neg)
                      & (es - lv_prev <= window_s), lv_prev, neg)
        am_run = np.maximum.accumulate(ca)
        am_prev = np.concatenate(([neg], am_run[:-1]))
        if am is not None:
            am_prev = np.maximum(am_prev, am)
        hit3 = ((typ == "purchase") & (am_prev > neg)
                & (es - am_prev <= window_s))
        l1 = max(l1, int((typ == "view").any()))
        l2 = max(l2, int((ca > neg).any()))
        l3 = max(l3, int(hit3.any()))
        new_lv = int(lv_run[-1]) if lv_run[-1] > neg else lv
        if lv is not None and new_lv is not None:
            new_lv = max(new_lv, lv)
        new_am = int(am_run[-1]) if am_run[-1] > neg else am
        if am is not None and new_am is not None:
            new_am = max(new_am, am)
        new_me = int(es[-1]) if len(es) else me
        if me is not None and new_me is not None:
            new_me = max(new_me, me)
        state.update((new_lv, new_am, l1, l2, l3, new_me))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        level = 3 if l3 else (2 if l2 else (1 if l1 else 0))
        yield pd.DataFrame({"user_id": [key[0]], "level": [level]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn, output_schema, FUNNEL_STATE_SCHEMA, "append",
                _timeout_mode(ttl_ms)))
