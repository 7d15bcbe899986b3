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

Scale notes: state lives in the state store keyed by the group column —
the same hash-shuffle the reference's keyBy does; state per key is a few
bytes (a date string), so 10^9 keys ≈ tens of GB across the cluster.
Timeouts bound state exactly like the reference's StateTtlConfig.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("last_seen", T.StringType())])


def daily_unique(events: DataFrame, key_col: str, ts_col: str,
                 output_schema: T.StructType,
                 order_cols: list[str] | None = None) -> DataFrame:
    """Emit each key's first row per calendar day (incremental UV detail).

    ``events`` must already carry a ``dt`` (yyyy-MM-dd) column derived
    from ``ts_col``; output_schema must be a subset of input columns.
    ``order_cols`` (default ``[ts_col]``) defines "first" — pass a
    tiebreaker column for a total order.
    """
    out_cols = [f.name for f in output_schema.fields]
    order_cols = order_cols or [ts_col]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last_seen = state.get[0] if state.exists else None
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_cols)
            for _, row in pdf.iterrows():
                dt = row["dt"]
                if last_seen is None or dt > last_seen:
                    outs.append(row)
                    last_seen = dt
        state.update((last_seen,))
        if outs:
            yield pd.DataFrame(outs)[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout)
    )


def first_wins(events: DataFrame, key_col: str, ts_col: str,
               output_schema: T.StructType) -> DataFrame:
    """Keep only the first row ever seen per key (changelog de-noising)."""
    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first_row = None
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col])
            if len(pdf) and first_row is None:
                first_row = pdf.iloc[[0]]
        if first_row is not None:
            state.update(("seen",))
            yield first_row[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout)
    )


def new_visitor_fix(events: DataFrame, key_col: str,
                    output_schema: T.StructType) -> DataFrame:
    """is_new correction (P8): first-seen date per key is remembered; any
    later row claiming is_new='1' is rewritten to '0'. Rows must carry
    ``dt`` and ``is_new`` columns."""
    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        first_dt = state.get[0] if state.exists else None
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["dt"]).copy()
            for i, row in pdf.iterrows():
                if first_dt is None:
                    # backfill: old user arriving with is_new=0 gets a
                    # synthetic first date strictly before today
                    first_dt = row["dt"] if row["is_new"] == "1" else ""
                elif row["is_new"] == "1" and row["dt"] > first_dt:
                    pdf.at[i, "is_new"] = "0"
            outs.append(pdf)
        state.update((first_dt,))
        for o in outs:
            yield o[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout)
    )


def backflow(events: DataFrame, key_col: str,
             output_schema: T.StructType,
             min_gap_days: int = 2) -> DataFrame:
    """Returning-user ("back-flow") detector — emit a row when a key is
    active again after >= min_gap_days of absence (reference: back-flow
    users with a 7-day ValueState gap check,
    DwsUserUserLoginWindow.java:83-135, `days >= 8` at :117-121; gap
    scaled to this dataset's density). State per key is the last active
    DATE string — constant size, the same footprint as daily_unique.

    ``events`` must carry a ``dt`` (yyyy-MM-dd) column; rows within a
    batch are processed in (dt) order per key. Output rows are
    (key, dt, gap_days) projected to output_schema.
    """
    from datetime import date

    out_cols = [f.name for f in output_schema.fields]

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last_seen = state.get[0] if state.exists else None
        outs = []
        for pdf in pdfs:
            for dt in sorted(pdf["dt"].unique()):
                if last_seen is not None and dt > last_seen:
                    gap = (date.fromisoformat(dt)
                           - date.fromisoformat(last_seen)).days
                    if gap >= min_gap_days:
                        outs.append({key_col: key[0], "dt": dt,
                                     "gap_days": gap})
                if last_seen is None or dt > last_seen:
                    last_seen = dt
        state.update((last_seen,))
        if outs:
            yield pd.DataFrame(outs)[out_cols]

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, output_schema, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout)
    )
