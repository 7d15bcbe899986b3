"""Scalar-function helpers (SURVEY §2.8 parity + oracle-exactness utilities).

Oracle-exactness convention used across the engine's query pack:

- Money/metric *sums* are computed in DECIMAL (exact, associative — immune
  to partition-order float drift) and only cast to DOUBLE at the output
  boundary. The paired DuckDB oracle does the identical decimal
  computation, so value hashes match bit-for-bit.
- Averages are emitted as one double division of exact operands
  (``CAST(sum_dec AS DOUBLE) / count``) — same operands → same IEEE result
  in both engines.
- Timestamps are emitted as formatted strings (Spark session tz pinned to
  UTC; DuckDB is tz-naive) so serialization differences can't leak into
  the comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(c: Column | str) -> Column:
    """Cast to the canonical exact decimal type used for metric math."""
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def dsum(c: Column | str) -> Column:
    """Exact decimal sum, emitted as double (order-independent)."""
    return F.sum(dec(c)).cast("double")


def dsum_expr(c: Column) -> Column:
    """Exact decimal sum of an already-decimal expression, emitted as double."""
    return F.sum(c).cast("double")


def day_str(ts: Column | str) -> Column:
    """Event-day string, the reference's ``yyyy-MM-dd`` partition key
    (reference: utils/DateFormatUtil.java:14-39)."""
    return F.date_format(ts, "yyyy-MM-dd")


def bucket_start_str(ts: Column | str, seconds: int) -> Column:
    """Tumbling-window start as a formatted string.

    Equivalent to Flink TUMBLE_START + DATE_FORMAT (reference:
    DwsTrafficSourceKeywordPageViewWindow.java:74-75); computed via the
    native ``window()`` so Catalyst plans it as a single project.
    """
    return F.date_format(
        F.window(ts if isinstance(ts, Column) else F.col(ts),
                 f"{seconds} seconds").start,
        "yyyy-MM-dd HH:mm:ss",
    )


def hex_to_long(hexstr: Column, start: int = 1, length: int = 15) -> Column:
    """Parse a slice of a hex digest into a non-negative BIGINT.

    ``length <= 15`` keeps the value under 2^60 (no sign issues). The
    DuckDB-equivalent is ``('0x' || substr(h, start, length))::BIGINT`` —
    both engines parse hex deterministically, which gives us portable
    content-derived hash values (minhash/simhash/LSH seeds).
    """
    return F.conv(F.substring(hexstr, start, length), 16, 10).cast("bigint")
