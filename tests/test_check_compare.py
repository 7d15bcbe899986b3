"""Unit tests for scripts/check.py's compare() — the local replica of
the driver's value-hash. A silent regression here would weaken every
gate in the repo, so the comparator itself is pinned: type-lossy
int-vs-float reds (the r9/r10 stats_cramers_v class), order
insensitivity, NaN/None equivalence, and the midnight-timestamp/date
pairing rule."""

from __future__ import annotations

import datetime

import numpy as np

from scripts.check import compare, norm_cell


def test_int_vs_float_same_value_is_a_mismatch():
    """bigint 60000 vs float64 60000.0 must RED — exactly how the
    driver's hash saw the HUGEINT-through-pandas bug."""
    problems = compare("t", [(60000,)], ["n"], [(60000.0,)], ["n"])
    assert problems and "TYPE-LOSSY" in problems[0]


def test_column_and_row_order_insensitive():
    sp = [(1, "a"), (2, "b")]
    du = [("b", 2), ("a", 1)]
    assert compare("t", sp, ["x", "y"], du, ["y", "x"]) == []


def test_rowcount_mismatch_short_circuits():
    problems = compare("t", [(1,)], ["x"], [(1,), (2,)], ["x"])
    assert problems == ["rowcount spark=1 duck=2"]


def test_column_name_mismatch_detected():
    problems = compare("t", [(1,)], ["x"], [(1,)], ["y"])
    assert problems and problems[0].startswith("columns")


def test_nan_and_none_are_equivalent_nulls():
    assert norm_cell(float("nan")) == ("null", None)
    assert compare("t", [(None,)], ["x"], [(float("nan"),)], ["x"]) == []


def test_midnight_timestamp_pairs_with_date():
    d = datetime.date(2024, 3, 1)
    ts = datetime.datetime(2024, 3, 1, 0, 0)
    assert norm_cell(ts) == norm_cell(d) == ("date", d)
    # a NON-midnight timestamp stays a timestamp — no false pairing
    assert norm_cell(datetime.datetime(2024, 3, 1, 0, 1))[0] == "ts"


def test_numpy_scalars_normalize_like_python():
    assert norm_cell(np.int64(5)) == ("int", 5)
    assert norm_cell(np.float64(5.5)) == ("float", 5.5)
    assert norm_cell(np.bool_(True)) == ("bool", True)


def test_nested_arrays_compare_elementwise():
    assert compare("t", [([1, 2],)], ["a"],
                   [(np.array([1, 2]),)], ["a"]) == []
    problems = compare("t", [([1, 2],)], ["a"], [([1, 2.0],)], ["a"])
    assert problems            # int vs float INSIDE the array still reds


def test_float_diff_reported_with_magnitude():
    problems = compare("t", [(1.0,)], ["x"], [(1.5,)], ["x"])
    assert problems and "max_float_diff=0.5" in problems[0]
