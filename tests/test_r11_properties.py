"""Hypothesis property tests for round-11 additions."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(pools=st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),
              st.integers(min_value=1, max_value=40)),
    min_size=1, max_size=14))
def test_minimax_isotonic_is_monotone_and_mass_preserving(pools):
    pools = [(min(s, c), c) for s, c in pools]
    pre_s, pre_c = [0], [0]
    for s, c in pools:
        pre_s.append(pre_s[-1] + s)
        pre_c.append(pre_c[-1] + c)

    def mean(j, k):
        return Fraction(pre_s[k + 1] - pre_s[j], pre_c[k + 1] - pre_c[j])

    n = len(pools)
    fit = [max(min(mean(j, k) for k in range(i, n))
               for j in range(i + 1)) for i in range(n)]
    assert fit == sorted(fit)
    # isotonic regression preserves the weighted total
    assert sum(f * c for f, (s, c) in zip(fit, pools)) == sum(
        s for s, _ in pools)


@settings(max_examples=40, deadline=None)
@given(data=st.lists(st.integers(min_value=0, max_value=255),
                     min_size=1, max_size=400),
       seed=st.integers(min_value=0, max_value=10**6))
def test_bmp_rle8_roundtrips_arbitrary_rows(data, seed):
    """RLE8 encode/decode roundtrip on arbitrary single-row images
    built through the real synthesizer's building blocks."""
    from gmall_211027_flink_spark.operators.multimodal import (
        decode_bmp_rle8)
    import struct

    w = len(data)
    idx = [255 - v for v in data]
    enc = bytearray()
    i = 0
    while i < w:                      # encoded runs
        j = i
        while j < w and idx[j] == idx[i] and j - i < 255:
            j += 1
        enc += bytes([j - i, idx[i]])
        i = j
    enc += bytes([0, 0, 0, 1])
    palette = bytes(b for k in range(256)
                    for b in (255 - k, 255 - k, 255 - k, 0))
    off = 54 + len(palette)
    payload = (b"BM" + struct.pack("<IHHI", off + len(enc), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1,
                             len(enc), 0, 0, 256, 0)
               + palette + bytes(enc))
    w2, ht2, img = decode_bmp_rle8(payload)
    assert (w2, ht2) == (w, 1)
    assert img[0].tolist() == data


@settings(max_examples=60, deadline=None)
@given(x1=st.integers(min_value=0, max_value=10**5),
       n1=st.integers(min_value=2, max_value=10**5),
       x2=st.integers(min_value=0, max_value=10**5),
       n2=st.integers(min_value=2, max_value=10**5))
def test_cochran_armitage_two_group_matches_two_proportion_z(
        x1, n1, x2, n2):
    """With exactly two groups and scores {1, 2}, the CA trend z must
    equal the pooled two-proportion z in magnitude."""
    x1, x2 = min(x1, n1), min(x2, n2)
    xx, nn = x1 + x2, n1 + n2
    if xx == 0 or xx == nn:
        return
    p = xx / nn
    tx = 1 * x1 + 2 * x2
    tn = 1 * n1 + 2 * n2
    ttn = 1 * n1 + 4 * n2
    ca = (nn * tx - xx * tn) / nn / np.sqrt(
        p * (1 - p) * (ttn - tn * tn / nn))
    z2 = (x1 / n1 - x2 / n2) / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    assert abs(abs(ca) - abs(z2)) < 1e-9 * max(1.0, abs(z2))


@settings(max_examples=30, deadline=None)
@given(counts=st.lists(st.integers(min_value=0, max_value=50),
                       min_size=1, max_size=40),
       split=st.integers(min_value=0, max_value=39))
def test_ams_z_is_linear_in_count_splits(counts, split):
    """The streaming-store premise: Z over merged counts == sum of
    per-batch Z (linearity), for the real md5 sign function."""
    split = min(split, len(counts))

    def sign(u, j):
        return 1 - 2 * (int(hashlib.md5(
            f"{u}-{j}".encode()).hexdigest()[0], 16) % 2)

    for j in (0, 3):
        full = sum(sign(u, j) * c for u, c in enumerate(counts))
        b1 = sum(sign(u, j) * c for u, c in enumerate(counts[:split]))
        b2 = sum(sign(u, j) * c
                 for u, c in enumerate(counts[split:], start=split))
        assert full == b1 + b2


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.integers(min_value=-100, max_value=100),
                     min_size=4, max_size=60))
def test_cvm_u_statistic_is_order_invariant_and_nonnegative(vals):
    """CvM's U from ranks must not depend on input order and is >= its
    theoretical lattice minimum."""
    n = len(vals) // 2
    a, b = vals[:n], vals[n:]

    def u_of(a, b):
        pooled = sorted([(v, 0, i) for i, v in enumerate(a)]
                        + [(v, 1, i) for i, v in enumerate(b)])
        ra = [r for r, (_, s, _) in enumerate(pooled, 1) if s == 0]
        rb = [r for r, (_, s, _) in enumerate(pooled, 1) if s == 1]
        return (len(a) * sum((r - i) ** 2
                             for i, r in enumerate(ra, 1))
                + len(b) * sum((r - i) ** 2
                               for i, r in enumerate(rb, 1)))

    u1 = u_of(a, b)
    u2 = u_of(list(reversed(a)), list(reversed(b)))
    assert u1 == u2 >= 0
