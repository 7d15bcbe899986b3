"""Invariant tests for round-11 additions (engine-independent cores)."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import numpy as np
import pytest


# ---------------------------------------------------------------- isotonic
def _minimax_iso(pools):
    """fit[i] = max_{j<=i} min_{k>=i} mean(y[j..k]) in exact Fractions."""
    n = len(pools)
    pre_s = [0]
    pre_c = [0]
    for s, c in pools:
        pre_s.append(pre_s[-1] + s)
        pre_c.append(pre_c[-1] + c)

    def mean(j, k):
        return Fraction(pre_s[k + 1] - pre_s[j], pre_c[k + 1] - pre_c[j])

    return [max(min(mean(j, k) for k in range(i, n))
                for j in range(i + 1))
            for i in range(n)]


def _pava(pools):
    """Classic sequential pool-adjacent-violators in exact Fractions."""
    stack = []      # (sum, cnt)
    for s, c in pools:
        stack.append((s, c))
        while len(stack) > 1 and \
                Fraction(stack[-2][0], stack[-2][1]) > \
                Fraction(stack[-1][0], stack[-1][1]):
            s2, c2 = stack.pop()
            s1, c1 = stack.pop()
            stack.append((s1 + s2, c1 + c2))
    out = []
    for s, c in stack:
        out.extend([Fraction(s, c)] * c_pools_len(s, c))
    return stack


def c_pools_len(s, c):  # helper kept trivial for clarity
    return 1


def _pava_fits(pools):
    """Per-input-pool fitted means from the PAVA stack."""
    stack = []      # (sum, cnt, n_pools)
    for s, c in pools:
        stack.append((s, c, 1))
        while len(stack) > 1 and \
                Fraction(stack[-2][0], stack[-2][1]) > \
                Fraction(stack[-1][0], stack[-1][1]):
            s2, c2, k2 = stack.pop()
            s1, c1, k1 = stack.pop()
            stack.append((s1 + s2, c1 + c2, k1 + k2))
    fits = []
    for s, c, k in stack:
        fits.extend([Fraction(s, c)] * k)
    return fits


@pytest.mark.parametrize("seed", range(12))
def test_minimax_isotonic_equals_sequential_pava(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 20))
    pools = [(int(rng.integers(0, 50)), int(rng.integers(1, 50)))
             for _ in range(n)]
    pools = [(min(s, c), c) for s, c in pools]   # rates in [0, 1]
    assert _minimax_iso(pools) == _pava_fits(pools)


def test_minimax_isotonic_key_separates_rationals():
    # the 1e13 floor key must order all rationals with num<=9e5 exactly
    from gmall_211027_flink_spark.operators.mlfit import ISO_KEY_SCALE
    vals = [(3, 7), (42, 98), (1, 3), (2, 6), (5, 11)]
    keys = [(s * ISO_KEY_SCALE) // c for s, c in vals]
    fracs = [Fraction(s, c) for s, c in vals]
    for i in range(len(vals)):
        for j in range(len(vals)):
            assert (keys[i] < keys[j]) == (fracs[i] < fracs[j]) or \
                   fracs[i] == fracs[j]
            if fracs[i] == fracs[j]:
                assert keys[i] == keys[j]


# ------------------------------------------------------- progressive JPEG
def test_progressive_roundtrip_matches_analytic_field():
    from gmall_211027_flink_spark.operators.jpeg import (
        DEN, LUT, ZIGZAG, _prog_coef_block, decode_jpeg_gray_progressive,
        jpeg_qtable, synthesize_jpeg_gray_progressive)
    L = np.array(LUT, dtype=np.int64)
    for doc_id in (0, 3, 7, 11):
        h = hashlib.md5(f"doc{doc_id}".encode()).hexdigest()
        payload = synthesize_jpeg_gray_progressive(doc_id, h)
        w, ht, img = decode_jpeg_gray_progressive(payload)
        a = 1 + int(h[12:14], 16) % 7
        b = 1 + int(h[14:16], 16) % 5
        c = int(h[16:18], 16)
        exp = np.zeros((ht, w), dtype=np.int64)
        for by in range(ht // 8):
            for bx in range(w // 8):
                dc, acs = _prog_coef_block(bx, by, a, b, c)
                zz = [0] * 64
                zz[0] = dc
                for z, v in acs.items():
                    zz[z] = v
                coef = np.zeros((8, 8), dtype=np.int64)
                for z, (r, cc) in enumerate(ZIGZAG):
                    coef[r, cc] = zz[z] * jpeg_qtable(z)
                S = L @ coef @ L.T
                px = (S + DEN // 2 + 1024 * DEN) // DEN - 1024 + 128
                exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    np.clip(px, 0, 255)
        assert (img == exp).all()


def test_progressive_decoder_rejects_successive_approximation():
    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray_progressive, synthesize_jpeg_gray_progressive)
    h = hashlib.md5(b"x").hexdigest()
    payload = bytearray(synthesize_jpeg_gray_progressive(1, h))
    # find the first AC SOS (Ss=1) and set Al=1
    i = payload.find(bytes([0xFF, 0xDA]))
    i = payload.find(bytes([0xFF, 0xDA]), i + 2)   # second scan header
    # SOS body: len(2) ncomp(1) comp(2) Ss Se AhAl
    payload[i + 9] = 0x01
    with pytest.raises(ValueError, match="successive approximation"):
        decode_jpeg_gray_progressive(bytes(payload))


def test_progressive_and_baseline_reject_each_other():
    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, decode_jpeg_gray_progressive,
        synthesize_jpeg_gray, synthesize_jpeg_gray_progressive)
    h = hashlib.md5(b"y").hexdigest()
    with pytest.raises(ValueError, match="non-baseline SOF"):
        decode_jpeg_gray(synthesize_jpeg_gray_progressive(2, h))
    with pytest.raises(ValueError, match="not progressive-DCT"):
        decode_jpeg_gray_progressive(synthesize_jpeg_gray(2, h))


# ----------------------------------------------------------- palette PNG
def test_palette_png_roundtrip_and_errors():
    from gmall_211027_flink_spark.operators.multimodal import (
        PALETTE_SIZE, _palette_entries, decode_png_palette,
        synthesize_png_palette)
    h = hashlib.md5(b"p").hexdigest()
    payload = synthesize_png_palette(5, h)
    w, ht, luma = decode_png_palette(payload)
    a = 1 + int(h[12:14], 16) % 7
    b = 1 + int(h[14:16], 16) % 5
    c = int(h[16:18], 16)
    pal = _palette_entries(a, b, c)
    exp = np.array(
        [[sum(m * v for m, v in zip((299, 587, 114),
                                    pal[(a * x + b * y + c) % PALETTE_SIZE]))
          for x in range(w)] for y in range(ht)], dtype=np.int64)
    assert (luma == exp).all()
    # grayscale decoder must reject color type 3
    from gmall_211027_flink_spark.operators.multimodal import \
        decode_png_gray
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png_gray(payload)


# ------------------------------------------------------------ Misra-Gries
def _mg_fold(batches, k):
    state: dict = {}
    for batch in batches:
        for x, c in batch.items():
            state[x] = state.get(x, 0) + c
        if len(state) > k:
            t = sorted(state.values(), reverse=True)[k]
            state = {x: c - t for x, c in state.items() if c > t}
    return state


@pytest.mark.parametrize("seed", range(8))
def test_mg_merge_never_overestimates_and_bounds_error(seed):
    rng = np.random.default_rng(seed)
    k = 8
    stream = rng.integers(0, 30, size=600)
    batches = []
    for i in range(3):
        seg = stream[i * 200:(i + 1) * 200]
        vals, cnts = np.unique(seg, return_counts=True)
        batches.append(dict(zip(vals.tolist(), cnts.tolist())))
    est = _mg_fold(batches, k)
    true = {}
    for b in batches:
        for x, c in b.items():
            true[x] = true.get(x, 0) + c
    assert len(est) <= k
    for x, c in est.items():
        assert c <= true[x]                       # one-sided
        # mergeable-MG guarantee: under-estimate <= N / (k+1)
        assert true[x] - c <= 600 // (k + 1) + 1


# ------------------------------------------------------------ rank tests
def test_cvm_and_ad_on_identical_samples_are_minimal():
    # identical cohorts -> U at its lattice minimum, A2 near 0
    # CvM rank form: a = [1,3,5...], b = [2,4,6...] (interleaved equal)
    n = 50
    pooled = [(v, s) for v in range(n) for s in (0, 1)]
    r_of = {}
    for idx, (v, s) in enumerate(sorted(pooled), start=1):
        r_of.setdefault(s, []).append(idx)
    u = sum((r - i) ** 2 for i, r in enumerate(r_of[0], start=1)) * n \
        + sum((r - i) ** 2 for i, r in enumerate(r_of[1], start=1)) * n
    t = u / (n * n * 2 * n) - (4 * n * n - 1) / (6 * 2 * n)
    assert t < 0.1


def test_jonckheere_reduces_to_mann_whitney_for_two_groups():
    # with 2 groups, 2*JT must equal 2*U (counting form)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10, 30)
    b = rng.integers(0, 10, 40)
    jt2 = sum(2 * int(x < y) + int(x == y) for x in a for y in b)
    u2 = 2 * sum(int(x < y) + 0.5 * int(x == y) for x in a for y in b)
    assert jt2 == int(u2)


def test_hodges_lehmann_shift_equivariance():
    rng = np.random.default_rng(4)
    d = rng.integers(-50, 50, 25).tolist()

    def hl4(vals):
        # walsh holds 2x averages (vi + vj); HL at x4 scale:
        # odd m -> 2 * middle, even m -> sum of the two middles
        walsh = sorted(vals[i] + vals[j]
                       for i in range(len(vals))
                       for j in range(i, len(vals)))
        m = len(walsh)
        if m % 2:
            return 2 * walsh[(m - 1) // 2]
        return walsh[m // 2 - 1] + walsh[m // 2]

    base = hl4(d)
    shifted = hl4([x + 7 for x in d])
    assert shifted - base == 7 * 4   # HL(x + c) = HL(x) + c at x4 scale


# --------------------------------------------------------------- AMS F2
def test_ams_sign_hash_is_balanced_and_mixing():
    import hashlib as _h
    signs = [1 - 2 * (int(_h.md5(f"{u}-0".encode()).hexdigest()[0], 16)
                      % 2) for u in range(2000)]
    assert abs(sum(signs)) < 200
    # adjacent-u correlation must be weak (the multiplicative-bit bug)
    corr = sum(signs[i] * signs[i + 1] for i in range(1999))
    assert abs(corr) < 200


# --------------------------------------------------------- closeness BFS
def test_harmonic_x12_is_exact_for_depths_up_to_4():
    for d, w in ((1, 12), (2, 6), (3, 4), (4, 3)):
        assert Fraction(12, d) == w


# ------------------------------------------------------------- k-truss
def test_truss_peel_on_known_graph():
    # K4 plus a pendant triangle edge: K4 edges survive support>=2,
    # everything else peels
    edges = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (4, 6)}

    def peel(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b) for a, b in es
                if len(adj[a] & adj[b]) >= 2}

    cur = edges
    for _ in range(3):
        cur = peel(cur)
    assert cur == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


# ------------------------------------------------------- overlap buckets
def test_double_bucket_expansion_covers_every_overlap():
    from gmall_211027_flink_spark.operators.joins import OVERLAP_BUCKET_US
    rng = np.random.default_rng(5)
    w = OVERLAP_BUCKET_US
    for _ in range(300):
        a_lo = int(rng.integers(0, 10 * w))
        a_hi = a_lo + int(rng.integers(0, 3 * w))
        b_lo = int(rng.integers(0, 10 * w))
        b_hi = b_lo + int(rng.integers(0, w // 2))
        overlap = a_lo <= b_hi and b_lo <= a_hi
        a_buckets = set(range(a_lo // w, a_hi // w + 1))
        b_buckets = set(range(b_lo // w, b_hi // w + 1))
        if overlap:
            assert a_buckets & b_buckets
