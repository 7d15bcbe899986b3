"""Round-9 property tests — pure Python (no Spark session): Shapley
axioms on random lattices, canonical-Huffman round trips on random
tables, Holt-fold bit-equivalence, HLL merge commutativity."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

SETTINGS = settings(max_examples=50, deadline=None)

W4 = {0: 6, 1: 2, 2: 2, 3: 6}   # |S|!(3-|S|)! for n = 4 channels


def _v(cnt: dict[int, int], s: int) -> int:
    return sum(c for m, c in cnt.items() if (m & ~s) == 0)


def _phi24(cnt: dict[int, int], bit: int) -> int:
    return sum(W4[bin(s).count("1")] * (_v(cnt, s | bit) - _v(cnt, s))
               for s in range(16) if not s & bit)


@SETTINGS
@given(st.dictionaries(st.integers(0, 15), st.integers(0, 50),
                       max_size=16))
def test_shapley_efficiency_on_random_lattices(cnt):
    """sum phi*24 == 24*(v(full) - v(empty)) for ANY mask-count table —
    the identity the driver-gated query relies on."""
    total = sum(_phi24(cnt, 1 << i) for i in range(4))
    assert total == 24 * (_v(cnt, 15) - _v(cnt, 0))


@SETTINGS
@given(st.dictionaries(st.integers(0, 15), st.integers(0, 50),
                       max_size=16))
def test_shapley_symmetry_axiom(cnt):
    """Two channels that appear identically (swap-invariant lattice)
    must receive equal credit: symmetrize the table over bits 0<->1
    and check phi_0 == phi_1."""
    def swap01(m):
        b0, b1 = m & 1, (m >> 1) & 1
        return (m & ~3) | (b0 << 1) | b1
    sym: dict[int, int] = {}
    for m, c in cnt.items():
        sym[m] = sym.get(m, 0) + c
        sm = swap01(m)
        sym[sm] = sym.get(sm, 0) + c
    assert _phi24(sym, 1) == _phi24(sym, 2)


@SETTINGS
@given(st.lists(st.integers(0, 255), min_size=1, max_size=64,
                unique=True),
       st.integers(3, 10))
def test_canonical_huffman_roundtrip(symbols, length):
    """Any all-one-length canonical table (Kraft-feasible) must encode/
    decode every symbol losslessly through the real bit writer/reader."""
    from gmall_211027_flink_spark.operators.jpeg import (
        _BitReader, _BitWriter, _canonical_decode_table,
        _canonical_encode_table)
    if len(symbols) >= (1 << length):          # Kraft infeasible: skip
        return
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    enc = _canonical_encode_table(bits, symbols)
    dec = _canonical_decode_table(bits, symbols)
    bw = _BitWriter()
    for sym in symbols:
        code, ln = enc[sym]
        bw.write(code, ln)
    br = _BitReader(bw.flush())

    def read_one():
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (ln, code) in dec:
                return dec[(ln, code)]
        raise AssertionError("invalid code")

    assert [read_one() for _ in symbols] == symbols


@SETTINGS
@given(st.lists(st.integers(1, 4000), min_size=2, max_size=60))
def test_holt_fold_expression_matches_python(ys):
    """The shared _HOLT_STEP SQL text, evaluated in DuckDB's
    list_reduce, must equal the plain-Python recursion for arbitrary
    weekly series."""
    import duckdb

    from gmall_211027_flink_spark.operators.aggregates import _HOLT_STEP
    step = _HOLT_STEP.format(D="//")
    con = duckdb.connect()
    arr = ", ".join(f"CAST({y} AS BIGINT)" for y in ys)
    (acc,) = con.execute(
        f"SELECT list_reduce(list_prepend(CAST(-1 AS BIGINT), [{arr}]),"
        f" (acc, y) -> {step})").fetchone()
    l = b = None
    OFF = 1099511627776
    for y in ys:
        if l is None:
            l, b = y * 1_000_000, 0
            continue
        l_new = (2 * y * 1_000_000 + 8 * (l + b) + OFF * 10 + 5) // 10 - OFF
        b = ((l_new - l) + 9 * b + OFF * 10 + 5) // 10 - OFF
        l = l_new
    assert acc == l * 2147483648 + (b + 1073741824)


@SETTINGS
@given(st.lists(st.integers(0, 10_000), max_size=300),
       st.lists(st.integers(0, 10_000), max_size=300))
def test_hll_merge_is_commutative_and_idempotent(a_keys, b_keys):
    def regs(keys, m=32, wbits=16):
        out = [0] * m
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:5], 16)
            bkt, w = h % m, h // m
            r = (wbits + 1 if w == 0
                 else ((w & -w).bit_length() - 1) + 1)
            out[bkt] = max(out[bkt], r)
        return out

    ra, rb = regs(a_keys), regs(b_keys)
    merge = lambda x, y: [max(p, q) for p, q in zip(x, y)]   # noqa: E731
    assert merge(ra, rb) == merge(rb, ra)
    assert merge(ra, ra) == ra
    assert merge(ra, rb) == regs(list(a_keys) + list(b_keys))


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3),
       st.lists(st.integers(0, 255), min_size=64, max_size=64),
       st.integers(0, 2 ** 31 - 1))
def test_jpeg_encoder_fuzz_roundtrip(bw_, bh_, seed_row, salt):
    """Random images (tiled from a random 8x8 seed with a salt-driven
    shuffle) must round-trip encode -> decode == the direct integer
    FDCT/quant/IDCT reconstruction — fuzzing every entropy-coder path
    (runs, ZRL, EOB suppression, DC categories, byte stuffing)."""
    import numpy as np

    from gmall_211027_flink_spark.operators.jpeg import (
        DEN, LUT, _quant_matrix, decode_jpeg_gray, encode_jpeg_gray,
        fdct_quantize)

    base = np.array(seed_row, dtype=np.int64).reshape(8, 8)
    w, ht = bw_ * 8, bh_ * 8
    gray = np.zeros((ht, w), dtype=np.int64)
    for by in range(bh_):
        for bx in range(bw_):
            # roll deterministically per block so blocks differ
            gray[by*8:by*8+8, bx*8:bx*8+8] = np.roll(
                base, (salt + by * 3 + bx) % 64)
    payload = encode_jpeg_gray(gray)
    dw, dh, img = decode_jpeg_gray(payload)
    assert (dw, dh) == (w, ht)
    L = np.array(LUT, dtype=np.int64)
    qm = _quant_matrix()
    C = fdct_quantize(gray)
    for by in range(bh_):
        for bx in range(bw_):
            S2 = L @ (C[by, bx] * qm) @ L.T
            p2 = np.clip((S2 + DEN // 2 + 1024 * DEN) // DEN - 1024 + 128,
                         0, 255)
            assert np.array_equal(
                img[by*8:by*8+8, bx*8:bx*8+8], p2)
