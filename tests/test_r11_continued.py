"""Property/invariant tests for the round-11 continuation additions
(mu-law codec, exact ROC AUC, 4-cycle count, Jarque-Bera, CDC
chunking)."""

from __future__ import annotations

import hashlib
import itertools
import math
import struct
from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gmall_211027_flink_spark.operators.multimodal import (
    _geometry,
    _ulaw_decode_lut,
    _ulaw_encode_np,
    _wav_ramp_params,
    decode_wav_ulaw,
    synthesize_wav_ulaw,
    synthesize_wav_with_samples,
)

# ---------------------------------------------------------------- mu-law


def test_ulaw_roundtrip_error_bounded_full_domain():
    """Every 16-bit PCM value decodes back within the G.711 spec error:
    644 at the clip region, exact zero at silence."""
    x = np.arange(-32768, 32768, dtype=np.int64)
    lut = _ulaw_decode_lut()
    err = np.abs(lut[_ulaw_encode_np(x)] - x)
    assert err.max() == 644
    assert lut[_ulaw_encode_np(np.array([0]))[0]] == 0


def test_ulaw_decode_table_symmetry_and_range():
    """mu-law is sign-symmetric (two zero codes collapse): the negative
    code of every uval decodes to minus the positive code's value."""
    lut = _ulaw_decode_lut()
    for uval in range(128):
        assert lut[127 - uval] == -lut[255 - uval]
    assert len(set(lut.tolist())) == 255          # the classic 255, not 256
    assert lut.max() == 32124 and lut.min() == -32124


@settings(max_examples=80, deadline=None)
@given(x=st.integers(min_value=-32768, max_value=32767))
def test_ulaw_encode_matches_sql_formula_mirror(x):
    """The numpy encoder and the oracle's scalar SQL formula (floor
    pre-shift, bias 33, CASE segment chain, pow-based mantissa) agree
    code-for-code."""
    p = math.floor(x / 4.0)
    neg = p < 0
    ap = min(abs(p), 8159) + 33
    seg = next((s for s, e in enumerate(
        [63, 127, 255, 511, 1023, 2047, 4095, 8191]) if ap <= e), 8)
    if seg >= 8:
        uval = 127
    else:
        uval = seg * 16 + (math.floor(ap / 2.0 ** (seg + 1)) % 16)
    expected = (127 - uval) if neg else (255 - uval)
    assert int(_ulaw_encode_np(np.array([x]))[0]) == expected


def test_ulaw_container_roundtrip_and_honest_rejections():
    h = hashlib.md5(b"ulaw container test").hexdigest()
    payload = synthesize_wav_ulaw(7, h)
    ch, rate, dec = decode_wav_ulaw(payload)
    g = _geometry(h)
    p = _wav_ramp_params(h)
    assert (ch, rate, len(dec)) == (g["ch"], g["rate"], g["nfr"])
    i = np.arange(g["nfr"], dtype=np.int64)
    orig = (p["a"] * i + p["b"]) % 65536 - 32768
    assert np.abs(dec - orig).max() <= 644
    # a PCM16 container is NOT silently mis-decoded
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_ulaw(synthesize_wav_with_samples(7, h))
    # a data chunk whose declared size overruns the payload raises
    with pytest.raises(ValueError, match="truncated data chunk"):
        decode_wav_ulaw(payload[:-3])


# ----------------------------------------------------------- ROC AUC


def _auc_sweep(pairs):
    """Mirror of the ml_roc_auc_exact bucket-sweep: returns exact
    (num2, den2) integers."""
    per_b: dict[int, list[int]] = {}
    for b, pos in pairs:
        cnt = per_b.setdefault(b, [0, 0])
        cnt[0 if pos else 1] += 1
    conc = ties = cum0 = 0
    for b in sorted(per_b):
        n1b, n0b = per_b[b]
        conc += n1b * cum0
        ties += n1b * n0b
        cum0 += n0b
    n1 = sum(v[0] for v in per_b.values())
    n0 = sum(v[1] for v in per_b.values())
    return 2 * conc + ties, 2 * n1 * n0


@settings(max_examples=60, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.integers(min_value=-20, max_value=20), st.booleans()),
    min_size=2, max_size=120))
def test_roc_auc_sweep_equals_pair_enumeration(pairs):
    if not any(p for _, p in pairs) or all(p for _, p in pairs):
        return                        # AUC undefined without both classes
    num2, den2 = _auc_sweep(pairs)
    brute = sum(
        2 if bp > bn else (1 if bp == bn else 0)
        for bp, pp in pairs if pp
        for bn, pn in pairs if not pn)
    n1 = sum(1 for _, p in pairs if p)
    n0 = len(pairs) - n1
    assert (num2, den2) == (brute, 2 * n1 * n0)


def test_roc_auc_perfect_separation_and_flip():
    perfect = [(10, True)] * 5 + [(1, False)] * 7
    num2, den2 = _auc_sweep(perfect)
    assert Fraction(num2, den2) == 1
    flipped = [(b, not p) for b, p in perfect]
    fn, fd = _auc_sweep(flipped)
    assert Fraction(fn, fd) == 0


# ------------------------------------------------------- 4-cycle count


def _squares_formula(edges):
    """sum over unordered pairs of C(common_neighbors, 2), halved."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    sq2 = 0
    for a, b in itertools.combinations(nodes, 2):
        c = len(adj[a] & adj[b])
        sq2 += c * (c - 1) // 2
    assert sq2 % 2 == 0
    return sq2 // 2


def _squares_brute(edges):
    """Count distinct 4-cycles a-x-b-y by direct enumeration."""
    es = {frozenset(e) for e in edges}
    nodes = sorted({n for e in edges for n in e})
    count = 0
    for quad in itertools.combinations(nodes, 4):
        for perm in itertools.permutations(quad):
            a, x, b, y = perm
            if a == min(quad) and x < y:      # canonical orientation
                if ({frozenset((a, x)), frozenset((x, b)),
                     frozenset((b, y)), frozenset((y, a))} <= es):
                    count += 1
    return count


@settings(max_examples=40, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=7)),
    min_size=0, max_size=20))
def test_square_count_formula_matches_enumeration(edges):
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        return
    assert _squares_formula(edges) == _squares_brute(edges)


def test_square_count_known_graphs():
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _squares_formula(c4) == 1
    k4 = list(itertools.combinations(range(4), 2))
    assert _squares_formula(k4) == 3              # K4 has three 4-cycles
    tree = [(0, 1), (1, 2), (2, 3)]
    assert _squares_formula(tree) == 0


# -------------------------------------------------------- Jarque-Bera


def _jb_from_counts(ys):
    n = len(ys)
    s = sum(ys)
    z = [n * y - s for y in ys]
    m2 = sum(v * v for v in z)
    m3 = sum(v ** 3 for v in z)
    m4 = sum(v ** 4 for v in z)
    return n, m2, m3, m4


def test_jarque_bera_symmetric_series_has_exact_zero_skew():
    ys = [1, 2, 3, 4, 5]                        # symmetric around 3
    n, m2, m3, m4 = _jb_from_counts(ys)
    assert m3 == 0                              # exact integer zero
    b1 = math.floor(float(m3) * math.sqrt(float(n))
                    / float(m2) ** 1.5 * 1e6 + 0.5) / 1e6
    assert b1 == 0.0


def test_jarque_bera_kurtosis_of_two_point_mass_is_one():
    """A symmetric two-point distribution has b2 = 1 exactly — the
    minimum possible kurtosis; JB then reduces to n*(2/24)*4 = n/3."""
    ys = [10, 20] * 6
    n, m2, m3, m4 = _jb_from_counts(ys)
    b2 = Fraction(n) * Fraction(m4) / (Fraction(m2) * Fraction(m2))
    assert m3 == 0 and b2 == 1
    jb = Fraction(n) * (0 + Fraction((1 - 3) ** 2, 24))
    assert jb == Fraction(n, 6)


# ------------------------------------------------------- CDC chunking

CDC_W, CDC_MASK = 8, 64


def _cdc_boundaries(text: str) -> list[int]:
    return [p for p in range(CDC_W, len(text))
            if int(hashlib.md5(
                text[p - CDC_W:p].encode()).hexdigest()[:4], 16)
            % CDC_MASK == 0]


def _cdc_chunks(text: str) -> list[str]:
    bs = _cdc_boundaries(text)
    cuts = [0] + bs + [len(text)]
    return [text[s:e] for s, e in zip(cuts, cuts[1:])]


@settings(max_examples=60, deadline=None)
@given(text=st.text(alphabet=st.characters(min_codepoint=32,
                                           max_codepoint=126),
                    min_size=1, max_size=400))
def test_cdc_chunks_reassemble_to_original(text):
    chunks = _cdc_chunks(text)
    assert "".join(chunks) == text
    assert all(chunks)                           # no empty chunks


@settings(max_examples=40, deadline=None)
@given(text=st.text(alphabet="abcdefgh", min_size=30, max_size=200),
       prefix=st.text(alphabet="xyz", min_size=8, max_size=40))
def test_cdc_boundaries_are_content_local(text, prefix):
    """The defining CDC property: prepending a prefix shifts every
    boundary whose window lies inside the original text by exactly
    len(prefix) — an early edit cannot re-chunk the whole document."""
    L = len(prefix)
    old = {p for p in _cdc_boundaries(text)}
    new = {p for p in _cdc_boundaries(prefix + text)}
    assert {p for p in new if p >= L + CDC_W} == {p + L for p in old}


@settings(max_examples=40, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.integers(min_value=-20, max_value=20), st.booleans()),
    min_size=2, max_size=80))
def test_roc_auc_invariant_under_monotone_score_transform(pairs):
    """AUC is a rank statistic: any strictly increasing transform of
    the score buckets leaves the exact numerator/denominator pair
    unchanged."""
    if not any(p for _, p in pairs) or all(p for _, p in pairs):
        return
    transformed = [(3 * b ** 3 + 7, p) for b, p in pairs]   # strictly incr.
    assert _auc_sweep(pairs) == _auc_sweep(transformed)


def test_cdc_spark_engine_matches_python_mirror(spark, tmp_path):
    """End-to-end engine check on a tiny corpus with known structure:
    the Spark chunker's per-source counts equal the pure-Python mirror
    (same boundary rule, same chunk extraction)."""
    from collections import defaultdict

    from gmall_211027_flink_spark.operators.dedup import dedup_cdc_chunking

    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 4, "a"),
        (1, "the quick brown fox jumps over the lazy dog " * 4, "a"),
        (2, "abcdefgh" * 25, "b"),
        (3, "completely different content with words " * 3, "b"),
        (4, "short", "c"),
    ]
    d = tmp_path / "corpus"
    (spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in texts],
        "doc_id long, text string, lang string, source string, n_chars long")
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))
    got = {r["source"]: r.asDict()
           for r in dedup_cdc_chunking(spark, str(d)).collect()}

    exp = defaultdict(lambda: dict(n_chunks=0, hashes=set(), chars=0,
                                   docs=set()))
    for i, t, s in texts:
        for c in _cdc_chunks(t):
            e = exp[s]
            e["n_chunks"] += 1
            e["hashes"].add(hashlib.md5(c.encode()).hexdigest())
            e["chars"] += len(c)
            e["docs"].add(i)
    assert set(got) == set(exp)
    for s, e in exp.items():
        assert got[s]["n_docs"] == len(e["docs"])
        assert got[s]["n_chunks"] == e["n_chunks"]
        assert got[s]["n_distinct_chunks"] == len(e["hashes"])
        assert got[s]["sum_chunk_chars"] == e["chars"]
    # doc 1 is an exact copy of doc 0: it must add ZERO distinct chunks
    one_doc = {hashlib.md5(c.encode()).hexdigest()
               for c in _cdc_chunks(texts[0][1])}
    assert got["a"]["n_distinct_chunks"] == len(one_doc)


def test_ulaw_spark_engine_matches_python_mirror(spark, tmp_path):
    """End-to-end engine check: the Spark mu-law roundtrip query equals
    a pure-Python replay (synthesize -> encode -> container -> decode
    -> error stats) on a tiny corpus."""
    texts = [(3, "first wav doc"), (7, "second wav doc with more text"),
             (8, "not a wav doc"), (11, "third wav doc")]
    d = tmp_path / "corpus"
    (spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long")
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))

    from gmall_211027_flink_spark.operators.multimodal import (
        multimodal_wav_ulaw_roundtrip)
    got = {r["doc_id"]: r.asDict()
           for r in multimodal_wav_ulaw_roundtrip(spark, str(d)).collect()}
    assert set(got) == {3, 7, 11}                 # doc_id % 4 == 3 only

    for doc_id, text in texts:
        if doc_id % 4 != 3:
            continue
        h = hashlib.md5(text.encode()).hexdigest()
        _ch, _rate, dec = decode_wav_ulaw(synthesize_wav_ulaw(doc_id, h))
        g, p = _geometry(h), _wav_ramp_params(h)
        i = np.arange(g["nfr"], dtype=np.int64)
        orig = (p["a"] * i + p["b"]) % 65536 - 32768
        err = np.abs(dec - orig)
        row = got[doc_id]
        assert row["n_frames"] == g["nfr"]
        assert row["sum_decoded"] == int(dec.sum())
        assert row["sum_abs_err"] == int(err.sum())
        assert row["max_abs_err"] == int(err.max()) <= 644
