"""Round-14 additions: ADVICE r13 closure pins (Cochran dense
quarters, range-coder truncation detection), the arithmetic-coded
JPEG entropy layer, the Durbin/Cochran streaming maintenance twins,
and the pole-zero predictive ADPCM codec."""

import datetime
import decimal

import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---------------------------------------------------------------------------
# Cochran's Q: a quarter with ZERO incidence must still contribute its
# (k*0 - T)^2 deviation term (ADVICE r13 — both engines previously
# omitted absent quarters, so the parity gate couldn't catch it).
# ---------------------------------------------------------------------------

def test_cochran_q_counts_absent_quarter(spark, tmp_path):
    from gmall_211027_flink_spark.operators.inference import (
        COCHRAN_Q_K, stats_cochran_q)

    # 3 customers, each ordering in Q1 and Q2 only -> Q3, Q4 have zero
    # incidence; T = 6, C = (3, 3, 0, 0)
    rows, k = [], 0
    for cust in range(1, 4):
        for month in (2, 5):        # Q1, Q2
            k += 1
            rows.append((k, cust, datetime.date(2024, month, 10),
                         decimal.Decimal("50.00")))
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice decimal(18,2)")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    row = stats_cochran_q(spark, str(tmp_path)).first()
    kq, t = COCHRAN_Q_K, 6
    # dense deviations: 2 quarters at 4*3-6 = 6, 2 ABSENT at 4*0-6 = -6
    assert row["dev2"] == 2 * 6 * 6 + 2 * (-t) * (-t)
    # Q = (k-1) * dev2 / (k * (k*T - sum r^2)); r_i = 2 -> sum r^2 = 12
    want = (kq - 1) * row["dev2"] / (kq * (kq * t - 12))
    assert row["q_stat"] == pytest.approx(want, abs=1e-6)


# ---------------------------------------------------------------------------
# Range coder: truncated/corrupt input now fails loudly instead of
# decoding phantom zeros silently (ADVICE r13).
# ---------------------------------------------------------------------------

def test_range_coder_truncation_raises():
    from gmall_211027_flink_spark.operators.entropy import (
        decode_bytes, encode_bytes)

    data = bytes((i * 37 + 11) % 251 for i in range(600))
    enc = encode_bytes(data)
    assert decode_bytes(enc, len(data)) == data   # exact input: fine
    with pytest.raises(ValueError, match="truncated range-coded"):
        decode_bytes(enc[: len(enc) // 2], len(data))


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG: the range-coded scan must reconstruct the
# EXACT pixel field of the Huffman baseline (the entropy layer is
# transparent to the pixels), the container must carry no Huffman
# tables, and scan corruption must fail loudly, not decode silently.
# ---------------------------------------------------------------------------

def _arith_payload(seed: str):
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        synthesize_jpeg_gray_arith)

    h = hashlib.md5(seed.encode()).hexdigest()
    return h, synthesize_jpeg_gray_arith(0, h)


def test_jpeg_arith_lockstep_with_huffman_baseline():
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, decode_jpeg_gray_arith, synthesize_jpeg_gray,
        synthesize_jpeg_gray_arith)

    for i in range(25):
        h = hashlib.md5(f"arith doc {i}".encode()).hexdigest()
        wb, hb, ib = decode_jpeg_gray(synthesize_jpeg_gray(i, h))
        wa, ha, ia = decode_jpeg_gray_arith(
            synthesize_jpeg_gray_arith(i, h))
        assert (wb, hb) == (wa, ha)
        assert (ib == ia).all()


def test_jpeg_arith_container_has_no_dht_and_sof9():
    _h, payload = _arith_payload("container shape")
    # marker walk: collect the marker bytes of the declared segments
    import struct

    pos, markers = 2, []
    while payload[pos + 1] != 0xDA:
        markers.append(payload[pos + 1])
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        pos += 2 + ln
    assert 0xC4 not in markers          # no DHT
    assert 0xC9 in markers              # arithmetic-coding SOF
    assert 0xC0 not in markers


def test_jpeg_arith_scan_corruption_raises_or_differs():
    """Truncating INSIDE the range-coded scan must either raise (the
    r14 overrun guard) or change the pixels — never silently decode to
    the same image."""
    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray_arith)

    _h, payload = _arith_payload("corrupt the scan")
    sos = payload.find(b"\xFF\xDA")
    scan_start = sos + 2 + 8            # SOS header is 2+2+6 bytes
    good = decode_jpeg_gray_arith(payload)[2]
    cut = scan_start + max(1, (len(payload) - 2 - scan_start) // 2)
    trunc = payload[:cut] + b"\xFF\xD9"
    try:
        img = decode_jpeg_gray_arith(trunc)[2]
        assert not (img == good).all()
    except ValueError:
        pass                            # loud failure is the goal


def test_range_coder_overdecode_raises():
    """Asking for more symbols than were encoded must exhaust the
    flush allowance and raise — the corruption detection the r14 JPEG
    path relies on."""
    from gmall_211027_flink_spark.operators.entropy import (
        decode_bytes, encode_bytes)

    data = bytes((i * 73 + 5) % 241 for i in range(64))
    with pytest.raises(ValueError, match="truncated range-coded"):
        decode_bytes(encode_bytes(data), len(data) + 64)


# ---------------------------------------------------------------------------
# Streaming maintenance twins (r14): drained readout == batch twin,
# row for row — the stream_mk_maintenance contract extended to the
# Durbin and Cochran stores.
# ---------------------------------------------------------------------------

def test_stream_durbin_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import stats_durbin
    from gmall_211027_flink_spark.streaming.windows import (
        stream_durbin_maintenance)

    got = stream_durbin_maintenance(spark, sf_dir).first()
    want = stats_durbin(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


def test_stream_cochran_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_cochran_q)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_cochran_maintenance)

    got = stream_cochran_maintenance(spark, sf_dir).first()
    want = stats_cochran_q(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


# ---------------------------------------------------------------------------
# Pole-zero predictive ADPCM (r14): container roundtrip lockstep, the
# adaptive predictor genuinely improving on the fixed-prediction IMA
# baseline, stability clamps, and honest-scope tag rejection.
# ---------------------------------------------------------------------------

def _pz_assets(n=25):
    import hashlib
    out = []
    for d in range(n):
        h = hashlib.md5(f"pz asset {d}".encode()).hexdigest()
        out.append((d, h))
    return out


def test_adpcm_pz_container_roundtrip_lockstep():
    from gmall_211027_flink_spark.operators.multimodal import (
        _adpcm_params, _pz_advance, _pz_state, decode_wav_adpcm_pz,
        synthesize_wav_adpcm_pz)

    for d, h in _pz_assets():
        p = _adpcm_params(h)
        orig = [(p["a"] * i + p["b"]) % 65536 - 32768
                for i in range(p["nfr"])]
        _rate, dec = decode_wav_adpcm_pz(synthesize_wav_adpcm_pz(d, h))
        assert len(dec) == len(orig)
        # decode must equal the ENCODER's running reconstruction
        st = _pz_state(orig[0])
        recon = [orig[0]]
        for s in orig[1:]:
            _c, sr = _pz_advance(st, s=s)
            recon.append(sr)
        assert dec == recon


def test_adpcm_pz_slewing_beats_ima_on_jumps():
    """The point of the 2-pole/6-zero adaptation: the zero section
    accumulates recent quantized differences, so recovery from a large
    discontinuity slews FAR faster than the fixed previous-sample
    prediction (whose reach is capped by the step table).  On a
    square wave the pole-zero path must land well under the IMA
    baseline; on a smooth low-slope ramp IMA is already near-optimal
    (error ~ step/8 per sample) and the 0.9375 pole cap's residual
    bias makes pz lose — the G.726 trade, asserted both ways so the
    trade is pinned, not hidden."""
    from gmall_211027_flink_spark.operators.multimodal import (
        _adpcm_advance, _adpcm_advance as _ima, _pz_advance, _pz_state)

    def both(sig):
        st = _pz_state(sig[0])
        pred, idx = sig[0], 0
        e_pz = e_ima = 0
        for s in sig[1:]:
            _c, sr = _pz_advance(st, s=s)
            e_pz += abs(sr - s)
            _c2, pred, idx = _adpcm_advance(pred, idx, s)
            e_ima += abs(pred - s)
        return e_pz, e_ima

    square = []
    for blk in range(8):
        square += [20000 if blk % 2 == 0 else -20000] * 200
    e_pz, e_ima = both(square)
    assert e_pz < e_ima * 0.6       # slewing recovery wins big

    ramp = [(17 * i + 5000) % 65536 - 32768 for i in range(800)]
    e_pz, e_ima = both(ramp)
    assert e_ima < e_pz             # the other side of the trade


def test_adpcm_pz_adaptation_is_live():
    """After a few hundred samples the zero/pole coefficients must
    have moved off their warm-start values — the LMS loop really
    adapts (a dead update rule would leave bz at 0 forever)."""
    from gmall_211027_flink_spark.operators.multimodal import (
        ADPCM_PZ_A1MAX, _pz_advance, _pz_state)

    st = _pz_state(0)
    for i in range(500):
        _pz_advance(st, s=(211 * i) % 65536 - 32768)
    assert any(v != 0 for v in st["bz"])
    assert st["a1"] != ADPCM_PZ_A1MAX or st["a2"] != 0


def test_adpcm_pz_stability_clamps_hold():
    from gmall_211027_flink_spark.operators.multimodal import (
        ADPCM_PZ_A1MAX, ADPCM_PZ_A2MAX, _pz_advance, _pz_state)

    st = _pz_state(-30000)
    x = -30000
    for i in range(2000):
        x = (x * 31 + 17) % 65536 - 32768   # adversarial jumps
        _pz_advance(st, s=x)
        assert abs(st["a1"]) <= ADPCM_PZ_A1MAX
        assert abs(st["a2"]) <= ADPCM_PZ_A2MAX
        assert 0 <= st["idx"] <= 88
        assert -32768 <= st["sr1"] <= 32767


def test_adpcm_pz_rejects_ima_tag():
    from gmall_211027_flink_spark.operators.multimodal import (
        decode_wav_adpcm_pz, synthesize_wav_adpcm)

    _d, h = _pz_assets(1)[0]
    ima_payload = synthesize_wav_adpcm(0, h)     # fmt tag 0x11
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_adpcm_pz(ima_payload)


def test_stream_cox_stuart_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_cox_stuart)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_cox_stuart_maintenance)

    got = stream_cox_stuart_maintenance(spark, sf_dir).first()
    want = stats_cox_stuart(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


def test_stream_mood_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_mood_median)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_mood_maintenance)

    got = stream_mood_maintenance(spark, sf_dir).first()
    want = stats_mood_median(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the two r14 state machines hold their
# invariants on ARBITRARY inputs, not just the hash-derived corpus.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_range_coder_roundtrip_property(data):
    from gmall_211027_flink_spark.operators.entropy import (
        decode_bytes, encode_bytes)

    assert decode_bytes(encode_bytes(data), len(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=300))
def test_adpcm_pz_encode_decode_lockstep_property(samples):
    """For ANY int16 signal: decoding the encoder's codes reproduces
    the encoder's running reconstruction exactly, and every state
    invariant holds along the way."""
    from gmall_211027_flink_spark.operators.multimodal import (
        ADPCM_PZ_A1MAX, ADPCM_PZ_A2MAX, _pz_advance, _pz_state)

    enc = _pz_state(samples[0])
    dec = _pz_state(samples[0])
    for s in samples[1:]:
        code, sr_e = _pz_advance(enc, s=s)
        code_d, sr_d = _pz_advance(dec, code=code)
        assert code_d == code and sr_d == sr_e
        assert -32768 <= sr_e <= 32767
        assert abs(enc["a1"]) <= ADPCM_PZ_A1MAX
        assert abs(enc["a2"]) <= ADPCM_PZ_A2MAX
    assert enc == dec                      # full state, not just sr


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=-(10 ** 12), max_value=10 ** 12),
       st.integers(min_value=1, max_value=10 ** 6))
def test_tdiv_matches_duckdb_truncation(x, y):
    """_tdiv == C-style truncation == what DuckDB's // was measured to
    do — the exactness contract the pole-zero oracle rests on."""
    from gmall_211027_flink_spark.operators.multimodal import _tdiv

    want = abs(x) // y if x >= 0 else -(abs(x) // y)
    assert _tdiv(x, y) == want
    # and it really differs from Python floor-div on negatives
    if x < 0 and x % y != 0:
        assert _tdiv(x, y) == x // y + 1


# ---------------------------------------------------------------------------
# Hilbert-curve core (r15 prep, the entropy.py precedent): inverse
# bijection, the adjacency property z-order lacks, and the ONE
# expression generator agreeing with the Python machine in BOTH
# dialects (DuckDB executed + Spark executed).
# ---------------------------------------------------------------------------

def test_hilbert_inverse_bijection_and_adjacency():
    from gmall_211027_flink_spark.operators.hilbert import (
        HILBERT_ORDER, hilbert_index, hilbert_point)

    n = 1 << HILBERT_ORDER
    for d in range(0, n * n, 1021):       # sampled inverse check
        x, y = hilbert_point(d)
        assert 0 <= x < n and 0 <= y < n
        assert hilbert_index(x, y) == d
    px, py = hilbert_point(0)
    for d in range(1, 2000):              # THE Hilbert property:
        x, y = hilbert_point(d)           # consecutive indices are
        assert abs(x - px) + abs(y - py) == 1   # 4-adjacent, always
        px, py = x, y


def test_hilbert_duckdb_sql_matches_python():
    import duckdb

    from gmall_211027_flink_spark.operators.hilbert import (
        hilbert_index, hilbert_sql)

    q = hilbert_sql(
        "(SELECT g1.range AS x, g2.range AS y "
        "FROM range(0, 256, 23) g1, range(0, 256, 19) g2)",
        "x", "y", "duckdb")
    con = duckdb.connect()
    rows = con.execute(f"SELECT x, y, hd FROM ({q})").fetchall()
    assert len(rows) > 100
    for x, y, hd in rows:
        assert hd == hilbert_index(x, y)
    # and the full 2^8 x 2^8 grid is a bijection onto [0, 4^8)
    q2 = hilbert_sql(
        "(SELECT g1.range AS x, g2.range AS y "
        "FROM range(256) g1, range(256) g2)", "x", "y", "duckdb")
    nd, lo, hi = con.execute(
        f"SELECT COUNT(DISTINCT hd), MIN(hd), MAX(hd) FROM ({q2})"
    ).fetchone()
    assert (nd, lo, hi) == (65536, 0, 65535)


def test_hilbert_spark_sql_matches_python(spark):
    from gmall_211027_flink_spark.operators.hilbert import (
        hilbert_index, hilbert_sql)

    q = hilbert_sql(
        "(SELECT a.id AS x, b.id AS y "
        "FROM range(0, 256, 29) a, range(0, 256, 31) b)",
        "x", "y", "spark")
    rows = spark.sql(f"SELECT x, y, hd FROM ({q})").collect()
    assert len(rows) > 50
    for r in rows:
        assert r["hd"] == hilbert_index(r["x"], r["y"])


def test_hilbert_layout_beats_zorder_on_span(spark, sf_dir):
    """The audit's point, pinned: on the fixture grid the Hilbert
    layout's total bounding spans are no worse than Morton's in BOTH
    dimensions, and both crush linear's cross-dimension span."""
    from gmall_211027_flink_spark.registry import QUERIES, load_all

    load_all()
    rows = {r["layout"]: r for r in
            QUERIES["layout_hilbert_locality"](spark, sf_dir).collect()}
    h, z, lin = rows["hilbert"], rows["zorder"], rows["linear"]
    assert h["total_span_x"] <= z["total_span_x"]
    assert h["total_span_y"] <= z["total_span_y"]
    assert h["total_span_y"] < lin["total_span_y"] // 2
