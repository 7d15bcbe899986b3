"""Engine-level tests for the round-13 additions: the multi-rate
ADPCM rung codec (lockstep, 4-bit compatibility, bitstream packing),
the Durbin BIBD design balance, the Gram-determinant partial
correlation vs the chained-recursion route, and the streaming
seasonal-MK store vs its batch twin."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _h(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Multi-rate ADPCM rungs: lockstep, width coverage, packing, honesty
# ---------------------------------------------------------------------------

def test_adpcm_rung_lockstep_all_widths():
    """Decoder output must equal the encoder's own state chain, for at
    least one asset at EACH of the 2/3/5-bit rungs."""
    from gmall_211027_flink_spark.operators.multimodal import (
        _adpcm_advance_m, _adpcm_rung_params, decode_wav_adpcm_rung,
        synthesize_wav_adpcm_rung)

    seen = set()
    for seed in range(60):
        h = _h(f"rung lockstep {seed}")
        p = _adpcm_rung_params(h)
        if p["bits"] in seen:
            continue
        seen.add(p["bits"])
        m = p["bits"] - 1
        samples = [(p["a"] * i + p["b"]) % 65536 - 32768
                   for i in range(p["nfr"])]
        pred, idx = samples[0], 0
        expected = [pred]
        for s in samples[1:]:
            _code, pred, idx = _adpcm_advance_m(pred, idx, s, m)
            expected.append(pred)
        _rate, bits, dec = decode_wav_adpcm_rung(
            synthesize_wav_adpcm_rung(seed, h))
        assert bits == p["bits"]
        assert dec == expected
        if seen == {2, 3, 5}:
            return
    pytest.fail(f"only widths {seen} drawn in 60 seeds")


def test_adpcm_rung_m3_matches_r12_four_bit():
    """The generalized advance at M = 3 must reproduce the r12 4-bit
    _adpcm_advance bit-for-bit across a state/sample sweep."""
    from gmall_211027_flink_spark.operators.multimodal import (
        _adpcm_advance, _adpcm_advance_m)

    for idx in (0, 1, 17, 44, 88):
        for pred in (-32768, -12345, -1, 0, 7, 30000, 32767):
            for s in (-32768, -2048, -3, 0, 5, 1024, 32767):
                assert (_adpcm_advance_m(pred, idx, s, 3)
                        == _adpcm_advance(pred, idx, s))


def test_adpcm_rung_bitstream_roundtrip():
    """3- and 5-bit codes straddle byte boundaries; pack -> unpack
    must be the identity for every width."""
    from gmall_211027_flink_spark.operators.multimodal import (
        _pack_codes, _unpack_codes)

    for width in (2, 3, 5):
        codes = [(i * 7 + 3) % (1 << width) for i in range(101)]
        data = _pack_codes(codes, width)
        assert len(data) == (101 * width + 7) // 8
        assert _unpack_codes(data, width, 101) == codes
    with pytest.raises(ValueError, match="bitstream exhausted"):
        _unpack_codes(b"\x01", 5, 3)


def test_adpcm_rung_rejects_other_rates_and_truncation():
    from gmall_211027_flink_spark.operators.multimodal import (
        decode_wav_adpcm_rung, synthesize_wav_adpcm,
        synthesize_wav_adpcm_rung)

    # the r12 4-bit container is NOT this decoder's scope
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_adpcm_rung(synthesize_wav_adpcm(1, _h("four bits")))
    good = synthesize_wav_adpcm_rung(2, _h("rung truncate"))
    with pytest.raises(ValueError):
        decode_wav_adpcm_rung(good[:len(good) - 3])


def test_adpcm_rung_error_bounded_by_step_table():
    """The reconstruction error of any single sample is bounded by the
    current quantizer step (the residual the rate ladder trades): with
    fewer magnitude bits the bound is looser but still the step."""
    from gmall_211027_flink_spark.operators.multimodal import (
        ADPCM_STEP_TABLE, _adpcm_advance_m)

    for m in (1, 2, 4):
        pred, idx = 0, 40
        s = pred + (ADPCM_STEP_TABLE[idx] // 2)   # in-range delta
        _code, pred2, _idx2 = _adpcm_advance_m(pred, idx, s, m)
        assert abs(pred2 - s) <= ADPCM_STEP_TABLE[idx]


# ---------------------------------------------------------------------------
# Durbin: the cyclic Fano selection really is a BIBD(7, b, 3, 3b/7, b/7)
# ---------------------------------------------------------------------------

def test_durbin_design_is_balanced(spark, tmp_path):
    """Synthetic punctured calendar (review r13: no more SF-dependent
    skip): 21 weeks covering every wk%7 residue class, with four weeks
    punctured so the class counts are UNEVEN (3/3/2/1/2/3/3) — the
    per-class q-selection must still yield a true BIBD, and the engine
    must agree on (b, r)."""
    import datetime
    import decimal
    from itertools import combinations

    from gmall_211027_flink_spark.operators.inference import (
        DURBIN_FANO, DURBIN_K, DURBIN_T, stats_durbin)

    punctured = {2, 10, 17, 18}     # classes 2, 3, 4, 3 lose one week
    rows, k = [], 0
    for wk in range(21):
        for i in range(7):
            if wk in punctured and i == 3:
                continue            # drop one day -> incomplete week
            k += 1
            d = wk * 7 + i
            rows.append((k, 1,
                         datetime.date(1970, 1, 1)
                         + datetime.timedelta(days=d),
                         decimal.Decimal(f"{100 + 13 * k % 97}.00")))
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice decimal(18,2)")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    complete = sorted(wk for wk in range(21) if wk not in punctured)
    by_cls = {c: [w for w in complete if w % DURBIN_T == c]
              for c in range(DURBIN_T)}
    assert sorted(len(v) for v in by_cls.values()) == [1, 2, 2, 3, 3, 3, 3]
    q = min(len(v) for v in by_cls.values())
    assert q == 1                   # the uneven classes bind
    kept = [w for c in range(DURBIN_T) for w in by_cls[c][:q]]
    b = len(kept)
    assert b == DURBIN_T * q
    blocks = [[dw for dw in range(7)
               if (dw - wk % DURBIN_T + DURBIN_T) % DURBIN_T
               in DURBIN_FANO] for wk in kept]
    assert all(len(blk) == DURBIN_K for blk in blocks)
    rep = {t: sum(t in blk for blk in blocks) for t in range(7)}
    assert set(rep.values()) == {DURBIN_K * b // DURBIN_T}
    lam = {p: sum(set(p) <= set(blk) for blk in blocks)
           for p in combinations(range(7), 2)}
    assert set(lam.values()) == {b // DURBIN_T}
    # and the ENGINE selected exactly that design
    row = stats_durbin(spark, str(tmp_path)).first()
    assert row["n_blocks"] == b
    assert row["rep_r"] == DURBIN_K * b // DURBIN_T


# ---------------------------------------------------------------------------
# Gram-determinant partial correlation == chained first-order recursion
# ---------------------------------------------------------------------------

def test_gram_partial_matches_recursion(spark, sf_dir):
    from gmall_211027_flink_spark.catalog import load_table
    from gmall_211027_flink_spark.operators.aggregates import (
        stats_partial_correlation_gram)

    orders = load_table(spark, sf_dir, "orders")
    wk = (F.datediff("o_orderdate", F.lit("1970-01-01"))
          .cast("bigint") / 7).cast("bigint")
    pdf = (orders.groupBy(wk.alias("wk"))
           .agg(F.count("*").alias("x"),
                F.countDistinct("o_custkey").alias("u"),
                (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 * 100).cast("decimal(38,0)").cast("double").alias("y"))
           ).toPandas()

    def corr(a, c):
        n = len(pdf)
        sa, sc = pdf[a].sum(), pdf[c].sum()
        return ((n * (pdf[a] * pdf[c]).sum() - sa * sc)
                / math.sqrt((n * (pdf[a] ** 2).sum() - sa * sa)
                            * (n * (pdf[c] ** 2).sum() - sc * sc)))

    pdf["t"] = pdf["wk"].astype(float)
    r12, r13, r14 = corr("x", "y"), corr("x", "t"), corr("x", "u")
    r23, r24, r34 = corr("y", "t"), corr("y", "u"), corr("t", "u")
    # chained recursion: partial out t, then u-given-t
    r12_3 = (r12 - r13 * r23) / math.sqrt((1 - r13 ** 2) * (1 - r23 ** 2))
    r14_3 = (r14 - r13 * r34) / math.sqrt((1 - r13 ** 2) * (1 - r34 ** 2))
    r24_3 = (r24 - r23 * r34) / math.sqrt((1 - r23 ** 2) * (1 - r34 ** 2))
    rec = ((r12_3 - r14_3 * r24_3)
           / math.sqrt((1 - r14_3 ** 2) * (1 - r24_3 ** 2)))
    # determinant route (the query's expression shape)
    m12 = (r12 * (1 - r34 * r34) - r23 * (r13 - r34 * r14)
           + r24 * (r13 * r34 - r14))
    m11 = (1 * (1 - r34 * r34) - r23 * (r23 - r34 * r24)
           + r24 * (r23 * r34 - r24))
    m22 = (1 * (1 - r34 * r34) - r13 * (r13 - r34 * r14)
           + r14 * (r13 * r34 - r14))
    gram = m12 / math.sqrt(m11 * m22)
    assert gram == pytest.approx(rec, abs=1e-9)
    row = stats_partial_correlation_gram(spark, sf_dir).first()
    assert row["r_xy_given_z1z2"] == pytest.approx(gram, abs=2e-6)


# ---------------------------------------------------------------------------
# Streaming seasonal-MK store: drained readout == batch twin
# ---------------------------------------------------------------------------

def test_stream_mk_matches_batch_seasonal_mk(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_seasonal_mann_kendall)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_mk_maintenance)

    got = stream_mk_maintenance(spark, sf_dir).first()
    want = stats_seasonal_mann_kendall(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


# ---------------------------------------------------------------------------
# Cox-Stuart: pairing discipline on the engine side
# ---------------------------------------------------------------------------

def test_cox_stuart_pairing_invariants(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_cox_stuart)

    row = stats_cox_stuart(spark, sf_dir).first()
    n = row["n_days"]
    assert row["n_pairs_used"] <= n // 2          # ties are dropped
    assert row["n_plus"] + row["n_minus"] == row["n_pairs_used"]
    d = row["n_plus"] - row["n_minus"]
    if d != 0:
        assert math.copysign(1, row["z_score"]) == math.copysign(1, d)


# ---------------------------------------------------------------------------
# grid_rank through the NON-broadcast join path (ADVICE r12 fix): with
# the forced broadcast hint gone, AQE normally still broadcasts the
# tiny offset grid — this pins bit-identity when it CANNOT (broadcast
# disabled), i.e. the shuffle-join plan a data-proportional grid would
# take at 100 TB.
# ---------------------------------------------------------------------------

def test_grid_rank_exact_without_broadcast(spark):
    from pyspark.sql.window import Window

    from gmall_211027_flink_spark.operators.ranks import grid_rank

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (spark.range(700)
              .select(F.col("id"), (F.col("id") * 31 % 113).alias("v")))
        two = grid_rank(df, ["v", "id"], F.expr("v div 9"))
        plan = two._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        ref = df.select(
            "id", F.row_number().over(Window.orderBy("v", "id"))
            .cast("bigint").alias("rk"))
        got = {r["id"]: r["rk"] for r in two.select("id", "rk").collect()}
        want = {r["id"]: r["rk"] for r in ref.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# ANSI-guard degenerates (review r13): each guarded statistic must
# return its conventional 0 on the degenerate slice instead of
# crashing under Spark 4's default ANSI mode — pinned with synthetic
# orders tables engineered to hit each 0/0.
# ---------------------------------------------------------------------------

def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice decimal(18,2)")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_cochran_q_all_complete_blocks_returns_zero(spark, tmp_path):
    """Every customer orders in all 4 quarters -> kT == sum(r^2) and
    dev2 == 0: q_stat must be 0.0, not an ANSI divide-by-zero."""
    import datetime

    from gmall_211027_flink_spark.operators.inference import (
        stats_cochran_q)

    rows = []
    k = 0
    for cust in range(1, 6):
        for month in (1, 4, 7, 10):     # one order per quarter
            k += 1
            rows.append((k, cust, datetime.date(2024, month, 5),
                         None))
    rows = [(a, b, c, __import__("decimal").Decimal("100.00"))
            for a, b, c, _ in rows]
    d = _write_orders(spark, tmp_path, rows)
    row = stats_cochran_q(spark, d).first()
    assert row["dev2"] == 0
    assert row["q_stat"] == 0.0


def test_cox_stuart_all_tied_returns_zero(spark, tmp_path):
    """Constant daily volume -> every half-offset pair ties -> m = 0:
    z must be 0.0, not an ANSI divide-by-zero."""
    import datetime
    import decimal

    from gmall_211027_flink_spark.operators.inference import (
        stats_cox_stuart)

    rows = [(i + 1, 1, datetime.date(2024, 1, 1)
             + datetime.timedelta(days=i), decimal.Decimal("10.00"))
            for i in range(14)]          # one order per day, constant
    d = _write_orders(spark, tmp_path, rows)
    row = stats_cox_stuart(spark, d).first()
    assert row["n_pairs_used"] == 0
    assert row["z_score"] == 0.0


def test_durbin_punctured_class_yields_no_blocks(spark, tmp_path):
    """A calendar whose complete weeks all share one wk%7 residue must
    yield q = 0 (no blocks) — never a silently unbalanced design
    (review r13: the old qmin minimized over PRESENT classes only)."""
    import datetime
    import decimal

    from gmall_211027_flink_spark.operators.inference import stats_durbin

    # two complete weeks, both in the SAME residue class (13 weeks
    # apart would differ; use exactly 7-week spacing -> same class)
    rows = []
    k = 0
    for start in (datetime.date(2024, 1, 1),
                  datetime.date(2024, 2, 19)):   # 49 days later
        for i in range(7):
            k += 1
            rows.append((k, 1, start + datetime.timedelta(days=i),
                         decimal.Decimal(f"{100 + k}.00")))
    d = _write_orders(spark, tmp_path, rows)
    row = stats_durbin(spark, d).first()
    assert row["n_blocks"] == 0
    assert row["t1_stat"] is None


def test_mood_median_degenerate_margin_returns_zero(spark, tmp_path):
    """All days share one volume -> every day ties with the pooled
    median and drops -> all four cells 0: chi2 must be 0.0."""
    import datetime
    import decimal

    from gmall_211027_flink_spark.operators.inference import (
        stats_mood_median)

    rows = [(i + 1, 1, datetime.date(2024, 3, 1)
             + datetime.timedelta(days=i), decimal.Decimal("5.00"))
            for i in range(10)]
    d = _write_orders(spark, tmp_path, rows)
    row = stats_mood_median(spark, d).first()
    assert (row["wkend_above"] + row["wkday_above"]
            + row["wkend_below"] + row["wkday_below"]) == 0
    assert row["chi2_yates"] == 0.0


# ---------------------------------------------------------------------------
# Adaptive binary range coder (operators/entropy.py — the r14
# arithmetic-JPEG entropy core, pre-built and proven this round):
# encoder/decoder lockstep incl. the carry chain, and compression that
# actually approaches the source entropy.
# ---------------------------------------------------------------------------

def _lcg_bytes(n: int, seed: int = 12345) -> bytes:
    out = bytearray()
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x >> 16) & 0xFF)
    return bytes(out)


def test_range_coder_roundtrip_lengths():
    from gmall_211027_flink_spark.operators.entropy import (
        decode_bytes, encode_bytes)

    for n in (0, 1, 2, 7, 255, 4096):
        data = _lcg_bytes(n, seed=n + 3)
        assert decode_bytes(encode_bytes(data), n) == data


def test_range_coder_carry_chain():
    """Long runs of the likeliest symbol drive `low` into the 0xFF
    band where carries propagate through cached bytes — the classic
    range-coder bug site; the roundtrip must survive it."""
    from gmall_211027_flink_spark.operators.entropy import (
        decode_bytes, encode_bytes)

    for pattern in (b"\x00" * 3000, b"\xff" * 3000,
                    (b"\xff\x00" * 1500),
                    bytes([255, 254, 255, 255, 0] * 600)):
        assert decode_bytes(encode_bytes(pattern),
                            len(pattern)) == pattern


def test_range_coder_beats_entropy_neighborhood():
    """A 90/10 two-symbol source carries H ~ 0.469 bits/byte; the
    adaptive coder's achievable floor adds ~0.022 bits per
    conditionally-deterministic tree decision (p bottoms out at
    31/2048 under the >>5 update, and 7 of the 8 path decisions are
    deterministic given the prefix) — so the ideal is ~0.62 bits/byte.
    Assert we land within 10% of THAT bound, and that a uniform
    random source does NOT compress (coder honesty)."""
    import math

    from gmall_211027_flink_spark.operators.entropy import encode_bytes

    n = 20000
    skewed = bytearray()
    x = 7
    for _ in range(n):
        x = (x * 48271) % 2147483647
        skewed.append(0x41 if x % 10 else 0x42)   # 90% 'A', 10% 'B'
    out = encode_bytes(bytes(skewed))
    p = skewed.count(0x41) / n
    h_info = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
    floor_bit = -math.log2(1 - 31 / 2048)      # adaptive-model floor
    ideal_bytes = n * (h_info + 7 * floor_bit) / 8
    assert len(out) < ideal_bytes * 1.10 + 64  # near the real bound
    assert len(out) < n / 8                    # and clearly small
    rand = _lcg_bytes(n, seed=99)
    assert len(encode_bytes(rand)) > n * 0.98  # incompressible


def test_range_coder_model_is_shared_state():
    """Interleaving two context groups through ONE coder stream must
    stay decodable — the exact shape the JPEG binarization needs
    (DC and AC symbols share the stream but not the models)."""
    from gmall_211027_flink_spark.operators.entropy import (
        BitDecoder, BitEncoder, new_bit_models)

    enc = BitEncoder()
    a, b = new_bit_models(4), new_bit_models(4)
    bits = [(i * 7 + 3) % 2 for i in range(500)]
    for i, bit in enumerate(bits):
        if i % 3 == 0:
            enc.encode_bit(a, i % 4, bit)
        else:
            enc.encode_bit(b, i % 4, bit)
    data = enc.finish()
    dec = BitDecoder(data)
    a2, b2 = new_bit_models(4), new_bit_models(4)
    got = []
    for i in range(500):
        if i % 3 == 0:
            got.append(dec.decode_bit(a2, i % 4))
        else:
            got.append(dec.decode_bit(b2, i % 4))
    assert got == bits
    assert a2 == a and b2 == b      # models advanced in lockstep
