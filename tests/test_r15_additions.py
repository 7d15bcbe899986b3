"""Round-15 additions: flush-allowance boundary proof (ADVICE r14),
ZRL emission in the arithmetic JPEG encoder (ADVICE r14), Hilbert
write path, and the rank-stats / RFM maintenance-twin readout-sharing
checks.  Spark-backed tests reuse the session fixture from
conftest.py; pure-Python ones run without it.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# entropy.py flush allowance (ADVICE r14 low #3): _FLUSH_ALLOWANCE now
# DERIVES from the encoder's FLUSH_TAIL_BYTES; pin the boundary — a
# valid lockstep decode's overrun must never exceed the allowance at
# exact boundary sizes, and must equal ZERO for any valid stream (the
# stronger invariant the comment asserts: primed bytes == tail bytes).
# ---------------------------------------------------------------------------

def _lcg_bytes(n: int, seed: int) -> bytes:
    out = bytearray()
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x >> 16) & 0xFF)
    return bytes(out)


def test_flush_allowance_derives_from_encoder():
    from gmall_211027_flink_spark.operators import entropy

    assert entropy._FLUSH_ALLOWANCE == entropy.FLUSH_TAIL_BYTES


def test_valid_decode_overrun_is_zero_at_boundaries():
    """Lockstep decode of a VALID stream consumes exactly len(data)
    bytes — zero overrun, not merely <= allowance — across sizes that
    land on renorm boundaries (0, 1, tail-sized, and larger)."""
    from gmall_211027_flink_spark.operators.entropy import (
        BitDecoder, FLUSH_TAIL_BYTES, decode_symbol, encode_bytes,
        new_bit_models)

    for n in (0, 1, 2, 3, FLUSH_TAIL_BYTES, FLUSH_TAIL_BYTES + 1,
              63, 64, 65, 255, 256, 1000):
        data = _lcg_bytes(n, seed=2 * n + 1)
        coded = encode_bytes(data)
        dec = BitDecoder(coded)
        probs = new_bit_models(256)
        out = bytes(decode_symbol(dec, probs) for _ in range(n))
        assert out == data
        assert dec._overrun == 0, (
            f"valid {n}-byte stream overran by {dec._overrun}")


def test_truncated_stream_raises_past_allowance():
    """Dropping the whole flush tail forces the decoder past its
    allowance — it must raise, not decode garbage."""
    from gmall_211027_flink_spark.operators.entropy import (
        BitDecoder, FLUSH_TAIL_BYTES, decode_symbol, encode_bytes,
        new_bit_models)

    data = _lcg_bytes(512, seed=77)
    coded = encode_bytes(data)
    truncated = coded[:max(0, len(coded) - (FLUSH_TAIL_BYTES + 2))]
    dec = BitDecoder(truncated)
    probs = new_bit_models(256)
    with pytest.raises(ValueError, match="truncated range-coded"):
        for _ in range(512):
            decode_symbol(dec, probs)


# ---------------------------------------------------------------------------
# jpeg.py arithmetic-scan ZRL (ADVICE r14 low #1): the encoder now
# emits 0xF0 chunks for zero-runs > 15 exactly like the Huffman path.
# Current AC_POSITIONS caps runs at 12, so gated payloads are
# byte-identical — prove the ZRL path itself with a direct
# encoder/decoder lockstep over a synthetic coefficient layout whose
# zero-run exceeds 15.
# ---------------------------------------------------------------------------

def test_arith_scan_zrl_roundtrip():
    from gmall_211027_flink_spark.operators.entropy import (
        BitDecoder, BitEncoder, decode_symbol, encode_symbol,
        new_bit_models)

    # one 8x8 block: DC 5, a single AC at zigzag position 40 — a
    # 39-zero run needing two ZRL chunks + run=7
    acs = {40: -3}

    def _cat(v: int) -> int:
        return 0 if v == 0 else abs(v).bit_length()

    enc = BitEncoder()
    ac_tree = new_bit_models(256)
    amp_ac = new_bit_models(16)
    run = 0
    emitted = []
    for z in range(1, 64):
        v = acs.get(z, 0)
        if v == 0:
            run += 1
            continue
        while run > 15:
            encode_symbol(enc, ac_tree, 0xF0)
            emitted.append(0xF0)
            run -= 16
        s = _cat(v)
        encode_symbol(enc, ac_tree, (run << 4) | s)
        emitted.append((run << 4) | s)
        u = v if v > 0 else v + (1 << s) - 1
        for i in range(s - 1, -1, -1):
            enc.encode_bit(amp_ac, min(s - 1 - i, 15), (u >> i) & 1)
        run = 0
    encode_symbol(enc, ac_tree, 0x00)
    emitted.append(0x00)
    coded = enc.finish()

    assert emitted[:2] == [0xF0, 0xF0]          # 39 = 16 + 16 + 7
    assert emitted[2] >> 4 == 7

    dec = BitDecoder(coded)
    ac_tree_d = new_bit_models(256)
    amp_ac_d = new_bit_models(16)
    zz = [0] * 64
    k = 1
    while k < 64:
        sym = decode_symbol(dec, ac_tree_d)
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        r, s = sym >> 4, sym & 0x0F
        k += r
        u = 0
        for i in range(s):
            u = (u << 1) | dec.decode_bit(amp_ac_d, min(i, 15))
        v = u if u >= (1 << (s - 1)) else u - (1 << s) + 1
        zz[k] = v
        k += 1
    assert zz[40] == -3
    assert sum(1 for x in zz if x) == 1


# ---------------------------------------------------------------------------
# Rank-stats maintenance twins (r15): each drained store must read out
# EXACTLY the batch statistic — through the shared readout callable,
# so equality here proves store sufficiency, not expression parity.
# ---------------------------------------------------------------------------

def test_stream_ansari_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_ansari_bradley)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_ansari_maintenance)

    got = stream_ansari_maintenance(spark, sf_dir).first()
    want = stats_ansari_bradley(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


def test_stream_kendalls_w_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_kendalls_w)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_kendalls_w_maintenance)

    got = stream_kendalls_w_maintenance(spark, sf_dir).first()
    want = stats_kendalls_w(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


def test_stream_hoeffding_matches_batch(spark, sf_dir):
    from gmall_211027_flink_spark.operators.inference import (
        stats_hoeffding_d)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_hoeffding_maintenance)

    got = stream_hoeffding_maintenance(spark, sf_dir).first()
    want = stats_hoeffding_d(spark, sf_dir).first()
    assert got.asDict() == want.asDict()


def test_stream_rfm_matches_batch(spark, sf_dir):
    """Customer-grain store #2 (after Cochran): the full 4x4x4 segment
    grid from the drained per-customer store must equal the batch
    grid row-for-row."""
    from gmall_211027_flink_spark.plans.behavior import (
        ads_rfm_segmentation)
    from gmall_211027_flink_spark.streaming.windows import (
        stream_rfm_maintenance)

    key = ["r_score", "f_score", "m_score"]
    got = [r.asDict() for r in
           stream_rfm_maintenance(spark, sf_dir).orderBy(*key).collect()]
    want = [r.asDict() for r in
            ads_rfm_segmentation(spark, sf_dir).orderBy(*key).collect()]
    assert got == want


def test_rfm_store_slicing_invariant(spark, sf_dir):
    """The per-customer RFM store merges to the SAME state whatever
    micro-batch slicing the orders arrive in (max / count-sum /
    decimal-sum are all order-insensitive merge algebras) — the
    test_lsh_store_slicing_invariant discipline for the
    customer-grain family."""
    from pyspark.sql import functions as F

    from gmall_211027_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")

    def base(df):
        return (df.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").cast("bigint").alias("frequency"),
                     F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .cast("decimal(38,2)").alias("monetary")))

    def fold(slices):
        state = None
        for sl in slices:
            b = base(sl)
            merged = b if state is None else state.unionByName(b)
            state = (merged.groupBy("o_custkey")
                     .agg(F.max("last_order").alias("last_order"),
                          F.sum("frequency").cast("bigint")
                          .alias("frequency"),
                          F.sum("monetary").cast("decimal(38,2)")
                          .alias("monetary")))
        return sorted(map(tuple, state.collect()))

    one = fold([orders])
    mod3 = fold([orders.filter(F.col("o_orderkey") % 3 == i)
                 for i in range(3)])
    rev = fold([orders.filter(F.col("o_orderkey") % 3 == i)
                for i in (2, 0, 1)])
    assert one == mod3 == rev
    assert len(one) > 0
