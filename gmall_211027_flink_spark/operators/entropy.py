"""Adaptive binary range coder + byte-tree codec (r13).

The entropy-coder core for the one multimodal residue still parked
(COVERAGE.md: arithmetic-coded JPEG): a carry-propagating 32-bit
binary range coder with 11-bit adaptive bit models — the classic
public-domain construction of the Subbotin / LZMA rc family (32-bit
``range``, 5-byte-primed decoder, shift-low carry chain), implemented
from first principles.  Wired under the JPEG pipeline since r14
(operators/jpeg.py keeps the symbol stream — DC categories, AC
run/size, extend bits — and swaps the canonical-Huffman bit layer for
context-modeled calls into these bit models); driver-proven by the
``multimodal_jpeg_arith_pixels`` gate row (CORRECTNESS_r14) on top of
the encoder/decoder lockstep + entropy-bound tests in
tests/test_r13_additions.py.

Honest scope: this is a REAL adaptive arithmetic coder, not ITU-T
T.81 Annex D bit-exact (that spec's QM-coder state table is a
different machine) — the same scope discipline as the ADPCM rate
rungs (multimodal.py).

Reference parity anchor: the reference has no compression layer at
all; this supports the beyond-reference multimodal codec family.
"""

from __future__ import annotations

_TOP = 1 << 24                 # renormalization threshold
_PROB_BITS = 11                # probability resolution (LZMA-style)
_PROB_ONE = 1 << _PROB_BITS    # 2048
_PROB_INIT = _PROB_ONE // 2    # p(bit=0) starts at 1/2
_MOVE_BITS = 5                 # adaptation speed

# Net flush-tail length: BitEncoder.finish() emits FLUSH_TAIL_BYTES + 1
# shift_low calls and drops the initial pseudo-byte, so exactly this
# many bytes of low-register tail follow the last renorm byte.  The
# decoder's init primes the same number of code bytes, which is why a
# lockstep decode of a valid stream overruns by AT MOST this many
# phantom zeros — BitDecoder's _FLUSH_ALLOWANCE DERIVES from this
# constant (review r14: the two numbers must move together or valid
# streams would spuriously raise; test_r15_additions pins the exact
# boundary).
FLUSH_TAIL_BYTES = 4


class BitEncoder:
    """Binary range encoder over adaptive probability models.

    ``probs`` is any mutable int sequence owned by the caller (one
    11-bit probability-of-zero per context); encode_bit(ctx, bit)
    updates the model exactly as the decoder will."""

    def __init__(self) -> None:
        self.low = 0               # 33-bit accumulator (carry in bit 32)
        self.range = 0xFFFFFFFF
        self._cache = 0
        self._cache_size = 1       # swallows the first pseudo-byte
        self._out = bytearray()

    def _shift_low(self) -> None:
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            out = self._out
            out.append((self._cache + carry) & 0xFF)
            for _ in range(self._cache_size - 1):
                out.append((0xFF + carry) & 0xFF)
            self._cache_size = 0
            self._cache = (self.low >> 24) & 0xFF
        self._cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, probs: list, ctx: int, bit: int) -> None:
        p = probs[ctx]
        bound = (self.range >> _PROB_BITS) * p
        if bit == 0:
            self.range = bound
            probs[ctx] = p + ((_PROB_ONE - p) >> _MOVE_BITS)
        else:
            self.low += bound
            self.range -= bound
            probs[ctx] = p - (p >> _MOVE_BITS)
        while self.range < _TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self._shift_low()

    def finish(self) -> bytes:
        for _ in range(FLUSH_TAIL_BYTES + 1):
            self._shift_low()
        # drop the initial pseudo-byte (always 0 absent a carry into
        # the very first shift, which _cache_size = 1 absorbs)
        return bytes(self._out[1:]) if self._out else b""


# A lockstep decode consumes EXACTLY len(data) bytes (the decoder's
# renorm count equals the encoder's, and the FLUSH_TAIL_BYTES bytes
# primed at init are the net flush-tail bytes finish() appended) —
# phantom zero bytes past the end only appear on truncated/corrupt
# input or a wrong symbol count.  Allow the flush-tail magnitude as
# slack, then fail loudly instead of decoding garbage silently
# (review r13).  DERIVED from the encoder's constant, not restated
# (review r14): a future finish() change moves both ends together.
_FLUSH_ALLOWANCE = FLUSH_TAIL_BYTES


class BitDecoder:
    """Exact mirror of BitEncoder (same model updates, same renorm)."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._overrun = 0
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(FLUSH_TAIL_BYTES):
            self.code = (self.code << 8) | self._next_byte()

    def _next_byte(self) -> int:
        if self._pos < len(self._data):
            b = self._data[self._pos]
            self._pos += 1
            return b
        self._overrun += 1
        if self._overrun > _FLUSH_ALLOWANCE:
            raise ValueError(
                "truncated range-coded stream: decoder consumed "
                f"{self._overrun} bytes past the {len(self._data)}-byte "
                "input (flush allowance exceeded)")
        return 0    # inside the encoder's flush-tail allowance

    def decode_bit(self, probs: list, ctx: int) -> int:
        p = probs[ctx]
        bound = (self.range >> _PROB_BITS) * p
        if self.code < bound:
            bit = 0
            self.range = bound
            probs[ctx] = p + ((_PROB_ONE - p) >> _MOVE_BITS)
        else:
            bit = 1
            self.code -= bound
            self.range -= bound
            probs[ctx] = p - (p >> _MOVE_BITS)
        while self.range < _TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self._next_byte()) \
                & 0xFFFFFFFF
        return bit


def new_bit_models(n: int) -> list:
    """n independent adaptive bit contexts at p(0) = 1/2."""
    return [_PROB_INIT] * n


# ---------------------------------------------------------------------------
# Order-0 adaptive byte codec: a 256-leaf binary context tree (the
# standard literal coder shape — context = the path prefix through the
# byte's bits), so every byte costs 8 model-driven binary decisions.
# This is both the self-test vehicle (entropy-bound assertions) and
# the building block the JPEG binarization will reuse for category /
# run-length symbols.
# ---------------------------------------------------------------------------

def encode_symbol(enc: BitEncoder, probs: list, byte: int) -> None:
    """One byte-valued symbol through a 256-leaf context tree (context
    = the path prefix through the byte's bits)."""
    node = 1
    for i in range(7, -1, -1):
        bit = (byte >> i) & 1
        enc.encode_bit(probs, node, bit)
        node = (node << 1) | bit


def decode_symbol(dec: BitDecoder, probs: list) -> int:
    node = 1
    for _ in range(8):
        node = (node << 1) | dec.decode_bit(probs, node)
    return node & 0xFF


def encode_bytes(data: bytes) -> bytes:
    enc = BitEncoder()
    probs = new_bit_models(256)        # tree nodes 1..255 used
    for byte in data:
        encode_symbol(enc, probs, byte)
    return enc.finish()


def decode_bytes(data: bytes, n: int) -> bytes:
    dec = BitDecoder(data)
    probs = new_bit_models(256)
    out = bytearray()
    for _ in range(n):
        out.append(decode_symbol(dec, probs))
    return bytes(out)
