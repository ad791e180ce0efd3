"""Golden (host, exact-integer) rANS coder — the normative rans32 spec.

The reference uses a 64-bit dual-state rANS with 32-bit renormalization
(src/ans.rs:133-378).  That design needs 63-bit/15-bit division in the
encoder hot path — native on x86, hostile on TPU (no 64-bit integer
units).  Our wire format instead uses **rans32**: a 32-bit state with
16-bit renormalization and the same 15-bit frequencies:

  - state x is a u32 in I = [2^15, 2^31) while streaming (the standard
    rANS interval [L, b*L) with L = M = 2^15, b = 2^16);
  - encode (processing symbols in reverse order):
        if x >= freq << 16: emit (x & 0xFFFF) as a u16 word; x >>= 16
        x = ((x / freq) << 15) + (x % freq) + start
    After the conditional shift x is in [freq, freq<<16), so x/freq is
    in [1, 2^16) and the transform result is in [2^15, 2^31].  All
    intermediates fit in int32 because start + freq <= 2^15 (CDF
    invariant), making the maximum exactly 2^31 - 1.
  - decode (forward order):
        if x < 2^15: x = (x << 16) | next_u16       # at most one pull
        slot = x & 0x7FFF; sym from CDF; then
        x = freq * (x >> 15) + slot - start         # lands in [freq, freq<<16)
  - per-stream layout: u32 final-state (little-endian) ++ u16 renorm
    words in *decode* (forward-symbol) order.

Exactly one conditional 16-bit pull per symbol — branchless, pure int32,
which is what makes the batched JAX/Pallas kernels (ans/kernels.py)
speed-of-light on the VPU.  The redundancy vs the reference's wide state
is < 0.1% measured on the test corpus (state/freq resolution >= 2 bits).

This module is the correctness oracle for the batched JAX kernels and is
used by the serial golden codec engine.
"""
from __future__ import annotations

from ..constants import LOG2_SCALE

RENORM_BITS = 16
STATE_LOW = 1 << LOG2_SCALE           # 2^15: lower bound of the state interval
ENC_START_STATE = STATE_LOW
SCALE_MASK = (1 << LOG2_SCALE) - 1


class ANSEncoder:
    """Buffers (start, freq) pairs; reverse-encodes at flush."""

    def __init__(self):
        self._pairs: list[tuple[int, int]] = []  # chronological order

    def put(self, start: int, freq: int) -> None:
        assert 0 <= start < (1 << LOG2_SCALE), start
        assert 0 < freq <= (1 << LOG2_SCALE), freq
        assert start + freq <= (1 << LOG2_SCALE), (start, freq)
        self._pairs.append((start, freq))

    def flush(self) -> bytes:
        return self.flush_with_marks()[0]

    def flush_with_marks(self) -> tuple[bytes, list[int]]:
        """(wire bytes, cumulative pull counts): marks[S] = number of
        renorm-word pulls a decoder makes while decoding the first S
        symbols, so the stream PREFIX needed to decode them is
        4 + 2*marks[S] bytes (0 when S == 0 and the stream is empty).
        The streamed container's sub-frame chunk table is built from
        these (bounded-latency streaming; the wire bytes are identical
        to flush())."""
        if not self._pairs:
            return b"", [0]
        state = ENC_START_STATE
        n = len(self._pairs)
        pulled = [0] * n
        words: list[int] = []  # u16 renorm words, reverse-chronological emit order
        for j in range(n - 1, -1, -1):
            start, freq = self._pairs[j]
            if state >= (freq << RENORM_BITS):
                words.append(state & 0xFFFF)
                state >>= RENORM_BITS
                # by rANS symmetry this word is the one the decoder
                # pulls immediately before decoding symbol j
                pulled[j] = 1
            state = ((state // freq) << LOG2_SCALE) + (state % freq) + start
        out = bytearray(state.to_bytes(4, "little"))
        for w in reversed(words):  # wire order = forward-symbol (decode) order
            out += w.to_bytes(2, "little")
        marks = [0] * (n + 1)
        for j in range(n):
            marks[j + 1] = marks[j] + pulled[j]
        self._pairs.clear()
        return bytes(out), marks


class ANSDecoder:
    """Streaming decoder over a byte string; extend() appends more wire
    bytes mid-decode (the streamed container feeds prefixes chunk by
    chunk — prefix sufficiency is guaranteed by the encoder's chunk
    table, flush_with_marks)."""

    def __init__(self, data: bytes):
        self.data = data
        if len(data) >= 4:
            self.state = int.from_bytes(data[:4], "little")
            self.pos = 4
        else:
            self.state = 0
            self.pos = 0

    def extend(self, more: bytes) -> None:
        # amortized append: a bytes + bytes rebuild here is quadratic
        # over a streamed metablock's ~1000 chunk feeds
        if not isinstance(self.data, bytearray):
            self.data = bytearray(self.data)
        self.data += more
        if self.pos == 0 and len(self.data) >= 4:
            self.state = int.from_bytes(self.data[:4], "little")
            self.pos = 4

    def peek_offset(self) -> int:
        """15-bit cdf offset of the next symbol (pulls renorm word if due)."""
        if self.state < STATE_LOW:
            word = int.from_bytes(self.data[self.pos:self.pos + 2], "little")
            self.state = (self.state << RENORM_BITS) | word
            self.pos += 2
        return self.state & SCALE_MASK

    def advance(self, start: int, freq: int) -> None:
        self.state = freq * (self.state >> LOG2_SCALE) \
            + (self.state & SCALE_MASK) - start
