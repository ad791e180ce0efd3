"""Golden (host, exact-integer) rANS coder.

Semantics: 64-bit dual-state rANS with 15-bit frequencies, 32-bit
renormalization, and chunked flushing every 65536 symbols, matching the
reference coder (src/ans.rs:133-378):

  - two u64 states swap roles every symbol (2-interleave);
  - encode buffers (start, freq) pairs and reverse-encodes at chunk flush;
  - each chunk's output begins with 16 bytes of final state (little-endian
    state_a ++ state_b, post-swap), followed by the 4-byte renorm pulls in
    decode order;
  - decode pulls 32 bits into the active state when it drops below 2^31,
    with the pull landing two symbols after the drop is detected (the
    buffer_a/buffer_b flag rotation of ans.rs:230-244);
  - at each 65536-symbol boundary both states are reloaded in full.

This module is the correctness oracle for the batched JAX kernels and is
used by the serial golden codec engine.
"""
from __future__ import annotations

from ..constants import LOG2_SCALE

NORMALIZATION_INTERVAL = 1 << 31
ENC_START_STATE = NORMALIZATION_INTERVAL
NUM_SYMBOLS_BEFORE_FLUSH = 1 << 16
SCALE_MASK = (1 << LOG2_SCALE) - 1
_U64 = (1 << 64) - 1


class ANSEncoder:
    """Buffers (start, freq) pairs; emits chunked reverse-encoded bytes."""

    def __init__(self):
        self._pairs: list[tuple[int, int]] = []  # chronological order
        self._out = bytearray()

    def put(self, start: int, freq: int) -> None:
        assert 0 <= start < (1 << LOG2_SCALE), start
        assert 0 < freq < (1 << LOG2_SCALE), freq
        self._pairs.append((start, freq))
        if len(self._pairs) == NUM_SYMBOLS_BEFORE_FLUSH:
            self._flush_chunk()

    def flush(self) -> bytes:
        self._flush_chunk()
        return bytes(self._out)

    def _flush_chunk(self) -> None:
        if not self._pairs:
            return
        state_a = ENC_START_STATE
        state_b = ENC_START_STATE
        groups: list[bytes] = []  # renorm pulls, in reverse-chronological emit order
        for start, freq in reversed(self._pairs):
            state = state_a
            if state >= (freq << 48):  # ((2^31 >> 15) << 32) * freq
                groups.append((state & 0xFFFFFFFF).to_bytes(4, "little"))
                state >>= 32
            x = ((state // freq) << LOG2_SCALE) + (state % freq) + start
            state_a = state_b
            state_b = x
        state_a, state_b = state_b, state_a
        self._out += state_a.to_bytes(8, "little")
        self._out += state_b.to_bytes(8, "little")
        for g in reversed(groups):
            self._out += g
        self._pairs.clear()


class ANSDecoder:
    """Streaming decoder over a complete byte string."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.state_a = 0
        self.state_b = 0
        self.sym_count = 0
        self.req_a = 8  # forces the initial 16-byte load
        self.req_b = 0

    def _fill(self) -> None:
        if self.req_a == 0:
            return
        if self.req_a == 1:
            lo = int.from_bytes(self.data[self.pos:self.pos + 4], "little")
            self.state_a = ((self.state_a << 32) | lo) & _U64
            self.pos += 4
        else:  # chunk (re)start: full 16-byte state load
            self.sym_count = 0
            self.state_a = int.from_bytes(self.data[self.pos:self.pos + 8], "little")
            self.state_b = int.from_bytes(self.data[self.pos + 8:self.pos + 16], "little")
            self.pos += 16
        self.req_a = 0

    def peek_offset(self) -> int:
        """15-bit cdf offset of the next symbol."""
        self._fill()
        return self.state_a & SCALE_MASK

    def advance(self, start: int, freq: int) -> None:
        self.req_a = self.req_b | (8 if self.sym_count == NUM_SYMBOLS_BEFORE_FLUSH - 1 else 0)
        x = (freq * (self.state_a >> LOG2_SCALE) + (self.state_a & SCALE_MASK) - start) & _U64
        self.sym_count = (self.sym_count + 1) & 0xFFFF
        self.req_b = 1 if x < NORMALIZATION_INTERVAL else 0
        self.state_a = self.state_b
        self.state_b = x
