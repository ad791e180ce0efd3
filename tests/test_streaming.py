"""Bounded-latency streaming (VERDICT r4 missing #1 / task 6).

The reference interleaves its two ANS streams in <=64 KiB chunks so a
consumer produces output long before the stream ends
(/root/reference/src/mux.rs:23,445-478).  The streamed container frame
(FRAME_METABLOCK_STREAMED) restores that capability: a sub-frame chunk
table + interleaved cmd/lit prefix slices, decode latency bounded by
the chunk size rather than the metablock size, model untouched
(concatenated chunks ARE the plain frame's streams).
"""
import io

import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np
from divans_tpu.io_adapters import CompressorWriter, DecompressorReader

ALICE = open("/root/reference/testdata/alice29", "rb").read()


def test_marks_prefix_property():
    """flush_with_marks: the 4 + 2*marks[S] prefix decodes S symbols."""
    import random
    from divans_tpu.ans.coder_np import ANSEncoder, ANSDecoder
    from divans_tpu.probability import scalar

    rng = random.Random(5)
    cdf = scalar.CDF_INIT.copy()
    syms = [rng.randrange(16) for _ in range(500)]
    enc = ANSEncoder()
    pairs = []
    for s in syms:
        st, fr = scalar.sym_to_start_freq(cdf, s)
        enc.put(st, fr)
        pairs.append((st, fr))
    wire, marks = enc.flush_with_marks()
    assert len(wire) == 4 + 2 * marks[-1]
    for S in (1, 7, 250, 499):
        prefix = wire[:4 + 2 * marks[S]]
        dec = ANSDecoder(prefix)
        for j in range(S):
            off = dec.peek_offset()
            st, fr = pairs[j]
            assert st <= off < st + fr, (j, S)
            dec.advance(st, fr)


def test_streamed_container_roundtrips_everywhere():
    """Streamed containers decode on every existing path (deserialize
    reassembles the full streams)."""
    data = ALICE[:60000]
    opts = DivansOptions(streaming_chunk_bytes=4096,
                        metablock_size=1 << 16)
    blob = engine_np.compress(data, opts)
    assert engine_np.decompress(blob) == data
    from divans_tpu import native
    assert native.decompress(blob) == data
    import divans_tpu
    assert divans_tpu.decompress(blob) == data


class _CountingSource:
    """Feeds the container a byte-slice at a time, counting consumption."""

    def __init__(self, blob, feed=4096):
        self.blob = blob
        self.pos = 0
        self.feed = feed

    def read(self, n):
        take = min(self.feed, n, len(self.blob) - self.pos)
        out = self.blob[self.pos:self.pos + take]
        self.pos += take
        return out


def test_reader_output_latency_bounded_by_chunk():
    """A reader must yield output after ~chunk-table granularity of
    input even when the whole stream is ONE metablock (the capability
    the frame-granular format lacked: VERDICT r4 missing #1's 16 MiB
    buffering, scaled to CI size)."""
    data = (ALICE * 5)[:600000]
    chunk_raw = 1 << 14
    sink = io.BytesIO()
    w = CompressorWriter(sink, DivansOptions(
        streaming_chunk_bytes=chunk_raw, metablock_size=1 << 20))
    w.write(data)
    w.flush_final()
    blob = sink.getvalue()
    assert len(blob) < len(data)

    src = _CountingSource(blob, feed=2048)
    r = DecompressorReader(src, partial=True)
    first = b""
    while not first:
        first = r.read(1 << 20)
        if not first:
            assert r.needs_input
            assert src.pos < len(blob), "consumed everything, no output"
    consumed_at_first_output = src.pos
    # one metablock = the whole 600 KB stream; output must appear after
    # a small multiple of the chunk size, not after the whole frame.
    # (compressed chunk ~ 0.35 * 16 KiB; table+slack allows 4 chunks)
    assert consumed_at_first_output <= 4 * chunk_raw, \
        (consumed_at_first_output, len(blob))
    # and the whole stream still round-trips incrementally
    out = bytearray(first)
    while True:
        piece = r.read(1 << 20)
        if piece:
            out += piece
        elif r.needs_input:
            if src.pos >= len(blob):
                break
        else:
            break
    assert bytes(out) == data


def test_streamed_flush_and_multiframe():
    """Streamed frames compose with mid-stream flush and multiple
    metablocks."""
    sink = io.BytesIO()
    w = CompressorWriter(sink, DivansOptions(
        streaming_chunk_bytes=2048, metablock_size=1 << 15))
    w.write(ALICE[:40000])
    w.flush()
    w.write(ALICE[40000:90000])
    w.flush_final()
    blob = sink.getvalue()
    assert engine_np.decompress(blob) == ALICE[:90000]
    r = DecompressorReader(io.BytesIO(blob))
    assert r.read(-1) == ALICE[:90000]
