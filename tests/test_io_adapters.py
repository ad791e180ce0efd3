"""Streaming adapter tests (reference src/reader.rs / src/writer.rs
analog): chunked writes/reads, memory bounded by one metablock."""
import io

import pytest

from divans_tpu.io_adapters import CompressorWriter, DecompressorReader
from divans_tpu.options import DivansOptions
from divans_tpu import compress, decompress


def _stream_roundtrip(data, chunk, read_chunk, opts):
    sink = io.BytesIO()
    w = CompressorWriter(sink, opts)
    for off in range(0, len(data), chunk):
        w.write(data[off:off + chunk])
    w.flush_final()
    blob = sink.getvalue()
    # container is identical to the one-shot golden path
    assert decompress(blob) == data
    r = DecompressorReader(io.BytesIO(blob), opts)
    out = bytearray()
    while True:
        piece = r.read(read_chunk)
        if not piece:
            break
        out += piece
    return blob, bytes(out)


@pytest.mark.parametrize("chunk,read_chunk", [(1, 7), (777, 1024), (65536, 3)])
def test_streaming_roundtrip(chunk, read_chunk):
    data = b"streaming all the way down, " * 300
    opts = DivansOptions(metablock_size=4096)
    blob, out = _stream_roundtrip(data, chunk, read_chunk, opts)
    assert out == data


def test_streaming_matches_oneshot():
    data = b"one shot equals streaming " * 400
    opts = DivansOptions(metablock_size=4096)
    blob, out = _stream_roundtrip(data, 999, 512, opts)
    from divans_tpu.codec import engine_np
    assert blob == engine_np.compress(data, opts)


def test_streaming_crc_detects_corruption():
    data = b"check me " * 500
    opts = DivansOptions(metablock_size=4096)
    blob, _ = _stream_roundtrip(data, 100, 100, opts)
    bad = bytearray(blob)
    bad[20] ^= 1
    r = DecompressorReader(io.BytesIO(bytes(bad)), opts)
    with pytest.raises(Exception):
        while r.read(1024):
            pass


def test_empty_stream():
    sink = io.BytesIO()
    w = CompressorWriter(sink, DivansOptions())
    w.flush_final()
    r = DecompressorReader(io.BytesIO(sink.getvalue()))
    assert r.read(-1) == b""


def test_mid_stream_flush():
    """flush() makes every byte written so far decodable immediately
    (the reference's flush-at-any-byte contract, src/interface.rs:104-143,
    at frame granularity)."""
    import io
    from divans_tpu.io_adapters import CompressorWriter, DecompressorReader
    from divans_tpu.options import DivansOptions

    data = open("/root/reference/testdata/alice29", "rb").read()[:30000]
    sink = io.BytesIO()
    w = CompressorWriter(sink, DivansOptions(metablock_size=8192))
    w.write(data[:5000])
    w.flush()                     # mid-stream: not at a metablock boundary
    flushed_at = sink.tell()
    assert flushed_at > 16        # header + one short frame emitted
    # a reader over ONLY the flushed prefix recovers every written byte
    r = DecompressorReader(io.BytesIO(sink.getvalue()), partial=True)
    assert r.read() == data[:5000]
    # stream continues and still round-trips end-to-end
    w.write(data[5000:])
    w.flush_final()
    r2 = DecompressorReader(io.BytesIO(sink.getvalue()))
    assert r2.read() == data
