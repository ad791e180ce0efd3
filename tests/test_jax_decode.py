"""JAX decode-scan tests: the batched FSM must decode golden-encoded
streams without invoking the fallback path (scan_ok asserts the scan
itself finished every lane) and byte-exactly."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from divans_tpu.codec import engine_np, jax_engine, jax_decode
from divans_tpu.container import format as fmt
from divans_tpu.options import DivansOptions

ALICE = "/root/reference/testdata/alice29"
ASYOULIK = "/root/reference/testdata/asyoulik"


def _scan_decode(data, opts, profile):
    blob = engine_np.compress(data, opts)
    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    cs, cw, ls, lw, raw_len, window_size, max_steps = \
        jax_engine.pack_frames(frames)
    win, ok, _ = jax_decode.decode_scan(cs, cw, ls, lw, raw_len,
                                        profile, window_size, max_steps)
    ok = np.asarray(ok)
    win = np.asarray(win)
    got = b"".join(win[i, :frames[i].raw_len].tobytes()
                   for i in range(len(frames)))
    return ok, got


@pytest.mark.parametrize("opts,profile", [
    (DivansOptions(), "cm"),
    (DivansOptions(dynamic_context_mixing=0), "cm"),
    (DivansOptions(dynamic_context_mixing=2), "cm"),
    (DivansOptions(use_context_map=False, dynamic_context_mixing=0), "stride"),
])
def test_scan_decodes_profiles(opts, profile):
    data = b"hello world, hello jax; the quick brown fox! " * 60
    ok, got = _scan_decode(data, opts, profile)
    assert ok.all(), "scan fell back"
    assert got == data


@pytest.mark.parametrize("data", [
    b"A", b"@" * 5000, b"abcd" * 2000, bytes(range(140)),
    open("/dev/urandom", "rb").read(4096),
])
def test_scan_edge_inputs(data):
    ok, got = _scan_decode(data, DivansOptions(), "cm")
    assert ok.all() and got == data


def test_scan_multiblock_text():
    data = (open(ALICE, "rb").read()[:24000] if os.path.exists(ALICE)
            else b"text that repeats itself nicely " * 800)
    ok, got = _scan_decode(data, DivansOptions(metablock_size=4096), "cm")
    assert ok.all() and got == data


def test_decompress_end_to_end():
    data = (open(ASYOULIK, "rb").read()[:16000] if os.path.exists(ASYOULIK)
            else b"more text with structure " * 700)
    blob = jax_engine.compress(data, DivansOptions(metablock_size=8192))
    assert jax_engine.decompress(blob) == data


def test_corrupt_stream_rejected():
    data = b"some compressible data " * 100
    blob = bytearray(engine_np.compress(data, DivansOptions()))
    blob[30] ^= 0xFF  # flip a bit mid-stream
    with pytest.raises(Exception):
        jax_engine.decompress(bytes(blob))
