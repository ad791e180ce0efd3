"""Force every `backend == "tpu"` branch on CPU.

Round 3 shipped a NameError inside a TPU-only branch of
jax_engine.compress (the round's official bench artifact was a crash
log) because conftest forces jax onto CPU and no test could reach the
device paths.  The reference runs its threaded decoder inside every
integration test (/root/reference/src/bin/integration_test.rs:22-25,
`MULTI`); the analog here: `jax_engine._on_tpu` is the single
monkeypatchable gate for path selection, while interpret-mode decisions
read the real backend — so the full device pipelines execute on CPU in
Pallas interpret mode, byte-checked against the golden engine.
"""
import os

import pytest

from divans_tpu.codec import engine_np, jax_engine
from divans_tpu.options import DivansOptions

ALICE = "/root/reference/testdata/alice29"


@pytest.fixture()
def force_tpu_paths(monkeypatch):
    monkeypatch.setattr(jax_engine, "_on_tpu", lambda: True)


def _data(n=24000):
    if os.path.exists(ALICE):
        return open(ALICE, "rb").read()[:n]
    return (b"text that repeats itself nicely, with slight variations "
            * (n // 40))[:n]


def test_device_encode_deferred_branch(force_tpu_paths):
    """compress() on a "TPU" with a chunked profile takes the hybrid
    pipeline (host C++ cmd stream + device literal lanes via
    _ans_encode_device_flat -> compact_global -> assemble_global)."""
    data = _data()
    opts = DivansOptions(metablock_size=8192, chunk_nibbles=256)
    golden = engine_np.compress(data, opts)
    fast = jax_engine.compress(data, opts)
    assert fast == golden, (len(fast), len(golden))
    assert engine_np.decompress(fast) == data


def test_device_encode_deferred_fallback_branch(force_tpu_paths,
                                                monkeypatch):
    """The round-3 crash site: with the hybrid disabled, the uniform
    device-resident lanes path runs (_ans_encode_device ->
    compact_lane_words -> assemble_compact)."""
    monkeypatch.setattr(jax_engine, "_compress_hybrid",
                        lambda *a, **k: None)
    data = _data(12000)
    opts = DivansOptions(metablock_size=8192, chunk_nibbles=256)
    golden = engine_np.compress(data, opts)
    fast = jax_engine.compress(data, opts)
    assert fast == golden, (len(fast), len(golden))


def test_device_encode_adaptive_branch(force_tpu_paths):
    """chunk == 0 on a "TPU": the pack_lanes + Pallas wide-rANS branch."""
    data = _data(8000)
    opts = DivansOptions(metablock_size=4096)
    golden = engine_np.compress(data, opts)
    fast = jax_engine.compress(data, opts)
    assert fast == golden, (len(fast), len(golden))
    assert engine_np.decompress(fast) == data


def test_device_decode_branch(force_tpu_paths, monkeypatch):
    """decompress() on a "TPU" with DIVANS_DEVICE_DECODE=1 runs the
    2-stage device pipeline (native cmd pass + Pallas literal kernel +
    script execution) in interpret mode."""
    monkeypatch.setenv("DIVANS_DEVICE_DECODE", "1")
    data = _data()
    opts = DivansOptions(metablock_size=8192, chunk_nibbles=256)
    blob = engine_np.compress(data, opts)
    assert jax_engine.decompress(blob) == data
