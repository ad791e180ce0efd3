"""Mix profile (cm + per-context mixing masks) on the native fast paths.

VERDICT r2 items 4/8: detected-stride and prior-bitmask streams must
encode AND decode without the golden engine, and stride detection must
keep the context map (the reference's mixed model selects per-literal
via the mask, src/codec/literal.rs:153-259, instead of dropping the
cmap).  Containers must stay byte-identical across engines.
"""
import numpy as np
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np
from divans_tpu.codec.layout import (ModelLayout, PROFILES, FLAG_PROFILES,
                                     profile_for_options)
from divans_tpu import native


def _wave(n=60000):
    t = np.arange(n)
    return (20000 * np.sin(t / 300.0)
            + 3000 * np.sin(t / 17.0)).astype("<i2").tobytes()


def _records(n_rec=6000):
    rng = np.random.default_rng(3)
    names = rng.integers(65, 91, (n_rec, 8), dtype=np.uint8)
    names[:, 4:] = names[0, 4:]
    t = np.arange(n_rec)
    f1 = (5000 * np.sin(t / 100.0)).astype("<i2").view(np.uint8)
    f2 = (t * 3).astype("<u2").view(np.uint8)
    return np.concatenate([names, f1.reshape(n_rec, 2),
                           f2.reshape(n_rec, 2)], axis=1).tobytes()


CASES = [
    ("stride_cm_adaptive", _wave, DivansOptions(force_stride_value=4)),
    ("stride_cm_chunked", _wave,
     DivansOptions(force_stride_value=4, chunk_nibbles=256)),
    ("stride_detected", _wave,
     DivansOptions(stride_detection_quality=1, chunk_nibbles=256)),
    ("bitmask", _records, DivansOptions(prior_bitmask_detection=1)),
]


@pytest.mark.parametrize("name,gen,opts", CASES, ids=[c[0] for c in CASES])
def test_native_byte_identical_and_roundtrips(name, gen, opts):
    if native.load() is None:
        pytest.skip("native library unavailable")
    data = gen()
    golden = engine_np.compress(data, opts)
    nat = native.compress(data, opts)
    assert nat is not None, "native declined a mix-profile stream"
    assert nat == golden
    assert native.decompress(nat) == data
    assert engine_np.decompress(nat) == data


def test_mix_flag_and_fast_decode_path():
    """The container carries the mix profile flag and the native decoder
    handles the frame directly (no golden fallback)."""
    if native.load() is None:
        pytest.skip("native library unavailable")
    from divans_tpu.container import format as fmt
    from divans_tpu.codec.deferred import flags_to_chunk
    data = _wave()
    opts = DivansOptions(force_stride_value=4, chunk_nibbles=256)
    blob = native.compress(data, opts)
    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    assert FLAG_PROFILES[flags & 0b11] == "mix"
    chunk = flags_to_chunk(flags)
    layout = ModelLayout(PROFILES["mix"], lo_bucketed=chunk > 0)
    out = b"".join(
        native.decode_metablock(f.cmd, f.lit, f.raw_len, True, layout, chunk)
        for f in frames)
    assert out == data


def test_stride_detection_keeps_context_map():
    from divans_tpu.ir.detect import apply_detection
    opts = apply_detection(_wave(), DivansOptions(stride_detection_quality=1))
    assert opts.force_stride_value > 1
    assert opts.use_context_map
    assert profile_for_options(opts) == "mix"


def test_mask_values_outside_native_envelope_fall_back():
    """opt1/fast_cm mask values (1, 3) stay on the golden engine."""
    assert not native._mask_ok(bytes([1]) * 8192)
    assert not native._mask_ok(bytes([3]) * 8192)
    assert native._mask_ok(bytes([0, 4, 5, 11] * 2048))


def test_mix_ratio_beats_cm_on_strided_binary():
    data = _wave()
    base = engine_np.compress(data, DivansOptions())
    mix = engine_np.compress(data, DivansOptions(stride_detection_quality=1))
    assert len(mix) < 0.85 * len(base)


def _hetero():
    text = open("/root/reference/testdata/alice29", "rb").read()[:60000]
    t = np.arange(20000)
    wave = (9000 * np.sin(t / 40.0)).astype("<i2").tobytes()
    return text + wave + b"\0" * 20000 + text[:20000]


def test_split_profile_native_byte_identical_and_roundtrips():
    """Block-split streams (nb<=4 literal switches + per-type strides in
    the mask) encode and decode on the native fast path — VERDICT r2
    item 8's -blocksplit ask.  Reference: src/codec/block_type.rs."""
    if native.load() is None:
        pytest.skip("native library unavailable")
    from divans_tpu.container import format as fmt
    data = _hetero()
    opts = DivansOptions(block_split=True)
    golden = engine_np.compress(data, opts)
    nat = native.compress(data, opts)
    assert nat is not None and nat == golden
    _w, _mb, frames, _crc, flags = fmt.deserialize(nat)
    assert FLAG_PROFILES[flags & 0b11] == "split"
    assert native.decompress(nat) == data
    layout = ModelLayout(PROFILES["split"])
    out = b"".join(
        native.decode_metablock(f.cmd, f.lit, f.raw_len, True, layout, 0)
        for f in frames)
    assert out == data  # no golden fallback needed
    base = engine_np.compress(data, DivansOptions())
    assert len(nat) < len(base)  # the split buys ratio on heterogeneous data


def test_pipeline_decodes_every_profile():
    """decompress_frames routes off-envelope frames to the host lane
    instead of abstaining: one pipeline decodes every deferred stream
    (reference parity: src/parallel_decompressor.rs:99-133), and
    bench_decode no longer returns None for mix/split containers
    (VERDICT r3 #4)."""
    from divans_tpu.container import format as fmt
    from divans_tpu.codec import pallas_decode
    from divans_tpu.codec.layout import (ModelLayout, PROFILES,
                                         FLAG_PROFILES)
    from divans_tpu.codec.deferred import flags_to_chunk

    # (block_split / bitmask-detection containers stay on the adaptive
    # profile by design — engine_np.compress chunk=0 — so the deferred
    # pipeline never sees them; they decode via the serial fast paths)
    for name, gen, opts in [
        ("mix", _wave, DivansOptions(stride_detection_quality=1,
                                     chunk_nibbles=256,
                                     metablock_size=1 << 13)),
        ("stride", _wave,
         DivansOptions(use_context_map=False, chunk_nibbles=256,
                       metablock_size=1 << 13)),
    ]:
        data = gen()
        blob = engine_np.compress(data, opts)
        _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
        chunk = flags_to_chunk(flags)
        profile = FLAG_PROFILES.get(flags & 0b11)
        assert chunk, name
        layout = ModelLayout(PROFILES[profile], lo_bucketed=True)
        out = pallas_decode.decompress_frames(frames, chunk, layout,
                                              DivansOptions(),
                                              interpret=True)
        assert out == data, f"{name} container diverged in the pipeline"
