"""Golden-engine end-to-end tests (analog of reference
src/bin/integration_test.rs): compress→decompress byte equality plus
compression-ratio ceilings on the reference corpus."""
import os

import pytest

from divans_tpu.codec import engine_np
from divans_tpu.options import DivansOptions
from divans_tpu.container import format as fmt

ALICE = "/root/reference/testdata/alice29"
ASYOULIK = "/root/reference/testdata/asyoulik"


def _roundtrip(data, opts=None):
    opts = opts or DivansOptions()
    blob = engine_np.compress(data, opts)
    out = engine_np.decompress(blob, opts)
    assert out == data
    return blob


@pytest.mark.parametrize("data", [
    b"", b"A", b"AB", b"ABC" * 5,
    bytes(range(140)),                      # the 140B mixed-entropy case
    b"@" * 5000,                            # overlapping copy
    b"abcd" * 2000,                         # short-period copy
    open("/dev/urandom", "rb").read(4096),  # incompressible
])
def test_small_roundtrips(data):
    _roundtrip(data)


def test_repetitive_compresses_well():
    data = b"hello world, this is divans_tpu calling. " * 300
    blob = _roundtrip(data)
    assert len(blob) < len(data) * 0.05


def test_multi_metablock():
    data = (open(ALICE, "rb").read()[:40000] if os.path.exists(ALICE)
            else b"some text that repeats itself " * 1500)
    opts = DivansOptions(metablock_size=8192)
    blob = _roundtrip(data, opts)
    _w, _mb, frames, _crc, _flags = fmt.deserialize(blob)
    assert len(frames) == (len(data) + 8191) // 8192


def test_all_option_profiles_roundtrip():
    data = (open(ALICE, "rb").read()[:20000] if os.path.exists(ALICE)
            else b"profile test data with some repetition repetition " * 400)
    for opts in [
        DivansOptions(use_context_map=False, dynamic_context_mixing=0),
        DivansOptions(dynamic_context_mixing=0),
        DivansOptions(dynamic_context_mixing=2),
        DivansOptions(dynamic_context_mixing=3),
        DivansOptions(quality=4),
        DivansOptions(quality=11),
    ]:
        _roundtrip(data, opts)


def test_prior_depth_formally_dropped():
    """prior_depth is a loud error, not a silent no-op (VERDICT r3 #9;
    reference keys priors by depth, src/interface.rs:444-484 — this
    build's literal model is depth-free in every engine)."""
    with pytest.raises(ValueError, match="prior_depth"):
        DivansOptions(prior_depth=1)


def test_corrupt_stream_rejected():
    data = b"the quick brown fox jumps over the lazy dog " * 100
    blob = bytearray(_roundtrip(data))
    # flip a bit in the middle of the payload
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(Exception):
        engine_np.decompress(bytes(blob))


def test_truncated_stream_rejected():
    data = b"truncation test " * 200
    blob = _roundtrip(data)
    with pytest.raises(Exception):
        engine_np.decompress(blob[:len(blob) // 2])


def test_crc_trailer_checked():
    data = b"crc test " * 100
    blob = bytearray(_roundtrip(data))
    blob[-5] ^= 0xFF  # corrupt stored crc
    with pytest.raises(fmt.CorruptContainer):
        engine_np.decompress(bytes(blob))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(ALICE), reason="corpus not present")
def test_alice29_ratio_ceiling():
    """Reference gates: ≤0.46 internal-IR, ≤0.34 brotli-hybrid
    (integration_test.rs:235-236). We hold ourselves to the stricter one."""
    data = open(ALICE, "rb").read()
    blob = _roundtrip(data, DivansOptions(quality=10))
    assert len(blob) / len(data) <= 0.34, len(blob) / len(data)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(ASYOULIK), reason="corpus not present")
def test_asyoulik_ratio_ceiling():
    data = open(ASYOULIK, "rb").read()
    blob = _roundtrip(data, DivansOptions(quality=10))
    assert len(blob) / len(data) <= 0.40, len(blob) / len(data)


def test_dictionary_command_roundtrip():
    """Dict commands code and execute if the static dictionary is present."""
    from divans_tpu import dictionary
    from divans_tpu.ir import commands as cmds
    d = dictionary.load()
    if not d.available:
        pytest.skip("no brotli dictionary on this system")
    word = d.transform_word(8, 100, 0)
    raw = b"prefix " + word + b" suffix"
    commands = [
        cmds.PredictionMode(literal_context_map=bytes(range(64)),
                            distance_context_map=bytes([0, 1, 2, 3])),
        cmds.Literal(b"prefix "),
        cmds.Dict(word_size=8, word_id=100, transform=0, final_size=len(word)),
        cmds.Literal(b" suffix"),
    ]
    opts = DivansOptions()
    cmd_b, lit_b = engine_np.encode_metablock(raw, commands, opts)
    out = engine_np.decode_metablock(cmd_b, lit_b, len(raw), opts)
    assert out == raw


def test_block_switch_roundtrip():
    from divans_tpu.ir import commands as cmds
    raw = b"AAAA1111BBBB2222"
    commands = [
        cmds.PredictionMode(literal_context_map=bytes(range(64)),
                            distance_context_map=bytes([0, 1, 2, 3])),
        cmds.Literal(b"AAAA"),
        cmds.BlockSwitchLiteral(block_type=1, stride=1),
        cmds.Literal(b"1111"),
        cmds.BlockSwitchCommand(block_type=1),
        cmds.BlockSwitchDistance(block_type=1),
        cmds.Literal(b"BBBB"),
        cmds.BlockSwitchLiteral(block_type=0, stride=0),
        cmds.Literal(b"2222"),
    ]
    opts = DivansOptions()
    cmd_b, lit_b = engine_np.encode_metablock(raw, commands, opts)
    out = engine_np.decode_metablock(cmd_b, lit_b, len(raw), opts)
    assert out == raw


def test_high_entropy_literal_escape():
    """rndins / high-entropy literal (reference literal.rs:569-583): the
    escape nibble travels; content codes identically on both engines."""
    import numpy as np
    from divans_tpu.ir import commands as cmds
    from divans_tpu.ir.matcher import default_prediction_mode
    from divans_tpu.container.crc32c import crc32c
    from divans_tpu.codec import jax_engine

    rng = np.random.RandomState(1)
    raw = bytes(rng.randint(0, 256, 2000).astype(np.uint8))
    opts = DivansOptions()
    commands = [default_prediction_mode(opts),
                cmds.Literal(raw, high_entropy=True)]
    cb, lb = engine_np.encode_metablock(raw, commands, opts)
    blob = fmt.serialize([fmt.MetablockFrame(len(raw), cb, lb)], 22, 18,
                         crc32c(raw))
    assert engine_np.decompress(blob) == raw
    assert jax_engine.decompress(blob) == raw
