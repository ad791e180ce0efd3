"""Block-type segmentation + literal block switches (ir/blocks.py).

VERDICT r1 #10: the matcher must emit block switches where they pay; a
heterogeneous fixture must compress measurably better and round-trip.
Reference: /root/reference/src/codec/block_type.rs:18-195 (the switch
codec) with brotli's splitter as the source of splits.
"""
import numpy as np
import pytest

from divans_tpu.codec import engine_np
from divans_tpu.options import DivansOptions
from divans_tpu.ir import blocks, commands as cmds


def _hetero(n_text=120000, n_bin=120000):
    alice = open("/root/reference/testdata/alice29", "rb").read()[:n_text]
    t = np.arange(n_bin)
    wave = (20000 * np.sin(t / 300.0)
            + 3000 * np.sin(t / 17.0)).astype("<i2").tobytes()
    return alice + wave + alice[: n_text // 3]


class TestSegment:
    def test_finds_text_binary_boundary(self):
        data = _hetero()
        segs = blocks.segment(data)
        assert len(segs) >= 3
        types = [t for _, t in segs]
        assert types[0] == 0 and len(set(types)) >= 2

    def test_homogeneous_is_one_segment(self):
        alice = open("/root/reference/testdata/alice29", "rb").read()
        assert blocks.segment(alice) == [(0, 0)]

    def test_per_type_strides(self):
        data = _hetero()
        segs = blocks.segment(data)
        strides = blocks.per_type_strides(data, segs)
        assert strides[0] == 1          # text
        assert max(strides) > 1         # int16 wave


class TestBlockSplitStreams:
    def test_ratio_improves_and_round_trips(self):
        data = _hetero()
        base = engine_np.compress(data, DivansOptions())
        split = engine_np.compress(data, DivansOptions(block_split=True))
        assert len(split) < 0.90 * len(base), (len(split), len(base))
        assert engine_np.decompress(split) == data

    def test_switch_commands_emitted(self):
        from divans_tpu.ir.matcher import build_commands
        data = _hetero()
        out = build_commands(data, DivansOptions(block_split=True))
        switches = [c for c in out if isinstance(c, cmds.BlockSwitchLiteral)]
        assert switches
        assert isinstance(out[0], cmds.PredictionMode)
        assert len(out[0].literal_context_map) % 64 == 0
        assert len(out[0].literal_context_map) > 64

    def test_api_auto_round_trips_with_fallback(self):
        """block_split containers are byte-identical across engines (the
        native split profile encodes/decodes switches directly now)."""
        from divans_tpu import api
        data = _hetero(40000, 40000)
        blob = api.compress(data, DivansOptions(block_split=True))
        assert blob == engine_np.compress(data,
                                          DivansOptions(block_split=True))
        assert api.decompress(blob) == data
        assert api.decompress(blob, engine="jax") == data

    def test_homogeneous_input_unchanged(self):
        data = open("/root/reference/testdata/alice29", "rb").read()[:60000]
        assert engine_np.compress(data, DivansOptions(block_split=True)) \
            == engine_np.compress(data, DivansOptions())
