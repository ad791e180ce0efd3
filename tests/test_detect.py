"""Encoder-side detection (ir/detect.py): stride + speed search.

VERDICT r1 #4: the detection options must change the emitted
PredictionMode and measurably improve a binary corpus.  Reference
surface: /root/reference/src/brotli_ir_gen.rs:374-444,
src/interface.rs:444-484.
"""
import numpy as np
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.probability.speed import Speed
from divans_tpu.ir import detect
from divans_tpu.codec import engine_np, jax_engine


def _wave_bytes(n=120000):
    t = np.arange(n)
    wave = (20000 * np.sin(t / 300.0) + 3000 * np.sin(t / 17.0)).astype("<i2")
    return wave.tobytes()


class TestStride:
    def test_detects_multibyte_stride_on_samples(self):
        assert detect.detect_stride(_wave_bytes(), 1) > 1

    def test_keeps_stride1_on_text(self):
        alice = open("/root/reference/testdata/alice29", "rb").read()
        assert detect.detect_stride(alice, 1) == 1

    def test_ratio_improves_on_binary(self):
        data = _wave_bytes()
        base = engine_np.compress(data, DivansOptions())
        det = engine_np.compress(data,
                                 DivansOptions(stride_detection_quality=1))
        assert len(det) < 0.85 * len(base)
        assert engine_np.decompress(det) == data

    def test_force_stride_round_trips(self):
        data = _wave_bytes(40000)
        blob = engine_np.compress(data, DivansOptions(force_stride_value=2))
        assert engine_np.decompress(blob) == data

    def test_api_auto_engine_applies_detection(self):
        """The top-level auto path must resolve detection too (the native
        engine declines the stride profile and defers to the others)."""
        from divans_tpu import api
        data = _wave_bytes(60000)
        base = api.compress(data)
        det = api.compress(data, DivansOptions(stride_detection_quality=1))
        assert len(det) < 0.85 * len(base)
        assert api.decompress(det) == data

    def test_jax_engine_stride_deferred(self):
        data = _wave_bytes(40000)
        opts = DivansOptions(stride_detection_quality=1, chunk_nibbles=256,
                             metablock_size=1 << 15)
        blob = jax_engine.compress(data, opts)
        assert jax_engine.decompress(blob) == data
        # the golden engine agrees on the stream
        assert engine_np.decompress(blob) == data


class TestSpeed:
    def test_speed_detection_changes_stream_and_round_trips(self):
        alice = open("/root/reference/testdata/alice29", "rb").read()[:40000]
        base = engine_np.compress(alice, DivansOptions())
        det = engine_np.compress(alice,
                                 DivansOptions(speed_detection_quality=1))
        assert det != base
        assert len(det) <= 1.01 * len(base)  # never materially worse
        assert engine_np.decompress(det) == alice

    def test_custom_speeds_round_trip(self):
        alice = open("/root/reference/testdata/alice29", "rb").read()[:20000]
        opts = DivansOptions(literal_adaptation=(Speed(1, 256),) * 4)
        blob = engine_np.compress(alice, opts)
        assert engine_np.decompress(blob) == alice
