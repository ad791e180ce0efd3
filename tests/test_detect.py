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


class TestPriorBitmask:
    """prior_bitmask_detection (VERDICT r1 #3, the last detection option):
    per-context stride-vs-context prior choice via the mixing mask."""

    @staticmethod
    def _records(n_rec=12000):
        rng = np.random.default_rng(3)
        names = rng.integers(65, 91, (n_rec, 8), dtype=np.uint8)
        names[:, 4:] = names[0, 4:]
        t = np.arange(n_rec)
        f1 = (5000 * np.sin(t / 100.0)).astype("<i2").view(np.uint8)
        f2 = (t * 3).astype("<u2").view(np.uint8)
        return np.concatenate([names, f1.reshape(n_rec, 2),
                               f2.reshape(n_rec, 2)], axis=1).tobytes()

    def test_mask_detected_on_records(self):
        mv = detect.detect_prior_bitmask(self._records(), 1)
        assert mv is not None
        assert any(v >= 4 for v in mv)

    def test_ratio_improves_and_round_trips(self):
        data = self._records()
        base = engine_np.compress(data, DivansOptions())
        det = engine_np.compress(data,
                                 DivansOptions(prior_bitmask_detection=1))
        assert len(det) < 0.99 * len(base)
        assert engine_np.decompress(det) == data

    def test_text_near_noop(self):
        alice = open("/root/reference/testdata/alice29", "rb").read()[:60000]
        base = engine_np.compress(alice, DivansOptions())
        det = engine_np.compress(alice,
                                 DivansOptions(prior_bitmask_detection=1))
        assert len(det) <= 1.005 * len(base)
        assert engine_np.decompress(det) == alice

    def test_api_auto_round_trips(self):
        from divans_tpu import api
        data = self._records(6000)
        blob = api.compress(data, DivansOptions(prior_bitmask_detection=1))
        assert api.decompress(blob) == data
