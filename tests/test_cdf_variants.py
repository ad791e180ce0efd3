"""BlendCDF16 and ExternalProbCDF16 (components 7 and 9) tests.

Mirrors the reference's common CDF property tests
(src/probability/common_tests.rs): range continuity, nonzero pdf,
convergence toward the driven distribution.
"""
import numpy as np
import pytest

from divans_tpu.probability import blend_cdf, external_cdf
from divans_tpu.probability.speed import MED
from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np


# ------------------------------------------------------------ BlendCDF16

def test_blend_cdf_valid_and_monotone():
    cdf, mr, cnt = blend_cdf.fresh()
    rng = np.random.RandomState(0)
    for _ in range(500):
        sym = int(rng.randint(0, 16))
        cdf, mr, cnt = blend_cdf.blend(cdf, mr, cnt, sym)
        looks = [int(blend_cdf.cdf_lookup(cdf, np.int32(s))) for s in range(16)]
        assert looks[15] == blend_cdf.CDF_MAX
        assert all(0 < looks[0] <= looks[i] <= looks[i + 1]
                   for i in range(15)), looks
        assert all(int(blend_cdf.pdf(cdf, np.int32(s))) > 0
                   for s in range(16))


def test_blend_cdf_converges():
    cdf, mr, cnt = blend_cdf.fresh()
    for _ in range(2000):
        cdf, mr, cnt = blend_cdf.blend(cdf, mr, cnt, 5)
    p5 = int(blend_cdf.pdf(cdf, np.int32(5)))
    assert p5 > 0.8 * blend_cdf.CDF_MAX, p5


def test_blend_cdf_batched_equals_scalar():
    c1, m1, n1 = blend_cdf.fresh((4,))
    c0, m0, n0 = blend_cdf.fresh()
    syms = [3, 3, 9, 0, 15, 3]
    for s in syms:
        c1, m1, n1 = blend_cdf.blend(c1, m1, n1, np.full(4, s, np.int32))
        c0, m0, n0 = blend_cdf.blend(c0, m0, n0, s)
    assert np.array_equal(c1[2], c0)


# ------------------------------------------------ ExternalProbCDF16 (#9)

def test_external_cdf_shape_and_bias():
    # strongly biased bits -> nibble 0b1010 = 10 gets a large share
    # (nibble 0 also does, via the reference's mcdf[0] == 1.0 quirk,
    # external_cdf.rs:40-41)
    cdf = external_cdf.external_prob_cdf(bytes([250, 5, 250, 5]))
    pdf = np.diff([0] + list(cdf))
    assert pdf[0b1010] > 0.3 * 32767
    assert all(p > 0 for p in pdf)
    assert cdf[15] <= 32766


def test_external_cdf_uniform():
    cdf = external_cdf.external_prob_cdf(bytes([128, 128, 128, 128]))
    pdf = np.diff([0] + list(cdf))
    # nibble 0 carries the reference's mcdf[0] == 1.0 bias; the rest are flat
    assert pdf[1:].max() < 3 * pdf[1:].min()


def test_probs_for_nibble_indexing():
    sl = bytes(range(16))
    assert external_cdf.probs_for_nibble(sl, 0, False) == bytes([0, 1, 2, 3])
    assert external_cdf.probs_for_nibble(sl, 0, True) == bytes([4, 5, 6, 7])
    assert external_cdf.probs_for_nibble(sl, 1, True) == bytes([12, 13, 14, 15])
    assert external_cdf.probs_for_nibble(sl, 2, False) is None


def test_external_probs_roundtrip_and_gain():
    rng = np.random.RandomState(1)
    # data drawn from a skewed per-position distribution the provider knows
    bits = rng.rand(4096, 8) < 0.9          # mostly-ones bytes
    data = bytes(np.packbits(bits, axis=1).reshape(-1)[:4096].tolist())
    probs = bytes([230] * (8 * len(data)))  # p(bit==1) ~ 0.9 everywhere
    opts = DivansOptions(external_probs=probs)
    blob = engine_np.compress(data, opts)
    assert engine_np.decompress(blob, opts) == data
    # informed bits beat raw by a wide margin (p=0.9 bits ~ 0.47 bits each);
    # (the adaptive model can still win — the ECDF halves its sharpness with
    # the default CDF by construction, external_cdf.rs:50-52)
    assert len(blob) < 0.75 * len(data), (len(blob), len(data))


def test_external_probs_multiblock():
    data = bytes(range(256)) * 40
    probs = bytes([128] * (8 * len(data)))
    opts = DivansOptions(external_probs=probs, metablock_size=4096)
    blob = engine_np.compress(data, opts)
    assert engine_np.decompress(blob, opts) == data


# ------------------------------------------------------- findspeed (#8)

def test_findspeed_reports_segments():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "find_speed", os.path.join(os.path.dirname(__file__), "..",
                                   "research", "find_speed.py"))
    fs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fs)
    from divans_tpu.codec import trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    data = open("/root/reference/testdata/alice29", "rb").read()[:4096]
    opts = DivansOptions()
    layout = ModelLayout(PROFILES["cm"])
    tr = trace_mod.build_trace(data, build_commands(data, opts), opts, layout)
    costs = fs.shadow_costs(tr, layout)
    assert "lit_lo" in costs and "cc" in costs
    bits, speed = costs["lit_lo"][0]
    assert bits > 0 and speed.inc > 0
