"""Tests for the deferred-profile Pallas decode kernel (codec/pallas_decode).

Stage 1: grouped-layout segment math vs the numpy cdf16 oracle.
Stage 2: full-kernel bit-exactness vs deferred.decode_metablock.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from divans_tpu.probability import cdf16
from divans_tpu.codec import pallas_decode as pd

rng = np.random.default_rng(7)


def _grouped(vals16, g):
    """[g*8, 16] per-lane rows -> grouped [g, 128]."""
    out = np.zeros((g, 128), np.int32)
    for l in range(g * 8):
        out[l // 8, (l % 8) * 16:(l % 8) * 16 + 16] = vals16[l]
    return out


def _replicated(scalars, g):
    """[g*8] per-lane scalars -> grouped-replicated [g, 128]."""
    out = np.zeros((g, 128), np.int32)
    for l in range(g * 8):
        out[l // 8, (l % 8) * 16:(l % 8) * 16 + 16] = scalars[l]
    return out


def _lane0(x, l):
    """Extract lane l's replicated value from grouped [g, 128]."""
    return x[l // 8, (l % 8) * 16]


def _run_kernel(fn, *arrays):
    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[:] = fn(*[r[:] for r in refs[:-1]])

    g = arrays[0].shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(*[jnp.asarray(a) for a in arrays])


def _rand_cdfs(n):
    """n random valid-ish monotone CDFs (strictly increasing, max < 2^15)."""
    out = []
    for _ in range(n):
        incs = rng.integers(1, 1500, size=16)
        out.append(np.cumsum(incs).astype(np.int32))
    return np.stack(out)


class TestSegOps:
    def test_seg_sum(self):
        g = 2
        x = rng.integers(0, 1000, size=(g, 128)).astype(np.int32)
        out = np.asarray(_run_kernel(pd.seg_sum, x))
        for blk in range(8 * g):
            r, c0 = blk // 8, (blk % 8) * 16
            want = x[r, c0:c0 + 16].sum()
            assert (out[r, c0:c0 + 16] == want).all()

    def test_seg_extract(self):
        g = 2
        x = rng.integers(0, 1000, size=(g, 128)).astype(np.int32)
        idx = _replicated(rng.integers(0, 16, size=g * 8), g)
        out = np.asarray(_run_kernel(pd.seg_extract, x, idx))
        for l in range(8 * g):
            r, c0 = l // 8, (l % 8) * 16
            want = x[r, c0 + _lane0(idx, l)]
            assert (out[r, c0:c0 + 16] == want).all()


class TestCdfMath:
    def test_offset_to_sym(self):
        g = 2
        cdfs = _rand_cdfs(8 * g)
        offs = rng.integers(0, 1 << 15, size=8 * g)
        out = np.asarray(_run_kernel(
            pd.g_offset_to_sym, _grouped(cdfs, g), _replicated(offs, g)))
        want = cdf16.offset_to_sym(cdfs, offs.astype(np.int32))
        for l in range(8 * g):
            assert _lane0(out, l) == want[l], l

    def test_sym_to_start_freq(self):
        g = 2
        cdfs = _rand_cdfs(8 * g)
        syms = rng.integers(0, 16, size=8 * g)

        outs = np.asarray(_run_kernel(
            lambda c, s: pd.g_sym_to_start_freq(c, s)[0],
            _grouped(cdfs, g), _replicated(syms, g)))
        outf = np.asarray(_run_kernel(
            lambda c, s: pd.g_sym_to_start_freq(c, s)[1],
            _grouped(cdfs, g), _replicated(syms, g)))
        ws, wf = cdf16.sym_to_start_freq(cdfs, syms.astype(np.int32))
        for l in range(8 * g):
            assert _lane0(outs, l) == ws[l], l
            assert _lane0(outf, l) == wf[l], l

    def test_average(self):
        g = 2
        a = _rand_cdfs(8 * g)
        b = _rand_cdfs(8 * g)
        mix = rng.integers(0, (1 << 15) + 1, size=8 * g)
        out = np.asarray(_run_kernel(
            pd.g_average, _grouped(a, g), _grouped(b, g),
            _replicated(mix, g)))
        want = cdf16.average(a, b, mix.astype(np.int32))
        for l in range(8 * g):
            r, c0 = l // 8, (l % 8) * 16
            assert (out[r, c0:c0 + 16] == want[l]).all(), l
