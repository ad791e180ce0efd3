"""16-symbol adaptive CDF arithmetic — the normative integer semantics.

All functions are pure, operate on int32 arrays whose trailing axis is the
16 cumulative counts, and work identically under numpy and jax.numpy (pass
the namespace as `xp`).  Where the reference relies on i16 wraparound
(FrequentistCDF16::blend, src/probability/frequentist_cdf.rs:73-85) we wrap
explicitly, so the semantics are well defined in int32.

Reference semantics implemented here:
  - blend:            frequentist_cdf.rs:73-85
  - average:          frequentist_cdf.rs:56-72
  - sym→(start,freq): probability/interface.rs:97-108  (the +1/-1 "hax")
  - offset→sym:       probability/interface.rs:136-198 (15-compare chain)

The reference's reciprocal-multiply divider (numeric.rs:26-31) is asserted
bit-identical to exact i32 division by its own test vectors; we use exact
floor division (values are non-negative), which XLA lowers efficiently.
"""
from __future__ import annotations

import numpy as np

from ..constants import LOG2_SCALE

CDF_INIT = np.arange(4, 68, 4, dtype=np.int32)  # [4, 8, ..., 64]
CDF_BIAS = np.arange(1, 17, dtype=np.int32)     # [1..16]
_SYM_IDX = np.arange(16, dtype=np.int32)


def wrap_i16(x, xp=np):
    """Wrap int32 values to int16 two's-complement range."""
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def fresh(batch_shape=(), xp=np):
    """A default CDF (or batch of them): cumulative [4,8,...,64]."""
    return xp.broadcast_to(xp.asarray(CDF_INIT), tuple(batch_shape) + (16,)) + xp.zeros(1, xp.int32)


def blend(cdf, sym, inc, lim, xp=np):
    """Adapt `cdf` toward `sym` with Speed(inc, lim).

    cdf: int32[..., 16]; sym/inc/lim: int32 scalars or broadcastable arrays.
    Returns the updated cdf.  Matches FrequentistCDF16::blend exactly,
    including i16 wraparound and the (c+bias) - ((c+bias)>>2) renorm.
    """
    sym = xp.asarray(sym, xp.int32)
    inc = xp.asarray(inc, xp.int32)
    lim = xp.asarray(lim, xp.int32)
    idx = xp.asarray(_SYM_IDX)
    bump = xp.where(idx >= sym[..., None], inc[..., None], 0)
    c = wrap_i16(cdf + bump, xp)
    cb = wrap_i16(c + xp.asarray(CDF_BIAS), xp)
    renormed = wrap_i16(cb - (cb >> 2), xp)
    need = (c[..., 15:16] >= lim[..., None])
    return xp.where(need, renormed, c)


def _bit_length_pos(x, xp=np):
    """bit_length of non-negative int32 values (vectorized, no float)."""
    r = xp.zeros_like(x)
    for shift in (16, 8, 4, 2, 1):
        m = x >> (r + shift)
        has = m > 0
        r = xp.where(has, r + shift, r)
    return r + (x > 0).astype(x.dtype)


def average(cdf_a, cdf_b, mix_rate, xp=np):
    """Mix two CDFs: result ≈ mix_rate·a + (1-mix_rate)·b in 15-bit fixed point.

    Matches FrequentistCDF16::average: both are first rescaled by the
    other's max and shifted so products fit, then linearly blended.
    mix_rate: int32 in [0, 32768].
    """
    amax = cdf_a[..., 15:16]
    bmax = cdf_b[..., 15:16]
    prod = amax * bmax
    # desired_shift = 17 - min(clz32(prod), 17) == max(bit_length(prod) - 15, 0)
    shift = xp.maximum(_bit_length_pos(prod, xp) - 15, 0)
    mix_rate = xp.asarray(mix_rate, xp.int32)
    inv_mix = (1 << 15) - mix_rate
    ra = (cdf_a * bmax) >> shift
    rb = (cdf_b * amax) >> shift
    if mix_rate.ndim:
        mix_rate = mix_rate[..., None]
        inv_mix = inv_mix[..., None]
    return wrap_i16((ra * mix_rate + rb * inv_mix + 1) >> 15, xp)


def sym_to_start_freq(cdf, sym, xp=np):
    """(start, freq) range of `sym` under `cdf`, rescaled to the 15-bit domain.

    start = floor(cdf[sym-1]<<15 / max) + 1   (0 term for sym==0)
    freq  = floor(cdf[sym]<<15 / max) - (start-1) - 1
    """
    maxv = cdf[..., 15]
    c_sym = xp.take_along_axis(cdf, sym[..., None], axis=-1)[..., 0]
    sym_prev = xp.maximum(sym - 1, 0)
    c_prev_raw = xp.take_along_axis(cdf, sym_prev[..., None], axis=-1)[..., 0]
    c_prev = xp.where(sym > 0, c_prev_raw, 0)
    r_sym = (c_sym << LOG2_SCALE) // maxv
    r_prev = xp.where(sym > 0, (c_prev << LOG2_SCALE) // maxv, 0)
    start = r_prev + 1
    freq = r_sym - r_prev - 1
    return start, freq


def offset_to_sym(cdf, cdf_offset, xp=np):
    """Decode-side inverse: which symbol owns 15-bit offset `cdf_offset`.

    rescaled = (offset * max) >> 15; sym = #{i in 0..14 : cdf[i] <= rescaled}.
    """
    maxv = cdf[..., 15:16]
    rescaled = (cdf_offset[..., None] * maxv) >> LOG2_SCALE
    return xp.sum((cdf[..., :15] <= rescaled).astype(xp.int32), axis=-1)


def decode_sym_start_freq(cdf, cdf_offset, xp=np):
    """offset → (sym, start, freq): the full decode-side lookup."""
    sym = offset_to_sym(cdf, cdf_offset, xp)
    start, freq = sym_to_start_freq(cdf, sym, xp)
    return sym, start, freq


def pdf_all(cdf, xp=np):
    """pdf for all 16 symbols (un-rescaled counts)."""
    prev = xp.concatenate([xp.zeros_like(cdf[..., :1]), cdf[..., :15]], axis=-1)
    return cdf - prev
