"""Pallas TPU decode mega-kernel for the deferred profile.

The reference's decode story is consumer parallelism: a 2-thread pipeline
pulling two interleaved ANS streams (src/parallel_decompressor.rs:99-133)
with a 4-byte-pull rANS loop (src/ans.rs:172-253).  The TPU equivalent is
breadth: L metablock lanes decode in lockstep inside one Mosaic program,
one coded nibble per lane per step, with the chunk-deferred model profile
(codec/deferred.py) making everything inside a chunk gather-only.

Semantics: the command FSM mirrors codec/jax_decode.py (itself cited
against the reference state machines) and the model policy mirrors
codec/deferred.py / pallas_model.py phase B exactly; outputs are
byte-identical to deferred.decode_metablock per lane (tests).

Layout — everything lives in the "grouped-replicated" form:

  * L = 8*G lanes; lane l = (group g = l//8, block cb = l%8).
  * Per-lane scalar state: int32[G, 128] where lane l's value is
    replicated over columns [16*cb, 16*cb+16).  Elementwise FSM ops stay
    elementwise; 16-entry CDF rows occupy one column block, so CDF math
    (symbol search, (start, freq) extraction, mixing) runs on the same
    vregs with segment reductions (masked lane-rolls, `seg_sum`).
  * Model: int32[G*R, 128] — group g's dense model rows (layout.py) at
    [g*R, (g+1)*R); lane cb's 16 CDF entries in its column block.  Row
    fetch = one dynamic-row read per lane per coded nibble (the scalar
    unit co-schedules with the VPU transition math).
  * Window: int32[G*Wr, 128], one byte per int32; byte b of lane (g, cb)
    at row g*Wr + (b >> 4), column 16*cb + (b & 15).  Copies execute
    inline in the step that completes the distance (so every kernel step
    is exactly one coded nibble per live lane and chunk boundaries stay
    lockstep), moving up to 16 bytes per inner iteration via
    read-rotate-merge row ops.
  * Streams: u16 renorm words (ans/coder_np.py rans32) as int32[T, 128],
    lane l's word t at [t, l]; one conditional row-read+extract per pull.
  * Chunk boundary: logs of (flat, value, inc, lim) / (cm_idx, cm_inc,
    cm_lim) recorded per step as [G, 128] plane writes, consumed at the
    next chunk boundary as per-lane [S, 1] column slices feeding the
    bit-exact onehot histogram matmul + renorm of pallas_model phase B
    (one-chunk commit lag, LAG=1).

Grid = chunks; the frame container carries per-metablock coded-nibble
counts (container/format.py FLAG_NIBCOUNT) so the grid size is exact.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG2_SCALE

READY = False  # flipped True once the kernel is wired + validated

SEG = 16          # column-block width (16 CDF entries)
LANES_PER_GROUP = 128 // SEG   # 8


def _col_iota(g):
    return jax.lax.broadcasted_iota(jnp.int32, (g, 128), 1)


def _ent_iota(g):
    """Entry index within each 16-column block."""
    return _col_iota(g) & (SEG - 1)


def rot_seg(x, k):
    """Rotate each 16-column block left by k (static, 0 < k < 16).

    result[c] = x[block_base + ((c % 16) + k) % 16]."""
    a = pltpu.roll(x, shift=128 - k, axis=1)   # x[c + k]  (mod 128)
    b = pltpu.roll(x, shift=SEG - k, axis=1)   # x[c + k - 16]
    ent = _ent_iota(x.shape[0])
    return jnp.where(ent < SEG - k, a, b)


def seg_sum(x):
    """All-columns-replicated sum over each 16-column block."""
    for k in (1, 2, 4, 8):
        x = x + rot_seg(x, k)
    return x


def seg_extract(x, idx):
    """Per-block entry extraction, replicated: y[*] = x[block, idx].

    idx: replicated per-lane entry index in [0, 16)."""
    ent = _ent_iota(x.shape[0])
    return seg_sum(jnp.where(ent == idx, x, 0))


def seg_bcast0(x):
    """Replicate each block's entry 0 across its block."""
    return seg_extract(x, jnp.zeros_like(x))


def _bitlen(x):
    """bit_length of non-negative int32 (vectorized)."""
    r = jnp.zeros_like(x)
    for shift in (16, 8, 4, 2, 1):
        r = jnp.where((x >> (r + shift)) > 0, r + shift, r)
    return r + (x > 0).astype(x.dtype)


def _exact_div(a, b):
    """floor(a/b) for int32 a in [0, 2^31), b in [1, 2^24)."""
    rec = pl.reciprocal(b.astype(jnp.float32), approx=False)
    q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    q = q + (rem.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    for _ in range(2):
        q = q + (rem >= b).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = a - q * b
    return q


def _wrap_i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


# ----------------------------------------------------------------- CDF math
# Grouped-replicated ports of probability/cdf16.py: `cdf` is [G, 128] with
# each lane's 16 cumulative counts in its column block; per-lane scalars
# are replicated over the block.

def g_offset_to_sym(cdf, offset):
    """cdf16.offset_to_sym: sym = #{i in 0..14 : cdf[i] <= rescaled}."""
    g = cdf.shape[0]
    maxv = seg_extract(cdf, jnp.full_like(cdf, 15))
    rescaled = (offset * maxv) >> LOG2_SCALE
    ent = _ent_iota(g)
    below = ((cdf <= rescaled) & (ent < 15)).astype(jnp.int32)
    return seg_sum(below)


def g_sym_to_start_freq(cdf, sym):
    """cdf16.sym_to_start_freq, replicated (start, freq)."""
    maxv = seg_extract(cdf, jnp.full_like(cdf, 15))
    c_sym = seg_extract(cdf, sym)
    c_prev = jnp.where(sym > 0, seg_extract(cdf, sym - 1), 0)
    r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
    r_prev = jnp.where(sym > 0,
                       _exact_div(c_prev << LOG2_SCALE, maxv), 0)
    return r_prev + 1, r_sym - r_prev - 1


def g_average(cdf_a, cdf_b, mix_rate):
    """cdf16.average in grouped layout (mix_rate replicated per lane)."""
    amax = seg_extract(cdf_a, jnp.full_like(cdf_a, 15))
    bmax = seg_extract(cdf_b, jnp.full_like(cdf_b, 15))
    shift = jnp.maximum(_bitlen(amax * bmax) - 15, 0)
    inv_mix = (1 << 15) - mix_rate
    ra = (cdf_a * bmax) >> shift
    rb = (cdf_b * amax) >> shift
    return _wrap_i16((ra * mix_rate + rb * inv_mix + 1) >> 15)
