"""Two-model adaptive mixer weights (reference: src/codec/weights.rs).

State is a pair of int32 weights plus the mixing level.  `update` is the
integer logistic-style rule (weights.rs:108-133); `norm_weight` reproduces
the 8-bit-reciprocal normalization (weights.rs:53-62 + numeric.rs
fast_divide_16bit_by_8bit) bit-exactly — the approximation error is part
of the format, since encoder and decoder must agree on the mixed CDF.

All helpers are vectorized: w0/w1 may be arrays (batch of mixers).
"""
from __future__ import annotations

import numpy as np

from ..constants import LOG2_SCALE, BLEND_FIXED_POINT_PRECISION

WEIGHT_INIT = (1, 1)
NORM_WEIGHT_INIT = 1 << (BLEND_FIXED_POINT_PRECISION - 1)
_SHIFT_16_BY_8 = 24


def _bit_length_pos64(x, xp=np):
    x = xp.asarray(x, xp.int64)
    r = xp.zeros_like(x)
    for shift in (32, 16, 8, 4, 2, 1):
        has = (x >> (r + shift)) > 0
        r = xp.where(has, r + shift, r)
    return r + (x > 0).astype(xp.int64)


def _fix_weights(w0, w1, xp=np):
    """Rescale both weights when either approaches 2^24 (weights.rs:64-80)."""
    over = ((w0 | w1) & 0x7F000000) != 0
    ilog = xp.maximum(_bit_length_pos64(w0, xp), _bit_length_pos64(w1, xp)).astype(xp.int32)
    sh = xp.maximum(ilog - 24, 0)
    return (xp.where(over, w0 >> sh, w0), xp.where(over, w1 >> sh, w1))


def _compute_new_weight(prob_i, weighted_prob, w_i, xp=np):
    """weights.rs:108-133 integer update for one model's weight."""
    p1 = xp.asarray(weighted_prob, xp.int64)
    total = xp.asarray(1 << LOG2_SCALE, xp.int64)
    p0 = total - p1
    n1i = xp.asarray(prob_i, xp.int64)
    error = total - p1
    efficacy = total * n1i - p1 * total
    log_geo = _bit_length_pos64(p1 * p0, xp)  # == 64 - leading_zeros(p1*p0)
    adj = (error * efficacy) >> log_geo
    wi = xp.asarray(w_i, xp.int64)
    # Rust truncates (wi + adj) to i32 before the max(1, ·) clamp.
    s = wi + adj
    s32 = ((s + 0x80000000) & 0xFFFFFFFF) - 0x80000000
    return xp.maximum(1, s32).astype(xp.int64)


def update(w0, w1, prob0, prob1, weighted_prob, xp=np):
    """One mixer step: returns (w0', w1', norm_weight').

    prob0/prob1: the coded symbol's freq under each model's CDF;
    weighted_prob: its freq under the mixed CDF actually used.
    """
    w0 = xp.asarray(w0, xp.int64)
    w1 = xp.asarray(w1, xp.int64)
    w0, w1 = _fix_weights(w0, w1, xp)
    w0n = _compute_new_weight(prob0, weighted_prob, w0, xp)
    w1n = _compute_new_weight(prob1, weighted_prob, w1, xp)
    return w0n, w1n, norm_weight(w0n, w1n, xp)


def norm_weight(w0, w1, xp=np):
    """normalized w0/(w0+w1) in 15-bit fixed point via 8-bit reciprocal.

    Bit-exact reproduction of compute_normalized_weight (weights.rs:53-62):
    shift both to 8 bits, then multiply by (1 + (1<<24)/total8) >> 24.
    """
    w0 = xp.asarray(w0, xp.int64)
    w1 = xp.asarray(w1, xp.int64)
    total = w0 + w1
    # shift = max(56 - clz64(total), 0) == max(bit_length(total) - 8, 0)
    sh = xp.maximum(_bit_length_pos64(total, xp) - 8, 0)
    total8 = total >> sh
    inv = 1 + (1 << _SHIFT_16_BY_8) // total8
    num = (w0 >> sh) << 8
    q = (inv * num) >> _SHIFT_16_BY_8
    # Rust casts to i16 then shifts left by 7 (i16 arithmetic, may wrap).
    q16 = ((q + 0x8000) & 0xFFFF) - 0x8000
    res = q16 << (BLEND_FIXED_POINT_PRECISION - 8)
    return (((res + 0x8000) & 0xFFFF) - 0x8000).astype(xp.int32)
