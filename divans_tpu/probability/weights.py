"""Two-model adaptive mixer weights (reference: src/codec/weights.rs).

State is a pair of weights plus the normalized mixing level.  `update` is
the integer logistic-style rule (weights.rs:108-133); `norm_weight`
reproduces the 8-bit-reciprocal normalization (weights.rs:53-62 +
numeric.rs fast_divide_16bit_by_8bit) bit-exactly — the approximation
error is part of the format, since encoder and decoder must agree on the
mixed CDF.

Every operation here is **int32-exact** (no 64-bit arithmetic), which is
what lets the mixer run native on TPU VPU lanes:

  - the reference's `(error * efficacy) >> log_geo` has a 2^45
    intermediate; we fold the 2^15 of `efficacy` into the shift
    (log_geo >= 15 always since p1*p0 >= 2^15 - 1), giving
    `(error * (n1i - p1)) >> (log_geo - 15)` with a < 2^30 intermediate;
  - weights are clamped to [1, 2^30 - 1] (the reference only floors at
    1), so w0 + w1 in norm_weight fits int32 — a deliberate format
    departure, defined identically in the golden scalar engine;
  - norm_weight's `(inv * num) >> 24` (up to 2^39) is computed with an
    exact 12/12-bit split multiply.

All helpers are vectorized: w0/w1 may be arrays (batch of mixers).
Asserted bit-identical to probability/scalar.py by tests/test_cdf16.py.
"""
from __future__ import annotations

import numpy as np

from ..constants import LOG2_SCALE, BLEND_FIXED_POINT_PRECISION

WEIGHT_INIT = (1, 1)
NORM_WEIGHT_INIT = 1 << (BLEND_FIXED_POINT_PRECISION - 1)
WEIGHT_MAX = (1 << 30) - 1
_SHIFT_16_BY_8 = 24


def _bit_length_pos(x, xp=np):
    x = xp.asarray(x, xp.int32)
    r = xp.zeros_like(x)
    for shift in (16, 8, 4, 2, 1):
        has = (x >> (r + shift)) > 0
        r = xp.where(has, r + shift, r)
    return (r + (x > 0).astype(xp.int32)).astype(xp.int32)


def _fix_weights(w0, w1, xp=np):
    """Rescale both weights when either approaches 2^24 (weights.rs:64-80)."""
    over = ((w0 | w1) & 0x7F000000) != 0
    ilog = xp.maximum(_bit_length_pos(w0, xp), _bit_length_pos(w1, xp))
    sh = xp.maximum(ilog - 24, 0)
    return (xp.where(over, w0 >> sh, w0), xp.where(over, w1 >> sh, w1))


def _compute_new_weight(prob_i, weighted_prob, w_i, xp=np):
    """weights.rs:108-133 integer update for one model's weight, int32."""
    p1 = xp.asarray(weighted_prob, xp.int32)
    total = xp.int32(1 << LOG2_SCALE)
    p0 = total - p1
    n1i = xp.asarray(prob_i, xp.int32)
    error = total - p1                       # == p0
    # (error * (n1i - p1) * 2^15) >> log_geo with the 2^15 folded into the
    # shift; arithmetic right shift floors for negatives in numpy and XLA.
    log_geo = _bit_length_pos(p1 * p0, xp)   # in [15, 29]
    adj = (error * (n1i - p1)) >> (log_geo - 15)
    s = xp.asarray(w_i, xp.int32) + adj      # int32 wrap == reference i32 cast
    return xp.minimum(xp.maximum(xp.int32(1), s), xp.int32(WEIGHT_MAX))


def update(w0, w1, prob0, prob1, weighted_prob, xp=np):
    """One mixer step: returns (w0', w1', norm_weight'), all int32.

    prob0/prob1: the coded symbol's freq under each model's CDF;
    weighted_prob: its freq under the mixed CDF actually used.
    """
    w0 = xp.asarray(w0, xp.int32)
    w1 = xp.asarray(w1, xp.int32)
    w0, w1 = _fix_weights(w0, w1, xp)
    w0n = _compute_new_weight(prob0, weighted_prob, w0, xp)
    w1n = _compute_new_weight(prob1, weighted_prob, w1, xp)
    return w0n, w1n, norm_weight(w0n, w1n, xp)


def _mul_shift24(inv, num, xp=np):
    """Exact (inv * num) >> 24 for inv < 2^24, num < 2^16, in int32."""
    hi = (inv >> 12) * num                   # < 2^28
    lo = (inv & 0xFFF) * num                 # < 2^28
    return (hi + (lo >> 12)) >> 12


def norm_weight(w0, w1, xp=np):
    """15-bit fixed-point w0/(w0+w1) via 8-bit reciprocal (weights.rs:53-62)."""
    w0 = xp.asarray(w0, xp.int32)
    w1 = xp.asarray(w1, xp.int32)
    total = w0 + w1                          # <= 2^31 - 2 by the clamp
    sh = xp.maximum(_bit_length_pos(total, xp) - 8, 0)
    total8 = total >> sh
    inv = 1 + xp.int32(1 << _SHIFT_16_BY_8) // total8
    num = (w0 >> sh) << 8                    # < 2^16
    q = _mul_shift24(inv, num, xp)
    # Rust casts to i16 then shifts left by 7 (i16 arithmetic, may wrap).
    q16 = ((q + 0x8000) & 0xFFFF) - 0x8000
    res = q16 << (BLEND_FIXED_POINT_PRECISION - 8)
    return (((res + 0x8000) & 0xFFFF) - 0x8000).astype(xp.int32)
