"""Pallas TPU mega-kernel: the chunk-deferred model pass (encode side).

Implements exactly the deferred-profile rules of codec/deferred.py — same
bytes as deferred.replay_trace / jax_engine.model_pass_deferred — but as
one Mosaic program walking the chunk grid, so the per-chunk work runs at
VPU/MXU rate instead of XLA's ~140ns-per-row gather/scatter floor.

Layout (L = 8 metablock lanes per call):
  * model scratch  int32[L*R, 128]: lane l's dense model occupies sublanes
    [l*R, (l+1)*R), columns 0..15 (the 16 cumulative counts; cols >= 16
    stay zero).  Row fetch is an MXU onehot matmul per lane
    (tpu.dynamic_gather cannot span multiple source vregs, so big-table
    sublane gather does not lower — measured, PERF_NOTES.md).
  * per-chunk coding math runs on [S, 128] tiles per lane: column c of
    row t holds cdf entry c of the row coding step t; per-row scalars
    (max, cdf[sym], ...) are lane-axis masked reductions.
  * boundary histogram: bf16 MXU matmuls per lane per chunk,
    onehot[2S, R] (iota==row compare) x contrib[2S, 128] (cols 0..15
    inc-ge masks, col 16 lim, col 17 hit) -> upd[R, 128].  All matmul
    operands are 7-bit-split exact bf16 integers with f32 accumulation,
    so results are bit-exact regardless of MXU pass selection.
  * integer division (the 15-bit rescale and lim_eff) uses the f32
    reciprocal + refine + fixup trick (exact for a < 2^31).

Grid step k: phase A codes chunk k against the committed snapshot and
stashes its mixer-adjustment sums (parity double-buffer); phase B then
applies chunk k-1's updates — the one-chunk commit lag of the format.

Status: bit-exact on-chip vs deferred.replay_trace; at L=8 lanes the
per-lane full-R matmuls make it SLOWER than the batched XLA
model_pass_deferred (which amortizes over B=32+ metablocks), so the XLA
pass remains the production encode path.  Kept as the starting point for
the r2 packed-lane kernel (see PERF_NOTES.md kernel roadmap).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG2_SCALE
from .deferred import ADJ_CLAMP, MAX_RENORM_PASSES, WEIGHT_MAX

LANES = 8
NFIELD = 10  # trace columns (codec/trace.py)


def _wrap_i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _bitlen(x):
    r = jnp.zeros_like(x)
    for shift in (16, 8, 4, 2, 1):
        r = jnp.where((x >> (r + shift)) > 0, r + shift, r)
    return r + (x > 0).astype(x.dtype)


def _exact_div(a, b):
    """floor(a/b), a int32 in [0, 2^31), b in [1, 2^24)."""
    rec = pl.reciprocal(b.astype(jnp.float32), approx=False)
    q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    q = q + (rem.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    for _ in range(2):
        q = q + (rem >= b).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = a - q * b
    return q


def _lane_reduce(x, mask):
    """sum over lane axis of x*mask -> [rows, 1] (broadcastable scalar/row)."""
    return jnp.sum(jnp.where(mask, x, 0), axis=1, keepdims=True)


def _onehot_mm(oh, b):
    """Exact onehot-weighted integer matmul at native MXU rate.

    oh: bf16 [M, K] of exact 0/1; b: int32 [K, N] with 0 <= b < 2^15.
    b is split into 7-bit halves so every operand is an integer < 2^8 —
    exactly representable in bf16 — making single-pass bf16 matmuls with
    f32 accumulation bit-exact (all sums < 2^24 by the deferred.py
    bounds).  This is ~6x cheaper than f32 Precision.HIGHEST passes.
    """
    hi = (b >> 7).astype(jnp.bfloat16)
    lo = (b & 127).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    out_hi = jax.lax.dot_general(oh, hi, dn,
                                 preferred_element_type=jnp.float32)
    out_lo = jax.lax.dot_general(oh, lo, dn,
                                 preferred_element_type=jnp.float32)
    return (out_hi.astype(jnp.int32) << 7) + out_lo.astype(jnp.int32)


def _kernel(*refs, r, s, c_total):
    # refs: 10 cur blocks, 10 prev blocks, starts, freqs, model, wstate, adj
    cur = refs[:NFIELD]
    prev = refs[NFIELD:2 * NFIELD]
    starts_ref, freqs_ref = refs[2 * NFIELD:2 * NFIELD + 2]
    model_ref, wstate_ref, adj_ref = refs[2 * NFIELD + 2:]
    k = pl.program_id(0)

    ent_s = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 1)
    ent_r = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)

    # ---------------------------------------------------------------- init
    @pl.when(k == 0)
    def _():
        sub = jax.lax.broadcasted_iota(jnp.int32, (LANES * r, 128), 1)
        model_ref[:] = jnp.where(sub < 16, (sub + 1) * 4, 0)
        # wstate rows: 0..2 = w0,w1,nw for which=0; 3..5 for which=1
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        wstate_ref[:] = jnp.where((row == 2) | (row == 5), 1 << 14,
                                  jnp.where(row < 6, 1, 0))
        adj_ref[:] = jnp.zeros_like(adj_ref)

    # ------------------------------------------------- phase A: code chunk k
    def freq_of(cdf, value_b):
        """cdf [s,128] (cols 0..15), value [s,1] -> (start, freq) [s,1]."""
        maxv = _lane_reduce(cdf, ent_s == 15)
        c_sym = _lane_reduce(cdf, ent_s == value_b)
        c_prev = _lane_reduce(cdf, ent_s == value_b - 1)
        r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
        r_prev = _exact_div(c_prev << LOG2_SCALE, maxv)
        return r_prev + 1, r_sym - r_prev - 1

    out_starts = []
    out_freqs = []
    adj_cols = []
    for ln in range(LANES):
        tab = model_ref[ln * r:(ln + 1) * r, :]
        flat = cur[0][:, ln:ln + 1]
        value = cur[1][:, ln:ln + 1]
        mix = cur[5][:, ln:ln + 1]
        which = cur[6][:, ln:ln + 1]
        cm_idx = cur[7][:, ln:ln + 1]

        # row fetch via MXU: tpu.dynamic_gather only spans one vreg of
        # sublanes, so big-table gather is a onehot matmul (_onehot_mm)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (s, r), 1)
        oh_nib = (row_iota == flat).astype(jnp.bfloat16)
        oh_cm = (row_iota == cm_idx).astype(jnp.bfloat16)
        rows = _onehot_mm(oh_nib, tab)
        cm_rows = _onehot_mm(oh_cm, tab)

        # mixed = average(cm_rows, rows, nw) — frequentist_cdf.rs:56-72
        nw0 = wstate_ref[2:3, ln:ln + 1]
        nw1 = wstate_ref[5:6, ln:ln + 1]
        nw = jnp.where(which == 1, jnp.broadcast_to(nw1, (s, 1)),
                       jnp.broadcast_to(nw0, (s, 1))) & 0xFFFF
        amax = _lane_reduce(cm_rows, ent_s == 15)
        bmax = _lane_reduce(rows, ent_s == 15)
        shift = jnp.maximum(_bitlen(amax * bmax) - 15, 0)
        inv_mix = (1 << 15) - nw
        ra = (cm_rows * bmax) >> shift
        rb = (rows * amax) >> shift
        mixed = _wrap_i16((ra * nw + rb * inv_mix + 1) >> 15)
        do_mix = mix != 0
        coded = jnp.where(do_mix, mixed, rows)

        start, freq = freq_of(coded, value)
        out_starts.append(start)
        out_freqs.append(freq)

        # mixer adjustments for this chunk (deferred.weight_adjustments)
        _, p_cm = freq_of(cm_rows, value)
        _, p_nib = freq_of(rows, value)
        p1 = freq
        error = (1 << 15) - p1
        sh = jnp.maximum(_bitlen(p1 * error) - 15, 0)
        a_cm = jnp.clip((error * (p_cm - p1)) >> sh, -ADJ_CLAMP, ADJ_CLAMP)
        a_nib = jnp.clip((error * (p_nib - p1)) >> sh, -ADJ_CLAMP, ADJ_CLAMP)
        sums = []
        for w_ in (0, 1):
            m = do_mix & (which == w_)
            sums.append(jnp.sum(jnp.where(m, a_cm, 0), axis=0, keepdims=True))
            sums.append(jnp.sum(jnp.where(m, a_nib, 0), axis=0, keepdims=True))
        adj_cols.append(jnp.concatenate(sums, axis=0))  # [4, 1]

    starts_ref[:] = jnp.concatenate(out_starts, axis=1)
    freqs_ref[:] = jnp.concatenate(out_freqs, axis=1)
    # stash chunk k's adj sums in parity slot k%2: rows 0..3 or 4..7
    adj_block = jnp.concatenate(adj_cols, axis=1)      # [4, LANES]
    adj_block = jnp.pad(adj_block, ((0, 0), (0, 128 - LANES)))

    @pl.when(k % 2 == 0)
    def _():
        adj_ref[0:4, :] = adj_block

    @pl.when(k % 2 == 1)
    def _():
        adj_ref[4:8, :] = adj_block

    # --------------------------------- phase B: apply chunk k-1 (commit lag)
    @pl.when(k > 0)
    def _():
        for ln in range(LANES):
            flat = prev[0][:, ln:ln + 1]
            value = prev[1][:, ln:ln + 1]
            inc = prev[3][:, ln:ln + 1]
            lim = prev[4][:, ln:ln + 1]
            mix = prev[5][:, ln:ln + 1]
            cm_idx = prev[7][:, ln:ln + 1]
            cm_inc = prev[8][:, ln:ln + 1]
            cm_lim = prev[9][:, ln:ln + 1]

            cm_hit = (mix != 0) & (cm_inc != 0)
            rows_idx = jnp.concatenate([flat, cm_idx], axis=0)      # [2s, 1]
            inc2 = jnp.concatenate(
                [inc, jnp.where(cm_hit, cm_inc, 0)], axis=0)
            lim2 = jnp.concatenate([lim, cm_lim], axis=0)
            sym2 = jnp.concatenate([value, value], axis=0)
            hit = inc2 != 0

            oh = ((jax.lax.broadcasted_iota(jnp.int32, (2 * s, r), 1)
                   == rows_idx) & hit).astype(jnp.bfloat16)
            ent2 = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 128), 1)
            contrib = jnp.where(
                ent2 < 16, jnp.where(ent2 >= sym2, inc2, 0),
                jnp.where(ent2 == 16, jnp.where(hit, lim2, 0),
                          jnp.where(ent2 == 17, hit.astype(jnp.int32), 0)))
            # transpose the contraction via dimension numbers: contract
            # over the hit axis (axis 0 of both operands)
            c_hi = (contrib >> 7).astype(jnp.bfloat16)
            c_lo = (contrib & 127).astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))
            u_hi = jax.lax.dot_general(oh, c_hi, dn,
                                       preferred_element_type=jnp.float32)
            u_lo = jax.lax.dot_general(oh, c_lo, dn,
                                       preferred_element_type=jnp.float32)
            upd = (u_hi.astype(jnp.int32) << 7) + u_lo.astype(jnp.int32)

            add = jnp.where(ent_r < 16, upd, 0)
            limsum = _lane_reduce(upd, ent_r == 16)
            cnt = _lane_reduce(upd, ent_r == 17)
            lim_eff = jnp.where(cnt > 0,
                                _exact_div(limsum, jnp.maximum(cnt, 1)),
                                0x8000)
            committed = model_ref[ln * r:(ln + 1) * r, :] + add

            def cond(c):
                i, arr = c
                over = _lane_reduce(arr, ent_r == 15) >= lim_eff
                return (i < MAX_RENORM_PASSES) & jnp.any(over & (cnt > 0))

            def body(c):
                i, arr = c
                over = _lane_reduce(arr, ent_r == 15) >= lim_eff
                cb = arr + ent_r + 1          # pure int32 (apply_row_update)
                ren = cb - (cb >> 2)
                return i + 1, jnp.where(over & (ent_r < 16), ren, arr)

            _, committed = jax.lax.while_loop(cond, body, (0, committed))
            model_ref[ln * r:(ln + 1) * r, :] = jnp.where(
                ent_r < 16, committed, 0)

        # mixer commit from the OTHER parity slot (chunk k-1's sums)
        slot0 = adj_ref[0:4, :]
        slot1 = adj_ref[4:8, :]
        adj_prev = jnp.where(k % 2 == 1, slot0, slot1)  # [4, 128]

        w = wstate_ref[:]                                # [8, 128]
        w0_0, w1_0, nw_0 = w[0:1], w[1:2], w[2:3]
        w0_1, w1_1, nw_1 = w[3:4], w[4:5], w[5:6]

        def commit(w0, w1, a0, a1):
            w0 = jnp.clip(w0 + a0, 1, WEIGHT_MAX)
            w1 = jnp.clip(w1 + a1, 1, WEIGHT_MAX)
            over = ((w0 | w1) & 0x7F000000) != 0
            ilog = jnp.maximum(_bitlen(w0), _bitlen(w1))
            sh = jnp.maximum(ilog - 24, 0)
            w0 = jnp.where(over, w0 >> sh, w0)
            w1 = jnp.where(over, w1 >> sh, w1)
            # norm_weight (weights.rs:53-62, scalar.norm_weight)
            total = w0 + w1
            sh2 = jnp.maximum(_bitlen(total) - 8, 0)
            total8 = total >> sh2
            inv = 1 + _exact_div(jnp.full_like(total8, 1 << 24), total8)
            num = (w0 >> sh2) << 8
            hi = (inv >> 12) * num
            lo = (inv & 0xFFF) * num
            q = (hi + (lo >> 12)) >> 12
            q16 = _wrap_i16(q)
            nw = _wrap_i16(q16 << 7)
            return w0, w1, nw

        nw0_new = commit(w0_0, w1_0, adj_prev[0:1], adj_prev[1:2])
        nw1_new = commit(w0_1, w1_1, adj_prev[2:3], adj_prev[3:4])
        wstate_ref[:] = jnp.concatenate(
            [nw0_new[0], nw0_new[1], nw0_new[2],
             nw1_new[0], nw1_new[1], nw1_new[2], w[6:7], w[7:8]], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "chunk", "interpret"))
def model_pass_deferred_pallas(trace, num_rows, chunk, interpret=False):
    """trace int32[B<=8, N, 10] (N % chunk == 0) -> (starts, freqs) [B, N].

    Byte-identical to deferred.replay_trace per lane (tests)."""
    b, n, nf = trace.shape
    assert nf == NFIELD and n % chunk == 0 and b <= LANES
    r = -(-num_rows // 8) * 8
    s = chunk
    nblk = n // s

    # [B, N, 10] -> 10 arrays [N, LANES]
    fields = []
    for f in range(NFIELD):
        x = jnp.swapaxes(trace[:, :, f], 0, 1)
        if b < LANES:
            x = jnp.pad(x, ((0, 0), (0, LANES - b)))
        fields.append(x)

    cur_spec = pl.BlockSpec((s, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec((s, LANES),
                             lambda i: (jnp.maximum(i - 1, 0), 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((s, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    starts, freqs = pl.pallas_call(
        functools.partial(_kernel, r=r, s=s, c_total=nblk),
        grid=(nblk,),
        in_specs=[cur_spec] * NFIELD + [prev_spec] * NFIELD,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((n, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n, LANES), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((LANES * r, 128), jnp.int32),   # model
            pltpu.VMEM((8, 128), jnp.int32),           # weights
            pltpu.VMEM((8, 128), jnp.int32),           # adj parity buffer
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*fields, *fields)
    starts = jnp.swapaxes(starts, 0, 1)[:b]
    freqs = jnp.swapaxes(freqs, 0, 1)[:b]
    return starts, freqs
