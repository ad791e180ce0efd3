"""Packed-lane Pallas kernel: the deferred lit-stream model pass on TPU.

Drop-in twin of jax_engine.model_pass_deferred_lit (bit-exact outputs).
The XLA lit pass spends its time on tiny per-metablock matmuls
([s,64]x[64,16] per lane) and HBM round-trips for the onehots; here 8
metablock lanes share one 128-column tile (lane l owns columns
[16l, 16l+16)) and the four literal model classes live in VMEM as
block-diagonal int32 arrays:

    model_hi  [G*64, 128]   lit_hi    (ctx)            speed sp0
    model_cm1 [G*64, 128]   cm_first  (ctx)            speed sp3
    model_lo  [G*128, 128]  lit_lo    (c3*16 + hi)     speed sp0
    model_cm2 [G*128, 128]  cm_second (stored in the lo fetch order
                            c3*16 + hi, so it shares oh_lo)  speed sp2

Per chunk (S bytes per lane) the row fetches are four MXU matmuls whose
onehots are generated in VMEM — oh_hi [S, G*64] serves both hi-class
fetches, oh_lo [S, G*128] both lo-class fetches — and the count
histograms reuse the same onehots transposed.  The two-model mixer
(cdf16.average + weights.rs updates) runs on [S, 128] tiles with
16-column lane groups; mixer weights are per-lane scalars committed at
chunk boundaries with the same one-chunk lag as the CDF state
(jax_engine._apply_pend).

Reference basis: the literal two-model mixing hot loop of
/root/reference/src/codec/literal.rs:153-259 and the integer mixer of
src/codec/weights.rs:108-133; the chunk-deferred adaptation is this
repo's own TPU format (DESIGN.md, codec/deferred.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..probability.cdf16 import LOG2_SCALE
from .deferred import ADJ_CLAMP, MAX_RENORM_PASSES, WEIGHT_MAX
from .pallas_cmd_pass import (G, T_FOLD, _bcast15, _colmod, _exact_div,
                              _gsum16, _prefix16, _split_bf16)

N_HI = 64      # lit_hi / cm_first rows per lane
N_LO = 128     # lit_lo / cm_second rows per lane
NORM_WEIGHT_INIT = 1 << 14
DEBUG_W = False  # extra per-chunk weight-state output (research probes)


def _bitlen(x):
    """bit_length of non-negative int32 (vectorized, in-kernel)."""
    r = jnp.zeros_like(x)
    for shift in (16, 8, 4, 2, 1):
        r = jnp.where((x >> (r + shift)) > 0, r + shift, r)
    return r + (x > 0).astype(x.dtype)


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _mm(oh, model):
    """Exact onehot matmul [S, K] x [K, 128] -> int32 [S, 128] (7-bit
    bf16 split of the model, f32 accumulation)."""
    dn = (((1,), (0,)), ((), ()))
    m_hi, m_lo = _split_bf16(model)
    f_hi = jax.lax.dot_general(oh, m_hi, dn,
                               preferred_element_type=jnp.float32)
    f_lo = jax.lax.dot_general(oh, m_lo, dn,
                               preferred_element_type=jnp.float32)
    return (f_hi.astype(jnp.int32) << 7) + f_lo.astype(jnp.int32)


def _g_average(cdf_a, cdf_b, mix_rate):
    """cdf16.average on 16-column lane groups of an [S, 128] tile.

    mix_rate: [S, 128] group-constant (weight of cdf_a)."""
    amax = _bcast15(cdf_a)
    bmax = _bcast15(cdf_b)
    shift = jnp.maximum(_bitlen(amax * bmax) - 15, 0)
    inv = (1 << 15) - mix_rate
    ra = (cdf_a * bmax) >> shift
    rb = (cdf_b * amax) >> shift
    return _wrap16((ra * mix_rate + rb * inv + 1) >> 15)


def _g_start_freq(cdf, vh_sym, vh_prev, has_prev):
    """(start, freq) of the symbol whose onehot column masks are
    vh_sym/vh_prev, per 16-column group (cdf16.sym_to_start_freq)."""
    c_sym = _gsum16(jnp.where(vh_sym, cdf, 0))
    c_prev = _gsum16(jnp.where(vh_prev, cdf, 0))
    maxv = _bcast15(cdf)
    r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
    r_prev = jnp.where(has_prev, _exact_div(c_prev << LOG2_SCALE, maxv), 0)
    return r_prev + 1, r_sym - r_prev - 1


def _make_kernel(s_bytes, n_chunks):
    k_hi = G * N_HI
    k_lo = G * N_LO

    def kernel(trace_ref, spd_ref, out_ref,
               model_hi_ref, model_cm1_ref, model_lo_ref, model_cm2_ref,
               add_hi_ref, add_cm1_ref, add_lo_ref, add_cm2_ref,
               tot_hi_ref, tot_cm1_ref, tot_lo_ref, tot_cm2_ref,
               w_ref, wp_ref):
        c = pl.program_id(1)
        s = s_bytes

        def bd(kr, n):
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (kr, 128), 0) // n
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (kr, 128), 1) // 16
            return lane_r == lane_c

        bd_hi = bd(k_hi, N_HI)
        bd_lo = bd(k_lo, N_LO)

        @pl.when(c == 0)
        def _():
            cm_h = _colmod((k_hi, 128))
            cm_l = _colmod((k_lo, 128))
            for ref, mask, cm in ((model_hi_ref, bd_hi, cm_h),
                                  (model_cm1_ref, bd_hi, cm_h),
                                  (model_lo_ref, bd_lo, cm_l),
                                  (model_cm2_ref, bd_lo, cm_l)):
                ref[:] = jnp.where(mask, 4 * (cm + 1), 0)
            for ref in (add_hi_ref, add_cm1_ref, tot_hi_ref, tot_cm1_ref):
                ref[:] = jnp.zeros((k_hi, 128), jnp.int32)
            for ref in (add_lo_ref, add_cm2_ref, tot_lo_ref, tot_cm2_ref):
                ref[:] = jnp.zeros((k_lo, 128), jnp.int32)
            w_ref[:] = jnp.concatenate([
                jnp.ones((4, 128), jnp.int32),
                jnp.full((2, 128), NORM_WEIGHT_INIT, jnp.int32),
                jnp.zeros((2, 128), jnp.int32)], axis=0)
            wp_ref[:] = jnp.zeros((4, 128), jnp.int32)

        tp = trace_ref[0, 0]                                  # [S, G]
        ctx8 = tp & 63
        hi8 = (tp >> 6) & 15
        lo8 = (tp >> 10) & 15
        act8 = (tp >> 14) & 1
        mix8 = (tp >> 15) & 1
        idx8 = ((ctx8 >> 3) << 4) + hi8

        # ---- lane-block broadcasts (tiny bf16 matmuls)
        dn = (((1,), (0,)), ((), ()))

        def eblk(k):
            lrow = jax.lax.broadcasted_iota(jnp.int32, (G, G * k), 0)
            lcol = jax.lax.broadcasted_iota(jnp.int32, (G, G * k), 1) // k
            return (lrow == lcol).astype(jnp.bfloat16)

        e_hi = eblk(N_HI)
        e_lo = eblk(N_LO)
        lrow16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        lcol16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) // 16
        e16 = (lrow16 == lcol16).astype(jnp.bfloat16)

        def rep(x, e):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), e, dn,
                preferred_element_type=jnp.float32).astype(jnp.int32)

        ctx_e = rep(ctx8, e_hi)                               # [S, K_HI]
        act_eh = rep(act8, e_hi)
        idx_e = rep(idx8, e_lo)                               # [S, K_LO]
        act_el = rep(act8, e_lo)
        colh = jax.lax.broadcasted_iota(jnp.int32, (s, k_hi), 1) % N_HI
        coll = jax.lax.broadcasted_iota(jnp.int32, (s, k_lo), 1) % N_LO
        oh_hi = ((ctx_e == colh) & (act_eh != 0)).astype(jnp.bfloat16)
        oh_lo = ((idx_e == coll) & (act_el != 0)).astype(jnp.bfloat16)

        val_hi = rep(hi8, e16)                                # [S, 128]
        val_lo = rep(lo8, e16)
        act_rep = rep(act8, e16)
        mix_rep = rep(mix8, e16)

        # ---- fetch from the committed snapshot (state through c-2)
        cm_s = _colmod((s, 128))
        init_tile = 4 * (cm_s + 1)
        live = act_rep != 0
        rows_hi = jnp.where(live, _mm(oh_hi, model_hi_ref[:]), init_tile)
        cmr_hi = jnp.where(live, _mm(oh_hi, model_cm1_ref[:]), init_tile)
        rows_lo = jnp.where(live, _mm(oh_lo, model_lo_ref[:]), init_tile)
        cmr_lo = jnp.where(live, _mm(oh_lo, model_cm2_ref[:]), init_tile)

        # nw may wrap negative (i16 wire semantics); the mixer consumes
        # it masked to u16 exactly as the XLA pass does (nw & 0xFFFF)
        nw_lo = jnp.broadcast_to(w_ref[4:5, :] & 0xFFFF, (s, 128))
        nw_hi = jnp.broadcast_to(w_ref[5:6, :] & 0xFFFF, (s, 128))
        do_mix = mix_rep != 0

        def code(nib_t, cm_t, nw, val_rep):
            vh_sym = val_rep == cm_s
            vh_prev = val_rep - 1 == cm_s
            has_prev = val_rep > 0
            mixed = _g_average(cm_t, nib_t, nw)
            coded = jnp.where(do_mix, mixed, nib_t)
            start, freq = _g_start_freq(coded, vh_sym, vh_prev, has_prev)
            p_cm = _g_start_freq(cm_t, vh_sym, vh_prev, has_prev)[1]
            p_nib = _g_start_freq(nib_t, vh_sym, vh_prev, has_prev)[1]
            return start, freq, p_cm, p_nib

        st_h, fr_h, pcm_h, pnib_h = code(rows_hi, cmr_hi, nw_hi, val_hi)
        st_l, fr_l, pcm_l, pnib_l = code(rows_lo, cmr_lo, nw_lo, val_lo)

        # ---- mixer adjustments (deferred.weight_adjustments), summed per
        # lane per (which, model): hi nibble -> which 1, lo -> which 0
        def wadj_sums(freq, p_cm, p_nib):
            error = (1 << 15) - freq
            shift = jnp.maximum(_bitlen(freq * error) - 15, 0)
            out = []
            for n1i in (p_cm, p_nib):
                adj = jnp.clip((error * (n1i - freq)) >> shift,
                               -ADJ_CLAMP, ADJ_CLAMP)
                adj = jnp.where(do_mix, adj, 0)
                # adj is group-constant: keep one column per lane group,
                # sum over steps, broadcast back at the caller
                out.append(jnp.sum(jnp.where(cm_s == 0, adj, 0), axis=0,
                                   keepdims=True))
            return out                                        # 2 x [1, 128]

        a_h = wadj_sums(fr_h, pcm_h, pnib_h)
        a_l = wadj_sums(fr_l, pcm_l, pnib_l)
        new_wadj = jnp.concatenate(
            [_gsum16(x) for x in (a_l[0], a_l[1], a_h[0], a_h[1])],
            axis=0)                                           # [4, 128]

        # ---- outputs: nibble n = 2t + h -> out row t//8, col 2(t%8)+h
        ph = jnp.where(cm_s == 0, (st_h & 0xFFFF) | (fr_h << 16), 0)
        pl_ = jnp.where(cm_s == 0, (st_l & 0xFFFF) | (fr_l << 16), 0)
        n_rows = (2 * s) // T_FOLD
        for r in range(n_rows):
            acc = jnp.zeros((1, 128), jnp.int32)
            for k in range(T_FOLD // 2):
                t = (T_FOLD // 2) * r + k
                acc = acc + pltpu.roll(ph[t:t + 1, :], 2 * k, 1)
                acc = acc + pltpu.roll(pl_[t:t + 1, :], 2 * k + 1, 1)
            out_ref[0, 0, r:r + 1, :] = acc

        # ---- histograms (counts < 2^8: single bf16 matmuls are exact).
        # ge-mask matmuls give the per-row cumulative counts directly;
        # the act-matmuls give row totals broadcast across each group —
        # no [K, 128] prefix16/bcast15 vector scans
        dn_t = (((0,), (0,)), ((), ()))
        vh_h = ((val_hi <= cm_s) & live).astype(jnp.bfloat16)
        vh_l = ((val_lo <= cm_s) & live).astype(jnp.bfloat16)
        cum_hi = jax.lax.dot_general(
            oh_hi, vh_h, dn_t,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cum_lo = jax.lax.dot_general(
            oh_lo, vh_l, dn_t,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot_hi = jax.lax.dot_general(
            oh_hi, live.astype(jnp.bfloat16), dn_t,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot_lo = jax.lax.dot_general(
            oh_lo, live.astype(jnp.bfloat16), dn_t,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cum_hi = jnp.where(bd_hi, cum_hi, 0)
        cum_lo = jnp.where(bd_lo, cum_lo, 0)
        tot_hi = jnp.where(bd_hi, tot_hi, 0)
        tot_lo = jnp.where(bd_lo, tot_lo, 0)

        def spd_plane(row, kr):
            return jnp.broadcast_to(spd_ref[0, row:row + 1, :], (kr, 128))

        def pend(cum_tot, inc_row, kr):
            cum, tot = cum_tot
            inc = spd_plane(inc_row, kr)
            liv = (inc != 0).astype(jnp.int32)
            return inc * cum * liv, tot * liv

        new_add_hi, new_tot_hi = pend((cum_hi, tot_hi), 0, k_hi)
        new_add_lo, new_tot_lo = pend((cum_lo, tot_lo), 0, k_lo)
        new_add_cm1, new_tot_cm1 = pend((cum_hi, tot_hi), 4, k_hi)
        new_add_cm2, new_tot_cm2 = pend((cum_lo, tot_lo), 2, k_lo)

        # ---- apply the lagged pend (jax_engine._apply_pend).  The first
        # renorm pass runs unconditionally with its over-mask (an empty
        # mask is the identity): each while_loop cond is a full-array
        # reduce + pipeline stall, pass 1 is the common case, and there
        # are four commits per chunk — only the rare 2nd+ pass pays it.
        def commit(model_ref, add_ref, tot_ref, lim_row, kr, mask):
            committed = model_ref[:] + add_ref[:]
            lim_eff = jnp.where(tot_ref[:] > 0, spd_plane(lim_row, kr),
                                0x8000)
            cmk = _colmod((kr, 128))
            cm15 = cmk == 15
            bias = cmk + 1

            def one_pass(arr):
                over = _bcast15(arr) >= lim_eff
                cb = arr + bias
                return jnp.where(over & mask, cb - (cb >> 2), arr)

            committed = one_pass(committed)

            def cond(carry):
                i, arr = carry
                return (i < MAX_RENORM_PASSES - 1) & jnp.any(
                    (arr >= lim_eff) & cm15)

            def body(carry):
                i, arr = carry
                return i + 1, one_pass(arr)

            _, committed = jax.lax.while_loop(cond, body,
                                              (jnp.int32(0), committed))
            model_ref[:] = committed

        commit(model_hi_ref, add_hi_ref, tot_hi_ref, 1, k_hi, bd_hi)
        commit(model_cm1_ref, add_cm1_ref, tot_cm1_ref, 5, k_hi, bd_hi)
        commit(model_lo_ref, add_lo_ref, tot_lo_ref, 1, k_lo, bd_lo)
        commit(model_cm2_ref, add_cm2_ref, tot_cm2_ref, 3, k_lo, bd_lo)
        add_hi_ref[:] = new_add_hi
        add_cm1_ref[:] = new_add_cm1
        add_lo_ref[:] = new_add_lo
        add_cm2_ref[:] = new_add_cm2
        tot_hi_ref[:] = new_tot_hi
        tot_cm1_ref[:] = new_tot_cm1
        tot_lo_ref[:] = new_tot_lo
        tot_cm2_ref[:] = new_tot_cm2

        # ---- mixer weight commit (lagged wadj; _apply_pend weight rules)
        w0 = jnp.stack([w_ref[0, :], w_ref[2, :]], 0)          # [2, 128]
        w1 = jnp.stack([w_ref[1, :], w_ref[3, :]], 0)
        wadj0 = jnp.stack([wp_ref[0, :], wp_ref[2, :]], 0)
        wadj1 = jnp.stack([wp_ref[1, :], wp_ref[3, :]], 0)
        w0 = jnp.clip(w0 + wadj0, 1, WEIGHT_MAX)
        w1 = jnp.clip(w1 + wadj1, 1, WEIGHT_MAX)
        over = ((w0 | w1) & 0x7F000000) != 0
        ilog = jnp.maximum(_bitlen(w0), _bitlen(w1))
        sh = jnp.maximum(ilog - 24, 0)
        w0 = jnp.where(over, w0 >> sh, w0)
        w1 = jnp.where(over, w1 >> sh, w1)
        # norm_weight (8-bit reciprocal, weights.rs:53-62)
        total = w0 + w1
        shn = jnp.maximum(_bitlen(total) - 8, 0)
        total8 = total >> shn
        inv = 1 + _exact_div(jnp.full_like(total8, 1 << 24), total8)
        num = (w0 >> shn) << 8
        q = ((inv >> 12) * num + (((inv & 0xFFF) * num) >> 12)) >> 12
        nw = _wrap16(_wrap16(q) << 7)
        w_ref[0:1, :] = w0[0:1]
        w_ref[1:2, :] = w1[0:1]
        w_ref[2:3, :] = w0[1:2]
        w_ref[3:4, :] = w1[1:2]
        w_ref[4:5, :] = nw[0:1]
        w_ref[5:6, :] = nw[1:2]
        wp_ref[:] = new_wadj

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _lit_pass_call(packed, spd_pl, chunk, interpret):
    if packed.dtype != jnp.int32:
        # packed planes ship H2D as uint16 (all 16 bits used; the axon
        # tunnel is ~25 MB/s, so halving the transfer halves the e2e
        # encode's biggest cost) and upcast on device
        packed = packed.astype(jnp.int32)
    ng, c, s, _g = packed.shape
    assert s == chunk // 2, (s, chunk)
    k_hi, k_lo = G * N_HI, G * N_LO
    out = pl.pallas_call(
        _make_kernel(s, c),
        grid=(ng, c),
        in_specs=[
            pl.BlockSpec((1, 1, s, G), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk // T_FOLD, 128),
                               lambda g, i: (g, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, c, chunk // T_FOLD, 128),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((k_hi, 128), jnp.int32),   # model_hi
            pltpu.VMEM((k_hi, 128), jnp.int32),   # model_cm1
            pltpu.VMEM((k_lo, 128), jnp.int32),   # model_lo
            pltpu.VMEM((k_lo, 128), jnp.int32),   # model_cm2
            pltpu.VMEM((k_hi, 128), jnp.int32),   # add_hi
            pltpu.VMEM((k_hi, 128), jnp.int32),   # add_cm1
            pltpu.VMEM((k_lo, 128), jnp.int32),   # add_lo
            pltpu.VMEM((k_lo, 128), jnp.int32),   # add_cm2
            pltpu.VMEM((k_hi, 128), jnp.int32),   # tot_hi
            pltpu.VMEM((k_hi, 128), jnp.int32),   # tot_cm1
            pltpu.VMEM((k_lo, 128), jnp.int32),   # tot_lo
            pltpu.VMEM((k_lo, 128), jnp.int32),   # tot_cm2
            pltpu.VMEM((8, 128), jnp.int32),      # mixer weights
            pltpu.VMEM((4, 128), jnp.int32),      # lagged wadj
        ],
        interpret=interpret,
    )(packed, spd_pl)
    # unfold: out[g, c, r, 16l + j] = nibble (c*chunk + 16r + j) of lane
    # (G*g + l) -> [NG*G, C*chunk] (starts | freqs<<16)
    o = out.reshape(ng, c, chunk // T_FOLD, G, 16)
    o = jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(ng * G, c * chunk)
    return o & 0xFFFF, o >> 16


def pack_lit_row(t, chunk: int):
    """One [Ti, 10] lit trace -> (row int32[Ti//2], spd int32[6]), or
    None when the trace leaves the packed-byte envelope (caller falls
    back to the XLA pass).  Per byte: ctx | hi<<6 | lo<<10 | act<<14
    | mix<<15 — 16 bits, so rows ship H2D as uint16."""
    n = t.shape[0]
    if n % 2:
        return None
    spd = np.zeros(6, np.int32)
    if n == 0:
        return np.zeros(0, np.int32), spd
    flat = t[:, 0]
    hi_f, lo_f = flat[0::2], flat[1::2]
    hi_v, lo_v = t[0::2, 1], t[1::2, 1]
    act = ((t[:, 3] != 0) | (t[:, 5] != 0)).astype(np.int32)
    act_h, act_l = act[0::2], act[1::2]
    mix_h, mix_l = t[0::2, 5], t[1::2, 5]
    if (act_h != act_l).any() or (mix_h != mix_l).any():
        return None
    ctx = np.where(act_h != 0, hi_f - 1, 0)
    if ((ctx < 0) | (ctx >= 64)).any():
        return None
    idx_expect = 65 + (ctx >> 3) * 16 + hi_v
    if (np.where(act_l != 0, lo_f, idx_expect) != idx_expect).any():
        return None
    # mix steps must target the canonical cm rows (cm_first[ctx] for
    # hi, cm_second[hi, ctx>>3] for lo) — guaranteed by the cm
    # profile's trace builder; verify cheaply via the cm_idx column
    cm_h = t[0::2, 7]
    cm_l = t[1::2, 7]
    exp_h = 193 + ctx
    exp_l = 257 + hi_v * 8 + (ctx >> 3)
    if (np.where(mix_h != 0, cm_h, exp_h) != exp_h).any():
        return None
    if (np.where(mix_l != 0, cm_l, exp_l) != exp_l).any():
        return None
    if t[0, 3] == 0:
        # the per-lane speed extraction (like the XLA pass's
        # lit_speeds_from_traces) reads the first byte's rows; a dead
        # first step would mis-read them
        return None
    spd[:] = [t[0, 3], t[0, 4], t[1, 8], t[1, 9], t[0, 8], t[0, 9]]
    row = (ctx | (hi_v << 6) | (lo_v << 10)
           | (act_h << 14) | (mix_h << 15))
    return row, spd


def assemble_lit_planes(rows, spds, n_padded: int, chunk: int):
    """Per-lane packed rows (pack_lit_row outputs) -> kernel inputs
    (packed uint16 [NG, C, S, G], spd planes int32 [NG, 8, 128])."""
    b = len(rows)
    ng = -(-b // G)
    s = chunk // 2
    c = n_padded // chunk
    packed = np.zeros((ng * G, n_padded // 2), np.uint16)
    spd = np.zeros((ng * G, 6), np.int32)
    for i, (row, sp) in enumerate(zip(rows, spds)):
        packed[i, :row.shape[0]] = row.astype(np.uint16)
        spd[i] = sp
    packed = packed.reshape(ng, G, c, s)
    packed = np.ascontiguousarray(packed.transpose(0, 2, 3, 1))
    # spd planes: [NG, 8, 128] — row r of tile g holds speed scalar r of
    # each lane, broadcast over the lane's 16 columns
    spd_pl = np.zeros((ng, 8, 128), np.int32)
    lane_vals = spd.reshape(ng, G, 6)
    for r in range(6):
        spd_pl[:, r, :] = np.repeat(lane_vals[:, :, r], 16, axis=1)
    return packed, spd_pl


def pack_lit_traces(lit_ts, n_padded: int, chunk: int):
    """[Ti, 10] lit trace list -> (packed uint16 [NG, C, S, G], spd
    planes [NG, 8, 128]) for the kernel, or None when a trace leaves
    the packed-byte envelope (caller falls back to the XLA pass)."""
    rows, spds = [], []
    for t in lit_ts:
        r = pack_lit_row(t, chunk)
        if r is None:
            return None
        rows.append(r[0])
        spds.append(r[1])
    return assemble_lit_planes(rows, spds, n_padded, chunk)


def model_pass_lit_pallas(lit_ts, chunk: int, n_padded: int,
                          interpret: bool | None = None):
    """(starts, freqs) int32 [B, n_padded] — bit-exact twin of
    jax_engine.model_pass_deferred_lit over the same padded length, or
    None when the traces leave the packed envelope."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = len(lit_ts)
    res = pack_lit_traces(lit_ts, n_padded, chunk)
    if res is None:
        return None
    packed, spd_pl = res
    st, fr = _lit_pass_call(jnp.asarray(packed.astype(np.uint16)),
                            jnp.asarray(spd_pl), chunk, interpret)
    return st[:b], fr[:b]
