"""Batched JAX codec engine — the TPU compute path.

Encode (two-pass, DESIGN.md §2):
  1. host: matcher -> commands -> per-nibble trace (codec/trace.py,
     native C++ fast path);
  2. device: the model pass — `model_pass` (per-nibble adaptive scan) or
     `model_pass_deferred` (chunk-deferred profile: whole chunks as MXU
     onehot matmuls, the fast path) — emits (start, freq) per nibble;
  3. device: wide rANS reverse encode — the Pallas kernel on TPU
     (ans/pallas_kernels.py), the XLA scan elsewhere — over 2B lanes
     (cmd + lit stream per metablock);
  4. host: container assembly.

Bitstreams are identical to the golden serial engine's by construction
(asserted by tests/test_jax_engine.py): the trace replays the same FSM
and the scan applies the same integer CDF/mixer rules.

Shapes are bucketed (next power of two) so jit caches stay warm across
inputs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..options import DivansOptions
from ..container import format as fmt
from ..container.crc32c import crc32c
from ..probability import cdf16, weights as weights_mod
from ..ans import kernels
from . import trace as trace_mod
from .layout import (ModelLayout, PROFILES, PROFILE_FLAGS, FLAG_PROFILES,
                     profile_for_options)

MIX_RATE_MASK = 0xFFFF


def _on_tpu() -> bool:
    """Gate for the device fast paths in this module.

    Tests monkeypatch THIS function to force every `backend == "tpu"`
    branch on CPU (kernels then run in interpret mode via
    `_kernel_interpret`, which always reads the real backend) — the
    round-3 snapshot shipped a NameError in a TPU-only branch precisely
    because no test could reach it (VERDICT r3 weak #1/#7)."""
    return jax.default_backend() == "tpu"


def _kernel_interpret() -> bool:
    """interpret= for Pallas kernels: True off-chip.  Never monkeypatched
    (interpret mode is a property of the real backend, not of path
    selection)."""
    return jax.default_backend() != "tpu"


def _model_init(b: int, r: int):
    m = np.broadcast_to(np.asarray(cdf16.CDF_INIT, np.int16), (b, r, 16))
    return jnp.asarray(m)


def _weights_init(b: int):
    w = np.zeros((b, 2, 3), np.int32)
    w[:, :, 0] = 1
    w[:, :, 1] = 1
    w[:, :, 2] = weights_mod.NORM_WEIGHT_INIT
    return jnp.asarray(w)


UNROLL = 8  # trace steps per scan iteration (amortizes the ~10us/iter
            # XLA loop overhead measured in PERF_NOTES.md)


@functools.partial(jax.jit, static_argnames=("num_rows",))
def model_pass(trace, num_rows):
    """trace: int32[B, N, 10] (padded steps: all-zero row with lim!=0).

    Returns (starts int32[B, N], freqs int32[B, N])."""
    b, n = trace.shape[:2]
    model = _model_init(b, num_rows)
    weights = _weights_init(b)
    bidx = jnp.arange(b)

    def substep(carry, xs):
        model, weights = carry
        flat, value, _stream, inc, lim, mix, which, cm_idx, cm_inc, cm_lim = \
            [xs[:, i] for i in range(10)]
        rows = model[bidx, flat].astype(jnp.int32)
        cm_rows = model[bidx, cm_idx].astype(jnp.int32)
        wsel = weights[bidx, which]
        mixed = cdf16.average(cm_rows, rows, wsel[:, 2] & MIX_RATE_MASK, xp=jnp)
        do_mix = (mix != 0)
        coded = jnp.where(do_mix[:, None], mixed, rows)
        start, freq = cdf16.sym_to_start_freq(coded, value, xp=jnp)
        # mixer update (gated): probs of the coded symbol under each model
        _, p_cm = cdf16.sym_to_start_freq(cm_rows, value, xp=jnp)
        _, p_nib = cdf16.sym_to_start_freq(rows, value, xp=jnp)
        w0n, w1n, nw = weights_mod.update(wsel[:, 0], wsel[:, 1],
                                          p_cm, p_nib, freq, xp=jnp)
        new_w = jnp.stack([w0n, w1n, nw], axis=-1)
        weights = weights.at[bidx, which].set(
            jnp.where(do_mix[:, None], new_w, wsel))
        # adapt both rows (inc 0 + high lim = no-op, incl. frozen row 0)
        rows2 = cdf16.blend(rows, value, inc, lim, xp=jnp).astype(jnp.int16)
        model = model.at[bidx, flat].set(rows2)
        cm2 = cdf16.blend(cm_rows, value, cm_inc, cm_lim, xp=jnp).astype(jnp.int16)
        model = model.at[bidx, cm_idx].set(cm2)
        return (model, weights), (start, freq)

    def step(carry, xs):
        outs = []
        for u in range(xs.shape[0]):
            carry, out = substep(carry, xs[u])
            outs.append(out)
        return carry, (jnp.stack([o[0] for o in outs]),
                       jnp.stack([o[1] for o in outs]))

    assert n % UNROLL == 0, (n, UNROLL)  # _pad_traces pads to pow2 >= 16
    xs = jnp.swapaxes(trace, 0, 1).reshape(n // UNROLL, UNROLL, b, 10)
    (_, _), (starts, freqs) = jax.lax.scan(step, (model, weights), xs)
    starts = starts.reshape(n, b)
    freqs = freqs.reshape(n, b)
    return jnp.swapaxes(starts, 0, 1), jnp.swapaxes(freqs, 0, 1)


def _onehot_mm_b(oh_bf16, table_i32):
    """Batched exact onehot matmul: [B, T, R] x [B, R, K] -> int32 [B, T, K].

    table values are < 2^15 and split into 7-bit halves so both bf16
    operands are exact integers < 2^8; f32 accumulation keeps every sum
    (< 2^24) exact.  Single-pass bf16 MXU work instead of f32 passes, and
    far cheaper than XLA's ~140ns-per-row dynamic gather (PERF_NOTES)."""
    hi = (table_i32 >> 7).astype(jnp.bfloat16)
    lo = (table_i32 & 127).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    out_hi = jax.lax.dot_general(oh_bf16, hi, dn,
                                 preferred_element_type=jnp.float32)
    out_lo = jax.lax.dot_general(oh_bf16, lo, dn,
                                 preferred_element_type=jnp.float32)
    return (out_hi.astype(jnp.int32) << 7) + out_lo.astype(jnp.int32)


def _chunk_pend(oh_full, sym2, inc2, lim2, wadj):
    """One chunk's deferred-update histogram (deferred.py boundary rules).

    oh_full: bf16 onehot [B, 2S, R] over the chunk's (nib ++ cm) rows;
    sym2/inc2/lim2: int32 [B, 2S] per hit (inc 0 = no hit); wadj: the
    chunk's summed mixer adjustments [B, 2, 2].  All matmul operands are
    exact bf16 integers < 2^8 (7-bit hi/lo splits); f32 accumulation
    keeps every sum < 2^24 exact.  Shared by the encode model pass and
    the Pallas decode scan so both sides commit identical state."""
    idx16 = jnp.arange(16)[None, None, :]
    hit = inc2 != 0
    ge = (idx16 >= sym2[:, :, None]) & hit[:, :, None]           # [B, 2S, 16]
    contrib = jnp.concatenate([
        ((inc2[:, :, None] >> 7) * ge).astype(jnp.bfloat16),
        ((inc2[:, :, None] & 127) * ge).astype(jnp.bfloat16),
        ((lim2 >> 7) * hit).astype(jnp.bfloat16)[:, :, None],
        ((lim2 & 127) * hit).astype(jnp.bfloat16)[:, :, None],
        hit.astype(jnp.bfloat16)[:, :, None],
    ], axis=2)                                                   # [B, 2S, 35]
    upd = jax.lax.dot_general(
        oh_full, contrib,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.int32)    # [B, R, 35]
    return {
        "add": (upd[:, :, 0:16] << 7) + upd[:, :, 16:32],
        "limsum": (upd[:, :, 32] << 7) + upd[:, :, 33],
        "cnt": upd[:, :, 34],
        "wadj": wadj,
    }


def _apply_pend(committed, weights, pend):
    """Apply one lagged chunk's pend to (committed, weights) — the
    boundary CDF renorm + mixer rules of codec/deferred.py, batched."""
    from ..probability import weights as weights_mod
    from .deferred import MAX_RENORM_PASSES, WEIGHT_MAX

    committed = committed + pend["add"]
    has = pend["cnt"] > 0
    lim_eff = jnp.where(has, pend["limsum"] // jnp.maximum(pend["cnt"], 1),
                        0x8000)
    bias = jnp.arange(1, 17)[None, None, :]

    def _ren_cond(c):
        i, arr = c
        return (i < MAX_RENORM_PASSES) & jnp.any(arr[:, :, 15] >= lim_eff)

    def _ren_body(c):
        i, arr = c
        over = arr[:, :, 15] >= lim_eff
        cb = arr + bias
        return i + 1, jnp.where(over[:, :, None], cb - (cb >> 2), arr)

    _, committed = jax.lax.while_loop(_ren_cond, _ren_body,
                                      (jnp.int32(0), committed))
    w01 = weights[:, :, :2] + pend["wadj"]
    w01 = jnp.clip(w01, 1, WEIGHT_MAX)
    w0f, w1f = weights_mod._fix_weights(w01[:, :, 0], w01[:, :, 1], jnp)
    nw2 = weights_mod.norm_weight(w0f, w1f, jnp)
    weights = jnp.stack([w0f, w1f, nw2], axis=-1)
    return committed, weights


@functools.partial(jax.jit, static_argnames=("num_rows", "chunk"))
def model_pass_deferred(trace, num_rows, chunk):
    """Chunk-deferred model pass (codec/deferred.py rules), device-batched.

    trace: int32[B, N, 10] with N a multiple of `chunk` (padded steps have
    inc == 0 / mix == 0 and record nothing).  Whole chunks vectorize:
    coding reads frozen snapshots, so each scan iteration is gathers +
    vector math + one f32 histogram matmul (exact: every accumulated
    product is < 2^24 by 7-bit hi/lo splitting).  Returns (starts, freqs)
    int32[B, N], byte-identical to deferred.replay_trace per lane.
    """
    from ..probability import weights as weights_mod
    from .deferred import ADJ_CLAMP, MAX_RENORM_PASSES, WEIGHT_MAX

    b, n = trace.shape[:2]
    assert n % chunk == 0, (n, chunk)
    r = num_rows
    bidx = jnp.arange(b)[:, None]
    idx16 = jnp.arange(16)[None, None, :]

    committed0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32)), (b, r, 16))
    weights0 = _weights_init(b)
    pend0 = {
        "add": jnp.zeros((b, r, 16), jnp.int32),
        "limsum": jnp.zeros((b, r), jnp.int32),
        "cnt": jnp.zeros((b, r), jnp.int32),
        "wadj": jnp.zeros((b, 2, 2), jnp.int32),
    }

    def step(carry, xs):
        committed, weights, pend = carry
        # xs: [B, S, 10]
        flat, value, _stream, inc, lim, mix, which, cm_idx, cm_inc, cm_lim = \
            [xs[:, :, i] for i in range(10)]
        s = flat.shape[1]

        # ---- code the chunk against the frozen snapshot (MXU row fetch).
        # ONE onehot over [flat; cm_idx] serves both the row fetch and the
        # boundary histogram below (whose masking lives in `contrib`).
        row_iota = jnp.arange(r, dtype=jnp.int32)[None, None, :]
        flat2 = jnp.concatenate([flat, cm_idx], axis=1)          # [B, 2S]
        oh_full = (row_iota == flat2[:, :, None]).astype(jnp.bfloat16)
        fetched = _onehot_mm_b(oh_full, committed)               # [B, 2S, 16]
        rows = fetched[:, :s]
        cm_rows = fetched[:, s:]
        nw = jnp.take_along_axis(weights[:, :, 2], which, axis=1)
        mixed = cdf16.average(cm_rows, rows, nw & MIX_RATE_MASK, xp=jnp)
        do_mix = mix != 0
        coded = jnp.where(do_mix[:, :, None], mixed, rows)
        start, freq = cdf16.sym_to_start_freq(coded, value, xp=jnp)

        # ---- mixer adjustments (w-independent; deferred.weight_adjustments)
        _, p_cm = cdf16.sym_to_start_freq(cm_rows, value, xp=jnp)
        _, p_nib = cdf16.sym_to_start_freq(rows, value, xp=jnp)
        p1 = freq
        error = (1 << 15) - p1
        log_geo = cdf16._bit_length_pos(p1 * error, jnp)
        shift = jnp.maximum(log_geo - 15, 0)
        adj = [jnp.clip((error * (n1i - p1)) >> shift, -ADJ_CLAMP, ADJ_CLAMP)
               for n1i in (p_cm, p_nib)]
        sel = [do_mix & (which == 0), do_mix & (which == 1)]
        wadj = jnp.stack(
            [jnp.stack([jnp.sum(jnp.where(sel[w_], adj[i], 0), axis=1)
                        for i in (0, 1)], -1) for w_ in (0, 1)], 1)

        # ---- chunk histogram: nib + cm hits (shared with the decode scan)
        cm_hit = do_mix & (cm_inc != 0)
        inc2 = jnp.concatenate([inc, jnp.where(cm_hit, cm_inc, 0)], axis=1)
        lim2 = jnp.concatenate([lim, jnp.where(cm_hit, cm_lim, 0)], axis=1)
        sym2 = jnp.concatenate([value, value], axis=1)
        new_pend = _chunk_pend(oh_full, sym2, inc2, lim2, wadj)

        # ---- apply the previous chunk's updates (one-chunk commit lag)
        committed, weights = _apply_pend(committed, weights, pend)
        return (committed, weights, new_pend), (start, freq)

    xs = jnp.swapaxes(trace, 0, 1).reshape(n // chunk, chunk, b, 10)
    xs = jnp.swapaxes(xs, 1, 2)                                  # [C, B, S, 10]
    _, (starts, freqs) = jax.lax.scan(step, (committed0, weights0, pend0), xs)
    starts = jnp.swapaxes(starts, 0, 1).reshape(b, n)
    freqs = jnp.swapaxes(freqs, 0, 1).reshape(b, n)
    return starts, freqs


def cmd_speeds_from_rows(cmd_ts: list[np.ndarray], num_rows: int):
    """Per-row (inc, lim) for the cmd stream, verified constant.

    On the cmd stream every coding site uses a fixed speed per model row
    (the FSM's MUD/SLOW/MED/FAST/ROCKET constants — trace_builder.cpp /
    codec/trace.py), so the deferred boundary histogram only needs per-row
    *counts*.  Returns (inc_row, lim_row) int32[num_rows], or None when
    any row is observed with two different speeds (caller uses the
    generic pass) or any step mixes."""
    inc_row = np.zeros(num_rows, np.int64)
    lim_row = np.zeros(num_rows, np.int64)
    for t in cmd_ts:
        if t.shape[0] == 0:
            continue
        if (t[:, 5] != 0).any():
            return None  # mixing on the cmd stream: not this pass
        live = t[t[:, 3] != 0]
        rows, inc, lim = live[:, 0], live[:, 3], live[:, 4]
        seen = inc_row[rows] != 0
        if ((inc_row[rows] != inc) & seen).any() \
                or ((lim_row[rows] != lim) & seen).any():
            return None
        inc_row[rows] = inc
        lim_row[rows] = lim
    return inc_row.astype(np.int32), lim_row.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("num_rows", "chunk"))
def model_pass_deferred_cmd(trace, inc_row, lim_row, num_rows, chunk):
    """Deferred cmd-stream pass specialized to row-constant speeds.

    Byte-identical to model_pass_deferred on cmd sub-traces, but exploits
    the cmd stream's structure — no mixing (mix == 0 on every step) and
    (inc, lim) a pure function of the row — so the [B, 2S, R] onehot and
    35-wide contrib matmul of the generic pass collapse to ONE [B, S, R]
    onehot (shared by the fetch and a 16-wide count matmul): ~4x less MXU
    work and ~2x less HBM for the encode's wall stage (PERF_NOTES r2:
    cmd nibbles ~8x lit nibbles on text)."""
    b, n = trace.shape[:2]
    assert n % chunk == 0, (n, chunk)
    r = num_rows
    s = chunk
    cdf_init = jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32))

    committed0 = jnp.broadcast_to(cdf_init, (b, r, 16))
    weights0 = _weights_init(b)
    pend0 = {
        "add": jnp.zeros((b, r, 16), jnp.int32),
        "limsum": jnp.zeros((b, r), jnp.int32),
        "cnt": jnp.zeros((b, r), jnp.int32),
        "wadj": jnp.zeros((b, 2, 2), jnp.int32),
    }
    dn = (((1,), (1,)), ((0,), (0,)))
    row_iota = jnp.arange(r, dtype=jnp.int32)[None, None, :]
    i16v = jnp.arange(16, dtype=jnp.int32)[None, None, :]
    zwadj = jnp.zeros((b, 2, 2), jnp.int32)

    def step(carry, xs):
        committed, weights, pend = carry
        flat = xs[:, :, 0]
        value = xs[:, :, 1]
        inc = xs[:, :, 3]
        act = inc != 0
        oh = ((row_iota == flat[:, :, None])
              & act[:, :, None]).astype(jnp.bfloat16)             # [B, S, R]
        rows = _onehot_mm_b(oh, committed)                        # [B, S, 16]
        rows = jnp.where(act[:, :, None], rows, cdf_init)
        start, freq = cdf16.sym_to_start_freq(rows, value, xp=jnp)

        # per-row count histogram -> pend (the generic histogram's values
        # for single-speed rows: add = inc*cumsum, lim_eff = lim)
        vh = (i16v == value[:, :, None]).astype(jnp.bfloat16)
        cnt = jax.lax.dot_general(
            oh, vh, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [B, R, 16]
        tot = jnp.sum(cnt, axis=2)
        new_pend = {
            "add": inc_row[None, :, None] * jnp.cumsum(cnt, axis=2),
            "limsum": lim_row[None, :] * tot,
            "cnt": tot,
            "wadj": zwadj,
        }
        committed, weights = _apply_pend(committed, weights, pend)
        return (committed, weights, new_pend), (start, freq)

    xs = jnp.swapaxes(trace, 0, 1).reshape(n // chunk, chunk, b, 10)
    xs = jnp.swapaxes(xs, 1, 2)
    _, (starts, freqs) = jax.lax.scan(step, (committed0, weights0, pend0), xs)
    starts = jnp.swapaxes(starts, 0, 1).reshape(b, n)
    freqs = jnp.swapaxes(freqs, 0, 1).reshape(b, n)
    return starts, freqs


@functools.partial(jax.jit, static_argnames=("num_rows", "chunk"))
def model_pass_deferred_lit(trace, spd, num_rows, chunk):
    """Deferred-v2 lit-stream pass specialized to the bucketed cm profile.

    Byte-identical to model_pass_deferred on lit sub-traces, but both the
    row fetch and the boundary histogram exploit the lit stream's
    structure — strict hi/lo nibble alternation, four blend sites per
    byte with constant per-lane speeds (`spd` [B, 6] = sp0/sp2/sp3
    inc, lim), and nib/cm sites sharing one class-local row index — so
    the [B, 2S, R] onehot collapses into four narrow per-class matmuls
    (~4x less MXU work, ~8x less HBM).  Mirrors the decode scan's commit
    (pallas_decode._decode_lit_scan); rebased row ranges: lit_hi 1..65,
    lit_lo 65..193, cm_first 193..257, cm_second 257..385."""
    from .deferred import ADJ_CLAMP

    b, n = trace.shape[:2]
    assert n % chunk == 0, (n, chunk)
    r = num_rows
    assert r == 385, r
    s = chunk
    # cm_second rows are laid out (hi, c3) but the lo class index is
    # c3*16 + hi: perm_cm2 scatters counts (pend row j <- count row
    # perm_cm2[j]); inv_cm2 gathers the fetch table (class row i ->
    # committed row inv_cm2[i])
    perm_cm2 = np.array([(i % 8) * 16 + i // 8 for i in range(128)], np.int32)
    inv_cm2 = np.array([(i % 16) * 8 + i // 16 for i in range(128)], np.int32)
    cdf_init = jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32))

    committed0 = jnp.broadcast_to(cdf_init, (b, r, 16))
    weights0 = _weights_init(b)
    pend0 = {
        "add": jnp.zeros((b, r, 16), jnp.int32),
        "limsum": jnp.zeros((b, r), jnp.int32),
        "cnt": jnp.zeros((b, r), jnp.int32),
        "wadj": jnp.zeros((b, 2, 2), jnp.int32),
    }
    dn = (((1,), (1,)), ((0,), (0,)))
    i64 = jnp.arange(64, dtype=jnp.int32)[None, None, :]
    i128 = jnp.arange(128, dtype=jnp.int32)[None, None, :]
    i16v = jnp.arange(16, dtype=jnp.int32)[None, None, :]

    def fetch(oh, table):
        return _onehot_mm_b(oh, table)

    def step(carry, xs):
        committed, weights, pend = carry
        flat, value, _stream, inc, lim, mix, which, cm_idx, cm_inc, cm_lim = \
            [xs[:, :, i] for i in range(10)]
        # per-byte class indices (pad rows have flat == 0 -> ctx -1)
        ctx = flat[:, 0::2] - 1                       # [B, sb] in [-1, 64)
        hi = value[:, 0::2]
        lo = value[:, 1::2]
        idx_lo = flat[:, 1::2] - 65                   # [B, sb] in [-1, 128)
        act = (inc[:, 0::2] != 0) | (mix[:, 0::2] != 0)
        oh_hi = ((i64 == ctx[:, :, None])
                 & act[:, :, None]).astype(jnp.bfloat16)
        oh_lo = ((i128 == idx_lo[:, :, None])
                 & act[:, :, None]).astype(jnp.bfloat16)

        # ---- per-class fetch from the frozen snapshot
        rows_hi = fetch(oh_hi, committed[:, 1:65])
        cm_hi = fetch(oh_hi, committed[:, 193:257])
        rows_lo = fetch(oh_lo, committed[:, 65:193])
        cm_lo = fetch(oh_lo, committed[:, 257:385][:, inv_cm2])
        no_hi = ~act[:, :, None]
        rows_hi = jnp.where(no_hi, cdf_init, rows_hi)
        cm_hi = jnp.where(no_hi, cdf_init, cm_hi)
        rows_lo = jnp.where(no_hi, cdf_init, rows_lo)
        cm_lo = jnp.where(no_hi, cdf_init, cm_lo)
        rows = jnp.stack([rows_hi, rows_lo], 2).reshape(b, s, 16)
        cm_rows = jnp.stack([cm_hi, cm_lo], 2).reshape(b, s, 16)

        nw = jnp.take_along_axis(weights[:, :, 2], which, axis=1)
        mixed = cdf16.average(cm_rows, rows, nw & MIX_RATE_MASK, xp=jnp)
        do_mix = mix != 0
        coded = jnp.where(do_mix[:, :, None], mixed, rows)
        start, freq = cdf16.sym_to_start_freq(coded, value, xp=jnp)

        # ---- mixer adjustments (identical to model_pass_deferred)
        _, p_cm = cdf16.sym_to_start_freq(cm_rows, value, xp=jnp)
        _, p_nib = cdf16.sym_to_start_freq(rows, value, xp=jnp)
        p1 = freq
        error = (1 << 15) - p1
        log_geo = cdf16._bit_length_pos(p1 * error, jnp)
        shift = jnp.maximum(log_geo - 15, 0)
        adj = [jnp.clip((error * (n1i - p1)) >> shift, -ADJ_CLAMP, ADJ_CLAMP)
               for n1i in (p_cm, p_nib)]
        sel = [do_mix & (which == 0), do_mix & (which == 1)]
        wadj = jnp.stack(
            [jnp.stack([jnp.sum(jnp.where(sel[w_], adj[i], 0), axis=1)
                        for i in (0, 1)], -1) for w_ in (0, 1)], 1)

        # ---- per-class count histograms -> pend (decode-scan commit)
        vh = (i16v == hi[:, :, None]).astype(jnp.bfloat16)
        vl = (i16v == lo[:, :, None]).astype(jnp.bfloat16)
        cnt_hi = jax.lax.dot_general(
            oh_hi, vh, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt_lo = jax.lax.dot_general(
            oh_lo, vl, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt_cm2 = cnt_lo[:, perm_cm2, :]

        def seg_(counts, inc_col, lim_col):
            inc_ = spd[:, inc_col, None]
            lim_ = spd[:, lim_col, None]
            live = (inc_ != 0).astype(jnp.int32)
            tot = jnp.sum(counts, axis=2) * live
            return (inc_[:, :, None] * jnp.cumsum(counts, axis=2)
                    * live[:, :, None], lim_ * tot, tot)

        segs = [seg_(cnt_hi, 0, 1), seg_(cnt_lo, 0, 1),
                seg_(cnt_hi, 4, 5), seg_(cnt_cm2, 2, 3)]
        zrow = jnp.zeros((b, 1, 16), jnp.int32)
        new_pend = {
            "add": jnp.concatenate([zrow] + [x[0] for x in segs], axis=1),
            "limsum": jnp.concatenate(
                [zrow[:, :, 0]] + [x[1] for x in segs], axis=1),
            "cnt": jnp.concatenate(
                [zrow[:, :, 0]] + [x[2] for x in segs], axis=1),
            "wadj": wadj,
        }
        committed, weights = _apply_pend(committed, weights, pend)
        return (committed, weights, new_pend), (start, freq)

    xs = jnp.swapaxes(trace, 0, 1).reshape(n // chunk, chunk, b, 10)
    xs = jnp.swapaxes(xs, 1, 2)
    _, (starts, freqs) = jax.lax.scan(step, (committed0, weights0, pend0), xs)
    starts = jnp.swapaxes(starts, 0, 1).reshape(b, n)
    freqs = jnp.swapaxes(freqs, 0, 1).reshape(b, n)
    return starts, freqs


def lit_speeds_from_traces(lit_ts: list[np.ndarray]) -> np.ndarray:
    """Per-lane [B, 6] (sp0/sp2/sp3 inc, lim) read off each lit trace's
    first literal byte (speeds are PredictionMode constants per lane)."""
    spd = np.zeros((len(lit_ts), 6), np.int32)
    for i, t in enumerate(lit_ts):
        if t.shape[0] >= 2:
            spd[i] = [t[0, 3], t[0, 4], t[1, 8], t[1, 9], t[0, 8], t[0, 9]]
    return spd


def _lit_pass_usable(layout, lit_ts) -> bool:
    """model_pass_deferred_lit preconditions: bucketed cm profile and
    strictly alternating full-byte lit traces with constant speeds."""
    if layout.profile.name != "cm" or not layout.lo_bucketed:
        return False
    lit_base = layout.segments["lit_hi"][0]
    for t in lit_ts:
        n = t.shape[0]
        if n % 2:
            return False
        if n == 0:
            continue
        flat = t[:, 0]
        hi_ok = (flat[0::2] >= 1) & (flat[0::2] < 65)
        lo_ok = (flat[1::2] >= 65) & (flat[1::2] < 193)
        mm2 = (flat == 0)
        if not (hi_ok | mm2[0::2]).all() or not (lo_ok | mm2[1::2]).all():
            return False
        if (mm2[0::2] != mm2[1::2]).any():
            return False  # per-byte act gating needs hi/lo to agree
        live = t[t[:, 3] != 0]
        if live.shape[0]:
            hi_l = live[live[:, 0] < 65]
            lo_l = live[live[:, 0] >= 65]
            for part in (hi_l, lo_l):
                if part.shape[0] and (
                        (part[:, 3] != part[0, 3]).any()
                        or (part[:, 4] != part[0, 4]).any()
                        or (part[:, 8] != part[0, 8]).any()
                        or (part[:, 9] != part[0, 9]).any()):
                    return False
    return True


def _next_pow2(n: int) -> int:
    return 1 << max(4, (n - 1).bit_length())


def _rebase_lit(t: np.ndarray, lit_base: int) -> np.ndarray:
    """Rebase a lit-stream sub-trace's rows to the lit sub-model.

    Row 0 (the frozen CDF_INIT row) stays 0; lit rows [lit_base, R) map
    to [1, R - lit_base + 1).  Valid because row 0 is only ever read
    (inc == 0) and cm_idx == 0 rows carry mix == 0."""
    t = t.copy()
    for col in (0, 7):
        v = t[:, col]
        t[:, col] = np.where(v == 0, 0, v - (lit_base - 1))
    return t


def split_stream_traces(traces: list[np.ndarray], layout):
    """Split interleaved metablock traces by stream for the per-stream
    model passes; lit rows rebase to the lit sub-model.

    Returns (cmd_traces, lit_traces, lit_masks, r_cmd, r_lit)."""
    lit_base = layout.segments["lit_hi"][0]
    masks = [t[:, 2] == 1 for t in traces]
    cmd_ts = [t[~m] for t, m in zip(traces, masks)]
    lit_ts = [_rebase_lit(t[m], lit_base) for t, m in zip(traces, masks)]
    return cmd_ts, lit_ts, masks, lit_base, layout.num_rows - lit_base + 1


def _split_lit_sub_traces(lit_ts: list[np.ndarray]):
    """Per-frame lit traces -> flat per-sub-stream traces (deferred-v3).

    A lit trace row pair is one literal byte, so sub boundaries fall at
    2*SUB_LIT-row multiples.  Each sub-trace encodes against a fresh
    model — exactly the per-lane contract of every lit model pass, so
    subs ARE lanes downstream.  Returns (sub_traces, spans) with
    spans[i] = (first_sub_index, n_subs) for frame i."""
    from .deferred import SUB_LIT
    subs, spans = [], []
    for t in lit_ts:
        k = max(1, -(-t.shape[0] // (2 * SUB_LIT)))
        spans.append((len(subs), k))
        for j in range(k):
            subs.append(t[j * 2 * SUB_LIT:(j + 1) * 2 * SUB_LIT])
    return subs, spans


def deferred_model_pass(traces: list[np.ndarray], layout, chunk: int,
                        pallas: bool | None = None, interpret: bool = False,
                        return_device: bool = False):
    """Per-stream deferred-v2 model passes over B metablock traces.

    Splits each trace by stream (per-stream ticking, deferred.cmd_chunk),
    rebases lit rows to the lit sub-model (shrinking each pass's onehot
    row space: R_cmd = lit_base, R_lit = R - lit_base + 1), and returns
    (starts, freqs) scattered back to trace order, plus the per-stream
    lane arrays [(cmd_starts, cmd_freqs, lit_starts, lit_freqs)] the ANS
    stage consumes directly.

    With return_device=True, returns instead the DEVICE-resident padded
    per-stream arrays ((cs, cf, cmd_counts), (ls, lf, lit_counts)) so the
    ANS stage can run without any host round trip of the (start, freq)
    streams (the D2H + re-upload dominated encode on slow links)."""
    from . import deferred
    b = len(traces)
    cmd_ts, lit_ts, masks, r_cmd, r_lit = split_stream_traces(traces, layout)
    # deferred-v3: each lit sub-stream is an independent model domain —
    # subs simply become lanes for every lit pass below
    sub_ts, spans = _split_lit_sub_traces(lit_ts)
    s_cmd = deferred.cmd_chunk(chunk)
    lit_fast = _lit_pass_usable(layout, sub_ts)
    out = []
    for sid, (ts, num_rows, s) in enumerate(
            ((cmd_ts, r_cmd, s_cmd), (sub_ts, r_lit, chunk))):
        cspd = cmd_speeds_from_rows(cmd_ts, num_rows) if sid == 0 else None
        if (sid == 0 and cspd is not None and not pallas
                and _on_tpu()):
            # packed-lane Pallas kernel: VMEM-resident model, ~3x the
            # XLA pass on chip and 10x less H2D (no [B, N, 10] array)
            from .pallas_cmd_pass import model_pass_cmd_pallas
            n_padded = _padded_len(
                max((t.shape[0] for t in ts), default=1), max(s, 16))
            st, fr = model_pass_cmd_pallas(ts, cspd[0], cspd[1],
                                           num_rows, s, n_padded)
            out.append((st, fr))
            continue
        if (sid == 1 and lit_fast and not pallas
                and _on_tpu()):
            # packed-lane Pallas lit kernel: ~6.7x the XLA lit pass on
            # chip (research/probe_lit_pallas.py); packing returns None
            # for out-of-envelope traces -> XLA fallback below
            from .pallas_lit_pass import model_pass_lit_pallas
            n_p = max(_padded_len(
                max((t.shape[0] for t in ts), default=1), max(s, 16)), s)
            res = model_pass_lit_pallas(ts, s, n_p)
            if res is not None:
                out.append((res[0], res[1]))
                continue
        padded = jnp.asarray(_pad_traces(ts, multiple=s))
        if pallas or (pallas is None and _on_tpu()
                      and _PALLAS_MODEL_READY):
            from .pallas_model import model_pass_deferred_pallas
            st, fr = model_pass_deferred_pallas(padded, num_rows, s,
                                                interpret=interpret)
        elif sid == 1 and lit_fast:
            spd = jnp.asarray(lit_speeds_from_traces(ts))
            st, fr = model_pass_deferred_lit(padded, spd, num_rows, s)
        elif sid == 0 and cspd is not None:
            st, fr = model_pass_deferred_cmd(padded, jnp.asarray(cspd[0]),
                                             jnp.asarray(cspd[1]),
                                             num_rows, s)
        else:
            st, fr = model_pass_deferred(padded, num_rows, s)
        out.append((st, fr))
    sub_counts = [t.shape[0] for t in sub_ts]
    if return_device:
        cmd_counts = [int((~m).sum()) for m in masks]
        return (out[0][0], out[0][1], cmd_counts), \
               (out[1][0], out[1][1], sub_counts), spans
    (cs, cf), (ls, lf) = [(np.asarray(a), np.asarray(b_)) for a, b_ in out]
    starts = [np.zeros(t.shape[0], np.int32) for t in traces]
    freqs = [np.ones(t.shape[0], np.int32) for t in traces]
    lanes = []
    for i in range(b):
        m = masks[i]
        nc = int((~m).sum())
        off, k = spans[i]
        lit_s = np.concatenate(
            [ls[off + j, :sub_counts[off + j]] for j in range(k)])
        lit_f = np.concatenate(
            [lf[off + j, :sub_counts[off + j]] for j in range(k)])
        starts[i][~m], freqs[i][~m] = cs[i, :nc], cf[i, :nc]
        starts[i][m], freqs[i][m] = lit_s, lit_f
        lanes.append((cs[i, :nc], cf[i, :nc],
                      [(ls[off + j, :sub_counts[off + j]],
                        lf[off + j, :sub_counts[off + j]])
                       for j in range(k)]))
    return starts, freqs, lanes


_PALLAS_MODEL_READY = False  # flipped when pallas_model beats XLA on-chip


def _padded_len(n_max: int, multiple: int) -> int:
    """Quarter-pow2 grid: the smallest 2^k * m/4 (m in 5..8) >= n_max.
    Bounds shape diversity (~4 variants per octave, so jit compiles stay
    cached) while capping padding waste at 25% — padding straight to the
    next power of two cost ~2x wall time on real trace-length mixes."""
    p = _next_pow2(n_max)
    for m in (5, 6, 7):
        cand = (p >> 3) * m
        if cand >= n_max and cand % multiple == 0:
            return cand
    return p


def _pad_traces(traces: list[np.ndarray], multiple: int = 1) -> np.ndarray:
    n = _padded_len(max(t.shape[0] for t in traces), max(multiple, 16))
    n = max(n, multiple)
    assert n % multiple == 0, (n, multiple)
    out = np.zeros((len(traces), n, trace_mod.NCOLS), np.int32)
    out[:, :, 9] = trace_mod.NOOP_LIM  # padded steps must not renorm row 0
    out[:, :, 4] = trace_mod.NOOP_LIM
    out[:, :, 2] = -1                  # stream -1 marks padding
    for i, t in enumerate(traces):
        out[i, :t.shape[0]] = t
    return out


@functools.partial(jax.jit, static_argnames=("g", "n_pad"))
def _pack_device_lanes(starts, freqs, counts, g, n_pad):
    """[B, N] per-stream model-pass outputs -> [n_pad, g, 128] kernel
    layout (lane i = metablock i at (i // 128, i % 128), matching
    pallas_kernels.assemble_compact's divmod addressing)."""
    from ..ans.pallas_kernels import LANE
    b, n = starts.shape
    st = jnp.pad(starts, ((0, g * LANE - b), (0, n_pad - n)))
    fr = jnp.pad(freqs, ((0, g * LANE - b), (0, n_pad - n)),
                 constant_values=1)
    cnt = jnp.pad(counts, (0, g * LANE - b))
    st = jnp.swapaxes(st, 0, 1).reshape(n_pad, g, LANE)
    fr = jnp.swapaxes(fr, 0, 1).reshape(n_pad, g, LANE)
    return st, fr, cnt.reshape(g, LANE)


def _ans_encode_device(starts, freqs, counts):
    """Device-resident wide-rANS encode over per-metablock lanes.

    starts/freqs: int32[B, N] DEVICE arrays straight out of
    `deferred_model_pass(..., return_device=True)` (rows >= counts[b]
    are padding); counts: int32[B] per-lane symbol counts.

    Packs into the [N', G, 128] lane layout, encodes with the Pallas
    kernel, and compacts the emitted words ON DEVICE
    (pallas_kernels.compact_lane_words) so only ~compressed-size data
    crosses D2H — the uncompacted word+flag planes dominated encode on
    slow links.  Returns (w16 uint16[N', G, 128] emission-ordered words,
    nwords int32[G, 128], states int32[G, 128]); wire assembly is
    byte-identical to the host pack_lanes path (lanes are independent).
    """
    from ..ans import pallas_kernels as pk
    b, n = starts.shape
    g = max(1, -(-b // pk.LANE))
    n_pad = -(-max(1, n) // pk.BLOCK_T) * pk.BLOCK_T
    st, fr, cnt = _pack_device_lanes(starts, freqs, counts, g, n_pad)
    words, flags, states = pk.encode_lanes_pallas(
        st, fr, cnt, interpret=_kernel_interpret())
    w16, nwords = pk.compact_lane_words(words, flags, cnt)
    return w16, nwords, states


def _ans_encode_device_flat(starts, freqs, counts):
    """Like _ans_encode_device but GLOBALLY compacted: returns
    (flat uint16[N*G*128] lane-major word stream, header int32[2, G, 128]
    = stacked (nwords, states)).  The flat stream's live prefix is
    exactly the compressed payload, so D2H ships ~compressed size
    regardless of per-lane length variance, and the header rides one
    small pull (tunnel pulls cost ~15-30 ms latency each)."""
    from ..ans import pallas_kernels as pk
    b, n = starts.shape
    g = max(1, -(-b // pk.LANE))
    n_pad = -(-max(1, n) // pk.BLOCK_T) * pk.BLOCK_T
    st, fr, cnt = _pack_device_lanes(starts, freqs, counts, g, n_pad)
    words, flags, states = pk.encode_lanes_pallas(
        st, fr, cnt, interpret=_kernel_interpret())
    return pk.compact_global(words, flags, cnt, states)


HYBRID_BATCH = 16   # metablocks per device batch: 4+ batches in flight
                    # on the bench's 64-frame config (so interleaved D2H
                    # pulls overlap the pool's host work on later
                    # batches), each still amortizing the ~28 ms dispatch


def _compress_hybrid(data, blocks, options, layout, chunk, flags):
    """Hybrid pipelined device encode — the encode mirror of the 2-stage
    device decode (reference src/parallel_decompressor.rs:99-133): host
    C++ threads run the matcher + trace FSM and code the CMD stream
    (native.encode_streams sel=1, bit-identical because the streams'
    model rows are disjoint) while the chip runs the literal model pass
    + wide rANS over the LIT stream.  Tunnel traffic is ~1 uint16 per
    literal byte H2D (the packed lit plane) and ~compressed-size words
    D2H (compact_global), instead of the full per-nibble trace.

    Whole-pipeline encode parity: /root/reference/src/brotli_ir_gen.rs:
    121-222.  Returns container bytes, or None when a block leaves the
    native envelope (caller falls back to the uniform device path)."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from .. import native, tracelog
    from ..ans import pallas_kernels as pk
    from . import deferred
    from .pallas_lit_pass import _lit_pass_call, assemble_lit_planes

    if native.load() is None or not native.supports(options):
        return None
    lit_base = layout.segments["lit_hi"][0]
    r_lit = layout.num_rows - lit_base + 1

    def host_one(raw):
        """(cmd_bytes, packed_row, spd, lit_count) — the whole host side
        of one metablock, run on a pool thread entirely in C++ (ctypes
        releases the GIL around the matcher/FSM/coder/packer, so 4
        threads scale on 4 cores).  packed_row is None off-envelope
        (the lit trace is returned instead for the XLA fallback)."""
        t = native.build_trace(raw, options, layout)
        if t is None:
            return None
        cmd_b, _ = native.encode_streams(t, layout.num_rows, chunk, sel=1,
                                         lit_base=lit_base)
        r = native.pack_lit(t, lit_base)
        if r is None:
            return cmd_b, None, None, _rebase_lit(t[t[:, 2] == 1],
                                                  lit_base)
        return cmd_b, r[0], r[1], r[2]

    def pull(entry):
        flat, header, counts = entry
        header = np.asarray(header)            # 1 KB: nw + states
        nw = header[0]
        total = int(nw.sum())
        flat = pk.trim_rows(flat, _padded_len(max(total, 1), 1))
        return pk.assemble_global(np.asarray(flat), nw, header[1], counts)

    b = len(blocks)
    cmd_bytes: list = [None] * b
    in_flight: list = []
    pool = ThreadPoolExecutor(min(8, (os.cpu_count() or 1) + 1))
    puller = ThreadPoolExecutor(1)   # D2H pulls off the main thread: a
    # pull blocks on the batch's device chain + tunnel transfer (~0.2 s),
    # during which the main thread should be feeding the next batch
    try:
        futs = [pool.submit(host_one, blk) for blk in blocks]
        for lo in range(0, b, HYBRID_BATCH):
            idxs = list(range(lo, min(lo + HYBRID_BATCH, b)))
            with tracelog.span("encode/host_cmd_wait", frames=len(idxs)):
                got = [futs[i].result() for i in idxs]
            if any(g is None for g in got):
                for f in futs:
                    f.cancel()
                return None
            for i, g in zip(idxs, got):
                cmd_bytes[i] = g[0]
            with tracelog.span("encode/lit_dispatch", frames=len(idxs)):
                if all(g[1] is not None for g in got):
                    # deferred-v3: one packed-plane lane per lit
                    # SUB-STREAM (a packed element is one literal byte,
                    # so subs are plain slices of the frame's plane)
                    rows, spds, spans_b = [], [], []
                    for g in got:
                        row = g[1]
                        k = max(1, -(-len(row) // deferred.SUB_LIT))
                        spans_b.append((len(rows), k))
                        for j in range(k):
                            rows.append(row[j * deferred.SUB_LIT:
                                            (j + 1) * deferred.SUB_LIT])
                            spds.append(g[2])
                    counts = [2 * len(r) for r in rows]
                    n_p = max(_padded_len(
                        max(2 * max((len(r) for r in rows), default=1), 1),
                        chunk), chunk)
                    packed, spd_pl = assemble_lit_planes(rows, spds, n_p,
                                                         chunk)
                    st, fr = _lit_pass_call(jax.device_put(packed),
                                            jax.device_put(spd_pl), chunk,
                                            _kernel_interpret())
                    st, fr = st[:len(rows)], fr[:len(rows)]
                else:  # off-envelope lit traces: XLA pass fallback
                    lit_ts = [g[3] if g[1] is None else
                              _rebase_lit((lambda t: t[t[:, 2] == 1])(
                                  native.build_trace(blocks[i], options,
                                                     layout)), lit_base)
                              for i, g in zip(idxs, got)]
                    sub_ts, spans_b = _split_lit_sub_traces(lit_ts)
                    counts = [t.shape[0] for t in sub_ts]
                    padded = jnp.asarray(_pad_traces(sub_ts, multiple=chunk))
                    if _lit_pass_usable(layout, sub_ts):
                        spd = jnp.asarray(lit_speeds_from_traces(sub_ts))
                        st, fr = model_pass_deferred_lit(padded, spd,
                                                         r_lit, chunk)
                    else:
                        st, fr = model_pass_deferred(padded, r_lit, chunk)
                entry = _ans_encode_device_flat(
                    st, fr, jnp.asarray(np.array(counts, np.int32))) \
                    + (counts,)
                in_flight.append((idxs, spans_b,
                                  puller.submit(pull, entry)))
        lit_fields: list = [None] * b
        with tracelog.span("encode/lit_pull", batches=len(in_flight)):
            for idxs, spans_b, fut in in_flight:
                batch = fut.result()     # per-sub-lane stream bytes
                for i, (off, k) in zip(idxs, spans_b):
                    lit_fields[i] = deferred.lit_subs_join(
                        batch[off:off + k])
    finally:
        pool.shutdown(wait=False)
        puller.shutdown(wait=False)
    frames = [fmt.MetablockFrame(len(blocks[i]), cmd_bytes[i],
                                 lit_fields[i])
              for i in range(b)]
    return fmt.serialize(frames, options.window_size, options.mb_log2,
                         crc32c(data), flags=flags)


def compress(data: bytes, options: DivansOptions | None = None,
             billing_out: dict | None = None) -> bytes:
    from ..ir.matcher import build_commands
    from . import deferred
    options = options or DivansOptions()
    if (options.external_probs is not None or options.block_split
            or options.prior_bitmask_detection or options.cmap_clustering
            or options.streaming_chunk_bytes):
        from . import engine_np
        # ECDF, block-split, clustered-cmap, and per-context-mask
        # streams are golden-engine paths (the trace builder and device
        # profiles are nb=1 / identity-map / constant-mask /
        # external-prob-free)
        return engine_np.compress(data, options)
    if (options.stride_detection_quality or options.speed_detection_quality
            or options.force_stride_value):
        from ..ir.detect import apply_detection
        options = apply_detection(data, options)
    profile = profile_for_options(options)
    mb = options.metablock_size
    chunk = options.chunk_nibbles
    layout = ModelLayout(PROFILES[profile], lo_bucketed=chunk > 0)
    flags = PROFILE_FLAGS[profile] | deferred.chunk_to_flags(chunk)
    if not data:
        return fmt.serialize([], options.window_size, options.mb_log2,
                             crc32c(b""), flags=flags)

    from .. import tracelog
    blocks = [data[off:off + mb] for off in range(0, len(data), mb)]

    if chunk and billing_out is None and _on_tpu():
        # hybrid pipeline: host C++ codes the cmd stream while the chip
        # codes the literals (the encode mirror of the device decode)
        out = _compress_hybrid(data, blocks, options, layout, chunk, flags)
        if out is not None:
            return out

    def one_trace(raw):
        from .. import native
        t = native.build_trace(raw, options, layout)  # C++ fast path
        if t is None:
            commands = build_commands(raw, options)
            t = trace_mod.build_trace(raw, commands, options, layout)
        return t

    with tracelog.span("encode/trace_build", blocks=len(blocks)):
        # blocks are independent and the C++ builder releases the GIL:
        # fan out across host cores so the matcher keeps pace with the
        # device model passes
        if len(blocks) > 1:
            import os
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(8, os.cpu_count() or 1)) as ex:
                traces = list(ex.map(one_trace, blocks))
        else:
            traces = [one_trace(b) for b in blocks]

    b = len(blocks)
    lane_starts, lane_freqs, lane_counts = [], [], []
    frame_groups = []   # per frame: (cmd lane index, [lit lane indices])
    device_lanes = None
    if chunk and billing_out is None and _on_tpu():
        # device-resident pipeline: the model-pass outputs feed the ANS
        # kernel directly and only the compacted words come back —
        # no host round trip of the (start, freq) streams
        with tracelog.span("encode/model_pass", profile="deferred"):
            device_lanes = deferred_model_pass(traces, layout, chunk,
                                               return_device=True)
    elif chunk:
        # per-stream deferred-v2 passes; lane arrays come out pre-split
        # (one cmd lane per frame + one lane per lit sub-stream)
        with tracelog.span("encode/model_pass", profile="deferred"):
            _, freq_list, lanes = deferred_model_pass(traces, layout, chunk)
        for cs_, cf_, subs_ in lanes:
            o = len(lane_counts)
            lane_starts.append(cs_)
            lane_freqs.append(cf_)
            lane_counts.append(cs_.shape[0])
            lit_idx = []
            for ls_, lf_ in subs_:
                lit_idx.append(len(lane_counts))
                lane_starts.append(ls_)
                lane_freqs.append(lf_)
                lane_counts.append(ls_.shape[0])
            frame_groups.append((o, lit_idx))
        if billing_out is not None:
            from . import billing
            fpad = np.ones((b, max(t.shape[0] for t in traces)), np.int32)
            for i, f in enumerate(freq_list):
                fpad[i, :f.shape[0]] = f
            billing_out.update(billing.bill(traces, fpad, layout))
            billing_out["__detail__"] = billing.entropy_report(
                traces, fpad, layout)
    else:
        trace = _pad_traces(traces)
        with tracelog.span("encode/model_pass", profile="adaptive"):
            starts, freqs = model_pass(jnp.asarray(trace), layout.num_rows)
            starts = np.asarray(starts)
            freqs = np.asarray(freqs)
        if billing_out is not None:
            from . import billing
            billing_out.update(billing.bill(traces, freqs, layout))
            billing_out["__detail__"] = billing.entropy_report(
                traces, freqs, layout)
        # split (start, freq) by stream into 2B rANS lanes
        for i in range(b):
            n = traces[i].shape[0]
            stream = traces[i][:, 2]
            frame_groups.append((len(lane_counts), [len(lane_counts) + 1]))
            for sid in (0, 1):
                m = stream == sid
                lane_starts.append(starts[i, :n][m])
                lane_freqs.append(freqs[i, :n][m])
                lane_counts.append(int(m.sum()))
    with tracelog.span("encode/ans_lanes", lanes=len(lane_counts)):
        if device_lanes is not None:
            # fully device-resident: pad/reshape the model-pass outputs
            # on device, encode, compact, and ship only ~compressed-size
            # words per stream (compact_lane_words)
            from ..ans import pallas_kernels as pk
            cmd_tuple, lit_tuple, spans = device_lanes
            stream_bytes = []
            for st_d, fr_d, cnts in (cmd_tuple, lit_tuple):
                w16, nw, states = _ans_encode_device(
                    st_d, fr_d, jnp.asarray(np.asarray(cnts, np.int32)))
                kmax = int(np.asarray(nw).max())
                w16 = pk.trim_rows(w16, _padded_len(max(kmax, 1), 1))
                stream_bytes.append(
                    pk.assemble_compact(w16, nw, states, cnts))
            cmd_b, lit_sub_b = stream_bytes
            frames = [fmt.MetablockFrame(
                len(blocks[i]), cmd_b[i],
                deferred.lit_subs_join(
                    lit_sub_b[spans[i][0]:spans[i][0] + spans[i][1]]))
                for i in range(b)]
            return fmt.serialize(frames, options.window_size,
                                 options.mb_log2, crc32c(data), flags=flags)
        elif _on_tpu():
            # the Pallas wide-rANS kernel (~22 Gsym/s; ans/pallas_kernels.py)
            from ..ans import pallas_kernels as pk
            pls, plf, plc = pk.pack_lanes(lane_starts, lane_freqs,
                                          lane_counts)
            w, fl, st = pk.encode_lanes_pallas(
                jnp.asarray(pls), jnp.asarray(plf), jnp.asarray(plc),
                interpret=_kernel_interpret())
            lane_bytes = pk.assemble_lane_bytes(w, fl, st, lane_counts)
        else:
            lmax = _next_pow2(max(1, max(lane_counts)))
            ls = np.zeros((2 * b, lmax), np.int32)
            lf = np.ones((2 * b, lmax), np.int32)
            for i, (s, f) in enumerate(zip(lane_starts, lane_freqs)):
                ls[i, :s.shape[0]] = s
                lf[i, :f.shape[0]] = f
            words, nwords, states = kernels.encode_lanes(
                jnp.asarray(ls), jnp.asarray(lf),
                jnp.asarray(np.array(lane_counts, np.int32)))
            lane_bytes = kernels.lanes_to_bytes(words, nwords, states)

    with tracelog.span("encode/assemble"):
        frames = []
        for i, (o, lit_idx) in enumerate(frame_groups):
            lit_field = (deferred.lit_subs_join(
                [lane_bytes[j] for j in lit_idx]) if chunk
                else lane_bytes[lit_idx[0]])
            frames.append(fmt.MetablockFrame(len(blocks[i]),
                                             lane_bytes[o], lit_field))
        return fmt.serialize(frames, options.window_size, options.mb_log2,
                             crc32c(data), flags=flags)


def pack_frames(frames):
    """frames -> decode_scan inputs (states, words, raw_len, window, steps)."""
    b = len(frames)
    raw_len = np.array([f.raw_len for f in frames], np.int32)
    wc = _next_pow2(max(1, max((len(f.cmd) - 4) // 2 for f in frames)))
    wl = _next_pow2(max(1, max((len(f.lit) - 4) // 2 for f in frames)))
    cmd_states = np.zeros(b, np.int32)
    lit_states = np.zeros(b, np.int32)
    cmd_words = np.zeros((b, wc), np.int32)
    lit_words = np.zeros((b, wl), np.int32)
    for i, f in enumerate(frames):
        cmd_states[i], cmd_words[i], _ = kernels.bytes_to_lane(f.cmd, wc)
        lit_states[i], lit_words[i], _ = kernels.bytes_to_lane(f.lit, wl)
    window_size = _next_pow2(int(raw_len.max()) + 1)
    max_steps = 8 * window_size + 16384
    return (jnp.asarray(cmd_states), jnp.asarray(cmd_words),
            jnp.asarray(lit_states), jnp.asarray(lit_words),
            jnp.asarray(raw_len), window_size, max_steps)


def decompress(blob: bytes) -> bytes:
    """Batched device decode; per-metablock golden fallback for lanes
    outside the fast profile (the scan abstains, never mis-decodes)."""
    from . import jax_decode
    from . import engine_np
    from ..options import DivansOptions

    from . import deferred

    _w, mb_log2, frames, stored_crc, flags = fmt.deserialize(blob)
    if not frames:
        fmt.check_crc(b"", stored_crc)
        return b""
    chunk = deferred.flags_to_chunk(flags)
    if chunk:
        # deferred streams.  Paths, fastest-available first:
        #   * device (TPU, automatic at >=32 frames or forced via
        #     DIVANS_DEVICE_DECODE=1): host cmd-structure pass + Pallas
        #     literal kernel + host execution (codec/pallas_decode.py);
        #   * native serial decode (host line speed);
        #   * device again as the pre-golden fallback when native is
        #     unavailable;
        #   * golden deferred decode (correctness backstop).
        import os
        from .. import native
        from .layout import FLAG_PROFILES as _FP
        profile = _FP.get(flags & 0b11)
        layout = (ModelLayout(PROFILES[profile], lo_bucketed=True)
                  if profile else None)
        opts = DivansOptions()

        def _device(frames):
            if layout is None or not _on_tpu():
                return None
            from . import pallas_decode
            return pallas_decode.decompress_frames(frames, chunk, layout,
                                                   opts)

        from .. import tracelog
        # device pipeline selection: forced by DIVANS_DEVICE_DECODE=1,
        # vetoed by =0, and otherwise automatic on TPU for batches big
        # enough to amortize dispatch + the (shape-cached, pow2-padded)
        # Mosaic compile — ≥32 frames ≈ a quarter of the 128-lane kernel
        dd = os.environ.get("DIVANS_DEVICE_DECODE")
        if dd == "1" or (dd != "0" and len(frames) >= 32):
            with tracelog.span("decode/device_pipeline", frames=len(frames)):
                raw_all = _device(frames)
            if raw_all is not None:
                fmt.check_crc(raw_all, stored_crc)
                return raw_all
        out = bytearray()
        with tracelog.span("decode/serial_frames", frames=len(frames)):
            for f in frames:
                raw = None
                if layout is not None:
                    raw = native.decode_metablock(f.cmd, f.lit, f.raw_len,
                                                  profile == "cm", layout,
                                                  chunk)
                if raw is None:
                    raw = _device([f])
                if raw is None:
                    with tracelog.span("decode/golden_fallback"):
                        raw = deferred.decode_metablock(f.cmd, f.lit,
                                                        f.raw_len, opts,
                                                        chunk)
                out += raw
        fmt.check_crc(bytes(out), stored_crc)
        return bytes(out)
    profile = FLAG_PROFILES.get(flags)
    if profile is None:
        return engine_np.decompress(blob)

    cs, cw, ls, lw, raw_len, window_size, max_steps = pack_frames(frames)
    windows, ok, _wpos = jax_decode.decode_scan(
        cs, cw, ls, lw, raw_len, profile, window_size, max_steps)
    windows = np.asarray(windows)
    ok = np.asarray(ok)
    out = bytearray()
    opts = DivansOptions()
    for i, f in enumerate(frames):
        if ok[i]:
            out += windows[i, :f.raw_len].tobytes()
        else:  # out-of-profile or corrupt: the golden engine decides
            out += engine_np.decode_metablock(f.cmd, f.lit, f.raw_len, opts)
    fmt.check_crc(bytes(out), stored_crc)
    return bytes(out)
