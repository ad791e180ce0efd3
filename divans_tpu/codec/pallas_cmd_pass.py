"""Packed-lane Pallas kernel: the deferred cmd-stream model pass on TPU.

Drop-in twin of jax_engine.model_pass_deferred_cmd (bit-exact outputs),
built for the encode wall the XLA pass hits: XLA materializes a
[B, S, R] onehot in HBM every chunk and issues B tiny [S,R]x[R,16]
matmuls, which measure ~400 us/chunk at B=264 (research/
probe_cmd_pass_ablate.py).  Here 8 metablock lanes share one 128-column
tile — lane l owns columns [16l, 16l+16) — and the model lives in VMEM
as a block-diagonal int32 [G*R_pad, 128] array (lane l's rows at
[l*R_pad, (l+1)*R_pad)).  Per chunk the row fetch and the count
histogram are then SINGLE MXU matmuls whose onehot operand is generated
in VMEM and never touches HBM:

    fetch:  oh[S, G*R_pad] @ model[G*R_pad, 128]      -> rows  [S, 128]
    hist:   oh^T (contract t)  @ value-onehot[S, 128] -> cnt [G*R_pad, 128]

The block structure makes both exact per lane: oh row t has one 1 per
lane inside that lane's row block, and off-block products hit zero
model entries (fetch) or are masked (hist).

Deferred-commit semantics reproduced exactly (codec/deferred.py via
jax_engine._apply_pend): one-chunk commit lag, add = inc * cumsum(cnt),
lim_eff = lim for hit rows (row-constant speeds make limsum//cnt == lim
exactly) else 0x8000, renorm `(c+bias) - ((c+bias)>>2)` while
row[15] >= lim_eff up to MAX_RENORM_PASSES.  The cmd stream never mixes
(mix == 0 on every step — reference src/codec/mod.rs codes command
structure without the literal two-model mixer), so there is no weight
state.

Reference basis: the per-nibble adaptive CDF coding of commands in
/root/reference/src/codec/mod.rs:662-688 and src/probability/
frequentist_cdf.rs:73-85; the chunk-deferred adaptation is this repo's
own TPU format (DESIGN.md).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..probability.cdf16 import LOG2_SCALE
from .deferred import MAX_RENORM_PASSES

G = 8             # metablock lanes per 128-column tile (16 CDF entries each)
T_FOLD = 16       # output fold: 16 nibble steps share one output row


def _r_pad(num_rows: int) -> int:
    return -(-num_rows // 8) * 8


def _exact_div(a, b):
    """floor(a/b), a int32 in [0, 2^31), b in [1, 2^24) (pallas_decode)."""
    rec = pl.reciprocal(b.astype(jnp.float32), approx=False)
    q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    q = q + (rem.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    for _ in range(2):
        q = q + (rem >= b).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = a - q * b
    return q


def _colmod(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) % 16


def _prefix16(x):
    """Inclusive prefix sum along the lane axis within 16-column groups."""
    cm = _colmod(x.shape)
    for s in (1, 2, 4, 8):
        x = x + jnp.where(cm >= s, pltpu.roll(x, s, len(x.shape) - 1), 0)
    return x


def _bcast15(x):
    """Broadcast each 16-column group's column 15 to the whole group."""
    cm = _colmod(x.shape)
    w = x.shape[-1]
    y = jnp.where(cm == 15, x, 0)
    for s in (1, 2, 4, 8):
        # left-roll by s == right-roll by w - s (pltpu.roll is nonneg)
        y = y + jnp.where(cm + s < 16,
                          pltpu.roll(y, w - s, len(x.shape) - 1), 0)
    return y


def _gsum16(x):
    """Sum within each 16-column group, broadcast to every column."""
    return _bcast15(_prefix16(x))


def _split_bf16(x):
    """7-bit hi/lo split of nonneg int32 < 2^15: two exact bf16 operands."""
    return (x >> 7).astype(jnp.bfloat16), (x & 127).astype(jnp.bfloat16)


def _lane_of_k(shape, dim, r_pad):
    """iota // r_pad for values < G * r_pad, via G-1 compares (r_pad is
    not a power of two; constants can't be captured by the kernel)."""
    k = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    lane = jnp.zeros(shape, jnp.int32)
    for l in range(1, G):
        lane = lane + (k >= l * r_pad).astype(jnp.int32)
    return k, lane


def renorm_passes_bound(inc_row, lim_row, s) -> int | None:
    """Worst-case renorm passes per chunk apply, from the static row
    speeds: at apply time a row's max is < lim + inc*s (the previous
    apply left it < lim; one chunk adds at most inc*s), and each pass
    maps m -> (m+16) - ((m+16)>>2).  With the bound known statically the
    kernel unrolls exactly that many masked passes and drops the
    while_loop's scalar cond (a full-array reduce + pipeline stall per
    chunk).  Returns None when the bound exceeds MAX_RENORM_PASSES
    (caller keeps the while_loop — the capped-renorm semantics can then
    differ from unrolled passes).

    Callers should only unroll small bounds (<= 2): the bound is
    worst-case (a row at lim-1 hit on every step of a chunk) while the
    while_loop pays for *actual* passes, so a large bound unrolled
    costs more than the cond it saves (measured: bound 4 at s=64 is
    1.6x slower than hybrid pass-1 + while)."""
    p_max = 0
    for inc, lim in zip(np.asarray(inc_row), np.asarray(lim_row)):
        if inc == 0:
            continue
        m = max(int(lim) - 1, 64) + int(inc) * s
        p = 0
        while m >= int(lim) and p <= MAX_RENORM_PASSES:
            m = (m + 16) - ((m + 16) >> 2)
            p += 1
        if p > MAX_RENORM_PASSES:
            return None
        p_max = max(p_max, p)
    return p_max


def _make_kernel(s, r_pad, n_chunks, n_renorm=None):
    kr = G * r_pad

    def kernel(trace_ref, inc_ref, lim_ref, out_ref, model_ref,
               pend_add_ref, pend_lim_ref, bias_ref, bd_ref, rowk_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            # cache the [KR, 128] iota-derived constants: recomputing
            # them every chunk cost ~1.9k vector ops per step
            cm_kr = _colmod((kr, 128))
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (kr, 128), 1) // 16
            _, lane_k = _lane_of_k((kr, 128), 0, r_pad)
            bd0 = lane_k == lane_c
            bias_ref[:] = cm_kr + 1
            bd_ref[:] = bd0.astype(jnp.int32)
            model_ref[:] = jnp.where(bd0, 4 * (cm_kr + 1), 0)
            pend_add_ref[:] = jnp.zeros((kr, 128), jnp.int32)
            pend_lim_ref[:] = jnp.full((kr, 128), 0x8000, jnp.int32)
            # row-within-lane of each packed column, for the fetch onehot
            # ([S, KR]: another ~1.4k vector ops per chunk if recomputed)
            ks0, lane_ks0 = _lane_of_k((s, kr), 1, r_pad)
            rowk_ref[:] = ks0 - lane_ks0 * r_pad

        bias = bias_ref[:]
        bd_mask = bd_ref[:] != 0                              # [KR, 128]

        tp = trace_ref[0, 0]                                   # [S, G]
        flat8 = tp & 0xFF
        val8 = (tp >> 8) & 0xF
        act8 = (tp >> 12) & 1
        # inactive steps fetch the scratch row r_pad-1 (free: the caller
        # sizes r_pad > num_rows); their junk counts land on that row,
        # whose inc is 0 and lim 0x8000, so its state never renorms, and
        # their outputs are replaced with CDF_INIT below — matching the
        # XLA pass's `where(act, rows, cdf_init)`.
        flat8 = jnp.where(act8 != 0, flat8, r_pad - 1)

        lrow8 = jax.lax.broadcasted_iota(jnp.int32, (G, kr), 0)
        _, lane_k8 = _lane_of_k((G, kr), 1, r_pad)
        e8c = (lrow8 == lane_k8).astype(jnp.bfloat16)          # [G, KR]
        lrow16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        lcol16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) // 16
        e16c = (lrow16 == lcol16).astype(jnp.bfloat16)         # [G, 128]
        dn = (((1,), (0,)), ((), ()))
        flat_e = jax.lax.dot_general(
            flat8.astype(jnp.bfloat16), e8c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [S, KR]
        val_rep = jax.lax.dot_general(
            val8.astype(jnp.bfloat16), e16c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [S, 128]
        act_rep = jax.lax.dot_general(
            act8.astype(jnp.bfloat16), e16c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)

        oh = (flat_e == rowk_ref[:]).astype(jnp.bfloat16)

        # ---- fetch: rows of the committed snapshot (state through c-2)
        model = model_ref[:]
        m_hi, m_lo = _split_bf16(model)
        f_hi = jax.lax.dot_general(oh, m_hi, dn,
                                   preferred_element_type=jnp.float32)
        f_lo = jax.lax.dot_general(oh, m_lo, dn,
                                   preferred_element_type=jnp.float32)
        fetched = (f_hi.astype(jnp.int32) << 7) + f_lo.astype(jnp.int32)
        cm_s = _colmod((s, 128))
        fetched = jnp.where(act_rep != 0, fetched, 4 * (cm_s + 1))

        # ---- start/freq extraction (cdf16.sym_to_start_freq)
        vh_sym = (val_rep == cm_s)
        vh_prev = (val_rep - 1 == cm_s)
        c_sym = _gsum16(jnp.where(vh_sym, fetched, 0))
        c_prev = _gsum16(jnp.where(vh_prev, fetched, 0))
        maxv = _bcast15(fetched)
        r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
        r_prev = jnp.where(val_rep > 0,
                           _exact_div(c_prev << LOG2_SCALE, maxv), 0)
        packed = (r_prev + 1) | ((r_sym - r_prev - 1) << 16)
        packed = jnp.where(cm_s == 0, packed, 0)
        # fold 16 nibble steps into the 16 columns of each lane group
        # (static row slices + column rolls — strided sublane slices
        # don't lower on Mosaic)
        for t16 in range(s // T_FOLD):
            acc = jnp.zeros((1, 128), jnp.int32)
            for j in range(T_FOLD):
                acc = acc + pltpu.roll(
                    packed[T_FOLD * t16 + j:T_FOLD * t16 + j + 1, :], j, 1)
            out_ref[0, 0, t16:t16 + 1, :] = acc
        out_ref[0, 0, s // T_FOLD:, :] = jnp.zeros(
            (8 - s // T_FOLD, 128), jnp.int32)

        # ---- this chunk's histogram -> next pend.  The ge-mask matmul
        # yields the per-row CUMULATIVE counts directly (add[i] sums
        # hits with sym <= i) and the act-matmul yields the row totals
        # broadcast across each group — replacing the [KR, 128]
        # prefix16/bcast15 vector scans with two MXU products (counts
        # <= S < 2^8, so single bf16 matmuls are exact)
        vh_ge = ((val_rep <= cm_s) & (act_rep != 0)).astype(jnp.bfloat16)
        dn_t = (((0,), (0,)), ((), ()))
        cnt_cum = jax.lax.dot_general(
            oh, vh_ge, dn_t,
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [KR, 128]
        tot = jax.lax.dot_general(
            oh, act_rep.astype(jnp.bfloat16), dn_t,
            preferred_element_type=jnp.float32)
        cnt_cum = jnp.where(bd_mask, cnt_cum, 0)
        new_add = inc_ref[:] * cnt_cum
        # store next chunk's lim_eff directly (hit rows: lim, else
        # 0x8000) — the apply side then reads it without a where
        new_lim = jnp.where(bd_mask & (tot > 0), lim_ref[:], 0x8000)

        # ---- apply the lagged pend (jax_engine._apply_pend, no weights).
        # With a static pass bound (renorm_passes_bound) the renorm is a
        # straight unroll of masked passes (an empty mask is the
        # identity) — no scalar cond at all.  Otherwise the first pass
        # still runs unconditionally (the common case) and only the rare
        # 2nd+ pass pays the while_loop's reduce + pipeline stall.
        committed = model_ref[:] + pend_add_ref[:]
        lim_eff = pend_lim_ref[:]
        cm15 = bias == 16

        def one_pass(arr):
            over = _bcast15(arr) >= lim_eff
            cb = arr + bias
            return jnp.where(over & bd_mask, cb - (cb >> 2), arr)

        if n_renorm is not None:
            for _ in range(n_renorm):
                committed = one_pass(committed)
        else:
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
        pend_add_ref[:] = new_add
        pend_lim_ref[:] = new_lim

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "chunk", "interpret",
                                    "n_renorm"))
def _cmd_pass_call(packed, inc_bd, lim_bd, num_rows, chunk, interpret,
                   n_renorm=None):
    if packed.dtype != jnp.int32:
        # packed rows are 13 bits (flat | value<<8 | act<<12): ship H2D
        # as uint16 over the ~25 MB/s tunnel, upcast on device
        packed = packed.astype(jnp.int32)
    ng, c, s, _g = packed.shape
    r_pad = _r_pad(num_rows + 1)
    kr = G * r_pad
    out = pl.pallas_call(
        _make_kernel(s, r_pad, c, n_renorm),
        grid=(ng, c),
        in_specs=[
            pl.BlockSpec((1, 1, s, G), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kr, 128), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kr, 128), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda g, i: (g, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, c, 8, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((kr, 128), jnp.int32),   # model (block-diagonal)
            pltpu.VMEM((kr, 128), jnp.int32),   # lagged pend add
            pltpu.VMEM((kr, 128), jnp.int32),   # lagged pend lim_eff
            pltpu.VMEM((kr, 128), jnp.int32),   # cached bias (colmod+1)
            pltpu.VMEM((kr, 128), jnp.int32),   # cached block-diag mask
            pltpu.VMEM((s, kr), jnp.int32),     # cached row-of-column
        ],
        interpret=interpret,
    )(packed, inc_bd, lim_bd)
    # unfold: out[g, c, t16, 16l + j] = nibble (c*S + 16*t16 + j) of lane
    # (G*g + l); -> [NG*G, C*S] (starts | freqs<<16)
    o = out[:, :, :s // T_FOLD, :].reshape(ng, c, s // T_FOLD, G, 16)
    o = jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(ng * G, c * s)
    return o & 0xFFFF, o >> 16


def pack_cmd_traces(cmd_ts, n_padded: int, chunk: int) -> np.ndarray:
    """[Ti, 10] trace list -> int32 [NG, C, S, G] packed
    (flat | value<<8 | act<<12); lanes zero-pad to a multiple of G."""
    b = len(cmd_ts)
    ng = -(-b // G)
    c = n_padded // chunk
    packed = np.zeros((ng * G, n_padded), np.int32)
    for i, t in enumerate(cmd_ts):
        n = t.shape[0]
        if n == 0:
            continue
        act = (t[:, 3] != 0).astype(np.int32)
        packed[i, :n] = t[:, 0] | (t[:, 1] << 8) | (act << 12)
    packed = packed.reshape(ng, G, c, chunk)
    return np.ascontiguousarray(packed.transpose(0, 2, 3, 1))


def build_speed_planes(inc_row, lim_row, num_rows: int):
    """(inc_bd, lim_bd) int32 [G*R_pad, 128]: per-row speeds broadcast
    over the packed tile (padding rows: inc 0 / lim 0x8000 so the
    inactive-step scratch row never adapts or renorms)."""
    r_pad = _r_pad(num_rows + 1)
    kr = G * r_pad
    inc = np.zeros(r_pad, np.int32)
    lim = np.full(r_pad, 0x8000, np.int32)
    inc[:num_rows] = np.asarray(inc_row)
    lim[:num_rows] = np.asarray(lim_row)
    inc_bd = np.broadcast_to(np.tile(inc, G)[:, None], (kr, 128)).copy()
    lim_bd = np.broadcast_to(np.tile(lim, G)[:, None], (kr, 128)).copy()
    return inc_bd, lim_bd


def model_pass_cmd_pallas(cmd_ts, inc_row, lim_row, num_rows: int,
                          chunk: int, n_padded: int,
                          interpret: bool | None = None):
    """(starts, freqs) int32 [B, n_padded] — bit-exact twin of
    jax_engine.model_pass_deferred_cmd over the same padded length.

    cmd_ts: list of [Ti, 10] int32 traces (row-constant speeds, no
    mixing — the caller has already verified via cmd_speeds_from_rows).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = len(cmd_ts)
    packed = pack_cmd_traces(cmd_ts, n_padded, chunk)
    inc_bd, lim_bd = build_speed_planes(inc_row, lim_row, num_rows)
    n_renorm = renorm_passes_bound(inc_row, lim_row, chunk)
    if n_renorm is not None and n_renorm > 2:
        n_renorm = None          # hybrid pass-1 + while wins (see bound doc)
    st, fr = _cmd_pass_call(jnp.asarray(packed.astype(np.uint16)),
                            jnp.asarray(inc_bd),
                            jnp.asarray(lim_bd), num_rows, chunk,
                            interpret, n_renorm)
    return st[:b], fr[:b]
