"""Pallas TPU decode kernel for the deferred-profile literal stream.

The reference's decode story is consumer parallelism: a 2-thread pipeline
with a cmd-decode thread and a literal-decode main thread pulling two
interleaved ANS streams (src/parallel_decompressor.rs:99-133,
src/codec/decoder.rs:229-419) through a 4-byte-pull rANS loop
(src/ans.rs:172-253).  The TPU build keeps that split and adds breadth:

  * the cmd stream decodes host-side (deferred.decode_cmd_structure —
    deferred-v2's per-stream chunk clocks make it fully independent of
    literal values);
  * the literal stream — the hot ~80% of coded nibbles — decodes here:
    128 metablock lanes in lockstep inside one Mosaic kernel, one
    literal byte (two coded nibbles) per lane per step, gather-only
    within a chunk thanks to the deferred model profile
    (codec/deferred.py);
  * commands then execute host-side at memcpy speed
    (deferred.execute_script).

Deferred-v2's self-fed literal history means this pass needs no window
and no command context at all: it is a pure byte-stream transform
(lit stream, count, PredictionMode config) -> literal bytes.

Layout (decided by research/probe_decode_spike*.py; scalar per-lane
fetch is dead at ~200ns/crossing, lane-per-column select-scan measured
viable at ~4us per 128-lane byte step):

  * lane l = column l (128 lanes per kernel);
  * a CDF plane is [16, 128]: entry e of lane l at (e, l);
  * the kernel model is [16 * 192, 128]: 192 PREMIXED CDF planes —
    average(cm, nib, weight) is computed once per chunk outside the
    kernel (tables and mixer weights are frozen within a chunk), in
    kernel order [mixed_hi(64) | mixed_lo(128, cm_second permuted to
    (ctx>>3, hi) so both halves share one select-scan index)];
  * per-lane scalars are [1, 128] planes; per-lane tables (context map,
    renorm words) use `jnp.take_along_axis` sublane gathers
    (tpu.dynamic_gather) in 8-row vreg chunks;
  * the kernel logs only the decoded bytes and the ctx stream; the
    per-byte freq logs are recomputed outside from those (one-hot
    matmuls against the frozen chunk tables — no dynamic gathers), and
    the chunk-boundary model commits run OUTSIDE the kernel between
    chunk calls, sharing the exact histogram/renorm/mixer math with the
    encode pass (jax_engine._chunk_histogram / _apply_pend).

Wire semantics are normative in codec/deferred.py; `decode_literals_np`
below is the readable oracle the kernel is tested bit-equal against.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG2_SCALE
from ..ans.coder_np import RENORM_BITS, STATE_LOW, SCALE_MASK
from .. import tracelog

READY = True

LANES = 128
N_HI = 64          # lit_hi planes (cm profile: (1, 64))
N_LO = 128         # lit_lo planes ((8, 16) bucketed)
N_PLANES = 2 * N_HI + 2 * N_LO   # 384 CDF planes in kernel order
N_PLANES_MIX = N_HI + N_LO       # 192 premixed planes per kernel phase


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


# ----------------------------------------------------------- in-kernel ops
# Lane-per-column ports of probability/cdf16.py: a CDF plane is [16, 128]
# (entry e of lane l at (e, l)); per-lane scalars are [1, 128].

def _ent_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)


def _lookup_rows(tab_ref, base, n, idx):
    """Per-lane gather from rows [base, base+n) of an [*, 128] table.

    idx: [1, 128] int32 in [0, n).  Uses tpu.dynamic_gather (sublane
    gather) in 8-row vreg chunks with a select-scan over chunks."""
    out = jnp.zeros((1, LANES), jnp.int32)
    for k in range(0, n, 8):
        sl = tab_ref[base + k:base + k + 8, :]
        g = jnp.take_along_axis(
            sl, jnp.broadcast_to(jnp.clip(idx - k, 0, 7), (8, LANES)), axis=0)
        out = jnp.where((idx >> 3) == (k >> 3), g[0:1, :], out)
    return out


def _lookup_p6(tab_ref, base, n_packed, idx):
    """Lookup from a 4-per-int32 packed 6-bit-value table (host packing:
    pack6): 4x fewer gather iterations than an unpacked table."""
    packed = _lookup_rows(tab_ref, base, n_packed, idx >> 2)
    return (packed >> ((idx & 3) * 6)) & 63


def pack6(vals: np.ndarray) -> np.ndarray:
    """Pack 6-bit values 4-per-int32 for _lookup_p6 (rows = len/4)."""
    v = np.asarray(vals, np.int64).reshape(-1, 4)
    return (v[:, 0] | (v[:, 1] << 6) | (v[:, 2] << 12)
            | (v[:, 3] << 18)).astype(np.int32)


def pack16(vals: np.ndarray) -> np.ndarray:
    """Pack u16 values 2-per-int32 (little word first)."""
    v = np.asarray(vals, np.int64)
    if v.shape[-1] % 2:
        v = np.concatenate([v, np.zeros(v.shape[:-1] + (1,), np.int64)], -1)
    lo = v[..., 0::2]
    hi = v[..., 1::2]
    return (lo | (hi << 16)).astype(np.uint32).astype(np.int32)


def _stream_words(s: bytes) -> np.ndarray:
    """An ANS stream body (past the 4-byte state) as packed renorm words.

    pack16 over the stream's little-endian u16 words IS the byte stream
    reinterpreted as little-endian u32 — a zero-copy view, not the
    multi-pass int64 detour (host packing was a measured decode pipeline
    stage: research/probe_decode_phases.py)."""
    body = s[4:]
    pad = (-len(body)) % 4
    if pad:
        body = body + b"\0" * pad
    return np.frombuffer(body, dtype="<i4")


def _fetch1(model_ref, base, n, idx):
    """Select-scan fetch of one CDF plane: planes[base + idx], [16, 128]
    int32.  The model ref is int16 (one vreg per [16, 128] plane) so each
    select costs half the vector ops of an int32 scan.  The kernel model
    is PREMIXED outside the kernel (the cm/nib pair and the mixer weight
    are all frozen within a chunk), so one plane per nibble suffices —
    half the scan of the earlier two-table fetch."""
    a = jnp.zeros((16, LANES), jnp.int16)
    for v in range(n):
        m = idx == v
        a = jnp.where(m, model_ref[16 * (base + v):16 * (base + v) + 16, :], a)
    return a.astype(jnp.int32)


def _p_offset_to_sym(cdf, offset):
    """cdf16.offset_to_sym: sym = #{i in 0..14 : cdf[i] <= rescaled}."""
    rescaled = (offset * cdf[15:16, :]) >> LOG2_SCALE
    below = ((cdf <= rescaled) & (_ent_iota() < 15)).astype(jnp.int32)
    return jnp.sum(below, axis=0, keepdims=True)


def _p_extract(cdf, sym):
    return jnp.sum(jnp.where(_ent_iota() == sym, cdf, 0), axis=0,
                   keepdims=True)


def _p_start_freq(cdf, sym):
    """cdf16.sym_to_start_freq on a plane: ([1,128] start, [1,128] freq)."""
    maxv = cdf[15:16, :]
    c_sym = _p_extract(cdf, sym)
    c_prev = jnp.where(sym > 0, _p_extract(cdf, sym - 1), 0)
    r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
    r_prev = jnp.where(sym > 0, _exact_div(c_prev << LOG2_SCALE, maxv), 0)
    return r_prev + 1, r_sym - r_prev - 1


# ----------------------------------------------------------------- kernel

def _make_lit_kernel(s_bytes, n_wrows, n_q=1):
    """One-chunk literal decode: s_bytes bytes per queue, gather-only.

    The model planes arrive PREMIXED: mixed = average(cm, nib, weight)
    is computed once per chunk outside the kernel (tables and mixer
    weights are frozen within a chunk — that is the deferred profile's
    defining property), so the per-byte loop fetches one plane per
    nibble and logs only the bytes and the ctx stream.  The adaptation
    freq logs the chunk commit needs are recomputed outside from those
    (see _decode_lit_scan).

    n_q INDEPENDENT queues share each hardware lane, decoded
    interleaved inside the byte loop: one queue's decode is a single
    long dependency chain (gather -> entropy -> state -> gather), so
    the loop is LATENCY-bound, not op-bound — n_q chains overlap to
    ~2.5x throughput at n_q=3-4 (research/probe_r5_kernel.py; the
    reference's 2-interleaved dual-state rANS, src/ans.rs, is the same
    trick one level down).

    refs (phase q's rows stacked along axis 0): model
    [n_q*16*192, 128] int16 (64 mixed-hi ++ 128 mixed-lo planes per
    phase), words [n_q*n_wrows, 128] (u16 pairs packed 2-per-int32,
    window starting at the even word below each queue's cursor), lcmap
    [n_q*16, 128] (6-bit packed), luts [128, 128] (lut0 ++ lut1, 6-bit
    packed, lane-broadcast, shared), sc [n_q*8, 128] scalars (state,
    p1, p2, n_rem, word parity); outs: bytes [n_q*s_bytes, 128], ctx
    [n_q*s_bytes, 128], sc_out [n_q*8, 128] (state, p1, p2, pulls)."""

    def kernel(model_ref, words_ref, lcmap_ref, luts_ref, sc_ref,
               bytes_ref, ctx_ref, sc_out_ref):
        def pull(q, state, pulls, active, w_bound):
            parity = sc_ref[q * 8 + 4:q * 8 + 5, :]
            need = active & (state < STATE_LOW)
            gidx = pulls + parity
            packed = _lookup_rows(words_ref, q * n_wrows, w_bound,
                                  gidx >> 1)
            w = (packed >> ((gidx & 1) * 16)) & 0xFFFF
            state = jnp.where(need, (state << RENORM_BITS) | w, state)
            return state, pulls + need.astype(jnp.int32)

        def decode_nib(q, mixed, state, pulls, active, w_bound):
            state, pulls = pull(q, state, pulls, active, w_bound)
            slot = state & SCALE_MASK
            sym = _p_offset_to_sym(mixed, slot)
            st_, fr_ = _p_start_freq(mixed, sym)
            state = jnp.where(active,
                              fr_ * (state >> LOG2_SCALE) + slot - st_, state)
            return sym, state, pulls

        def make_body(w_bound):
            def body(t, carry):
                outs = []
                for q in range(n_q):
                    state, p1, p2, pulls = carry[q]
                    active = t < sc_ref[q * 8 + 3:q * 8 + 4, :]
                    sel = (_lookup_p6(luts_ref, 0, 64, p1)
                           | _lookup_p6(luts_ref, 64, 64, p2))
                    ctx = _lookup_p6(lcmap_ref, q * 16, 16, sel)
                    c3 = ctx >> 3
                    # high nibble: premixed average(cm_first[ctx],
                    # lit_hi[ctx])
                    hi, state, pulls = decode_nib(
                        q, _fetch1(model_ref, q * N_PLANES_MIX, N_HI,
                                   ctx),
                        state, pulls, active, w_bound)
                    # low nibble: premixed average(cm_second[hi, c3],
                    # lit_lo[c3, hi]) — cm_second planes are permuted
                    # to (c3, hi) order so both halves share one plane
                    # index
                    idx_lo = c3 * 16 + hi
                    lo, state, pulls = decode_nib(
                        q, _fetch1(model_ref, q * N_PLANES_MIX + N_HI,
                                   N_LO, idx_lo),
                        state, pulls, active, w_bound)

                    b = jnp.where(active, (hi << 4) | lo, 0)
                    bytes_ref[pl.ds(q * s_bytes + t, 1), :] = b
                    ctx_ref[pl.ds(q * s_bytes + t, 1), :] = \
                        jnp.where(active, ctx, 0)
                    p2n = jnp.where(active, p1, p2)
                    p1n = jnp.where(active, b, p1)
                    outs.append((state, p1n, p2n, pulls))
                return tuple(outs)
            return body

        # Staged word-window bound: at byte t a queue has pulled at most
        # 2(t+1) halfwords, so the packed-word row index is <= t+1 —
        # early bytes only ever hit the front of the window, so the
        # lookup scans only its reachable prefix per stage.
        carry = tuple(
            (sc_ref[q * 8:q * 8 + 1, :], sc_ref[q * 8 + 1:q * 8 + 2, :],
             sc_ref[q * 8 + 2:q * 8 + 3, :],
             jnp.zeros((1, LANES), jnp.int32))
            for q in range(n_q))
        n_stages = 4 if s_bytes >= 64 else 1
        seg = s_bytes // n_stages
        for k in range(n_stages):
            hi_t = (k + 1) * seg if k < n_stages - 1 else s_bytes
            w_bound = min(hi_t + 2, n_wrows)
            carry = jax.lax.fori_loop(k * seg, hi_t, make_body(w_bound),
                                      carry)
        for q in range(n_q):
            state, p1, p2, pulls = carry[q]
            sc_out_ref[q * 8:q * 8 + 1, :] = state
            sc_out_ref[q * 8 + 1:q * 8 + 2, :] = p1
            sc_out_ref[q * 8 + 2:q * 8 + 3, :] = p2
            sc_out_ref[q * 8 + 3:q * 8 + 4, :] = pulls
            sc_out_ref[q * 8 + 4:q * 8 + 8, :] = \
                jnp.zeros((4, LANES), jnp.int32)

    return kernel


def _chunk_call(s_bytes, n_wrows, interpret, n_q=1):
    return pl.pallas_call(
        _make_lit_kernel(s_bytes, n_wrows, n_q),
        out_shape=(
            jax.ShapeDtypeStruct((n_q * s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_q * s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_q * 8, LANES), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        interpret=interpret,
    )


# ------------------------------------------------------------- scan driver

def kernel_perm(layout):
    """Static permutation: rebased lit-model rows -> 384 kernel planes,
    plus the rebased segment offsets for trace synthesis."""
    seg = layout.segments
    lit_base = seg["lit_hi"][0]

    def reb(name):
        return seg[name][0] - (lit_base - 1)

    hi_off, lo_off = reb("lit_hi"), reb("lit_lo")
    cm1_off, cm2_off = reb("cm_first"), reb("cm_second")
    perm = np.zeros(N_PLANES, np.int32)
    perm[0:64] = hi_off + np.arange(64)
    perm[64:128] = cm1_off + np.arange(64)
    perm[128:256] = lo_off + np.arange(128)        # natural (c3*16 + hi)
    for c3 in range(8):
        for hi in range(16):
            perm[256 + c3 * 16 + hi] = cm2_off + hi * 8 + c3
    return perm, (hi_off, lo_off, cm1_off, cm2_off)


@functools.partial(jax.jit, static_argnames=("r_lit", "chunk", "n_chunks",
                                             "offs", "interpret",
                                             "n_renorm"))
def _decode_lit_scan(states, words, n_lit, lcmap_t, luts, spd, perm,
                     r_lit, chunk, n_chunks, offs, interpret,
                     n_renorm: int | None = None):
    """One stream per lane (the original 128-metablock batch shape):
    trivial single-frame queues over the general _decode_lit_scan_q."""
    b = LANES
    counts = jnp.ones((b,), jnp.int32)
    out, cursor = _decode_lit_scan_q(
        words, counts, states[None, :], n_lit[None, :],
        jnp.zeros((1, b), jnp.int32), lcmap_t[None], spd[None], luts, perm,
        r_lit, chunk, n_chunks, offs, interpret, n_renorm=n_renorm)
    return out, cursor


def _renorm_bound_q(spd_all, s_bytes: int) -> int | None:
    """Static worst-case renorm passes for the decode commit, from the
    packed per-stream speeds [..., 6] = (inc,lim)x3 (mirror of
    pallas_cmd_pass.renorm_passes_bound): at apply time a row's max is
    < lim + inc*s_bytes and each pass maps m -> (m+16)-((m+16)>>2).
    None when any pair exceeds MAX_RENORM_PASSES (callers keep the
    while_loop)."""
    from .deferred import MAX_RENORM_PASSES
    sp = np.asarray(spd_all).reshape(-1, 6)
    pairs = {(int(i), int(l)) for r in sp
             for i, l in (r[0:2], r[2:4], r[4:6]) if i}
    p_max = 0
    for inc, lim in pairs:
        m = max(lim - 1, 64) + inc * s_bytes
        p = 0
        while m >= lim and p <= MAX_RENORM_PASSES:
            m = (m + 16) - ((m + 16) >> 2)
            p += 1
        if p > MAX_RENORM_PASSES:
            return None
        p_max = max(p_max, p)
    return p_max


@functools.partial(jax.jit, static_argnames=("r_lit", "chunk", "n_steps",
                                             "offs", "interpret",
                                             "n_renorm", "return_carry",
                                             "_ablate"))
def _decode_lit_scan_q(words, counts, state0, n_lit_all, woff_all,
                       lcmap_all, spd_all, luts, perm,
                       r_lit, chunk, n_steps, offs, interpret,
                       n_renorm: int | None = None,
                       carry_in=None, return_carry: bool = False,
                       _ablate: str = ""):
    """lax.scan over lit chunks with PERSISTENT WORKER LANES: each of the
    128 lanes decodes a queue of whole literal streams back-to-back, so
    small and large metablocks pack the grid tightly (one-stream-per-lane
    padding to the batch max ran the real-corpus kernels at 18% lane
    utilization — research/probe_decode_stages.py).  The Pallas kernel
    decodes each chunk against the frozen snapshot; the XLA commit
    applies boundary updates with the one-chunk lag; at a stream switch
    the lane's model, mixer weights, pending updates, ANS state, cursor,
    and byte context reset — each stream decodes exactly as it would
    alone (the model domain is the metablock: SURVEY.md §5 long-context).

    words: [128, W] i32 — per-lane concatenation of the assigned
    streams' packed renorm words (each stream int32-aligned);
    counts: [128] streams per lane; state0/n_lit_all/woff_all: [F, 128]
    per-stream initial ANS state, literal count, word offset;
    lcmap_all: [F, 16, 128] (pack6); spd_all: [F, 128, 6]; luts:
    [128, 128] (lut0 ++ lut1, pack6); perm: [384] kernel plane ->
    rebased lit row.  Returns (bytes [128, n_steps * chunk//2] — each
    stream's bytes start at its chunk offset * chunk//2 — and the final
    word cursors [128])."""
    from ..probability import cdf16
    from . import deferred

    s_bytes = chunk // 2
    hi_off, lo_off, cm1_off, cm2_off = offs
    # the per-class pend concat below relies on the rebased lit segments
    # being contiguous in layout order
    assert (hi_off, lo_off, cm1_off, cm2_off) == (1, 65, 193, 257), offs
    assert r_lit == 385, r_lit
    # pend row hi*8+c3 (cm_second) <- count row c3*16+hi (lo fetch index)
    perm_cm2 = np.array([(i % 8) * 16 + i // 8 for i in range(128)], np.int32)
    b = counts.shape[0]
    # n_q queue-lanes share each hardware lane (latency interleave,
    # _make_lit_kernel); queue-lane index = q * LANES + hw_lane
    assert b % LANES == 0, b
    n_q = b // LANES
    # All per-chunk commit state lives in [B, 16, P] layout — symbol
    # entries on sublanes, CDF planes on the 128-lane axis.  The natural
    # [B, P, 16] layout wastes 8x of every vector op (a 16-wide minor
    # axis pads to 128 lanes); transposed, the cumsums/renorms/premixes
    # run on full vregs.  _apply_pend_t below is the transposed twin of
    # jax_engine._apply_pend (same integer rules, tests assert equality).
    committed0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32))[None, :, None],
        (b, 16, r_lit))
    weights0 = jnp.concatenate([
        jnp.ones((b, 2, 2), jnp.int32),
        jnp.full((b, 2, 1), 1 << 14, jnp.int32)], axis=2)
    pend0 = {
        "add": jnp.zeros((b, 16, r_lit), jnp.int32),
        "limsum": jnp.zeros((b, r_lit), jnp.int32),
        "cnt": jnp.zeros((b, r_lit), jnp.int32),
        "wadj": jnp.zeros((b, 2, 2), jnp.int32),
    }
    n_wrows = chunk // 2 + 8
    call = _chunk_call(s_bytes, n_wrows, interpret, n_q)
    w_max = words.shape[1] - 1
    byte_iota = jnp.arange(s_bytes, dtype=jnp.int32)

    def _xdiv(a, bmax):
        """floor(a/bmax) for int32 a in [0, 2^31), bmax in [1, 2^24) —
        the XLA twin of the kernel's _exact_div (f32 reciprocal + exact
        integer corrections); XLA's native int32 divide lowers slowly."""
        rec = 1.0 / bmax.astype(jnp.float32)
        q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
        rem = a - q * bmax
        q = q + (rem.astype(jnp.float32) * rec).astype(jnp.int32)
        rem = a - q * bmax
        for _ in range(2):
            q = q + (rem >= bmax).astype(jnp.int32) \
                - (rem < 0).astype(jnp.int32)
            rem = a - q * bmax
        return q

    def _average_t(cdf_a, cdf_b, mix_rate):
        """cdf16.average on [B, 16, P] (entries on sublanes); mix_rate
        [B, 1, 1] weights cdf_a.  Same integer ops as cdf16.average."""
        amax = cdf_a[:, 15:16, :]
        bmax = cdf_b[:, 15:16, :]
        shift = jnp.maximum(cdf16._bit_length_pos(amax * bmax, jnp) - 15, 0)
        inv = (1 << 15) - mix_rate
        ra = (cdf_a * bmax) >> shift
        rb = (cdf_b * amax) >> shift
        return (((ra * mix_rate + rb * inv + 1) >> 15)
                + 0x8000 & 0xFFFF) - 0x8000

    def _adj_tables(mix, cm, nib):
        """Per-(sym, plane) mixer adjustments for one nibble class,
        [B, 16, P].

        Every per-byte wadj term is a pure function of (plane row, sym)
        under the chunk-frozen tables, so the byte loop's freq math
        collapses to these constant tables — the chunk's summed
        adjustment is then just sum(cnt * adj) against the count
        histograms (bounded: sum(cnt) * ADJ_CLAMP = 2^28 < int32)."""
        def ftab(t):
            maxv = jnp.maximum(t[:, 15:16, :], 1)
            r = _xdiv(t << LOG2_SCALE, maxv)
            r_prev = jnp.concatenate(
                [jnp.zeros_like(r[:, :1, :]), r[:, :-1, :]], axis=1)
            return r - r_prev - 1
        fw, fc, fn = ftab(mix), ftab(cm), ftab(nib)
        error = (1 << 15) - fw
        log_geo = cdf16._bit_length_pos(fw * error, jnp)
        shift = jnp.maximum(log_geo - 15, 0)
        return [jnp.clip((error * (n1i - fw)) >> shift,
                         -deferred.ADJ_CLAMP, deferred.ADJ_CLAMP)
                for n1i in (fc, fn)]

    def _apply_pend_t(committed, weights, pend):
        """jax_engine._apply_pend in [B, 16, R] layout (same integer
        rules: boundary CDF renorm + mixer commit of codec/deferred.py;
        bit-equality with the shared apply is covered by the 3-layer
        decode tests)."""
        from ..probability import weights as weights_mod

        committed = committed + pend["add"]
        has = pend["cnt"] > 0
        lim_eff = jnp.where(
            has, _xdiv(pend["limsum"], jnp.maximum(pend["cnt"], 1)), 0x8000)
        bias = jnp.arange(1, 17)[None, :, None]

        def _ren_cond(c):
            i, arr = c
            return ((i < deferred.MAX_RENORM_PASSES)
                    & jnp.any(arr[:, 15, :] >= lim_eff))

        def _ren_body(c):
            i, arr = c
            over = arr[:, 15, :] >= lim_eff
            cb = arr + bias
            return i + 1, jnp.where(over[:, None, :], cb - (cb >> 2), arr)

        if n_renorm is not None and n_renorm <= 3:
            # static unroll (bit-exact: extra passes are identity for
            # rows already under their limit, exactly as the masked
            # while-loop body).  Drops the while_loop's full-array
            # reduce + scalar cond per chunk — the single largest XLA
            # commit cost (35 of 145 ms on the round-5 ablation)
            for _ in range(max(1, n_renorm)):
                _, committed = _ren_body((jnp.int32(0), committed))
        else:
            _, committed = jax.lax.while_loop(_ren_cond, _ren_body,
                                              (jnp.int32(0), committed))
        w01 = weights[:, :, :2] + pend["wadj"]
        w01 = jnp.clip(w01, 1, deferred.WEIGHT_MAX)
        w0f, w1f = weights_mod._fix_weights(w01[:, :, 0], w01[:, :, 1], jnp)
        nw2 = weights_mod.norm_weight(w0f, w1f, jnp)
        weights = jnp.stack([w0f, w1f, nw2], axis=-1)
        return committed, weights

    def step(carry, _):
        (committed, weights, pend, state, cursor, p1, p2, n_rem,
         fidx, lcmap_cur, spd_cur) = carry
        # ---- stream switch: lanes whose stream is exhausted and whose
        # queue has more load the next stream's config and reset every
        # piece of per-stream state (model, weights, pend, ANS, context)
        nxt = fidx + 1
        sw = (n_rem <= 0) & (nxt < counts)
        fidx = jnp.where(sw, nxt, fidx)
        fx = fidx[None, :]
        st0 = jnp.take_along_axis(state0, fx, 0)[0]
        nl = jnp.take_along_axis(n_lit_all, fx, 0)[0]
        wo = jnp.take_along_axis(woff_all, fx, 0)[0]
        lc = jnp.take_along_axis(
            lcmap_all, jnp.broadcast_to(fidx[None, None, :],
                                        (1, 16, b)), 0)[0]
        sp = jnp.take_along_axis(
            spd_all, jnp.broadcast_to(fidx[None, :, None], (1, b, 6)), 0)[0]
        state = jnp.where(sw, st0, state)
        cursor = jnp.where(sw, wo * 2, cursor)
        p1 = jnp.where(sw, 0, p1)
        p2 = jnp.where(sw, 0, p2)
        n_rem = jnp.where(sw, nl, n_rem)
        lcmap_cur = jnp.where(sw[None, :], lc, lcmap_cur)
        spd_cur = jnp.where(sw[:, None], sp, spd_cur)
        swb = sw[:, None, None]
        committed = jnp.where(swb, committed0, committed)
        weights = jnp.where(swb, weights0, weights)
        pend = {"add": jnp.where(swb, 0, pend["add"]),
                "limsum": jnp.where(sw[:, None], 0, pend["limsum"]),
                "cnt": jnp.where(sw[:, None], 0, pend["cnt"]),
                "wadj": jnp.where(swb, 0, pend["wadj"])}

        # per-lane packed-word window from the even word below the cursor
        # (overruns clamp; reads gated by `need` in the kernel); phase
        # blocks stacked along rows for the n_q-interleaved kernel
        widx = jnp.clip((cursor >> 1)[:, None] + jnp.arange(n_wrows), 0, w_max)
        words_chunk = jnp.take_along_axis(words, widx, axis=1) \
            .reshape(n_q, LANES, n_wrows).transpose(0, 2, 1) \
            .reshape(n_q * n_wrows, LANES)
        if "nopremix" in _ablate:     # timing ablation: wrong bytes
            g = committed0[:, :, perm]
            mix_hi = g[:, :, 64:128]
            mix_lo = g[:, :, 256:384]
        else:
            g = committed[:, :, perm]                   # [B, 16, 384]
            nw_lo = (weights[:, 0, 2] & 0xFFFF)[:, None, None]
            nw_hi = (weights[:, 1, 2] & 0xFFFF)[:, None, None]
            # premix the frozen cm/nib pairs once per chunk (bit-exact
            # with the per-byte average the kernel used to do: same
            # frozen inputs)
            mix_hi = _average_t(g[:, :, 64:128], g[:, :, 0:64], nw_hi)
            mix_lo = _average_t(g[:, :, 256:384], g[:, :, 128:256], nw_lo)
        kmodel = jnp.concatenate([mix_hi, mix_lo], axis=2) \
            .reshape(n_q, LANES, 16, N_PLANES_MIX).transpose(0, 3, 2, 1) \
            .reshape(n_q * N_PLANES_MIX * 16, LANES).astype(jnp.int16)
        lcmap_k = lcmap_cur.reshape(16, n_q, LANES) \
            .transpose(1, 0, 2).reshape(n_q * 16, LANES)
        sc_in = jnp.stack([state, p1, p2, n_rem, cursor & 1,
                           jnp.zeros_like(state), jnp.zeros_like(state),
                           jnp.zeros_like(state)], axis=0) \
            .reshape(8, n_q, LANES).transpose(1, 0, 2) \
            .reshape(n_q * 8, LANES)
        bytes_c, ctx_c, sc_raw = call(kmodel, words_chunk, lcmap_k,
                                      luts[:, :LANES], sc_in)
        sc_out = sc_raw.reshape(n_q, 8, LANES).transpose(1, 0, 2) \
            .reshape(8, b)
        bytes_l = bytes_c.reshape(n_q, s_bytes, LANES) \
            .transpose(0, 2, 1).reshape(b, s_bytes)
        ctx_l = ctx_c.reshape(n_q, s_bytes, LANES) \
            .transpose(0, 2, 1).reshape(b, s_bytes)
        hi = bytes_l >> 4
        lo = bytes_l & 0xF
        c3 = ctx_l >> 3
        active = byte_iota[None, :] < n_rem[:, None]            # [B, s]

        if "nohist" in _ablate:       # timing ablation: wrong bytes
            carry = (committed, weights, pend, sc_out[0],
                     cursor + sc_out[3], sc_out[1], sc_out[2],
                     n_rem - s_bytes, fidx, lcmap_cur, spd_cur)
            return carry, bytes_l
        # ---- per-class count histograms.  The lit-only chunk has exactly
        # four blend sites per byte with *constant* (inc, lim) per lane
        # (the PredictionMode speeds), and the nib/cm sites of each nibble
        # share one row index (ctx for hi; a fixed permutation of
        # c3*16+hi for lo).  So the generic [B, 2S, R] onehot histogram
        # (jax_engine._chunk_pend) collapses to two narrow count matmuls
        # count[sym, r] and per-segment cumsums — identical pend values,
        # ~8x less MXU work and ~4x less HBM.
        dn = (((1,), (1,)), ((0,), (0,)))
        i64 = jnp.arange(64, dtype=jnp.int32)[None, None, :]
        i128 = jnp.arange(128, dtype=jnp.int32)[None, None, :]
        i16 = jnp.arange(16, dtype=jnp.int32)[None, None, :]
        idx_lo = c3 * 16 + hi
        oh_hi = ((i64 == ctx_l[:, :, None])
                 & active[:, :, None]).astype(jnp.bfloat16)      # [B, s, 64]
        oh_lo = ((i128 == idx_lo[:, :, None])
                 & active[:, :, None]).astype(jnp.bfloat16)      # [B, s, 128]
        vh = (i16 == hi[:, :, None]).astype(jnp.bfloat16)
        vl = (i16 == lo[:, :, None]).astype(jnp.bfloat16)
        # counts are < 2^8 (<= s_bytes), so single bf16 matmuls are exact;
        # sym-major outputs [B, 16, P] put planes on the lane axis
        cnt_hi = jax.lax.dot_general(
            vh, oh_hi, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt_lo = jax.lax.dot_general(
            vl, oh_lo, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt_cm2 = cnt_lo[:, :, perm_cm2]   # row hi*8+c3 <- count[c3*16+hi]

        # mixer adjustments (deferred.py rules): per-byte adj terms are
        # per-(row, sym) constants under the frozen chunk tables, so the
        # chunk's summed adjustment contracts the count histograms with
        # the precomputed adj tables — no per-byte freq math at all
        if "nowadj" in _ablate:       # timing ablation: wrong bytes
            wadj = pend0["wadj"]
        else:
            wadj_rows = []
            for cnt, mix, cmt, nibt in (
                    (cnt_hi, mix_hi, g[:, :, 64:128], g[:, :, 0:64]),
                    (cnt_lo, mix_lo, g[:, :, 256:384], g[:, :, 128:256])):
                adj = _adj_tables(mix, cmt, nibt)
                wadj_rows.append(jnp.stack(
                    [jnp.sum(cnt * adj[i], axis=(1, 2)) for i in (0, 1)],
                    -1))
            wadj = jnp.stack([wadj_rows[1], wadj_rows[0]], axis=1)  # [B,2,2]

        def seg(cnt_mat, inc_col, lim_col):
            """One class's (add, limsum, cnt) from its [B, 16, P] count
            matrix (cumsum runs over the 16-sublane axis)."""
            inc = spd_cur[:, inc_col, None]
            lim = spd_cur[:, lim_col, None]
            live = (inc != 0).astype(jnp.int32)    # inc==0 records nothing
            tot = jnp.sum(cnt_mat, axis=1) * live
            add = (inc[:, :, None] * jnp.cumsum(cnt_mat, axis=1)
                   * live[:, :, None])
            return add, lim * tot, tot

        segs = [seg(cnt_hi, 0, 1),     # lit_hi   <- sp0
                seg(cnt_lo, 0, 1),     # lit_lo   <- sp0
                seg(cnt_hi, 4, 5),     # cm_first <- sp3 (hi cm speed)
                seg(cnt_cm2, 2, 3)]    # cm_second<- sp2 (lo cm speed)
        zrow = jnp.zeros((b, 16, 1), jnp.int32)
        new_pend = {
            "add": jnp.concatenate([zrow] + [s_[0] for s_ in segs], axis=2),
            "limsum": jnp.concatenate(
                [zrow[:, 0, :]] + [s_[1] for s_ in segs], axis=1),
            "cnt": jnp.concatenate(
                [zrow[:, 0, :]] + [s_[2] for s_ in segs], axis=1),
            "wadj": wadj,
        }
        if "nocommit" not in _ablate:  # timing ablation: wrong bytes
            committed, weights = _apply_pend_t(committed, weights, pend)

        carry = (committed, weights, new_pend, sc_out[0], cursor + sc_out[3],
                 sc_out[1], sc_out[2], n_rem - s_bytes,
                 fidx, lcmap_cur, spd_cur)
        return carry, bytes_l

    carry0 = (committed0, weights0, pend0, state0[0],
              woff_all[0] * 2, jnp.zeros((b,), jnp.int32),
              jnp.zeros((b,), jnp.int32), n_lit_all[0],
              jnp.zeros((b,), jnp.int32), lcmap_all[0], spd_all[0])
    if carry_in is not None:
        # resumable segment: continue a previous segment's full state
        # (model, weights, pend, ANS state, cursor, queue position) —
        # the stream tables may have GROWN (rows append-only, so fidx
        # keeps indexing the same entries)
        carry0 = carry_in
    carry, ys = jax.lax.scan(step, carry0, None, length=n_steps)
    out = jnp.swapaxes(ys, 0, 1).reshape(b, n_steps * s_bytes)
    if return_carry:
        return out, carry
    return out, carry[4]


def decode_literals_batch(lit_streams: list[bytes], n_lits: list[int],
                          lcmaps, speeds_list, chunk: int, layout,
                          interpret: bool | None = None) -> list[bytes]:
    """Device-decode up to 128 metablocks' literal streams in lockstep.

    Returns the decoded literal bytes per metablock; bit-equal to
    decode_literals_np (tests/test_pallas_decode.py)."""
    out = _issue_lit_batch(lit_streams, n_lits, lcmaps, speeds_list, chunk,
                           layout, interpret)
    return _collect_lit_batch(out, n_lits)


def _collect_lit_batch(out, n_lits) -> list[bytes]:
    out = np.asarray(out)
    if out.dtype != np.uint8:
        out = out.astype(np.uint8)
    return [out[i, :n_lits[i]].tobytes() for i in range(len(n_lits))]


@functools.partial(jax.jit, static_argnames=("ncols",))
def _trim_cast(out, ncols):
    """Shrink the D2H transfer: slice to the live columns and cast the
    one-byte-per-int32 kernel output to uint8 (4x fewer wire bytes —
    the axon tunnel's ~50 MB/s D2H path is a decode pipeline stage)."""
    return out[:, :ncols].astype(jnp.uint8)


def pack_lit_lanes(lit_streams: list[bytes], n_lits: list[int],
                   lcmaps, speeds_list, lanes: int = LANES):
    """Pack literal streams + per-metablock model config into the kernel's
    lane arrays (states, packed words, n_lit, lcmap_t, luts, spd).

    `lanes` may be any multiple of 128 — the sharded decode step widens
    the lane axis to n_devices * 128 (parallel/dist.sharded_decode_step).
    Shapes are pow2-padded: Mosaic compiles are expensive (minutes) and
    cached per shape, so shape diversity must stay bounded."""
    from .. import constants

    b = len(lit_streams)
    assert b <= lanes, (b, lanes)
    states = np.zeros(lanes, np.int32)
    n_lit = np.zeros(lanes, np.int32)
    w_len = max(2, max((max(0, len(s) - 4) + 1) // 2 for s in lit_streams))
    w_len = 1 << (w_len - 1).bit_length()
    words = np.zeros((lanes, (w_len + 1) // 2), np.int32)
    for i, s in enumerate(lit_streams):
        if len(s) >= 4:
            states[i] = int.from_bytes(s[:4], "little")
            w = _stream_words(s)
            words[i, :w.shape[0]] = w
        n_lit[i] = n_lits[i]
    lcmap_t = np.zeros((16, lanes), np.int32)
    spd = np.zeros((lanes, 6), np.int32)
    for i in range(b):
        lcmap_t[:, i] = pack6(np.asarray(lcmaps[i], np.int32)[:64])
        sp = speeds_list[i]
        spd[i] = [sp[0].inc, sp[0].lim, sp[2].inc, sp[2].lim,
                  sp[3].inc, sp[3].lim]
    lut0 = np.asarray(constants.literal_lut0(
        constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
    lut1 = np.asarray(constants.literal_lut1(
        constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
    luts = np.repeat(pack6(np.concatenate([lut0, lut1]))[:, None],
                     LANES, axis=1)
    return states, words, n_lit, lcmap_t, luts, spd


def _issue_lit_batch(lit_streams: list[bytes], n_lits: list[int],
                     lcmaps, speeds_list, chunk: int, layout,
                     interpret: bool | None = None):
    """Dispatch one ≤128-lane literal-decode scan; returns the device
    array (async — jax dispatch returns before the kernel completes, so
    callers can overlap host work before materializing)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    perm, offs = kernel_perm(layout)
    lit_base = layout.segments["lit_hi"][0]
    r_lit = layout.num_rows - lit_base + 1
    states, words, n_lit, lcmap_t, luts, spd = pack_lit_lanes(
        lit_streams, n_lits, lcmaps, speeds_list)
    s_bytes = chunk // 2
    max_lit = int(n_lit.max())
    n_chunks = max(1, -(-max_lit // s_bytes))
    # quarter-pow2 grid (jax_engine._padded_len): straight pow2 padding
    # ran up to ~1.6x more chunk steps than the longest lane needs, and
    # every lane pays the full scan length
    p = 1 << (n_chunks - 1).bit_length()
    for m in (5, 6, 7):
        cand = (p >> 3) * m
        if cand >= n_chunks:
            p = cand
            break
    n_chunks = max(1, p)
    out, _ = _decode_lit_scan(
        jnp.asarray(states), jnp.asarray(words), jnp.asarray(n_lit),
        jnp.asarray(lcmap_t), jnp.asarray(luts), jnp.asarray(spd),
        jnp.asarray(perm), r_lit, chunk, n_chunks, offs, interpret,
        n_renorm=_renorm_bound_q(spd, chunk // 2))
    # bound shape diversity: columns padded to 4 KiB multiples
    ncols = min(out.shape[1], max(4096, -(-max_lit // 4096) * 4096))
    return _trim_cast(out, ncols)


def pack_lane_queues(lit_streams: list[bytes], n_lits: list[int],
                     lcmaps, speeds_list, chunk: int, lanes: int = LANES,
                     spread: int | None = None):
    """Bin-pack metablock literal streams onto `lanes` persistent worker
    lanes for _decode_lit_scan_q (LPT greedy on chunk counts: streams
    sorted by size, each assigned to the least-loaded lane — max lane
    load stays within ~4/3 of optimal, so lane utilization is near 1
    even when stream sizes span 100x, as they do on real data).

    Zero-literal streams take no lane slot (their decode is empty).
    `spread` restricts assignment to the first N lanes (tests use it to
    force multi-stream queues on small inputs).
    Returns (arrays tuple for _decode_lit_scan_q, n_steps, placement)
    where placement[i] = (lane, chunk_offset) or None when n_lits[i]
    == 0."""
    from .. import constants
    import heapq

    s_bytes = chunk // 2
    jobs = sorted(
        ((-(-n_lits[i] // s_bytes), i) for i in range(len(lit_streams))
         if n_lits[i] > 0), reverse=True)
    heap = [(0, l) for l in range(spread or lanes)]
    lane_jobs: list[list[int]] = [[] for _ in range(lanes)]
    loads = [0] * lanes
    for c, i in jobs:
        load, l = heapq.heappop(heap)
        lane_jobs[l].append(i)
        loads[l] = load + c
        heapq.heappush(heap, (load + c, l))
    f_max = max(1, max(len(j) for j in lane_jobs))
    f_max = 1 << (f_max - 1).bit_length()     # bound jit shape diversity
    state0 = np.zeros((f_max, lanes), np.int32)
    n_lit_all = np.zeros((f_max, lanes), np.int32)
    woff_all = np.zeros((f_max, lanes), np.int32)
    lcmap_all = np.zeros((f_max, 16, lanes), np.int32)
    spd_all = np.zeros((f_max, lanes, 6), np.int32)
    counts = np.zeros(lanes, np.int32)
    placement: list[tuple[int, int] | None] = [None] * len(lit_streams)
    lane_words: list[np.ndarray] = []
    for l, jl in enumerate(lane_jobs):
        segs, woff, coff = [], 0, 0
        for k, i in enumerate(jl):
            s = lit_streams[i]
            w = _stream_words(s)
            if len(s) >= 4:
                state0[k, l] = int.from_bytes(s[:4], "little")
            n_lit_all[k, l] = n_lits[i]
            woff_all[k, l] = woff
            lcmap_all[k, :, l] = pack6(np.asarray(lcmaps[i], np.int32)[:64])
            sp = speeds_list[i]
            spd_all[k, l] = [sp[0].inc, sp[0].lim, sp[2].inc, sp[2].lim,
                             sp[3].inc, sp[3].lim]
            placement[i] = (l, coff)
            segs.append(w)
            woff += w.shape[0]
            coff += -(-n_lits[i] // s_bytes)
        counts[l] = len(jl)
        lane_words.append(np.concatenate(segs) if segs
                          else np.zeros(0, np.int32))
    w_len = max(2, max(w.shape[0] for w in lane_words))
    w_len = -(-w_len // 2048) * 2048          # 8 KiB column grid
    words = np.zeros((lanes, w_len), np.int32)
    for l, w in enumerate(lane_words):
        words[l, :w.shape[0]] = w
    # quarter-pow2 step grid (shape-cached Mosaic compiles are minutes)
    n_steps = max(1, max(loads))
    p = 1 << (n_steps - 1).bit_length()
    for m in (5, 6, 7):
        if (p >> 3) * m >= n_steps:
            p = (p >> 3) * m
            break
    n_steps = max(1, p)
    lut0 = np.asarray(constants.literal_lut0(
        constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
    lut1 = np.asarray(constants.literal_lut1(
        constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
    luts = np.repeat(pack6(np.concatenate([lut0, lut1]))[:, None],
                     lanes, axis=1)
    arrays = (words, counts, state0, n_lit_all, woff_all, lcmap_all,
              spd_all, luts)
    return arrays, n_steps, placement


@jax.jit
def _cast_u8(out):
    """uint8 on device before D2H (4x fewer wire bytes)."""
    return out.astype(jnp.uint8)


def issue_lane_queues(arrays, n_steps: int, chunk: int, layout,
                      interpret: bool | None = None):
    """Dispatch one persistent-lane decode scan (async); returns the
    uint8 device array [128, n_steps * chunk//2]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    perm, offs = kernel_perm(layout)
    lit_base = layout.segments["lit_hi"][0]
    r_lit = layout.num_rows - lit_base + 1
    out, _cursor = _decode_lit_scan_q(
        *[jnp.asarray(a) for a in arrays], jnp.asarray(perm),
        r_lit, chunk, n_steps, offs, interpret,
        n_renorm=_renorm_bound_q(arrays[6], chunk // 2))
    return _cast_u8(out)


def decode_structures(frames, chunk: int, layout, options) -> list | None:
    """Stage 1 of the 2-stage decode: per-frame command scripts.

    The native C++ pass (native.decode_cmd_structure — line speed, the
    analog of the reference's cmd-decode thread) handles every in-profile
    frame; the golden Python pass is the correctness fallback.  Frames
    are independent, and ctypes releases the GIL during the C call, so
    the pass fans out across host cores (the same consumer parallelism
    the reference gets from its decode threads).  Returns None when any
    frame leaves the kernel envelope."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from .deferred import decode_cmd_structure
    from .. import native

    def one(f):
        sc = native.decode_cmd_structure(f.cmd, f.raw_len, layout, chunk)
        if sc is None:
            sc = decode_cmd_structure(f.cmd, f.raw_len, options, chunk)
        return sc

    if len(frames) > 1 and native.load() is not None:
        with ThreadPoolExecutor(min(8, os.cpu_count() or 1)) as ex:
            scripts = list(ex.map(one, frames))
    else:
        scripts = [one(f) for f in frames]
    if not all(sc.supported for sc in scripts):
        return None
    return scripts


def _execute(script, lit_bytes, out: np.ndarray | None = None):
    """Run a command script over its decoded literals; with `out` (a
    uint8 view of the shared output buffer) the native path writes the
    frame in place and returns None."""
    from .deferred import execute_script
    from .. import native

    if isinstance(script, native.NativeScript):
        return native.execute_script(script, lit_bytes, out=out)
    raw = execute_script(script, bytes(lit_bytes)
                         if not isinstance(lit_bytes, bytes) else lit_bytes)
    if out is None:
        return raw
    out[:] = np.frombuffer(raw, np.uint8)
    return None


@functools.partial(jax.jit, static_argnames=("b", "r_lit"))
def _resume_init_carry(b: int, r_lit: int):
    """Empty-queue initial carry for the resumable scan: every lane
    idle (fidx=-1, n_rem=0) so its first assigned stream loads through
    the in-scan switch logic — byte-identical to the preloaded start
    (the switch resets to exactly the init values)."""
    from ..probability import cdf16
    committed0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32))[None, :, None],
        (b, 16, r_lit))
    weights0 = jnp.concatenate([
        jnp.ones((b, 2, 2), jnp.int32),
        jnp.full((b, 2, 1), 1 << 14, jnp.int32)], axis=2)
    pend0 = {
        "add": jnp.zeros((b, 16, r_lit), jnp.int32),
        "limsum": jnp.zeros((b, r_lit), jnp.int32),
        "cnt": jnp.zeros((b, r_lit), jnp.int32),
        "wadj": jnp.zeros((b, 2, 2), jnp.int32),
    }
    z = jnp.zeros((b,), jnp.int32)
    return (committed0, weights0, pend0, z, z, z, z, z,
            jnp.full((b,), -1, jnp.int32),
            jnp.zeros((16, b), jnp.int32), jnp.zeros((b, 6), jnp.int32))


class ResumableLaneDecoder:
    """Persistent queue-lane decode across scan SEGMENTS (round-5
    decode lever): the full scan carry (model, mixer, pend, ANS state,
    cursor, queue position) round-trips on device between jit calls, so
    a 32 KiB sub-stream can SPAN segments — lanes never wait for the
    longest sub and new streams append between segments (the per-group
    pipeline's n_steps was floored at SUB_LIT/s_bytes = 256 by any full
    sub; see PERF_NOTES round 5).

    Queue consumption is deterministic (one chunk per active lane per
    step; a lane switches to its next assigned stream when the current
    one is exhausted), so the host SIMULATES the schedule exactly and
    knows which output rows of which segment hold every stream's
    chunks — no device feedback needed for placement."""

    def __init__(self, chunk: int, layout, lanes: int = LANES,
                 interpret: bool = False):
        self.chunk = chunk
        self.s_bytes = chunk // 2
        self.lanes = lanes
        self.interpret = interpret
        perm, offs = kernel_perm(layout)
        self.perm = jnp.asarray(perm)
        self.offs = offs
        lit_base = layout.segments["lit_hi"][0]
        self.r_lit = layout.num_rows - lit_base + 1
        # per-lane queues
        self.rows: list[list] = [[] for _ in range(lanes)]
        # each row: [state0, n_lit, woff_words|None, lcmap_col(np[16]),
        # spd6] — woff assigned when the stream's words upload (delta
        # packing); streams need not be contiguous per lane, only
        # within themselves
        self.backlog = [0] * lanes          # unconsumed chunks per lane
        # device-resident append-only words buffer: each segment uploads
        # only the NEW streams' words (the full per-segment re-upload
        # was the resumable pipeline's measured overhead)
        self.words_dev = None
        self.W_dev = 0
        self.pending_words: list = []       # (lane, row_idx, np words)
        # host twin of the in-scan queue logic
        self.sim_fidx = [-1] * lanes
        self.sim_rem = [0] * lanes
        self.gstep = 0
        # (lane, row) -> global step its first chunk decodes at
        self.start_step: dict = {}
        self.carry = None
        from .. import constants
        lut0 = np.asarray(constants.literal_lut0(
            constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
        lut1 = np.asarray(constants.literal_lut1(
            constants.LITERAL_PREDICTION_MODE_UTF8), np.int32)
        self.luts_dev = jnp.asarray(np.repeat(
            pack6(np.concatenate([lut0, lut1]))[:, None], lanes, axis=1))
        import heapq
        self._heap = [(0, l) for l in range(lanes)]
        self._heapq = heapq

    def add_stream(self, payload: bytes, n_lit: int, lcmap, speeds):
        """Assign a stream to the least-backlogged lane (LPT greedy);
        returns its (lane, row) key — the id used in segment()
        placements — or None for empty streams.  n_lit <= 0 (a corrupt
        container can declare more sub-streams than its lit_total
        covers) adds nothing: the frame then decodes short and fails
        the script's length check as a typed error."""
        chunks = -(-n_lit // self.s_bytes) if n_lit > 0 else 0
        if chunks == 0:
            return None
        load, l = self._heapq.heappop(self._heap)
        w = _stream_words(payload)
        state0 = int.from_bytes(payload[:4], "little") if len(payload) >= 4 \
            else 0
        sp = speeds
        key = (l, len(self.rows[l]))
        self.rows[l].append([state0, n_lit, None,
                             pack6(np.asarray(lcmap, np.int32)[:64]),
                             [sp[0].inc, sp[0].lim, sp[2].inc, sp[2].lim,
                              sp[3].inc, sp[3].lim]])
        self.pending_words.append((l, key[1], w))
        self.backlog[l] += chunks
        self._heapq.heappush(self._heap, (load + chunks, l))
        return key

    def pending_chunks(self) -> int:
        return sum(self.backlog)

    def max_backlog(self) -> int:
        return max(self.backlog) if self.backlog else 0

    def _upload_delta(self):
        """Append pending streams' words to the device buffer and assign
        their woffs.  Streams are contiguous within themselves; gaps
        between a lane's streams are fine (each row carries its own
        start offset)."""
        if not self.pending_words:
            return
        per_lane: dict = {}
        for (l, ri, w) in self.pending_words:
            per_lane.setdefault(l, []).append((ri, w))
        delta_w = max(sum(w.shape[0] for _ri, w in v)
                      for v in per_lane.values())
        delta_w = -(-max(delta_w, 2) // 2048) * 2048
        delta = np.zeros((self.lanes, delta_w), np.int32)
        for l, v in per_lane.items():
            pos = 0
            for (ri, w) in v:
                self.rows[l][ri][2] = self.W_dev + pos
                delta[l, pos:pos + w.shape[0]] = w
                pos += w.shape[0]
        dd = jnp.asarray(delta)
        self.words_dev = dd if self.words_dev is None \
            else jnp.concatenate([self.words_dev, dd], axis=1)
        self.W_dev += delta_w
        self.pending_words = []

    def _arrays(self):
        """Current full tables (KBs), pow2-padded for compile reuse."""
        lanes = self.lanes
        f_max = max(1, max(len(r) for r in self.rows))
        f_max = 1 << (f_max - 1).bit_length()
        state0 = np.zeros((f_max, lanes), np.int32)
        n_lit_all = np.zeros((f_max, lanes), np.int32)
        woff_all = np.zeros((f_max, lanes), np.int32)
        lcmap_all = np.zeros((f_max, 16, lanes), np.int32)
        spd_all = np.zeros((f_max, lanes, 6), np.int32)
        counts = np.zeros(lanes, np.int32)
        for l, rws in enumerate(self.rows):
            counts[l] = len(rws)
            for k, (st, nl, wo, lc, sp) in enumerate(rws):
                state0[k, l] = st
                n_lit_all[k, l] = nl
                woff_all[k, l] = wo
                lcmap_all[k, :, l] = lc
                spd_all[k, l] = sp
        return (counts, state0, n_lit_all, woff_all, lcmap_all, spd_all)

    def segment(self, n_steps: int):
        """Issue one scan segment (async device array [lanes,
        n_steps*s_bytes] u8) and advance the host schedule twin.
        Returns (dev_out, placements) where placements[sid] = list of
        (chunk_index_in_stream, step_offset_in_this_segment) for chunks
        decoded in THIS segment."""
        self._upload_delta()
        counts, state0, n_lit_all, woff_all, lcmap_all, spd_all = \
            self._arrays()
        nr = _renorm_bound_q(spd_all, self.s_bytes)
        if self.carry is None:
            self.carry = _resume_init_carry(self.lanes, self.r_lit)
        out, self.carry = _decode_lit_scan_q(
            self.words_dev, jnp.asarray(counts), jnp.asarray(state0),
            jnp.asarray(n_lit_all), jnp.asarray(woff_all),
            jnp.asarray(lcmap_all), jnp.asarray(spd_all),
            self.luts_dev, self.perm,
            self.r_lit, self.chunk, n_steps, self.offs,
            self.interpret, n_renorm=nr, carry_in=self.carry,
            return_carry=True)
        # host twin: replay the switch logic for n_steps.  A lane works
        # one stream on CONSECUTIVE steps until exhausted, so each
        # (stream, segment) contribution is one contiguous RUN
        # (first_chunk, first_step, n) — finish copies one slice per run
        placements: dict = {}
        for l in range(self.lanes):
            rws = self.rows[l]
            fidx, rem = self.sim_fidx[l], self.sim_rem[l]
            t = 0
            while t < n_steps:
                if rem <= 0:
                    if fidx + 1 < len(rws):
                        fidx += 1
                        rem = rws[fidx][1]
                        self.start_step[(l, fidx)] = self.gstep + t
                    else:
                        break               # idle through segment end
                n_here = min(n_steps - t, -(-rem // self.s_bytes))
                sid = (l, fidx)
                ci = (self.gstep + t) - self.start_step[sid]
                placements.setdefault(sid, []).append((ci, t, n_here))
                self.backlog[l] -= n_here
                rem -= n_here * self.s_bytes
                t += n_here
            self.sim_fidx[l], self.sim_rem[l] = fidx, rem
        self.gstep += n_steps
        return _cast_u8(out), placements



def _quant_steps(n: int, lo: int = 32, hi: int = 256) -> int:
    """Quantize a segment length to the quarter-pow2 grid (Mosaic
    compiles are per-shape-cached)."""
    n = max(lo, min(hi, n))
    p = 1 << (n - 1).bit_length()
    for m in (5, 6, 7):
        if (p >> 3) * m >= n:
            return (p >> 3) * m
    return p


def _decompress_frames_resumable(frames, chunk, layout, options,
                                 interpret, one, n_workers, lanes):
    """Resumable-segment decode pipeline (DIVANS_DEC_RESUME=1): one
    persistent ResumableLaneDecoder spans the whole container, so
    sub-streams cross segment boundaries and lanes never stall on the
    longest sub (the per-group pipeline's utilization floor)."""
    import os
    import threading
    from concurrent.futures import ThreadPoolExecutor, as_completed
    from .deferred import SUB_LIT, lit_subs_split

    s_bytes = chunk // 2
    offsets = np.zeros(len(frames) + 1, np.int64)
    np.cumsum([f.raw_len for f in frames], out=offsets[1:])
    out_buf = np.empty(int(offsets[-1]), np.uint8)

    dec = ResumableLaneDecoder(chunk, layout, lanes=lanes,
                               interpret=interpret)
    SEG_STEPS = int(os.environ.get("DIVANS_DEC_SEG_STEPS", "192"))
    SEG_NEED = lanes * int(os.environ.get("DIVANS_DEC_SEG_CHUNKS",
                                          str(SEG_STEPS)))

    stream_buf: dict = {}     # key -> np buffer
    stream_left: dict = {}    # key -> chunks outstanding
    stream_frame: dict = {}   # key -> frame idx
    frame_left: dict = {}     # frame idx -> outstanding stream count
    scripts: dict = {}
    lock = threading.Lock()

    def finish_seg(seg):
        dev, placements = seg
        arr = np.asarray(dev)
        done_frames = []
        for key, runs in placements.items():
            buf = stream_buf[key]
            l = key[0]
            for (ci, t, n_here) in runs:
                lo = ci * s_bytes
                hi = min(lo + n_here * s_bytes, buf.shape[0])
                buf[lo:hi] = arr[l, t * s_bytes:t * s_bytes + (hi - lo)]
            with lock:
                stream_left[key] -= sum(r[2] for r in runs)
                if stream_left[key] <= 0:
                    i = stream_frame[key]
                    frame_left[i] -= 1
                    if frame_left[i] == 0:
                        done_frames.append(i)
        for i in done_frames:
            sc = scripts[i]
            subs = [stream_buf[k] for k in frame_keys[i]]
            lb = np.concatenate(subs) if subs else np.zeros(0, np.uint8)
            _execute(sc, lb, out=out_buf[offsets[i]:offsets[i + 1]])

    frame_keys: dict = {}
    seg_futs = []
    with ThreadPoolExecutor(n_workers) as ex, \
            ThreadPoolExecutor(2) as finisher:
        futs = {ex.submit(one, frames[i]): i for i in range(len(frames))}
        for fut in as_completed(futs):
            kind, val = fut.result()
            i = futs[fut]
            if kind == "host":
                out_buf[offsets[i]:offsets[i + 1]] = \
                    np.frombuffer(val, np.uint8)
                continue
            sc = val
            scripts[i] = sc
            keys = []
            for j, payload in enumerate(lit_subs_split(frames[i].lit)):
                nl = (max(0, min(SUB_LIT, sc.lit_total - j * SUB_LIT))
                      if sc.lit_total else 0)
                key = dec.add_stream(payload, nl, sc.lcmap, sc.speeds)
                if key is not None:
                    keys.append(key)
                    stream_buf[key] = np.empty(nl, np.uint8)
                    stream_left[key] = -(-nl // s_bytes)
                    stream_frame[key] = i
            frame_keys[i] = keys
            if not keys:
                _execute(sc, b"", out=out_buf[offsets[i]:offsets[i + 1]])
                continue
            frame_left[i] = len(keys)
            # FIXED segment length: the scan compiles per (S, F, W)
            # shape, and arrival-order-dependent S values were
            # recompiling inside timed runs (probe_r5_resume) — one S
            # keeps the shape set tiny and stable
            while dec.pending_chunks() >= SEG_NEED:
                seg_futs.append(finisher.submit(finish_seg,
                                                dec.segment(SEG_STEPS)))
        # drain: lanes may hold imbalanced tails
        while dec.pending_chunks() > 0:
            seg_futs.append(finisher.submit(finish_seg,
                                            dec.segment(SEG_STEPS)))
    for fut in seg_futs:
        fut.result()
    return out_buf.tobytes()


def decompress_frames(frames, chunk: int, layout, options,
                      interpret: bool | None = None) -> bytes | None:
    """Full 2-stage deferred decode of a frame list.

    Host decodes command structure (native C++ cmd pass at line speed —
    the reference's cmd thread, src/parallel_decompressor.rs:99-133),
    the device kernel decodes every literal byte in 128-lane batches,
    and the host executes the command scripts (memcpy-speed C++).

    Pipelining: all frames' structure decodes are queued on a thread
    pool up front; frames accumulate into GROUPS in script-arrival
    order, sized by literal CHUNK NEED (not frame count — frame-count
    groups left lanes empty and ran scans at 48% utilization,
    research/probe_queue_phases.py), and each group's scan launches
    (async, with its D2H enqueued) the moment enough work is ready, so
    later groups' cmd passes overlap earlier groups' device work.  Each
    issued group's FINISH (D2H wait + literal reassembly + native
    script execution) runs on a dedicated 2-thread pool, overlapped
    with the in-flight scans and the cmd pass — only the last group's
    finish is ever on the critical tail.  Within a group, streams
    bin-pack onto 128 persistent worker lanes (pack_lane_queues) —
    real-corpus stream sizes span 100x and one-stream-per-lane padding
    ran the kernels at 18% utilization (research/probe_decode_stages.py).

    Envelope: the lane kernel covers the cm profile; frames outside it
    — and every frame of the mix/split/stride profiles — decode
    host-side (native serial, the measured 60-80 MB/s threaded fast
    path) ON THE SAME POOL, fully overlapped with the device scans, so
    one pipeline decodes every stream (reference parity:
    src/parallel_decompressor.rs:99-133 runs every stream through its
    one 2-thread pipeline).  Never abstains on a valid container."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from .deferred import decode_cmd_structure, decode_metablock
    from .. import native

    have_native = native.load() is not None
    kernel_profile = layout.profile.name == "cm" and layout.lo_bucketed
    use_cm = layout.profile.name != "stride"
    s_bytes = chunk // 2

    import threading
    inflight = [0]          # device scans issued but not finished
    inflight_lock = threading.Lock()
    # adaptive host/device split: when the chip is backlogged (>= N
    # groups in flight), a spare pool thread full-decodes the frame
    # natively instead of feeding the queue — the two engines drain the
    # container together.  OFF by default: on this 4-core box the host
    # is already saturated by the cmd pass + finishers (69.4 MB/s split
    # off vs 64.9-68.8 at thresholds 2-4); on many-core hosts set
    # DIVANS_DEC_BACKLOG to ~3 to add host-engine throughput on top of
    # the chip's.  0 forces every frame host-side (the correctness
    # escape hatch, exercised in tests).
    BACKLOG = int(os.environ.get("DIVANS_DEC_BACKLOG", "999999"))

    def one(f):
        """("dev", script) for kernel-envelope frames, else
        ("host", raw_bytes) decoded right here on the pool thread."""
        sc = None
        backlogged = have_native and inflight[0] >= BACKLOG
        if kernel_profile and not backlogged:
            sc = native.decode_cmd_structure(f.cmd, f.raw_len, layout,
                                             chunk) if have_native else None
            if sc is None:
                sc = decode_cmd_structure(f.cmd, f.raw_len, options, chunk)
            if sc.supported:
                return ("dev", sc)
        raw = native.decode_metablock(f.cmd, f.lit, f.raw_len, use_cm,
                                      layout, chunk) if have_native else None
        if raw is None:
            raw = decode_metablock(f.cmd, f.lit, f.raw_len, options, chunk)
        return ("host", raw)

    # queues per hardware lane (latency interleave, _make_lit_kernel).
    # DEFAULT 1: the synthetic-chain probe measured ~2.5x for 3-4
    # interleaved chains, but on real containers the 32 KiB lit
    # sub-streams floor every scan at SUB_LIT/s_bytes = 256 steps (a
    # sub is serial), so extra phases mostly idle unless >= QPL*128
    # balanced subs are in flight — measured 69 -> 28 MB/s e2e at
    # QPL=3 on the 48 MiB corpus (pipeline collapse + idle phases;
    # PERF_NOTES round 5).  The interleaved kernel stays available for
    # sub-rich workloads via this env knob, bit-exact at every K.
    QPL = int(os.environ.get("DIVANS_DEC_QPL", "1"))
    # group size: target ~128 chunk-slots per queue-lane per scan —
    # big enough that the scan's fixed dispatch cost amortizes and
    # every lane is loaded, small enough that scans pipeline finely
    # against the cmd pass and each other (swept on the 48 MiB corpus
    # at QPL=1: 64 -> 47.9, 128 -> 67.0, 224 -> 58.7, 288 -> 44.0 MB/s)
    NEED_TARGET = QPL * LANES * int(os.environ.get(
        "DIVANS_DEC_GROUP_CHUNKS", "128"))
    # one pool thread per core: the pool's native calls release the GIL
    # and the main thread's issue path is mostly blocked on the pool
    # (cpus-1 workers measured 58.7 vs 63.5 MB/s for cpus on the 48 MiB
    # corpus; 2 finishers beat 3 — finish work is d2h-wait + memcpy)
    n_workers = int(os.environ.get(
        "DIVANS_DEC_WORKERS", max(1, min(8, os.cpu_count() or 2))))
    n_finish = int(os.environ.get("DIVANS_DEC_FINISHERS", "2"))
    from concurrent.futures import as_completed
    from .deferred import SUB_LIT, lit_subs_split

    # resumable-segment pipeline (round-5 experiment, PERF_NOTES):
    # sub-streams span scan segments, so lanes never stall on the
    # longest sub; opt-in while the grouped pipeline remains the
    # measured default
    if os.environ.get("DIVANS_DEC_RESUME") == "1" and kernel_profile:
        interp = interpret if interpret is not None \
            else jax.default_backend() != "tpu"
        return _decompress_frames_resumable(
            frames, chunk, layout, options, interp, one, n_workers,
            QPL * LANES)

    def issue_group(ready):
        """ready: list of (frame_idx, script).  Each lit sub-stream is
        one lane job (<= SUB_LIT literal bytes), so the queues pack
        tight no matter how the frames' literal loads vary."""
        streams, n_lits, lcmaps, spds, spans = [], [], [], [], []
        for i, s in ready:
            subs_i = lit_subs_split(frames[i].lit)
            spans.append((len(streams), len(subs_i)))
            for j, payload in enumerate(subs_i):
                streams.append(payload)
                n_lits.append(max(0, min(SUB_LIT, s.lit_total - j * SUB_LIT))
                              if s.lit_total else 0)
                lcmaps.append(s.lcmap)
                spds.append(s.speeds)
        with tracelog.span("decode/pack_group", jobs=len(streams)):
            arrays, n_steps, placement = pack_lane_queues(
                streams, n_lits, lcmaps, spds, chunk, lanes=QPL * LANES)
        with tracelog.span("decode/issue_scan", n_steps=n_steps):
            dev = issue_lane_queues(arrays, n_steps, chunk, layout,
                                    interpret=interpret)
        try:
            dev.copy_to_host_async()
        except AttributeError:
            pass
        with inflight_lock:
            inflight[0] += 1
        return ready, spans, n_lits, placement, dev

    # one preallocated output buffer; every frame executes directly into
    # its slice (no per-frame staging buffer, no final 48 MiB join)
    offsets = np.zeros(len(frames) + 1, np.int64)
    np.cumsum([f.raw_len for f in frames], out=offsets[1:])
    out_buf = np.empty(int(offsets[-1]), np.uint8)

    def finish_group(group):
        """D2H wait + per-frame literal reassembly + script execution.
        Runs on the finish pool: np.asarray blocks with the GIL
        released and native execute_script releases it too, so finishes
        overlap later groups' cmd passes and scans."""
        ready, spans, n_lits, placement, dev = group
        # try/finally: if D2H or script execution raises, the inflight
        # counter must still drop or the DIVANS_DEC_BACKLOG host-split
        # heuristic stays forced on for the rest of the call
        try:
            with tracelog.span("decode/d2h_wait", frames=len(ready)):
                arr = np.asarray(dev)
        finally:
            with inflight_lock:
                inflight[0] -= 1
        for (i, s), (off, k) in zip(ready, spans):
            lb = np.empty(sum(n_lits[off:off + k]), np.uint8)
            pos = 0
            for j in range(off, off + k):
                if placement[j] is None:
                    continue
                l, coff = placement[j]
                o = coff * s_bytes
                lb[pos:pos + n_lits[j]] = arr[l, o:o + n_lits[j]]
                pos += n_lits[j]
            _execute(s, lb, out=out_buf[offsets[i]:offsets[i + 1]])

    finish_futs = []
    with ThreadPoolExecutor(n_workers) as ex, \
            ThreadPoolExecutor(n_finish) as finisher:
        # groups form in script-ARRIVAL order: completion order mixes
        # frame sizes, so every group sees the whole size distribution
        # and its lanes bin-pack to near-uniform load (contiguous
        # file-order groups clustered small text frames into one scan
        # and ran it half-empty)
        futs = {ex.submit(one, frames[i]): i for i in range(len(frames))}
        ready: list = []
        need = 0
        for fut in as_completed(futs):
            kind, val = fut.result()
            if kind == "host":
                i = futs[fut]
                out_buf[offsets[i]:offsets[i + 1]] = \
                    np.frombuffer(val, np.uint8)
                continue
            ready.append((futs[fut], val))
            # SUB_LIT is a multiple of s_bytes, so summing per-sub chunk
            # ceils equals one ceil over the frame's literal total
            need += -(-(val.lit_total or 0) // s_bytes)
            if need >= NEED_TARGET:
                finish_futs.append(finisher.submit(
                    finish_group, issue_group(ready)))
                ready, need = [], 0
        if ready:
            finish_futs.append(finisher.submit(
                finish_group, issue_group(ready)))
    for fut in finish_futs:
        fut.result()
    return out_buf.tobytes()


def bench_decode(blob: bytes, n_iter: int = 5) -> float | None:
    """END-TO-END 2-stage device decode throughput: container bytes in ->
    raw bytes out, every stage timed (deserialize, native cmd-structure
    pass, device literal kernel, script execution, CRC check).  This is
    the metric the reference's 18.75 MB/s line speed defines (whole
    pipeline, /root/reference/README.md:6).  The first run warms the
    jit/Mosaic caches (compiles are per-shape-cached, as for any
    persistent service); the result is the best of n_iter full decodes."""
    import time
    from ..container import format as fmt
    from ..options import DivansOptions
    from .layout import ModelLayout, PROFILES, FLAG_PROFILES
    from .deferred import flags_to_chunk

    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    chunk = flags_to_chunk(flags)
    profile = FLAG_PROFILES.get(flags & 0b11)
    if not frames or not chunk or profile is None:
        return None
    # mix/split/stride frames route through the pipeline's host lane
    # (decompress_frames never abstains on a valid deferred container)
    layout = ModelLayout(PROFILES[profile], lo_bucketed=True)
    options = DivansOptions()

    def run() -> bytes:
        _w2, _mb2, fr, crc2, _fl2 = fmt.deserialize(blob)
        raw = decompress_frames(fr, chunk, layout, options, interpret=False)
        fmt.check_crc(raw, crc2)
        return raw

    raw = run()  # warm the jit/Mosaic caches
    total = len(raw)
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return total / best / 1e6


# ======================================================================
# numpy oracle: standalone deferred-v2 literal-stream decode
# ======================================================================

def decode_literals_np(lit_stream: bytes, n_bytes: int, lcmap, speeds,
                       chunk: int) -> bytes:
    """Decode `n_bytes` literal bytes from a deferred-v2 lit stream.

    Mirrors the literal path of deferred.make_deferred_codec exactly
    (cm profile, mm_opts == 0, mixing on, UTF8 luts, btype 0); row keys
    match the codec's (table, *key) identities so the chunk histograms
    agree bit-for-bit."""
    from ..ans.coder_np import ANSDecoder
    from ..probability import scalar
    from .. import constants
    from .deferred import DeferredPolicy, weight_adjustments

    lut0 = constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8)
    lut1 = constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8)
    dec = ANSDecoder(lit_stream)
    pol = DeferredPolicy(chunk)
    sp0, sp2, sp3 = speeds[0], speeds[2], speeds[3]
    out = bytearray()
    p1 = p2 = 0

    def nib(nib_key, cm_key, which, cm_sp):
        nibble_prob = pol.row(nib_key)
        cm_prob = pol.row(cm_key)
        w = pol.weights[which]
        mixed = scalar.average(cm_prob, nibble_prob, w[2] & 0xFFFF)
        off = dec.peek_offset()
        v = scalar.offset_to_sym(mixed, off)
        start, freq = scalar.sym_to_start_freq(mixed, v)
        dec.advance(start, freq)
        p_cm = scalar.sym_to_start_freq(cm_prob, v)[1]
        p_nib = scalar.sym_to_start_freq(nibble_prob, v)[1]
        pol.record_wadj(which, *weight_adjustments(p_cm, p_nib, freq))
        pol.record_blend(cm_key, v, cm_sp.inc, cm_sp.lim)
        pol.record_blend(nib_key, v, sp0.inc, sp0.lim)
        pol.tick()
        return v

    for _ in range(n_bytes):
        sel = int(lut0[p1]) | int(lut1[p2])
        ctx = int(lcmap[sel])
        hi = nib(("lit_hi", 0, 0, ctx), ("cm", 0, ctx), 1, sp3)
        lo = nib(("lit_lo", 0, ctx >> 3, hi), ("cm", 1, hi, ctx >> 3), 0, sp2)
        b = (hi << 4) | lo
        out.append(b)
        p2, p1 = p1, b
    return bytes(out)
