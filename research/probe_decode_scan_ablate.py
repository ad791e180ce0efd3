#!/usr/bin/env python3
"""Timing-only ablation of _decode_lit_scan's per-chunk stages.

Variants (wrong bytes where noted — shapes and dataflow identical):
  full      — production scan
  no-wadj   — mixer freq recompute (one-hot matmuls + divs) removed
  no-hist   — histograms + wadj removed (pend = zeros)
  no-commit — _apply_pend removed too (model frozen at init; kernel +
              premix + transpose only)
  kern-only — premix hoisted out of the scan (constant model; measures
              the pure kernel + word-window glue)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu import native
from divans_tpu.container import format as fmt
from divans_tpu.codec import pallas_decode as pd
from divans_tpu.codec import jax_engine
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec.deferred import flags_to_chunk
from divans_tpu.probability import cdf16

CHUNK = 256
td = "/root/reference/testdata/"
base = b"".join(open(td + f, "rb").read() for f in
                ("alice29", "asyoulik", "random_then_unicode"))
data = (base * (-(-(128 << 18) // len(base))))[:128 << 18]
opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK)
blob = native.compress(data, opts)
_w, _mb, frames, _crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()

scripts = pd.decode_structures(frames, chunk, layout, options)
fb = frames[:128]
sub = scripts[:128]
n_lits = [s.lit_total for s in sub]
lit_mb = sum(n_lits) / 1e6
states, words, n_lit, lcmap_t, luts, spd = pd.pack_lit_lanes(
    [f.lit for f in fb], n_lits, [s.lcmap for s in sub],
    [s.speeds for s in sub])
perm, offs = pd.kernel_perm(layout)
r_lit = layout.num_rows - layout.segments["lit_hi"][0] + 1
s_bytes = chunk // 2
max_lit = int(n_lit.max())
n_chunks = max(1, -(-max_lit // s_bytes))
p = 1 << (n_chunks - 1).bit_length()
for m in (5, 6, 7):
    if (p >> 3) * m >= n_chunks:
        p = (p >> 3) * m
        break
n_chunks = max(1, p)
print(f"n_chunks={n_chunks} lit={lit_mb:.2f} MB", flush=True)

N_HI, N_LO, LANES = pd.N_HI, pd.N_LO, pd.LANES
perm_j = jnp.asarray(perm)
argsj = [jnp.asarray(x) for x in (states, words, n_lit, lcmap_t, luts, spd)]


def make_scan(mode):
    @jax.jit
    def run(states, words, n_lit, lcmap_t, luts, spd):
        b = LANES
        committed0 = jnp.broadcast_to(
            jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32)),
            (b, r_lit, 16))
        weights0 = jnp.concatenate([
            jnp.ones((b, 2, 2), jnp.int32),
            jnp.full((b, 2, 1), 1 << 14, jnp.int32)], axis=2)
        pend0 = {
            "add": jnp.zeros((b, r_lit, 16), jnp.int32),
            "limsum": jnp.zeros((b, r_lit), jnp.int32),
            "cnt": jnp.zeros((b, r_lit), jnp.int32),
            "wadj": jnp.zeros((b, 2, 2), jnp.int32),
        }
        n_wrows = chunk // 2 + 8
        call = pd._chunk_call(s_bytes, n_wrows, False)
        w_max = words.shape[1] - 1
        byte_iota = jnp.arange(s_bytes, dtype=jnp.int32)
        perm_cm2 = jnp.asarray(
            np.array([(i % 8) * 16 + i // 8 for i in range(128)], np.int32))

        g0 = committed0[:, perm_j, :]
        mix0 = jnp.concatenate([
            cdf16.average(g0[:, 64:128], g0[:, 0:64],
                          jnp.full((b, 1), 1 << 14, jnp.int32), jnp),
            cdf16.average(g0[:, 256:384], g0[:, 128:256],
                          jnp.full((b, 1), 1 << 14, jnp.int32), jnp)],
            axis=1).transpose(1, 2, 0).reshape((N_HI + N_LO) * 16, b) \
            .astype(jnp.int16)

        def step(carry, _):
            committed, weights, pend, state, cursor, p1, p2, n_rem = carry
            widx = jnp.clip((cursor >> 1)[:, None] + jnp.arange(n_wrows),
                            0, w_max)
            words_chunk = jnp.take_along_axis(words, widx, axis=1).T
            if mode == "kern-only":
                kmodel = mix0
                g = None
            else:
                g = committed[:, perm_j, :]
                nw_lo = (weights[:, 0, 2] & 0xFFFF)[:, None]
                nw_hi = (weights[:, 1, 2] & 0xFFFF)[:, None]
                mix_hi = cdf16.average(g[:, 64:128], g[:, 0:64], nw_hi, jnp)
                mix_lo = cdf16.average(g[:, 256:384], g[:, 128:256], nw_lo,
                                       jnp)
                kmodel = jnp.concatenate([mix_hi, mix_lo], axis=1) \
                    .transpose(1, 2, 0).reshape((N_HI + N_LO) * 16, b) \
                    .astype(jnp.int16)
            sc_in = jnp.stack([state, p1, p2, n_rem, cursor & 1,
                               jnp.zeros_like(state), jnp.zeros_like(state),
                               jnp.zeros_like(state)], axis=0)
            bytes_c, ctx_c, sc_out = call(kmodel, words_chunk, lcmap_t,
                                          luts, sc_in)
            bytes_l = bytes_c.T
            ctx_l = ctx_c.T
            hi = bytes_l >> 4
            lo = bytes_l & 0xF
            c3 = ctx_l >> 3
            active = byte_iota[None, :] < n_rem[:, None]

            new_pend = pend0
            if mode in ("full", "no-wadj"):
                dn = (((1,), (1,)), ((0,), (0,)))
                i64 = jnp.arange(64, dtype=jnp.int32)[None, None, :]
                i128 = jnp.arange(128, dtype=jnp.int32)[None, None, :]
                i16 = jnp.arange(16, dtype=jnp.int32)[None, None, :]
                idx_lo = c3 * 16 + hi
                oh_hi = ((i64 == ctx_l[:, :, None])
                         & active[:, :, None]).astype(jnp.bfloat16)
                oh_lo = ((i128 == idx_lo[:, :, None])
                         & active[:, :, None]).astype(jnp.bfloat16)
                vh = (i16 == hi[:, :, None]).astype(jnp.bfloat16)
                vl = (i16 == lo[:, :, None]).astype(jnp.bfloat16)
                cnt_hi = jax.lax.dot_general(
                    oh_hi, vh, dn,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                cnt_lo = jax.lax.dot_general(
                    oh_lo, vl, dn,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                cnt_cm2 = cnt_lo[:, perm_cm2, :]

                if mode == "full":
                    from divans_tpu.codec import deferred
                    tcat_hi = jnp.concatenate(
                        [mix_hi, g[:, 64:128], g[:, 0:64]], axis=2)
                    tcat_lo = jnp.concatenate(
                        [mix_lo, g[:, 256:384], g[:, 128:256]], axis=2)
                    wadj_rows = []
                    for oh, tcat, sym in ((oh_hi, tcat_hi, hi),
                                          (oh_lo, tcat_lo, lo)):
                        dnf = (((2,), (1,)), ((0,), (0,)))
                        tf = tcat.astype(jnp.int32)
                        parts = []
                        for half in (tf & 0xFF, tf >> 8):
                            parts.append(jax.lax.dot_general(
                                oh, half.astype(jnp.bfloat16), dnf,
                                preferred_element_type=jnp.float32)
                                .astype(jnp.int32))
                        tv = parts[0] + (parts[1] << 8)
                        i16e = jnp.arange(16, dtype=jnp.int32)[None, None, :]
                        m_sym = i16e == sym[:, :, None]
                        m_prev = i16e == (sym - 1)[:, :, None]
                        fr = []
                        for k in range(3):
                            tbl = tv[:, :, 16 * k:16 * k + 16]
                            maxv = jnp.maximum(tbl[:, :, 15], 1)
                            c_sym = jnp.sum(jnp.where(m_sym, tbl, 0), axis=2)
                            c_prev = jnp.sum(jnp.where(m_prev, tbl, 0),
                                             axis=2)
                            fr.append(((c_sym << 15) // maxv)
                                      - ((c_prev << 15) // maxv) - 1)
                        weighted, p_cm, p_nib = fr
                        error = (1 << 15) - weighted
                        log_geo = cdf16._bit_length_pos(weighted * error, jnp)
                        shift = jnp.maximum(log_geo - 15, 0)
                        adj = [jnp.clip((error * (n1i - weighted)) >> shift,
                                        -deferred.ADJ_CLAMP,
                                        deferred.ADJ_CLAMP)
                               for n1i in (p_cm, p_nib)]
                        wadj_rows.append(jnp.stack(
                            [jnp.sum(jnp.where(active, adj[i], 0), axis=1)
                             for i in (0, 1)], -1))
                    wadj = jnp.stack([wadj_rows[1], wadj_rows[0]], axis=1)
                else:
                    wadj = jnp.zeros((b, 2, 2), jnp.int32)

                def seg(counts, inc_col, lim_col):
                    inc = spd[:, inc_col, None]
                    lim = spd[:, lim_col, None]
                    live = (inc != 0).astype(jnp.int32)
                    tot = jnp.sum(counts, axis=2) * live
                    add = (inc[:, :, None] * jnp.cumsum(counts, axis=2)
                           * live[:, :, None])
                    return add, lim * tot, tot

                segs = [seg(cnt_hi, 0, 1), seg(cnt_lo, 0, 1),
                        seg(cnt_hi, 4, 5), seg(cnt_cm2, 2, 3)]
                zrow = jnp.zeros((b, 1, 16), jnp.int32)
                new_pend = {
                    "add": jnp.concatenate(
                        [zrow] + [s_[0] for s_ in segs], axis=1),
                    "limsum": jnp.concatenate(
                        [zrow[:, :, 0]] + [s_[1] for s_ in segs], axis=1),
                    "cnt": jnp.concatenate(
                        [zrow[:, :, 0]] + [s_[2] for s_ in segs], axis=1),
                    "wadj": wadj,
                }
            if mode in ("full", "no-wadj", "no-hist"):
                committed, weights = jax_engine._apply_pend(
                    committed, weights, pend)
            carry = (committed, weights, new_pend, sc_out[0],
                     cursor + sc_out[3], sc_out[1], sc_out[2],
                     n_rem - s_bytes)
            return carry, bytes_l

        carry0 = (committed0, weights0, pend0, states,
                  jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
                  jnp.zeros((b,), jnp.int32), n_lit)
        carry, ys = jax.lax.scan(step, carry0, None, length=n_chunks)
        out = jnp.swapaxes(ys, 0, 1).reshape(b, n_chunks * s_bytes)
        return jnp.sum(out & 0xFF)

    return run


def timed(fn, n=3):
    int(fn(*argsj))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        int(fn(*argsj))
        best = min(best, time.perf_counter() - t0)
    return best


for mode in ("full", "no-wadj", "no-hist", "no-commit", "kern-only"):
    t = timed(make_scan(mode))
    print(f"{mode:10s} {t*1e3:8.1f} ms  {lit_mb/t:7.2f} MB/s lit", flush=True)
