#!/usr/bin/env python3
"""In-kernel ablation: which op class dominates the literal decode
kernel?  Builds standalone variants of _make_lit_kernel with pieces
stubbed (wrong bytes everywhere — timing only):
  full     — the production kernel body
  nofetch  — model fetch replaced with plane 0 (no 192-plane scan)
  nopull   — word pull replaced with a constant (no 136-row scan)
  nolut    — context lut lookups replaced with p1 & 63
  noent    — entropy math replaced with passthrough (fetch+pull only)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from divans_tpu.codec import pallas_decode as pd

LANES = pd.LANES
N_HI, N_LO = pd.N_HI, pd.N_LO
STATE_LOW, RENORM_BITS = pd.STATE_LOW, pd.RENORM_BITS
SCALE_MASK, LOG2_SCALE = pd.SCALE_MASK, pd.LOG2_SCALE
s_bytes = 128
n_wrows = 136


def make_kernel(mode):
    def kernel(model_ref, words_ref, lcmap_ref, luts_ref, sc_ref,
               bytes_ref, ctx_ref, sc_out_ref):
        n_rem = sc_ref[3:4, :]
        parity = sc_ref[4:5, :]

        def pull(state, pulls, active, w_bound):
            need = active & (state < STATE_LOW)
            gidx = pulls + parity
            if mode == "nopull":
                packed = words_ref[0:1, :]
            else:
                packed = pd._lookup_rows(words_ref, 0, w_bound, gidx >> 1)
            w = (packed >> ((gidx & 1) * 16)) & 0xFFFF
            state = jnp.where(need, (state << RENORM_BITS) | w, state)
            return state, pulls + need.astype(jnp.int32)

        def decode_nib(mixed, state, pulls, active, w_bound):
            state, pulls = pull(state, pulls, active, w_bound)
            slot = state & SCALE_MASK
            if mode == "noent":
                sym = slot & 0xF
                state = jnp.where(active, (state >> 4) | (sym << 20), state)
                return sym, state, pulls
            sym = pd._p_offset_to_sym(mixed, slot)
            st_, fr_ = pd._p_start_freq(mixed, sym)
            state = jnp.where(active,
                              fr_ * (state >> LOG2_SCALE) + slot - st_,
                              state)
            return sym, state, pulls

        def fetch(base, n, idx):
            if mode == "nofetch":
                return model_ref[16 * base:16 * base + 16, :].astype(
                    jnp.int32)
            return pd._fetch1(model_ref, base, n, idx)

        def make_body(w_bound):
            def body(t, carry):
                state, p1, p2, pulls = carry
                active = t < n_rem
                if mode == "nolut":
                    ctx = p1 & 63
                else:
                    sel = (pd._lookup_p6(luts_ref, 0, 64, p1)
                           | pd._lookup_p6(luts_ref, 64, 64, p2))
                    ctx = pd._lookup_p6(lcmap_ref, 0, 16, sel)
                c3 = ctx >> 3
                hi, state, pulls = decode_nib(
                    fetch(0, N_HI, ctx), state, pulls, active, w_bound)
                idx_lo = c3 * 16 + hi
                lo, state, pulls = decode_nib(
                    fetch(N_HI, N_LO, idx_lo), state, pulls, active,
                    w_bound)
                b = jnp.where(active, (hi << 4) | lo, 0)
                bytes_ref[pl.ds(t, 1), :] = b
                ctx_ref[pl.ds(t, 1), :] = jnp.where(active, ctx, 0)
                p2n = jnp.where(active, p1, p2)
                p1n = jnp.where(active, b, p1)
                return (state, p1n, p2n, pulls)
            return body

        init = (sc_ref[0:1, :], sc_ref[1:2, :], sc_ref[2:3, :],
                jnp.zeros((1, LANES), jnp.int32))
        carry = init
        seg = s_bytes // 4
        for k in range(4):
            hi_t = (k + 1) * seg
            w_bound = min(hi_t + 2, n_wrows)
            carry = jax.lax.fori_loop(k * seg, hi_t, make_body(w_bound),
                                      carry)
        state, p1, p2, pulls = carry
        sc_out_ref[0:1, :] = state
        sc_out_ref[1:2, :] = p1
        sc_out_ref[2:3, :] = p2
        sc_out_ref[3:4, :] = pulls
        sc_out_ref[4:8, :] = jnp.zeros((4, LANES), jnp.int32)
    return kernel


def call_mode(mode):
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=(
            jax.ShapeDtypeStruct((s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
    )


rng = np.random.default_rng(0)
model = jnp.asarray(rng.integers(1, 1 << 14, ((N_HI + N_LO) * 16, LANES),
                                 dtype=np.int32).astype(np.int16))
# make CDF rows monotone so entropy math behaves
m = np.sort(np.asarray(model, np.int32).reshape(-1, 16, LANES), axis=1)
model = jnp.asarray(m.reshape(-1, LANES).astype(np.int16))
words = jnp.asarray(rng.integers(0, 1 << 31, (n_wrows, LANES),
                                 dtype=np.int32))
lcmap = jnp.asarray(np.tile(pd.pack6(np.arange(64, dtype=np.int32))[:, None],
                            (1, LANES)))
luts = jnp.asarray(np.tile(pd.pack6(np.arange(512, dtype=np.int32)
                                    % 64)[:, None], (1, LANES)))
sc = np.zeros((8, LANES), np.int32)
sc[0] = (1 << 16)
sc[3] = s_bytes
sc = jnp.asarray(sc)

N_CALLS = 200
for mode in ("full", "nofetch", "nopull", "nolut", "noent"):
    fn = jax.jit(lambda *a, _c=call_mode(mode): _c(*a))
    bytes_c, ctx_c, sc_out = fn(model, words, lcmap, luts, sc)
    int(jnp.sum(sc_out[0]))
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        bytes_c, ctx_c, sc_out = fn(model, words, lcmap, luts, sc)
    int(jnp.sum(sc_out[0]))
    dt = (time.perf_counter() - t0) / N_CALLS
    mbps = s_bytes * LANES / dt / 1e6
    print(f"{mode:8s} {dt*1e6:8.0f} us/call  {mbps:7.1f} MB/s lit",
          flush=True)


# ---- interleave hypothesis: decode K independent chains per lane.
# If the loop is latency-bound, K chains cost ~the same wall per call
# -> K x throughput.  Timing only (same model/words for every chain).
def make_kernel_k(K):
    def kernel(model_ref, words_ref, lcmap_ref, luts_ref, sc_ref,
               bytes_ref, ctx_ref, sc_out_ref):
        n_rem = sc_ref[3:4, :]
        parity = sc_ref[4:5, :]

        def pull(state, pulls, active, w_bound):
            need = active & (state < STATE_LOW)
            gidx = pulls + parity
            packed = pd._lookup_rows(words_ref, 0, w_bound, gidx >> 1)
            w = (packed >> ((gidx & 1) * 16)) & 0xFFFF
            state = jnp.where(need, (state << RENORM_BITS) | w, state)
            return state, pulls + need.astype(jnp.int32)

        def decode_nib(mixed, state, pulls, active, w_bound):
            state, pulls = pull(state, pulls, active, w_bound)
            slot = state & SCALE_MASK
            sym = pd._p_offset_to_sym(mixed, slot)
            st_, fr_ = pd._p_start_freq(mixed, sym)
            state = jnp.where(active,
                              fr_ * (state >> LOG2_SCALE) + slot - st_,
                              state)
            return sym, state, pulls

        def make_body(w_bound):
            def body(t, carry):
                outs = []
                for q in range(K):
                    state, p1, p2, pulls = carry[q]
                    active = t < n_rem
                    sel = (pd._lookup_p6(luts_ref, 0, 64, p1)
                           | pd._lookup_p6(luts_ref, 64, 64, p2))
                    ctx = pd._lookup_p6(lcmap_ref, 0, 16, sel)
                    c3 = ctx >> 3
                    hi, state, pulls = decode_nib(
                        pd._fetch1(model_ref, 0, N_HI, ctx), state, pulls,
                        active, w_bound)
                    idx_lo = c3 * 16 + hi
                    lo, state, pulls = decode_nib(
                        pd._fetch1(model_ref, N_HI, N_LO, idx_lo), state,
                        pulls, active, w_bound)
                    b = jnp.where(active, (hi << 4) | lo, 0)
                    if q == 0:
                        bytes_ref[pl.ds(t, 1), :] = b
                        ctx_ref[pl.ds(t, 1), :] = jnp.where(active, ctx, 0)
                    p2n = jnp.where(active, p1, p2)
                    p1n = jnp.where(active, b, p1)
                    outs.append((state, p1n, p2n, pulls))
                return tuple(outs)
            return body

        init1 = (sc_ref[0:1, :], sc_ref[1:2, :], sc_ref[2:3, :],
                 jnp.zeros((1, LANES), jnp.int32))
        carry = tuple(init1 for _ in range(K))
        seg = s_bytes // 4
        for k in range(4):
            hi_t = (k + 1) * seg
            w_bound = min(hi_t + 2, n_wrows)
            carry = jax.lax.fori_loop(k * seg, hi_t, make_body(w_bound),
                                      carry)
        state, p1, p2, pulls = carry[0]
        sc_out_ref[0:1, :] = state
        sc_out_ref[1:2, :] = p1
        sc_out_ref[2:3, :] = p2
        sc_out_ref[3:4, :] = pulls
        sc_out_ref[4:8, :] = jnp.zeros((4, LANES), jnp.int32)
    return kernel


def call_k(K):
    return pl.pallas_call(
        make_kernel_k(K),
        out_shape=(
            jax.ShapeDtypeStruct((s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((s_bytes, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
    )


for K in (1, 2, 3, 4):
    fn = jax.jit(lambda *a, _c=call_k(K): _c(*a))
    bytes_c, ctx_c, sc_out = fn(model, words, lcmap, luts, sc)
    int(jnp.sum(sc_out[0]))
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        bytes_c, ctx_c, sc_out = fn(model, words, lcmap, luts, sc)
    int(jnp.sum(sc_out[0]))
    dt = (time.perf_counter() - t0) / N_CALLS
    mbps = K * s_bytes * LANES / dt / 1e6
    print(f"K={K}  {dt*1e6:8.0f} us/call  {mbps:7.1f} MB/s lit equiv",
          flush=True)
