"""Spike v3: sublane-CDF decode step (lane-per-column layout), timed.

Layout decision after spikes v1/v2:
  * lane l = COLUMN l (L = 128 lanes per kernel);
  * a CDF plane is [16, 128]: entry e of lane l at (e, l);
  * model tables are [16*rows, 128]; fetch = select-scan over the row
    candidates: for v in range(rows): out = where(idx == v, T[16v:16v+16], out)
    -> ~3 vreg-ops per candidate for all 128 lanes;
  * per-lane scalars are [1,128] planes (logs store directly);
  * boundary commits happen OUTSIDE the kernel (XLA scatter between
    per-chunk pallas calls), so the kernel is gather/select-only.

This spike times one fake literal-byte step: 5-table fetch bundle
(64+64+128+128+128 rows), CDF symbol search + (start,freq) extraction
x2, a stream-buffer pull, and FSM-ish transition ops.

Run:  python research/probe_decode_spike3.py          # interpret check
      python research/probe_decode_spike3.py --tpu --time
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ON_TPU = "--tpu" in sys.argv
TIME = "--time" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU

S = 256 if TIME else 16
NCHUNK = 32 if TIME else 2
T_HI, T_CM1, T_LO, T_CM2, T_CMD = 64, 64, 128, 128, 128
BUFD = 64


def fetch(table_ref, base, rows, idx):
    """table [16*rows,128] at sublane offset base; idx [1,128] in [0,rows).

    Returns the per-lane CDF plane [16,128]."""
    out = jnp.zeros((16, 128), jnp.int32)
    for v in range(rows):
        sl = table_ref[base + 16 * v: base + 16 * v + 16, :]
        out = jnp.where(idx == v, sl, out)
    return out


def sym_search(cdf, slot):
    """offset_to_sym + start/freq extraction, sublane layout (approx math)."""
    ent = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    maxv = cdf[15:16, :]
    rescaled = (slot * maxv) >> 15
    below = ((cdf <= rescaled) & (ent < 15)).astype(jnp.int32)
    sym = jnp.sum(below, axis=0, keepdims=True)
    c_sym = jnp.sum(jnp.where(ent == sym, cdf, 0), axis=0, keepdims=True)
    c_prev = jnp.sum(jnp.where(ent == sym - 1, cdf, 0), axis=0, keepdims=True)
    # exact-div stand-in (cost-representative)
    rec = pl.reciprocal(maxv.astype(jnp.float32), approx=False)
    r_sym = (c_sym.astype(jnp.float32) * rec).astype(jnp.int32)
    r_prev = (c_prev.astype(jnp.float32) * rec).astype(jnp.int32)
    return sym, r_prev + 1, jnp.maximum(r_sym - r_prev, 1)


def kernel(words_ref, thi_ref, tlo_ref, tcmd_ref, out_ref, st_ref, buf_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        st_ref[:] = jnp.abs(words_ref[0:8, :]) % 1000
        buf_ref[:] = words_ref[0:BUFD, :]

    def step(t, acc):
        s0 = st_ref[0:1, :]
        ihi = s0 % T_HI
        icm1 = (s0 * 7 + acc) % T_CM1
        ilo = (s0 * 13) % T_LO
        icm2 = (s0 * 5 + t) % T_CM2
        icmd = (s0 * 3) % T_CMD

        r_hi = fetch(thi_ref, 0, T_HI, ihi)
        r_cm1 = fetch(thi_ref, 16 * T_HI, T_CM1, icm1)
        r_lo = fetch(tlo_ref, 0, T_LO, ilo)
        r_cm2 = fetch(tlo_ref, 16 * T_LO, T_CM2, icm2)
        r_cmd = fetch(tcmd_ref, 0, T_CMD, icmd)

        # two coded nibbles (hi with mix-average-ish, lo)
        mixed = ((r_hi * 3 + r_cm1 * 5 + 1) >> 3) + ((r_lo ^ r_cm2) & 3)
        st1 = st_ref[1:2, :]
        sym1, s_a, f_a = sym_search(mixed, st1 & 0x7FFF)
        st1 = f_a * (st1 >> 15) + (st1 & 0x7FFF) - s_a
        sym2, s_b, f_b = sym_search(r_lo + (r_cmd & 7), jnp.abs(st1) & 0x7FFF)
        st1 = f_b * (jnp.abs(st1) >> 15) + (jnp.abs(st1) & 0x7FFF) - s_b
        st_ref[1:2, :] = jnp.abs(st1) % (1 << 30) + 1

        # stream pull from 64-deep buffer: select-scan over 8-slices
        cursor = st_ref[2:3, :]
        off = cursor & (BUFD - 1)
        w = jnp.zeros((1, 128), jnp.int32)
        for k8 in range(BUFD // 8):
            sl = buf_ref[8 * k8:8 * k8 + 8, :]
            g8 = jnp.take_along_axis(
                sl, jnp.broadcast_to(jnp.clip(off - 8 * k8, 0, 7), (8, 128)),
                axis=0)
            w = jnp.where((off >> 3) == k8, g8[0:1, :], w)
        pull = (sym1 ^ sym2) & 1
        st_ref[2:3, :] = cursor + pull

        # FSM-ish transition ops (~60 extra vector ops on [1,128])
        x = s0
        for i in range(20):
            x = jnp.where((x & 3) == i % 4, x + sym1, x ^ sym2)
        st_ref[0:1, :] = (x + w) % 997
        return acc + 1

    final = jax.lax.fori_loop(0, S, step, jnp.int32(0))
    out_ref[:] = st_ref[:] + final


def main():
    rng = np.random.default_rng(2)
    words = rng.integers(0, 1 << 15, size=(4096, 128)).astype(np.int32)
    thi = rng.integers(1, 1 << 15,
                       size=(16 * (T_HI + T_CM1), 128)).astype(np.int32)
    tlo = rng.integers(1, 1 << 15,
                       size=(16 * (T_LO + T_CM2), 128)).astype(np.int32)
    tcmd = rng.integers(1, 1 << 15, size=(16 * T_CMD, 128)).astype(np.int32)

    f = pl.pallas_call(
        kernel,
        grid=(NCHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((BUFD, 128), jnp.int32),
        ],
        interpret=INTERP,
    )
    args = tuple(map(jnp.asarray, (words, thi, tlo, tcmd)))
    t0 = time.perf_counter()
    out = np.asarray(f(*args))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s; out[0,:3]={out[0,:3]}")

    if TIME and ON_TPU:
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(*args)
            _ = np.asarray(jnp.sum(r))
            dt = time.perf_counter() - t0
        steps = NCHUNK * S
        ln = dt / steps
        print(f"L=128: {dt*1e3:.1f} ms / {steps} steps = {ln*1e9:.0f} ns/step"
              f"; if 1.85 nib/lane/step: "
              f"{128 * 1.85 / 2.2 / ln / 1e6:.1f} MB/s raw-byte rate")


if __name__ == "__main__":
    main()
