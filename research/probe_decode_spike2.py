"""Spike v2: gather-centric decode step primitives (r2 decode kernel).

After spike v1 measured ~200ns per VMEM->SREG crossing (killing per-lane
scalar fetches), the decode kernel design moved to:

  * model fetch: jnp.take_along_axis over [8,128] slices of [rows,128]
    per-group tables (tpu.dynamic_gather; per-column sublane gather) —
    indices are the grouped-replicated per-lane values, zero crossings;
  * stream pulls: per-lane 64-deep word buffer [64,128] col-per-lane,
    gathered by (cursor - base); ONE lane refilled per step round-robin
    (1 crossing) via dynamic-slice row loads;
  * window writes: 64-byte per-lane accumulator plane, flushed via
    scalar-indexed row RMW (1 crossing per flush);
  * dynamic-shift pltpu.roll for copy byte alignment.

This spike runs a fake literal-byte step with the FULL fetch bundle
(64+64+128+128+256-row tables), 2 ANS-ish advances, a stream pull with
round-robin refill, and a window flush — bit-checked vs numpy, then
timed.  The measured ns/step bounds the real kernel's hot loop.

Run:  python research/probe_decode_spike2.py            # interpret
      python research/probe_decode_spike2.py --tpu
      python research/probe_decode_spike2.py --tpu --time [--g N]
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
G = int(sys.argv[sys.argv.index("--g") + 1]) if "--g" in sys.argv else \
    (8 if TIME else 2)
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU

S = 256 if TIME else 24        # steps per grid iteration
NCHUNK = 64 if TIME else 2
L = 8 * G
T_HI, T_CM1, T_LO, T_CM2, T_CMD = 64, 64, 128, 128, 256
TWORDS = 4096
BUFD = 64


def lane_col(l):
    return 16 * (l % 8) + l // 8


def gather_rows(table, idx):
    """table [rows,128] (rows<=256, mult of 8), idx [G,128] in [0,rows).

    Per-column gather: out[g, c] = table[idx[g, c], c]."""
    rows = table.shape[0]
    out = jnp.zeros((G, 128), jnp.int32)
    for k in range(rows // 8):
        sl = table[8 * k:8 * k + 8, :]
        sub = jnp.clip(idx - 8 * k, 0, 7)
        # gather [G,128] from [8,128] per column
        g8 = jnp.take_along_axis(sl, sub, axis=0)
        out = jnp.where((idx >> 3) == k, g8, out)
    return out


def kernel(words_ref, thi_ref, tlo_ref, tcmd_ref, out_ref, st_ref, buf_ref,
           win_ref, acc_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        st_ref[:] = jnp.zeros_like(st_ref)
        win_ref[:] = jnp.zeros_like(win_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        buf_ref[:] = words_ref[0:BUFD, :]

    def step(t, carry):
        acc, base_all = carry            # base_all: refill bookkeeping int32
        gstep = k * S + t

        # ---- fake per-lane indices (data-dependent-ish)
        s0 = st_ref[0:G, :]
        ihi = s0 % T_HI
        icm1 = (s0 * 7 + acc) % T_CM1
        ilo = (s0 * 13) % T_LO
        icm2 = (s0 * 5 + t) % T_CM2
        icmd = (s0 * 3) % T_CMD

        # ---- fetch bundle (the literal-byte worst case)
        r_hi = gather_rows(thi_ref[0:T_HI, :], ihi)
        r_cm1 = gather_rows(thi_ref[T_HI:T_HI + T_CM1, :], icm1)
        r_lo = gather_rows(tlo_ref[0:T_LO, :], ilo)
        r_cm2 = gather_rows(tlo_ref[T_LO:T_LO + T_CM2, :], icm2)
        r_cmd = gather_rows(tcmd_ref[:], icmd)

        # ---- stream pull: gather from the 64-deep buffer
        cursor = st_ref[G:2 * G, :]
        off = cursor & (BUFD - 1)
        w = jnp.zeros((G, 128), jnp.int32)
        for k8 in range(BUFD // 8):
            g8 = jnp.take_along_axis(buf_ref[8 * k8:8 * k8 + 8, :],
                                     jnp.clip(off - 8 * k8, 0, 7), axis=0)
            w = jnp.where((off >> 3) == k8, g8, w)
        pull = ((r_hi ^ r_lo) & 1) == 1
        cursor = cursor + pull.astype(jnp.int32)
        st_ref[G:2 * G, :] = cursor

        # ---- round-robin refill of ONE lane's buffer column block
        # (1 VMEM->SREG crossing: that lane's cursor)
        rl = gstep % L
        rg, rcb = rl // 8, rl % 8
        cur_l = st_ref[G + rg, 16 * rcb]          # crossing
        base = jnp.maximum(cur_l - 8, 0) & ~7     # realign behind cursor
        loaded = words_ref[pl.ds(base & (TWORDS - BUFD - 1), BUFD), :]
        ent = jax.lax.broadcasted_iota(jnp.int32, (BUFD, 128), 1)
        m = (ent >= 16 * rcb) & (ent < 16 * rcb + 16) & jnp.bool_(False)
        # (masked refill pattern; disabled semantics-wise so the numpy twin
        #  stays simple — cost is what we measure)
        buf_ref[:] = jnp.where(m, loaded, buf_ref[:])

        # ---- ANS-ish advances (vector int math)
        stv = st_ref[2 * G:3 * G, :]
        for _ in range(2):
            slot = stv & 0x7FFF
            stv = (r_hi & 0x7FFF) * (stv >> 15) + slot - (r_lo & 0x3FFF)
            stv = jnp.where(stv <= 0, 1, stv) & 0x3FFFFFFF
        st_ref[2 * G:3 * G, :] = stv

        # ---- window accumulator insert + occasional flush
        wpos = st_ref[3 * G:4 * G, :]
        byte = (r_cmd ^ r_cm1 ^ r_cm2) & 0xFF
        wordi = (wpos >> 2) & 15
        ent16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) & 15
        ins = jnp.where(ent16 == wordi, byte << ((wpos & 3) * 8), 0)
        acc_ref[:] = acc_ref[:] | ins
        wpos = wpos + 1
        st_ref[3 * G:4 * G, :] = wpos

        # flush lane rl's accumulator row-block when it crossed 64B
        wp_l = st_ref[3 * G + rg, 16 * rcb]       # crossing
        @pl.when((wp_l & 63) == 0)
        def _():
            wrow = (wp_l >> 6) & 31
            old = win_ref[wrow, :].reshape(1, 128)
            accrow = acc_ref[rg, :].reshape(1, 128)
            ent1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            m1 = (ent1 >= 16 * rcb) & (ent1 < 16 * rcb + 16)
            win_ref[wrow, :] = jnp.where(m1, accrow, old)[0, :]

        # ---- dynamic-shift roll (copy alignment pattern)
        sh = st_ref[0, 0] & 15                     # crossing (scalar shift)
        rolled = pltpu.roll(r_cmd, shift=sh, axis=1)

        st_ref[0:G, :] = (s0 + (r_hi & 3) + (rolled & 1) + w * 0) % 509
        return acc + 1, base_all

    final, _ = jax.lax.fori_loop(0, S, step, (jnp.int32(0), jnp.int32(0)))
    out_ref[0:G, :] = st_ref[0:G, :] + final
    out_ref[G:2 * G, :] = st_ref[2 * G:3 * G, :]


def np_twin(words, thi, tlo, tcmd):
    st = np.zeros((4 * G, 128), np.int64)
    buf = words[0:BUFD, :].astype(np.int64)
    accp = np.zeros((G, 128), np.int64)
    ent16 = np.arange(128) % 16

    def gat(tab, idx):
        out = np.zeros((G, 128), np.int64)
        for g in range(G):
            for c in range(128):
                out[g, c] = tab[idx[g, c], c]
        return out

    for kk in range(NCHUNK):
        acc = 0
        for t in range(S):
            s0 = st[0:G, :]
            r_hi = gat(thi[0:T_HI], s0 % T_HI)
            r_cm1 = gat(thi[T_HI:], (s0 * 7 + acc) % T_CM1)
            r_lo = gat(tlo[0:T_LO], (s0 * 13) % T_LO)
            r_cm2 = gat(tlo[T_LO:], (s0 * 5 + t) % T_CM2)
            r_cmd = gat(tcmd, (s0 * 3) % T_CMD)
            cursor = st[G:2 * G, :]
            off = cursor & (BUFD - 1)
            w = gat(buf, off)
            pull = ((r_hi ^ r_lo) & 1) == 1
            st[G:2 * G, :] = cursor + pull
            stv = st[2 * G:3 * G, :]
            for _ in range(2):
                slot = stv & 0x7FFF
                stv = (r_hi & 0x7FFF) * (stv >> 15) + slot - (r_lo & 0x3FFF)
                stv = np.where(stv <= 0, 1, stv) & 0x3FFFFFFF
            st[2 * G:3 * G, :] = stv
            wpos = st[3 * G:4 * G, :]
            byte = (r_cmd ^ r_cm1 ^ r_cm2) & 0xFF
            ins = np.where(ent16[None, :] == ((wpos >> 2) & 15),
                           byte << ((wpos & 3) * 8), 0)
            accp |= ins
            st[3 * G:4 * G, :] = wpos + 1
            sh = int(st[0, 0]) & 15
            rolled = np.roll(r_cmd, sh, axis=1)
            st[0:G, :] = (s0 + (r_hi & 3) + (rolled & 1)) % 509
            acc += 1
    return st[0:G, :] + S, st[2 * G:3 * G, :]


def main():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 1 << 16, size=(TWORDS, 128)).astype(np.int32)
    thi = rng.integers(0, 1 << 15, size=(T_HI + T_CM1, 128)).astype(np.int32)
    tlo = rng.integers(0, 1 << 15, size=(T_LO + T_CM2, 128)).astype(np.int32)
    tcmd = rng.integers(0, 1 << 15, size=(T_CMD, 128)).astype(np.int32)

    f = pl.pallas_call(
        kernel,
        grid=(NCHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * G, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((4 * G, 128), jnp.int32),    # st
            pltpu.VMEM((BUFD, 128), jnp.int32),     # stream buffer
            pltpu.VMEM((32, 128), jnp.int32),       # window
            pltpu.VMEM((G, 128), jnp.int32),        # accumulator
        ],
        interpret=INTERP,
    )
    t0 = time.perf_counter()
    out = np.asarray(f(*map(jnp.asarray, (words, thi, tlo, tcmd))))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")

    if not TIME:
        w0, w1 = np_twin(words.astype(np.int64), thi, tlo, tcmd)
        ok0 = np.array_equal(out[0:G].astype(np.int64), w0)
        ok1 = np.array_equal(out[G:2 * G].astype(np.int64), w1)
        print("state match:", ok0, " ans match:", ok1)
        if not (ok0 and ok1):
            bad = np.argwhere(out[0:G].astype(np.int64) != w0)
            print(bad[:4], out[0:G][tuple(bad[0])] if len(bad) else "",
                  w0[tuple(bad[0])] if len(bad) else "")

    if TIME and ON_TPU:
        args = tuple(map(jnp.asarray, (words, thi, tlo, tcmd)))
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(*args)
            _ = np.asarray(jnp.sum(r))
            dt = time.perf_counter() - t0
        steps = NCHUNK * S
        ln = dt / steps
        print(f"G={G} L={L}: total {dt*1e3:.1f} ms / {steps} steps = "
              f"{ln*1e9:.0f} ns/step; byte-rate if 1B/lane/step: "
              f"{L / ln / 1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
