"""Structure spike for the deferred Pallas decode kernel (r2).

One kernel exercising EVERY primitive the planned decode mega-kernel
relies on, checked bit-exactly against a numpy twin, then timed on chip:

  A. strided pltpu.roll (row-dependent rotate, stride=+1) -> grouped ->
     compact lane plane (for log stores).
  B. per-lane scalar loop: packed scalar read from a grouped VMEM scratch
     plane at (g, 16*cb), dynamic model row read, lane-masked vector
     assemble, scalar element write back at (g, 16*cb) + seg-broadcast.
  C. dynamic-row log plane store  log_ref[t] = compact  (t = fori var).
  D. inner fori over S steps inside a grid step; state carried in VMEM.
  E. per-lane scalar conditional (pl.when on a scalar read) guarding a
     scalar RMW (the copy-move / window write pattern).
  F. packed-window byte RMW: read int32 word, merge byte, write back.

Run:  python research/probe_decode_spike.py          # interpret (CPU)
      python research/probe_decode_spike.py --tpu    # real chip, tiny
      python research/probe_decode_spike.py --tpu --time  # per-step cost
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
ABL = set(a[6:] for a in sys.argv if a.startswith("--abl-"))  # pk,model,words,win,log,compact
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU

G = 2 if not TIME else 4      # groups (L = 8*G lanes)
R = 64           # model rows per group
S = 16 if not TIME else 256   # inner fori steps per grid step
NCHUNK = 2 if not TIME else 64

L = 8 * G
SEG = 16


def lane_col(l):
    """Compact-plane column of lane l = (g = l // 8, cb = l % 8)."""
    return 16 * (l % 8) + l // 8


def compact(x):
    """grouped-replicated [G,128] -> [1,128] with lane l at col lane_col."""
    ent = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) & 15
    x0 = jnp.where(ent == 0, x, 0)
    rolled = pltpu.roll(x0, shift=0, axis=1, stride=1, stride_axis=0)
    return jnp.sum(rolled, axis=0, keepdims=True)


def seg_bcast0(x):
    """Replicate each 16-col block's entry 0 across its block."""
    ent = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) & 15
    out = jnp.where(ent == 0, x, 0)
    for k in (1, 2, 4, 8):
        shifted = pltpu.roll(out, shift=k, axis=1)
        out = jnp.where((ent >= k) & (ent < 2 * k), shifted, out)
    return out


def kernel(words_ref, model_ref, out_ref, log_ref, st_ref, win_ref,
           pk_ref, res_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        st_ref[:] = jnp.zeros_like(st_ref)
        win_ref[:] = jnp.zeros_like(win_ref)

    def step(t, carry):
        acc = carry
        # per-lane "row index" = some data-dependent junk
        flat = (st_ref[0:G, :] + acc) % R
        cursor = (st_ref[G:2 * G, :] + t) % 64
        # pack (flat 13b | cursor 14b<<13 | flag) into one grouped plane
        packed = flat | (cursor << 13)
        pk_ref[:] = packed

        # --- per-lane scalar loop: scalar READS + vector masked assembly
        # (scalar element stores to VMEM do not lower; persisted per-lane
        # writes go through masked [1,128] row RMWs instead)
        ent1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        plane_rows = []
        plane_words = []
        for g in range(G):
            row_acc = jnp.zeros((1, 128), jnp.int32)
            w_acc = jnp.zeros((1, 128), jnp.int32)
            for cb in range(8):
                if "pk" in ABL:
                    pk, j, cur = jnp.int32(0), jnp.int32(g + cb), jnp.int32(cb)
                else:
                    pk = pk_ref[g, 16 * cb]
                    j = pk & 0x1FFF
                    cur = (pk >> 13) & 0x3FFF
                m = (ent1 >= 16 * cb) & (ent1 < 16 * cb + 16)
                if "model" not in ABL:
                    row = model_ref[g * R + j, :].reshape(1, 128)
                    row_acc = jnp.where(m, row, row_acc)
                # stream word read, assembled replicated into the block
                if "words" not in ABL:
                    w = words_ref[cur, lane_col(8 * g + cb)]
                    w_acc = jnp.where(m, w, w_acc)
                # E: scalar-conditional masked row RMW (window write pattern)
                @pl.when(((pk & 1) == 1) & jnp.bool_("win" not in ABL))
                def _():
                    old = win_ref[g, :].reshape(1, 128)
                    new = jnp.where(ent1 == 16 * cb,
                                    (old & ~0xFF) | (j & 0xFF), old)
                    win_ref[g, :] = new[0, :]
            plane_rows.append(row_acc)
            plane_words.append(w_acc)
        rows = jnp.concatenate(plane_rows, axis=0)       # [G, 128] fetched
        wvec = jnp.concatenate(plane_words, axis=0)      # [G, 128] replicated

        # C: dynamic-row log store of the compact plane
        if "log" not in ABL:
            log_ref[t, :] = compact(packed)[0, :]
        else:
            log_ref[0, :] = packed[0, :]

        # advance state
        st_ref[0:G, :] = st_ref[0:G, :] + (rows & 7) + (wvec & 3)
        st_ref[G:2 * G, :] = st_ref[G:2 * G, :] + 1
        return acc + 1

    final = jax.lax.fori_loop(0, S, step, jnp.int32(0))

    # while_loop smoke: count down
    def cond(c):
        return c[0] > 0

    def body(c):
        return (c[0] - 1, c[1] + st_ref[0:G, :])

    n, tot = jax.lax.while_loop(cond, body, (jnp.int32(3),
                                             jnp.zeros((G, 128), jnp.int32)))
    out_ref[0:G, :] = tot + final
    out_ref[G:2 * G, :] = win_ref[0:G, :]


def np_twin(words, model):
    st = np.zeros((2 * G, 128), np.int64)
    win = np.zeros((G, 128), np.int64)
    logs = []
    for k in range(NCHUNK):
        for t in range(S):
            flat = (st[0:G, :] + t) % R   # acc == t within each grid step
            cursor = (st[G:2 * G, :] + t) % 64
            packed = flat | (cursor << 13)
            cpack = np.zeros(128, np.int64)
            rows = np.zeros((G, 128), np.int64)
            wvec = np.zeros((G, 128), np.int64)
            for l in range(L):
                g, cb = l // 8, l % 8
                pk = packed[g, 16 * cb]
                cpack[lane_col(l)] = pk
                j = pk & 0x1FFF
                cur = (pk >> 13) & 0x3FFF
                rows[g, 16 * cb:16 * cb + 16] = model[g * R + j,
                                                      16 * cb:16 * cb + 16]
                wvec[g, 16 * cb:16 * cb + 16] = words[cur, lane_col(l)]
                if pk & 1:
                    win[g, 16 * cb] = (win[g, 16 * cb] & ~0xFF) | (j & 0xFF)
            logs.append(cpack.copy())
            st[0:G, :] += (rows & 7) + (wvec & 3)
            st[G:2 * G, :] += 1
    out = 3 * st[0:G, :] + S
    return out, np.stack(logs[-S:]), win


def main():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 16, size=(64, 128)).astype(np.int32)
    model = rng.integers(0, 1 << 15, size=(G * R, 128)).astype(np.int32)

    f = pl.pallas_call(
        kernel,
        grid=(NCHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((2 * G, 128), jnp.int32),
                   jax.ShapeDtypeStruct((S, 128), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2 * G, 128), jnp.int32),   # st
            pltpu.VMEM((G, 128), jnp.int32),       # win
            pltpu.VMEM((G, 128), jnp.int32),       # pk (packed scalars)
            pltpu.VMEM((G, 128), jnp.int32),       # res (scalar results)
        ],
        interpret=INTERP,
    )
    t0 = time.perf_counter()
    out, log = f(jnp.asarray(words), jnp.asarray(model))
    out = np.asarray(out)
    log = np.asarray(log)
    compile_s = time.perf_counter() - t0
    print(f"compile+run: {compile_s:.1f}s")

    wout, wlog, wwin = np_twin(words, model)
    cols = [lane_col(l) for l in range(L)]
    ok_out = np.array_equal(out[0:G, :].astype(np.int64), wout)
    ok_win = np.array_equal(out[G:2 * G, :].astype(np.int64), wwin)
    ok_log = np.array_equal(log.astype(np.int64)[:, cols], wlog[:, cols])
    print("out match:", ok_out, " win match:", ok_win, " log match:", ok_log)
    if not ok_out:
        bad = np.argwhere(out[0:G, :].astype(np.int64) != wout)
        print("first mismatches:", bad[:5],
              out[0:G, :][tuple(bad[0])], wout[tuple(bad[0])])

    if TIME and ON_TPU:
        for _ in range(2):
            t0 = time.perf_counter()
            r = f(jnp.asarray(words), jnp.asarray(model))
            _ = np.asarray(jnp.sum(r[0]))
            dt = time.perf_counter() - t0
        steps = NCHUNK * S
        print(f"total {dt*1e3:.2f} ms, {steps} steps, L={L}: "
              f"{dt/steps*1e9:.0f} ns/step, "
              f"{dt/steps/L*1e9:.1f} ns/lane-step")


if __name__ == "__main__":
    main()
