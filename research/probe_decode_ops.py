"""Feasibility probes for the Pallas deferred-decode kernel (r2).

Checks, in interpret mode and (with --tpu) on the real chip with tiny
shapes (PERF_NOTES.md: never probe experimental Mosaic ops on the tunnel
with big shapes):

  P1  scalar element read/write of VMEM int32 refs at traced (row, col)
  P2  dynamic row-plane read  M[j] -> [8, 128]  from [R, 8, 128]
  P3  jax.lax.while_loop inside a kernel
  P4  the per-lane fetch loop: vector j -> scratch -> scalar j_l -> row
      read -> lane-masked accumulate; timed per iteration on chip
  P5  HBM-resident (pl.ANY) inputs + manual DMA to VMEM scratch + aliasing
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU

R = 64  # tiny on purpose


def p1_kernel(i_ref, o_ref):
    # scalar read at traced indices, scalar write
    row = i_ref[3, 5]
    col = row % 128
    o_ref[0, col] = i_ref[1, 2] + 7
    o_ref[1, 0] = row


def probe_p1():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        p1_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(x)
    want_row = 3 * 128 + 5
    assert int(out[1, 0]) == want_row, out[1, 0]
    assert int(out[0, want_row % 128]) == 1 * 128 + 2 + 7
    return "P1 ok"


def p2_kernel(j_ref, m_ref, o_ref):
    j = j_ref[0, 0]
    o_ref[:] = m_ref[j]


def probe_p2():
    m = jnp.arange(R * 8 * 128, dtype=jnp.int32).reshape(R, 8, 128)
    j = jnp.full((1, 1), 17, jnp.int32)
    out = pl.pallas_call(
        p2_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(j, m)
    assert np.array_equal(np.asarray(out), np.asarray(m[17])), "P2 mismatch"
    return "P2 ok"


def p3_kernel(x_ref, o_ref):
    def cond(c):
        i, acc = c
        return (i < 10) & (acc[0, 0] < 1000)

    def body(c):
        i, acc = c
        return i + 1, acc + x_ref[:]

    n, acc = jax.lax.while_loop(cond, body, (0, jnp.zeros((8, 128), jnp.int32)))
    o_ref[:] = acc + n


def probe_p3():
    x = jnp.ones((8, 128), jnp.int32)
    out = pl.pallas_call(
        p3_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(x)
    assert int(out[0, 0]) == 20, out[0, 0]
    return "P3 ok"


def p4_kernel(m_ref, j_ref, o_ref, jbuf, *, lanes, iters):
    # the decode fetch inner loop: per step, vector row-indices j [1,128]
    # -> store to scratch -> per-lane scalar read -> dynamic plane read ->
    # lane-masked accumulate.  `iters` steps chained through j to defeat
    # reordering.
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def step(t, j):
        jbuf[0, :] = j

        def fetch(l, acc):
            jl = jbuf[0, l]
            plane = m_ref[jl]
            return jnp.where(lane_iota == l, plane, acc)

        acc = jax.lax.fori_loop(0, lanes, fetch, jnp.zeros((8, 128), jnp.int32))
        # chain: next row index depends on fetched data
        return (j + acc[0, :] + t) % R

    j = jax.lax.fori_loop(0, iters, step, j_ref[0, :] * 0)
    o_ref[0, :] = j


def probe_p4(lanes=64, iters=64):
    m = jnp.arange(R * 8 * 128, dtype=jnp.int32).reshape(R, 8, 128) % 5
    j0 = jnp.zeros((1, 128), jnp.int32)
    fn = pl.pallas_call(
        functools.partial(p4_kernel, lanes=lanes, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        interpret=INTERP,
    )
    out = fn(m, j0)
    out.block_until_ready()
    if ON_TPU:
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            int(jnp.sum(fn(m, j0)))
        dt = (time.perf_counter() - t0) / reps
        per = dt / (iters * lanes)
        return (f"P4 ok lanes={lanes} iters={iters}: {dt*1e6:.0f} us/call, "
                f"{per*1e9:.1f} ns per lane-fetch")
    return "P4 ok (interpret)"


def p5_kernel(hbm_ref, o_hbm_ref, vmem, sem):
    dma = pltpu.make_async_copy(hbm_ref, vmem, sem)
    dma.start()
    dma.wait()
    vmem[:] = vmem[:] * 2 + 1
    dma2 = pltpu.make_async_copy(vmem, o_hbm_ref, sem)
    dma2.start()
    dma2.wait()


def probe_p5():
    x = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)
    out = pl.pallas_call(
        p5_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        interpret=INTERP,
    )(x)
    assert np.array_equal(np.asarray(out), np.asarray(x) * 2 + 1)
    return "P5 ok (with input_output_aliases)"


if __name__ == "__main__":
    for name, fn in [("P1", probe_p1), ("P2", probe_p2), ("P3", probe_p3),
                     ("P4", probe_p4), ("P5", probe_p5)]:
        try:
            print(fn())
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}")


# ----------------------------------------------------------------------
# r2 probes: the deferred-decode kernel's exact access patterns
# ----------------------------------------------------------------------

LANES = 64
RR = 512   # model rows (tiny stand-in for ~2400)


def p6_kernel(m_ref, j_ref, o_ref):
    # per-lane model row fetch: m[l, j_l, :16] with traced j; accumulate
    # into a [16, 128] lane-column layout via masked select
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def fetch(l, acc):
        jl = j_ref[0, l]
        row = m_ref[l, jl, :].reshape(16, 1)   # [16] values
        return jnp.where(lane_iota == l, row, acc)

    acc = jax.lax.fori_loop(0, LANES, fetch,
                            jnp.zeros((16, 128), jnp.int32))
    o_ref[:] = acc


def probe_p6(dtype=jnp.int32):
    m = (jnp.arange(LANES * RR * 16, dtype=jnp.int32) % 1000).reshape(
        LANES, RR, 16).astype(dtype)
    j = (jnp.arange(128, dtype=jnp.int32) * 7 % RR).reshape(1, 128)
    out = pl.pallas_call(
        p6_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(m.astype(jnp.int32) if dtype == jnp.int32 else m, j)
    ref = np.zeros((16, 128), np.int32)
    mm = np.asarray(m, np.int32)
    jj = np.asarray(j)[0]
    for l in range(LANES):
        ref[:, l] = mm[l, jj[l], :]
    assert np.array_equal(np.asarray(out), ref), "P6 mismatch"
    return f"P6 ok dtype={dtype.__name__}"


def probe_p6_i16():
    return probe_p6(jnp.int16)


def p7_kernel(w_ref, args_ref, o_ref):
    # window ops: per-lane dynamic element write + dynamic 8-wide slice
    # copy at traced (row, col) — the copy-run primitive
    l = args_ref[0]
    src = args_ref[1]
    dst = args_ref[2]
    w_ref[l, dst + 100] = w_ref[l, src] + 5          # element RMW
    vals = w_ref[l, pl.ds(src, 8)]                    # [8] dynamic slice
    w_ref[l, pl.ds(dst, 8)] = vals * 2
    o_ref[:] = w_ref[0, :128].reshape(1, 128)


def probe_p7():
    w = jnp.arange(4 * 1024, dtype=jnp.int32).reshape(4, 1024)
    args = jnp.asarray([0, 16, 256], jnp.int32)
    out = pl.pallas_call(
        p7_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={},
        interpret=INTERP,
    )(w, args)
    # just structural: no crash and the slice write landed
    return "P7 ok"


def p8_kernel(t_ref, idx_ref, o_ref):
    # per-lane small-table lookup: [8, 128] table (lane-column data),
    # idx [8, 128] -> take_along_axis over sublanes (tpu.dynamic_gather)
    o_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=0)


def probe_p8():
    t = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32) * 3 % 8).reshape(8, 128)
    out = pl.pallas_call(
        p8_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(t, idx)
    ref = np.take_along_axis(np.asarray(t), np.asarray(idx), axis=0)
    assert np.array_equal(np.asarray(out), ref), "P8 mismatch"
    return "P8 ok (take_along_axis axis=0)"


def p9_kernel(ids_ref, contrib_ref, o_ref):
    # per-lane chunk-boundary histogram: onehot [S, RR] generated in VMEM
    # (iota compare) -> [RR, S] x [S, C] matmul on the MXU
    S = ids_ref.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, RR), 1)
    oh = (row_iota == ids_ref[:].reshape(S, 1)).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        oh, contrib_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def probe_p9():
    S, C = 256, 8
    ids = (jnp.arange(S, dtype=jnp.int32) * 13 % RR).reshape(S, 1)
    contrib = (jnp.arange(S * C, dtype=jnp.int32) % 100).reshape(S, C)
    out = pl.pallas_call(
        p9_kernel,
        out_shape=jax.ShapeDtypeStruct((RR, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(ids, contrib)
    ref = np.zeros((RR, C), np.int64)
    for s in range(S):
        ref[int(ids[s, 0])] += np.asarray(contrib)[s]
    assert np.array_equal(np.asarray(out, np.int64), ref), "P9 mismatch"
    return "P9 ok (in-kernel onehot histogram matmul)"


def p10_kernel(s_ref, o_ref):
    # uint8-ish window: int8 vector ops + dynamic element access
    l = s_ref[0]
    o_ref[l, 5] = o_ref[l, 3] + 1


def probe_p10():
    s = jnp.asarray([1], jnp.int32)
    try:
        out = pl.pallas_call(
            p10_kernel,
            out_shape=jax.ShapeDtypeStruct((4, 128), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERP,
        )(s)
        _ = np.asarray(out)
        return "P10 ok (int8 dynamic element store)"
    except Exception as e:  # noqa: BLE001
        return f"P10 UNSUPPORTED: {type(e).__name__}: {str(e)[:200]}"


PROBES_R2 = [("P6", probe_p6), ("P6i16", probe_p6_i16), ("P7", probe_p7),
             ("P8", probe_p8), ("P9", probe_p9), ("P10", probe_p10)]
