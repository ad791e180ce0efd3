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
