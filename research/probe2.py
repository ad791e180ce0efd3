import sys, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU

def run(name, kernel, outs, ins, scratch=None, args=None):
    try:
        f = pl.pallas_call(kernel, out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=s) for _, s in ins],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch or [], interpret=INTERP)
        r = f(*[a for a, _ in ins])
        print(f"{name} ok", np.asarray(r).reshape(-1)[:6])
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}")

V, S = pltpu.VMEM, pltpu.SMEM

# Q1: scalar READ from VMEM (value used as row index)
def q1(x_ref, o_ref):
    j = x_ref[0, 3]                      # scalar read from VMEM
    o_ref[:] = jnp.full((8, 128), j, jnp.int32)
run("Q1 scalar-read-vmem", q1, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V)])

# Q2a: 8-wide dynamic slice write to VMEM row
def q2a(x_ref, s_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    d = s_ref[0]
    o_ref[2, pl.ds(d, 8)] = x_ref[0, :8] * 2
run("Q2a slice8-write", q2a, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V),
     (jnp.asarray([40], jnp.int32), S)])

# Q2b: 1-wide dynamic slice write (the scalar-store workaround)
def q2b(x_ref, s_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    d = s_ref[0]
    o_ref[2, pl.ds(d, 1)] = x_ref[0, :1] + 7
run("Q2b slice1-write", q2b, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V),
     (jnp.asarray([40], jnp.int32), S)])

# Q2c: dynamic row index + dynamic col slice write
def q2c(x_ref, s_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    l = s_ref[0]; d = s_ref[1]
    o_ref[l, pl.ds(d, 8)] = x_ref[0, :8] + 1
run("Q2c dynrow-slice8-write", q2c, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V),
     (jnp.asarray([3, 40], jnp.int32), S)])

# Q3: vector (VMEM) -> SMEM via async copy
def q3(x_ref, o_ref, smem, sem):
    cp = pltpu.make_async_copy(x_ref, smem, sem)
    cp.start(); cp.wait()
    j = smem[0, 5]
    o_ref[:] = jnp.full((8, 128), j, jnp.int32)
run("Q3 vmem->smem dma", q3, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V)],
    scratch=[pltpu.SMEM((1,128), jnp.int32), pltpu.SemaphoreType.DMA])

# Q4: scalar read from VMEM scratch written by vector op (P4's pattern)
def q4(x_ref, o_ref, buf):
    buf[0, :] = x_ref[0, :] * 2
    j = buf[0, 5]
    o_ref[:] = jnp.full((8, 128), j, jnp.int32)
run("Q4 scalar-read-vmem-scratch", q4, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V)],
    scratch=[pltpu.VMEM((1,128), jnp.int32)])

# Q5: dynamic-index row write (vector row to traced row position)
def q5(x_ref, s_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    l = s_ref[0]
    o_ref[l, :] = x_ref[0, :] + 3
run("Q5 dynrow-full-write", q5, jax.ShapeDtypeStruct((8,128), jnp.int32),
    [(jnp.arange(128, dtype=jnp.int32).reshape(1,128), V),
     (jnp.asarray([3], jnp.int32), S)])

# Q6: 3D model fetch+writeback roundtrip m[l, j, :] read then write
def q6(m_ref, s_ref, o_ref):
    l = s_ref[0]; j = s_ref[1]
    row = m_ref[l, j, :]
    m_ref[l, j, :] = row * 2          # writeback (RMW) - needed for commit
    o_ref[:] = jnp.broadcast_to(m_ref[l, j, :].reshape(1, 16), (8, 16))
run("Q6 row-rmw", q6, jax.ShapeDtypeStruct((8,16), jnp.int32),
    [((jnp.arange(4*32*16, dtype=jnp.int32).reshape(4,32,16)), V),
     (jnp.asarray([1, 5], jnp.int32), S)])

# Q7: int8 VECTOR ops (full-tile) in VMEM (windows as int8, vector writes only)
def q7(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.int8(1)
run("Q7 int8-vector", q7, jax.ShapeDtypeStruct((32,128), jnp.int8),
    [(jnp.ones((32,128), jnp.int8), V)])

# Q8: dynamic slice write on int8 row
def q8(x_ref, s_ref, o_ref):
    o_ref[:] = x_ref[:]
    d = s_ref[0]
    o_ref[2, pl.ds(d, 32)] = x_ref[3, pl.ds(d, 32)]
run("Q8 int8-slice-write", q8, jax.ShapeDtypeStruct((32,256), jnp.int8),
    [(jnp.ones((32,256), jnp.int8), V), (jnp.asarray([64], jnp.int32), S)])
