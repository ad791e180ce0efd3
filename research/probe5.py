import sys, time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU
V, SM = pltpu.VMEM, pltpu.SMEM

def timeit(f, *a, reps=3):
    r = f(*a); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps): np.asarray(jnp.sum(f(*a)))
    return (time.perf_counter()-t0)/reps

N = 16384  # iterations

# T1: round-1 style: 2D dynamic-row RMW chain [R, 128]
def t1(o_ref, s):
    def body(i, j):
        row = s[j]
        s[j] = row + 1
        return (j + i) % 512
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(t1, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)], interpret=INTERP)
if ON_TPU:
    dt = timeit(f)
    print(f"T1 2D row RMW chain: {dt/N*1e9:.1f} ns/iter")

# T2: 2D dynamic-row READ-only chain, narrow row [R, 16]... use [512,16]? min tile lane=128
def t2(o_ref, s):
    def body(i, j):
        row = s[j]                    # [128]
        return (j + i) % 512          # no data dep on row
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(t2, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)], interpret=INTERP)
if ON_TPU:
    dt = timeit(f)
    print(f"T2 2D row read (dead) chain: {dt/N*1e9:.1f} ns/iter")

# T3: 3D row read chain m[l, j, :] on [64, 512, 16]
def t3(o_ref, s):
    def body(i, j):
        row = s[i % 64, j, :]          # [16]
        return (j + jnp.sum(row) * 0 + i) % 512
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(t3, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((64, 512, 16), jnp.int32)], interpret=INTERP)
if ON_TPU:
    dt = timeit(f)
    print(f"T3 3D [l,j,:16] read+sum chain: {dt/N*1e9:.1f} ns/iter")

# T4: reduce-extract chain: jl = sum(where(lane==l, v, 0))
def t4(x_ref, o_ref):
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    def body(i, j):
        jl = jnp.sum(jnp.where(lane_i == (i % 64), x_ref[:] + j, 0))
        return (j + jl) % 512
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(t4, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=V)],
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    dt = timeit(f, jnp.arange(128, dtype=jnp.int32).reshape(1,128))
    print(f"T4 reduce-extract chain: {dt/N*1e9:.1f} ns/iter")

# T5: masked accumulate chain: acc = where(row16==l, row, acc)
def t5(o_ref, s):
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    def body(i, acc):
        row = s[i % 512].reshape(1, 128)[:, :16].reshape(16, 1)
        return jnp.where(row16 == (i % 64), row, acc)
    acc = jax.lax.fori_loop(0, N, body, jnp.zeros((16, 128), jnp.int32))
    o_ref[:] = acc[:1]
f = pl.pallas_call(t5, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)], interpret=INTERP)
if ON_TPU:
    dt = timeit(f)
    print(f"T5 row-read+mask-accum chain: {dt/N*1e9:.1f} ns/iter")

# T6: onehot gen only at [512, 2432] bf16
def t6(ids_ref, o_ref):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 2432), 1)
    oh = (row_iota == ids_ref[:].reshape(512, 1)).astype(jnp.bfloat16)
    o_ref[:] = jnp.sum(oh.astype(jnp.float32), axis=1, keepdims=True).astype(jnp.int32)
f = pl.pallas_call(t6, out_shape=jax.ShapeDtypeStruct((512,1), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=V)],
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    ids = (jnp.arange(512, dtype=jnp.int32)*13 % 2432).reshape(512, 1)
    dt = timeit(f, ids)
    print(f"T6 onehot-gen+rowsum [512,2432]: {dt*1e6:.1f} us/call")

# T7: matmul only: A [2432, 512] bf16 x B [512, 128] bf16 (pre-transposed oh shape)
def t7(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
f = pl.pallas_call(t7, out_shape=jax.ShapeDtypeStruct((2432,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=V)]*2,
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    a = jnp.ones((2432, 512), jnp.bfloat16); b2 = jnp.ones((512, 128), jnp.bfloat16)
    dt = timeit(f, a, b2)
    print(f"T7 matmul [2432,512]x[512,128]: {dt*1e6:.1f} us/call")

# T8: dot_general contracting dim0 with dim0 (the S3 form): oh [512,2432] x c [512,35]
def t8(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
f = pl.pallas_call(t8, out_shape=jax.ShapeDtypeStruct((2432,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=V)]*2,
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    a = jnp.ones((512, 2432), jnp.bfloat16); b2 = jnp.ones((512, 128), jnp.bfloat16)
    dt = timeit(f, a, b2)
    print(f"T8 dotT [512,2432]T x [512,128]: {dt*1e6:.1f} us/call")
