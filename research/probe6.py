import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ON_TPU = "--tpu" in sys.argv
if not ON_TPU: jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU
V, SM = pltpu.VMEM, pltpu.SMEM
def timeit(f, *a, reps=3):
    r = f(*a); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps): np.asarray(jnp.sum(f(*a)))
    return (time.perf_counter()-t0)/reps
N = 65536

# U1: row-read chain, & mask only
def u1(o_ref, s):
    def body(i, j):
        row = s[j]
        return (j + jnp.sum(row[:8]) ) & 511
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(u1, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)], interpret=INTERP)
if ON_TPU: print(f"U1 row-read chain (&): {timeit(f)/N*1e9:.1f} ns/iter")

# U2: row RMW chain, & mask
def u2(o_ref, s):
    def body(i, j):
        row = s[j]
        s[j] = row + 1
        return (j + i) & 511
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(u2, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V),
    scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)], interpret=INTERP)
if ON_TPU: print(f"U2 row RMW chain (&): {timeit(f)/N*1e9:.1f} ns/iter")

# U3: scalar % chain (suspected slow)
def u3(o_ref):
    def body(i, j):
        return (j + i) % 511
    j = jax.lax.fori_loop(0, N, body, 7)
    o_ref[:] = jnp.full((1, 128), j, jnp.int32)
f = pl.pallas_call(u3, out_shape=jax.ShapeDtypeStruct((1,128), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU: print(f"U3 scalar %511 chain: {timeit(f)/N*1e9:.1f} ns/iter")

# U4: onehot gen alone -> bf16 out [512, 2432]
def u4(ids_ref, o_ref):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 2432), 1)
    o_ref[:] = (row_iota == ids_ref[:].reshape(512, 1)).astype(jnp.bfloat16)
f = pl.pallas_call(u4, out_shape=jax.ShapeDtypeStruct((512,2432), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=V)],
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    ids = (jnp.arange(512, dtype=jnp.int32)*13 % 2432).reshape(512, 1)
    print(f"U4 onehot gen [512,2432]: {(timeit(f, ids)-0.030)*1e6:.1f} us (minus dispatch)")

# U5: dotT with N=35 vs N=128
for NN in (35, 64, 128):
    def u5(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    f = pl.pallas_call(u5, out_shape=jax.ShapeDtypeStruct((2432,NN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=V)]*2,
        out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
    if ON_TPU:
        a = jnp.ones((512, 2432), jnp.bfloat16); b2 = jnp.ones((512, NN), jnp.bfloat16)
        print(f"U5 dotT N={NN}: {(timeit(f, a, b2)-0.030)*1e6:.1f} us (minus dispatch)")

# U6: 8 lanes of full hist iteration: gen + dotT N=128 (bf16 contrib prepadded)
def u6(ids_ref, contrib_ref, o_ref):
    def lane(l, acc):
        ids = ids_ref[l, :]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 2432), 1)
        oh = (row_iota == ids.reshape(512, 1)).astype(jnp.bfloat16)
        h = jax.lax.dot_general(oh, contrib_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + h
    o_ref[:] = jax.lax.fori_loop(0, 8, lane, jnp.zeros((2432,128), jnp.float32))
f = pl.pallas_call(u6, out_shape=jax.ShapeDtypeStruct((2432,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=V)]*2,
    out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
if ON_TPU:
    ids = (jnp.arange(8*512, dtype=jnp.int32)*13 % 2432).reshape(8, 512)
    c = jnp.ones((512, 128), jnp.bfloat16)
    dt = timeit(f, ids, c) - 0.030
    print(f"U6 8-lane hist(gen+dotT): {dt*1e6:.1f} us -> {dt/8*1e6:.2f} us/lane")
