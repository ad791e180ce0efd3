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

# S1: vector write into SMEM scratch
def s1(x_ref, o_ref, sm):
    sm[0, :] = x_ref[0, :]
    o_ref[:] = jnp.full((8, 128), sm[0, 5], jnp.int32)
try:
    f = pl.pallas_call(s1, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V)],
        out_specs=pl.BlockSpec(memory_space=V),
        scratch_shapes=[pltpu.SMEM((1,128), jnp.int32)], interpret=INTERP)
    r = f(jnp.arange(128, dtype=jnp.int32).reshape(1,128))
    print("S1 vec->smem ok", np.asarray(r)[0,:2])
except Exception as e:
    print(f"S1 FAILED: {type(e).__name__}: {str(e)[:140]}")

# S2+S4: the fetch loop, v2: per-lane extract from vector + row read + accum
L, R, ITERS = 64, 2432, 256
def s4(m_ref, j0_ref, o_ref):
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, L), 1)
    def step(t, j):
        def fetch(l, acc):
            jl = jnp.sum(jnp.where(lane_i == l, j, 0))      # extract
            row = m_ref[l, jl, :].reshape(16, 1)
            return jnp.where(row16 == l, row, acc)
        acc = jax.lax.fori_loop(0, L, fetch, jnp.zeros((16, L), jnp.int32))
        return (j + acc[:1, :] + t) % R                      # chain
    j = jax.lax.fori_loop(0, ITERS, step, j0_ref[:])
    o_ref[:] = j
try:
    f = pl.pallas_call(s4, out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V)]*2,
        out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
    m = (jnp.arange(L*R*16, dtype=jnp.int32) % 7).reshape(L, R, 16)
    j0 = (jnp.arange(L, dtype=jnp.int32) * 31 % R).reshape(1, L)
    if ON_TPU:
        dt = timeit(f, m, j0)
        print(f"S4 fetch-loop ok: {dt*1e6:.0f} us / {ITERS} steps x {L} lanes "
              f"= {dt/ITERS/L*1e9:.1f} ns/lane-fetch, {dt/ITERS*1e9:.0f} ns/step")
    else:
        np.asarray(f(m, j0)); print("S4 ok (interpret)")
except Exception as e:
    print(f"S4 FAILED: {type(e).__name__}: {str(e)[:140]}")

# S3: per-lane hist matmul with TRANSPOSED ids (row reads), timed
RB, SB, CB = 2432, 512, 35
def s3(ids_ref, contrib_ref, o_ref):
    def lane(l, acc):
        ids = ids_ref[l, :]                          # [SB] row read
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, RB), 1)
        oh = (row_iota == ids.reshape(SB, 1)).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            oh, contrib_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        return acc + h
    o_ref[:] = jax.lax.fori_loop(
        0, L, lane, jnp.zeros((RB, CB), jnp.int32))
try:
    f = pl.pallas_call(s3, out_shape=jax.ShapeDtypeStruct((RB, CB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V)]*2,
        out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
    ids = (jnp.arange(L*SB, dtype=jnp.int32)*13 % RB).reshape(L, SB)
    contrib = (jnp.arange(SB*CB, dtype=jnp.int32) % 128).reshape(SB, CB)
    if ON_TPU:
        dt = timeit(f, ids, contrib)
        print(f"S3 hist ok: {dt*1e6:.0f} us / {L} lanes = {dt/L*1e6:.2f} us/lane; "
              f"amortized/step(S={SB//2}) {dt/(SB//2)*1e6:.2f} us")
    else:
        np.asarray(f(ids, contrib)); print("S3 ok (interpret)")
except Exception as e:
    print(f"S3 FAILED: {type(e).__name__}: {str(e)[:140]}")

# S5: 16-word block row read + staging update + 2-vreg gather extract
def s5(w_ref, blk_ref, pos_ref, o_ref, stag):
    # refill staging for lane 3 from block row, then all lanes extract pos&15
    row = w_ref[3, blk_ref[0], :].reshape(16, 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (16, L), 1)
    stag[:] = jnp.where(lane_i == 3, row, stag[:])
    p = pos_ref[:] & 15                                   # [1, L]
    pv = jnp.broadcast_to(p, (8, L))
    lo = jnp.take_along_axis(stag[0:8, :], pv & 7, axis=0)
    hi = jnp.take_along_axis(stag[8:16, :], pv & 7, axis=0)
    o_ref[:] = jnp.where(p >= 8, hi[0:1], lo[0:1])
try:
    f = pl.pallas_call(s5, out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V),
                  pl.BlockSpec(memory_space=SM),
                  pl.BlockSpec(memory_space=V)],
        out_specs=pl.BlockSpec(memory_space=V),
        scratch_shapes=[pltpu.VMEM((16, L), jnp.int32)], interpret=INTERP)
    w = jnp.arange(L*8*16, dtype=jnp.int32).reshape(L, 8, 16)
    blk = jnp.asarray([2], jnp.int32)
    pos = (jnp.arange(L, dtype=jnp.int32) % 16).reshape(1, L)
    r = np.asarray(f(w, blk, pos))
    # lane 3 extracts pos=3 -> w[3,2,3]
    print("S5 staging-pull ok", "CHECK-OK" if r[0,3] == 3*128+2*16+3 else f"CHECK={r[0,3]}")
except Exception as e:
    print(f"S5 FAILED: {type(e).__name__}: {str(e)[:140]}")
