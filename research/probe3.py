import sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
INTERP = not ON_TPU
V, S = pltpu.VMEM, pltpu.SMEM

def run(name, kernel, outs, ins, scratch=None, check=None):
    try:
        f = pl.pallas_call(kernel, out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=s_) for _, s_ in ins],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch or [], interpret=INTERP)
        r = f(*[a for a, _ in ins])
        extra = ""
        if check is not None:
            extra = "CHECK-OK" if check(np.asarray(r)) else "CHECK-MISMATCH!"
        print(f"{name} ok {extra}", np.asarray(r).reshape(-1)[:4])
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:150]}")

# R1: column read at scalar lane index from [S, L] log
def r1(x_ref, s_ref, o_ref):
    l = s_ref[0]
    col = x_ref[:, l]              # [256] column read
    o_ref[:] = jnp.broadcast_to(col.reshape(256, 1), (256, 8))
run("R1 column-read", r1, jax.ShapeDtypeStruct((256, 8), jnp.int32),
    [(jnp.arange(256*64, dtype=jnp.int32).reshape(256, 64), V),
     (jnp.asarray([5], jnp.int32), S)],
    check=lambda r: bool((r[:, 0] == np.arange(256)*64+5).all()))

# R2: in-kernel transpose [256, 64] -> [64, 256]
def r2(x_ref, o_ref):
    o_ref[:] = x_ref[:].T
run("R2 transpose", r2, jax.ShapeDtypeStruct((64, 256), jnp.int32),
    [(jnp.arange(256*64, dtype=jnp.int32).reshape(256, 64), V)],
    check=lambda r: bool((r == np.arange(256*64).reshape(256,64).T).all()))

# R3: roll with traced shift (copy alignment)
def r3(x_ref, s_ref, o_ref):
    sh = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], sh, 1)
run("R3 dyn-roll", r3, jax.ShapeDtypeStruct((8, 128), jnp.int32),
    [(jnp.arange(8*128, dtype=jnp.int32).reshape(8, 128), V),
     (jnp.asarray([5], jnp.int32), S)])

# R4: per-element variable shifts
def r4(x_ref, s_ref, o_ref):
    o_ref[:] = (x_ref[:] >> s_ref[:]) | (x_ref[:] << (s_ref[:] & 3))
run("R4 var-shift", r4, jax.ShapeDtypeStruct((8, 128), jnp.int32),
    [(jnp.arange(8*128, dtype=jnp.int32).reshape(8, 128), V),
     ((jnp.arange(8*128, dtype=jnp.int32) % 5).reshape(8, 128), V)])

# R5: per-lane hist matmul at REAL shape, timed: R=2384, S2=512, C=35
RB, SB, CB = 2384, 512, 35
def r5(ids_ref, contrib_ref, o_ref):
    def lane(l, _):
        ids = ids_ref[:, l]                          # [SB]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, RB), 1)
        oh = (row_iota == ids.reshape(SB, 1)).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            oh, contrib_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        o_ref[:] = jnp.where(l == 0, h, o_ref[:] + h)  # keep all lanes' work
        return 0
    jax.lax.fori_loop(0, 64, lane, 0)
def mk_r5():
    ids = (jnp.arange(SB*64, dtype=jnp.int32)*13 % RB).reshape(SB, 64)
    contrib = (jnp.arange(SB*CB, dtype=jnp.int32) % 128).reshape(SB, CB)
    f = pl.pallas_call(r5, out_shape=jax.ShapeDtypeStruct((RB, CB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=V)]*2,
        out_specs=pl.BlockSpec(memory_space=V), interpret=INTERP)
    import time
    r = f(ids, contrib); np.asarray(r)
    if ON_TPU:
        t0 = time.perf_counter()
        for _ in range(3): np.asarray(jnp.sum(f(ids, contrib)))
        dt = (time.perf_counter()-t0)/3
        print(f"R5 ok: 64-lane hist (S={SB}) {dt*1e6:.0f} us/call "
              f"= {dt/64*1e6:.2f} us/lane, per-step(S/2) {dt/ (SB//2)*1e6:.2f} us")
    else:
        print("R5 ok (interpret)")
try:
    mk_r5()
except Exception as e:
    print(f"R5 FAILED: {type(e).__name__}: {str(e)[:150]}")

# R6: masked byte-merge into packed staging row + dyn-row flush (window write path)
def r6(b_ref, s_ref, o_ref, cur):
    # write byte value 0xAB at byte-pos p for lane row 2, then flush
    cur[:] = jnp.zeros_like(cur)
    p = s_ref[0]
    wcol = (p >> 2) % 128
    sh = (p & 3) * 8
    colio = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lane_row = 2
    row = cur[lane_row, :].reshape(1, 128)
    merged = jnp.where(colio == wcol,
                       (row & ~(0xFF << sh)) | (0xAB << sh), row)
    cur[lane_row, :] = merged.reshape(128)
    r = s_ref[1]
    o_ref[r, :] = cur[lane_row, :]
run("R6 packed-byte-write", r6, jax.ShapeDtypeStruct((8, 128), jnp.int32),
    [(jnp.zeros((1, 128), jnp.int32), V), (jnp.asarray([13, 3], jnp.int32), S)],
    scratch=[pltpu.VMEM((8, 128), jnp.int32)],
    check=lambda r: r[3, 3] == (0xAB << 8))

# R7: scalar element read from 2D VMEM at two traced indices (stream word pull)
def r7(w_ref, s_ref, o_ref):
    l = s_ref[0]; p = s_ref[1]
    o_ref[:] = jnp.full((8, 128), w_ref[l, p], jnp.int32)
run("R7 scalar-2d-read", r7, jax.ShapeDtypeStruct((8, 128), jnp.int32),
    [(jnp.arange(64*32, dtype=jnp.int32).reshape(64, 32), V),
     (jnp.asarray([5, 7], jnp.int32), S)],
    check=lambda r: r[0,0] == 5*32+7)
