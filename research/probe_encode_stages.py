"""Per-component timing of the device encode step (bench.py workload):
cmd model pass vs lit model pass vs Pallas ANS lanes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec import deferred as deferred_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.ans import pallas_kernels as pk

interpret = jax.default_backend() != "tpu"
CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 22
traces = traces * reps
raw_bytes = sum(len(b) for b in blocks) * reps

cmd_ts, lit_ts, _m, r_cmd, r_lit = jax_engine.split_stream_traces(traces, layout)
s_cmd = deferred_mod.cmd_chunk(CHUNK)
cmd_pad = jnp.asarray(jax_engine._pad_traces(cmd_ts, multiple=s_cmd))
lit_pad = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=CHUNK))
lit_spd = jnp.asarray(jax_engine.lit_speeds_from_traces(lit_ts))
cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
cmd_inc, cmd_lim = jnp.asarray(cspd[0]), jnp.asarray(cspd[1])
cmd_counts = jnp.asarray(np.array([t.shape[0] for t in cmd_ts], np.int32))
lit_counts = jnp.asarray(np.array([t.shape[0] for t in lit_ts], np.int32))

n_cmd = int(sum(int(c) for c in np.asarray(cmd_counts)))
n_lit = int(sum(int(c) for c in np.asarray(lit_counts)))
print(f"B={len(traces)} raw={raw_bytes/1e6:.1f}MB cmd_nibs={n_cmd/1e6:.2f}M "
      f"lit_nibs={n_lit/1e6:.2f}M r_cmd={r_cmd} r_lit={r_lit}")
print(f"cmd_pad {cmd_pad.shape} lit_pad {lit_pad.shape} s_cmd={s_cmd}")

cmd_fn = jax.jit(lambda cp: jax_engine.model_pass_deferred_cmd(
    cp, cmd_inc, cmd_lim, r_cmd, s_cmd))
lit_fn = jax.jit(lambda lp, sp: jax_engine.model_pass_deferred_lit(
    lp, sp, r_lit, CHUNK))


def lanes_to_pallas(st, fr, counts):
    nlanes, n = st.shape
    g = -(-nlanes // 128)
    lpad = g * 128 - nlanes
    npad = -(-n // pk.BLOCK_T) * pk.BLOCK_T - n
    st = jnp.pad(st, ((0, lpad), (0, npad)))
    fr = jnp.pad(fr, ((0, lpad), (0, npad)), constant_values=1)
    cnt = jnp.pad(counts, ((0, lpad),))
    st = jnp.swapaxes(st, 0, 1).reshape(-1, g, 128)
    fr = jnp.swapaxes(fr, 0, 1).reshape(-1, g, 128)
    return pk.encode_lanes_pallas(st, fr, cnt.reshape(g, 128),
                                  interpret=interpret)


def timed(label, fn, *args, n_iter=3, per=None):
    r = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        best = min(best, time.perf_counter() - t0)
    rate = (per or raw_bytes) / best / 1e6
    print(f"{label:24s} {best*1e3:9.1f} ms  {rate:8.2f} "
          f"{'MB/s' if per is None else 'Mnib/s'}", flush=True)
    return r, best

(cs, cf), t_cmd = timed("cmd model pass", cmd_fn, cmd_pad)
(ls, lf), t_lit = timed("lit model pass", lit_fn, lit_pad, lit_spd)
_, t_anc = timed("ANS lanes (cmd)", lambda: lanes_to_pallas(cs, cf, cmd_counts))
_, t_anl = timed("ANS lanes (lit)", lambda: lanes_to_pallas(ls, lf, lit_counts))
tot = t_cmd + t_lit + t_anc + t_anl
print(f"{'sum':24s} {tot*1e3:9.1f} ms  {raw_bytes/tot/1e6:8.2f} MB/s")
print(f"cmd pass: {n_cmd/t_cmd/1e6:.1f} Mnib/s   lit pass: {n_lit/t_lit/1e6:.1f} Mnib/s")
