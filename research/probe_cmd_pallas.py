"""On-chip parity + timing: pallas_cmd_pass vs model_pass_deferred_cmd
at the bench workload (B=264)."""
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
from divans_tpu.codec import pallas_cmd_pass as pcp
from divans_tpu.ir.matcher import build_commands

interpret = jax.default_backend() != "tpu"
print("backend", jax.default_backend(), flush=True)
CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 88
traces = traces * reps
raw_bytes = sum(len(b) for b in blocks) * reps

cmd_ts, _l, _m, r_cmd, _rl = jax_engine.split_stream_traces(traces, layout)
s_cmd = deferred_mod.cmd_chunk(CHUNK)
cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
inc_row, lim_row = cspd
n_padded = jax_engine._padded_len(max(t.shape[0] for t in cmd_ts), s_cmd)
n_cmd = sum(t.shape[0] for t in cmd_ts)
print(f"B={len(cmd_ts)} n_padded={n_padded} nibs={n_cmd/1e6:.2f}M", flush=True)

# parity vs the XLA pass (on-chip both)
cmd_pad = jnp.asarray(jax_engine._pad_traces(cmd_ts[:24], multiple=s_cmd))
st_ref, fr_ref = jax_engine.model_pass_deferred_cmd(
    cmd_pad, jnp.asarray(inc_row), jnp.asarray(lim_row), r_cmd, s_cmd)
st, fr = pcp.model_pass_cmd_pallas(cmd_ts[:24], inc_row, lim_row, r_cmd,
                                   s_cmd, cmd_pad.shape[1],
                                   interpret=interpret)
ok_s = np.array_equal(np.asarray(st_ref), np.asarray(st))
ok_f = np.array_equal(np.asarray(fr_ref), np.asarray(fr))
print("on-chip parity:", ok_s, ok_f, flush=True)
assert ok_s and ok_f

# timing: device-only (packed array pre-staged), B=264
packed = jnp.asarray(pcp.pack_cmd_traces(cmd_ts, n_padded, s_cmd))
r_padv = pcp._r_pad(r_cmd + 1)
kr = pcp.G * r_padv
inc = np.zeros(r_padv, np.int32)
lim = np.full(r_padv, 0x8000, np.int32)
inc[:r_cmd] = inc_row
lim[:r_cmd] = lim_row
inc_bd = jnp.asarray(np.broadcast_to(np.tile(inc, pcp.G)[:, None],
                                     (kr, 128)).copy())
lim_bd = jnp.asarray(np.broadcast_to(np.tile(lim, pcp.G)[:, None],
                                     (kr, 128)).copy())


@jax.jit
def run(packed):
    st, fr = pcp._cmd_pass_call(packed, inc_bd, lim_bd, r_cmd, s_cmd,
                                interpret)
    return jnp.sum(st) + jnp.sum(fr)


t0 = time.perf_counter()
int(run(packed))
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    int(run(packed))
    best = min(best, time.perf_counter() - t0)
print(f"pallas cmd pass {best*1e3:.1f} ms  "
      f"{n_cmd/best/1e6:.1f} Mnib/s  {raw_bytes/best/1e6:.1f} MB/s-of-raw",
      flush=True)

# XLA pass reference timing at same B
cmd_pad_full = jnp.asarray(jax_engine._pad_traces(cmd_ts, multiple=s_cmd))


@jax.jit
def run_xla(cmd_pad):
    st, fr = jax_engine.model_pass_deferred_cmd(
        cmd_pad, jnp.asarray(inc_row), jnp.asarray(lim_row), r_cmd, s_cmd)
    return jnp.sum(st) + jnp.sum(fr)


int(run_xla(cmd_pad_full))
best_x = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    int(run_xla(cmd_pad_full))
    best_x = min(best_x, time.perf_counter() - t0)
print(f"XLA cmd pass    {best_x*1e3:.1f} ms  -> speedup {best_x/best:.2f}x",
      flush=True)
