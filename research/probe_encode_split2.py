#!/usr/bin/env python3
"""Stage split of the bench encode step (Pallas cmd pass / lit pass /
ANS lanes) at the bench's exact batch config, scalar-synced."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.ans import pallas_kernels as pk
from divans_tpu.codec import deferred as deferred_mod
from divans_tpu.codec import pallas_cmd_pass as pcp
from divans_tpu.codec import pallas_lit_pass as plp

interpret = jax.default_backend() != "tpu"
CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]
reps = 88
traces = traces * reps
raw_bytes = sum(len(b) for b in blocks) * reps

cmd_ts, lit_ts, _m, r_cmd, r_lit = jax_engine.split_stream_traces(traces,
                                                                  layout)
s_cmd = deferred_mod.cmd_chunk(CHUNK)
n_cmd_padded = jax_engine._padded_len(max(t.shape[0] for t in cmd_ts),
                                      max(s_cmd, 16))
cmd_packed = jnp.asarray(pcp.pack_cmd_traces(cmd_ts, n_cmd_padded, s_cmd))
n_lit_padded = max(jax_engine._padded_len(
    max(t.shape[0] for t in lit_ts), CHUNK), CHUNK)
lit_res = plp.pack_lit_traces(lit_ts, n_lit_padded, CHUNK)
lit_packed = jnp.asarray(lit_res[0])
lit_spd_pl = jnp.asarray(lit_res[1])
cmd_counts = jnp.asarray(np.array([t.shape[0] for t in cmd_ts], np.int32))
lit_counts = jnp.asarray(np.array([t.shape[0] for t in lit_ts], np.int32))
cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
inc_bd, lim_bd = pcp.build_speed_planes(cspd[0], cspd[1], r_cmd)
inc_bd, lim_bd = jnp.asarray(inc_bd), jnp.asarray(lim_bd)
n_renorm = pcp.renorm_passes_bound(cspd[0], cspd[1], s_cmd)
if n_renorm is not None and n_renorm > 2:
    n_renorm = None
print('n_renorm', n_renorm)

cmd_nibs = sum(int(t.shape[0]) for t in cmd_ts)
lit_nibs = sum(int(t.shape[0]) for t in lit_ts)
print(f"B={len(traces)} raw={raw_bytes/1e6:.1f}MB cmd_nibs={cmd_nibs/1e6:.2f}M"
      f" lit_nibs={lit_nibs/1e6:.2f}M cmd_pad={tuple(cmd_packed.shape)}"
      f" lit_pad={tuple(lit_packed.shape)}", flush=True)


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


@jax.jit
def cmd_stage(cmd_packed):
    cs, cf = pcp._cmd_pass_call(cmd_packed, inc_bd, lim_bd, r_cmd, s_cmd,
                                interpret, n_renorm)
    return jnp.sum(cs) + jnp.sum(cf)


@jax.jit
def lit_stage(lit_packed, lit_spd_pl):
    ls, lf = plp._lit_pass_call(lit_packed, lit_spd_pl, CHUNK, interpret)
    return jnp.sum(ls) + jnp.sum(lf)


@jax.jit
def ans_stage(cmd_packed, lit_packed, lit_spd_pl, cmd_counts, lit_counts):
    cs, cf = pcp._cmd_pass_call(cmd_packed, inc_bd, lim_bd, r_cmd, s_cmd,
                                interpret, n_renorm)
    cs, cf = cs[:cmd_counts.shape[0]], cf[:cmd_counts.shape[0]]
    ls, lf = plp._lit_pass_call(lit_packed, lit_spd_pl, CHUNK, interpret)
    ls, lf = ls[:lit_counts.shape[0]], lf[:lit_counts.shape[0]]
    acc = jnp.int32(0)
    for st, fr, cnt in ((cs, cf, cmd_counts), (ls, lf, lit_counts)):
        words, flags, states = lanes_to_pallas(st, fr, cnt)
        acc = acc + (jnp.sum(states) + jnp.sum(flags.astype(jnp.int32))
                     + jnp.sum(words.astype(jnp.int32)))
    return acc


def timed(fn, *args, n_iter=3):
    int(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        int(fn(*args))
    return (time.perf_counter() - t0) / n_iter


t_cmd = timed(cmd_stage, cmd_packed)
t_lit = timed(lit_stage, lit_packed, lit_spd_pl)
t_all = timed(ans_stage, cmd_packed, lit_packed, lit_spd_pl, cmd_counts,
              lit_counts)
print(f"cmd pass  {t_cmd*1e3:8.1f} ms  {cmd_nibs/t_cmd/1e6:6.1f} Mnib/s")
print(f"lit pass  {t_lit*1e3:8.1f} ms  {lit_nibs/t_lit/1e6:6.1f} Mnib/s")
print(f"full step {t_all*1e3:8.1f} ms  {raw_bytes/t_all/1e6:6.1f} MB/s "
      f"(ANS share ~{(t_all-t_cmd-t_lit)*1e3:.1f} ms)")
