"""Ablate model_pass_deferred_cmd sub-stages on-chip: which of
fetch-matmul / count-histogram / apply_pend dominates the 1.0 s wall?"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec import deferred as deferred_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.probability import cdf16

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

cmd_ts, _l, _m, r_cmd, _rl = jax_engine.split_stream_traces(traces, layout)
s_cmd = deferred_mod.cmd_chunk(CHUNK)
cmd_pad = jnp.asarray(jax_engine._pad_traces(cmd_ts, multiple=s_cmd))
cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
inc_row, lim_row = jnp.asarray(cspd[0]), jnp.asarray(cspd[1])


def make_pass(do_fetch, do_hist, do_apply):
    r = r_cmd
    s = s_cmd
    cdf_init = jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int32))
    dn = (((1,), (1,)), ((0,), (0,)))

    @jax.jit
    def run(trace):
        b, n = trace.shape[:2]
        row_iota = jnp.arange(r, dtype=jnp.int32)[None, None, :]
        i16v = jnp.arange(16, dtype=jnp.int32)[None, None, :]
        committed0 = jnp.broadcast_to(cdf_init, (b, r, 16))
        weights0 = jax_engine._weights_init(b)
        pend0 = {
            "add": jnp.zeros((b, r, 16), jnp.int32),
            "limsum": jnp.zeros((b, r), jnp.int32),
            "cnt": jnp.zeros((b, r), jnp.int32),
            "wadj": jnp.zeros((b, 2, 2), jnp.int32),
        }

        def step(carry, xs):
            committed, weights, pend = carry
            flat = xs[:, :, 0]
            value = xs[:, :, 1]
            inc = xs[:, :, 3]
            act = inc != 0
            oh = ((row_iota == flat[:, :, None])
                  & act[:, :, None]).astype(jnp.bfloat16)
            if do_fetch:
                rows = jax_engine._onehot_mm_b(oh, committed)
                rows = jnp.where(act[:, :, None], rows, cdf_init)
                start, freq = cdf16.sym_to_start_freq(rows, value, xp=jnp)
            else:
                start = value
                freq = value + 1
            if do_hist:
                vh = (i16v == value[:, :, None]).astype(jnp.bfloat16)
                cnt = jax.lax.dot_general(
                    oh, vh, dn,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                tot = jnp.sum(cnt, axis=2)
                new_pend = {
                    "add": inc_row[None, :, None] * jnp.cumsum(cnt, axis=2),
                    "limsum": lim_row[None, :] * tot,
                    "cnt": tot,
                    "wadj": pend["wadj"],
                }
            else:
                new_pend = pend
            if do_apply:
                committed, weights = jax_engine._apply_pend(
                    committed, weights, pend)
            return (committed, weights, new_pend), (start, freq)

        xs = jnp.swapaxes(trace, 0, 1).reshape(n // s, s, b, 10)
        xs = jnp.swapaxes(xs, 1, 2)
        _, (st, fr) = jax.lax.scan(step, (committed0, weights0, pend0), xs)
        return jnp.sum(st) + jnp.sum(fr)

    return run


def timed(label, fn):
    int(fn(cmd_pad))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(fn(cmd_pad))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best*1e3:9.1f} ms", flush=True)


timed("full (fetch+hist+apply)", make_pass(1, 1, 1))
timed("no fetch", make_pass(0, 1, 1))
timed("no hist", make_pass(1, 0, 1))
timed("no apply", make_pass(1, 1, 0))
timed("fetch only", make_pass(1, 0, 0))
timed("hist only", make_pass(0, 1, 0))
timed("apply only", make_pass(0, 0, 1))
timed("nothing (trace stream only)", make_pass(0, 0, 0))
