#!/usr/bin/env python3
"""Bit-exactness + speed probe: pallas_lit_pass vs model_pass_deferred_lit."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec import pallas_lit_pass as plp
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands

interpret = jax.default_backend() != "tpu"
CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
if interpret:
    data = data[:3 << 16]
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]
if not interpret:
    traces = traces * 88

_c, lit_ts, _m, _rc, r_lit = jax_engine.split_stream_traces(traces, layout)
assert jax_engine._lit_pass_usable(layout, lit_ts)
n_padded = jax_engine._padded_len(max(t.shape[0] for t in lit_ts), CHUNK)
print(f"B={len(lit_ts)} n_padded={n_padded} "
      f"nibs={sum(t.shape[0] for t in lit_ts)/1e6:.2f}M")

lit_pad = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=CHUNK))
assert lit_pad.shape[1] == n_padded, (lit_pad.shape, n_padded)
spd = jnp.asarray(jax_engine.lit_speeds_from_traces(lit_ts))

t0 = time.perf_counter()
res = plp.model_pass_lit_pallas(lit_ts, CHUNK, n_padded, interpret=interpret)
assert res is not None, "packing rejected"
ps, pf = np.asarray(res[0]), np.asarray(res[1])
print(f"pallas compile+run {time.perf_counter()-t0:.1f}s")

xs, xf = jax_engine.model_pass_deferred_lit(lit_pad, spd, r_lit, CHUNK)
xs, xf = np.asarray(xs), np.asarray(xf)

ok = True
for i, t in enumerate(lit_ts):
    n = t.shape[0]
    if not (ps[i, :n] == xs[i, :n]).all() or not (pf[i, :n] == xf[i, :n]).all():
        bad = np.nonzero((ps[i, :n] != xs[i, :n])
                         | (pf[i, :n] != xf[i, :n]))[0][:5]
        print(f"lane {i} MISMATCH at {bad}: "
              f"pallas {list(zip(ps[i, bad], pf[i, bad]))} "
              f"xla {list(zip(xs[i, bad], xf[i, bad]))}")
        ok = False
        break
print("bit-exact:", ok)

if not interpret and ok:
    nibs = sum(t.shape[0] for t in lit_ts)

    def timed(fn, n_iter=3):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n_iter):
            jax.block_until_ready(fn())
        return (time.perf_counter() - t0) / n_iter

    packed, spd_pl = plp.pack_lit_traces(lit_ts, n_padded, CHUNK)
    packed, spd_pl = jnp.asarray(packed), jnp.asarray(spd_pl)
    tp = timed(lambda: plp._lit_pass_call(packed, spd_pl, CHUNK, False))
    tx = timed(lambda: jax_engine.model_pass_deferred_lit(
        lit_pad, spd, r_lit, CHUNK))
    print(f"pallas {tp*1e3:.1f} ms ({nibs/tp/1e6:.1f} Mnib/s)  "
          f"xla {tx*1e3:.1f} ms ({nibs/tx/1e6:.1f} Mnib/s)")
