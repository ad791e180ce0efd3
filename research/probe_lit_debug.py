#!/usr/bin/env python3
"""Diagnose pallas_lit_pass divergence: small lane set, chunk-resolved."""
import os
import sys

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

CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)][:1]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]

_c, lit_ts, _m, _rc, r_lit = jax_engine.split_stream_traces(traces, layout)
n_padded = jax_engine._padded_len(max(t.shape[0] for t in lit_ts), CHUNK)
lit_pad = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=CHUNK))
spd = jnp.asarray(jax_engine.lit_speeds_from_traces(lit_ts))

res = plp.model_pass_lit_pallas(lit_ts, CHUNK, n_padded)
ps, pf = np.asarray(res[0]), np.asarray(res[1])
xs, xf = jax_engine.model_pass_deferred_lit(lit_pad, spd, r_lit, CHUNK)
xs, xf = np.asarray(xs), np.asarray(xf)

t = lit_ts[0]
n = t.shape[0]
bad = np.nonzero((ps[0, :n] != xs[0, :n]) | (pf[0, :n] != xf[0, :n]))[0]
print(f"n={n} mismatches={bad.shape[0]} first={bad[:8]}")
if bad.shape[0]:
    print("even(hi) mism:", int((bad % 2 == 0).sum()),
          "odd(lo):", int((bad % 2 == 1).sum()))
    print("first chunk with mism:", bad[0] // CHUNK)
    for i in bad[:6]:
        print(f"nib {i} chunk {i//CHUNK} trace={t[i].tolist()} "
              f"pallas=({ps[0,i]},{pf[0,i]}) xla=({xs[0,i]},{xf[0,i]})")
    # which rows mismatch in the first bad chunk: group by flat
    c0 = bad[0] // CHUNK
    inb = bad[(bad >= c0 * CHUNK) & (bad < (c0 + 1) * CHUNK)]
    print("flats of first-chunk mismatches:", sorted(set(t[inb, 0].tolist()))[:20])
    allf = sorted(set(t[c0 * CHUNK:(c0 + 1) * CHUNK, 0].tolist()))
    print("all lo flats coded in that chunk:",
          [f for f in allf if 65 <= f < 193][:30])
