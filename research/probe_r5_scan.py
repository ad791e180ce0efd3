#!/usr/bin/env python3
"""Round-5 timing ablation of the PRODUCTION _decode_lit_scan_q stages
(via its static _ablate arg; wrong bytes on every mode but "").

Modes: "" (full), nowadj, nowadj+nocommit, nohist (kernel+premix only),
nohist+nopremix (pure kernel + word-window glue).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu import native
from divans_tpu.container import format as fmt
from divans_tpu.codec import pallas_decode as pd
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec.deferred import flags_to_chunk, SUB_LIT, lit_subs_split

CHUNK = 256
from large_file_study import build_corpus
data = build_corpus(32 << 20)
opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK)
t0 = time.perf_counter()
blob = native.compress(data, opts)
print(f"compress {time.perf_counter()-t0:.1f}s ratio {len(blob)/len(data):.4f}",
      flush=True)
_w, _mb, frames, _crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()

scripts = pd.decode_structures(frames, chunk, layout, options)
assert scripts is not None

# one production-shaped group: sub-stream jobs, bin-packed lane queues
streams, n_lits, lcmaps, spds = [], [], [], []
for f, s in zip(frames, scripts):
    subs = lit_subs_split(f.lit)
    for j, payload in enumerate(subs):
        streams.append(payload)
        n_lits.append(min(SUB_LIT, s.lit_total - j * SUB_LIT)
                      if s.lit_total else 0)
        lcmaps.append(s.lcmap)
        spds.append(s.speeds)
lit_mb = sum(n_lits) / 1e6
arrays, n_steps, placement = pd.pack_lane_queues(
    streams, n_lits, lcmaps, spds, chunk)
print(f"lit={lit_mb:.2f} MB n_steps={n_steps}", flush=True)

perm, offs = pd.kernel_perm(layout)
lit_base = layout.segments["lit_hi"][0]
r_lit = layout.num_rows - lit_base + 1
(words, counts, state0, n_lit_all, woff_all, lcmap_all, spd_all,
 luts) = arrays
argsj = [jnp.asarray(x) for x in
         (words, counts, state0, n_lit_all, woff_all, lcmap_all, spd_all,
          luts)] + [jnp.asarray(perm)]

for mode in ("", "nowadj", "nowadj,nocommit", "nohist",
             "nohist,nopremix"):
    out, cur = pd._decode_lit_scan_q(*argsj, r_lit, chunk, n_steps, offs,
                                     False, _ablate=mode)
    int(jnp.sum(cur))  # compile+warm
    t0 = time.perf_counter()
    n_iter = 3
    for _ in range(n_iter):
        out, cur = pd._decode_lit_scan_q(*argsj, r_lit, chunk, n_steps,
                                         offs, False, _ablate=mode)
        int(jnp.sum(cur))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{mode or 'full':18s} {dt*1e3:7.1f} ms  {lit_mb/dt:6.1f} MB/s lit",
          flush=True)
