#!/usr/bin/env python3
"""Where does the resumable decode pipeline lose to the grouped one?

Times each host-side stage of ResumableLaneDecoder.segment() and the
device wall per segment on the 48 MiB corpus (PERF_NOTES round 5:
grouped 64-70 MB/s vs resumable 42-57)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from large_file_study import build_corpus
from divans_tpu.options import DivansOptions
from divans_tpu import native
from divans_tpu.container import format as fmt
from divans_tpu.codec import pallas_decode as pd
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec.deferred import flags_to_chunk, SUB_LIT, lit_subs_split

corpus = build_corpus(64 << 20)
dec_data = corpus[:48 << 20]
blob = native.compress(dec_data, DivansOptions(metablock_size=1 << 18,
                                               chunk_nibbles=256))
_w, _mb, frames, _crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
scripts = pd.decode_structures(frames, chunk, layout, DivansOptions())
print("scripts ready", flush=True)

# add all streams up front (isolates the device/segment mechanics from
# cmd-pass overlap)
dec = pd.ResumableLaneDecoder(chunk, layout, lanes=128, interpret=False)
for f, s in zip(frames, scripts):
    for j, payload in enumerate(lit_subs_split(f.lit)):
        nl = max(0, min(SUB_LIT, s.lit_total - j * SUB_LIT)) \
            if s.lit_total else 0
        dec.add_stream(payload, nl, s.lcmap, s.speeds)
total = dec.pending_chunks()
print(f"total chunks {total} -> ideal steps {total/128:.0f}", flush=True)

S = 192
t_host = t_disp = 0.0
t0_all = time.perf_counter()
outs = []
while dec.pending_chunks() > 0:
    t0 = time.perf_counter()
    # host side of segment(): delta pack + tables + sim
    out, places = dec.segment(min(S, pd._quant_steps(dec.max_backlog())))
    t_disp += time.perf_counter() - t0
    outs.append(out)
# sync everything
for o in outs:
    np.asarray(o)
wall = time.perf_counter() - t0_all
lit_mb = total * 128 / 1e6
print(f"segments={len(outs)}  dispatch(host)={t_disp*1e3:.0f} ms  "
      f"wall={wall*1e3:.0f} ms  {lit_mb/wall:.1f} MB/s lit", flush=True)

# compare: pure grouped scans over the same work (no pipeline), to
# separate carry-chain overhead from everything else
streams, n_lits, lcmaps, spds = [], [], [], []
for f, s in zip(frames, scripts):
    for j, payload in enumerate(lit_subs_split(f.lit)):
        nl = max(0, min(SUB_LIT, s.lit_total - j * SUB_LIT)) \
            if s.lit_total else 0
        if nl:
            streams.append(payload)
            n_lits.append(nl)
            lcmaps.append(s.lcmap)
            spds.append(s.speeds)
G = 6
per = -(-len(streams) // G)
t0_all = time.perf_counter()
devs = []
for g in range(G):
    sl = slice(g * per, (g + 1) * per)
    arrays, n_steps, placement = pd.pack_lane_queues(
        streams[sl], n_lits[sl], lcmaps[sl], spds[sl], chunk)
    devs.append(pd.issue_lane_queues(arrays, n_steps, chunk, layout,
                                     interpret=False))
for d in devs:
    np.asarray(d)
wall_g = time.perf_counter() - t0_all
print(f"grouped {G} scans: wall={wall_g*1e3:.0f} ms  "
      f"{lit_mb/wall_g:.1f} MB/s lit", flush=True)


# ---- warm second pass (the first paid Mosaic compiles)
def run_resumable():
    dec = pd.ResumableLaneDecoder(chunk, layout, lanes=128,
                                  interpret=False)
    for f, s in zip(frames, scripts):
        for j, payload in enumerate(lit_subs_split(f.lit)):
            nl = max(0, min(SUB_LIT, s.lit_total - j * SUB_LIT)) \
                if s.lit_total else 0
            dec.add_stream(payload, nl, s.lcmap, s.speeds)
    t_host = 0.0
    t0_all = time.perf_counter()
    outs = []
    while dec.pending_chunks() > 0:
        t0 = time.perf_counter()
        out, places = dec.segment(min(S, pd._quant_steps(dec.max_backlog())))
        t_host += time.perf_counter() - t0
        outs.append(out)
    for o in outs:
        np.asarray(o)
    return time.perf_counter() - t0_all, t_host, len(outs)


def run_grouped():
    t0_all = time.perf_counter()
    devs = []
    for g in range(G):
        sl = slice(g * per, (g + 1) * per)
        arrays, n_steps, placement = pd.pack_lane_queues(
            streams[sl], n_lits[sl], lcmaps[sl], spds[sl], chunk)
        devs.append(pd.issue_lane_queues(arrays, n_steps, chunk, layout,
                                         interpret=False))
    for d in devs:
        np.asarray(d)
    return time.perf_counter() - t0_all


for it in range(2):
    w, th, ns = run_resumable()
    print(f"warm resumable it{it}: wall={w*1e3:.0f} ms (host-dispatch "
          f"{th*1e3:.0f} ms, {ns} segs)  {lit_mb/w:.1f} MB/s lit",
          flush=True)
for it in range(2):
    w = run_grouped()
    print(f"warm grouped it{it}: wall={w*1e3:.0f} ms  {lit_mb/w:.1f} MB/s lit",
          flush=True)
