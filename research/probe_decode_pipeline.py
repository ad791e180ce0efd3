"""Instrument decompress_frames' pipeline loop phase by phase."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from divans_tpu.options import DivansOptions
from divans_tpu import native
from divans_tpu.container import format as fmt
from divans_tpu.codec import pallas_decode as pd
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec.deferred import flags_to_chunk

CHUNK = 256
td = "/root/reference/testdata/"
base = b"".join(open(td + f, "rb").read() for f in
                ("alice29", "asyoulik", "random_then_unicode"))
dec_data = base * (-(-(128 << 18) // len(base)))
opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK)
blob = native.compress(dec_data[:128 << 18], opts)

_w, _mb, frames, crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()

# warm
raw = pd.decompress_frames(frames, chunk, layout, options, interpret=False)

for trial in range(2):
    t0 = time.perf_counter()
    scripts = pd.decode_structures(frames, chunk, layout, options)
    t_cmd = time.perf_counter() - t0

    t_issue = t_coll = t_exec = 0.0

    def issue(base_i):
        global t_issue
        s0 = time.perf_counter()
        sub = scripts[base_i:base_i + pd.LANES]
        fb = frames[base_i:base_i + pd.LANES]
        n_lits = [s.lit_total for s in sub]
        dev = pd._issue_lit_batch(
            [f.lit for f in fb], n_lits,
            [s.lcmap for s in sub], [s.speeds for s in sub],
            chunk, layout, interpret=False)
        t_issue += time.perf_counter() - s0
        return sub, dev, n_lits

    out = bytearray()
    bases = list(range(0, len(frames), pd.LANES))
    pending = issue(bases[0])
    for nxt in bases[1:] + [None]:
        sub, dev, n_lits = pending
        nxt_pending = issue(nxt) if nxt is not None else None
        s0 = time.perf_counter()
        lits = pd._collect_lit_batch(dev, n_lits)
        t_coll += time.perf_counter() - s0
        s0 = time.perf_counter()
        for s, lb in zip(sub, lits):
            out += pd._execute(s, lb)
        t_exec += time.perf_counter() - s0
        pending = nxt_pending
    tot = time.perf_counter() - t0
    print(f"trial {trial}: cmd {t_cmd*1e3:.0f} issue {t_issue*1e3:.0f} "
          f"collect(wait) {t_coll*1e3:.0f} exec {t_exec*1e3:.0f} "
          f"total {tot*1e3:.0f} ms -> {len(raw)/tot/1e6:.2f} MB/s",
          flush=True)
assert bytes(out) == raw
