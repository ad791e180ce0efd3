#!/usr/bin/env python3
"""Ratio probe: clustered literal context maps vs identity (golden
engine; generation side of VERDICT r4 missing #2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import dataclasses
import numpy as np

from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np
from divans_tpu.ir import matcher, cmaps

td = "/root/reference/testdata/"
fixtures = {
    "alice29": open(td + "alice29", "rb").read(),
    "asyoulik": open(td + "asyoulik", "rb").read(),
    "rnd_uni": open(td + "random_then_unicode", "rb").read(),
}
from large_file_study import build_corpus
fixtures["corpus2M"] = build_corpus(8 << 20)[:2 << 20]

orig_pm = matcher.default_prediction_mode
OVERRIDE = {"lcm": None}


def patched(options):
    pm = orig_pm(options)
    if OVERRIDE["lcm"] is not None:
        pm = dataclasses.replace(pm, literal_context_map=OVERRIDE["lcm"])
    return pm


matcher.default_prediction_mode = patched

for q in (10, 11):
    for name, data in fixtures.items():
        opts = DivansOptions(quality=q, metablock_size=1 << 22)
        OVERRIDE["lcm"] = None
        base = engine_np.compress(data, opts)
        row = [f"q{q} {name:9s} id {len(base)/len(data):.4f}"]
        for K in (8, 16, 32):
            t0 = time.perf_counter()
            OVERRIDE["lcm"] = cmaps.cluster_lcm(data, max_clusters=K)
            tcl = time.perf_counter() - t0
            nclust = max(OVERRIDE["lcm"]) + 1
            blob = engine_np.compress(data, opts)
            assert engine_np.decompress(blob) == data
            row.append(f"K{K}({nclust}cl) {len(blob)/len(data):.4f}")
        print("  ".join(row) + f"  [cluster {tcl*1e3:.0f} ms]", flush=True)
