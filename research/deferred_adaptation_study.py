#!/usr/bin/env python3
"""Ratio cost of chunk-deferred CDF adaptation (PERF_NOTES.md roadmap §2).

The GB/s decode kernel wants tables frozen within a chunk (gather-only
inner loop, batch blend at chunk boundaries).  This script replays a real
encode trace under both policies and reports the bit cost delta:

  policy A (wire today): blend after every nibble
  policy B (chunked S):  code against the chunk-start snapshot; apply the
                         chunk's blends in order at the boundary

Weights (mixer) are deferred identically under policy B.
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def study(path: str, nbytes: int, chunk_sizes: list[int]) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from divans_tpu.codec import trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.options import DivansOptions
    from divans_tpu.probability import scalar

    data = open(path, "rb").read()[:nbytes]
    opts = DivansOptions()
    layout = ModelLayout(PROFILES["cm"])
    tr = trace_mod.build_trace(data, build_commands(data, opts), opts, layout)
    print(f"{os.path.basename(path)}: {len(data)} bytes, {tr.shape[0]} nibbles")

    def run(chunk: int) -> float:
        committed: dict[int, list[int]] = {}
        live: dict[int, list[int]] = {}
        weights_c = [scalar.WEIGHT_INIT.copy(), scalar.WEIGHT_INIT.copy()]
        weights_l = [w.copy() for w in weights_c]

        def get(d, flat):
            row = d.get(flat)
            if row is None:
                row = scalar.CDF_INIT.copy()
                d[flat] = row
            return row

        bits = 0.0
        for t in range(tr.shape[0]):
            flat, value, _st, inc, lim, mix, which, cm_idx, cm_inc, cm_lim = \
                (int(x) for x in tr[t])
            snap = committed if chunk else live
            rows = get(snap, flat)
            if mix:
                cm_rows = get(snap, cm_idx)
                w = (weights_c if chunk else weights_l)[which]
                coded = scalar.average(cm_rows, rows, w[2] & 0xFFFF)
            else:
                coded = rows
            _start, freq = scalar.sym_to_start_freq(coded, value)
            bits += -math.log2(max(freq, 1) / 32768.0)
            # live updates (deferred visibility under chunking)
            lrow = get(live, flat)
            if mix:
                lcm = get(live, cm_idx)
                p_cm = scalar.sym_to_start_freq(
                    get(snap, cm_idx), value)[1]
                p_nib = scalar.sym_to_start_freq(rows, value)[1]
                scalar.weights_update(weights_l[which], p_cm, p_nib, freq)
                scalar.blend(lcm, value, cm_inc, cm_lim)
            if inc:
                scalar.blend(lrow, value, inc, lim)
            if chunk and (t + 1) % chunk == 0:
                committed = {k: v.copy() for k, v in live.items()}
                weights_c = [w.copy() for w in weights_l]
        return bits

    base = run(0)
    print(f"  per-nibble adaptation: {base / 8:10.0f} bytes (baseline)")
    for s in chunk_sizes:
        b = run(s)
        print(f"  chunk={s:5d}:           {b / 8:10.0f} bytes "
              f"({(b - base) / base * 100:+.2f}%)")


if __name__ == "__main__":
    study(sys.argv[1] if len(sys.argv) > 1
          else "/root/reference/testdata/alice29",
          int(sys.argv[2]) if len(sys.argv) > 2 else 24576,
          [64, 256, 1024])
