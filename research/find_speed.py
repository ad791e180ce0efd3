#!/usr/bin/env python3
"""Offline adaptation-speed search — the `findspeed` feature equivalent
(reference: src/probability/variant_speed_cdf.rs:5-106 +
src/priors.rs:137-160 summarize_speed_costs).

The reference trains 16 shadow CDFs (one per ENCODER_DEFAULT_PALETTE
speed) alongside every prior table and prints the cheapest speed per
table.  Here the same measurement runs over an encode trace: for each
model segment (codec/layout.py) and each palette speed, replay the
segment's rows with that speed and sum -log2(p).

Usage: python research/find_speed.py [file] [nbytes]
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shadow_costs(trace, layout):
    """-log2 cost per (segment, palette speed) over the trace.

    Returns {segment_name: [(bits, Speed), ...] sorted best-first}."""
    import numpy as np
    from divans_tpu.probability import scalar
    from divans_tpu.probability.speed import ENCODER_DEFAULT_PALETTE

    seg_of_row = {}
    for name, (off, shape) in layout.segments.items():
        n = int(np.prod(shape))
        for i_ in range(n):
            seg_of_row[off + i_] = name

    palette = list(ENCODER_DEFAULT_PALETTE)
    # shadow state: (row, palette index) -> cdf
    shadows: dict = {}
    bits = {name: [0.0] * len(palette) for name in layout.segments}
    for t in range(trace.shape[0]):
        flat, value = int(trace[t, 0]), int(trace[t, 1])
        if trace[t, 3] == 0:         # frozen/static hit: no model cost
            continue
        name = seg_of_row.get(flat)
        if name is None:
            continue
        for pi, sp in enumerate(palette):
            cdf = shadows.get((flat, pi))
            if cdf is None:
                cdf = shadows[(flat, pi)] = list(scalar.CDF_INIT)
            _, freq = scalar.sym_to_start_freq(cdf, value)
            bits[name][pi] += -math.log2(max(freq, 1) / 32768.0)
            scalar.blend(cdf, value, sp.inc, sp.lim)
    out = {}
    for name, row in bits.items():
        if any(row):
            out[name] = sorted(zip(row, palette), key=lambda x: x[0])
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from divans_tpu.codec import trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.options import DivansOptions

    path = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/reference/testdata/alice29"
    nbytes = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    data = open(path, "rb").read()[:nbytes]
    opts = DivansOptions()
    layout = ModelLayout(PROFILES["cm"])
    tr = trace_mod.build_trace(data, build_commands(data, opts), opts, layout)
    print(f"{os.path.basename(path)}: {len(data)} bytes, "
          f"{tr.shape[0]} nibbles\n")
    costs = shadow_costs(tr, layout)
    print(f"{'segment':12} {'best speed':>16} {'bits':>10}  "
          f"{'default-speed bits':>18}")
    for name, ranked in sorted(costs.items()):
        best_bits, best_speed = ranked[0]
        print(f"{name:12} ({best_speed.inc:#6x},{best_speed.lim:#6x}) "
              f"{best_bits:10.0f}  (worst {ranked[-1][0]:.0f})")


if __name__ == "__main__":
    main()
