"""Format-decision study for deferred-v2 (round 2).

Questions, answered in exact code-length bits via replay_trace freqs:
  1. per-stream ticking (cmd and lit streams chunked on their own clocks)
     vs the round-1 global clock — the device decode kernel needs
     uniform per-stream chunks to hoist boundary commits out of the
     Pallas inner loop;
  2. chunk size for the cmd stream (same S vs smaller);
  3. bucketing the lo-nibble literal context 64 -> 8 (and 4), which
     shrinks lit_lo/cm_second from 1024 rows to 128 (64) so the decode
     kernel's select-scan fetch and the encode onehot matmul both shrink
     ~5x.

Usage: python research/deferred_v2_study.py [file ...]
"""
import sys
import math

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

from divans_tpu.options import DivansOptions
from divans_tpu.codec import trace as trace_mod, deferred
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands

S = 256


def bits(freqs):
    f = freqs.astype(np.float64)
    return float(np.sum(-np.log2(f / 32768.0)))


def cost_global(trace, s=S):
    _, f = deferred.replay_trace(trace, s)
    return bits(f)


def cost_split(trace, s_cmd=S, s_lit=S):
    total = 0.0
    for sid, s in ((0, s_cmd), (1, s_lit)):
        sub = trace[trace[:, 2] == sid]
        _, f = deferred.replay_trace(sub, s)
        total += bits(f)
    return total


def bucket_trace(trace, layout, nbuck):
    """Remap lit_lo/cm_second ctx dims 64 -> nbuck (aliased in-place)."""
    t = trace.copy()
    lo_off, lo_shape = layout.segments["lit_lo"]
    cs_off, cs_shape = layout.segments["cm_second"]
    nctx = cs_shape[1]
    shift = (nctx // nbuck).bit_length() - 1
    for col in (0, 7):
        v = t[:, col]
        m = (v >= lo_off) & (v < lo_off + lo_shape[0] * lo_shape[1])
        rel = v[m] - lo_off
        t[m, col] = lo_off + (rel // 16 >> shift) * 16 + rel % 16
        m = (v >= cs_off) & (v < cs_off + cs_shape[0] * cs_shape[1])
        rel = v[m] - cs_off
        t[m, col] = cs_off + (rel // nctx) * nctx + (rel % nctx >> shift)
    return t


def main():
    files = sys.argv[1:] or ["/root/reference/testdata/alice29",
                             "/root/reference/testdata/asyoulik"]
    opts = DivansOptions()
    layout = ModelLayout(PROFILES["cm"])
    for path in files:
        data = open(path, "rb").read()[:opts.metablock_size]
        commands = build_commands(data, opts)
        trace = trace_mod.build_trace(data, commands, opts, layout)
        n = len(data)
        base = cost_global(trace)
        rows = [("r1 global S=256", base)]
        rows.append(("split S=256/256", cost_split(trace)))
        rows.append(("split S=64/256", cost_split(trace, 64, 256)))
        rows.append(("split S=128/256", cost_split(trace, 128, 256)))
        for nb in (8, 4):
            tb = bucket_trace(trace, layout, nb)
            rows.append((f"split S=256 lo-ctx={nb}", cost_split(tb)))
        tb = bucket_trace(trace, layout, 8)
        rows.append(("split S=64/256 lo-ctx=8", cost_split(tb, 64, 256)))
        # self-fed literal history (lit kernel needs no window): l8 is
        # literal bytes only — copies/dicts stop clobbering it
        codec = trace_mod.TraceCodec(opts, layout)
        codec.sync_lit_history = False
        for cmd in commands:
            trace_mod._run_one_command(codec, cmd)
        import divans_tpu.ir.commands as cmds_mod
        codec.code_command_type(cmds_mod.END_NIBBLE)
        tsf = np.array(codec.rows, np.int32).reshape(-1, trace_mod.NCOLS)
        rows.append(("split S=64/256 self-fed", cost_split(tsf, 64, 256)))
        tsfb = bucket_trace(tsf, layout, 8)
        rows.append(("v2: split 64/256 loctx8 selffed",
                     cost_split(tsfb, 64, 256)))
        print(f"\n{path.split('/')[-1]} ({n} bytes, "
              f"{trace.shape[0]} nibbles)")
        for name, b in rows:
            print(f"  {name:28s} {b/8:10.0f} B  ratio {b/8/n:.4f} "
                  f"({(b - base)/base*100:+.3f}%)")


if __name__ == "__main__":
    main()
