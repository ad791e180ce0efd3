"""Per-stage timing of the end-to-end 2-stage device decode (the bench
blob): deserialize / native cmd-structure pass / device literal kernel /
collect / script execution / crc.  Identifies the stage capping
device_decode_e2e_throughput."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

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
print("compressing...", flush=True)
blob = native.compress(dec_data[:128 << 18], opts)
print("blob", len(blob), flush=True)

_w, _mb, frames, crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()

raw_len = sum(f.raw_len for f in frames)
print(f"{len(frames)} frames, raw {raw_len/1e6:.1f} MB", flush=True)

# warm
raw = pd.decompress_frames(frames, chunk, layout, options, interpret=False)
assert raw is not None
fmt.check_crc(raw, crc)

def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:9.1f} ms  {raw_len/best/1e6:8.2f} MB/s",
          flush=True)
    return r, best

_, t_deser = t("deserialize", lambda: fmt.deserialize(blob))
scripts, t_cmd = t("cmd-structure (native, thr)",
                   lambda: pd.decode_structures(frames, chunk, layout, options))

# device kernel: issue all batches, sync at end
def kernel_only():
    devs = []
    for base_i in range(0, len(frames), pd.LANES):
        sub = scripts[base_i:base_i + pd.LANES]
        fb = frames[base_i:base_i + pd.LANES]
        n_lits = [s.lit_total for s in sub]
        devs.append((pd._issue_lit_batch(
            [f.lit for f in fb], n_lits,
            [s.lcmap for s in sub], [s.speeds for s in sub],
            chunk, layout, interpret=False), n_lits))
    for d, _ in devs:
        d.block_until_ready()
    return devs

devs, t_kern = t("device literal kernel", kernel_only)

def collect_only():
    outs = []
    for d, n_lits in devs:
        outs.append(pd._collect_lit_batch(d, n_lits))
    return outs

lit_batches, t_coll = t("collect (D2H + slice)", collect_only)

def exec_only():
    out = bytearray()
    i = 0
    for lits in lit_batches:
        for lb in lits:
            out += pd._execute(scripts[i], lb)
            i += 1
    return bytes(out)

raw2, t_exec = t("script execution", exec_only)
assert raw2 == raw
_, t_crc = t("crc check", lambda: fmt.check_crc(raw, crc))

tot = t_deser + t_cmd + t_kern + t_coll + t_exec + t_crc
print(f"{'sum of stages':28s} {tot*1e3:9.1f} ms  {raw_len/tot/1e6:8.2f} MB/s")
_, t_e2e = t("e2e decompress_frames", lambda: pd.decompress_frames(
    frames, chunk, layout, options, interpret=False))

n_lit_tot = sum(s.lit_total for s in scripts)
print(f"lit bytes {n_lit_tot/1e6:.1f} MB of {raw_len/1e6:.1f} MB raw; "
      f"kernel rate on lit bytes {n_lit_tot/t_kern/1e6:.2f} MB/s")
