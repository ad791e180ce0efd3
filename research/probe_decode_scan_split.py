#!/usr/bin/env python3
"""Split the decode batch cost: scan compute (forced via a scalar
reduction, no bulk D2H) vs the trimmed D2H transfer vs total collect.
The axon tunnel's D2H path is slow, so the two must be measured apart.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

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
data = base * (-(-(128 << 18) // len(base)))
data = data[:128 << 18]
opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK)
blob = native.compress(data, opts)
_w, _mb, frames, _crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()

scripts = pd.decode_structures(frames, chunk, layout, options)
fb = frames[:128]
sub = scripts[:128]
n_lits = [s.lit_total for s in sub]
lit_mb = sum(n_lits) / 1e6

states, words, n_lit, lcmap_t, luts, spd = pd.pack_lit_lanes(
    [f.lit for f in fb], n_lits, [s.lcmap for s in sub],
    [s.speeds for s in sub])
perm, offs = pd.kernel_perm(layout)
lit_base = layout.segments["lit_hi"][0]
r_lit = layout.num_rows - lit_base + 1
s_bytes = chunk // 2
max_lit = int(n_lit.max())
n_chunks = max(1, -(-max_lit // s_bytes))
p = 1 << (n_chunks - 1).bit_length()
for m in (5, 6, 7):
    cand = (p >> 3) * m
    if cand >= n_chunks:
        p = cand
        break
n_chunks = max(1, p)
print(f"lanes=128 max_lit={max_lit} n_chunks={n_chunks} "
      f"lit={lit_mb:.2f} MB", flush=True)

args = (jnp.asarray(states), jnp.asarray(words), jnp.asarray(n_lit),
        jnp.asarray(lcmap_t), jnp.asarray(luts), jnp.asarray(spd),
        jnp.asarray(perm))


@jax.jit
def reduce_out(out):
    return jnp.sum(out & 0xFF)


def scan_compute():
    out, _ = pd._decode_lit_scan(*args, r_lit, chunk, n_chunks, offs, False)
    # force execution with a scalar D2H only
    return int(reduce_out(out))


def scan_d2h():
    out, _ = pd._decode_lit_scan(*args, r_lit, chunk, n_chunks, offs, False)
    t = pd._trim_cast(out, max(4096, -(-max_lit // 4096) * 4096))
    return np.asarray(t)


def timed(fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


t_compute = timed(scan_compute)
t_total = timed(scan_d2h)
print(f"scan+scalar   {t_compute*1e3:8.1f} ms  {lit_mb/t_compute:7.2f} MB/s lit")
print(f"scan+full D2H {t_total*1e3:8.1f} ms  {lit_mb/t_total:7.2f} MB/s lit")
print(f"D2H share     {(t_total-t_compute)*1e3:8.1f} ms")
