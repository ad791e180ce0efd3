#!/usr/bin/env python3
"""Split _decode_lit_scan time: Pallas kernel vs the XLA chunk commit."""
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
from divans_tpu.codec import jax_engine
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
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
scripts = pd.decode_structures(frames, CHUNK, layout, opts)
fb = frames[:128]
sub = scripts[:128]
n_lits = [s.lit_total for s in sub]
states, words, n_lit, lcmap_t, luts, spd = pd.pack_lit_lanes(
    [f.lit for f in fb], n_lits, [s.lcmap for s in sub],
    [s.speeds for s in sub])
perm, offs = pd.kernel_perm(layout)
lit_base = layout.segments["lit_hi"][0]
r_lit = layout.num_rows - lit_base + 1
s_bytes = CHUNK // 2
max_lit = int(n_lit.max())
n_chunks = 1 << (max(1, -(-max_lit // s_bytes)) - 1).bit_length()
print(f"lanes=128 max_lit={max_lit} n_chunks={n_chunks} "
      f"lit_bytes={sum(n_lits)/1e6:.2f}MB")

args = (jnp.asarray(states), jnp.asarray(words), jnp.asarray(n_lit),
        jnp.asarray(lcmap_t), jnp.asarray(luts), jnp.asarray(spd),
        jnp.asarray(perm))


def timed(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


t_full = timed(lambda: pd._decode_lit_scan(
    *args, r_lit, CHUNK, n_chunks, offs, False)[0])

# kernel-only variant: stub _apply_pend to identity (measures the scan
# without commit math; WRONG bytes, timing only)
orig = jax_engine._apply_pend
jax_engine._apply_pend = lambda c, w, p: (c, w)
pd._decode_lit_scan.clear_cache()
t_nocommit = timed(lambda: pd._decode_lit_scan(
    *args, r_lit, CHUNK, n_chunks, offs, False)[0])
jax_engine._apply_pend = orig
pd._decode_lit_scan.clear_cache()

lit_mb = sum(n_lits) / 1e6
print(f"full scan      {t_full*1e3:7.1f} ms  {lit_mb/t_full:6.2f} MB/s lit")
print(f"no-commit scan {t_nocommit*1e3:7.1f} ms  {lit_mb/t_nocommit:6.2f} MB/s lit")
print(f"commit share   {(t_full-t_nocommit)*1e3:7.1f} ms")
