"""Per-batch phase timing of the real decode kernels on the mixed
corpus: host packing, H2D, scan execution, D2H.

Usage: python research/probe_decode_phases.py [size_mib] [quality]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu import native  # noqa: E402
from divans_tpu.container import format as fmt  # noqa: E402
from divans_tpu.codec import pallas_decode as pd  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402
from large_file_study import build_corpus  # noqa: E402


def main():
    size_mib = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    data = build_corpus(size_mib << 20)
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=256,
                         quality=q)
    blob = native.compress(data, opts)
    _w, _mb, frames, _crc, _fl = fmt.deserialize(blob)
    chunk = 256
    s_bytes = chunk // 2
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    scripts = pd.decode_structures(frames, chunk, layout, opts)
    n_lits = [s.lit_total for s in scripts]
    order = sorted(range(len(frames)), key=lambda i: len(frames[i].lit))
    perm, offs = pd.kernel_perm(layout)
    permj = jnp.asarray(perm)

    for rep in range(2):
        tag = "warm" if rep else "cold"
        for base in range(0, len(order), 128):
            idxs = order[base:base + 128]
            t0 = time.perf_counter()
            states, words, n_lit, lcmap_t, luts, spd = pd.pack_lit_lanes(
                [frames[i].lit for i in idxs],
                [n_lits[i] for i in idxs],
                [scripts[i].lcmap for i in idxs],
                [scripts[i].speeds for i in idxs])
            t_pack = time.perf_counter() - t0
            max_lit = int(n_lit.max())
            n_chunks = max(1, -(-max_lit // s_bytes))
            p = 1 << (n_chunks - 1).bit_length()
            for m in (5, 6, 7):
                cand = (p >> 3) * m
                if cand >= n_chunks:
                    p = cand
                    break
            n_chunks = max(1, p)
            t0 = time.perf_counter()
            dev_in = [jax.device_put(x) for x in
                      (states, words, n_lit, lcmap_t, luts, spd)]
            jax.block_until_ready(dev_in)
            t_h2d = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, pulls = pd._decode_lit_scan(
                *dev_in, permj, 385, chunk, n_chunks, offs, False)
            jax.block_until_ready(out)
            t_scan = time.perf_counter() - t0
            ncols = min(out.shape[1], max(4096, -(-max_lit // 4096) * 4096))
            t0 = time.perf_counter()
            outc = pd._trim_cast(out, ncols)
            host = np.asarray(outc)
            t_d2h = time.perf_counter() - t0
            mb_words = words.nbytes / 1e6
            mb_out = host.nbytes / 1e6
            print(f"[{tag}] batch@{base:3d} lanes={len(idxs):3d} "
                  f"n_chunks={n_chunks:5d} words={mb_words:7.1f}MB "
                  f"out={mb_out:6.1f}MB | pack {t_pack*1e3:7.1f}ms "
                  f"h2d {t_h2d*1e3:7.1f}ms scan {t_scan*1e3:8.1f}ms "
                  f"({t_scan/n_chunks*1e3:5.2f}ms/step) "
                  f"d2h {t_d2h*1e3:7.1f}ms", flush=True)


if __name__ == "__main__":
    main()
