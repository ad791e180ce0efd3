"""Phase timing of the persistent-lane decode path (deferred-v3 subs).

Usage: python research/probe_queue_phases.py [size_mib] [quality] [groups]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu import native  # noqa: E402
from divans_tpu.container import format as fmt  # noqa: E402
from divans_tpu.codec import pallas_decode as pd  # noqa: E402
from divans_tpu.codec.deferred import SUB_LIT, lit_subs_split  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402
from large_file_study import build_corpus  # noqa: E402


def main():
    size_mib = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    data = build_corpus(size_mib << 20)
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=256,
                         quality=q)
    blob = native.compress(data, opts)
    _w, _mb, frames, _crc, _fl = fmt.deserialize(blob)
    chunk = 256
    s_bytes = chunk // 2
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)

    t0 = time.perf_counter()
    scripts = pd.decode_structures(frames, chunk, layout, opts)
    t_cmd = time.perf_counter() - t0
    print(f"stage1 cmd pass: {t_cmd*1e3:8.1f} ms")

    per = -(-len(frames) // n_groups)
    groups = []
    for base in range(0, len(frames), per):
        idxs = list(range(base, min(base + per, len(frames))))
        t0 = time.perf_counter()
        streams, n_lits, lcmaps, spds, spans = [], [], [], [], []
        for i in idxs:
            s = scripts[i]
            subs_i = lit_subs_split(frames[i].lit)
            spans.append((len(streams), len(subs_i)))
            for j, payload in enumerate(subs_i):
                streams.append(payload)
                n_lits.append(min(SUB_LIT, s.lit_total - j * SUB_LIT)
                              if s.lit_total else 0)
                lcmaps.append(s.lcmap)
                spds.append(s.speeds)
        arrays, n_steps, placement = pd.pack_lane_queues(
            streams, n_lits, lcmaps, spds, chunk)
        t_pack = time.perf_counter() - t0
        groups.append((idxs, arrays, n_steps, placement, spans, n_lits))
        words = arrays[0]
        need = sum(-(-n // s_bytes) for n in n_lits if n)
        print(f"group {base//per}: frames={len(idxs)} jobs={len(streams)} "
              f"n_steps={n_steps} util={need/(128*n_steps):.2f} "
              f"W={words.shape[1]} F={arrays[2].shape[0]} "
              f"words={words.nbytes/1e6:.1f}MB pack {t_pack*1e3:7.1f}ms")

    for g in groups:   # warm compiles
        dev = pd.issue_lane_queues(g[1], g[2], chunk, layout,
                                   interpret=False)
        jax.block_until_ready(dev)

    for rep in range(2):
        devs = []
        t0 = time.perf_counter()
        for g in groups:
            devs.append(pd.issue_lane_queues(g[1], g[2], chunk, layout,
                                             interpret=False))
        t_disp = time.perf_counter() - t0
        jax.block_until_ready(devs)
        t_done = time.perf_counter() - t0
        t1 = time.perf_counter()
        arrs = [np.asarray(d) for d in devs]
        t_d2h = time.perf_counter() - t1
        mb = sum(a.nbytes for a in arrs) / 1e6
        print(f"[{rep}] dispatch {t_disp*1e3:7.1f}ms  compute-done "
              f"{t_done*1e3:7.1f}ms  d2h {t_d2h*1e3:7.1f}ms ({mb:.1f}MB)")

    t0 = time.perf_counter()
    out = bytearray()
    for gi, (idxs, arrays, n_steps, placement, spans, n_lits) in \
            enumerate(groups):
        arr = arrs[gi]
        for i, (off, k) in zip(idxs, spans):
            lb = bytearray()
            for j in range(off, off + k):
                if placement[j] is None:
                    continue
                l, coff = placement[j]
                o = coff * s_bytes
                lb += arr[l, o:o + n_lits[j]].tobytes()
            out += pd._execute(scripts[i], bytes(lb))
    t_x = time.perf_counter() - t0
    assert bytes(out) == data
    print(f"execute: {t_x*1e3:7.1f} ms")

    t0 = time.perf_counter()
    raw = pd.decompress_frames(frames, chunk, layout, opts, interpret=False)
    t_all = time.perf_counter() - t0
    assert raw == data
    print(f"full pipeline: {t_all*1e3:7.1f} ms "
          f"({len(data)/t_all/1e6:.1f} MB/s)")


if __name__ == "__main__":
    main()
