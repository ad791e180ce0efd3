"""Stage-by-stage timing of the 2-stage device decode on the mixed
corpus: cmd pass, per-batch kernel (issue/collect), script execution,
plus lane-utilization accounting (steps needed vs steps run).

Usage: python research/probe_decode_stages.py [size_mib] [quality]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))

import numpy as np  # noqa: E402

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
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)

    # ---- stage 1 alone: threaded native cmd pass
    t0 = time.perf_counter()
    scripts = pd.decode_structures(frames, chunk, layout, opts)
    t_cmd = time.perf_counter() - t0
    print(f"stage1 cmd pass (threaded): {t_cmd*1e3:8.1f} ms "
          f"({len(data)/t_cmd/1e6:.1f} MB/s)")

    # ---- lane accounting
    s_bytes = chunk // 2
    n_lits = [s.lit_total for s in scripts]
    order = sorted(range(len(frames)), key=lambda i: len(frames[i].lit))
    need = run = 0
    batches = []
    for base in range(0, len(order), 128):
        idxs = order[base:base + 128]
        mx = max(n_lits[i] for i in idxs)
        nc = max(1, -(-mx // s_bytes))
        p = 1 << (nc - 1).bit_length()
        for m in (5, 6, 7):
            cand = (p >> 3) * m
            if cand >= nc:
                p = cand
                break
        batches.append((len(idxs), p))
        run += p * 128
        need += sum(-(-n_lits[i] // s_bytes) for i in idxs)
    print(f"batches: {batches}")
    print(f"lane-steps needed {need}  run {run}  utilization "
          f"{need/run:.3f}")

    # ---- stage 2 alone: kernel batches, warm then timed
    def kernels():
        issued = []
        for base in range(0, len(order), 128):
            idxs = order[base:base + 128]
            sub = [scripts[i] for i in idxs]
            dev = pd._issue_lit_batch(
                [frames[i].lit for i in idxs],
                [s.lit_total for s in sub],
                [s.lcmap for s in sub], [s.speeds for s in sub],
                chunk, layout, interpret=False)
            try:
                dev.copy_to_host_async()
            except AttributeError:
                pass
            issued.append((idxs, dev, [s.lit_total for s in sub]))
        outs = {}
        for idxs, dev, nl in issued:
            for i, lb in zip(idxs, pd._collect_lit_batch(dev, nl)):
                outs[i] = lb
        return outs

    outs = kernels()  # warm
    t0 = time.perf_counter()
    outs = kernels()
    t_k = time.perf_counter() - t0
    lit_bytes = sum(n_lits)
    print(f"stage2 kernels (warm):      {t_k*1e3:8.1f} ms "
          f"({len(data)/t_k/1e6:.1f} MB/s raw, "
          f"{lit_bytes/t_k/1e6:.1f} MB/s lit; lit/raw "
          f"{lit_bytes/len(data):.3f})")

    # ---- stage 3 alone: script execution
    t0 = time.perf_counter()
    out = bytearray()
    for i in range(len(frames)):
        out += pd._execute(scripts[i], outs[i])
    t_x = time.perf_counter() - t0
    assert bytes(out) == data
    print(f"stage3 execute:             {t_x*1e3:8.1f} ms "
          f"({len(data)/t_x/1e6:.1f} MB/s)")

    # ---- full pipelined path for comparison
    t0 = time.perf_counter()
    raw = pd.decompress_frames(frames, chunk, layout, opts,
                               interpret=False)
    t_all = time.perf_counter() - t0
    assert raw == data
    print(f"pipelined decompress_frames:{t_all*1e3:8.1f} ms "
          f"({len(data)/t_all/1e6:.1f} MB/s)")


if __name__ == "__main__":
    main()
