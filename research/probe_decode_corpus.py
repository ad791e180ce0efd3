"""Decode throughput on the stdlib mixed corpus: host-native vs the
2-stage device pipeline, with stage timings.

Usage: python research/probe_decode_corpus.py [size_mib] [quality]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))

import jax  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu import native  # noqa: E402
from divans_tpu.container import format as fmt  # noqa: E402
from divans_tpu.codec import pallas_decode  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402
from large_file_study import build_corpus  # noqa: E402


def main():
    size_mib = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    data = build_corpus(size_mib << 20)
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=256,
                         quality=q)
    t0 = time.perf_counter()
    blob = native.compress(data, opts)
    print(f"compress q{q}: {len(data)/(time.perf_counter()-t0)/1e6:.1f} MB/s"
          f"  ratio {len(blob)/len(data):.4f}", flush=True)

    # host-native decode (threaded frame-parallel)
    assert native.decompress(blob) == data
    t0 = time.perf_counter()
    native.decompress(blob)
    dt = time.perf_counter() - t0
    print(f"host native decode: {len(data)/dt/1e6:.2f} MB/s", flush=True)

    # frame shape stats
    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    lits = sorted(len(f.lit) for f in frames)
    print(f"frames {len(frames)}  lit-bytes min/med/max "
          f"{lits[0]}/{lits[len(lits)//2]}/{lits[-1]}")

    dev = pallas_decode.bench_decode(blob)
    print(f"device 2-stage decode: {dev:.2f} MB/s "
          f"(backend {jax.default_backend()})")

    # stage view: one full decode with tracelog
    from divans_tpu import tracelog
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    tracelog.enable()
    tracelog.clear()
    t0 = time.perf_counter()
    raw = pallas_decode.decompress_frames(frames, 256, layout,
                                          DivansOptions(), interpret=False)
    dt = time.perf_counter() - t0
    tracelog.enable(False)
    assert raw == data
    print(f"decompress_frames: {len(data)/dt/1e6:.2f} MB/s")
    for e in tracelog.events():
        print(f"  {e.name:28s} {e.dt*1e3:9.1f} ms  {e.meta}")


if __name__ == "__main__":
    main()
