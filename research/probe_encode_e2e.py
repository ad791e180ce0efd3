"""Stage breakdown of the END-TO-END device encode (bench.py's
device_encode_e2e_throughput config): 16 MiB mixed corpus, 256 KiB
metablocks, chunk 256, via jax_engine.compress with tracelog spans.

Usage: python research/probe_encode_e2e.py [size_mib] [quality]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu.codec import jax_engine  # noqa: E402
from divans_tpu import native, tracelog  # noqa: E402


def main():
    size_mib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    quality = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    td = "/root/reference/testdata/"
    base = b"".join(open(td + f, "rb").read() for f in
                    ("alice29", "asyoulik", "random_then_unicode"))
    n = size_mib << 20
    data = (base * (-(-n // len(base))))[:n]
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=256,
                         quality=quality)
    print("backend:", jax.default_backend(), " size:", size_mib, "MiB",
          " quality:", quality, flush=True)

    blob = jax_engine.compress(data, opts)   # warm: compiles
    assert native.decompress(blob) == data
    print("ratio:", round(len(blob) / len(data), 4), flush=True)

    tracelog.enable()
    tracelog.clear()
    t0 = time.perf_counter()
    jax_engine.compress(data, opts)
    dt = time.perf_counter() - t0
    tracelog.enable(False)
    print(f"e2e: {dt:.3f}s = {n / dt / 1e6:.2f} MB/s "
          f"({n / dt / 1e6 / 18.75:.2f}x line speed)")
    for e in tracelog.events():
        print(f"  {e.name:28s} {e.dt * 1e3:9.1f} ms  {e.meta}")


if __name__ == "__main__":
    main()
