"""End-to-end device decode timing at N batches (the decompress_frames
pipeline: threaded cmd pass overlapping issued kernels + async D2H)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from divans_tpu.options import DivansOptions
from divans_tpu import native
from divans_tpu.container import format as fmt
from divans_tpu.codec import pallas_decode as pd
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec.deferred import flags_to_chunk

CHUNK = 256
N_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # metablocks of 256 KiB
td = "/root/reference/testdata/"
base = b"".join(open(td + f, "rb").read() for f in
                ("alice29", "asyoulik", "random_then_unicode"))
dec_data = base * (-(-(N_MB << 18) // len(base)))
opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK)
t0 = time.perf_counter()
blob = native.compress(dec_data[:N_MB << 18], opts)
print(f"compress {time.perf_counter()-t0:.1f}s blob {len(blob)}", flush=True)

_w, _mb, frames, crc, flags = fmt.deserialize(blob)
chunk = flags_to_chunk(flags)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
options = DivansOptions()
raw_len = sum(f.raw_len for f in frames)
print(f"{len(frames)} frames ({-(-len(frames)//pd.LANES)} batches), "
      f"raw {raw_len/1e6:.1f} MB", flush=True)

raw = pd.decompress_frames(frames, chunk, layout, options, interpret=False)
fmt.check_crc(raw, crc)
for trial in range(3):
    t0 = time.perf_counter()
    r = pd.decompress_frames(frames, chunk, layout, options, interpret=False)
    dt = time.perf_counter() - t0
    assert r == raw
    print(f"e2e {dt*1e3:.0f} ms -> {raw_len/dt/1e6:.2f} MB/s", flush=True)
