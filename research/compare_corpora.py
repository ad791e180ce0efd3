#!/usr/bin/env python3
"""Corpus ratio/speed comparison vs brotli/zstd/zlib/lzma
(reference: research/compare_with_other.py + timing_comparisons.py).

Usage: python research/compare_corpora.py [files...]
Defaults to the reference testdata corpus. Emits one JSON row per
(file, codec) and a summary table.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import json
import os
import sys
import time
import zlib
import lzma
import bz2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CORPUS = [
    "/root/reference/testdata/alice29",
    "/root/reference/testdata/asyoulik",
    "/root/reference/testdata/random_then_unicode",
]


def _lib(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_BROTLI = _lib("libbrotlienc.so.1", "libbrotlienc.so")
_ZSTD = _lib("libzstd.so.1", "libzstd.so")


def brotli_compress(data: bytes, quality: int = 9, lgwin: int = 22) -> bytes:
    out_len = ctypes.c_size_t(len(data) + (len(data) >> 1) + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    ok = _BROTLI.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(out_len), out)
    assert ok, "brotli compress failed"
    return out.raw[:out_len.value]


def zstd_compress(data: bytes, level: int = 19) -> bytes:
    bound = _ZSTD.ZSTD_compressBound(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(bound)
    n = _ZSTD.ZSTD_compress(out, bound, data, len(data), level)
    assert not _ZSTD.ZSTD_isError(n), "zstd compress failed"
    return out.raw[:n]


def divans_tpu_compress(data: bytes, quality: int = 10) -> bytes:
    from divans_tpu.codec import engine_np
    from divans_tpu.options import DivansOptions
    return engine_np.compress(data, DivansOptions(quality=quality))


CODECS = {
    "divans_tpu-q10": lambda d: divans_tpu_compress(d, 10),
    "brotli-q9": lambda d: brotli_compress(d, 9),
    "brotli-q11": lambda d: brotli_compress(d, 11),
    "zstd-19": lambda d: zstd_compress(d, 19),
    "zlib-9": lambda d: zlib.compress(d, 9),
    "lzma-6": lambda d: lzma.compress(d, preset=6),
    "bz2-9": lambda d: bz2.compress(d, 9),
}


def main(files: list[str]) -> None:
    rows = []
    for path in files:
        data = open(path, "rb").read()
        for name, fn in CODECS.items():
            if name.startswith("brotli") and _BROTLI is None:
                continue
            if name.startswith("zstd") and _ZSTD is None:
                continue
            t0 = time.perf_counter()
            blob = fn(data)
            dt = time.perf_counter() - t0
            row = {"file": os.path.basename(path), "codec": name,
                   "raw": len(data), "compressed": len(blob),
                   "ratio": round(len(blob) / len(data), 4),
                   "enc_mbps": round(len(data) / dt / 1e6, 2)}
            rows.append(row)
            print(json.dumps(row))
    # summary table
    files_u = sorted({r["file"] for r in rows})
    codecs_u = [c for c in CODECS if any(r["codec"] == c for r in rows)]
    width = max(len(c) for c in codecs_u)
    print("\nratio summary:")
    print(" " * (width + 2) + "  ".join(f"{f[:14]:>14s}" for f in files_u))
    for c in codecs_u:
        vals = []
        for f in files_u:
            m = [r for r in rows if r["file"] == f and r["codec"] == c]
            vals.append(f"{m[0]['ratio']:>14.4f}" if m else " " * 14)
        print(f"{c:<{width + 2}s}" + "  ".join(vals))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_CORPUS)
