"""Randomized cross-engine equivalence fuzz.

Every supported option combination must yield byte-identical containers
from the golden, jax, and native engines, and every engine must decode
them.  (This fuzz caught the native path bypassing the Python-side IR
optimizer — divans_ir_optimizer configs now stay on the Python path.)
"""
import random

import numpy as np

from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np, jax_engine
from divans_tpu import native

ALICE = open("/root/reference/testdata/alice29", "rb").read()


def _gen(rng, nprng, kind, n):
    if kind == "text":
        off = rng.randrange(0, max(1, len(ALICE) - n))
        return ALICE[off:off + n]
    if kind == "random":
        return nprng.bytes(n)
    if kind == "zeros":
        return bytes(n)
    if kind == "records":
        return b"".join(b"k=%04d;v=%03d|" % (i, i % 7)
                        for i in range(n // 12 + 1))[:n]
    return nprng.bytes(n // 2) + ALICE[:n - n // 2]


def test_fuzz_cross_engine():
    rng = random.Random(7)
    nprng = np.random.RandomState(7)
    for _ in range(18):
        kind = rng.choice(["text", "random", "zeros", "records", "mixed"])
        n = rng.choice([0, 1, 17, 100, 4095, 4097, 20000])
        data = _gen(rng, nprng, kind, n)
        opts = DivansOptions(
            quality=rng.choice([2, 7, 10]),
            use_context_map=rng.random() < 0.8,
            dynamic_context_mixing=rng.choice([0, 1, 3]),
            metablock_size=rng.choice([4096, 1 << 18]),
            chunk_nibbles=rng.choice([0, 0, 128, 1024]),
            divans_ir_optimizer=rng.choice([0, 0, 1]),
            # clustered literal context maps (ir/cmaps.py): non-identity
            # maps exercised end-to-end across every engine
            cmap_clustering=rng.choice([0, 0, 0, 8, 16]),
        )
        bg = engine_np.compress(data, opts)
        assert jax_engine.compress(data, opts) == bg, opts
        nb = native.compress(data, opts)
        if nb is not None:
            assert nb == bg, opts
        assert engine_np.decompress(bg) == data, opts
        assert native.decompress(bg) == data, opts
        assert jax_engine.decompress(bg) == data, opts
