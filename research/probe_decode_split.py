"""Split the decode scan's per-step cost: Pallas kernel alone vs the
XLA glue (premix gather/average, histograms, pend commit).

Usage: python research/probe_decode_split.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from divans_tpu.codec import pallas_decode as pd  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402


def timed(fn, *a, n=20):
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    chunk = 256
    s_bytes = chunk // 2
    n_wrows = chunk // 2 + 8
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    # ---- kernel alone
    call = jax.jit(pd._chunk_call(s_bytes, n_wrows, interp))
    kmodel = jnp.asarray(
        rng.integers(1, 1 << 14, ((pd.N_HI + pd.N_LO) * 16, 128)), jnp.int16)
    # make each plane a valid nondecreasing CDF so the ANS math is sane
    km = np.asarray(kmodel, np.int32).reshape(-1, 16, 128)
    km = np.cumsum(np.abs(km) % 512 + 1, axis=1)
    kmodel = jnp.asarray(km.reshape(-1, 128).astype(np.int16))
    words = jnp.asarray(rng.integers(0, 1 << 31, (n_wrows, 128)), jnp.int32)
    lcmap = jnp.asarray(rng.integers(0, 1 << 24, (16, 128)), jnp.int32)
    luts = jnp.asarray(rng.integers(0, 1 << 24, (128, 128)), jnp.int32)
    sc = np.zeros((8, 128), np.int32)
    sc[0] = rng.integers(1 << 16, 1 << 30, 128)
    sc[3] = s_bytes
    sc = jnp.asarray(sc)
    dt_k = timed(call, kmodel, words, lcmap, luts, sc)
    print(f"pallas kernel alone: {dt_k*1e3:8.3f} ms/step "
          f"({128*s_bytes/dt_k/1e6:.1f} MB lit/s)")

    # ---- full scan step (n_chunks small so per-step cost is visible)
    perm, offs = pd.kernel_perm(layout)
    states = jnp.asarray(rng.integers(1 << 16, 1 << 30, 128), jnp.int32)
    for n_chunks in (4, 8, 16):
        wlen = n_chunks * (s_bytes // 2) + 16
        wordsb = jnp.asarray(
            rng.integers(0, 1 << 31, (128, wlen)), jnp.int32)
        n_lit = jnp.full((128,), n_chunks * s_bytes, jnp.int32)
        lcm = jnp.asarray(rng.integers(0, 1 << 24, (16, 128)), jnp.int32)
        spd = jnp.asarray(
            np.tile([4, 4096, 4, 4096, 4, 4096], (128, 1)), jnp.int32)
        f = functools_partial(pd._decode_lit_scan, r_lit=385, chunk=chunk,
                              n_chunks=n_chunks, offs=offs, interpret=interp)
        dt = timed(lambda: f(states, wordsb, n_lit, lcm, luts,
                             spd, jnp.asarray(perm))[0], n=8)
        print(f"full scan n_chunks={n_chunks:3d}: {dt*1e3:8.2f} ms total, "
              f"{dt/n_chunks*1e3:7.2f} ms/step "
              f"({128*s_bytes*n_chunks/dt/1e6:.1f} MB lit/s)")


def functools_partial(fn, **kw):
    import functools
    return functools.partial(fn, **kw)


if __name__ == "__main__":
    main()
