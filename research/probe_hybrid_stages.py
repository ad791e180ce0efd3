"""On-chip timing of the hybrid encode's device chain, stage by stage:
lit model pass, ANS encode, compact_global vs compact_lane_words, D2H.

Usage: python research/probe_hybrid_stages.py [nblocks]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu.codec import jax_engine  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402
from divans_tpu.codec.pallas_lit_pass import (  # noqa: E402
    _lit_pass_call, assemble_lit_planes, pack_lit_row)
from divans_tpu import native  # noqa: E402
from divans_tpu.ans import pallas_kernels as pk  # noqa: E402


def _sync(r):
    """block_until_ready under-reports on the axon tunnel: sync by
    pulling one element of every output leaf (PERF_NOTES rule)."""
    for leaf in jax.tree_util.tree_leaves(r):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def timed(label, fn, n_iter=4):
    r = fn()
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fn()
        _sync(r)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"  {label:28s} {dt * 1e3:8.1f} ms")
    return r


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunk = 256
    td = "/root/reference/testdata/"
    base = b"".join(open(td + f, "rb").read() for f in
                    ("alice29", "asyoulik", "random_then_unicode"))
    n = nb << 18
    data = (base * (-(-n // len(base))))[:n]
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=chunk,
                         quality=9)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    lit_base = layout.segments["lit_hi"][0]
    blocks = [data[o:o + (1 << 18)] for o in range(0, n, 1 << 18)]
    rows, spds, counts = [], [], []
    for blk in blocks:
        t = native.build_trace(blk, opts, layout)
        lt = jax_engine._rebase_lit(t[t[:, 2] == 1], lit_base)
        r = pack_lit_row(lt, chunk)
        rows.append(r[0])
        spds.append(r[1])
        counts.append(lt.shape[0])
    n_p = max(jax_engine._padded_len(2 * max(len(r) for r in rows), chunk),
              chunk)
    packed, spd_pl = assemble_lit_planes(rows, spds, n_p, chunk)
    print(f"batch {nb} blocks, lit rows max {max(counts)}, n_p {n_p}, "
          f"packed {packed.nbytes / 1e6:.1f} MB")

    pd = timed("H2D packed", lambda: jax.device_put(packed))
    sd = jax.device_put(spd_pl)
    interp = jax_engine._kernel_interpret()
    st, fr = timed("lit pass", lambda: _lit_pass_call(pd, sd, chunk, interp))
    st, fr = st[:nb], fr[:nb]
    cnt = jnp.asarray(np.array(counts, np.int32))
    g = max(1, -(-nb // pk.LANE))
    n_pad = -(-st.shape[1] // pk.BLOCK_T) * pk.BLOCK_T
    packed_lanes = timed("pack_device_lanes", lambda:
                         jax_engine._pack_device_lanes(st, fr, cnt, g, n_pad))
    stp, frp, cntp = packed_lanes
    enc = timed("encode_lanes_pallas", lambda:
                pk.encode_lanes_pallas(stp, frp, cntp, interpret=interp))
    words, flags, states = enc
    cg = timed("compact_global", lambda:
               pk.compact_global(words, flags, cntp))
    flat, nw = cg
    cl = timed("compact_lane_words", lambda:
               pk.compact_lane_words(words, flags, cntp))
    nw_np = np.asarray(nw)
    total = int(nw_np.sum())
    k = jax_engine._padded_len(max(total, 1), 1)
    print(f"  total words {total} -> trim {k} ({k * 2 / 1e6:.2f} MB)")
    tr = timed("trim", lambda: pk.trim_rows(flat, k))
    timed("D2H flat", lambda: np.asarray(tr), n_iter=2)


if __name__ == "__main__":
    main()
