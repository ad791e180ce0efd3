"""Pallas wide-rANS encode kernel vs the XLA scan coder (bit-equality).

Runs in interpret mode (CPU); the on-chip path is exercised by bench.py
and produces identical wire bytes by construction (same jaxpr).
"""
import numpy as np
import jax.numpy as jnp

from divans_tpu.ans import kernels, pallas_kernels as pk


def _ragged_lanes(seed, nlanes, maxn):
    rng = np.random.RandomState(seed)
    lane_s, lane_f, lane_c = [], [], []
    for _ in range(nlanes):
        c = int(rng.randint(0, maxn))
        f = rng.randint(1, 6000, c).astype(np.int32)
        s = np.minimum(rng.randint(0, 32767, c), 32768 - f).astype(np.int32)
        lane_s.append(s)
        lane_f.append(f)
        lane_c.append(c)
    return lane_s, lane_f, lane_c


def test_encode_matches_scan_coder():
    lane_s, lane_f, lane_c = _ragged_lanes(7, 9, 1200)
    starts, freqs, counts = pk.pack_lanes(lane_s, lane_f, lane_c)
    w, fl, st = pk.encode_lanes_pallas(
        jnp.asarray(starts), jnp.asarray(freqs), jnp.asarray(counts),
        interpret=True)
    got = pk.assemble_lane_bytes(w, fl, st, lane_c)

    n2 = 1 << max(4, (max(lane_c) - 1).bit_length())
    ls = np.zeros((len(lane_c), n2), np.int32)
    lf = np.ones((len(lane_c), n2), np.int32)
    for i, c in enumerate(lane_c):
        ls[i, :c] = lane_s[i]
        lf[i, :c] = lane_f[i]
    words, nwords, states = kernels.encode_lanes(
        jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(np.array(lane_c, np.int32)))
    ref = kernels.lanes_to_bytes(words, nwords, states)
    assert got == ref


def test_multi_group_lanes():
    # > 128 lanes forces a second sublane group
    lane_s, lane_f, lane_c = _ragged_lanes(3, 130, 40)
    starts, freqs, counts = pk.pack_lanes(lane_s, lane_f, lane_c)
    assert starts.shape[1] == 2
    w, fl, st = pk.encode_lanes_pallas(
        jnp.asarray(starts), jnp.asarray(freqs), jnp.asarray(counts),
        interpret=True)
    got = pk.assemble_lane_bytes(w, fl, st, lane_c)
    n2 = 64
    ls = np.zeros((len(lane_c), n2), np.int32)
    lf = np.ones((len(lane_c), n2), np.int32)
    for i, c in enumerate(lane_c):
        ls[i, :c] = lane_s[i]
        lf[i, :c] = lane_f[i]
    words, nwords, states = kernels.encode_lanes(
        jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(np.array(lane_c, np.int32)))
    assert got == kernels.lanes_to_bytes(words, nwords, states)
