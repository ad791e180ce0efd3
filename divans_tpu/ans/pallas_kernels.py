"""Pallas TPU kernels for the wide interleaved rANS coder.

The XLA `lax.scan` coder (ans/kernels.py) pays ~10us per loop iteration;
these kernels run the same per-symbol recurrence inside one Mosaic
program at VPU rate (~1 cycle/op on a [G, 128] lane tile), so thousands
of lanes advance one symbol every few ns.

Wire semantics are identical to ans/kernels.encode_lanes (rans32: 32-bit
state, 16-bit renorm, 15-bit freqs) and are asserted bit-equal by
tests/test_pallas_ans.py.

Lane layout: lanes form a [G, 128] tile (G sublane groups x 128 VPU
lanes).  The symbol axis is blocked by BLOCK_T rows per grid step with
the grid walked in reverse (rANS encodes the trace backwards); the
running state lives in a VMEM scratch carried across grid steps.

Outputs are *uncompacted* ([N, G, 128] words + emit flags); per-lane
wire assembly (drop non-emitted slots, prepend final state) is a cheap
host/numpy pass — the irregular per-lane stream lengths are exactly what
the TPU should not serialize on.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG2_SCALE
from .coder_np import RENORM_BITS, ENC_START_STATE

BLOCK_T = 512
LANE = 128


def _exact_div(a, b):
    """floor(a / b) for int32 a in [0, 2^31), b in [1, 2^15), exactly.

    f32 reciprocal estimate + one refinement step + bounded fixups (the
    first estimate is within ~2^8 of the true quotient for a < 2^31, the
    refinement brings it within 1, fixups settle the boundary cases).
    """
    rec = pl.reciprocal(b.astype(jnp.float32), approx=False)
    q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    q = q + (rem.astype(jnp.float32) * rec).astype(jnp.int32)
    rem = a - q * b
    for _ in range(2):
        q = q + (rem >= b).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = a - q * b
    return q


def _encode_kernel(counts_ref, starts_ref, freqs_ref, words_ref, flags_ref,
                   state_ref, *, t_total):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        state_ref[:] = jnp.full_like(state_ref, ENC_START_STATE)

    base = (nblk - 1 - i) * BLOCK_T
    counts = counts_ref[:]

    def body(j, _):
        t = BLOCK_T - 1 - j
        valid = (base + t) < counts
        start = starts_ref[t]
        freq = jnp.maximum(freqs_ref[t], 1)
        state = state_ref[:]
        flag = valid & (state >= (freq << RENORM_BITS))
        words_ref[t] = (state & 0xFFFF).astype(jnp.int16)
        flags_ref[t] = flag.astype(jnp.int8)
        state = jnp.where(flag, state >> RENORM_BITS, state)
        q = _exact_div(state, freq)
        coded = (q << LOG2_SCALE) + (state - q * freq) + start
        state_ref[:] = jnp.where(valid, coded, state)
        return ()

    jax.lax.fori_loop(0, BLOCK_T, body, ())


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_lanes_pallas(starts, freqs, counts, interpret=False):
    """starts/freqs int32[N, G, 128], counts int32[G, 128] ->
    (words int16[N, G, 128], flags int8[N, G, 128], states int32[G, 128]).

    Symbol t of a lane is starts[t, g, l]; rows >= counts are padding.
    """
    n, g, lane = starts.shape
    assert lane == LANE and n % BLOCK_T == 0, (n, g, lane)
    nblk = n // BLOCK_T

    rev = lambda i: (nblk - 1 - i, 0, 0)  # noqa: E731
    words, flags, state = pl.pallas_call(
        functools.partial(_encode_kernel, t_total=n),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((g, lane), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, g, lane), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, g, lane), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_T, g, lane), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, g, lane), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lane), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, g, lane), jnp.int16),
            jax.ShapeDtypeStruct((n, g, lane), jnp.int8),
            jax.ShapeDtypeStruct((g, lane), jnp.int32),
        ),
        interpret=interpret,
    )(counts, starts, freqs)
    return words, flags, state


@jax.jit
def compact_lane_words(words, flags, counts):
    """Device-side compaction of the kernel's word/flag planes.

    words int16[N, G, 128], flags int8[N, G, 128], counts int32[G, 128]
    (per-lane symbol counts) -> (words scatter-compacted to emission
    order [N, G, 128] uint16, per-lane word counts int32[G, 128]).

    The emitted words are ~half the compressed bytes, so shipping the
    compacted prefix (caller slices to the max word count) instead of
    the raw N-row word+flag planes cuts the D2H by ~50-100x — on the
    axon tunnel (~46 MB/s) the uncompacted transfer dominated the whole
    encode."""
    n, g, lane = words.shape
    t = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    live = (flags != 0) & (t < counts[None, :, :])
    pos = jnp.cumsum(live.astype(jnp.int32), axis=0) - 1
    pos = jnp.where(live, pos, n)          # out of range -> dropped
    gi = jnp.arange(g, dtype=jnp.int32)[None, :, None]
    li = jnp.arange(lane, dtype=jnp.int32)[None, None, :]
    out = jnp.zeros_like(words).at[
        jnp.broadcast_to(pos, (n, g, lane)),
        jnp.broadcast_to(gi, (n, g, lane)),
        jnp.broadcast_to(li, (n, g, lane))].set(
            words, mode="drop", unique_indices=False)
    return out.astype(jnp.uint16), jnp.sum(live.astype(jnp.int32), axis=0)


@functools.partial(jax.jit, static_argnames=("k",))
def trim_rows(x, k):
    return x[:k]


@jax.jit
def compact_global(words, flags, counts, states):
    """Device-side GLOBAL compaction: all lanes' emitted words into one
    flat lane-major stream.

    words int16[N, G, 128], flags int8[N, G, 128], counts int32[G, 128],
    states int32[G, 128] -> (flat uint16[N*G*128] with lane i's words at
    [sum(nw[:i]), sum(nw[:i+1])) in emission order, header int32[2, G,
    128] = stacked (nw, states) so one small D2H carries both — each
    pull over the axon tunnel costs ~15-30 ms of latency).

    Unlike compact_lane_words (a per-lane rectangle whose D2H ships
    max-lane rows for EVERY lane, dead lanes included), the flat stream's
    live prefix is exactly the compressed payload — the caller slices to
    a shape bucket of sum(nw) and ships ~compressed-size bytes."""
    n, g, lane = words.shape
    t = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    live = (flags != 0) & (t < counts[None, :, :])
    nw = jnp.sum(live.astype(jnp.int32), axis=0)                # [G,128]
    nwf = nw.reshape(-1)
    lane_off = (jnp.cumsum(nwf) - nwf).reshape(g, lane)
    pos = jnp.cumsum(live.astype(jnp.int32), axis=0) - 1 + lane_off[None]
    pos = jnp.where(live, pos, n * g * lane)       # out of range -> drop
    flat = jnp.zeros((n * g * lane,), words.dtype).at[pos.reshape(-1)].set(
        words.reshape(-1), mode="drop", unique_indices=False)
    return flat.astype(jnp.uint16), jnp.stack([nw, states])


def assemble_global(flat, nw, states, lane_counts) -> list[bytes]:
    """Global-compacted device output -> per-lane wire bytes (host pass).

    Byte-identical to assemble_lane_bytes on the same kernel outputs.
    flat/nw/states are host numpy arrays (already pulled)."""
    nwf = np.asarray(nw).reshape(-1).astype(np.int64)
    states = np.asarray(states).reshape(-1)
    offs = np.concatenate([[0], np.cumsum(nwf)])
    out = []
    for i, c in enumerate(lane_counts):
        if c == 0:
            out.append(b"")
            continue
        buf = bytearray(int(states[i]).to_bytes(4, "little"))
        buf += flat[offs[i]:offs[i + 1]].astype("<u2").tobytes()
        out.append(bytes(buf))
    return out


def assemble_compact(w16, nwords, states, lane_counts) -> list[bytes]:
    """Compacted device output -> per-lane wire bytes (host pass).

    Byte-identical to assemble_lane_bytes on the same kernel outputs:
    compaction preserves the emission order and the per-symbol-count
    gating (compact_lane_words masks rows >= counts)."""
    w16 = np.asarray(w16)
    nwords = np.asarray(nwords)
    states = np.asarray(states)
    out = []
    for i, c in enumerate(lane_counts):
        gi, li = divmod(i, LANE)
        if c == 0:
            out.append(b"")
            continue
        k = int(nwords[gi, li])
        buf = bytearray(int(states[gi, li]).to_bytes(4, "little"))
        buf += w16[:k, gi, li].astype("<u2").tobytes()
        out.append(bytes(buf))
    return out


def pack_lanes(lane_starts, lane_freqs, lane_counts):
    """Ragged per-lane (start, freq) lists -> [N, G, 128] kernel inputs."""
    nlanes = len(lane_counts)
    g = max(1, -(-nlanes // LANE))
    n = -(-max(1, max(lane_counts)) // BLOCK_T) * BLOCK_T
    starts = np.zeros((n, g, LANE), np.int32)
    freqs = np.ones((n, g, LANE), np.int32)
    counts = np.zeros((g, LANE), np.int32)
    for i, (s, f, c) in enumerate(zip(lane_starts, lane_freqs, lane_counts)):
        gi, li = divmod(i, LANE)
        starts[:c, gi, li] = s
        freqs[:c, gi, li] = f
        counts[gi, li] = c
    return starts, freqs, counts


def assemble_lane_bytes(words, flags, states, lane_counts) -> list[bytes]:
    """Uncompacted kernel output -> per-lane wire bytes (host pass).

    Byte-identical to ans/kernels.lanes_to_bytes on the same streams."""
    words = np.asarray(words).astype(np.uint16)
    flags = np.asarray(flags).astype(bool)
    states = np.asarray(states)
    out = []
    for i, c in enumerate(lane_counts):
        gi, li = divmod(i, LANE)
        if c == 0:
            out.append(b"")
            continue
        w = words[:c, gi, li][flags[:c, gi, li]]
        buf = bytearray(int(states[gi, li]).to_bytes(4, "little"))
        buf += w.astype("<u2").tobytes()
        out.append(bytes(buf))
    return out
