"""Batched JAX rANS kernels — the TPU entropy-coding path.

Implements the rans32 wire format defined by the golden coder
(ans/coder_np.py): 32-bit state in [2^15, 2^31), 15-bit frequencies,
16-bit renormalization, at most one conditional pull per symbol.  All
arithmetic is int32 — no 64-bit ops anywhere, so every step maps to
native VPU lanes.

Lane model: one "lane" is one independent ANS stream (a metablock's cmd
or lit stream).  Encoding is a reverse `lax.scan` over the (start, freq)
trace, vmapped over lanes; decoding exposes step functions (`peek`,
`advance`) that the codec FSM scan composes with CDF lookups.

The encoder here is asserted byte-identical to the golden coder by
tests/test_ans_kernels.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import LOG2_SCALE
from .coder_np import RENORM_BITS, STATE_LOW, ENC_START_STATE

SCALE_MASK = (1 << LOG2_SCALE) - 1


# ----------------------------------------------------------------- encode

def _encode_lane(starts, freqs, count):
    """Reverse-encode one lane's chronological (start, freq) trace.

    starts/freqs: int32[N] (chronological, padded); count: int32 scalar.
    Returns (words int32[N] compacted to front in wire order,
             nwords int32, state int32).
    """
    n = starts.shape[0]

    def step(state, xs):
        start, freq, valid = xs
        freq = jnp.maximum(freq, 1)
        flag = valid & (state >= (freq << RENORM_BITS))
        word = state & 0xFFFF
        state = jnp.where(flag, state >> RENORM_BITS, state)
        coded = ((state // freq) << LOG2_SCALE) + (state % freq) + start
        state = jnp.where(valid, coded, state)
        return state, (word, flag)

    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    # scan over reversed time: t = n-1 .. 0
    state, (words_r, flags_r) = jax.lax.scan(
        step, jnp.int32(ENC_START_STATE),
        (starts[::-1], freqs[::-1], valid[::-1]))
    # wire order is forward-symbol order: un-reverse, then compact
    words = words_r[::-1]
    flags = flags_r[::-1]
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    nwords = jnp.where(flags.size, pos[-1] + 1, 0).astype(jnp.int32)
    out = jnp.zeros(n, jnp.int32).at[jnp.where(flags, pos, n)].set(
        words, mode="drop")
    return out, nwords, state


encode_lanes = jax.jit(jax.vmap(_encode_lane))
"""(starts int32[B,N], freqs int32[B,N], counts int32[B]) ->
(words int32[B,N], nwords int32[B], states int32[B])."""


def lanes_to_bytes(words, nwords, states) -> list[bytes]:
    """Assemble per-lane wire bytes host-side from encode_lanes output."""
    import numpy as np
    words = np.asarray(words)
    nwords = np.asarray(nwords)
    states = np.asarray(states)
    out = []
    for lane in range(words.shape[0]):
        k = int(nwords[lane])
        if k == 0 and int(states[lane]) == ENC_START_STATE:
            # empty lane: golden encoder emits nothing for zero symbols —
            # but a lane that coded >=1 symbol always moves its state, so
            # state == start is the unambiguous empty marker.
            out.append(b"")
            continue
        buf = bytearray(int(states[lane]).to_bytes(4, "little"))
        buf += np.ascontiguousarray(
            words[lane, :k].astype(np.uint16)).tobytes()
        out.append(bytes(buf))
    return out


def bytes_to_lane(data: bytes, width: int):
    """Parse one lane's wire bytes into (state, words int32[width], nwords)."""
    import numpy as np
    if not data:
        return ENC_START_STATE, np.zeros(width, np.int32), 0
    state = int.from_bytes(data[:4], "little")
    w = np.frombuffer(data[4:], dtype="<u2").astype(np.int32)
    assert w.shape[0] <= width, (w.shape[0], width)
    words = np.zeros(width, np.int32)
    words[:w.shape[0]] = w
    return state, words, w.shape[0]


# ----------------------------------------------------------------- decode

def dec_init(states, xp=jnp):
    """Decoder state pytree for a batch of lanes.

    states: int32[B] (the u32 final-state words from the wire).
    Word arrays are passed to each step separately (they are large and
    static; keeping them out of the carry lets XLA alias them).
    """
    return {"state": xp.asarray(states, jnp.int32),
            "pos": xp.zeros_like(xp.asarray(states, jnp.int32))}


def dec_peek(ans, words, gate=None):
    """Pull a renorm word if due, return (new_ans, slot int32[B]).

    words: int32[B, W] — each lane's u16 renorm words in wire order.
    `gate`: bool[B] lanes decoding from this stream this step (inactive
    lanes must not consume words).
    """
    state, pos = ans["state"], ans["pos"]
    pull = state < STATE_LOW
    if gate is not None:
        pull = pull & gate
    w = jnp.take_along_axis(words, pos[:, None] % words.shape[1],
                            axis=1)[:, 0]
    state = jnp.where(pull, (state << RENORM_BITS) | w, state)
    pos = pos + pull.astype(jnp.int32)
    return {"state": state, "pos": pos}, state & SCALE_MASK


def dec_advance(ans, start, freq, gate=None):
    """Consume the peeked symbol's (start, freq). `gate`: bool[B] lanes
    that actually coded a symbol this step (False = leave state alone)."""
    state = ans["state"]
    nxt = freq * (state >> LOG2_SCALE) + (state & SCALE_MASK) - start
    if gate is not None:
        nxt = jnp.where(gate, nxt, state)
    return {"state": nxt, "pos": ans["pos"]}
