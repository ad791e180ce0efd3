"""Pallas TPU decode kernel for the deferred-profile literal stream.

The reference's decode story is consumer parallelism: a 2-thread pipeline
with a cmd-decode thread and a literal-decode main thread pulling two
interleaved ANS streams (src/parallel_decompressor.rs:99-133,
src/codec/decoder.rs:229-419) through a 4-byte-pull rANS loop
(src/ans.rs:172-253).  The TPU build keeps that split and adds breadth:

  * the cmd stream decodes host-side (deferred.decode_cmd_structure —
    deferred-v2's per-stream chunk clocks make it fully independent of
    literal values);
  * the literal stream — the hot ~80% of coded nibbles — decodes here:
    128 metablock lanes in lockstep inside one Mosaic kernel, one
    literal byte (two coded nibbles) per lane per step, gather-only
    within a chunk thanks to the deferred model profile
    (codec/deferred.py);
  * commands then execute host-side at memcpy speed
    (deferred.execute_script).

Deferred-v2's self-fed literal history means this pass needs no window
and no command context at all: it is a pure byte-stream transform
(lit stream, count, PredictionMode config) -> literal bytes.

Layout (decided by research/probe_decode_spike*.py; scalar per-lane
fetch is dead at ~200ns/crossing, lane-per-column select-scan measured
viable at ~4us per 128-lane byte step):

  * lane l = column l (128 lanes per kernel);
  * a CDF plane is [16, 128]: entry e of lane l at (e, l);
  * the lit model is [16 * 384, 128]: 384 CDF planes in kernel order
    [lit_hi(64) | cm_first(64) | lit_lo(128) | cm_second(128, permuted
    to (ctx>>3, hi) so the lo fetch shares one select-scan index];
  * per-lane scalars are [1, 128] planes; per-lane tables (context map,
    renorm words) use `jnp.take_along_axis` sublane gathers
    (tpu.dynamic_gather) in 8-row vreg chunks;
  * chunk-boundary model commits run OUTSIDE the kernel between chunk
    calls, sharing the exact histogram/renorm/mixer math with the
    encode pass (jax_engine._chunk_histogram / _apply_pend), fed by the
    kernel's per-byte (ctx, byte, freqs) logs.

Wire semantics are normative in codec/deferred.py; `decode_literals_np`
below is the readable oracle the kernel is tested bit-equal against.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG2_SCALE

READY = False  # flipped True once the kernel is wired + validated

LANES = 128
N_HI = 64          # lit_hi planes (cm profile: (1, 64))
N_LO = 128         # lit_lo planes ((8, 16) bucketed)


# ======================================================================
# numpy oracle: standalone deferred-v2 literal-stream decode
# ======================================================================

def decode_literals_np(lit_stream: bytes, n_bytes: int, lcmap, speeds,
                       chunk: int) -> bytes:
    """Decode `n_bytes` literal bytes from a deferred-v2 lit stream.

    Mirrors the literal path of deferred.make_deferred_codec exactly
    (cm profile, mm_opts == 0, mixing on, UTF8 luts, btype 0); row keys
    match the codec's (table, *key) identities so the chunk histograms
    agree bit-for-bit."""
    from ..ans.coder_np import ANSDecoder
    from ..probability import scalar
    from .. import constants
    from .deferred import DeferredPolicy, weight_adjustments

    lut0 = constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8)
    lut1 = constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8)
    dec = ANSDecoder(lit_stream)
    pol = DeferredPolicy(chunk)
    sp0, sp2, sp3 = speeds[0], speeds[2], speeds[3]
    out = bytearray()
    p1 = p2 = 0

    def nib(nib_key, cm_key, which, cm_sp):
        nibble_prob = pol.row(nib_key)
        cm_prob = pol.row(cm_key)
        w = pol.weights[which]
        mixed = scalar.average(cm_prob, nibble_prob, w[2] & 0xFFFF)
        off = dec.peek_offset()
        v = scalar.offset_to_sym(mixed, off)
        start, freq = scalar.sym_to_start_freq(mixed, v)
        dec.advance(start, freq)
        p_cm = scalar.sym_to_start_freq(cm_prob, v)[1]
        p_nib = scalar.sym_to_start_freq(nibble_prob, v)[1]
        pol.record_wadj(which, *weight_adjustments(p_cm, p_nib, freq))
        pol.record_blend(cm_key, v, cm_sp.inc, cm_sp.lim)
        pol.record_blend(nib_key, v, sp0.inc, sp0.lim)
        pol.tick()
        return v

    for _ in range(n_bytes):
        sel = int(lut0[p1]) | int(lut1[p2])
        ctx = int(lcmap[sel])
        hi = nib(("lit_hi", 0, 0, ctx), ("cm", 0, ctx), 1, sp3)
        lo = nib(("lit_lo", 0, ctx >> 3, hi), ("cm", 1, hi, ctx >> 3), 0, sp2)
        b = (hi << 4) | lo
        out.append(b)
        p2, p1 = p1, b
    return bytes(out)
