"""Packed-lane Pallas lit-pass kernel: bit-exactness vs the XLA pass.

The kernel (codec/pallas_lit_pass.py) must return byte-identical
(starts, freqs) to jax_engine.model_pass_deferred_lit for every
cm-profile deferred lit trace — including non-multiple-of-8 batches,
empty lanes, long streams (mixer weights wrap through the i16 norm),
and no-mixing (dynamic_context_mixing=0) streams.
"""
import numpy as np
import jax.numpy as jnp

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec import pallas_lit_pass as plp
from divans_tpu.ir.matcher import build_commands

CHUNK = 256
LAYOUT = ModelLayout(PROFILES["cm"], lo_bucketed=True)


def _lit_traces(n_blocks=2, mb_bits=14, mixing=1):
    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << mb_bits, chunk_nibbles=CHUNK,
                         dynamic_context_mixing=mixing)
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, n_blocks * mb, mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, LAYOUT)
              for b in blocks]
    _c, lit_ts, _m, _rc, r_lit = jax_engine.split_stream_traces(traces,
                                                                LAYOUT)
    assert jax_engine._lit_pass_usable(LAYOUT, lit_ts)
    return lit_ts, r_lit


def _compare(lit_ts, r_lit):
    n_padded = max(jax_engine._padded_len(
        max((t.shape[0] for t in lit_ts), default=1), CHUNK), CHUNK)
    res = plp.model_pass_lit_pallas(lit_ts, CHUNK, n_padded, interpret=True)
    assert res is not None, "packing rejected an in-envelope trace"
    st_p, fr_p = np.asarray(res[0]), np.asarray(res[1])
    lit_pad = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=CHUNK))
    spd = jnp.asarray(jax_engine.lit_speeds_from_traces(lit_ts))
    st_x, fr_x = jax_engine.model_pass_deferred_lit(lit_pad, spd, r_lit,
                                                    CHUNK)
    st_x, fr_x = np.asarray(st_x), np.asarray(fr_x)
    assert st_x.shape == st_p.shape, (st_x.shape, st_p.shape)
    assert np.array_equal(st_x, st_p)
    assert np.array_equal(fr_x, fr_p)


def test_real_traces_bit_exact():
    # 4 chunks+ per lane so lagged commits, renorms, and the mixer's
    # i16-wrapped norm weight (nw & 0xFFFF) are all exercised
    _compare(*_lit_traces())


def test_nonmultiple_batch_and_empty_lane():
    lit_ts, r_lit = _lit_traces(n_blocks=3)
    lit_ts = [lit_ts[0], np.zeros((0, 10), np.int32), lit_ts[1], lit_ts[2],
              lit_ts[0][:512]]
    _compare(lit_ts, r_lit)


def test_no_mixing_traces():
    lit_ts, r_lit = _lit_traces(mixing=0)
    assert all((t[:, 5] == 0).all() for t in lit_ts)
    _compare(lit_ts, r_lit)


def test_out_of_envelope_returns_none():
    lit_ts, _ = _lit_traces(n_blocks=1)
    bad = lit_ts[0].copy()
    bad[3, 0] = 7  # a lo-position row pointing at a hi-range row
    assert plp.pack_lit_traces([bad], 1024, CHUNK) is None
    odd = lit_ts[0][:511]
    assert plp.pack_lit_traces([odd], 1024, CHUNK) is None
