"""Packed-lane Pallas cmd-pass kernel: bit-exactness vs the XLA pass.

The kernel (codec/pallas_cmd_pass.py) must return byte-identical
(starts, freqs) to jax_engine.model_pass_deferred_cmd for every trace
with row-constant speeds — including non-multiple-of-8 batches, empty
lanes, and renorm-heavy speeds (the lagged-commit + while-renorm path).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec import deferred as deferred_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.codec import pallas_cmd_pass as pcp
from divans_tpu.ir.matcher import build_commands

CHUNK = 256
S_CMD = deferred_mod.cmd_chunk(CHUNK)


def _xla(cmd_ts, inc_row, lim_row, r_cmd):
    cmd_pad = jnp.asarray(jax_engine._pad_traces(cmd_ts, multiple=S_CMD))
    st, fr = jax_engine.model_pass_deferred_cmd(
        cmd_pad, jnp.asarray(inc_row), jnp.asarray(lim_row), r_cmd, S_CMD)
    return np.asarray(st), np.asarray(fr), cmd_pad.shape[1]


def _pallas(cmd_ts, inc_row, lim_row, r_cmd, n_padded):
    st, fr = pcp.model_pass_cmd_pallas(cmd_ts, inc_row, lim_row, r_cmd,
                                       S_CMD, n_padded, interpret=True)
    return np.asarray(st), np.asarray(fr)


def _real_traces(n_blocks=3, mb_bits=14):
    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << mb_bits, chunk_nibbles=CHUNK)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, n_blocks * mb, mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]
    cmd_ts, _l, _m, r_cmd, _rl = jax_engine.split_stream_traces(traces, layout)
    cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
    assert cspd is not None
    return cmd_ts, cspd[0], cspd[1], r_cmd


def test_real_traces_bit_exact():
    cmd_ts, inc_row, lim_row, r_cmd = _real_traces()
    st_x, fr_x, n_padded = _xla(cmd_ts, inc_row, lim_row, r_cmd)
    st_p, fr_p = _pallas(cmd_ts, inc_row, lim_row, r_cmd, n_padded)
    assert np.array_equal(st_x, st_p)
    assert np.array_equal(fr_x, fr_p)


def test_nonmultiple_batch_and_empty_lane():
    cmd_ts, inc_row, lim_row, r_cmd = _real_traces()
    # 5 lanes (not a multiple of G=8), one of them empty
    cmd_ts = [cmd_ts[0], np.zeros((0, 10), np.int32), cmd_ts[1],
              cmd_ts[2][:S_CMD * 3], cmd_ts[0][:7]]
    st_x, fr_x, n_padded = _xla(cmd_ts, inc_row, lim_row, r_cmd)
    st_p, fr_p = _pallas(cmd_ts, inc_row, lim_row, r_cmd, n_padded)
    assert st_p.shape == st_x.shape
    assert np.array_equal(st_x, st_p)
    assert np.array_equal(fr_x, fr_p)


@pytest.mark.parametrize("inc,lim", [(1024, 8192), (700, 4096)])
def test_renorm_heavy_speeds(inc, lim):
    """Fast adaptation forces the multi-pass boundary renorm."""
    rng = np.random.default_rng(7)
    r_cmd = 19
    b = 9
    cmd_ts = []
    for i in range(b):
        n = int(rng.integers(1, 5 * S_CMD))
        t = np.zeros((n, 10), np.int32)
        t[:, 0] = rng.integers(0, r_cmd, n)       # rows
        t[:, 1] = rng.integers(0, 16, n)          # nibbles
        t[:, 3] = inc
        t[:, 4] = lim
        cmd_ts.append(t)
    inc_row = np.full(r_cmd, inc, np.int32)
    lim_row = np.full(r_cmd, lim, np.int32)
    st_x, fr_x, n_padded = _xla(cmd_ts, inc_row, lim_row, r_cmd)
    st_p, fr_p = _pallas(cmd_ts, inc_row, lim_row, r_cmd, n_padded)
    assert np.array_equal(st_x, st_p)
    assert np.array_equal(fr_x, fr_p)
