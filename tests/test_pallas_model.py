"""Pallas deferred model-pass mega-kernel vs the normative replay.

Interpret mode (CPU).  The on-chip path was verified bit-exact against
deferred.replay_trace on real TPU hardware (see PERF_NOTES.md); the
trick making that possible is that every matmul operand is an exact
integer < 2^8 (7-bit hi/lo splits), so single-pass bf16 MXU work is
exact regardless of the compiler's pass selection.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.codec import deferred, trace as trace_mod, jax_engine
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands

ALICE = "/root/reference/testdata/alice29"


@pytest.mark.parametrize("chunk", [256])
def test_pallas_model_pass_matches_replay(chunk):
    from divans_tpu.codec.pallas_model import model_pass_deferred_pallas
    data = open(ALICE, "rb").read()[:16384]
    opts = DivansOptions(chunk_nibbles=chunk, metablock_size=4096)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    blocks = [data[o:o + 4096] for o in range(0, len(data), 4096)]
    traces = [trace_mod.build_trace(x, build_commands(x, opts), opts, layout)
              for x in blocks]
    starts, freqs, _ = jax_engine.deferred_model_pass(
        traces, layout, chunk, pallas=True, interpret=True)
    for i, t in enumerate(traces):
        s_h, f_h = deferred.replay_trace(t, chunk)
        assert np.array_equal(starts[i], s_h)
        assert np.array_equal(freqs[i], f_h)
