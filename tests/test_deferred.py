"""Deferred-adaptation profile (codec/deferred.py) tests.

The deferred profile is a format variant: all engines that claim it must
agree byte-for-byte (policy codec == trace replay == jax engine) and
round-trip, at a bounded ratio cost vs per-nibble adaptation.
"""
import numpy as np
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.codec import deferred, engine_np, trace as trace_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.ans.coder_np import ANSEncoder
from divans_tpu.probability.scalar import CDF_INIT

ALICE = "/root/reference/testdata/alice29"


def _alice(n):
    with open(ALICE, "rb") as f:
        return f.read()[:n]


# ----------------------------------------------------------- format rules

def test_flags_codec():
    assert deferred.chunk_to_flags(0) == 0
    assert deferred.flags_to_chunk(0) == 0
    for chunk in (16, 64, 256, 1024):
        f = deferred.chunk_to_flags(chunk)
        assert deferred.flags_to_chunk(f) == chunk
        assert f & 0b11 == 0  # profile bits untouched
    with pytest.raises(AssertionError):
        deferred.chunk_to_flags(100)


def test_apply_row_update_monotone_and_bounded():
    rng = np.random.RandomState(7)
    for _ in range(200):
        row = list(CDF_INIT)
        # random prior adds keep it a valid monotone cdf
        for _h in range(rng.randint(0, 40)):
            a, s = int(rng.randint(0, 0x180)), int(rng.randint(0, 16))
            deferred.apply_row_update(
                row, [a * (i >= s) for i in range(16)], 0x4000)
        add = int(rng.randint(1, 0x180))
        sym = int(rng.randint(0, 16))
        deferred.apply_row_update(row, [add * (i >= sym) for i in range(16)],
                                  int(rng.choice([0x1000, 0x2000, 0x4000])))
        assert all(row[i] < row[i + 1] for i in range(15)), row
        assert 0 < row[15] < 0x8000, row


def test_apply_row_update_worst_case_converges():
    # the largest possible chunk accumulation must renorm into int16 range
    row = [0x3FFF - 15 + i for i in range(16)]
    deferred.apply_row_update(row, [1024 * 0x180] * 16, 0x1000)
    assert row[15] < 0x1000 + 0x180
    assert all(row[i] < row[i + 1] for i in range(15))


def test_weight_adjustments_clamped_and_w_independent():
    a0, a1 = deferred.weight_adjustments(32000, 1, 1)
    assert abs(a0) <= deferred.ADJ_CLAMP and abs(a1) <= deferred.ADJ_CLAMP
    # degenerate weighted freq must not raise (negative shift guard)
    deferred.weight_adjustments(1, 1, 0)


# ----------------------------------------------------- engine equivalence

@pytest.mark.parametrize("chunk", [64, 256])
def test_roundtrip_and_replay_equivalence(chunk):
    data = _alice(12288)
    opts = DivansOptions(chunk_nibbles=chunk)
    blob = engine_np.compress(data, opts)
    assert engine_np.decompress(blob) == data

    # trace replay produces the identical streams
    cmds = build_commands(data, opts)
    tr = trace_mod.build_trace(data, cmds, opts,
                               ModelLayout(PROFILES["cm"], lo_bucketed=True))
    starts, freqs = deferred.replay_trace(tr, chunk)
    enc = [ANSEncoder(), ANSEncoder()]
    for t in range(tr.shape[0]):
        enc[tr[t, 2]].put(int(starts[t]), int(freqs[t]))
    gold_cmd, gold_lit_field = deferred.encode_metablock(data, cmds, opts,
                                                         chunk)
    assert enc[0].flush() == gold_cmd
    # test data < SUB_LIT literals: the lit field holds exactly one sub
    assert [enc[1].flush()] == deferred.lit_subs_split(gold_lit_field)


def test_jax_engine_deferred_matches_golden():
    from divans_tpu.codec import jax_engine
    data = _alice(8192)
    opts = DivansOptions(chunk_nibbles=256)
    assert jax_engine.compress(data, opts) == engine_np.compress(data, opts)


@pytest.mark.parametrize("chunk", [64, 256])
def test_model_pass_deferred_matches_replay(chunk):
    from divans_tpu.codec import jax_engine
    data = _alice(20480)
    opts = DivansOptions(chunk_nibbles=chunk, metablock_size=4096)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    blocks = [data[o:o + 4096] for o in range(0, len(data), 4096)]
    traces = [trace_mod.build_trace(r, build_commands(r, opts), opts, layout)
              for r in blocks]
    starts, freqs, _ = jax_engine.deferred_model_pass(traces, layout, chunk)
    for i, t in enumerate(traces):
        s_h, f_h = deferred.replay_trace(t, chunk)
        assert np.array_equal(starts[i], s_h)
        assert np.array_equal(freqs[i], f_h)


def test_api_auto_roundtrip_deferred():
    import divans_tpu
    data = _alice(8192) + bytes(range(256)) * 8
    opts = DivansOptions(chunk_nibbles=256)
    blob = divans_tpu.compress(data, opts)
    assert divans_tpu.decompress(blob) == data


def test_ratio_cost_bounded():
    data = _alice(24576)
    base = len(engine_np.compress(data, DivansOptions()))
    defr = len(engine_np.compress(data, DivansOptions(chunk_nibbles=256)))
    # +5.6% on this 24 KB slice at the q10 DP default (the DP's static
    # costs are calibrated against the adaptive profile, so its parse is
    # slightly misaligned with chunk-deferred adaptation; amortizes with
    # size — research/deferred_v2_study.py)
    assert defr <= base * 1.07, (defr, base)


def test_stride_profile_deferred():
    data = _alice(6144)
    opts = DivansOptions(chunk_nibbles=128, use_context_map=False)
    blob = engine_np.compress(data, opts)
    assert engine_np.decompress(blob) == data


def test_lit_pass_specialized_bit_equal():
    """model_pass_deferred_lit (per-class fetch + count commits) must be
    byte-identical to the generic deferred pass on lit sub-traces."""
    import jax.numpy as jnp
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.codec import trace as trace_mod, jax_engine
    from divans_tpu.codec.layout import ModelLayout, PROFILES

    data = open("/root/reference/testdata/alice29", "rb").read()[:24000]
    opts = DivansOptions(metablock_size=1 << 13, chunk_nibbles=64)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    traces = [trace_mod.build_trace(
        data[o:o + (1 << 13)],
        build_commands(data[o:o + (1 << 13)], opts), opts, layout)
        for o in range(0, len(data), 1 << 13)]
    _, lit_ts, _, _, r_lit = jax_engine.split_stream_traces(traces, layout)
    assert jax_engine._lit_pass_usable(layout, lit_ts)
    padded = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=64))
    s1, f1 = jax_engine.model_pass_deferred(padded, r_lit, 64)
    spd = jnp.asarray(jax_engine.lit_speeds_from_traces(lit_ts))
    s2, f2 = jax_engine.model_pass_deferred_lit(padded, spd, r_lit, 64)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert (np.asarray(f1) == np.asarray(f2)).all()


def test_cmd_pass_specialized_bit_equal():
    """model_pass_deferred_cmd (shared onehot + per-row count commits)
    must be byte-identical to the generic deferred pass on cmd
    sub-traces (cmd speeds are row-constant by construction)."""
    import jax.numpy as jnp
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.codec import trace as trace_mod, jax_engine, deferred
    from divans_tpu.codec.layout import ModelLayout, PROFILES

    data = open("/root/reference/testdata/alice29", "rb").read()[:24000]
    opts = DivansOptions(metablock_size=1 << 13, chunk_nibbles=64)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    traces = [trace_mod.build_trace(
        data[o:o + (1 << 13)],
        build_commands(data[o:o + (1 << 13)], opts), opts, layout)
        for o in range(0, len(data), 1 << 13)]
    cmd_ts, _, _, r_cmd, _ = jax_engine.split_stream_traces(traces, layout)
    cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
    assert cspd is not None
    s_cmd = deferred.cmd_chunk(64)
    padded = jnp.asarray(jax_engine._pad_traces(cmd_ts, multiple=s_cmd))
    s1, f1 = jax_engine.model_pass_deferred(padded, r_cmd, s_cmd)
    s2, f2 = jax_engine.model_pass_deferred_cmd(
        padded, jnp.asarray(cspd[0]), jnp.asarray(cspd[1]), r_cmd, s_cmd)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert (np.asarray(f1) == np.asarray(f2)).all()
