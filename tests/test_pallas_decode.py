"""Tests for the deferred-profile device decode (codec/pallas_decode).

Three layers, all bit-exactness:
  1. the numpy oracle (standalone lit-stream decode) vs the golden
     deferred codec's literal bytes;
  2. the Pallas chunk-scan kernel (interpret mode) vs the oracle;
  3. the full 2-stage pipeline (cmd structure + kernel + execution)
     vs the original input, through the container.
"""
import os

import numpy as np
import pytest

from divans_tpu.options import DivansOptions
from divans_tpu.ir.matcher import build_commands
from divans_tpu.ir import commands as C
from divans_tpu.codec import deferred, pallas_decode, jax_engine
from divans_tpu.codec.layout import ModelLayout, PROFILES

ALICE = open(os.path.join(os.path.dirname(__file__), "..",
                          "testdata", "alice29"), "rb").read() \
    if os.path.exists(os.path.join(os.path.dirname(__file__), "..",
                                   "testdata", "alice29")) \
    else open("/root/reference/testdata/alice29", "rb").read()


def _prep(data, mb, chunk):
    """Per-metablock rows (raw, cmd_stream, lit_SUB_stream, script, lits).

    Test blocks keep lit_total <= deferred.SUB_LIT so the lit field
    holds exactly one sub-stream payload (asserted) — the per-stream
    kernel/oracle tests below address single streams; multi-sub behavior
    is covered by TestLaneQueues and the container round-trips."""
    opts = DivansOptions(metablock_size=mb, chunk_nibbles=chunk)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    rows = []
    for raw in blocks:
        cmds_ = build_commands(raw, opts)
        cb, lb_field = deferred.encode_metablock(raw, cmds_, opts, chunk)
        subs = deferred.lit_subs_split(lb_field)
        assert len(subs) == 1, "test block exceeded SUB_LIT literals"
        sc = deferred.decode_cmd_structure(cb, len(raw), opts, chunk)
        assert sc.supported
        lits = b"".join(c.data for c in cmds_ if isinstance(c, C.Literal))
        assert sc.lit_total == len(lits)
        rows.append((raw, cb, subs[0], sc, lits))
    return opts, layout, rows


class TestOracle:
    def test_oracle_matches_golden(self):
        _, _, rows = _prep(ALICE[:20000], 1 << 14, 256)
        for raw, cb, lb, sc, lits in rows:
            got = pallas_decode.decode_literals_np(
                lb, sc.lit_total, sc.lcmap, sc.speeds, 256)
            assert got == lits

    def test_oracle_small_chunk(self):
        _, _, rows = _prep(ALICE[:6000], 1 << 12, 64)
        for raw, cb, lb, sc, lits in rows:
            got = pallas_decode.decode_literals_np(
                lb, sc.lit_total, sc.lcmap, sc.speeds, 64)
            assert got == lits


class TestKernel:
    @pytest.mark.parametrize("chunk,mb,size", [(64, 1 << 12, 8000),
                                               (256, 1 << 14, 24000)])
    def test_kernel_bit_exact(self, chunk, mb, size):
        _, layout, rows = _prep(ALICE[:size], mb, chunk)
        outs = pallas_decode.decode_literals_batch(
            [r[2] for r in rows], [r[3].lit_total for r in rows],
            [r[3].lcmap for r in rows], [r[3].speeds for r in rows],
            chunk, layout, interpret=True)
        for out, row in zip(outs, rows):
            assert out == row[4]

    def test_kernel_binary_data(self):
        rng = np.random.default_rng(3)
        data = bytes(rng.integers(0, 256, size=6000, dtype=np.uint8)) \
            + ALICE[:6000]
        _, layout, rows = _prep(data, 1 << 13, 64)
        outs = pallas_decode.decode_literals_batch(
            [r[2] for r in rows], [r[3].lit_total for r in rows],
            [r[3].lcmap for r in rows], [r[3].speeds for r in rows],
            64, layout, interpret=True)
        for out, row in zip(outs, rows):
            assert out == row[4]


class TestLaneQueues:
    """The persistent-lane scan: several streams decode back-to-back on
    one lane with full model resets at the switches — bit-equal to each
    stream decoded alone (the oracle)."""

    def test_queued_streams_bit_exact(self):
        rng = np.random.default_rng(7)
        # wildly varying metablock sizes: text and binary interleaved
        data = ALICE[:30000] + bytes(
            rng.integers(0, 256, size=5000, dtype=np.uint8)) + ALICE[30000:36000]
        _, layout, rows = _prep(data, 1 << 12, 256)
        assert len(rows) >= 9
        streams = [r[2] for r in rows]
        n_lits = [r[3].lit_total for r in rows]
        arrays, n_steps, placement = pallas_decode.pack_lane_queues(
            streams, n_lits,
            [r[3].lcmap for r in rows], [r[3].speeds for r in rows],
            256, spread=3)
        counts = arrays[1]
        assert counts.max() >= 3, "test must exercise >=3-deep queues"
        dev = pallas_decode.issue_lane_queues(arrays, n_steps, 256, layout,
                                              interpret=True)
        arr = np.asarray(dev)
        for i, row in enumerate(rows):
            lane, coff = placement[i]
            got = arr[lane, coff * 128:coff * 128 + n_lits[i]].tobytes()
            assert got == row[4], f"stream {i} diverged in a lane queue"

    def test_zero_literal_stream_placement(self):
        _, layout, rows = _prep(ALICE[:4000], 1 << 12, 256)
        streams = [rows[0][2], b""]
        n_lits = [rows[0][3].lit_total, 0]
        arrays, n_steps, placement = pallas_decode.pack_lane_queues(
            streams, n_lits, [rows[0][3].lcmap] * 2,
            [rows[0][3].speeds] * 2, 256)
        assert placement[1] is None
        assert placement[0] is not None


class TestPipeline:
    def test_decompress_frames(self):
        data = ALICE[:24000]
        opts = DivansOptions(metablock_size=1 << 13, chunk_nibbles=256)
        layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
        blob = jax_engine.compress(data, opts)
        from divans_tpu.container import format as fmt
        _w, _mb, frames, _crc, _fl = fmt.deserialize(blob)
        out = pallas_decode.decompress_frames(frames, 256, layout, opts,
                                              interpret=True)
        assert out == data

    def test_decompress_frames_forced_host_split(self, monkeypatch):
        """DIVANS_DEC_BACKLOG=0 sends every frame down the pipeline's
        host lane (the adaptive host/device split's escape hatch) —
        output must be identical to the device path."""
        monkeypatch.setenv("DIVANS_DEC_BACKLOG", "0")
        data = ALICE[:24000]
        opts = DivansOptions(metablock_size=1 << 13, chunk_nibbles=256)
        layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
        blob = jax_engine.compress(data, opts)
        from divans_tpu.container import format as fmt
        _w, _mb, frames, _crc, _fl = fmt.deserialize(blob)
        out = pallas_decode.decompress_frames(frames, 256, layout, opts,
                                              interpret=True)
        assert out == data

    def test_structure_decode_records_ops(self):
        _, _, rows = _prep(ALICE[:12000], 1 << 13, 256)
        for raw, cb, lb, sc, lits in rows:
            assert deferred.execute_script(sc, lits) == raw


class TestNativeStructure:
    """The C++ cmd-structure pass + script executor (stage 1/3 of the
    2-stage device decode) against the golden Python pass."""

    def _native_or_skip(self):
        from divans_tpu import native
        if native.load() is None:
            pytest.skip("native library unavailable")
        return native

    def test_native_script_matches_golden(self):
        native = self._native_or_skip()
        _, layout, rows = _prep(ALICE[:24000], 1 << 13, 256)
        for raw, cb, lb, sc, lits in rows:
            nsc = native.decode_cmd_structure(cb, len(raw), layout, 256)
            assert nsc is not None and nsc.supported
            assert nsc.lit_total == sc.lit_total
            assert [(s.inc, s.lim) for s in nsc.speeds] \
                == [(s.inc, s.lim) for s in sc.speeds]
            ops_p = [(0, op[1], 0) if op[0] == "L"
                     else (1, op[1], op[2]) if op[0] == "C"
                     else (2, None, len(op[1])) for op in sc.ops]
            ops_n = [tuple(int(x) for x in r) for r in nsc.ops]
            assert len(ops_n) == len(ops_p)
            for a, b in zip(ops_n, ops_p):
                if b[1] is None:
                    assert a[0] == 2 and a[2] == b[2]
                else:
                    assert a == b

    def test_native_execute_bit_exact(self):
        native = self._native_or_skip()
        _, layout, rows = _prep(ALICE[:24000], 1 << 13, 256)
        for raw, cb, lb, sc, lits in rows:
            nsc = native.decode_cmd_structure(cb, len(raw), layout, 256)
            assert native.execute_script(nsc, lits) == raw

    def test_native_execute_rejects_corrupt_script(self):
        from divans_tpu.codec.engine_np import CorruptStream
        native = self._native_or_skip()
        _, layout, rows = _prep(ALICE[:8000], 1 << 13, 256)
        raw, cb, lb, sc, lits = rows[0]
        nsc = native.decode_cmd_structure(cb, len(raw), layout, 256)
        bad = nsc.ops.copy()
        copies = np.nonzero(bad[:, 0] == 1)[0]
        if copies.shape[0] == 0:
            pytest.skip("no copy ops in fixture")
        bad[copies[0], 1] = 1 << 24  # distance beyond the window
        nsc.ops = bad
        with pytest.raises(CorruptStream):
            native.execute_script(nsc, lits)

    def test_dict_words_through_pool(self):
        """q11-style streams carry Dict commands: pool path exercised."""
        from divans_tpu import dictionary
        native = self._native_or_skip()
        d = dictionary.load()
        if not d.available:
            pytest.skip("dictionary unavailable")
        # craft a stream with a dict command via the golden encoder
        word = d.raw_word(8, 33)
        data = b"prefix literal text " + word + b" and a tail|" \
            + ALICE[:3000]
        opts = DivansOptions(metablock_size=1 << 13, chunk_nibbles=256,
                             quality=11)
        from divans_tpu.codec import engine_np
        cmds_ = build_commands(data, opts)
        if not any(type(c).__name__ == "Dict" for c in cmds_):
            pytest.skip("matcher found no dict command in fixture")
        cb, lb_field = deferred.encode_metablock(data, cmds_, opts, 256)
        (lb,) = deferred.lit_subs_split(lb_field)  # < SUB_LIT literals
        layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
        nsc = native.decode_cmd_structure(cb, len(data), layout, 256)
        assert nsc is not None and (nsc.ops[:, 0] == 2).any()
        sc = deferred.decode_cmd_structure(cb, len(data), opts, 256)
        lits = pallas_decode.decode_literals_np(
            lb, sc.lit_total, sc.lcmap, sc.speeds, 256)
        assert native.execute_script(nsc, lits) == data


def test_resumable_segment_pipeline_bytes_equal(monkeypatch):
    """DIVANS_DEC_RESUME=1: the resumable-segment pipeline (scan carry
    round-trips between jit calls; sub-streams span segments) must be
    byte-equal to the grouped pipeline (round-5 experiment)."""
    from divans_tpu import native
    from divans_tpu.container import format as fmt
    from divans_tpu.codec import pallas_decode as pd
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.codec.deferred import flags_to_chunk
    from divans_tpu.options import DivansOptions
    if native.load() is None:
        pytest.skip("native library unavailable")
    td = "/root/reference/testdata/"
    data = (open(td + "alice29", "rb").read()
            + open(td + "random_then_unicode", "rb").read())[:180000]
    blob = native.compress(data, DivansOptions(metablock_size=1 << 15,
                                               chunk_nibbles=256))
    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    monkeypatch.setenv("DIVANS_DEC_RESUME", "1")
    monkeypatch.setenv("DIVANS_DEC_SEG_CHUNKS", "8")  # force many segments
    raw = pd.decompress_frames(frames, flags_to_chunk(flags), layout,
                               DivansOptions(), interpret=True)
    assert raw == data
    monkeypatch.setenv("DIVANS_DEC_QPL", "2")
    raw = pd.decompress_frames(frames, flags_to_chunk(flags), layout,
                               DivansOptions(), interpret=True)
    assert raw == data
