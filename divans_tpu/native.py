"""ctypes bindings for the native encode front-end (native/trace_builder.cpp).

The native library implements the LZ matcher and the trace-builder FSM —
the host-side encode hot path (the reference's equivalent front-end is
its Rust engine + the brotli encoder).  Encode covers the profiles our
encoder emits: mechanical streams build straight from matches
(dtpu_build_trace), while q11 / IR-optimizer streams route their
Python-assembled command lists (dict edges included) through
dtpu_build_trace_cmds — either way the rANS back-end is C++.  Decode
covers everything our encoder can emit at any quality (incl. Dict
commands, with the vendored RFC 7932 data passed into C++, and constant
stride masks); only foreign streams (block switches, explicit
per-context masks, custom context maps) fall back to the golden engine.
Traces are asserted identical to the Python twin by tests/test_native.py.

Builds on demand with `make -C native`; absence of a compiler simply
disables the fast path.
"""
from __future__ import annotations

from . import errors

import ctypes
import os
import subprocess

import numpy as np

from . import constants
from .options import DivansOptions
from .codec.layout import ModelLayout
from .probability.speed import Speed, MUD

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libdivans_tpu_native.so")

# segment order shared with trace_builder.cpp's Seg enum
SEGS = ["cc", "ll_cs", "ll_beg", "ll_last", "ll_mant",
        "c_ccs", "c_cbeg", "c_clast", "c_cmant",
        "c_dmn", "c_dbeg", "c_dlast", "c_dmant",
        "bt_stride",
        "pm_only", "pm_dcm", "pm_pd", "pm_palette", "pm_mvmode",
        "pm_cmn", "pm_cf", "pm_cs",
        "lit_hi", "lit_lo", "cm_first", "cm_second",
        "d_sbeg", "d_slast", "d_idx", "d_tr",
        "pm_mix",
        "lit_hi_s", "lit_lo_s",   # mix/split profiles only (-1 when absent)
        "bt_mn", "bt_f", "bt_s"]  # literal block-switch priors


def _seg_array(layout: ModelLayout) -> np.ndarray:
    return np.array([layout.idx(s, *([0] * len(layout.segments[s][1])))
                     if s in layout.segments else -1
                     for s in SEGS], np.int32)

def _mask_ok(mask: bytes) -> bool:
    """The native FSM covers mask values {0} + strides {4..11} only
    (opt1 / fast-cm / escape masks stay on the golden engine)."""
    return all(v == 0 or 4 <= v <= 11 for v in set(mask))


_lib = None


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.dtpu_match.restype = ctypes.c_int32
        lib.dtpu_build_trace.restype = ctypes.c_int32
        lib.dtpu_encode_streams.restype = ctypes.c_int32
        lib.dtpu_encode_streams_sel.restype = ctypes.c_int32
        lib.dtpu_pack_lit.restype = ctypes.c_int32
        lib.dtpu_decode_metablock.restype = ctypes.c_int32
        lib.dtpu_decode_cmd_structure.restype = ctypes.c_int32
        lib.dtpu_execute_script.restype = ctypes.c_int32
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = False
    return _lib or None


def supports(options: DivansOptions) -> bool:
    """Can the native front-end produce this options profile?"""
    return (options.quality < 11                # dict matching is Python-side
            and options.prior_depth == 0
            and options.external_probs is None
            and not options.block_split         # switches: cmds path only
            and options.cmap_clustering == 0    # clustered maps: golden path
            and options.streaming_chunk_bytes == 0  # chunk tables: golden
            and options.divans_ir_optimizer == 0)  # actuary is Python-side


def build_trace(raw: bytes, options: DivansOptions,
                layout: ModelLayout,
                mask: bytes | None = None) -> np.ndarray | None:
    """raw bytes -> int32[n,10] trace, or None if unavailable.

    `mask` is an 8192-entry per-context mixing mask (mv_mode=2 wire
    shape); the C++ FSM rejects mask values outside {0, 4..11}."""
    lib = load()
    if lib is None or not supports(options):
        return None
    if mask is not None and not _mask_ok(mask):
        return None
    n = len(raw)
    buf = raw  # bytes pass as a no-copy pointer (C never mutates)
    if options.quality >= 10 and n >= 4:
        # default quality takes the cost-model optimal parse — the same
        # matches the golden engine's build_commands uses (ir/matcher
        # find_matches), so containers stay byte-identical.  Array path:
        # no per-frame tolist/relist under the GIL (the encode pool
        # serialized on it)
        from .ir.matcher import find_matches, find_matches_optimal
        matches = find_matches_optimal(raw, options.quality, as_array=True)
        if matches is None:
            m = find_matches(raw, options.quality)
            matches = np.array(m, np.int32).reshape(-1, 3)
        matches = np.ascontiguousarray(matches)
        nm = matches.shape[0]
        if nm == 0:
            matches = np.zeros((1, 3), np.int32)
    else:
        matches = np.empty((max(1, n // 4 + 8), 3), np.int32)
        nm = lib.dtpu_match(buf, n, options.quality,
                            matches.ctypes.data_as(ctypes.c_void_p),
                            matches.shape[0])
        assert nm >= 0, "match buffer overflow"
    seg = _seg_array(layout)
    speeds = options.literal_adaptation or (MUD, MUD, Speed(8, 8192),
                                            Speed(8, 8192))
    adapt = np.array([[s.inc, s.lim] for s in speeds], np.int32)
    lut0 = np.ascontiguousarray(
        constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8))
    lut1 = np.ascontiguousarray(
        constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8))
    cap = 4 * n + 16384
    out = np.empty((cap, 10), np.int32)  # C writes all 10 cols/row
    nctx = layout.segments["cm_second"][1][1]
    mask_buf = ((ctypes.c_uint8 * 8192).from_buffer_copy(mask)
                if mask is not None else None)
    ns = lib.dtpu_build_trace(
        buf, n,
        matches.ctypes.data_as(ctypes.c_void_p), nm,
        1 if options.use_context_map else 0,
        min(options.dynamic_context_mixing, 7),
        options.prior_depth,
        max(1, options.force_stride_value),
        adapt.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p), nctx, layout.lo_shift,
        1 if layout.lo_bucketed else 0,  # deferred-v2 self-fed lit history
        lut0.ctypes.data_as(ctypes.c_void_p),
        lut1.ctypes.data_as(ctypes.c_void_p),
        mask_buf,
        out.ctypes.data_as(ctypes.c_void_p), cap)
    if ns < 0:
        return None
    return out[:ns]


def find_matches(raw: bytes, quality: int) -> list | None:
    """Greedy+lazy matches via dtpu_match (the ir/matcher.py twin);
    None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(raw)
    buf = raw or b"\0"  # no-copy pointer
    matches = np.empty((max(1, n // 4 + 8), 3), np.int32)
    nm = lib.dtpu_match(buf, n, quality,
                        matches.ctypes.data_as(ctypes.c_void_p),
                        matches.shape[0])
    assert nm >= 0, "match buffer overflow"
    return matches[:nm].tolist()


def _cmd_rows(commands, options) -> np.ndarray | None:
    """Command list -> int32[n,5] rows for dtpu_build_trace_cmds, or None
    when a command falls outside the native FSM (block switches, custom
    PredictionMode fields)."""
    from .ir import commands as cmds
    from .ir.matcher import default_prediction_mode

    if not commands or not isinstance(commands[0], cmds.PredictionMode):
        return None, None
    import dataclasses
    pm = commands[0]
    default = default_prediction_mode(options)
    mask = None
    nb = 1
    if pm != default:
        # a PM differing only by its mixing mask and/or an identity
        # nb-type literal map (block-split) is native; anything else
        # stays on the golden engine
        if dataclasses.replace(pm, mixing_values=default.mixing_values,
                               literal_context_map=default
                               .literal_context_map) != default:
            return None, None
        lcm = pm.literal_context_map
        if lcm != default.literal_context_map:
            nb = len(lcm) // 64
            if not (1 <= nb <= 4 and lcm == bytes(range(nb * 64))):
                return None, None
        mv = pm.mixing_values
        if mv and any(mv):
            if not _mask_ok(mv) or len(mv) != 8192:
                return None, None
            mask = bytes(mv)
    rows = np.zeros((len(commands) - 1, 5), np.int32)
    for i, c in enumerate(commands[1:]):
        if isinstance(c, cmds.Literal):
            rows[i] = (0, len(c.data), 0, 0, 0)
        elif isinstance(c, cmds.Copy):
            rows[i] = (1, c.distance, c.num_bytes, 0, 0)
        elif isinstance(c, cmds.Dict):
            rows[i] = (2, c.word_size, c.word_id, c.transform, c.final_size)
        elif isinstance(c, cmds.BlockSwitchLiteral):
            rows[i] = (3, c.block_type, c.stride, 0, 0)
        else:
            return None, None
    return rows, mask, nb


def build_trace_cmds(raw: bytes, commands, options: DivansOptions,
                     layout: ModelLayout) -> np.ndarray | None:
    """Explicit command list -> int32[n,10] trace via the C++ FSM (covers
    Dict commands — the q11 / IR-optimizer encode path)."""
    lib = load()
    if lib is None:
        return None
    res = _cmd_rows(commands, options)
    if res[0] is None:
        return None
    rows, mask, nb = res
    if mask is not None and "lit_hi_s" not in layout.segments:
        return None  # masked stream needs the mix/split layout
    if nb * 64 > layout.segments["cm_first"][1][0]:
        return None  # more block types than the layout's context rows
    n = len(raw)
    buf = raw or b"\0"  # no-copy pointer
    seg = _seg_array(layout)
    speeds = options.literal_adaptation or (MUD, MUD, Speed(8, 8192),
                                            Speed(8, 8192))
    adapt = np.array([[s.inc, s.lim] for s in speeds], np.int32)
    lut0 = np.ascontiguousarray(
        constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8))
    lut1 = np.ascontiguousarray(
        constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8))
    cap = 4 * n + 16384
    out = np.empty((cap, 10), np.int32)  # C writes all 10 cols/row
    nctx = layout.segments["cm_second"][1][1]
    lib.dtpu_build_trace_cmds.restype = ctypes.c_int32
    ns = lib.dtpu_build_trace_cmds(
        buf, n,
        np.ascontiguousarray(rows).ctypes.data_as(ctypes.c_void_p),
        rows.shape[0],
        1 if options.use_context_map else 0,
        min(options.dynamic_context_mixing, 7),
        options.prior_depth,
        max(1, options.force_stride_value),
        adapt.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p), nctx, layout.lo_shift,
        1 if layout.lo_bucketed else 0,
        lut0.ctypes.data_as(ctypes.c_void_p),
        lut1.ctypes.data_as(ctypes.c_void_p),
        (ctypes.c_uint8 * 8192).from_buffer_copy(mask)
        if mask is not None else None,
        nb,
        out.ctypes.data_as(ctypes.c_void_p), cap)
    if ns < 0:
        return None
    return out[:ns]


import functools


@functools.lru_cache(maxsize=8)
def _seg_luts_cached(profile_name: str, lo_bucketed: bool):
    from .codec.layout import PROFILES
    layout = ModelLayout(PROFILES[profile_name], lo_bucketed=lo_bucketed)
    seg = _seg_array(layout)
    lut0 = np.ascontiguousarray(
        constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8))
    lut1 = np.ascontiguousarray(
        constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8))
    nctx = layout.segments["cm_second"][1][1]
    return seg, lut0, lut1, nctx


def _seg_luts(layout: ModelLayout):
    return _seg_luts_cached(layout.profile.name, layout.lo_bucketed)


def encode_streams(trace: np.ndarray, num_rows: int, chunk: int = 0,
                   sel: int = 3, lit_base: int = 0):
    """trace int32[n,10] -> (cmd_bytes, lit_field) via the C++ back-end.

    chunk > 0 selects the deferred-adaptation profile (codec/deferred.py);
    the lit output is then the deferred-v3 sub-stream field (lit_base =
    first lit model row, the reset range for sub switches).
    sel: bit0 = code the cmd stream, bit1 = lit.  The streams' model row
    sets are disjoint, so coding one alone yields bit-identical bytes —
    the hybrid device encode uses sel=1 (host cmd + device literals)."""
    lib = load()
    if lib is None:
        return None
    n = trace.shape[0]
    trace = np.ascontiguousarray(trace, np.int32)
    cap = 4 * n + 1024
    cb = np.empty(cap, np.uint8)
    lb = np.empty(cap, np.uint8)
    cl = ctypes.c_int32(cap)
    ll = ctypes.c_int32(cap)
    rc = lib.dtpu_encode_streams_sel(
        trace.ctypes.data_as(ctypes.c_void_p), n, num_rows, chunk,
        lit_base, sel,
        cb.ctypes.data_as(ctypes.c_void_p), ctypes.byref(cl),
        lb.ctypes.data_as(ctypes.c_void_p), ctypes.byref(ll))
    assert rc == 0, "stream buffer overflow"
    return cb[:cl.value].tobytes(), lb[:ll.value].tobytes()


def pack_lit(trace: np.ndarray, lit_base: int):
    """Trace -> (packed lit row uint16[lit_rows//2], spd int32[6],
    lit_row_count) via the C++ twin of pallas_lit_pass.pack_lit_row
    (GIL-free; includes the stream split + rebase), or None when the
    trace leaves the packed-byte envelope."""
    lib = load()
    if lib is None:
        return None
    n = trace.shape[0]
    trace = np.ascontiguousarray(trace, np.int32)
    cap = n // 2 + 8
    row = np.empty(cap, np.uint16)
    spd = np.zeros(6, np.int32)
    cnt = lib.dtpu_pack_lit(
        trace.ctypes.data_as(ctypes.c_void_p), n, lit_base,
        row.ctypes.data_as(ctypes.c_void_p), cap,
        spd.ctypes.data_as(ctypes.c_void_p))
    if cnt < 0:
        return None
    return row[:cnt // 2], spd, cnt


@functools.lru_cache(maxsize=1)
def _dict_arrays():
    """RFC 7932 dictionary packed for the C++ decoder: (data u8[],
    offsets u32[32], prefix/suffix pool u8[], tr_meta i32[ntr,5])."""
    from . import dictionary
    d = dictionary.load()
    if not d.available:
        return None
    data = np.frombuffer(d.data, np.uint8)
    offs = np.array(d.offsets_by_length, np.uint32)
    pool = bytearray()
    meta = np.zeros((len(d.transforms), 5), np.int32)
    for i, (prefix, ttype, suffix) in enumerate(d.transforms):
        meta[i] = (len(pool), len(prefix),
                   ttype, len(pool) + len(prefix), len(suffix))
        pool += prefix + suffix
    return (data, offs, np.frombuffer(bytes(pool) or b"\0", np.uint8), meta)


def decode_metablock(cmd: bytes, lit: bytes, raw_len: int, use_cm: bool,
                     layout: ModelLayout, chunk: int = 0) -> bytes | None:
    """Native serial decode; None = out of profile (caller falls back)."""
    lib = load()
    if lib is None:
        return None
    masked = 1 if layout.profile.hi_s_shape is not None else 0
    seg, lut0, lut1, nctx = _seg_luts(layout)
    out = np.zeros(max(1, raw_len), np.uint8)
    cbuf = cmd or b"\0"
    lbuf = lit or b"\0"
    dct = _dict_arrays()
    if dct is None:
        dargs = (None, 0, None, None, None, 0)
    else:
        data, offs, pool, meta = dct
        dargs = (data.ctypes.data_as(ctypes.c_void_p), data.shape[0],
                 offs.ctypes.data_as(ctypes.c_void_p),
                 pool.ctypes.data_as(ctypes.c_void_p),
                 meta.ctypes.data_as(ctypes.c_void_p), meta.shape[0])
    rc = lib.dtpu_decode_metablock(
        cbuf, len(cmd), lbuf, len(lit), raw_len,
        (1 if use_cm else 0) | (masked << 1), layout.num_rows, chunk,
        seg.ctypes.data_as(ctypes.c_void_p), nctx, layout.lo_shift,
        lut0.ctypes.data_as(ctypes.c_void_p),
        lut1.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), *dargs)
    if rc != 0:
        return None
    return out.tobytes()


class NativeScript:
    """Command structure decoded natively from the cmd stream alone — the
    host half of the 2-stage device decode (the reference's cmd-decode
    thread, src/parallel_decompressor.rs:99-133).  Drop-in for
    deferred.CmdScript where pallas_decode needs it; ops stay native
    (int32[n,3] + dict-word pool) so execution is memcpy-speed C++."""

    __slots__ = ("ops", "pool", "raw_len", "lit_total", "lcmap", "speeds",
                 "supported")

    def __init__(self, ops, pool, raw_len, lit_total, lcmap, speeds,
                 supported):
        self.ops = ops
        self.pool = pool
        self.raw_len = raw_len
        self.lit_total = lit_total
        self.lcmap = lcmap
        self.speeds = speeds
        self.supported = supported


def decode_cmd_structure(cmd: bytes, raw_len: int, layout: ModelLayout,
                         chunk: int) -> NativeScript | None:
    """Native cmd-structure pass; None = lib missing / out of profile
    (caller falls back to deferred.decode_cmd_structure)."""
    lib = load()
    if lib is None or chunk <= 0:
        return None
    seg, lut0, lut1, nctx = _seg_luts(layout)
    cbuf = cmd or b"\0"
    dct = _dict_arrays()
    if dct is None:
        dargs = (None, 0, None, None, None, 0)
    else:
        data, offs, pool_d, meta = dct
        dargs = (data.ctypes.data_as(ctypes.c_void_p), data.shape[0],
                 offs.ctypes.data_as(ctypes.c_void_p),
                 pool_d.ctypes.data_as(ctypes.c_void_p),
                 meta.ctypes.data_as(ctypes.c_void_p), meta.shape[0])
    info = np.zeros(16, np.int32)
    lcm_out = np.zeros(256, np.uint8)
    ops_cap = raw_len // 4 + 4096
    while True:
        ops = np.zeros((ops_cap, 3), np.int32)
        pool = np.zeros(raw_len + 64, np.uint8)
        n = lib.dtpu_decode_cmd_structure(
            cbuf, len(cmd), raw_len,
            1 if layout.profile.name == "cm" else 0,
            layout.num_rows, chunk,
            seg.ctypes.data_as(ctypes.c_void_p), nctx, layout.lo_shift,
            lut0.ctypes.data_as(ctypes.c_void_p),
            lut1.ctypes.data_as(ctypes.c_void_p),
            *dargs,
            ops.ctypes.data_as(ctypes.c_void_p), ops_cap,
            pool.ctypes.data_as(ctypes.c_void_p), pool.shape[0],
            info.ctypes.data_as(ctypes.c_void_p),
            lcm_out.ctypes.data_as(ctypes.c_void_p))
        if n != -2:
            break
        ops_cap = 8 * raw_len + 8192  # guard bound; cannot overflow twice
    if n < 0:
        return None
    from .probability.speed import Speed
    speeds = [Speed(int(info[3 + 2 * i]), int(info[4 + 2 * i]))
              for i in range(4)]
    # kernel envelope: one PM, mixing on, single literal block type
    # (the per-frame lcmap input covers any 64-entry map — clustered
    # and foreign maps ride the device pipeline; nb>1 decodes host-side)
    supported = info[2] == 1 and info[1] == 1 and info[12] <= 1
    return NativeScript(ops[:n], pool[:info[11]].tobytes(), raw_len,
                        int(info[0]), [int(v) for v in lcm_out[:64]],
                        speeds, supported)


def execute_script(script: NativeScript, lit_bytes,
                   out: np.ndarray | None = None) -> bytes | None:
    """Replay a NativeScript with the device-decoded literal bytes.

    lit_bytes: bytes (passed zero-copy as char*) or a contiguous uint8
    ndarray.  When `out` (a uint8 ndarray view of length raw_len) is
    given, the script executes directly into it and returns None — the
    decode pipeline preallocates one output buffer and each frame lands
    at its offset with no per-frame staging copy."""
    from .codec.engine_np import CorruptStream
    lib = load()
    ops = np.ascontiguousarray(script.ops, np.int32)
    if out is None:
        dst = np.zeros(max(1, script.raw_len), np.uint8)
    else:
        # hard errors, not asserts: under python -O a wrong-sized `out`
        # would let dtpu_execute_script write raw_len bytes past the
        # caller's slice (native heap corruption, not a Python error)
        if out.dtype != np.uint8 or out.size != script.raw_len:
            raise ValueError(
                f"out must be uint8[{script.raw_len}], got "
                f"{out.dtype}[{out.size}]")
        if not out.flags["C_CONTIGUOUS"]:
            raise ValueError("out must be C-contiguous")
        dst = out if script.raw_len else np.zeros(1, np.uint8)
    if isinstance(lit_bytes, np.ndarray):
        n_lit = lit_bytes.size
        lbuf = lit_bytes.ctypes.data_as(ctypes.c_void_p) if n_lit \
            else b"\0"
    else:
        n_lit = len(lit_bytes)
        lbuf = lit_bytes or b"\0"
    rc = lib.dtpu_execute_script(
        ops.ctypes.data_as(ctypes.c_void_p), ops.shape[0],
        lbuf, ctypes.c_int64(n_lit),
        script.pool or b"\0", len(script.pool),
        dst.ctypes.data_as(ctypes.c_void_p), script.raw_len)
    if rc != 0:
        raise CorruptStream("script execution failed", errors.ErrCode.SCRIPT_FAILED)
    if out is None:
        return dst[:script.raw_len].tobytes()
    return None


# --------------------------------------------------- host-native engine

def compress(data: bytes, options: DivansOptions | None = None) -> bytes:
    """Fully host-native compress (byte-identical to the golden engine);
    None if the native library or profile is unavailable."""
    from .container import format as fmt
    from .container.crc32c import crc32c
    from .codec.layout import PROFILES, PROFILE_FLAGS, profile_for_options

    from .codec.deferred import chunk_to_flags

    options = options or DivansOptions()
    if (options.stride_detection_quality or options.speed_detection_quality
            or options.force_stride_value):
        # resolve detection before profile selection: a detected stride
        # > 1 selects the stride profile (native handles any constant
        # stride; only explicit per-context masks stay Python-side)
        from .ir.detect import apply_detection
        options = apply_detection(data, options)
    # command-level profile: the trace can come from an explicit command
    # list (q11 DP with dict edges, IR-optimizer merges) even when the
    # mechanical trace builder abstains
    supports_cmds = (options.prior_depth == 0
                     and options.external_probs is None
                     # streamed frames need the golden coder's chunk
                     # table (pull marks) — engine_np path only
                     and options.streaming_chunk_bytes == 0)
    if load() is None or not (supports(options) or supports_cmds):
        return None
    from . import tracelog
    from .ir import commands as ir_cmds
    profile = profile_for_options(options)   # encode-layout capacity
    mb = options.metablock_size
    # masked / block-split streams stay per-nibble adaptive — must mirror
    # engine_np.compress exactly (byte-identical containers)
    chunk = (0 if options.block_split or options.prior_bitmask_detection
             else options.chunk_nibbles)
    layout = ModelLayout(PROFILES[profile], lo_bucketed=chunk > 0)
    frames = []
    used_split = used_mask = False
    if options.use_context_map and options.force_stride_value > 1:
        used_mask = True   # constant stride-with-cm mask in every PM
    def one(raw):
        """(frame, used_split, used_mask) for one metablock; None when
        outside the native envelope (caller falls back whole-file)."""
        mask = None
        f_split = f_mask = False
        if (options.prior_bitmask_detection and options.use_context_map
                and not options.force_stride_value):
            from .ir.detect import detect_prior_bitmask
            mask = detect_prior_bitmask(raw,
                                        options.prior_bitmask_detection)
            if mask is not None and any(mask):
                f_mask = True
        trace = build_trace(raw, options, layout, mask=mask)
        if trace is None and supports_cmds:
            from .ir.matcher import build_commands
            commands = build_commands(raw, options)
            for c in commands:
                if isinstance(c, ir_cmds.BlockSwitchLiteral):
                    f_split = True
                elif (isinstance(c, ir_cmds.PredictionMode)
                      and any(c.mixing_values)):
                    f_mask = True
            trace = build_trace_cmds(raw, commands, options, layout)
        if trace is None:
            return None
        cmd_b, lit_b = encode_streams(trace, layout.num_rows, chunk,
                                      lit_base=layout.segments["lit_hi"][0])
        return fmt.MetablockFrame(len(raw), cmd_b, lit_b), f_split, f_mask

    blocks = [data[off:off + mb]
              for off in range(0, len(data), mb)]
    with tracelog.span("encode/native_serial", bytes=len(data)):
        # metablocks are independent: fan the native trace builder +
        # stream encoder out across host cores (ctypes releases the GIL)
        if len(blocks) > 1:
            import os
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(8, os.cpu_count() or 1)) as ex:
                results = list(ex.map(one, blocks))
        else:
            results = [one(b) for b in blocks]
    for res in results:
        if res is None:
            return None
        frame, f_split, f_mask = res
        frames.append(frame)
        used_split = used_split or f_split
        used_mask = used_mask or f_mask
    # flag = what the streams actually used (mirrors emitted_profile)
    if not options.use_context_map:
        emitted = "stride"
    elif used_split:
        emitted = "split"
    elif used_mask:
        emitted = "mix"
    else:
        emitted = "cm"
    return fmt.serialize(frames, options.window_size, options.mb_log2,
                         crc32c(data),
                         flags=PROFILE_FLAGS[emitted] | chunk_to_flags(chunk))


def decompress(blob: bytes) -> bytes:
    """Host-native decompress with golden fallback per metablock."""
    from . import tracelog
    from .container import format as fmt
    from .codec.layout import PROFILES, FLAG_PROFILES
    from .codec import engine_np

    from .codec.deferred import flags_to_chunk
    from .codec import deferred as deferred_mod
    _w, _mb, frames, stored_crc, flags = fmt.deserialize(blob)
    chunk = flags_to_chunk(flags)
    profile = FLAG_PROFILES.get(flags & 0b11)
    layout = (ModelLayout(PROFILES[profile], lo_bucketed=chunk > 0)
              if profile else None)
    opts = DivansOptions()

    def one(f):
        raw = None
        if layout is not None:
            with tracelog.span("decode/native_serial", bytes=f.raw_len):
                raw = decode_metablock(f.cmd, f.lit, f.raw_len,
                                       profile != "stride", layout,
                                       chunk)
        if raw is None:
            with tracelog.span("decode/golden_fallback", bytes=f.raw_len):
                if chunk:
                    raw = deferred_mod.decode_metablock(
                        f.cmd, f.lit, f.raw_len, opts, chunk)
                else:
                    raw = engine_np.decode_metablock(f.cmd, f.lit,
                                                     f.raw_len, opts)
        return raw

    # metablocks are independent: fan the C decode out across host cores
    # (ctypes releases the GIL) — the frame-parallel analog of the
    # reference's consumer-side decode threads
    # (src/parallel_decompressor.rs:99-133)
    if len(frames) > 1 and load() is not None:
        import os
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(8, os.cpu_count() or 1)) as ex:
            parts = list(ex.map(one, frames))
    else:
        parts = [one(f) for f in frames]
    out = bytearray()
    for raw in parts:
        out += raw
    fmt.check_crc(bytes(out), stored_crc)
    return bytes(out)
