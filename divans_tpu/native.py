"""ctypes bindings for the native encode front-end (native/trace_builder.cpp).

The native library implements the LZ matcher and the trace-builder FSM —
the host-side encode hot path (the reference's equivalent front-end is
its Rust engine + the brotli encoder).  It covers the profiles our
encoder emits (PM + Literal/Copy, identity context maps); anything else
(dict commands at q11, custom literal context maps) stays on the Python
path.  Traces are asserted identical to the Python twin by
tests/test_native.py.

Builds on demand with `make -C native`; absence of a compiler simply
disables the fast path.
"""
from __future__ import annotations

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
        "lit_hi", "lit_lo", "cm_first", "cm_second"]

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
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = False
    return _lib or None


def supports(options: DivansOptions) -> bool:
    """Can the native front-end produce this options profile?"""
    return (options.quality < 11                # dict matching is Python-side
            and options.force_stride_value == 0
            and options.prior_bitmask_detection == 0
            and options.prior_depth == 0)


def build_trace(raw: bytes, options: DivansOptions,
                layout: ModelLayout) -> np.ndarray | None:
    """raw bytes -> int32[n,10] trace, or None if unavailable."""
    lib = load()
    if lib is None or not supports(options):
        return None
    n = len(raw)
    buf = (ctypes.c_uint8 * n).from_buffer_copy(raw)
    matches = np.zeros((max(1, n // 4 + 8), 3), np.int32)
    nm = lib.dtpu_match(buf, n, options.quality,
                        matches.ctypes.data_as(ctypes.c_void_p),
                        matches.shape[0])
    assert nm >= 0, "match buffer overflow"
    seg = np.array([layout.idx(s, *([0] * len(layout.segments[s][1])))
                    for s in SEGS], np.int32)
    speeds = options.literal_adaptation or (MUD, MUD, Speed(8, 8192),
                                            Speed(8, 8192))
    adapt = np.array([[s.inc, s.lim] for s in speeds], np.int32)
    lut0 = np.ascontiguousarray(
        constants.literal_lut0(constants.LITERAL_PREDICTION_MODE_UTF8))
    lut1 = np.ascontiguousarray(
        constants.literal_lut1(constants.LITERAL_PREDICTION_MODE_UTF8))
    cap = 4 * n + 16384
    out = np.zeros((cap, 10), np.int32)
    nctx = layout.segments["cm_second"][1][1]
    ns = lib.dtpu_build_trace(
        buf, n,
        matches.ctypes.data_as(ctypes.c_void_p), nm,
        1 if options.use_context_map else 0,
        min(options.dynamic_context_mixing, 7),
        options.prior_depth,
        adapt.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p), nctx,
        lut0.ctypes.data_as(ctypes.c_void_p),
        lut1.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), cap)
    assert ns >= 0, "trace buffer overflow"
    return out[:ns]
