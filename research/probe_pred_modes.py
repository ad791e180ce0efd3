"""Size the prediction-mode lever: per-frame compressed size with each
mode's LUTs forced through the native trace builder (ratio-only probe;
the PM nibble value difference is negligible).

Usage: python research/probe_pred_modes.py
"""
import ctypes
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))

import numpy as np  # noqa: E402

from divans_tpu.options import DivansOptions  # noqa: E402
from divans_tpu import native, constants  # noqa: E402
from divans_tpu.codec.layout import ModelLayout, PROFILES  # noqa: E402
from divans_tpu.ir.matcher import find_matches  # noqa: E402
from divans_tpu.probability.speed import MUD, Speed  # noqa: E402
from large_file_study import build_corpus  # noqa: E402

MODES = {"sign": constants.LITERAL_PREDICTION_MODE_SIGN,
         "utf8": constants.LITERAL_PREDICTION_MODE_UTF8,
         "msb6": constants.LITERAL_PREDICTION_MODE_MSB6,
         "lsb6": constants.LITERAL_PREDICTION_MODE_LSB6}


def frame_size(raw, opts, layout, mode, lib):
    n = len(raw)
    m = find_matches(raw, opts.quality)
    matches = np.ascontiguousarray(np.array(m, np.int32).reshape(-1, 3))
    nm = max(1, matches.shape[0])
    if matches.shape[0] == 0:
        matches = np.zeros((1, 3), np.int32)
        nm = 0
    seg = native._seg_array(layout)
    speeds = (MUD, MUD, Speed(8, 8192), Speed(8, 8192))
    adapt = np.array([[s.inc, s.lim] for s in speeds], np.int32)
    lut0 = np.ascontiguousarray(constants.literal_lut0(mode))
    lut1 = np.ascontiguousarray(constants.literal_lut1(mode))
    cap = 4 * n + 16384
    out = np.empty((cap, 10), np.int32)
    nctx = layout.segments["cm_second"][1][1]
    ns = lib.dtpu_build_trace(
        raw, n, matches.ctypes.data_as(ctypes.c_void_p), nm,
        1, 1, 0, 1,
        adapt.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p), nctx, layout.lo_shift,
        1 if layout.lo_bucketed else 0,
        lut0.ctypes.data_as(ctypes.c_void_p),
        lut1.ctypes.data_as(ctypes.c_void_p),
        None,
        out.ctypes.data_as(ctypes.c_void_p), cap)
    assert ns >= 0
    cb, lb = native.encode_streams(out[:ns], layout.num_rows, 256,
                                   lit_base=layout.segments["lit_hi"][0])
    return len(cb) + len(lb)


def main():
    corpus = build_corpus(12 << 20)
    opts = DivansOptions(quality=10, metablock_size=1 << 20,
                         chunk_nibbles=256)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    lib = native.load()
    mb = opts.metablock_size
    totals = {k: 0 for k in MODES}
    best_total = 0
    wins = {k: 0 for k in MODES}
    for off in range(0, len(corpus), mb):
        raw = corpus[off:off + mb]
        sizes = {k: frame_size(raw, opts, layout, v, lib)
                 for k, v in MODES.items()}
        for k in MODES:
            totals[k] += sizes[k]
        bk = min(sizes, key=sizes.get)
        wins[bk] += 1
        best_total += sizes[bk]
    n = len(corpus)
    for k in MODES:
        print(f"{k}: ratio {totals[k]/n:.4f}  wins {wins[k]}")
    print(f"per-frame best: {best_total/n:.4f}")


if __name__ == "__main__":
    main()
