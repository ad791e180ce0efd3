"""Per-substate bit accounting (reference feature `billing`,
src/billing.rs:41-176 + BillingDesignation src/interface.rs:327-346).

The reference wraps its coder and buckets -log2(p) per codec substate.
Our two-pass encoder gets this for free: the trace says which model row
coded every nibble (codec/trace.py), the model pass yields each nibble's
freq, and the dense layout maps rows back to table families — so billing
is a pure post-processing reduction over device outputs, not a wrapper.
"""
from __future__ import annotations

import math

import numpy as np

from .layout import ModelLayout

# segment -> reporting bucket (the reference's BillingDesignation granularity)
_BUCKETS = {
    "cc": "CrossCommand",
    "ll_cs": "LiteralCommand(length)", "ll_beg": "LiteralCommand(length)",
    "ll_last": "LiteralCommand(length)", "ll_mant": "LiteralCommand(length)",
    "c_ccs": "CopyCommand(length)", "c_cbeg": "CopyCommand(length)",
    "c_clast": "CopyCommand(length)", "c_cmant": "CopyCommand(length)",
    "c_dmn": "CopyCommand(distance)", "c_dbeg": "CopyCommand(distance)",
    "c_dlast": "CopyCommand(distance)", "c_dmant": "CopyCommand(distance)",
    "d_sbeg": "DictCommand", "d_slast": "DictCommand",
    "d_idx": "DictCommand", "d_tr": "DictCommand",
    "bt_mn": "BlockType", "bt_f": "BlockType", "bt_s": "BlockType",
    "bt_stride": "BlockType",
    "pm_only": "PredModeCtxMap", "pm_dcm": "PredModeCtxMap",
    "pm_pd": "PredModeCtxMap", "pm_palette": "PredModeCtxMap",
    "pm_mvmode": "PredModeCtxMap", "pm_mix": "PredModeCtxMap",
    "pm_cmn": "PredModeCtxMap", "pm_cf": "PredModeCtxMap",
    "pm_cs": "PredModeCtxMap",
    "lit_hi": "LiteralCommand(data)", "lit_lo": "LiteralCommand(data)",
    "cm_first": "LiteralCommand(data)", "cm_second": "LiteralCommand(data)",
}


def bill(traces: list[np.ndarray], freqs: np.ndarray,
         layout: ModelLayout) -> dict[str, float]:
    """Bits per designation across all metablocks.

    traces: per-metablock int32[n,10]; freqs: [B, N] from model_pass.
    Mix steps are billed to the *mixed* CDF actually used (same as the
    reference, which bills at the coder call site)."""
    row_bucket = np.empty(layout.num_rows, dtype=object)
    row_bucket[0] = "CrossCommand"
    for name, (off, shape) in layout.segments.items():
        row_bucket[off:off + int(np.prod(shape))] = _BUCKETS[name]
    out: dict[str, float] = {}
    for i, t in enumerate(traces):
        n = t.shape[0]
        f = freqs[i, :n].astype(np.float64)
        bits = -np.log2(np.maximum(f, 1) / 32768.0)
        for bucket in np.unique(row_bucket[t[:, 0]]):
            sel = row_bucket[t[:, 0]] == bucket
            out[bucket] = out.get(bucket, 0.0) + float(bits[sel].sum())
    return out


def format_table(bits: dict[str, float], raw_len: int,
                 compressed_len: int) -> str:
    lines = ["  bits       bytes    designation"]
    for k in sorted(bits, key=lambda k: -bits[k]):
        lines.append(f"{bits[k]:12.1f} {bits[k] / 8:10.1f}    {k}")
    total = sum(bits.values())
    lines.append(f"{total:12.1f} {total / 8:10.1f}    TOTAL (model)")
    lines.append(f"actual compressed: {compressed_len} bytes; "
                 f"ratio {compressed_len / max(1, raw_len):.4f}")
    return "\n".join(lines)
