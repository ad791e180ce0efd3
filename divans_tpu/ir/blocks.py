"""Block-type segmentation: heterogeneous inputs -> literal block switches.

The reference inherits block splits from brotli's metablock splitter and
codes them as BlockSwitch commands with their own prior family
(/root/reference/src/codec/block_type.rs:18-195).  Our matcher is
brotli-free, so this module supplies the splitter: a byte-class
clustering over fixed windows.  Each block type addresses its own 64
context-map rows (engine_np._literal_nibble: cmap_index =
ctx + btype << 6), so heterogeneous segments (text vs binary vs tables)
stop polluting each other's literal models.

Opt-in via DivansOptions.block_split.  Since round 3, nb<=4 split
streams encode AND decode on the native fast path (split profile,
container flag 3 — native.py, COMPONENTS.md row 21); only nb>4 or
non-identity literal context maps fall back to the golden engine.
The full profile->decode-path matrix lives in DESIGN.md.
"""
from __future__ import annotations

import numpy as np

WIN = 4096          # classification window
MIN_SEG = 8192      # segments shorter than this merge into their left
MAX_TYPES = 4       # lcm values t*64+i must stay < 256
_THRESH = 0.55      # L1 feature distance to open a new block type


def _features(a: np.ndarray) -> np.ndarray:
    """Per-window byte-class fractions [nwin, 5]: letters, digits,
    whitespace/punct, zero bytes, high bytes."""
    nwin = len(a) // WIN
    w = a[:nwin * WIN].reshape(nwin, WIN)
    letter = ((w | 0x20) >= 97) & ((w | 0x20) <= 122)
    digit = (w >= 48) & (w <= 57)
    zero = w == 0
    high = w >= 128
    other = ~(letter | digit | zero | high)
    f = np.stack([letter.mean(1), digit.mean(1), other.mean(1),
                  zero.mean(1), high.mean(1)], axis=1)
    return f


def segment(data: bytes) -> list[tuple[int, int]]:
    """[(start_offset, block_type)] covering `data`; first type is 0.

    Greedy online clustering of window features into <= MAX_TYPES
    centroids, then run merging and short-segment absorption."""
    if len(data) < 2 * MIN_SEG:
        return [(0, 0)]
    a = np.frombuffer(data, np.uint8)
    feats = _features(a)
    centroids: list[np.ndarray] = []
    counts: list[int] = []
    labels = np.zeros(len(feats), np.int32)
    for i, f in enumerate(feats):
        if centroids:
            d = [float(np.abs(f - c).sum()) for c in centroids]
            j = int(np.argmin(d))
        else:
            d, j = [_THRESH + 1], 0
        if d[j] > _THRESH and len(centroids) < MAX_TYPES:
            centroids.append(f.copy())
            counts.append(1)
            j = len(centroids) - 1
        else:
            counts[j] += 1
            centroids[j] += (f - centroids[j]) / counts[j]
        labels[i] = j
    # windows -> segments, absorbing short runs leftward
    segs: list[list[int]] = []  # [start, label]
    for i, lab in enumerate(labels):
        if segs and segs[-1][1] == lab:
            continue
        start = i * WIN
        if segs and start - segs[-1][0] < MIN_SEG:
            continue  # too short: stay in the previous segment
        segs.append([start, int(lab)])
    # renumber by first appearance so the stream starts in type 0
    remap: dict[int, int] = {}
    out = []
    for start, lab in segs:
        t = remap.setdefault(lab, len(remap))
        if out and out[-1][1] == t:
            continue
        out.append((start, t))
    return out


def per_type_strides(data: bytes, segments) -> list[int]:
    """Literal-prior stride per block type (detect.detect_stride over the
    type's own bytes; 1 = the plain previous-byte prior)."""
    from .detect import detect_stride
    nb = max(t for _, t in segments) + 1
    bounds = [s for s, _ in segments] + [len(data)]
    parts: list[bytes] = [b""] * nb
    for (start, t), end in zip(segments, bounds[1:]):
        parts[t] += data[start:end]
    return [detect_stride(p, quality=1) for p in parts]


def prediction_mode_for(nb: int, options, strides=None):
    """PredictionMode whose literal context map gives each of the nb
    block types its own 64 rows (values t*64 + ctx), with per-type
    stride priors carried in the mixing mask (mv_mode=4: mask value
    4 + stride - 1 on the type's context slice)."""
    from . import commands as cmds
    from .matcher import default_prediction_mode
    pm = default_prediction_mode(options)
    lcm = bytes(t * 64 + i for t in range(nb) for i in range(64))
    mv = b""
    if strides and any(s > 1 for s in strides):
        vals = [0 if s <= 1 else 4 + min(7, s - 1) for s in strides]
        mv = bytes(vals[min((i & 0xFF) >> 6, nb - 1)]
                   for i in range(cmds.NUM_MIXING_VALUES))
    return cmds.PredictionMode(
        literal_prediction_mode=pm.literal_prediction_mode,
        context_mixing=pm.context_mixing,
        adv_context_map=pm.adv_context_map,
        prior_depth=pm.prior_depth,
        speeds=pm.speeds,
        literal_context_map=lcm,
        distance_context_map=pm.distance_context_map,
        mixing_values=mv,
    )


def inject_switches(raw: bytes, commands: list, segments, options) -> list:
    """Post-pass over the matcher's command list: split literal runs at
    segment boundaries and insert BlockSwitchLiteral commands; replaces
    the PredictionMode header with the nb-type variant."""
    from . import commands as cmds
    if len(segments) < 2:
        return commands
    nb = max(t for _, t in segments) + 1
    assert isinstance(commands[0], cmds.PredictionMode)
    out: list = [prediction_mode_for(nb, options,
                                     per_type_strides(raw, segments))]
    bounds = list(segments[1:]) + [(len(raw) + 1, -1)]
    si = 0
    pos = 0

    def maybe_switch(p: int) -> None:
        nonlocal si
        while p >= bounds[si][0]:
            out.append(cmds.BlockSwitchLiteral(block_type=bounds[si][1]))
            si += 1

    for cmd in commands[1:]:
        if isinstance(cmd, cmds.Literal):
            data = cmd.data
            off = 0
            while off < len(data):
                maybe_switch(pos + off)
                take = min(len(data) - off, bounds[si][0] - (pos + off))
                out.append(cmds.Literal(data[off:off + take]))
                off += take
            pos += len(data)
        else:
            maybe_switch(pos)
            out.append(cmd)
            if isinstance(cmd, cmds.Copy):
                pos += cmd.num_bytes
            elif isinstance(cmd, cmds.Dict):
                pos += cmd.final_size
    return out
