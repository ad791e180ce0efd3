"""Batched JAX decode: the full codec FSM as one device scan.

Decode of one metablock is irreducibly sequential in nibbles, so the TPU
story is breadth: B metablocks decode in lockstep, one FSM micro-step per
scan iteration per lane (DESIGN.md §3).  Each step decodes at most one
nibble per lane (from its cmd or lit rANS stream) or executes up to
COPY_CHUNK bytes of a copy, with every branch of the reference's command
FSM expressed as masked integer selects.

Control flow mirrors the golden engine exactly (engine_np.py — itself
cited against the reference state machines: codec/mod.rs Begin,
literal.rs length FSM + hot loop, copy.rs length/distance mnemonics,
context_map.rs header).  Profiles (codec/layout.py) bound the dense model
shapes; lanes that leave the profile (dict commands, block switches,
out-of-range context values, corrupt streams) flag an error and are
re-decoded host-side by the golden engine — the fast path never produces
wrong bytes, it abstains.

All arithmetic is int32 (model rows int16, window uint8).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants
from ..ans.coder_np import RENORM_BITS, STATE_LOW, ENC_START_STATE
from ..probability import cdf16, weights as weights_mod
from .layout import ModelLayout, PROFILES

SCALE_MASK = (1 << 15) - 1
COPY_CHUNK = 8

# ----------------------------------------------------------------- states
DONE = 0
BEGIN = 1
L_CS, L_BEG, L_LAST, L_MANT, L_HI, L_LO = 2, 3, 4, 5, 6, 7
C_CS, C_BEG, C_LAST, C_MANT = 8, 9, 10, 11
C_DMN, C_DBEG, C_DLAST, C_DMANT = 12, 13, 14, 15
COPY_RUN = 16
P_ONLY, P_DCM, P_PD, P_SPD, P_CMN, P_CF, P_CS, P_MVMODE = \
    17, 18, 19, 20, 21, 22, 23, 24
ERROR = 25
NSTATES = 26

# per-state blend speeds (inc, lim); 0 where unused or computed at runtime
_SPEED_TAB = np.zeros((NSTATES, 2), np.int32)
for _st, _sp in {
    BEGIN: (0x180, 0x4000),                       # ROCKET (cc)
    L_CS: (0x30, 0x4000), L_BEG: (0x10, 0x2000),  # MED, MUD
    L_LAST: (0x10, 0x2000), L_MANT: (0x10, 0x2000),
    C_CS: (0x10, 0x2000), C_BEG: (0x60, 0x4000),  # MUD, FAST
    C_LAST: (0x60, 0x4000), C_MANT: (0x20, 0x1000),   # FAST, SLOW
    C_DMN: (0x20, 0x1000), C_DBEG: (0x20, 0x1000),    # SLOW
    C_DLAST: (0x180, 0x4000),                     # ROCKET
    C_DMANT: (0, 0),                              # runtime
    P_ONLY: (0x30, 0x4000), P_DCM: (0x30, 0x4000),
    P_PD: (0x60, 0x4000), P_SPD: (0x60, 0x4000),
    P_CMN: (0x30, 0x4000), P_CF: (0x30, 0x4000), P_CS: (0x30, 0x4000),
    P_MVMODE: (0x30, 0x4000),
}.items():
    _SPEED_TAB[_st] = _sp

_LUT0 = np.stack([constants.literal_lut0(m).astype(np.int32) for m in range(4)])
_LUT1 = np.stack([constants.literal_lut1(m).astype(np.int32) for m in range(4)])


def _bl(x):
    """bit_length of non-negative int32."""
    return cdf16._bit_length_pos(x, jnp)


def _rum4(x):
    """round_up_mod_4 (engine_np.round_up_mod_4)."""
    return ((x - 1) | 3) + 1


def _u8_to_speed(b):
    """probability/speed.py u8_to_speed, vectorized int32."""
    lv = jnp.maximum((b >> 3) - 1, 0)
    val = (1 << lv) | (((b & 0x7) << lv) >> 3)
    return jnp.where(b < 8, 0, val)


def _sel(st, mapping, default):
    """Select per-state int32 values: {state: value} -> where chain."""
    out = default
    for s, v in mapping.items():
        out = jnp.where(st == s, v, out)
    return out


@functools.partial(jax.jit, static_argnames=("profile", "window_size",
                                             "max_steps"))
def decode_scan(cmd_states, cmd_words, lit_states, lit_words, raw_len,
                profile, window_size, max_steps):
    """Decode B metablocks in lockstep.

    Returns (window uint8[B, window_size], ok bool[B], wpos int32[B])."""
    lay = ModelLayout(PROFILES[profile])
    p = lay.profile
    b = raw_len.shape[0]
    bidx = jnp.arange(b)
    speed_tab = jnp.asarray(_SPEED_TAB)
    lut0 = jnp.asarray(_LUT0)
    lut1 = jnp.asarray(_LUT1)

    def seg(name):
        return lay.segments[name][0]

    init = {
        "st": jnp.full(b, BEGIN, jnp.int32),
        "steps": jnp.int32(0),
        "cs": jnp.asarray(cmd_states, jnp.int32),
        "cp": jnp.zeros(b, jnp.int32),
        "ls": jnp.asarray(lit_states, jnp.int32),
        "lp": jnp.zeros(b, jnp.int32),
        "model": jnp.broadcast_to(
            jnp.asarray(np.asarray(cdf16.CDF_INIT, np.int16)),
            (b, lay.num_rows, 16)).astype(jnp.int16),
        "weights": jnp.tile(jnp.asarray(
            [[1, 1, weights_mod.NORM_WEIGHT_INIT]], jnp.int32), (b, 2, 1)
        ).reshape(b, 2, 3),
        "window": jnp.zeros((b, window_size), jnp.uint8),
        "wpos": jnp.zeros(b, jnp.int32),
        "l4s": jnp.full(b, 3 << 4, jnp.int32),
        "dlru": jnp.tile(jnp.asarray([[4, 11, 15, 16]], jnp.int32), (b, 1)),
        "llen": jnp.ones(b, jnp.int32),
        "clen": jnp.ones(b, jnp.int32),
        "dlen": jnp.ones(b, jnp.int32),
        "nb": jnp.zeros(b, jnp.int32),
        "dist": jnp.zeros(b, jnp.int32),
        "acc": jnp.zeros(b, jnp.int32),
        "lrem": jnp.zeros(b, jnp.int32),
        "first": jnp.zeros(b, jnp.int32),
        "r0": jnp.zeros(b, jnp.int32),
        "tmpa": jnp.zeros(b, jnp.int32),
        "cnt": jnp.zeros(b, jnp.int32),
        "which": jnp.zeros(b, jnp.int32),
        "cmidx": jnp.zeros(b, jnp.int32),
        "aprior": jnp.zeros(b, jnp.int32),
        "pm_mode": jnp.full(b, 3, jnp.int32),
        "combine": jnp.zeros(b, jnp.int32),
        "cmap_lru": jnp.tile(jnp.arange(13, dtype=jnp.int32)[None], (b, 1)),
        "lcm": jnp.zeros((b, 64), jnp.int32),
        "dcm": jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (b, 1)),
        "speeds": jnp.tile(jnp.asarray([[0x10, 0x2000]], jnp.int32),
                           (b, 4, 1)).reshape(b, 4, 2),
    }

    UNROLL = 4  # FSM micro-steps per while iteration (PERF_NOTES.md:
                # XLA loop iterations carry ~10us overhead; the body is
                # a no-op for DONE/ERROR lanes so over-stepping is safe)

    def cond(c):
        live = (c["st"] != DONE) & (c["st"] != ERROR)
        return jnp.any(live) & (c["steps"] < max_steps)

    def body_once(c):
        st = c["st"]
        wpos = c["wpos"]
        window = c["window"]

        use_lit = (st == L_HI) | (st == L_LO)
        nocode = (st == DONE) | (st == ERROR) | (st == COPY_RUN)
        use_cmd = ~use_lit & ~nocode

        # ---- literal context (cheap; only consumed by L_HI/L_LO lanes)
        prev_byte = jnp.where(
            wpos > 0, window[bidx, jnp.maximum(wpos - 1, 0)], 0).astype(jnp.int32)
        prev_prev = jnp.where(
            wpos > 1, window[bidx, jnp.maximum(wpos - 2, 0)], 0).astype(jnp.int32)
        selected = (jnp.take(lut0.reshape(-1), c["pm_mode"] * 256 + prev_byte)
                    | jnp.take(lut1.reshape(-1), c["pm_mode"] * 256 + prev_prev))
        ctx = c["lcm"][bidx, selected & 63]
        if p.lit_sel == 0:      # cm profile (deferred layouts bucket lo ctx)
            ctx_lo = ctx >> lay.lo_shift
            hi_flat = seg("lit_hi") + ctx
            lo_flat = seg("lit_lo") + ctx_lo * 16 + c["r0"]
            cm_hi = seg("cm_first") + ctx
            cm_lo = seg("cm_second") + c["r0"] * lay.nctx_lo + ctx_lo
        else:                   # stride profile (ctx is always 0)
            hi_flat = seg("lit_hi") + prev_byte
            lo_flat = seg("lit_lo") + prev_byte * 16 + c["r0"]
            cm_hi = seg("cm_first") + ctx
            cm_lo = seg("cm_second") + c["r0"] * lay.nctx_lo + ctx

        # ---- per-state cmd-table row
        cs_index = ((c["l4s"] >> 4) & 3) + 4 * jnp.minimum(c["llen"] - 1, 3)
        fi_c = (c["clen"] % 4) + 1
        fi_d = (c["dlen"] & 3) + 1
        flat = _sel(st, {
            BEGIN: seg("cc") + (c["l4s"] >> 4),
            L_CS: seg("ll_cs"), L_BEG: seg("ll_beg"), L_LAST: seg("ll_last"),
            L_MANT: seg("ll_mant"),
            L_HI: hi_flat, L_LO: lo_flat,
            C_CS: seg("c_ccs") + cs_index,
            C_BEG: seg("c_cbeg"), C_LAST: seg("c_clast"),
            C_MANT: seg("c_cmant") + jnp.where(c["first"] != 0, fi_c, 0),
            C_DMN: seg("c_dmn") + c["aprior"] * 2
                + jnp.where(c["llen"] < 8, 1, 0),
            C_DBEG: seg("c_dbeg") + c["aprior"] * 8 + (_bl(c["nb"]) >> 2),
            C_DLAST: seg("c_dlast") + c["aprior"],
            C_DMANT: seg("c_dmant") + c["aprior"] * 5
                + jnp.where(c["first"] != 0, fi_d, 0),
            P_ONLY: seg("pm_only"), P_DCM: seg("pm_dcm"), P_PD: seg("pm_pd"),
            P_SPD: seg("pm_palette") + (c["cnt"] & 3),
            P_CMN: seg("pm_cmn") + c["which"],
            P_CF: seg("pm_cf") + c["which"],
            P_CS: seg("pm_cs") + c["which"],
            P_MVMODE: seg("pm_mvmode"),
        }, jnp.zeros(b, jnp.int32))

        # ---- blend speed for the coded row
        sp = speed_tab[st]                      # [B, 2]
        inc, lim = sp[:, 0], sp[:, 1]
        # literal content: adaptation[0]
        sp_lit = c["speeds"][:, 0]
        inc = jnp.where(use_lit, sp_lit[:, 0], inc)
        lim = jnp.where(use_lit, sp_lit[:, 1], lim)
        # distance mantissa: runtime speed (copy.rs:240-280)
        dmant_inc = jnp.where(
            c["first"] != 0,
            0x4 << ((fi_d & 6) << ((fi_d & 2) >> 1)), 0x4)
        is_dmant = st == C_DMANT
        inc = jnp.where(is_dmant, dmant_inc, inc)
        lim = jnp.where(is_dmant, 0x4000, lim)

        # ---- ANS peek (gated per stream)
        cans = {"state": c["cs"], "pos": c["cp"]}
        lans = {"state": c["ls"], "pos": c["lp"]}
        pull_c = use_cmd & (cans["state"] < STATE_LOW)
        wc = jnp.take_along_axis(
            cmd_words, (cans["pos"] % cmd_words.shape[1])[:, None], axis=1)[:, 0]
        cstate = jnp.where(pull_c, (cans["state"] << RENORM_BITS) | wc,
                           cans["state"])
        cpos = cans["pos"] + pull_c.astype(jnp.int32)
        pull_l = use_lit & (lans["state"] < STATE_LOW)
        wl = jnp.take_along_axis(
            lit_words, (lans["pos"] % lit_words.shape[1])[:, None], axis=1)[:, 0]
        lstate = jnp.where(pull_l, (lans["state"] << RENORM_BITS) | wl,
                           lans["state"])
        lpos = lans["pos"] + pull_l.astype(jnp.int32)
        slot = jnp.where(use_lit, lstate, cstate) & SCALE_MASK

        # ---- CDF fetch, symbol, advance, blends
        model = c["model"]
        weights = c["weights"]
        rows = model[bidx, flat].astype(jnp.int32)
        cm_flat = jnp.where(st == L_HI, cm_hi, jnp.where(st == L_LO, cm_lo, 0))
        cm_rows = model[bidx, cm_flat].astype(jnp.int32)
        do_mix = use_lit & (c["combine"] != 0)
        which_w = jnp.where(st == L_HI, 1, 0)
        wsel = weights[bidx, which_w]
        mixed = cdf16.average(cm_rows, rows, wsel[:, 2] & 0xFFFF, xp=jnp)
        coded = jnp.where(do_mix[:, None], mixed, rows)
        v = cdf16.offset_to_sym(coded, slot, xp=jnp)
        start, freq = cdf16.sym_to_start_freq(coded, v, xp=jnp)
        adv = freq * (jnp.where(use_lit, lstate, cstate) >> 15) \
            + slot - start
        cstate = jnp.where(use_cmd, adv, cstate)
        lstate = jnp.where(use_lit, adv, lstate)
        # mixer update
        _, p_cm = cdf16.sym_to_start_freq(cm_rows, v, xp=jnp)
        _, p_nib = cdf16.sym_to_start_freq(rows, v, xp=jnp)
        w0n, w1n, nw = weights_mod.update(wsel[:, 0], wsel[:, 1],
                                          p_cm, p_nib, freq, xp=jnp)
        new_w = jnp.stack([w0n, w1n, nw], axis=-1)
        weights = weights.at[bidx, which_w].set(
            jnp.where(do_mix[:, None], new_w, wsel))
        # blends (gated: no-code lanes write row 0 unchanged)
        g_inc = jnp.where(nocode, 0, inc)
        g_lim = jnp.where(nocode, 0x4000, lim)
        g_flat = jnp.where(nocode, 0, flat)
        rows2 = cdf16.blend(rows, v, g_inc, g_lim, xp=jnp).astype(jnp.int16)
        model = model.at[bidx, g_flat].set(
            jnp.where(nocode[:, None], model[bidx, 0], rows2))
        cm_sp = c["speeds"][bidx, jnp.where(st == L_HI, 3, 2)]
        cm2 = cdf16.blend(cm_rows, v, jnp.where(do_mix, cm_sp[:, 0], 0),
                          jnp.where(do_mix, cm_sp[:, 1], 0x4000),
                          xp=jnp).astype(jnp.int16)
        g_cm = jnp.where(do_mix, cm_flat, 0)
        model = model.at[bidx, g_cm].set(
            jnp.where(do_mix[:, None], cm2, model[bidx, 0]))

        # =========================== transitions ===========================
        nxt = dict(c, cs=cstate, cp=cpos, ls=lstate, lp=lpos,
                   model=model, weights=weights,
                   steps=c["steps"] + 1)
        st2 = st
        err = jnp.zeros(b, bool)
        nb, acc, lrem, first = c["nb"], c["acc"], c["lrem"], c["first"]
        llen, clen, dlen = c["llen"], c["clen"], c["dlen"]
        l4s, dist = c["l4s"], c["dist"]
        aprior = c["aprior"]
        do_setup = jnp.zeros(b, bool)
        setup_d = jnp.zeros(b, jnp.int32)

        def upd(mask, cur, new):
            return jnp.where(mask, new, cur)

        # --- BEGIN
        m = st == BEGIN
        st2 = upd(m & (v == 0xF), st2, DONE)
        err |= m & (v == 0xF) & (wpos != raw_len)
        ml = m & (v == 3)
        l4s = upd(ml, l4s, ((l4s >> 2) | 128) & 0xFF)
        st2 = upd(ml, st2, L_CS)
        nxt["tmpa"] = jnp.where(ml, 0, c["tmpa"])  # high-entropy escape seen
        mc = m & (v == 1)
        l4s = upd(mc, l4s, ((l4s >> 2) | 64) & 0xFF)
        st2 = upd(mc, st2, C_CS)
        mp = m & (v == 7)
        st2 = upd(mp, st2, P_ONLY)
        nxt["cmap_lru"] = jnp.where(
            mp[:, None], jnp.arange(13, dtype=jnp.int32)[None], c["cmap_lru"])
        nxt["dcm"] = jnp.where(mp[:, None],
                               jnp.arange(4, dtype=jnp.int32)[None], c["dcm"])
        nxt["lcm"] = jnp.where(mp[:, None], 0, c["lcm"])
        err |= m & ((v == 2) | (v == 4) | (v == 5) | (v == 6)
                    | (v == 0) | ((v >= 8) & (v <= 14)))

        # --- L_CS
        m = st == L_CS
        short = m & (v < 14)
        nb = upd(short, nb, v + 1)
        llen = upd(short, llen, v + 1)
        st2 = upd(short, st2, L_HI)
        st2 = upd(m & (v == 14), st2, L_BEG)
        # high-entropy escape: length re-coded next nibble (once)
        esc = m & (v == 15)
        err |= esc & (c["tmpa"] != 0)
        nxt["tmpa"] = jnp.where(esc, 1, nxt["tmpa"])
        # (escape lanes stay in L_CS)

        # --- L_BEG
        m = st == L_BEG
        st2 = upd(m & (v == 15), st2, L_LAST)
        m2 = m & (v <= 1)
        nb = upd(m2, nb, 15 + v)
        st2 = upd(m2, st2, L_HI)           # quirk: llen not updated
        m3 = m & (v >= 2) & (v < 15)
        lrem = upd(m3, lrem, _rum4(v - 1))
        acc = upd(m3, acc, 1 << jnp.minimum(v - 1, 30))
        first = upd(m3, first, 0)
        st2 = upd(m3, st2, L_MANT)

        # --- L_LAST
        m = st == L_LAST
        lrem = upd(m, lrem, _rum4(v + 14))
        acc = upd(m, acc, 1 << jnp.minimum(v + 14, 30))
        err |= m & (v + 14 >= 31)
        st2 = upd(m, st2, L_MANT)

        # --- L_MANT (literal length mantissa)
        m = st == L_MANT
        nrem = lrem - 4
        acc = upd(m, acc, acc | (v << jnp.maximum(nrem, 0)))
        lrem = upd(m, lrem, nrem)
        fin = m & (nrem == 0)
        nb = upd(fin, nb, acc + 15)
        llen = upd(fin, llen, acc + 15)
        st2 = upd(fin, st2, L_HI)

        # --- L_HI
        m = st == L_HI
        nxt["r0"] = upd(m, c["r0"], v)
        st2 = upd(m, st2, L_LO)

        # --- L_LO: write the byte
        m = st == L_LO
        err |= m & (wpos >= raw_len)
        byte = ((c["r0"] << 4) | v).astype(jnp.uint8)
        tgt = jnp.where(m & (wpos < raw_len), wpos, window.shape[1])
        window = window.at[bidx, tgt].set(byte, mode="drop")
        wpos = upd(m, wpos, wpos + 1)
        nb = upd(m, nb, nb - 1)
        st2 = upd(m, st2, jnp.where(nb > 0, L_HI, BEGIN))

        # --- C_CS
        m = st == C_CS
        short = m & (v < 15)
        nb = upd(short, nb, v)
        clen = upd(short, clen, _bl(v))
        # distance prior needs num_bytes: computed at C_DMN entry
        st2 = upd(short, st2, C_DMN)
        st2 = upd(m & (v == 15), st2, C_BEG)

        # --- C_BEG
        m = st == C_BEG
        st2 = upd(m & (v == 15), st2, C_LAST)
        m2 = m & (v < 15)
        clen = upd(m2, clen, v + 4)
        lrem = upd(m2, lrem, _rum4(v + 3))
        acc = upd(m2, acc, 1 << jnp.minimum(v + 3, 30))
        first = upd(m2, first, 1)
        st2 = upd(m2, st2, C_MANT)

        # --- C_LAST
        m = st == C_LAST
        clen = upd(m, clen, v + 19)
        lrem = upd(m, lrem, _rum4(v + 18))
        acc = upd(m, acc, 1 << jnp.minimum(v + 18, 30))
        err |= m & (v + 18 >= 31)
        first = upd(m, first, 1)
        st2 = upd(m, st2, C_MANT)

        # --- C_MANT
        m = st == C_MANT
        nrem = lrem - 4
        acc = upd(m, acc, acc | (v << jnp.maximum(nrem, 0)))
        lrem = upd(m, lrem, nrem)
        first = upd(m, first, 0)
        fin = m & (nrem == 0)
        nb = upd(fin, nb, acc)
        st2 = upd(fin, st2, C_DMN)

        # entering C_DMN: compute the distance prior
        entering_dmn = (st2 == C_DMN) & (st != C_DMN)
        dprior_idx = jnp.minimum(jnp.maximum(nb, 2) - 2, 3)
        aprior = upd(entering_dmn, aprior, c["dcm"][bidx, dprior_idx])

        # --- C_DMN
        m = st == C_DMN
        st2 = upd(m & (v == 15), st2, C_DBEG)
        m2 = m & (v < 15)
        lt4 = v < 4
        d_lru = c["dlru"][bidx, jnp.minimum(v, 3)]
        unsigned = v >> 2
        signed = jnp.where((v & 1) != 0, -unsigned, unsigned)
        idx2 = (v & 2) >> 1
        d_calc = c["dlru"][bidx, idx2] + signed
        d_mn = jnp.where(lt4, d_lru, d_calc)
        err |= m2 & ~lt4 & (d_calc <= 0)
        dlen = upd(m2, dlen, _bl(jnp.maximum(d_mn, 0)))
        do_setup |= m2
        setup_d = upd(m2, setup_d, d_mn)

        # --- C_DBEG
        m = st == C_DBEG
        m15 = m & (v == 15)
        d15 = c["dlru"][:, 1] - 3
        dlen = upd(m15, dlen, _bl(jnp.maximum(d15, 0)))
        do_setup |= m15
        setup_d = upd(m15, setup_d, d15)
        st2 = upd(m & (v == 14), st2, C_DLAST)
        m0 = m & (v == 0)
        dlen = upd(m0, dlen, 1)
        do_setup |= m0
        setup_d = upd(m0, setup_d, 1)
        m2 = m & (v >= 1) & (v <= 13)
        dlen = upd(m2, dlen, v + 1)
        lrem = upd(m2, lrem, _rum4(v))
        acc = upd(m2, acc, 1 << jnp.minimum(v, 30))
        first = upd(m2, first, 1)
        st2 = upd(m2, st2, C_DMANT)

        # --- C_DLAST
        m = st == C_DLAST
        dlen = upd(m, dlen, v + 15)
        lrem = upd(m, lrem, _rum4(v + 14))
        acc = upd(m, acc, 1 << jnp.minimum(v + 14, 30))
        first = upd(m, first, 1)
        st2 = upd(m, st2, C_DMANT)

        # --- C_DMANT
        m = st == C_DMANT
        nrem = lrem - 4
        acc = upd(m, acc, acc | (v << jnp.maximum(nrem, 0)))
        lrem = upd(m, lrem, nrem)
        first = upd(m, first, 0)
        fin = m & (nrem == 0)
        do_setup |= fin
        setup_d = upd(fin, setup_d, acc)

        # --- copy setup: validate distance, update LRU, start the run
        err |= do_setup & ((setup_d <= 0) | (setup_d > wpos))
        lru = c["dlru"]
        eq1 = setup_d == lru[:, 1]
        eq2 = setup_d == lru[:, 2]
        eq0 = setup_d == lru[:, 0]
        new_lru = jnp.where(
            eq1[:, None],
            jnp.stack([setup_d, lru[:, 0], lru[:, 2], lru[:, 3]], -1),
            jnp.where(
                eq2[:, None],
                jnp.stack([setup_d, lru[:, 0], lru[:, 1], lru[:, 3]], -1),
                jnp.where(
                    eq0[:, None], lru,
                    jnp.stack([setup_d, lru[:, 0], lru[:, 1], lru[:, 2]], -1))))
        nxt["dlru"] = jnp.where(do_setup[:, None], new_lru, lru)
        dist = upd(do_setup, dist, setup_d)
        st2 = upd(do_setup, st2, jnp.where(nb > 0, COPY_RUN, BEGIN))

        # --- COPY_RUN: move up to COPY_CHUNK bytes
        m = st == COPY_RUN
        k = jnp.minimum(jnp.minimum(COPY_CHUNK, nb), dist)
        err |= m & (wpos + k > raw_len)
        offs = jnp.arange(COPY_CHUNK, dtype=jnp.int32)[None]
        src = jnp.clip(wpos[:, None] - dist[:, None] + offs, 0,
                       window.shape[1] - 1)
        vals = window[bidx[:, None], src]
        ok_w = m & (wpos + k <= raw_len)
        tgt = jnp.where(ok_w[:, None] & (offs < k[:, None]),
                        wpos[:, None] + offs, window.shape[1])
        window = window.at[bidx[:, None], tgt].set(vals, mode="drop")
        wpos = upd(m, wpos, wpos + k)
        nb = upd(m, nb, nb - k)
        st2 = upd(m, st2, jnp.where(nb > 0, COPY_RUN, BEGIN))

        # --- prediction-mode header
        m = st == P_ONLY
        err |= m & (v > 3)
        nxt["pm_mode"] = upd(m, c["pm_mode"], jnp.minimum(v, 3))
        st2 = upd(m, st2, P_DCM)

        m = st == P_DCM
        nxt["combine"] = upd(m, c["combine"], (v & 3) != 0)
        st2 = upd(m, st2, P_PD)

        m = st == P_PD
        nxt["cnt"] = upd(m, c["cnt"], 0)
        st2 = upd(m, st2, P_SPD)

        m = st == P_SPD
        pt = c["cnt"] & 3
        si = c["cnt"] >> 2
        tmpa = upd(m & (pt == 0), c["tmpa"], v << 3)
        tmpa = upd(m & (pt == 1), tmpa, tmpa | v)
        r0s = upd(m & (pt == 2), c["r0"], v << 3)
        r0s = upd(m & (pt == 3), r0s, r0s | v)
        nxt["tmpa"] = jnp.where(m, tmpa, nxt["tmpa"])
        nxt["r0"] = jnp.where(m, r0s, nxt["r0"])
        spd_done = m & (pt == 3)
        new_speed = jnp.stack([_u8_to_speed(tmpa), _u8_to_speed(r0s)], -1)
        sp_tgt = jnp.where(spd_done, si, 4)  # 4 = dropped
        nxt["speeds"] = c["speeds"].at[bidx, sp_tgt].set(
            new_speed, mode="drop")
        nxt["cnt"] = jnp.where(m, c["cnt"] + 1, nxt["cnt"])
        fin = m & (c["cnt"] == 15)
        nxt["which"] = upd(fin, c["which"], 0)
        nxt["cmidx"] = upd(fin, c["cmidx"], 0)
        st2 = upd(fin, st2, P_CMN)

        # context maps: mnemonic / escape / eof
        cmap_val = jnp.zeros(b, jnp.int32)
        do_obs = jnp.zeros(b, bool)
        m = st == P_CMN
        meof = m & (v == 14)
        to_dist = meof & (c["which"] == 0)
        nxt["cmap_lru"] = jnp.where(
            to_dist[:, None], jnp.arange(13, dtype=jnp.int32)[None],
            nxt["cmap_lru"])
        nxt["which"] = jnp.where(to_dist, 1, nxt["which"])
        nxt["cmidx"] = jnp.where(to_dist, 0, nxt["cmidx"])
        st2 = upd(meof & (c["which"] == 1), st2, P_MVMODE)
        st2 = upd(m & (v == 15), st2, P_CF)
        m13 = m & (v == 13)
        lru_max = jnp.max(c["cmap_lru"], axis=1)
        cmap_val = upd(m13, cmap_val, (lru_max + 1) & 0xFF)
        do_obs |= m13
        mmn = m & (v < 13)
        cmap_val = upd(mmn, cmap_val, c["cmap_lru"][bidx, jnp.minimum(v, 12)])
        do_obs |= mmn

        m = st == P_CF
        nxt["tmpa"] = jnp.where(m, v << 4, nxt["tmpa"])
        st2 = upd(m, st2, P_CS)

        m = st == P_CS
        esc_val = c["tmpa"] | v
        cmap_val = upd(m, cmap_val, esc_val)
        do_obs |= m
        st2 = upd(m, st2, P_CMN)

        # obs_context_map_for_lru + store into lcm/dcm
        lruc = nxt["cmap_lru"]
        eq = lruc == cmap_val[:, None]
        present = jnp.any(eq, axis=1)
        pos = jnp.argmax(eq, axis=1).astype(jnp.int32)
        shift_src = jnp.concatenate(
            [cmap_val[:, None], lruc[:, :-1]], axis=1)
        arange13 = jnp.arange(13, dtype=jnp.int32)[None]
        keep_tail = present[:, None] & (arange13 > pos[:, None])
        lru_obs = jnp.where(keep_tail, lruc, shift_src)
        lru_obs = jnp.where((present & (pos == 0))[:, None], lruc, lru_obs)
        nxt["cmap_lru"] = jnp.where(do_obs[:, None], lru_obs, lruc)
        is_lit_map = do_obs & (c["which"] == 0)
        is_dst_map = do_obs & (c["which"] == 1)
        err |= is_lit_map & ((c["cmidx"] >= 64) | (cmap_val >= p.nctx))
        err |= is_dst_map & ((c["cmidx"] >= 4) | (cmap_val >= p.nd))
        lcm_tgt = jnp.where(is_lit_map & (c["cmidx"] < 64), c["cmidx"], 64)
        nxt["lcm"] = nxt["lcm"].at[bidx, lcm_tgt].set(
            jnp.where(is_lit_map, cmap_val, 0), mode="drop")
        dcm_tgt = jnp.where(is_dst_map & (c["cmidx"] < 4), c["cmidx"], 4)
        nxt["dcm"] = nxt["dcm"].at[bidx, dcm_tgt].set(
            jnp.where(is_dst_map, cmap_val, 0), mode="drop")
        nxt["cmidx"] = jnp.where(do_obs, c["cmidx"] + 1, nxt["cmidx"])

        # mv_mode: profile must match
        m = st == P_MVMODE
        want = 0 if p.lit_sel == 0 else 1
        err |= m & (v != want)
        st2 = upd(m, st2, BEGIN)

        st2 = jnp.where(err, ERROR, st2)
        nxt.update(st=st2, window=window, wpos=wpos, l4s=l4s,
                   llen=llen, clen=clen, dlen=dlen, nb=nb, dist=dist,
                   acc=acc, lrem=lrem, first=first, aprior=aprior)
        return nxt

    def body(c):
        for _ in range(UNROLL):
            c = body_once(c)
        return c

    out = jax.lax.while_loop(cond, body, init)
    ok = (out["st"] == DONE) & (out["wpos"] == raw_len)
    return out["window"], ok, out["wpos"]
