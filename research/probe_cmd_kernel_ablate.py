#!/usr/bin/env python3
"""Timing-only ablation inside the packed-lane cmd kernel.

Variants (wrong outputs where noted; same shapes/dataflow):
  full      — production kernel
  no-renorm — commit = model + pend only (no while_loop)
  no-hist   — histogram matmuls replaced by zeros
  no-fold   — output fold replaced by a single dummy store
  no-sfreq  — start/freq extraction (gsum16 + exact_div) stubbed
  no-fetch  — fetch matmuls replaced by CDF_INIT constant
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from divans_tpu.options import DivansOptions
from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.codec import deferred as deferred_mod
from divans_tpu.codec import pallas_cmd_pass as pcp
from divans_tpu.codec.pallas_cmd_pass import (
    G, T_FOLD, _bcast15, _colmod, _exact_div, _gsum16, _lane_of_k, _r_pad,
    _split_bf16)
from divans_tpu.probability.cdf16 import LOG2_SCALE
from divans_tpu.codec.deferred import MAX_RENORM_PASSES

interpret = jax.default_backend() != "tpu"
CHUNK = 256
data = open("/root/reference/testdata/alice29", "rb").read()
opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
mb = opts.metablock_size
blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
          for b in blocks]
traces = traces * 88
cmd_ts, _lit, _m, r_cmd, _r = jax_engine.split_stream_traces(traces, layout)
s_cmd = deferred_mod.cmd_chunk(CHUNK)
n_padded = jax_engine._padded_len(max(t.shape[0] for t in cmd_ts),
                                  max(s_cmd, 16))
packed = jnp.asarray(pcp.pack_cmd_traces(cmd_ts, n_padded, s_cmd))
cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
inc_bd, lim_bd = pcp.build_speed_planes(cspd[0], cspd[1], r_cmd)
inc_bd, lim_bd = jnp.asarray(inc_bd), jnp.asarray(lim_bd)
cmd_nibs = sum(int(t.shape[0]) for t in cmd_ts)
print(f"packed {tuple(packed.shape)} cmd_nibs={cmd_nibs/1e6:.2f}M r={r_cmd}",
      flush=True)


def make_kernel(s, r_pad, mode):
    kr = G * r_pad

    def kernel(trace_ref, inc_ref, lim_ref, out_ref, model_ref,
               pend_add_ref, pend_tot_ref, bias_ref, bd_ref, rowk_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            cm_kr = _colmod((kr, 128))
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (kr, 128), 1) // 16
            _, lane_k = _lane_of_k((kr, 128), 0, r_pad)
            bd0 = lane_k == lane_c
            bias_ref[:] = cm_kr + 1
            bd_ref[:] = bd0.astype(jnp.int32)
            model_ref[:] = jnp.where(bd0, 4 * (cm_kr + 1), 0)
            pend_add_ref[:] = jnp.zeros((kr, 128), jnp.int32)
            pend_tot_ref[:] = jnp.zeros((kr, 128), jnp.int32)
            ks0, lane_ks0 = _lane_of_k((s, kr), 1, r_pad)
            rowk_ref[:] = ks0 - lane_ks0 * r_pad

        bias = bias_ref[:]
        bd_mask = bd_ref[:] != 0

        tp = trace_ref[0, 0]
        flat8 = tp & 0xFF
        val8 = (tp >> 8) & 0xF
        act8 = (tp >> 12) & 1
        flat8 = jnp.where(act8 != 0, flat8, r_pad - 1)

        lrow8 = jax.lax.broadcasted_iota(jnp.int32, (G, kr), 0)
        _, lane_k8 = _lane_of_k((G, kr), 1, r_pad)
        e8c = (lrow8 == lane_k8).astype(jnp.bfloat16)
        lrow16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        lcol16 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) // 16
        e16c = (lrow16 == lcol16).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        flat_e = jax.lax.dot_general(
            flat8.astype(jnp.bfloat16), e8c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        val_rep = jax.lax.dot_general(
            val8.astype(jnp.bfloat16), e16c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        act_rep = jax.lax.dot_general(
            act8.astype(jnp.bfloat16), e16c, dn,
            preferred_element_type=jnp.float32).astype(jnp.int32)

        oh = (flat_e == rowk_ref[:]).astype(jnp.bfloat16)
        cm_s = _colmod((s, 128))

        if mode == "no-fetch":
            fetched = 4 * (cm_s + 1) + act_rep * 0
        else:
            model = model_ref[:]
            m_hi, m_lo = _split_bf16(model)
            f_hi = jax.lax.dot_general(oh, m_hi, dn,
                                       preferred_element_type=jnp.float32)
            f_lo = jax.lax.dot_general(oh, m_lo, dn,
                                       preferred_element_type=jnp.float32)
            fetched = (f_hi.astype(jnp.int32) << 7) + f_lo.astype(jnp.int32)
            fetched = jnp.where(act_rep != 0, fetched, 4 * (cm_s + 1))

        if mode == "no-sfreq":
            packed_o = fetched
        else:
            vh_sym = (val_rep == cm_s)
            vh_prev = (val_rep - 1 == cm_s)
            c_sym = _gsum16(jnp.where(vh_sym, fetched, 0))
            c_prev = _gsum16(jnp.where(vh_prev, fetched, 0))
            maxv = _bcast15(fetched)
            r_sym = _exact_div(c_sym << LOG2_SCALE, maxv)
            r_prev = jnp.where(val_rep > 0,
                               _exact_div(c_prev << LOG2_SCALE, maxv), 0)
            packed_o = (r_prev + 1) | ((r_sym - r_prev - 1) << 16)
            packed_o = jnp.where(cm_s == 0, packed_o, 0)

        if mode == "no-fold":
            out_ref[0, 0, :, :] = jnp.broadcast_to(packed_o[0:1, :] * 0,
                                                   (8, 128))
        else:
            for t16 in range(s // T_FOLD):
                acc = jnp.zeros((1, 128), jnp.int32)
                for j in range(T_FOLD):
                    acc = acc + pltpu.roll(
                        packed_o[T_FOLD * t16 + j:T_FOLD * t16 + j + 1, :],
                        j, 1)
                out_ref[0, 0, t16:t16 + 1, :] = acc
            out_ref[0, 0, s // T_FOLD:, :] = jnp.zeros(
                (8 - s // T_FOLD, 128), jnp.int32)

        if mode == "no-hist":
            new_add = pend_add_ref[:]
            new_tot = pend_tot_ref[:]
        else:
            vh_ge = ((val_rep <= cm_s) & (act_rep != 0)).astype(jnp.bfloat16)
            dn_t = (((0,), (0,)), ((), ()))
            cnt_cum = jax.lax.dot_general(
                oh, vh_ge, dn_t,
                preferred_element_type=jnp.float32).astype(jnp.int32)
            tot = jax.lax.dot_general(
                oh, act_rep.astype(jnp.bfloat16), dn_t,
                preferred_element_type=jnp.float32).astype(jnp.int32)
            cnt_cum = jnp.where(bd_mask, cnt_cum, 0)
            new_add = inc_ref[:] * cnt_cum
            new_tot = jnp.where(bd_mask, tot, 0)

        committed = model_ref[:] + pend_add_ref[:]
        if mode != "no-renorm":
            lim_eff = jnp.where(pend_tot_ref[:] > 0, lim_ref[:], 0x8000)
            cm15 = bias == 16

            def cond(carry):
                i, arr = carry
                return (i < MAX_RENORM_PASSES) & jnp.any(
                    (arr >= lim_eff) & cm15)

            def body(carry):
                i, arr = carry
                over = _bcast15(arr) >= lim_eff
                cb = arr + bias
                return i + 1, jnp.where(over & bd_mask, cb - (cb >> 2), arr)

            _, committed = jax.lax.while_loop(cond, body,
                                              (jnp.int32(0), committed))
        model_ref[:] = committed
        pend_add_ref[:] = new_add
        pend_tot_ref[:] = new_tot

    return kernel


def call(mode):
    ng, c, s, _g = packed.shape
    r_pad = _r_pad(r_cmd + 1)
    kr = G * r_pad

    @jax.jit
    def run(packed, inc_bd, lim_bd):
        out = pl.pallas_call(
            make_kernel(s, r_pad, mode),
            grid=(ng, c),
            in_specs=[
                pl.BlockSpec((1, 1, s, G), lambda g, i: (g, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kr, 128), lambda g, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kr, 128), lambda g, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, 128), lambda g, i: (g, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ng, c, 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((kr, 128), jnp.int32)] * 5
            + [pltpu.VMEM((s, kr), jnp.int32)],
            interpret=interpret,
        )(packed, inc_bd, lim_bd)
        return jnp.sum(out & 0xFF)

    return run


def timed(fn, n=3):
    int(fn(packed, inc_bd, lim_bd))
    t0 = time.perf_counter()
    for _ in range(n):
        int(fn(packed, inc_bd, lim_bd))
    return (time.perf_counter() - t0) / n


for mode in ("full", "no-renorm", "no-hist", "no-fold", "no-sfreq",
             "no-fetch"):
    t = timed(call(mode))
    print(f"{mode:10s} {t*1e3:8.1f} ms  {cmd_nibs/t/1e6:6.1f} Mnib/s",
          flush=True)
