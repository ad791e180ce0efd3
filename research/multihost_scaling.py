#!/usr/bin/env python3
"""Measured multi-process (fake-pod) scaling of the sharded encode step.

VERDICT r1 #7 / BASELINE.md scaling target: run the metablock-data-parallel
encode step under `jax.distributed` with 1 and 2 OS processes on this host,
same 4-device global mesh and the same global batch (strong scaling), verify
the compressed lane words are bit-exact across process counts, and report
the 2-process efficiency (T1/T2).

The reference's analog is its 2-thread producer/consumer pipeline
(/root/reference/src/multithreading.rs:19-235); here the scaling axis is
metablock data parallelism over a process-spanning mesh
(divans_tpu/parallel/dist.py) — no collectives on the hot path, one
process_allgather for the bit-exactness check only.

Usage:
    python research/multihost_scaling.py            # parent: runs both configs
    python research/multihost_scaling.py --child I N PORT   # internal
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = 96            # global metablock batch
MB_LOG = 14       # 16 KiB metablocks keep the CPU step < 30 s
CHUNK = 256
N_DEV = 4         # global device count, fixed across process counts


def child(proc_id: int, nprocs: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(f"localhost:{port}", nprocs, proc_id)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from divans_tpu.options import DivansOptions
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.codec import trace as trace_mod, jax_engine, deferred
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.parallel import dist

    assert jax.device_count() == N_DEV, jax.devices()
    mesh = dist.make_mesh()

    # deterministic global workload, built identically in every process
    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << MB_LOG, chunk_nibbles=CHUNK)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)][:8]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]
    traces = (traces * (B // len(traces) + 1))[:B]
    cmd_ts, lit_ts, _m, r_cmd, r_lit = \
        jax_engine.split_stream_traces(traces, layout)
    s_cmd = deferred.cmd_chunk(CHUNK)
    cmd_pad = jax_engine._pad_traces(cmd_ts, multiple=s_cmd)
    lit_pad = jax_engine._pad_traces(lit_ts, multiple=CHUNK)

    sharding = NamedSharding(mesh, P("data"))
    gc = jax.make_array_from_process_local_data(
        sharding, cmd_pad[proc_id * B // nprocs:(proc_id + 1) * B // nprocs],
        cmd_pad.shape)
    gl = jax.make_array_from_process_local_data(
        sharding, lit_pad[proc_id * B // nprocs:(proc_id + 1) * B // nprocs],
        lit_pad.shape)

    step = dist.sharded_encode_step(mesh, r_cmd, r_lit, CHUNK)

    def run():
        (cw, cn, cs), (lw, ln, ls) = step(gc, gl)
        jax.block_until_ready((cw, lw))
        return (cw, cn, cs), (lw, ln, ls)

    out = run()  # compile + warm
    t0 = time.perf_counter()
    n_iter = 3
    for _ in range(n_iter):
        out = run()
    dt = (time.perf_counter() - t0) / n_iter

    # bit-exactness across process counts: gather every lane's words
    from jax.experimental import multihost_utils
    digest = 0
    for arr in (out[0][0], out[0][1], out[0][2],
                out[1][0], out[1][1], out[1][2]):
        full = multihost_utils.process_allgather(arr, tiled=True)
        digest = zlib.crc32(np.ascontiguousarray(full).tobytes(), digest)
    raw_bytes = sum(len(b) for b in blocks) * (B // len(blocks))
    if proc_id == 0:
        print(json.dumps({"nprocs": nprocs, "step_s": round(dt, 4),
                          "mbps": round(raw_bytes / dt / 1e6, 3),
                          "digest": digest}), flush=True)


def parent() -> None:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=").strip()
    results = {}
    for nprocs in (1, 2):
        port = 23456 + nprocs
        procs = []
        e = dict(env)
        e["XLA_FLAGS"] += str(N_DEV // nprocs)
        ncores = os.cpu_count() or 1
        for i in range(nprocs):
            # pin each process to its core slice: one "host" per process.
            # Without pinning every XLA CPU client grabs all cores and the
            # 2-process run measures oversubscription, not scaling.
            per = max(1, ncores // nprocs)
            pin = ["taskset", "-c",
                   ",".join(str(c) for c in range(i * per, (i + 1) * per))]
            procs.append(subprocess.Popen(
                pin + [sys.executable, os.path.abspath(__file__),
                       "--child", str(i), str(nprocs), str(port)],
                env=e, stdout=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        results[nprocs] = json.loads(outs[0].strip().splitlines()[-1])
        print(results[nprocs], flush=True)
    r1, r2 = results[1], results[2]
    assert r1["digest"] == r2["digest"], "multi-process output diverged"
    eff = r1["step_s"] / r2["step_s"]
    print(json.dumps({"bit_exact": True,
                      "efficiency_2proc": round(eff, 3),
                      "t1_s": r1["step_s"], "t2_s": r2["step_s"]}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        parent()
