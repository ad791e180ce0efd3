#!/usr/bin/env python3
"""Measured multi-process (fake-pod) scaling: encode AND decode steps.

VERDICT r1 #7 + r2 #7 / BASELINE.md scaling target: run the
metablock-data-parallel steps under `jax.distributed` with 1, 2 and 4 OS
processes on this host, same 4-device global mesh and the same global
batch (strong scaling), verify outputs are bit-exact across process
counts, and report per-config efficiency (T1/TN).

Both directions shard with zero hot-path collectives:
  encode — dist.sharded_encode_step (model pass + rANS lanes);
  decode — dist.sharded_decode_step (one 128-lane literal-kernel tile
  per device via shard_map; interpret mode on CPU, so the absolute
  number is meaningless — only the scaling ratio is the result).

The reference's analog is its 2-thread producer/consumer pipeline
(/root/reference/src/multithreading.rs:19-235).

Usage:
    python research/multihost_scaling.py            # parent: all configs
    python research/multihost_scaling.py --child I N PORT {enc|dec}  # internal
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


def child(proc_id: int, nprocs: int, port: int, which: str = "enc") -> None:
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
    if which == "dec":
        return decode_child(proc_id, nprocs, mesh)

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


def decode_child(proc_id: int, nprocs: int, mesh) -> None:
    import jax
    import numpy as np
    import jax.numpy as jnp
    from divans_tpu.options import DivansOptions
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.codec import deferred, pallas_decode
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.parallel import dist
    from jax.sharding import NamedSharding, PartitionSpec as P

    chunk = 64
    n_chunks = 8        # 256 lit bytes per lane: interpret mode is slow;
                        # only the scaling ratio matters on CPU
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    data = open("/root/reference/testdata/alice29", "rb").read()[:16384]
    opts = DivansOptions(metablock_size=1 << 12, chunk_nibbles=chunk)
    rows = []
    for o in range(0, len(data), 1 << 12):
        raw = data[o:o + (1 << 12)]
        cb, lb = deferred.encode_metablock(raw, build_commands(raw, opts),
                                           opts, chunk)
        sc = deferred.decode_cmd_structure(cb, len(raw), opts, chunk)
        rows.append((lb, sc))
    lanes = N_DEV * 128
    reps = [rows[i % len(rows)] for i in range(lanes)]
    cap = n_chunks * (chunk // 2)
    packed = pallas_decode.pack_lit_lanes(
        [r[0] for r in reps], [min(cap, r[1].lit_total) for r in reps],
        [r[1].lcmap for r in reps], [r[1].speeds for r in reps],
        lanes=lanes)
    step = dist.sharded_decode_step(mesh, layout, chunk, n_chunks,
                                    interpret=True)
    specs = (P("data"), P("data", None), P("data"), P(None, "data"),
             P(None, None), P("data", None))
    gargs = []
    for arr, spec in zip(packed, specs):
        sh = NamedSharding(mesh, spec)
        lo = proc_id * lanes // nprocs
        hi = (proc_id + 1) * lanes // nprocs
        local = arr[lo:hi] if spec[0] == "data" else             (arr[:, lo:hi] if len(spec) > 1 and spec[1] == "data" else arr)
        gargs.append(jax.make_array_from_process_local_data(
            sh, local, arr.shape))

    def run():
        out, pulls = step(*gargs)
        jax.block_until_ready(out)
        return out

    out = run()
    t0 = time.perf_counter()
    n_iter = 2
    for _ in range(n_iter):
        out = run()
    dt = (time.perf_counter() - t0) / n_iter
    from jax.experimental import multihost_utils
    full = multihost_utils.process_allgather(out, tiled=True)
    digest = zlib.crc32(np.ascontiguousarray(full).tobytes())
    if proc_id == 0:
        print(json.dumps({"nprocs": nprocs, "step_s": round(dt, 4),
                          "digest": digest}), flush=True)


def e2e_child(proc_id: int, nprocs: int, which: str) -> None:
    """Whole-pipeline per-process scaling (VERDICT r3 #8): each process
    compresses/decompresses its round-robin shard of a ~24 MiB mixed
    corpus through the native engine — raw bytes -> container (matcher
    included) or container -> raw bytes.  Frames are independent, so
    there are no collectives at all; on a real pod the only cross-host
    step is the ordered gather of finished frames (file assembly)."""
    import numpy as np
    sys.path.insert(0, os.path.join(REPO, "research"))
    from large_file_study import build_corpus
    from divans_tpu.options import DivansOptions
    from divans_tpu import native

    data = build_corpus(24 << 20)
    opts = DivansOptions(metablock_size=1 << 18, chunk_nibbles=CHUNK,
                         quality=10)
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    shard = blocks[proc_id::nprocs]     # round-robin: balanced content mix
    payload = b"|".join(shard)
    if which == "dec_e2e":
        shard_blobs = [native.compress(b, opts) for b in shard]

        def run():
            return b"".join(native.decompress(bl) for bl in shard_blobs)

        assert run() == b"".join(shard)   # correctness, then timing
    else:
        def run():
            return b"".join(native.compress(b, opts) for b in shard)

        for b, bl in zip(shard, [native.compress(b, opts) for b in shard]):
            assert native.decompress(bl) == b

    out = run()   # warm (page cache, lib load)
    t0 = time.perf_counter()
    n_iter = 2
    for _ in range(n_iter):
        out = run()
    dt = (time.perf_counter() - t0) / n_iter
    digest = zlib.crc32(payload if which == "dec_e2e" else out)
    # per-shard digests recombine order-independently via (id, crc) pairs
    print(json.dumps({"nprocs": nprocs, "step_s": round(dt, 4),
                      "mbps": round(sum(len(b) for b in shard) / dt / 1e6,
                                    2),
                      "digest": digest, "shard_bytes":
                      sum(len(b) for b in shard)}), flush=True)


def parent() -> None:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=").strip()
    summary = {}
    # e2e whole-pipeline scaling (no jax.distributed: frames are
    # independent; each pinned process runs its shard through the
    # native engine, matcher included)
    ncores = os.cpu_count() or 1
    for which in ("enc_e2e", "dec_e2e"):
        results = {}
        for nprocs in (1, 2, 4):
            procs = []
            for i in range(nprocs):
                per = max(1, ncores // nprocs)
                pin = ["taskset", "-c",
                       ",".join(str(c) for c in range(i * per,
                                                      (i + 1) * per))]
                procs.append(subprocess.Popen(
                    pin + [sys.executable, os.path.abspath(__file__),
                           "--child", str(i), str(nprocs), "0", which],
                    env=env, stdout=subprocess.PIPE, text=True))
            outs = [p.communicate(timeout=1800)[0] for p in procs]
            assert all(p.returncode == 0 for p in procs), outs
            rows = [json.loads(o.strip().splitlines()[-1]) for o in outs]
            total_mb = sum(r["shard_bytes"] for r in rows) / 1e6
            t_max = max(r["step_s"] for r in rows)
            results[nprocs] = {"step_s": t_max,
                               "mbps": round(total_mb / t_max, 2)}
            print(which, nprocs, results[nprocs], flush=True)
        summary[which] = {
            f"efficiency_{n}proc": round(
                results[1]["step_s"] / (n * results[n]["step_s"]), 3)
            for n in (2, 4)}
        summary[which]["mbps"] = {n: results[n]["mbps"] for n in (1, 2, 4)}
    for which in ("enc", "dec"):
        results = {}
        for nprocs in (1, 2, 4):
            port = 23456 + nprocs + (100 if which == "dec" else 0)
            procs = []
            e = dict(env)
            e["XLA_FLAGS"] += str(N_DEV // nprocs)
            ncores = os.cpu_count() or 1
            for i in range(nprocs):
                # pin each process to its core slice: one "host" per
                # process.  Without pinning every XLA CPU client grabs all
                # cores and the run measures oversubscription, not scaling.
                per = max(1, ncores // nprocs)
                pin = ["taskset", "-c",
                       ",".join(str(c) for c in range(i * per, (i + 1) * per))]
                procs.append(subprocess.Popen(
                    pin + [sys.executable, os.path.abspath(__file__),
                           "--child", str(i), str(nprocs), str(port), which],
                    env=e, stdout=subprocess.PIPE, text=True))
            outs = [p.communicate(timeout=1800)[0] for p in procs]
            assert all(p.returncode == 0 for p in procs), outs
            results[nprocs] = json.loads(outs[0].strip().splitlines()[-1])
            print(which, results[nprocs], flush=True)
        digests = {r["digest"] for r in results.values()}
        assert len(digests) == 1, f"{which}: multi-process output diverged"
        # strong scaling over a fixed 4-device mesh: ideal T_N == T_1
        summary[which] = {
            f"efficiency_{n}proc": round(
                results[1]["step_s"] / results[n]["step_s"], 3)
            for n in (2, 4)}
        summary[which]["t_s"] = {n: results[n]["step_s"] for n in (1, 2, 4)}
    print(json.dumps({"bit_exact": True, **summary}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        mode = sys.argv[5] if len(sys.argv) > 5 else "enc"
        if mode.endswith("_e2e"):
            e2e_child(int(sys.argv[2]), int(sys.argv[3]), mode)
        else:
            child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                  mode)
    else:
        parent()
