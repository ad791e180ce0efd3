"""Benchmark: device encode throughput (model-pass scan + wide rANS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~150 Mbit/s (18.75 MB/s) line speed
(/root/reference/README.md:6, BASELINE.md).

Measures the device portion of encode (adaptive-model scan + rANS
lanes) on real traces from alice29, batched over metablocks — the
TPU-resident part of the pipeline.  Host trace building is excluded
(its native implementation is tracked separately).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_MBPS = 18.75


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from divans_tpu.options import DivansOptions
    from divans_tpu.codec import jax_engine, trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.ans import kernels
    from divans_tpu.parallel import dist

    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << 16)
    layout = ModelLayout(PROFILES["cm"])
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]

    reps = 8  # replicate blocks into a wider batch
    traces = traces * reps
    raw_bytes = sum(len(b) for b in blocks) * reps
    trace = jnp.asarray(jax_engine._pad_traces(traces))

    @jax.jit
    def step(trace):
        starts, freqs = jax_engine.model_pass(trace, layout.num_rows)
        (cs, cf, cc), (ls, lf, lc) = dist.split_lanes(trace, starts, freqs)
        cmd = jax.vmap(kernels._encode_lane)(cs, cf, cc)
        lit = jax.vmap(kernels._encode_lane)(ls, lf, lc)
        # sync via a scalar: block_until_ready under-reports on the axon
        # tunnel and full-array transfer pollutes with tunnel bandwidth
        # (PERF_NOTES.md)
        return (jnp.sum(cmd[0]) + jnp.sum(cmd[2]) + jnp.sum(lit[0])
                + jnp.sum(lit[2]))

    int(step(trace))  # compile + warm
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        int(step(trace))
    dt = (time.perf_counter() - t0) / n_iter
    mbps = raw_bytes / dt / 1e6
    print(json.dumps({
        "metric": "device_encode_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
