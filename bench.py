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
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_MBPS = 18.75


def _device_healthy(timeout_s: int = 150) -> bool:
    """The axon tunnel can wedge (PERF_NOTES.md); probe it in a daemon
    thread with a deadline.  (A grandchild-process probe is NOT reliable:
    nested python->python jax inits hang on the tunnel even when a direct
    child works.)  On timeout the caller execve()s the CPU fallback,
    which replaces the process and discards the hung thread."""
    import threading
    result = []

    def probe():
        try:
            import jax
            result.append(int(jax.numpy.arange(4).sum()) == 6)
        except Exception:
            result.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(result and result[0])


def main():
    healthy = True
    if os.environ.get("DIVANS_BENCH_CHILD") != "1":
        healthy = _device_healthy()
        if not healthy:
            time.sleep(60)              # the tunnel wedges transiently
            healthy = _device_healthy(60)
    if os.environ.get("DIVANS_BENCH_CHILD") != "1" and not healthy:
        # TPU unreachable: rerun ourselves on CPU and tag the metric
        env = dict(os.environ, DIVANS_BENCH_CHILD="1",
                   DIVANS_BENCH_CPU_FALLBACK="1")
        env["JAX_PLATFORMS"] = "cpu"
        os.execve(sys.executable, [sys.executable, __file__], env)
    import numpy as np
    import jax
    if os.environ.get("DIVANS_BENCH_CPU_FALLBACK") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from divans_tpu.options import DivansOptions
    from divans_tpu.codec import jax_engine, trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.ans import kernels
    from divans_tpu.parallel import dist

    from divans_tpu.ans import pallas_kernels as pk

    CHUNK = 256  # deferred profile (codec/deferred.py): the device path
    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
    layout = ModelLayout(PROFILES["cm"])
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]

    reps = 22  # replicate blocks into a wider batch (66 metablocks, ~10 MB)
    traces = traces * reps
    raw_bytes = sum(len(b) for b in blocks) * reps
    trace = jnp.asarray(jax_engine._pad_traces(traces, multiple=CHUNK))

    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def step(trace):
        starts, freqs = jax_engine.model_pass_deferred(trace,
                                                       layout.num_rows, CHUNK)
        (cs, cf, cc), (ls, lf, lc) = dist.split_lanes(trace, starts, freqs)
        # assemble the 2B rANS lanes into the Pallas [N, G, 128] layout
        st = jnp.concatenate([cs, ls], axis=0)
        fr = jnp.concatenate([cf, lf], axis=0)
        cnt = jnp.concatenate([cc, lc], axis=0)
        nlanes, n = st.shape
        g = -(-nlanes // 128)
        lpad = g * 128 - nlanes
        npad = -(-n // pk.BLOCK_T) * pk.BLOCK_T - n
        st = jnp.pad(st, ((0, lpad), (0, npad)))
        fr = jnp.pad(fr, ((0, lpad), (0, npad)), constant_values=1)
        cnt = jnp.pad(cnt, ((0, lpad),))
        st = jnp.swapaxes(st, 0, 1).reshape(-1, g, 128)
        fr = jnp.swapaxes(fr, 0, 1).reshape(-1, g, 128)
        words, flags, states = pk.encode_lanes_pallas(
            st, fr, cnt.reshape(g, 128), interpret=interpret)
        # sync via a scalar: block_until_ready under-reports on the axon
        # tunnel and full-array transfer pollutes with tunnel bandwidth
        # (PERF_NOTES.md)
        return (jnp.sum(states) + jnp.sum(flags.astype(jnp.int32))
                + jnp.sum(words.astype(jnp.int32)))

    int(step(trace))  # compile + warm
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        int(step(trace))
    dt = (time.perf_counter() - t0) / n_iter
    mbps = raw_bytes / dt / 1e6
    metric = "device_encode_throughput"
    if os.environ.get("DIVANS_BENCH_CPU_FALLBACK") == "1":
        metric += "_cpu_fallback"  # TPU tunnel was unreachable
    print(json.dumps({
        "metric": metric,
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
