"""Benchmark: device encode + decode throughput (deferred profile).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~150 Mbit/s (18.75 MB/s) line speed
(/root/reference/README.md:6, BASELINE.md).

Measures the device portion of the codec on real alice29 streams,
batched over metablocks.  Every successful on-chip measurement is
persisted to BENCH_HISTORY.jsonl; if the axon tunnel is wedged at the
moment the driver runs this script (it wedges for an hour+ after heavy
use, PERF_NOTES.md), the last recorded on-chip result is reported with
metric suffix `_cached` rather than emitting a meaningless CPU number.

Methodology (PERF_NOTES.md "Bench methodology rules"): warm the jit
cache, sync via a device-side scalar pull, keep each timed region small
enough (<30 s) to finish inside a flaky-tunnel window, amortize the
~28 ms dispatch.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache: every kernel shape otherwise recompiles
# through the flaky axon tunnel on every bench run (each compile a
# crash window — BENCH_r05 first attempt died in remote_compile)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_bench"))

BASELINE_MBPS = 18.75
HISTORY = os.path.join(REPO, "BENCH_HISTORY.jsonl")


def _device_healthy(timeout_s: int = 150) -> bool:
    """Probe the axon tunnel in a daemon thread with a deadline.  (A
    grandchild-process probe is NOT reliable: nested python->python jax
    inits hang on the tunnel even when a direct child works.)  On timeout
    the caller gives up on this process (the hung thread holds the jax
    runtime lock), so the probe is only run before any other jax use."""
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


def _last_recorded():
    """Most recent persisted on-chip result per metric (file order)."""
    try:
        with open(HISTORY) as f:
            lines = [json.loads(x) for x in f if x.strip()]
    except OSError:
        return []
    latest: dict = {}
    for x in lines:
        if x.get("on_chip"):
            latest[x["metric"]] = x
    return list(latest.values())


def _record(entry: dict) -> None:
    with open(HISTORY, "a") as f:
        f.write(json.dumps(entry) + "\n")


def _exit_clean(code: int = 0) -> None:
    """Flush and exit WITHOUT running interpreter teardown.  The health
    probe's hung daemon thread poisons the jax runtime; normal teardown
    then aborts ("terminate called ... FATAL: exception not rethrown",
    BENCH_r04 rc=134).  The report is already on stdout; nothing
    after this point matters."""
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


def _report_cached_or_fail(live: list | None = None) -> None:
    """Report what we have: live metrics measured THIS run (if any),
    cached history for the rest, decode headline printed LAST (the
    driver's parsed field records the last JSON line)."""
    live = live or []
    live_names = {m for m, _ in live}
    rows = []
    for entry in _last_recorded():
        if entry["metric"] not in live_names:
            rows.append((entry["metric"] + "_cached", entry["value"],
                         entry["vs_baseline"]))
    for m, v in live:
        rows.append((m, round(v, 3), round(v / BASELINE_MBPS, 3)))
    headline = "device_decode_e2e_throughput"
    rows.sort(key=lambda r: r[0].startswith(headline))
    if not rows:
        rows = [("device_unreachable", 0.0, 0.0)]
    for m, v, vb in rows:
        print(json.dumps({
            "metric": m, "value": v, "unit": "MB/s", "vs_baseline": vb,
        }))
    _exit_clean(0)


def main():
    # The tunnel wedges transiently; retry the health probe over ~6 min
    # before falling back to the last persisted on-chip number.
    deadline = time.time() + 360
    healthy = _device_healthy(150)
    while not healthy and time.time() < deadline:
        time.sleep(45)
        # the hung probe thread poisons this process's jax runtime: probe
        # again from a fresh direct child (direct children work; only
        # nested grandchildren hang)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(int(jax.numpy.arange(4).sum()))"],
                capture_output=True, timeout=120, text=True)
            healthy = r.stdout.strip().endswith("6")
        except Exception:
            healthy = False
        if healthy and os.environ.get("DIVANS_BENCH_REEXEC") != "1":
            # this process's runtime may be poisoned by the first probe:
            # re-exec clean and skip straight to measurement
            env = dict(os.environ, DIVANS_BENCH_REEXEC="1")
            os.execve(sys.executable, [sys.executable, __file__], env)
    if not healthy:
        _report_cached_or_fail()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from divans_tpu.options import DivansOptions
    from divans_tpu.codec import jax_engine, trace as trace_mod
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.parallel import dist
    from divans_tpu.ans import pallas_kernels as pk

    on_chip = jax.default_backend() == "tpu"
    interpret = not on_chip

    CHUNK = 256  # deferred profile (codec/deferred.py): the device path
    data = open("/root/reference/testdata/alice29", "rb").read()
    opts = DivansOptions(metablock_size=1 << 16, chunk_nibbles=CHUNK)
    # e2e corpora: the stdlib mixed corpus (non-repeated real data — the
    # fleet-file methodology of reference research/timing_comparisons.py),
    # NOT base-replicated blobs (those flatter cache reuse; VERDICT r3
    # weak #8)
    sys.path.insert(0, os.path.join(REPO, "research"))
    from large_file_study import build_corpus
    corpus = build_corpus(64 << 20)
    assert len(corpus) >= (48 << 20), len(corpus)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)  # deferred format
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]

    reps = 88  # replicate blocks into a wider batch (264 metablocks, ~13 MB):
    # the ANS lanes amortize to >150 MB/s and the model passes gain ~35%
    # per-step efficiency at this width (research/probe_encode_stages.py)
    traces = traces * reps
    raw_bytes = sum(len(b) for b in blocks) * reps

    # the production encode path (jax_engine.compress): per-stream
    # deferred-v2 model passes over the split traces, then the Pallas
    # wide-rANS lanes
    from divans_tpu.codec import deferred as deferred_mod
    from divans_tpu.codec import pallas_cmd_pass as pcp
    cmd_ts, lit_ts, _masks, r_cmd, r_lit = \
        jax_engine.split_stream_traces(traces, layout)
    s_cmd = deferred_mod.cmd_chunk(CHUNK)
    n_cmd_padded = jax_engine._padded_len(
        max(t.shape[0] for t in cmd_ts), max(s_cmd, 16))
    cmd_packed = jnp.asarray(pcp.pack_cmd_traces(cmd_ts, n_cmd_padded, s_cmd))

    def lanes_to_pallas(st, fr, counts):
        nlanes, n = st.shape
        g = -(-nlanes // 128)
        lpad = g * 128 - nlanes
        npad = -(-n // pk.BLOCK_T) * pk.BLOCK_T - n
        st = jnp.pad(st, ((0, lpad), (0, npad)))
        fr = jnp.pad(fr, ((0, lpad), (0, npad)), constant_values=1)
        cnt = jnp.pad(counts, ((0, lpad),))
        st = jnp.swapaxes(st, 0, 1).reshape(-1, g, 128)
        fr = jnp.swapaxes(fr, 0, 1).reshape(-1, g, 128)
        return pk.encode_lanes_pallas(st, fr, cnt.reshape(g, 128),
                                      interpret=interpret)

    from divans_tpu.codec import pallas_lit_pass as plp
    n_lit_padded = max(jax_engine._padded_len(
        max(t.shape[0] for t in lit_ts), CHUNK), CHUNK)
    lit_res = plp.pack_lit_traces(lit_ts, n_lit_padded, CHUNK)
    assert lit_res is not None
    lit_packed = jnp.asarray(lit_res[0])
    lit_spd_pl = jnp.asarray(lit_res[1])

    cmd_counts = jnp.asarray(np.array([t.shape[0] for t in cmd_ts], np.int32))
    lit_counts = jnp.asarray(np.array([t.shape[0] for t in lit_ts], np.int32))
    assert jax_engine._lit_pass_usable(layout, lit_ts)
    cspd = jax_engine.cmd_speeds_from_rows(cmd_ts, r_cmd)
    assert cspd is not None
    inc_bd, lim_bd = pcp.build_speed_planes(cspd[0], cspd[1], r_cmd)
    inc_bd, lim_bd = jnp.asarray(inc_bd), jnp.asarray(lim_bd)

    @jax.jit
    def encode_step(cmd_packed, lit_packed, lit_spd_pl, cmd_counts,
                    lit_counts):
        nrn = pcp.renorm_passes_bound(cspd[0], cspd[1], s_cmd)
        cs, cf = pcp._cmd_pass_call(cmd_packed, inc_bd, lim_bd, r_cmd,
                                    s_cmd, interpret,
                                    nrn if nrn is not None and nrn <= 2
                                    else None)
        cs, cf = cs[:cmd_counts.shape[0]], cf[:cmd_counts.shape[0]]
        ls, lf = plp._lit_pass_call(lit_packed, lit_spd_pl, CHUNK,
                                    interpret)
        ls, lf = ls[:lit_counts.shape[0]], lf[:lit_counts.shape[0]]
        acc = jnp.int32(0)
        for st, fr, cnt in ((cs, cf, cmd_counts), (ls, lf, lit_counts)):
            words, flags, states = lanes_to_pallas(st, fr, cnt)
            # sync via a scalar: block_until_ready under-reports on the
            # axon tunnel and full-array transfer pollutes with tunnel bw
            acc = acc + (jnp.sum(states) + jnp.sum(flags.astype(jnp.int32))
                         + jnp.sum(words.astype(jnp.int32)))
        return acc

    def timed(fn, *args, n_iter=3):
        int(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n_iter):
            int(fn(*args))
        return (time.perf_counter() - t0) / n_iter

    results = []

    def live_record(metric, mbps):
        """Persist each live on-chip result the moment it exists, so a
        tunnel crash later in the run can never lose it."""
        results.append((metric, mbps))
        _record({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "metric": metric, "value": round(mbps, 3),
                 "unit": "MB/s",
                 "vs_baseline": round(mbps / BASELINE_MBPS, 3),
                 "on_chip": on_chip})

    try:
        dt = timed(encode_step, cmd_packed, lit_packed, lit_spd_pl,
                   cmd_counts, lit_counts)
        enc_mbps = raw_bytes / dt / 1e6
        # STAGE RATE, not an end-to-end number: times the device model
        # passes + Pallas ANS over pre-packed, pre-uploaded traces (no
        # matcher, no H2D, no assembly).  The honest whole-pipeline
        # numbers are the *_e2e_* metrics below.
        live_record("device_encode_stage_rate", enc_mbps)
    except Exception as e:  # tunnel flake: report what we have
        print(f"bench aborted in stage-rate: {e!r}", file=sys.stderr)
        if not on_chip:
            results = [(m + "_cpu", v) for (m, v) in results]
        _report_cached_or_fail(results)

    # ---- device decode: END-TO-END (container in -> raw bytes out, all
    # host stages timed — the metric the reference's 18.75 MB/s line
    # speed defines).  64 MiB of the stdlib mixed corpus in 256 KiB
    # metablocks = two 128-lane batches, so the threaded cmd pass and
    # host script execution overlap the device kernels (steady-state
    # pipeline, as a decode service would run).
    dec_mbps = None
    try:
        from divans_tpu.codec import pallas_decode
    except ImportError:
        pallas_decode = None
    if pallas_decode is not None and getattr(pallas_decode, "READY", False):
        from divans_tpu import native
        # ---- device encode: END-TO-END (raw bytes in -> container out:
        # C++ matcher/FSM/cmd-stream threads + device literal model pass
        # + Pallas ANS + serialize — jax_engine._compress_hybrid).  This
        # is what a compress() caller gets, matcher included.  q9 is the
        # greedy+lazy speed point; q10 (the ratio default) runs the
        # threaded cost-model DP parse.
        try:
            for q, name in ((9, "device_encode_e2e_throughput"),
                            (10, "device_encode_e2e_q10_throughput")):
                enc_data = corpus[:32 << 20]
                eopts = DivansOptions(metablock_size=1 << 18,
                                      chunk_nibbles=CHUNK, quality=q)
                jax_engine.compress(enc_data, eopts)  # warm (compiles)
                # best-of, matching bench_decode's methodology: the
                # tunnel's dispatch latency varies ~20% run to run and a
                # persistent service runs at the sustained (best) rate
                dt2 = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    blob2 = jax_engine.compress(enc_data, eopts)
                    dt2 = min(dt2, time.perf_counter() - t0)
                assert native.decompress(blob2) == enc_data
                live_record(name, len(enc_data) / dt2 / 1e6)

            # ---- device decode: END-TO-END (container in -> raw bytes
            # out, all host stages timed — the metric the reference's
            # 18.75 MB/s line speed defines), measured LAST so it is the
            # final JSON line (the driver's parsed headline).
            dec_data = corpus[:48 << 20]
            dec_opts = DivansOptions(metablock_size=1 << 18,
                                     chunk_nibbles=CHUNK)
            blob = native.compress(dec_data, dec_opts)
            if blob is not None:
                dec_mbps = pallas_decode.bench_decode(blob)
            if dec_mbps is not None:
                live_record("device_decode_e2e_throughput", dec_mbps)
        except Exception as e:  # tunnel flake: report what we have
            print(f"bench aborted mid-run: {e!r}", file=sys.stderr)
            if not on_chip:
                results = [(m + "_cpu", v) for (m, v) in results]
            _report_cached_or_fail(results)

    # report everything: live metrics (already persisted), cached
    # history for anything not measured this run, decode headline LAST
    if not on_chip and results:
        results = [(m + "_cpu", v) for (m, v) in results]
    _report_cached_or_fail(results)


if __name__ == "__main__":
    main()
