"""Stage tracing: the reference's threadlog, re-aimed at device stages.

The reference instruments its 2-thread pipeline with a per-thread event
log (ThreadEvent timeline, /root/reference/src/multithreading.rs:26-111)
so stalls between the muxing thread and the literal-decoding thread are
visible.  Here the concurrency is batched device stages, so the analog
is a per-stage wall-clock timeline of one compress()/decompress() call:
trace build, model pass, lane coding, frame assembly — the places a
"stall" (dispatch gap, host<->device transfer, recompilation) hides.

Zero overhead when disabled.  Enable with env DIVANS_TRACELOG=1, the CLI
flag `-timing`, or `tracelog.enable()`; read with `events()`/`report()`.

    with tracelog.span("model_pass", nibbles=n):
        ...

The log is process-global and append-only within one enable window; it
intentionally records host-observed wall times (what a production
operator sees) rather than device counters — pair with `jax.profiler`
for on-chip traces.
"""
from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field


@dataclass
class Event:
    name: str
    t0: float
    dt: float
    meta: dict = field(default_factory=dict)


_events: list[Event] = []
_enabled = os.environ.get("DIVANS_TRACELOG", "") not in ("", "0")
_t_origin = time.perf_counter()


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def clear() -> None:
    del _events[:]


def events() -> list[Event]:
    return list(_events)


@contextlib.contextmanager
def span(name: str, **meta):
    """Time a stage; no-op (one bool check) when tracing is disabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _events.append(Event(name, t0 - _t_origin,
                             time.perf_counter() - t0, meta))


def report() -> str:
    """Aggregated per-stage table (the threadlog summary view)."""
    if not _events:
        return "tracelog: no events (enable with DIVANS_TRACELOG=1)"
    agg: dict[str, list[float]] = {}
    for e in _events:
        agg.setdefault(e.name, []).append(e.dt)
    total = sum(sum(v) for v in agg.values())
    lines = ["  total ms   calls   avg ms    %     stage"]
    for name in sorted(agg, key=lambda k: -sum(agg[k])):
        s = sum(agg[name])
        n = len(agg[name])
        lines.append(f"{s * 1e3:10.1f} {n:7d} {s / n * 1e3:8.2f} "
                     f"{100 * s / total:5.1f}    {name}")
    lines.append(f"{total * 1e3:10.1f}                         TOTAL")
    return "\n".join(lines)
