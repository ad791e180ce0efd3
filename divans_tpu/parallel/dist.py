"""Multi-chip distribution: metablock data parallelism over a device mesh.

The codec has no tensors/gradients; its scaling axis is metablock data
parallelism (SURVEY.md §2 parallelism table): each metablock is an
independent model domain, so the batch dimension of every engine kernel
shards cleanly over a 1-D `data` mesh.  The compressed segments are
ragged; each device produces its lanes' words locally and the host (or an
all_gather for the verify pass) concatenates in file order — the direct
analog of the reference's mux fairness interleave (src/mux.rs), with
frame order carrying the ordering instead of chunk headers.

Cross-host: the same code runs under multi-process JAX (jax.distributed);
the mesh then spans hosts and the per-host frame assembly only touches
addressable shards.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import jax_engine
from ..ans import kernels


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), (axis,))


def split_lanes(trace, starts, freqs):
    """Compact each metablock's (start, freq) rows by stream id into dense
    rANS lanes, on device (cumsum + scatter; stream -1 = padding)."""
    b, n = starts.shape
    stream = trace[:, :, 2]
    lanes = []
    for sid in (0, 1):
        m = stream == sid
        pos = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(m, pos, n)
        bi = jnp.arange(b)[:, None]
        ls = jnp.zeros_like(starts).at[bi, tgt].set(starts, mode="drop")
        lf = jnp.ones_like(freqs).at[bi, tgt].set(freqs, mode="drop")
        lanes.append((ls, lf, jnp.sum(m.astype(jnp.int32), axis=1)))
    return lanes


def sharded_encode_step(mesh: Mesh, r_cmd: int, r_lit: int, chunk: int = 0):
    """Build the jitted multi-chip encode step: per-stream trace batches
    -> lane words.

    Takes the cmd and lit sub-traces (jax_engine.split_stream_traces):
    the model row sets are stream-disjoint, so each stream's model pass
    runs independently for both the adaptive and deferred-v2 profiles
    (per-stream ticking).  Both traces shard along the metablock batch
    axis; every op inside is batch-parallel, so XLA partitions it with
    no collectives on the hot path.  chunk > 0 selects the deferred
    model pass (the fast device path); 0 the per-nibble adaptive scan."""
    from ..codec import deferred
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(batch, batch))
    def step(cmd_trace, lit_trace):
        out = []
        for trace, r, s in ((cmd_trace, r_cmd, deferred.cmd_chunk(chunk)),
                            (lit_trace, r_lit, chunk)):
            if chunk:
                starts, freqs = jax_engine.model_pass_deferred(trace, r, s)
            else:
                starts, freqs = jax_engine.model_pass(trace, r)
            # per-stream sub-traces are real rows then padding, so the
            # (start, freq) prefix IS the lane
            cnt = jnp.sum((trace[:, :, 2] >= 0).astype(jnp.int32), axis=1)
            out.append(jax.vmap(kernels._encode_lane)(starts, freqs, cnt))
        return out[0], out[1]

    return step


def sharded_decode_step(mesh: Mesh, layout, chunk: int, n_chunks: int,
                        interpret: bool = False):
    """Build the jitted multi-chip decode stage 2: each device runs its
    own 128-lane literal-decode kernel tile via shard_map — metablock
    data parallelism on the decode side, zero collectives (the host cmd
    pass and script execution are per-host and shard with the frames).

    Inputs are the global lane arrays (pallas_decode._decode_lit_scan
    shapes with the lane axis widened to n_devices * 128); returns the
    decoded byte matrix [lanes, n_chunks * chunk // 2]."""
    from jax.experimental.shard_map import shard_map
    from ..codec import pallas_decode

    perm, offs = pallas_decode.kernel_perm(layout)
    lit_base = layout.segments["lit_hi"][0]
    r_lit = layout.num_rows - lit_base + 1
    perm_a = jnp.asarray(perm)

    def tile(states, words, n_lit, lcmap_t, luts, spd):
        out, pulls = pallas_decode._decode_lit_scan(
            states, words, n_lit, lcmap_t, luts, spd, perm_a,
            r_lit, chunk, n_chunks, offs, interpret)
        return out, pulls

    sm = shard_map(
        tile, mesh=mesh,
        in_specs=(P("data"), P("data", None), P("data"), P(None, "data"),
                  P(None, None), P("data", None)),
        out_specs=(P("data", None), P("data")),
        check_rep=False)
    return jax.jit(sm)
