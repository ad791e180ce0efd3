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


def sharded_encode_step(mesh: Mesh, num_rows: int, chunk: int = 0):
    """Build the jitted multi-chip encode step: trace batch -> lane words.

    The trace is sharded along the metablock batch axis; every op inside
    is batch-parallel, so XLA partitions it with no collectives on the
    hot path.  chunk > 0 selects the deferred-profile model pass (the
    fast device path); 0 the per-nibble adaptive scan."""
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(batch,))
    def step(trace):
        if chunk:
            starts, freqs = jax_engine.model_pass_deferred(trace, num_rows,
                                                           chunk)
        else:
            starts, freqs = jax_engine.model_pass(trace, num_rows)
        (cs, cf, cc), (ls, lf, lc) = split_lanes(trace, starts, freqs)
        cmd = jax.vmap(kernels._encode_lane)(cs, cf, cc)
        lit = jax.vmap(kernels._encode_lane)(ls, lf, lc)
        return cmd, lit

    return step
