"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest forces XLA_FLAGS host_platform_device_count=8).

The sharded encode step must produce the same lane bytes as the
unsharded path — metablock data parallelism changes placement, not
results."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divans_tpu.codec import jax_engine, trace as trace_mod
from divans_tpu.codec.layout import ModelLayout, PROFILES
from divans_tpu.ir.matcher import build_commands
from divans_tpu.options import DivansOptions
from divans_tpu.ans import kernels
from divans_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return dist.make_mesh(devs[:8])


def test_sharded_encode_matches_unsharded(mesh8):
    layout = ModelLayout(PROFILES["cm"])
    opts = DivansOptions(metablock_size=4096)
    rng = np.random.RandomState(0)
    blocks = [bytes(rng.randint(97, 105, size=1500).astype(np.uint8))
              for _ in range(16)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]
    trace = jnp.asarray(jax_engine._pad_traces(traces))

    step = dist.sharded_encode_step(mesh8, layout.num_rows)
    (cw, cn, cs), (lw, ln, ls) = step(trace)

    starts, freqs = jax_engine.model_pass(trace, layout.num_rows)
    (cs0, cf0, cc0), (ls0, lf0, lc0) = dist.split_lanes(trace, starts, freqs)
    cw2, cn2, cs2 = jax.vmap(kernels._encode_lane)(cs0, cf0, cc0)
    np.testing.assert_array_equal(np.asarray(cn), np.asarray(cn2))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cs2))
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw2))
    lw2, ln2, ls2 = jax.vmap(kernels._encode_lane)(ls0, lf0, lc0)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(ln2))
    np.testing.assert_array_equal(np.asarray(lw), np.asarray(lw2))


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == args[0].shape[:2]
