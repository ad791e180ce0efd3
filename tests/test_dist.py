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
from divans_tpu.codec.deferred import cmd_chunk
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


def _padded_stream_traces(traces, layout, chunk):
    cmd_ts, lit_ts, _, r_cmd, r_lit = jax_engine.split_stream_traces(
        traces, layout)
    ct = jnp.asarray(jax_engine._pad_traces(cmd_ts,
                                            multiple=max(cmd_chunk(chunk), 1)
                                            if chunk else 1))
    lt = jnp.asarray(jax_engine._pad_traces(lit_ts, multiple=max(chunk, 1)))
    return ct, lt, r_cmd, r_lit


def test_sharded_encode_matches_unsharded(mesh8):
    layout = ModelLayout(PROFILES["cm"])
    opts = DivansOptions(metablock_size=4096)
    rng = np.random.RandomState(0)
    blocks = [bytes(rng.randint(97, 105, size=1500).astype(np.uint8))
              for _ in range(16)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]
    ct, lt, r_cmd, r_lit = _padded_stream_traces(traces, layout, 0)

    step = dist.sharded_encode_step(mesh8, r_cmd, r_lit)
    (cw, cn, cs), (lw, ln, ls) = step(ct, lt)

    # unsharded single-device reference over the same sub-traces
    st_c, fr_c = jax_engine.model_pass(ct, r_cmd)
    cc0 = jnp.asarray([t.shape[0] for t in
                       jax_engine.split_stream_traces(traces, layout)[0]],
                      jnp.int32)
    cw2, cn2, cs2 = jax.vmap(kernels._encode_lane)(st_c, fr_c, cc0)
    np.testing.assert_array_equal(np.asarray(cn), np.asarray(cn2))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cs2))
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw2))
    st_l, fr_l = jax_engine.model_pass(lt, r_lit)
    lc0 = jnp.asarray([int((t[:, 2] == 1).sum()) for t in traces], jnp.int32)
    lw2, ln2, ls2 = jax.vmap(kernels._encode_lane)(st_l, fr_l, lc0)
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


def test_sharded_e2e_container_roundtrip(mesh8):
    """Full pipeline on the mesh: sharded deferred encode -> host frame
    assembly in file order (the mux analog) -> serial decode -> bytes
    equal.  This is the 'decode on a different assignment than encode'
    verify pass of DESIGN.md's dist section, on 8 virtual chips."""
    from divans_tpu.container import format as fmt
    from divans_tpu.container.crc32c import crc32c
    from divans_tpu.codec import engine_np
    from divans_tpu.codec.deferred import chunk_to_flags

    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    chunk = 64
    opts = DivansOptions(metablock_size=4096, chunk_nibbles=chunk)
    data = open("/root/reference/testdata/alice29", "rb").read()[:32768]
    mb = opts.metablock_size
    blocks = [data[o:o + mb] for o in range(0, len(data), mb)]
    traces = [trace_mod.build_trace(b, build_commands(b, opts), opts, layout)
              for b in blocks]
    ct, lt, r_cmd, r_lit = _padded_stream_traces(traces, layout, chunk)

    step = dist.sharded_encode_step(mesh8, r_cmd, r_lit, chunk=chunk)
    (cw, cn, cs), (lw, ln, ls) = step(ct, lt)

    from divans_tpu.codec.deferred import lit_subs_join
    frames = []
    for i in range(len(blocks)):
        cmd = kernels.lanes_to_bytes(cw[i:i + 1], cn[i:i + 1], cs[i:i + 1])[0]
        lit = kernels.lanes_to_bytes(lw[i:i + 1], ln[i:i + 1], ls[i:i + 1])[0]
        # blocks < SUB_LIT: each frame's lit field is one sub-stream
        frames.append(fmt.MetablockFrame(len(blocks[i]), cmd,
                                         lit_subs_join([lit])))
    blob = fmt.serialize(frames, opts.window_size, opts.mb_log2,
                         crc32c(data), flags=chunk_to_flags(chunk))
    assert engine_np.decompress(blob) == data
    # and the container equals the single-process engine's
    assert blob == engine_np.compress(data, opts)


def test_sharded_decode_matches_oracle(mesh8):
    """Decode stage 2 sharded over the mesh (shard_map, one 128-lane
    kernel tile per device, zero collectives) must match the numpy
    oracle per lane — VERDICT r2 item 7's decode direction."""
    from divans_tpu.codec import deferred, pallas_decode

    devs = jax.devices()[:2]   # 2 tiles = 256 lanes keeps interpret fast
    mesh = dist.make_mesh(devs)
    chunk = 64
    data = open("/root/reference/testdata/alice29", "rb").read()[:16384]
    opts = DivansOptions(metablock_size=1 << 12, chunk_nibbles=chunk)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    blocks = [data[o:o + (1 << 12)] for o in range(0, len(data), 1 << 12)]
    rows = []
    for raw in blocks:
        cmds_ = build_commands(raw, opts)
        cb, lb_field = deferred.encode_metablock(raw, cmds_, opts, chunk)
        (lb,) = deferred.lit_subs_split(lb_field)  # blocks < SUB_LIT
        sc = deferred.decode_cmd_structure(cb, len(raw), opts, chunk)
        assert sc.supported
        rows.append((lb, sc))
    lanes = len(devs) * 128
    reps = [rows[i % len(rows)] for i in range(6)]  # a few live lanes
    states, words, n_lit, lcmap_t, luts, spd = pallas_decode.pack_lit_lanes(
        [r[0] for r in reps], [r[1].lit_total for r in reps],
        [r[1].lcmap for r in reps], [r[1].speeds for r in reps],
        lanes=lanes)
    s_bytes = chunk // 2
    n_chunks = max(1, -(-int(n_lit.max()) // s_bytes))
    step = dist.sharded_decode_step(mesh, layout, chunk, n_chunks,
                                    interpret=True)
    out, _pulls = step(jnp.asarray(states), jnp.asarray(words),
                       jnp.asarray(n_lit), jnp.asarray(lcmap_t),
                       jnp.asarray(luts), jnp.asarray(spd))
    out = np.asarray(out).astype(np.uint8)
    for i, (lb, sc) in enumerate(reps):
        want = pallas_decode.decode_literals_np(
            lb, sc.lit_total, sc.lcmap, sc.speeds, chunk)
        assert out[i, :sc.lit_total].tobytes() == want
