"""Context-map clustering (ir/cmaps.py): generation-side of the
reference's brotli-computed maps (brotli_ir_gen.rs:133-167)."""
import numpy as np

from divans_tpu.ir import cmaps
from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np
from divans_tpu import native

ALICE = open("/root/reference/testdata/alice29", "rb").read()


def test_cluster_shape_and_renumbering():
    lcm = cmaps.cluster_lcm(ALICE[:65536], max_clusters=16)
    assert len(lcm) == 64
    # <= 16 clusters, ids dense in first-appearance order
    ids = []
    for v in lcm:
        if v not in ids:
            ids.append(v)
    assert ids == list(range(len(ids)))
    assert len(ids) <= 16


def test_cluster_uniform_data_collapses():
    # all-identical bytes: one context dominates; clustering collapses
    lcm = cmaps.cluster_lcm(b"a" * 50000, max_clusters=16)
    assert max(lcm) + 1 <= 4


def test_clustered_map_roundtrip_all_engines():
    data = ALICE[:60000]
    opts = DivansOptions(quality=10, cmap_clustering=16,
                        metablock_size=1 << 16)
    blob = engine_np.compress(data, opts)
    # non-identity map actually emitted
    from divans_tpu.ir.matcher import build_commands
    pm = build_commands(data[:1 << 16], opts)[0]
    assert pm.literal_context_map != bytes(range(64))
    assert engine_np.decompress(blob) == data
    # native + device pipelines decode via their golden fallback lane
    assert native.decompress(blob) == data
    from divans_tpu.codec import jax_engine
    assert jax_engine.decompress(blob) == data


def test_clustered_map_deferred_device_pipeline():
    # deferred container with clustered maps: the native cmd pass
    # decodes the map (codec_core lcm_tab) and the frame rides the
    # DEVICE kernel path (the per-frame lcmap input covers any
    # 64-entry map); bytes equal end to end
    data = ALICE[:50000]
    opts = DivansOptions(quality=10, cmap_clustering=8,
                        metablock_size=1 << 15, chunk_nibbles=256)
    blob = engine_np.compress(data, opts)
    from divans_tpu.container import format as fmt
    from divans_tpu.codec import pallas_decode as pd
    from divans_tpu.codec.layout import ModelLayout, PROFILES
    from divans_tpu.codec.deferred import flags_to_chunk
    _w, _mb, frames, _crc, flags = fmt.deserialize(blob)
    layout = ModelLayout(PROFILES["cm"], lo_bucketed=True)
    if native.load() is not None:
        sc = native.decode_cmd_structure(frames[0].cmd, frames[0].raw_len,
                                         layout, flags_to_chunk(flags))
        assert sc is not None and sc.supported
        assert sc.lcmap != list(range(64)), "map not decoded"
    raw = pd.decompress_frames(frames, flags_to_chunk(flags), layout,
                               DivansOptions(), interpret=True)
    assert raw == data
