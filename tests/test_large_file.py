"""Large-file ratio gate (VERDICT r1 #5 / weak #7).

The round-1 gates stopped at 152 KB text fixtures; this drives a >=10 MB
mixed corpus (text + code + binary) through the native engine at a large
metablock size and gates the ratio against zlib-9 — the regime where the
metablock-window cost would show if metablock sizes stopped scaling.
Reference point: windows to 2^24, metablocks <= 16 MiB
(/root/reference/src/divans_compressor.rs:90-91, README.md:186).
"""
import importlib.util
import os
import zlib

import pytest

from divans_tpu import native
from divans_tpu.options import DivansOptions

_SPEC = importlib.util.spec_from_file_location(
    "large_file_study",
    os.path.join(os.path.dirname(__file__), "..", "research",
                 "large_file_study.py"))
_STUDY = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_STUDY)


@pytest.fixture(scope="module")
def corpus():
    data = _STUDY.build_corpus(12 << 20)
    assert len(data) >= 10 << 20
    return data


def test_large_file_round_trip_and_ratio(corpus):
    blob = native.compress(corpus, DivansOptions(metablock_size=4 << 20))
    assert native.decompress(blob) == corpus
    zl = zlib.compress(corpus, 9)
    # measured 0.884x zlib-9 on this corpus (research/large_file_study.py)
    assert len(blob) < 0.92 * len(zl), (len(blob), len(zl))


def test_metablock_size_monotonic_ratio(corpus):
    """Bigger metablocks must keep buying ratio (window = metablock)."""
    data = corpus[: 6 << 20]
    sizes = [len(native.compress(data, DivansOptions(metablock_size=1 << lg)))
             for lg in (18, 22)]
    assert sizes[1] < sizes[0]


def test_default_quality_beats_brotli_q9_ratio(corpus):
    """Round 3: the DEFAULT quality (q10, cost-model optimal parse) must
    beat brotli-q9 on the mixed >=10 MB corpus at metablock <= 4 MiB.
    Measured: q10 0.2234 vs brotli-q9-w24 0.2246
    (research/large_file_study.py).  Gated on a 3 MiB slice."""
    data = corpus[: 3 << 20]
    blob = native.compress(data, DivansOptions(metablock_size=4 << 20))
    assert blob is not None
    assert native.decompress(blob) == data
    spec = importlib.util.spec_from_file_location(
        "compare_corpora",
        os.path.join(os.path.dirname(__file__), "..", "research",
                     "compare_corpora.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    if cc._BROTLI is None:
        pytest.skip("libbrotlienc unavailable")
    br = cc.brotli_compress(data, 9, 24)
    assert len(blob) < len(br), (len(blob), len(br))


def test_q11_beats_brotli_q9_ratio(corpus):
    """VERDICT r2 item 5: the max-ratio configuration must beat brotli-q9
    on the mixed >=10 MB corpus at metablock <= 4 MiB.  Measured: q11
    0.2176 vs brotli-q9-w24 0.2246 (research/large_file_study.py).
    Gated on a 3 MiB slice to keep CI time bounded; brotli optional."""
    data = corpus[: 3 << 20]
    blob = native.compress(data, DivansOptions(quality=11,
                                               metablock_size=4 << 20))
    assert blob is not None
    assert native.decompress(blob) == data
    spec = importlib.util.spec_from_file_location(
        "compare_corpora",
        os.path.join(os.path.dirname(__file__), "..", "research",
                     "compare_corpora.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    if cc._BROTLI is None:
        pytest.skip("libbrotlienc unavailable")
    br = cc.brotli_compress(data, 9, 24)
    assert len(blob) < len(br), (len(blob), len(br))


def test_q11_beats_zstd19_ratio(corpus):
    """Round 5 (VERDICT r4 task 3 gate): q11 at the CLI-default 2^24
    metablock must beat zstd-19 on the >=10 MB mixed corpus.  Measured:
    q11 mb 2^24 0.1618 vs zstd-19 0.1620, brotli-q11-w24 0.1573
    (research/large_file_study.py, round-5 PERF_NOTES).  Gated on a
    4 MiB slice (one metablock) to keep CI time bounded."""
    data = corpus[: 4 << 20]
    blob = native.compress(data, DivansOptions(quality=11,
                                               metablock_size=1 << 24,
                                               window_size=24))
    assert blob is not None
    assert native.decompress(blob) == data
    spec = importlib.util.spec_from_file_location(
        "compare_corpora",
        os.path.join(os.path.dirname(__file__), "..", "research",
                     "compare_corpora.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    if cc._ZSTD is None:
        pytest.skip("libzstd unavailable")
    zs = cc.zstd_compress(data, 19)
    assert len(blob) < len(zs), (len(blob), len(zs))


def test_three_family_block_switches_roundtrip():
    """cmd/dist block switches (block_type.rs:18-195 families) emitted by
    the splitter survive a full golden round-trip."""
    from divans_tpu.ir import blocks
    from divans_tpu.ir.matcher import build_commands
    from divans_tpu.ir import commands as cmds
    from divans_tpu.codec import engine_np
    td = "/root/reference/testdata/"
    het = (open(td + "alice29", "rb").read()[:120000]
           + bytes(range(256)) * 256
           + open(td + "random_then_unicode", "rb").read()[:80000])
    opts = DivansOptions(quality=10, block_split=True,
                        metablock_size=1 << 22)
    os.environ["DIVANS_SPLIT_3FAMILY"] = "1"
    try:
        commands = build_commands(het, opts)
        kinds = {type(c) for c in commands}
        assert cmds.BlockSwitchLiteral in kinds
        # command/distance families must actually be exercised
        assert (cmds.BlockSwitchCommand in kinds
                or cmds.BlockSwitchDistance in kinds), kinds
        blob = engine_np.compress(het, opts)
    finally:
        os.environ.pop("DIVANS_SPLIT_3FAMILY", None)
    assert engine_np.decompress(blob) == het


def test_bench_suite_configs():
    """The multi-config suite (research/bench_suite.py — the reference's
    benchmark.rs:446-560 analog) must round-trip and hold its ratio
    ceilings; run small here (256 KiB) so CI stays fast."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "research",
                      "bench_suite.py"), "--size", str(256 << 10)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
