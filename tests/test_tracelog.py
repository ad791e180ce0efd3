"""Stage tracing (tracelog.py) — the reference threadlog analog
(/root/reference/src/multithreading.rs:26-111), re-aimed at device
stages; and its CLI surface (-timing)."""
import numpy as np

from divans_tpu import tracelog
from divans_tpu.options import DivansOptions


def test_disabled_records_nothing():
    tracelog.enable(False)
    tracelog.clear()
    with tracelog.span("x"):
        pass
    assert tracelog.events() == []


def test_compress_records_stages():
    from divans_tpu.codec import jax_engine
    tracelog.clear()
    tracelog.enable()
    try:
        data = bytes(np.random.default_rng(7).integers(65, 91, 20000,
                                                       dtype=np.uint8))
        blob = jax_engine.compress(data, DivansOptions(chunk_nibbles=256))
        assert jax_engine.decompress(blob) == data
    finally:
        tracelog.enable(False)
    names = {e.name for e in tracelog.events()}
    assert "encode/trace_build" in names
    assert "encode/model_pass" in names
    assert "encode/ans_lanes" in names
    assert "decode/serial_frames" in names
    report = tracelog.report()
    assert "encode/model_pass" in report and "TOTAL" in report


def test_cli_timing_flag(tmp_path, capsys):
    from divans_tpu import cli
    tracelog.clear()
    src = tmp_path / "in"
    src.write_bytes(b"the quick brown fox " * 500)
    out = tmp_path / "out"
    rc = cli.main(["-c", "-timing", str(src), str(out)])
    assert rc == 0
    assert "TOTAL" in capsys.readouterr().err
    tracelog.enable(False)
