"""rANS round-trip tests (analog of reference src/test_ans.rs): encode a
stream of symbols with evolving CDFs, decode, require exactness — across
sizes that exercise the renorm interval boundaries."""
import numpy as np
import pytest

from divans_tpu.ans.coder_np import ANSEncoder, ANSDecoder
from divans_tpu.probability import cdf16
from divans_tpu.probability.speed import MED, FAST, GLACIAL


def _roundtrip(symbols, speed=MED, seed_cdf=None):
    # encode: adaptive CDF evolves identically on both sides
    c = cdf16.fresh() if seed_cdf is None else seed_cdf.copy()
    enc = ANSEncoder()
    for s in symbols:
        start, freq = cdf16.sym_to_start_freq(c, np.int32(s))
        enc.put(int(start), int(freq))
        c = cdf16.blend(c, np.int32(s), np.int32(speed.inc), np.int32(speed.lim))
    data = enc.flush()

    c = cdf16.fresh() if seed_cdf is None else seed_cdf.copy()
    dec = ANSDecoder(data)
    out = []
    for _ in symbols:
        off = dec.peek_offset()
        sym, start, freq = cdf16.decode_sym_start_freq(c, np.int32(off))
        dec.advance(int(start), int(freq))
        out.append(int(sym))
        c = cdf16.blend(c, np.int32(sym), np.int32(speed.inc), np.int32(speed.lim))
    return data, out


@pytest.mark.parametrize("n", [1, 2, 3, 16, 100, 4092, 4097])
def test_small_roundtrips(n):
    rng = np.random.RandomState(n)
    syms = rng.randint(16, size=n).tolist()
    _, out = _roundtrip(syms)
    assert out == syms


def test_skewed_distribution_efficiency():
    rng = np.random.RandomState(5)
    pdf = np.array([60, 10, 5, 5, 4, 4, 3, 3, 1, 1, 1, 1, 0.5, 0.5, 0.25, 0.25])
    pdf /= pdf.sum()
    syms = rng.choice(16, size=20000, p=pdf).tolist()
    data, out = _roundtrip(syms, speed=FAST)
    assert out == syms
    shannon = -np.sum(pdf * np.log2(pdf)) * len(syms) / 8
    assert len(data) < shannon * 1.15 + 64, (len(data), shannon)


@pytest.mark.slow
def test_long_stream_roundtrip():
    """A long stream with a slow-adapting CDF (many renorm pulls)."""
    rng = np.random.RandomState(6)
    n = (1 << 16) + 1234
    syms = rng.randint(16, size=n).tolist()
    _, out = _roundtrip(syms, speed=GLACIAL)
    assert out == syms


def test_header_overhead_is_4_bytes():
    rng = np.random.RandomState(8)
    syms = rng.randint(16, size=500).tolist()
    data, out = _roundtrip(syms)
    assert out == syms
    assert len(data) >= 4  # u32 final state
    assert len(data) % 2 == 0
