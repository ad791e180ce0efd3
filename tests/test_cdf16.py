"""CDF16 property tests — port of the reference's common CDF tests
(src/probability/common_tests.rs): range continuity, exhaustive
offset→sym inverse over the 2^15 domain, stationary convergence,
nonzero pdf — plus numpy/jax bit-exact equivalence."""
import numpy as np
import pytest

from divans_tpu.probability import cdf16
from divans_tpu.probability.speed import MUD, MED, FAST, ROCKET, GEOLOGIC, ENCODER_DEFAULT_PALETTE


def _trained_cdf(seed=0, n=1000, speed=MED):
    rng = np.random.RandomState(seed)
    pdf = rng.dirichlet(np.ones(16) * 0.3)
    c = cdf16.fresh()
    for s in rng.choice(16, size=n, p=pdf):
        c = cdf16.blend(c, np.int32(s), np.int32(speed.inc), np.int32(speed.lim))
    return c


def test_fresh_shape_and_values():
    c = cdf16.fresh()
    assert c.shape == (16,)
    assert list(c) == [4 * (i + 1) for i in range(16)]
    cb = cdf16.fresh((3, 5))
    assert cb.shape == (3, 5, 16)
    assert (cb[2, 4] == c).all()


def test_blend_monotone_and_bounded():
    for speed in [MUD, MED, FAST, ROCKET, GEOLOGIC] + list(ENCODER_DEFAULT_PALETTE):
        c = cdf16.fresh()
        rng = np.random.RandomState(42)
        for i in range(3000):
            c = cdf16.blend(c, np.int32(rng.randint(16)),
                            np.int32(speed.inc), np.int32(speed.lim))
            assert (np.diff(c) > 0).all(), (speed, i, c)
            assert c[15] <= 32767


def test_sym_to_start_freq_continuity():
    """Ranges [start-1, start-1+freq+1) tile the 15-bit domain (the ±1 hax
    shrinks each range by one on each side vs the raw cdf boundaries)."""
    c = _trained_cdf()
    prev_end = 0
    for s in range(16):
        start, freq = cdf16.sym_to_start_freq(c, np.int32(s))
        assert freq > 0
        assert start - 1 == prev_end
        prev_end = start - 1 + freq + 1
    assert prev_end == 1 << 15


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_offset_to_sym_exhaustive_inverse(seed):
    """For every offset in [0, 2^15): decoding yields a symbol whose
    range covers the rescaled offset (common_tests.rs:24-41)."""
    c = _trained_cdf(seed)
    offsets = np.arange(1 << 15, dtype=np.int32)
    cb = np.broadcast_to(c, (1 << 15, 16))
    syms = cdf16.offset_to_sym(cb, offsets)
    start, freq = cdf16.sym_to_start_freq(cb, syms)
    # encoder would emit (start, freq); decoder maps offset back to sym:
    maxv = c[15]
    rescaled = (offsets * maxv) >> 15
    bounds = np.concatenate([[0], np.asarray(c[:15])])
    # sym is the index with cdf[sym-1] <= rescaled < cdf[sym]
    assert (bounds[syms] <= rescaled).all()
    upper = np.asarray(c)[syms]
    keep = syms < 15
    assert (rescaled[keep] < upper[keep]).all()


def test_roundtrip_sym_offset_consistency():
    """Every offset inside a symbol's emitted (start, start+freq) window
    decodes back to that symbol — the encoder/decoder contract."""
    for seed in range(4):
        c = _trained_cdf(seed)
        for s in range(16):
            start, freq = cdf16.sym_to_start_freq(c, np.int32(s))
            offs = np.arange(start, start + freq, dtype=np.int32)
            cb = np.broadcast_to(c, (len(offs), 16))
            got = cdf16.offset_to_sym(cb, offs)
            assert (got == s).all(), (seed, s)


def test_stationary_convergence():
    """Training on a fixed distribution converges within 15% / 0.014
    (common_tests.rs:51-91)."""
    rng = np.random.RandomState(7)
    pdf = np.array([1, 1, 2, 4, 8, 16, 32, 64, 5, 5, 5, 5, 5, 5, 5, 5], dtype=np.float64)
    pdf /= pdf.sum()
    c = cdf16.fresh()
    for s in rng.choice(16, size=200_000, p=pdf):
        c = cdf16.blend(c, np.int32(s), np.int32(MED.inc), np.int32(MED.lim))
    emp = cdf16.pdf_all(c) / float(c[15])
    for i in range(16):
        assert abs(emp[i] - pdf[i]) < max(0.15 * pdf[i], 0.014), (i, emp[i], pdf[i])


def test_nonzero_pdf():
    c = cdf16.fresh()
    for _ in range(100_000):
        c = cdf16.blend(c, np.int32(0), np.int32(ROCKET.inc), np.int32(ROCKET.lim))
    assert (cdf16.pdf_all(c) > 0).all()


def test_average_valid_and_weighted():
    a = _trained_cdf(1)
    b = _trained_cdf(2)
    # mix_rate domain is [0, 32768]: norm_weight as-u16 caps at 1<<15
    # (weights.rs:53-62 — q <= 256, << 7 wraps i16 exactly at 32768).
    for mix in [0, 1, 1000, 16384, 32767, 32768]:
        m = cdf16.average(a, b, np.int32(mix))
        assert (np.diff(m) > 0).all(), mix
        assert m[15] <= 32767
    # full weight on a reproduces a's normalized shape closely
    m = cdf16.average(a, b, np.int32(32768))
    pa = cdf16.pdf_all(a) / float(a[15])
    pm = cdf16.pdf_all(m) / float(m[15])
    assert np.abs(pa - pm).max() < 0.01


def test_numpy_jax_bit_exact():
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    c = cdf16.fresh((64,))
    cj = jnp.asarray(c)
    for step in range(50):
        syms = rng.randint(16, size=64).astype(np.int32)
        inc, lim = MED.inc, MED.lim
        c = cdf16.blend(c, syms, np.int32(inc), np.int32(lim))
        cj = cdf16.blend(cj, jnp.asarray(syms), jnp.int32(inc), jnp.int32(lim), xp=jnp)
        assert (np.asarray(cj) == c).all(), step
        s, f = cdf16.sym_to_start_freq(c, syms)
        sj, fj = cdf16.sym_to_start_freq(cj, jnp.asarray(syms), xp=jnp)
        assert (np.asarray(sj) == s).all() and (np.asarray(fj) == f).all()
        offs = rng.randint(1 << 15, size=64).astype(np.int32)
        d = cdf16.offset_to_sym(c, offs)
        dj = cdf16.offset_to_sym(cj, jnp.asarray(offs), xp=jnp)
        assert (np.asarray(dj) == d).all()
    m = cdf16.average(c, c[::-1], np.int32(20000))
    mj = cdf16.average(cj, cj[::-1], jnp.int32(20000), xp=jnp)
    assert (np.asarray(mj) == m).all()
