"""JAX rANS kernels vs the golden coder: bit-exact equivalence (the analog
of the reference's cross-implementation CDF/coder equivalence tests)."""
import numpy as np
import jax.numpy as jnp

from divans_tpu.ans.coder_np import ANSEncoder, ANSDecoder, ENC_START_STATE
from divans_tpu.ans import kernels
from divans_tpu.probability import cdf16
from divans_tpu.probability.speed import MED, FAST


def _random_trace(rng, n, speed=MED):
    """Adaptive-CDF (start,freq) trace + symbols, via the golden math."""
    c = cdf16.fresh()
    starts, freqs, syms = [], [], []
    for _ in range(n):
        s = int(rng.randint(16))
        start, freq = cdf16.sym_to_start_freq(c, np.int32(s))
        starts.append(int(start))
        freqs.append(int(freq))
        syms.append(s)
        c = cdf16.blend(c, np.int32(s), np.int32(speed.inc), np.int32(speed.lim))
    return starts, freqs, syms


def test_encoder_bit_exact_vs_golden():
    rng = np.random.RandomState(42)
    lens = [1, 2, 7, 100, 1000, 3333]
    B, N = len(lens), max(lens)
    starts = np.zeros((B, N), np.int32)
    freqs = np.ones((B, N), np.int32)
    golden = []
    for i, n in enumerate(lens):
        s, f, _ = _random_trace(rng, n, FAST if i % 2 else MED)
        starts[i, :n] = s
        freqs[i, :n] = f
        enc = ANSEncoder()
        for a, b in zip(s, f):
            enc.put(a, b)
        golden.append(enc.flush())
    words, nwords, states = kernels.encode_lanes(
        jnp.asarray(starts), jnp.asarray(freqs),
        jnp.asarray(np.array(lens, np.int32)))
    got = kernels.lanes_to_bytes(words, nwords, states)
    for i in range(B):
        assert got[i] == golden[i], f"lane {i} mismatch"


def test_empty_lane():
    words, nwords, states = kernels.encode_lanes(
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1,), jnp.int32))
    assert kernels.lanes_to_bytes(words, nwords, states) == [b""]
    assert int(states[0]) == ENC_START_STATE


def test_decode_steps_roundtrip_static_cdf():
    """Decode via the batched step functions against a static skewed CDF."""
    rng = np.random.RandomState(7)
    B, n = 4, 500
    cdf = np.array([20000, 24000, 26000, 27000, 27800, 28400, 29000, 29500,
                    30000, 30400, 30800, 31200, 31600, 32000, 32400, 32767],
                   np.int32)
    all_syms, blobs = [], []
    for _ in range(B):
        syms = rng.choice(16, size=n, p=np.diff(np.concatenate([[0], cdf])) / 32767)
        enc = ANSEncoder()
        for s in syms:
            start, freq = cdf16.sym_to_start_freq(cdf, np.int32(s))
            enc.put(int(start), int(freq))
        blobs.append(enc.flush())
        all_syms.append(syms)
    W = max(len(b) for b in blobs) // 2
    states, words = [], []
    for b in blobs:
        st, w, _ = kernels.bytes_to_lane(b, W)
        states.append(st)
        words.append(w)
    ans = kernels.dec_init(jnp.asarray(np.array(states, np.int32)))
    words = jnp.asarray(np.stack(words))
    cdf_b = jnp.asarray(np.broadcast_to(cdf, (B, 16)))
    decoded = np.zeros((B, n), np.int32)
    for t in range(n):
        ans, slot = kernels.dec_peek(ans, words)
        sym, start, freq = cdf16.decode_sym_start_freq(cdf_b, slot, xp=jnp)
        ans = kernels.dec_advance(ans, start, freq)
        decoded[:, t] = np.asarray(sym)
    for i in range(B):
        np.testing.assert_array_equal(decoded[i], all_syms[i])
    # all lanes must end back at the encoder start state
    np.testing.assert_array_equal(np.asarray(ans["state"]),
                                  np.full(B, ENC_START_STATE))


def test_decode_gated_lanes():
    """Gated peek/advance: inactive lanes never consume words."""
    rng = np.random.RandomState(9)
    starts, freqs, syms = _random_trace(rng, 64)
    enc = ANSEncoder()
    for a, b in zip(starts, freqs):
        enc.put(a, b)
    blob = enc.flush()
    st, w, _ = kernels.bytes_to_lane(blob, max(1, (len(blob) - 4) // 2))
    # lane 0 live, lane 1 idle with state already < 2^15 (would pull if ungated)
    ans = kernels.dec_init(jnp.asarray(np.array([st, 3], np.int32)))
    words = jnp.asarray(np.stack([w, w]))
    c = cdf16.fresh((2,))
    out = []
    gate = jnp.asarray(np.array([True, False]))
    for t in range(64):
        ans, slot = kernels.dec_peek(ans, words, gate)
        sym, start, freq = cdf16.decode_sym_start_freq(jnp.asarray(c), slot, xp=jnp)
        ans = kernels.dec_advance(ans, start, freq, gate)
        out.append(int(sym[0]))
        c = cdf16.blend(c, np.asarray(sym) * np.array([1, 0]),
                        np.int32(MED.inc), np.int32(MED.lim))
        c = np.asarray(c)
    assert out == syms
    assert int(ans["state"][1]) == 3 and int(ans["pos"][1]) == 0
