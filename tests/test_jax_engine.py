"""JAX engine vs golden engine: byte-identical bitstreams.

The strongest equivalence test: the batched device path (trace ->
model-pass scan -> wide rANS) must produce the exact container bytes the
serial golden engine produces, across option profiles."""
import os

import pytest

from divans_tpu.codec import engine_np, jax_engine
from divans_tpu.options import DivansOptions

ALICE = "/root/reference/testdata/alice29"


def _check(data, opts):
    golden = engine_np.compress(data, opts)
    fast = jax_engine.compress(data, opts)
    assert fast == golden, (len(fast), len(golden))
    assert engine_np.decompress(fast) == data


@pytest.mark.parametrize("opts", [
    DivansOptions(),                                        # cm profile, mixing
    DivansOptions(dynamic_context_mixing=0),                # cm, no mixing
    DivansOptions(use_context_map=False, dynamic_context_mixing=0),  # stride
])
def test_bitstream_identical_small(opts):
    data = b"hello world, hello jax, hello tpu! " * 40
    _check(data, opts)


def test_bitstream_identical_multiblock():
    data = (open(ALICE, "rb").read()[:24000] if os.path.exists(ALICE)
            else b"text that repeats itself nicely " * 800)
    _check(data, DivansOptions(metablock_size=8192))


def test_incompressible_and_empty():
    _check(b"", DivansOptions())
    _check(open("/dev/urandom", "rb").read(2048), DivansOptions())
