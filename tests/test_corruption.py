"""Corruption handling: truncations and bit flips must raise typed errors
(CorruptContainer / CorruptStream), never crash, hang, or return wrong
bytes silently (reference: magic/window checks, per-command bounds, CRC
trailer; ends_with_truncated_dictionary fixture, buffer_size=1 feeding).
"""
import pytest

import divans_tpu
from divans_tpu.options import DivansOptions
from divans_tpu.codec import engine_np
from divans_tpu.container.format import CorruptContainer
from divans_tpu.codec.model import CorruptStream


def _blob(chunk=0):
    data = open("/root/reference/testdata/alice29", "rb").read()[:20000]
    return data, engine_np.compress(data, DivansOptions(chunk_nibbles=chunk))


@pytest.mark.parametrize("chunk", [0, 256])
def test_truncations_raise(chunk):
    data, blob = _blob(chunk)
    for cut in (0, 3, 4, 15, 16, 40, len(blob) // 2, len(blob) - 9,
                len(blob) - 1):
        with pytest.raises((CorruptContainer, CorruptStream)):
            engine_np.decompress(blob[:cut])


def test_bit_flips_detected():
    data, blob = _blob()
    flipped = 0
    for pos in range(20, len(blob) - 10, max(1, len(blob) // 40)):
        bad = bytearray(blob)
        bad[pos] ^= 0x40
        try:
            out = engine_np.decompress(bytes(bad))
            # a flip that decodes must still fail the CRC to count as
            # detected; reaching here silently with wrong bytes is a bug
            assert out == data, f"undetected corruption at byte {pos}"
        except (CorruptContainer, CorruptStream):
            flipped += 1
    assert flipped > 0


def test_magic_and_trailer_checks():
    data, blob = _blob()
    bad = b"\x00" + blob[1:]
    with pytest.raises(CorruptContainer):
        engine_np.decompress(bad)
    bad = blob[:-4] + b"XXXX"          # trailer suffix
    with pytest.raises(CorruptContainer):
        engine_np.decompress(bad)
    bad = blob[:-8] + b"\xff\xff\xff\xff" + blob[-4:]  # stored crc
    with pytest.raises(CorruptContainer):
        engine_np.decompress(bad)


def test_error_codes_name_the_failed_check():
    """Structured taxonomy (reference ErrMsg, interface.rs:28-64): each
    corruption class carries the ErrCode of the check that caught it."""
    from divans_tpu.errors import ErrCode
    data, blob = _blob()
    cases = [
        (b"\x00" + blob[1:], ErrCode.BAD_MAGIC),
        (blob[:4] + b"\x63" + blob[5:], ErrCode.BAD_VERSION),
        (blob[:5] + b"\x02" + blob[6:], ErrCode.BAD_WINDOW),
        (blob[:-4] + b"XXXX", ErrCode.BAD_TRAILER_MAGIC),
        (blob[:-8] + b"\xff\xff\xff\xff" + blob[-4:], ErrCode.CRC_MISMATCH),
        (blob[:17], ErrCode.TRUNCATED_VARINT),
        (blob[:40], ErrCode.TRUNCATED_FRAME),
        (blob[:len(blob) - 9], ErrCode.MISSING_EOF),
        (blob[:-5], ErrCode.TRUNCATED_TRAILER),
    ]
    for bad, want in cases:
        with pytest.raises((CorruptContainer, CorruptStream)) as ei:
            engine_np.decompress(bytes(bad))
        assert ei.value.code == want, (want, ei.value.code, ei.value)


def test_native_decoder_rejects_corrupt():
    from divans_tpu import native
    if native.load() is None:
        pytest.skip("native lib unavailable")
    data, blob = _blob()
    for pos in (20, 60, 200):
        bad = bytearray(blob)
        bad[pos] ^= 0x10
        try:
            out = native.decompress(bytes(bad))
            assert out == data, f"undetected corruption at byte {pos}"
        except (CorruptContainer, CorruptStream):
            pass


def test_api_decompress_corrupt():
    data, blob = _blob(256)
    with pytest.raises((CorruptContainer, CorruptStream)):
        divans_tpu.decompress(blob[:30])


def test_native_q11_dict_decode_bitflip_fuzz():
    """Bitflips on q11 (dict-command) streams must never crash the C++
    decoder — every trial either round-trips (don't-care bit) or raises a
    typed corruption error through the fallback chain."""
    import numpy as np
    from divans_tpu import native
    from divans_tpu.container.format import CorruptContainer
    from divans_tpu.codec.model import CorruptStream

    data = open("/root/reference/testdata/alice29", "rb").read()[:30000]
    blob = engine_np.compress(data, DivansOptions(quality=11))
    rng = np.random.default_rng(11)
    for _ in range(60):
        b = bytearray(blob)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = native.decompress(bytes(b))
        except (CorruptStream, CorruptContainer, AssertionError, ValueError):
            continue
        assert out == data  # flip landed on a don't-care bit
