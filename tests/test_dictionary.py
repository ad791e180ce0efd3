"""Vendored RFC 7932 dictionary: machine-independence (VERDICT r1 #9).

The dictionary ships in divans_tpu/data/rfc7932_dict.bin so q11 output
does not depend on a system libbrotli being installed.
"""
import ctypes

import pytest

from divans_tpu import dictionary


def test_vendored_present_and_complete():
    d = dictionary._load_vendored(dictionary.VENDORED)
    assert d is not None and d.available
    assert len(d.data) == 122784          # RFC 7932 appendix A size
    assert len(d.transforms) == dictionary.NUM_TRANSFORMS
    # identity transform of a known word
    assert d.transform_word(6, 100, 0) == d.raw_word(6, 100)


def test_load_prefers_vendored_without_libbrotli(monkeypatch):
    """load() must work with no brotli library present at all."""
    dictionary.load.cache_clear()

    def no_cdll(_name):
        raise OSError("no shared libraries in this test")

    monkeypatch.setattr(ctypes, "CDLL", no_cdll)
    try:
        d = dictionary.load()
        assert d.available
        assert len(d.data) == 122784
    finally:
        dictionary.load.cache_clear()


def test_vendored_matches_system_lib_if_available():
    vend = dictionary._load_vendored(dictionary.VENDORED)
    lib = None
    for name in ("libbrotlicommon.so.1", "libbrotlicommon.so"):
        try:
            ctypes.CDLL(name)
        except OSError:
            continue
        # re-run the ctypes loader directly by temporarily hiding the file
        import unittest.mock as mock
        with mock.patch.object(dictionary, "VENDORED", "/nonexistent"):
            dictionary.load.cache_clear()
            lib = dictionary.load()
            dictionary.load.cache_clear()
        break
    if lib is None or not lib.available:
        pytest.skip("no system libbrotli to compare against")
    assert lib.data == vend.data
    assert lib.offsets_by_length == vend.offsets_by_length
    assert lib.transforms == vend.transforms
