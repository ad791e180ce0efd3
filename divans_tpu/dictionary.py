"""RFC 7932 static dictionary + word transforms.

The reference validates Dict commands against the brotli static dictionary
and its 121 transforms (src/codec/dict.rs:157-169, via the brotli crate's
TransformDictionaryWord; the reference links the data statically via the
brotli crate).  We vendor the identical RFC 7932 data (interop constants
defined by the RFC, not code) in data/rfc7932_dict.bin so compressed
output is machine-independent; the system libbrotlicommon is only a
fallback source, and an empty dictionary (no source at all) degrades the
capability — the matcher then never emits Dict commands — without
changing the format.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import functools
import os
import struct

# word-length → log2(number of words) (RFC 7932; matches dict.rs DICT_BITS)
DICT_BITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
             10, 10, 10, 9, 9, 8, 7, 7, 8, 7,
             7, 6, 6, 5, 5]

TRANSFORM_IDENTITY = 0
TRANSFORM_OMIT_LAST_BASE = 0        # types 1..9 omit last 1..9
TRANSFORM_UPPERCASE_FIRST = 10
TRANSFORM_UPPERCASE_ALL = 11
TRANSFORM_OMIT_FIRST_BASE = 11      # types 12..20 omit first 1..9
NUM_TRANSFORMS = 121


class _BrotliDictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


class _BrotliTransforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                ("params", ctypes.POINTER(ctypes.c_uint8)),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


VENDORED = os.path.join(os.path.dirname(__file__), "data", "rfc7932_dict.bin")


def _load_vendored(path: str) -> "StaticDictionary | None":
    """Parse data/rfc7932_dict.bin (format DVTD0001: magic, u32 data size,
    dictionary bytes, 32 u32 offsets, u16 count, then per transform
    u8-len prefix, u8 type, u8-len suffix)."""
    try:
        blob = open(path, "rb").read()
    except OSError:
        return None
    if blob[:8] != b"DVTD0001":
        return None
    n = struct.unpack_from("<I", blob, 8)[0]
    pos = 12
    data = blob[pos:pos + n]
    pos += n
    offsets = list(struct.unpack_from("<32I", blob, pos))
    pos += 128
    ntr = struct.unpack_from("<H", blob, pos)[0]
    pos += 2
    transforms = []
    for _ in range(ntr):
        plen = blob[pos]
        prefix = blob[pos + 1:pos + 1 + plen]
        pos += 1 + plen
        ttype, slen = blob[pos], blob[pos + 1]
        suffix = blob[pos + 2:pos + 2 + slen]
        pos += 2 + slen
        transforms.append((prefix, ttype, suffix))
    if len(data) != n or ntr != NUM_TRANSFORMS:
        return None
    return StaticDictionary(data, offsets, transforms)


@functools.lru_cache(maxsize=1)
def load() -> "StaticDictionary":
    vendored = _load_vendored(VENDORED)
    if vendored is not None:
        return vendored
    for name in ("libbrotlicommon.so.1", "libbrotlicommon.so",
                 ctypes.util.find_library("brotlicommon") or ""):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliGetDictionary.restype = ctypes.POINTER(_BrotliDictionary)
            d = lib.BrotliGetDictionary().contents
            data = bytes(ctypes.cast(
                d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
            offsets = list(d.offsets_by_length)
            lib.BrotliGetTransforms.restype = ctypes.POINTER(_BrotliTransforms)
            t = lib.BrotliGetTransforms().contents
            assert t.num_transforms == NUM_TRANSFORMS
            ps = bytes(t.prefix_suffix[i] for i in range(t.prefix_suffix_size))
            psm = [t.prefix_suffix_map[i] for i in range(t.num_transforms * 2)]
            triples = [(t.transforms[3 * i], t.transforms[3 * i + 1],
                        t.transforms[3 * i + 2]) for i in range(t.num_transforms)]

            def _ps_string(idx: int) -> bytes:
                off = psm[idx] if idx < len(psm) else idx
                n = ps[off]
                return ps[off + 1:off + 1 + n]

            transforms = []
            for p_idx, ttype, s_idx in triples:
                transforms.append((_ps_string(p_idx), ttype, _ps_string(s_idx)))
            return StaticDictionary(data, offsets, transforms)
        except (OSError, AttributeError, AssertionError):
            continue
    return StaticDictionary(b"", [0] * 32, [])


def _ferment(buf: bytearray, pos: int) -> int:
    """Uppercase one (possibly multi-byte) character at pos; returns its width."""
    c = buf[pos]
    if c < 192:
        if 97 <= c <= 122:
            buf[pos] = c ^ 32
        return 1
    if c < 224:
        if pos + 1 < len(buf):
            buf[pos + 1] ^= 32
        return 2
    if pos + 2 < len(buf):
        buf[pos + 2] ^= 5
    return 3


class StaticDictionary:
    def __init__(self, data: bytes, offsets_by_length: list[int],
                 transforms: list[tuple[bytes, int, bytes]]):
        self.data = data
        self.offsets_by_length = offsets_by_length
        self.transforms = transforms

    @property
    def available(self) -> bool:
        return bool(self.data)

    def raw_word(self, word_size: int, word_id: int) -> bytes:
        assert 4 <= word_size <= 24
        assert word_id < (1 << DICT_BITS[word_size])
        off = self.offsets_by_length[word_size] + word_size * word_id
        return self.data[off:off + word_size]

    def transform_word(self, word_size: int, word_id: int, transform_id: int) -> bytes:
        """TransformDictionaryWord semantics (RFC 7932 §8)."""
        prefix, ttype, suffix = self.transforms[transform_id]
        word = bytearray(self.raw_word(word_size, word_id))
        if 1 <= ttype <= 9:          # OmitLast1..9
            word = word[:max(0, len(word) - ttype)]
        elif 12 <= ttype <= 20:      # OmitFirst1..9
            word = word[min(len(word), ttype - 11):]
        elif ttype == TRANSFORM_UPPERCASE_FIRST:
            if word:
                _ferment(word, 0)
        elif ttype == TRANSFORM_UPPERCASE_ALL:
            i = 0
            while i < len(word):
                i += _ferment(word, i)
        return bytes(prefix) + bytes(word) + bytes(suffix)
