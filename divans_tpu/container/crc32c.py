"""CRC32c (Castagnoli) — the stream-integrity checksum.

The reference appends crc32c(raw) ++ b"ans~" as the 8-byte trailer
(src/codec/crc32.rs:16-116, trailer at src/codec/mod.rs:536-543).  Host
path uses an 8-way slicing table in numpy (fast enough to keep up with
the golden engine; a C++ kernel is planned for the streaming path).
"""
from __future__ import annotations

import numpy as np

_POLY = 0x82F63B78  # reversed Castagnoli


def _make_tables() -> np.ndarray:
    t = np.zeros((8, 256), dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_POLY if (c & 1) else 0)
        t[0, i] = c
    for k in range(1, 8):
        for i in range(256):
            c = t[k - 1, i]
            t[k, i] = (c >> 8) ^ t[0, c & 0xFF]
    return t


_TABLES = _make_tables()
_T = [_TABLES[k] for k in range(8)]


def crc32c(data: bytes, crc: int = 0) -> int:
    native = _native_crc()
    if native is not None:
        # bytes pass zero-copy as c_char_p (read-only in C); the old
        # from_buffer_copy staging memcpy'd the whole input and cost
        # more than the SSE4.2 crc itself on large buffers
        return native(bytes(data) if not isinstance(data, bytes)
                      else (data or b"\0"), len(data), crc) & 0xFFFFFFFF
    return _crc32c_py(data, crc)


_NATIVE_CRC = None


def _native_crc():
    """dtpu_crc32c from the native library (SSE4.2 path) if buildable."""
    global _NATIVE_CRC
    if _NATIVE_CRC is None:
        try:
            from .. import native as native_mod
            lib = native_mod.load()
            if lib is not None:
                import ctypes
                lib.dtpu_crc32c.restype = ctypes.c_uint32
                lib.dtpu_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                            ctypes.c_uint32]
                _NATIVE_CRC = lib.dtpu_crc32c
            else:
                _NATIVE_CRC = False
        except Exception:
            _NATIVE_CRC = False
    return _NATIVE_CRC or None


def _crc32c_py(data: bytes, crc: int = 0) -> int:
    crc = (~crc) & 0xFFFFFFFF
    buf = np.frombuffer(data, dtype=np.uint8)
    n8 = len(buf) // 8 * 8
    if n8:
        words = buf[:n8].reshape(-1, 8)
        for row in words:
            b = row.tolist()
            lo = crc
            crc = (_T[7][(lo ^ b[0]) & 0xFF] ^ _T[6][((lo >> 8) ^ b[1]) & 0xFF]
                   ^ _T[5][((lo >> 16) ^ b[2]) & 0xFF] ^ _T[4][((lo >> 24) ^ b[3]) & 0xFF]
                   ^ _T[3][b[4]] ^ _T[2][b[5]] ^ _T[1][b[6]] ^ _T[0][b[7]])
            crc = int(crc)
    for b in buf[n8:].tolist():
        crc = (crc >> 8) ^ int(_T[0][(crc ^ b) & 0xFF])
    return (~crc) & 0xFFFFFFFF
