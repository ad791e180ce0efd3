"""Structured error taxonomy (reference ErrMsg analog).

The reference threads a 44-variant `ErrMsg` enum through every result
(/root/reference/src/interface.rs:28-64); its C ABI still collapses to
DIVANS_FAILURE.  Here every CorruptStream / CorruptContainer carries an
`ErrCode` naming the check that raised it, asserted by
tests/test_corruption.py and surfaced through the C API extension
`divans_last_error_code()` (c/divans_capi.c) so FFI callers can
distinguish magic/window/crc/bounds failures.

Values are stable ABI: never renumber, only append.
"""
from __future__ import annotations

import enum


class ErrCode(enum.IntEnum):
    GENERIC = 1

    # ---- container layer (container/format.py, io_adapters.py)
    BAD_MAGIC = 10
    BAD_VERSION = 11
    BAD_WINDOW = 12
    TRUNCATED_VARINT = 13
    VARINT_TOO_LONG = 14
    MISSING_EOF = 15
    TRUNCATED_FRAME = 16
    TRUNCATED_TRAILER = 17
    BAD_TRAILER_MAGIC = 18
    CRC_MISMATCH = 19
    PARTIAL_FRAME = 20
    BAD_LIT_SUBS = 21
    LIT_SUB_OVERRUN = 22

    # ---- codec stream layer (codec/*, native.py)
    BAD_COMMAND = 40
    BAD_DISTANCE = 41           # copy distance beyond window
    BAD_DIST_MNEMONIC = 42
    DIST_CMAP_RANGE = 43
    DICT_SIZE = 44
    DICT_TRANSFORM = 45
    DICT_MISSING = 46
    DICT_WORD_ID = 47
    BAD_PREDICTION_MODE = 48
    BAD_MV_MODE = 49
    LENGTH_OVERRUN = 50         # decode overran declared raw_len
    LENGTH_MISMATCH = 51        # decoded length != declared raw_len
    HIGH_ENTROPY_ESCAPE = 52
    SCRIPT_FAILED = 53


class CodedError(Exception):
    """Base for exceptions carrying an ErrCode (`.code`)."""

    def __init__(self, msg: str = "", code: ErrCode = ErrCode.GENERIC):
        super().__init__(msg)
        self.code = ErrCode(code)
