"""Helpers the C API shim (c/divans_capi.c) calls through the embedded
interpreter.  Kept tiny and stable: the C side only builds dicts/bytes
and calls these two constructors."""
from __future__ import annotations

import io

from .options import DivansOptions
from .io_adapters import CompressorWriter, DecompressorReader

# C option values arrive as plain ints; coerce fields with other types.
_BOOL_FIELDS = {"use_context_map"}
_OPTIONAL_INT = {"lgblock"}


def new_writer(opt_dict):
    kwargs = {}
    for k, v in dict(opt_dict).items():
        if k in _BOOL_FIELDS:
            v = bool(v)
        kwargs[k] = v
    sink = io.BytesIO()
    return CompressorWriter(sink, DivansOptions(**kwargs)), sink


class _PushSource:
    """read()-able over a C-fed bytearray (push-style streaming)."""

    def __init__(self):
        self.buf = bytearray()

    def read(self, n: int) -> bytes:
        out = bytes(self.buf[:n])
        del self.buf[:n]
        return out


def new_reader():
    src = _PushSource()
    return src, DecompressorReader(src, partial=True)
