"""High-level one-shot API: compress()/decompress().

The implementation is selected by `engine`:
  - "golden": the exact-integer serial host engine (oracle; always available)
  - "jax":    the batched metablock-parallel TPU engine
"""
from __future__ import annotations

from .options import DivansOptions


def compress(data: bytes, options: DivansOptions | None = None, engine: str = "auto") -> bytes:
    options = options or DivansOptions()
    if engine in ("auto", "jax"):
        try:
            from .codec import jax_engine
            return jax_engine.compress(data, options)
        except (ImportError, NotImplementedError):
            if engine == "jax":
                raise
    from .codec import engine_np
    return engine_np.compress(data, options)


def decompress(data: bytes, engine: str = "auto") -> bytes:
    if engine in ("auto", "jax"):
        try:
            from .codec import jax_engine
            return jax_engine.decompress(data)
        except (ImportError, NotImplementedError):
            if engine == "jax":
                raise
    from .codec import engine_np
    return engine_np.decompress(data)
