"""High-level one-shot API: compress()/decompress().

The implementation is selected by `engine`:
  - "golden": the exact-integer serial host engine (oracle; always available)
  - "native": the C++ serial engine (host line-speed; golden fallback)
  - "jax":    the batched metablock-parallel TPU engine
  - "auto":   jax if a device path is available, else native, else golden

All engines produce byte-identical containers (asserted in tests/)."""
from __future__ import annotations

from .options import DivansOptions


def compress(data: bytes, options: DivansOptions | None = None,
             engine: str = "auto") -> bytes:
    options = options or DivansOptions()
    if engine in ("auto", "native"):
        from . import native
        out = native.compress(data, options)
        if out is not None and engine == "native":
            return out
        if out is not None and engine == "auto":
            return out  # identical bytes to every other engine
    if engine in ("auto", "jax"):
        try:
            from .codec import jax_engine
            return jax_engine.compress(data, options)
        except (ImportError, NotImplementedError, RuntimeError):
            # RuntimeError covers an unreachable accelerator backend (the
            # axon plugin raises at init when its tunnel is down); "auto"
            # must keep working on the host engines
            if engine == "jax":
                raise
    from .codec import engine_np
    return engine_np.compress(data, options)


def decompress(data: bytes, engine: str = "auto",
               options: DivansOptions | None = None) -> bytes:
    if options is not None and options.external_probs is not None:
        # ECDF streams need the caller-supplied probabilities (host path)
        from .codec import engine_np
        return engine_np.decompress(data, options)
    if engine in ("auto", "native"):
        # native decodes in-profile metablocks at line speed and falls
        # back to the golden engine per metablock (works lib-less too)
        from . import native
        return native.decompress(data)
    if engine == "jax":
        from .codec import jax_engine
        return jax_engine.decompress(data)
    from .codec import engine_np
    return engine_np.decompress(data)
