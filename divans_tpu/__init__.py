"""divans_tpu — a TPU-native lossless compression framework.

Provides the capabilities of dropbox/divans (brotli-style command IR +
adaptive-CDF rANS coding) re-designed TPU-first: metablock data
parallelism, two-pass wide encode, scan-based decode, jit-specialized
model profiles.  See DESIGN.md at the repo root.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA/Mosaic compilation cache: cold-process decode/encode
# otherwise pays a 20-500 s compile per kernel shape (PERF_NOTES.md).
# Opt out with DIVANS_JAX_CACHE=0 or override via JAX_COMPILATION_CACHE_DIR.
if _os.environ.get("DIVANS_JAX_CACHE", "1") != "0" \
        and "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache_dir = _os.path.join(
        _os.path.expanduser("~"), ".cache", "divans_tpu_jax")
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import sys as _sys
    if "jax" in _sys.modules:  # env is read at jax import; patch live too
        try:
            _sys.modules["jax"].config.update(
                "jax_compilation_cache_dir", _cache_dir)
            _sys.modules["jax"].config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

from .options import DivansOptions  # noqa: F401
from .api import compress, decompress  # noqa: F401
