"""divans_tpu — a TPU-native lossless compression framework.

Provides the capabilities of dropbox/divans (brotli-style command IR +
adaptive-CDF rANS coding) re-designed TPU-first: metablock data
parallelism, two-pass wide encode, scan-based decode, jit-specialized
model profiles.  See DESIGN.md at the repo root.
"""

__version__ = "0.1.0"

from .options import DivansOptions  # noqa: F401
from .api import compress, decompress  # noqa: F401
