import os
import sys

# Tests run on CPU with an 8-device virtual mesh so multi-chip sharding
# logic is exercised without TPU hardware (the driver separately dry-runs
# the multichip path).  Must be set before jax initializes a backend.
# NOTE: this image's 'axon' TPU plugin ignores JAX_PLATFORMS, so the
# config update below is the one that actually takes effect.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
