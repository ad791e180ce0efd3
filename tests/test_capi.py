"""C FFI build + round-trip (reference src/ffi + c/ example analog).

Builds the embedding shim with the system compiler and runs the example
binary against a test payload."""
import os
import shutil
import subprocess

import pytest

C_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "c")

pytestmark = pytest.mark.skipif(
    shutil.which("cc") is None or shutil.which("python3-config") is None,
    reason="no C toolchain")


@pytest.mark.slow
def test_capi_example_roundtrip(tmp_path):
    subprocess.run(["make", "example"], cwd=C_DIR, check=True,
                   capture_output=True)
    payload = tmp_path / "payload"
    payload.write_bytes(b"the quick brown fox, compressed via C. " * 200)
    env = dict(os.environ,
               DIVANS_TPU_PYTHONPATH=os.path.dirname(C_DIR),
               JAX_PLATFORMS="cpu")
    r = subprocess.run(["./example", str(payload)], cwd=C_DIR, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("ok "), r.stdout
