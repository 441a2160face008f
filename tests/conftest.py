"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on emulated host devices (see SURVEY.md section 4). These env vars must be
set before jax initializes its backends, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep matmuls deterministic-ish and full precision on CPU for parity tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")
