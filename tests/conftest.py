"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on emulated host devices (SURVEY.md section 4). The container's
sitecustomize imports jax and registers the axon TPU backend at interpreter
start, so plain env vars set here are ignored — but the backends are not
*initialized* yet, and ``jax.config.update`` still wins if applied before
the first device query. Set NGF_TPU_TESTS_ON_TPU=1 to run the suite on the
real device instead.
"""

import os

if os.environ.get("NGF_TPU_TESTS_ON_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
