"""JAX device mesh + sharding for data-parallel ray batches.

The reference has no distributed backend (single process, `nn.DataParallel`
only — `UV-Mapping/model/model.py:283-285`); this is the TPU-native scaling
design: a 1D ``data`` mesh axis over all chips, ray batches sharded along
axis 0, parameters replicated. Under ``jit`` with these shardings XLA
partitions the batch compute per chip and inserts the gradient psum over ICI
automatically — no hand-written collectives needed for pure data
parallelism (grid features are small: 3 x 256^2 x 96 floats ~ 75 MB total,
comfortably replicated in HBM).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host (pod-slice) init: after this, ``jax.devices()`` spans every
    process's chips, so the same :func:`make_mesh`/`jit` code that runs on
    one host (the v5e-8 north star) scales to a pod slice with zero new
    code — XLA collectives ride ICI within a host and DCN across hosts.

    No-op (returns False) in the default single-process deployment. Opt in
    either with explicit arguments or via environment::

        NGF_COORDINATOR=host:port NGF_NUM_PROCESSES=N NGF_PROCESS_ID=i
        NGF_DISTRIBUTED=1   # no addresses: defer to jax.distributed's own
                            # cluster auto-detection (cloud TPU metadata)

    Must run before the first device query (jax.distributed.initialize's
    own contract). Idempotent: later calls return True without re-init.
    On CPU backends the gloo collectives implementation is selected so the
    whole path is testable without TPU hardware (tests/test_distributed.py
    runs a real two-process mesh with a cross-process reduction).
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    env = os.environ
    coordinator = coordinator or env.get("NGF_COORDINATOR") or None
    if num_processes is None and env.get("NGF_NUM_PROCESSES"):
        num_processes = int(env["NGF_NUM_PROCESSES"])
    if process_id is None and env.get("NGF_PROCESS_ID"):
        process_id = int(env["NGF_PROCESS_ID"])
    auto = env.get("NGF_DISTRIBUTED", "0") not in ("", "0")
    if coordinator is None and not auto:
        return False
    if env.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_mesh(devices=None) -> Mesh:
    """1D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (axis 0 split over 'data')."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with batch-axis sharding."""
    s = data_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_mesh_2d(n_data: int, n_sample: int, devices=None) -> Mesh:
    """2D ('data', 'sample') mesh: rays x samples-per-ray — the two scaling
    axes of this workload (SURVEY.md §5: rays x samples is the
    sequence-parallelism analog here). See
    ngf_tpu/parallel/sample_parallel.py for the 'sample'-axis renderer."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_sample, (len(devices), n_data, n_sample)
    grid = np.asarray(devices[: n_data * n_sample]).reshape(n_data, n_sample)
    return Mesh(grid, ("data", "sample"))
