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

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
