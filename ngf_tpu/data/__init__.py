"""Dataset layer: loaders for the reference's scene formats plus the
built-in analytic synthetic scene used by tests and benchmarks.

Mirrors `InfoInv/dataLoader/__init__.py:9-13` (the registry) and
`UV-Mapping/data/dtu.py` (the DTU dataset, in :mod:`.dtu`). All loaders
produce host-side numpy buffers; devices only ever see the sampled
batches (TPU-friendly: no torch Dataset/DataLoader machinery, sampling
is plain array indexing overlapped with device steps via
:mod:`.prefetch`).
"""

from .dataset import RayDataset
from .registry import dataset_dict, load_dataset
from .synthetic import make_synthetic_dataset

__all__ = [
    "RayDataset",
    "dataset_dict",
    "load_dataset",
    "make_synthetic_dataset",
]
