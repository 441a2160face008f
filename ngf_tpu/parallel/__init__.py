"""Device mesh construction and sharding helpers."""

from .mesh import (
    data_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "maybe_initialize_distributed",
]
