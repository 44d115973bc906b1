"""Mesh / sharding helpers for multi-chip training and decoding."""

from koemorph_tpu.parallel.batched_decode import BatchedSequentialDecoder
from koemorph_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    pad_batch_to_multiple,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "replicate", "pad_batch_to_multiple", "local_batch_size",
    "BatchedSequentialDecoder",
]
