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
from koemorph_tpu.parallel.tp import (
    MODEL_AXIS,
    TP_RULES,
    make_mesh_2d,
    partition_spec_for,
    shard_tree,
    tree_partition_specs,
    tree_shardings,
)

__all__ = [
    "DATA_AXIS", "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "replicate", "pad_batch_to_multiple", "local_batch_size",
    "BatchedSequentialDecoder",
    "MODEL_AXIS", "TP_RULES", "make_mesh_2d", "partition_spec_for",
    "shard_tree", "tree_partition_specs", "tree_shardings",
]
