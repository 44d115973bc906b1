"""Device mesh + sharding helpers for multi-chip training and decoding.

The reference is single-process single-device (SURVEY.md section 2.5: no
DDP/TP/PP/collectives anywhere — src/train.py:75 picks one device). Here
scale-out is first-class: a 1-D data mesh over the local chips, params
replicated, batches sharded on the leading axis, gradients reduced by XLA
collectives over ICI. The model is ~8 MB so data parallelism is the
production TRAINING strategy; tensor-parallel (2-D data x model mesh,
Megatron-style param shardings) and sequence-parallel (windows of one
utterance sharded) live in :mod:`koemorph_tpu.parallel.tp` and
:meth:`~koemorph_tpu.parallel.batched_decode.BatchedSequentialDecoder.
decode_sequence_parallel` for latency-bound serving. All helpers here
accept arbitrary mesh shapes (batch shards ride the ``data`` axis name).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "replicate", "pad_batch_to_multiple",
    "pad_batch_to_size", "batch_leading_size", "local_batch_size",
]

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the local devices.

    ``num_devices=None`` uses every visible device; passing 1 gives the
    degenerate single-chip mesh so the same train step runs everywhere.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"Requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh,
                axis_name: str = DATA_AXIS) -> Any:
    """Move a host batch pytree onto the mesh, sharded on axis 0.

    Scalar / 0-d leaves are replicated. Batch leading dims must already be
    divisible by the mesh size (use :func:`pad_batch_to_multiple`).
    """
    data_spec = batch_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        sh = repl if x.ndim == 0 else data_spec
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) on every mesh device."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def batch_leading_size(batch: dict) -> int:
    """The (unique) leading dim of a batch's arrays, or 0 if none.

    Raises on heterogeneous leading dims — padding/masking a misaligned
    batch would corrupt sample alignment.
    """
    sizes = {v.shape[0] for v in batch.values()
             if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0}
    if not sizes:
        return 0
    if len(sizes) > 1:
        raise ValueError(
            f"Heterogeneous leading dims in batch: {sorted(sizes)}; "
            "padding would corrupt sample alignment")
    return sizes.pop()


def pad_batch_to_size(batch: dict, target: int) -> tuple[dict, int]:
    """Pad every array's leading dim up to exactly ``target`` rows by
    repeating the last element; returns (padded_batch, real_batch_size).

    The trainer masks padded rows out of the loss with the returned count.
    """
    b = batch_leading_size(batch)
    if b == 0 or b >= target:
        return batch, b

    def pad_one(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != b:
            return x
        reps = np.repeat(x[-1:], target - b, axis=0)
        return np.concatenate([x, reps], axis=0)

    return {k: pad_one(v) for k, v in batch.items()}, b


def pad_batch_to_multiple(batch: dict, multiple: int) -> tuple[dict, int]:
    """Pad every array's leading dim up to a multiple of ``multiple``
    (repeat-last-row, see :func:`pad_batch_to_size`)."""
    b = batch_leading_size(batch)
    return pad_batch_to_size(batch, b + (-b) % multiple)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(f"batch {global_batch} not divisible by {n} devices")
    return global_batch // n
