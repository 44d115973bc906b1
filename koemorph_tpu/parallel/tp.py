"""Tensor-parallel sharding rules for the dual-stream model family.

The reference is single-device (SURVEY.md section 2.5); data parallelism
(`parallel/mesh.py`) is the production scale-out for training because the
model is ~8 MB. Tensor parallelism still matters for two real cases:

- **latency-bound serving**: a single streaming session (B=1) cannot use a
  second chip via the data axis; sharding the attention heads and MLP
  features over a ``model`` axis splits the per-window GEMMs instead;
- **future larger models**: the rule table below is keyed by parameter
  *path*, so growing ``d_model``/head count needs no call-site changes.

Design is GSPMD-idiomatic: pick a 2-D mesh ``(data, model)``, annotate the
*parameters* with :class:`~jax.sharding.PartitionSpec` (Megatron-style
column/row pairs — the packed QKV in-projection rows, i.e. the head axis,
are column-parallel; the attention output projection and the decoder output
row-parallel), and let XLA insert the all-reduces over ICI. No hand-written
collectives, no model changes: the same flax modules run on any mesh.

Rules match parameter paths with ``re.search``, so they apply equally to
``state.params`` and to the optimizer moments (``mu``/``nu`` mirror the
param tree, and their ``jax.tree_util`` paths embed the same names).
Dimensions not divisible by the mesh axis fall back to replication rather
than erroring — uneven shards would silently pad FLOPs instead.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from koemorph_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS", "TP_RULES", "make_mesh_2d", "partition_spec_for",
    "tree_partition_specs", "tree_shardings", "shard_tree",
]

MODEL_AXIS = "model"

# (path regex, PartitionSpec) — first match wins; no match = replicated.
# Megatron pairing for the shared decoder head: ``decoder_hidden`` is
# column-parallel (features sharded), ``decoder_out`` row-parallel
# (contraction sharded, XLA all-reduces the (B, 52, 1) result). The packed
# torch-layout QKV in-projection (3E, E) stores output rows first, so
# sharding axis 0 shards heads; ``out_proj`` contracts over the concatenated
# heads, so its kernel (E, E) input axis carries the same sharding.
TP_RULES: tuple[tuple[str, P], ...] = (
    # paths are jax.tree_util.keystr strings, e.g.
    # .params['attention']['mel_attention']['in_proj_weight'] — leaf names
    # therefore end with a bracket/quote, not at the string end
    (r"in_proj_weight\W*$", P(MODEL_AXIS, None)),
    (r"in_proj_bias\W*$", P(MODEL_AXIS)),
    (r"out_proj\W+kernel\W*$", P(MODEL_AXIS, None)),
    (r"(mel_channel_encoder|emotion_encoder)\W+kernel\W*$",
     P(None, MODEL_AXIS)),
    (r"(mel_channel_encoder|emotion_encoder)\W+bias\W*$", P(MODEL_AXIS)),
    (r"(mel_output_proj|emotion_output_proj)\W+kernel\W*$",
     P(None, MODEL_AXIS)),
    (r"(mel_output_proj|emotion_output_proj)\W+bias\W*$", P(MODEL_AXIS)),
    (r"decoder_hidden\W+kernel\W*$", P(None, MODEL_AXIS)),
    (r"decoder_hidden\W+bias\W*$", P(MODEL_AXIS)),
    (r"decoder_out\W+kernel\W*$", P(MODEL_AXIS, None)),
)


def make_mesh_2d(data: Optional[int] = None, model: int = 1,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D ``(data, model)`` mesh over the local devices.

    ``data=None`` uses every remaining device after the model axis.
    ``model=1`` degenerates to the pure data mesh (same axis names, so the
    sharding helpers work unchanged).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if model < 1 or len(devs) % model:
        raise ValueError(
            f"model axis {model} must divide device count {len(devs)}")
    if data is None:
        data = len(devs) // model
    if data * model > len(devs):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {len(devs)}")
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _divisible(shape: tuple, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % mesh.shape[axis]:
            return False
    return len(spec) <= len(shape)


def partition_spec_for(path: str, shape: tuple, mesh: Mesh,
                       rules: Sequence[tuple[str, P]] = TP_RULES) -> P:
    """PartitionSpec for one parameter path; replicated when no rule
    matches or the matched spec does not divide the shape evenly."""
    if MODEL_AXIS not in mesh.shape or mesh.shape[MODEL_AXIS] == 1:
        return P()
    for pat, spec in rules:
        if re.search(pat, path):
            return spec if _divisible(shape, spec, mesh) else P()
    return P()


def tree_partition_specs(tree: Any, mesh: Mesh,
                         rules: Sequence[tuple[str, P]] = TP_RULES) -> Any:
    """Same-structure pytree of PartitionSpecs (params, grads, or a whole
    TrainState — optimizer-moment paths embed the param names)."""

    def spec(path, leaf):
        shape = getattr(leaf, "shape", ())
        return partition_spec_for(jax.tree_util.keystr(path), tuple(shape),
                                  mesh, rules)

    return jax.tree_util.tree_map_with_path(spec, tree)


def tree_shardings(tree: Any, mesh: Mesh,
                   rules: Sequence[tuple[str, P]] = TP_RULES) -> Any:
    """Same-structure pytree of NamedShardings — usable directly as
    ``jax.jit`` ``in_shardings``/``out_shardings`` for this tree."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), tree_partition_specs(
            tree, mesh, rules))


def shard_tree(tree: Any, mesh: Mesh,
               rules: Sequence[tuple[str, P]] = TP_RULES) -> Any:
    """Place a pytree on the mesh per the rules (params / opt state)."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, tree_shardings(tree, mesh, rules))
