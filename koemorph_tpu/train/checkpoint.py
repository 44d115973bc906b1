"""Orbax checkpointing with the reference's best/last/epoch_N layout.

Parity target: reference ``torch.save`` dicts holding epoch, global_step,
model/optimizer/scheduler state, best_val_loss, and a config snapshot,
written as ``best_model.pth`` / ``last_model.pth`` / ``checkpoint_epoch_N.pth``
(reference src/train.py:300-328, src/train_sequential.py:297-329). Here the
same logical contents are orbax PyTree checkpoints:

    <ckpt_dir>/best/      <ckpt_dir>/last/      <ckpt_dir>/epoch_<N>/

Inference loaders rebuild the model from the embedded config (reference
scripts/rt.py:281-311) — ``load_checkpoint`` returns that config alongside
the state.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_checkpoint", "load_checkpoint",
           "load_opt_state"]


def _to_savable(tree: Any) -> Any:
    """Device arrays -> host numpy for serialization."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: Union[str, Path],
    state: Any,
    *,
    opt_state: Optional[Any] = None,
    epoch: int = 0,
    global_step: int = 0,
    best_val_loss: float = float("inf"),
    config: Optional[dict] = None,
) -> Path:
    """Write one checkpoint directory (state pytree + metadata sidecar).

    ``opt_state`` (optax state: momentum + schedule counts) is stored as a
    sibling pytree so mid-training resume is exact — the reference saves
    optimizer + scheduler state too (src/train.py:300-328); inference
    loaders keep reading only ``state`` (the params)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", _to_savable(state), force=True)
    if opt_state is not None:
        ckptr.save(path / "opt_state", _to_savable(opt_state), force=True)
    ckptr.wait_until_finished()
    meta = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "best_val_loss": float(best_val_loss),
        "config": config or {},
    }
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_checkpoint(
    path: Union[str, Path],
    target: Optional[Any] = None,
) -> tuple[Any, dict]:
    """Restore ``(state, meta)``; ``target`` supplies the pytree structure
    (pass an abstract or concrete state for exact dtype/shape restoration)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          _to_savable(target))
        state = ckptr.restore(path / "state", abstract)
    else:
        state = ckptr.restore(path / "state")
    meta_file = path / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return state, meta


def load_opt_state(path: Union[str, Path], target: Any) -> Optional[Any]:
    """Restore the optimizer-state pytree saved next to ``state``; returns
    None for params-only checkpoints (pre-round-2 layout)."""
    opt_path = Path(path).absolute() / "opt_state"
    if not opt_path.exists():
        return None
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      _to_savable(target))
    return ocp.StandardCheckpointer().restore(opt_path, abstract)


class CheckpointManager:
    """best/last/epoch_N checkpoint policy over a run directory."""

    def __init__(self, ckpt_dir: Union[str, Path],
                 keep_epoch_every: int = 10,
                 config: Optional[dict] = None):
        self.ckpt_dir = Path(ckpt_dir).absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.keep_epoch_every = keep_epoch_every
        self.config = config or {}
        self.best_val_loss = float("inf")

    def save(self, state: Any, *, epoch: int, global_step: int,
             val_loss: Optional[float] = None,
             opt_state: Optional[Any] = None) -> None:
        # update best BEFORE writing 'last' so a crash+resume restores the
        # true best_val_loss and cannot overwrite 'best' with a worse model
        improved = val_loss is not None and val_loss < self.best_val_loss
        if improved:
            self.best_val_loss = float(val_loss)
        kwargs = dict(epoch=epoch, global_step=global_step,
                      best_val_loss=self.best_val_loss, config=self.config,
                      opt_state=opt_state)
        save_checkpoint(self.ckpt_dir / "last", state, **kwargs)
        if improved:
            save_checkpoint(self.ckpt_dir / "best", state, **kwargs)
        if self.keep_epoch_every and epoch % self.keep_epoch_every == 0:
            save_checkpoint(self.ckpt_dir / f"epoch_{epoch}", state, **kwargs)

    def latest(self, target: Optional[Any] = None,
               opt_target: Optional[Any] = None) -> Optional[tuple]:
        """Returns ``(state, meta)``, or ``(state, opt_state, meta)`` when
        ``opt_target`` is given (opt_state is None for params-only dirs)."""
        last = self.ckpt_dir / "last"
        if not last.exists():
            return None
        state, meta = load_checkpoint(last, target)
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        if opt_target is not None:
            return state, load_opt_state(last, opt_target), meta
        return state, meta
