"""Trainers: legacy frame model, dual-stream, and sequential dual-stream.

Parity targets: ``KoeMorphTrainer`` (reference src/train.py:32),
``DualStreamTrainer`` (src/train_dual_stream.py:32) and
``SequentialTrainer`` (src/train_sequential.py:34). The reference's
dual-stream/sequential trainers are broken as written (wrong batch keys,
missing loss imports, shape-mismatched criterion — SURVEY.md section 2.6);
this module fix-forwards that wiring:

- batch keys match what the data pipeline actually emits
  (``audio``/``arkit`` map-style, ``audio``/``blendshapes`` sequential);
- the sequential criterion compares the model's T_out output frames against
  the *output-aligned* target frames (window end + stride), instead of the
  reference's (B, T_out, 52) vs (B, W, 52) mismatch.

TPU-first structure: one jitted train step (value_and_grad + optax update)
over a data mesh — batches sharded on axis 0, params replicated, gradient
psum inserted by XLA. The epoch loop is host-side Python that only feeds
batches and logs scalars; there is no per-step device->host sync except the
logged metrics (fetched every ``log_every_n_steps``).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from koemorph_tpu.models.losses import (
    KoeMorphLossConfig,
    dual_stream_loss,
    koemorph_loss,
    sequence_koemorph_loss,
)
from koemorph_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
)
from koemorph_tpu.train.checkpoint import CheckpointManager
from koemorph_tpu.train.optim import create_lr_schedule, create_optimizer

logger = logging.getLogger(__name__)

__all__ = [
    "TrainState", "create_train_state", "Trainer",
    "KoeMorphTrainer", "DualStreamTrainer", "SequentialTrainer",
    "loss_config_from", "sequence_targets",
]


class TrainState(train_state.TrainState):
    """Flax TrainState; dropout rng folds in the step counter."""

    dropout_rng: jax.Array = None

    def step_rng(self) -> jax.Array:
        return jax.random.fold_in(self.dropout_rng, self.step)


def create_train_state(model, rng: jax.Array, example_inputs: tuple,
                       tx: optax.GradientTransformation,
                       init_kwargs: Optional[dict] = None) -> TrainState:
    params_rng, dropout_rng = jax.random.split(rng)
    # jit the init: eager init dispatches the whole frontend op-by-op, which
    # is pathological through the TPU tunnel (minutes vs seconds)
    init_fn = jax.jit(
        lambda r, *a: model.init(r, *a, **(init_kwargs or {})))
    variables = init_fn(params_rng, *example_inputs)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        dropout_rng=dropout_rng)


def loss_config_from(cfg: dict) -> KoeMorphLossConfig:
    loss_cfg = cfg.get("loss", {}) if cfg else {}
    fields = {f.name for f in dataclasses.fields(KoeMorphLossConfig)}
    return KoeMorphLossConfig(
        **{k: float(v) for k, v in loss_cfg.items() if k in fields})


def sequence_targets(blendshapes: jnp.ndarray, window_frames: int,
                     stride_frames: int, n_out: int) -> jnp.ndarray:
    """Target frames aligned with the sequential model's output frames:
    output i corresponds to input frame ``window_frames - 1 + i*stride``."""
    idx = window_frames - 1 + np.arange(n_out) * stride_frames
    idx = np.clip(idx, 0, blendshapes.shape[1] - 1)
    return blendshapes[:, idx, :]


class Trainer:
    """Shared epoch/validation/checkpoint/early-stopping machinery.

    Subclasses define :meth:`loss_fn` (params, batch, rng) -> (loss, metrics)
    and :meth:`init_inputs` (example model inputs for parameter init).
    """

    def __init__(
        self,
        model,
        config: dict,
        *,
        work_dir: str | Path = "outputs/run",
        mesh=None,
        steps_per_epoch: int = 100,
        seed: int = 42,
        tensor_parallel: bool = False,
    ):
        self.model = model
        self.config = config or {}
        self.train_cfg = self.config.get("training", self.config)
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.steps_per_epoch = steps_per_epoch

        schedule = create_lr_schedule(self.train_cfg, steps_per_epoch)
        self._schedule = schedule
        tx = create_optimizer(self.train_cfg, steps_per_epoch,
                              schedule=schedule)
        rng = jax.random.PRNGKey(int(self.train_cfg.get("seed", seed)))
        self.state = create_train_state(model, rng, self.init_inputs(), tx)
        if tensor_parallel:
            # 2-D (data, model) mesh: params/opt-moments sharded per the
            # Megatron-style rule table (parallel/tp.py), batch still on
            # the data axis; XLA inserts the head/feature all-reduces.
            from koemorph_tpu.parallel.tp import (
                MODEL_AXIS, tree_shardings)
            if MODEL_AXIS not in self.mesh.shape:
                raise ValueError(
                    "tensor_parallel=True needs a mesh with a "
                    f"'{MODEL_AXIS}' axis (parallel.tp.make_mesh_2d)")
            self._state_shardings = tree_shardings(self.state, self.mesh)
            self.state = jax.tree_util.tree_map(
                jax.device_put, self.state, self._state_shardings)
        else:
            self.state = self.state.replace(
                params=replicate(self.state.params, self.mesh),
                opt_state=replicate(self.state.opt_state, self.mesh))
            self._state_shardings = None

        self.checkpoints = CheckpointManager(
            self.work_dir / "checkpoints",
            keep_epoch_every=int(
                self.train_cfg.get("checkpoint", {}).get(
                    "keep_epoch_every", 10)),
            config=_plain(self.config))
        self.writer = self._make_writer()
        # lazily-jitted attention-viz forward; False = model has no
        # return_attention path (checked once, then skipped)
        self._attn_image_fn = None
        self.epoch = 0
        self.global_step = 0
        # pin the output state to the input state's sharding (replicated in
        # DP, the TP rule tree otherwise): otherwise step 1's output
        # (default sharding) differs from the init state's NamedSharding
        # and step 2 triggers a full recompile
        from koemorph_tpu.parallel.mesh import replicated_sharding
        self._state_out = (self._state_shardings if tensor_parallel
                           else replicated_sharding(self.mesh))
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=0,
            out_shardings=(self._state_out, None))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._epoch_scan = None     # lazily-jitted lax.scan epoch runner
        self._epochs_scan_runners: dict = {}   # n_steps -> jitted runner

    # -- subclass surface --------------------------------------------------

    def init_inputs(self) -> tuple:
        raise NotImplementedError

    def loss_fn(self, params, batch, rng):
        raise NotImplementedError

    # -- steps ---------------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch):
        rng = state.step_rng()

        def compute(params):
            return self.loss_fn(params, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch):
        loss, metrics = self.loss_fn(state.params, batch, None)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    # -- loops ---------------------------------------------------------------

    def _prepare(self, batch: dict):
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        batch, real = pad_batch_to_multiple(batch, self.mesh.devices.size)
        b = next(v.shape[0] for v in batch.values()
                 if getattr(v, "ndim", 0) > 0)
        mask = np.zeros((b,), np.float32)
        mask[:real] = 1.0
        batch["sample_mask"] = mask
        return shard_batch(batch, self.mesh)

    def train_epoch(self, loader: Iterable[dict]) -> dict[str, float]:
        log_every = int(self.train_cfg.get("logging", {})
                        .get("log_every_n_steps", 50))
        collected: list[dict] = []   # device arrays; no host sync per step
        t0 = time.time()
        image_every = int(self.train_cfg.get("logging", {})
                          .get("log_images_every_n_steps", 100))
        for batch in loader:
            prepared = self._prepare(batch)
            self.state, metrics = self._train_step(self.state, prepared)
            self.global_step += 1
            collected.append(metrics)
            self._on_step_metrics(batch, metrics)
            if self.global_step % log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["lr"] = float(self._schedule(self.global_step))
                self._log_scalars("train", host, self.global_step)
            if image_every and self.global_step % image_every == 0:
                self._log_attention_images(prepared)
        self._on_epoch_end()
        if not collected:
            return {}
        logger.info("epoch %d: %d steps in %.1fs", self.epoch,
                    len(collected), time.time() - t0)
        return {k: float(np.mean([np.asarray(m[k]) for m in collected]))
                for k in collected[0]}

    def _stack_epoch(self, loader: Iterable[dict]) -> tuple[dict, int]:
        """Stack an epoch's batches into one (S, B, ...) pytree on device.

        Scan needs every step's batch identically shaped: each batch is
        padded (repeat-last-row) to the epoch's max size rounded up to the
        device count — partial file-boundary batches are masked out of the
        loss by ``sample_mask``, the same mechanism as
        ``pad_batch_to_multiple`` in the step loop. Arrays are placed with
        the batch axis (axis 1) sharded over the data mesh.
        """
        from jax.sharding import NamedSharding, PartitionSpec
        from koemorph_tpu.parallel.mesh import (
            DATA_AXIS, batch_leading_size, pad_batch_to_size,
            replicated_sharding)

        raw = [{k: np.asarray(v) for k, v in b.items()
                if not isinstance(v, list)} for b in loader]
        if not raw:
            return {}, 0
        # same contract as pad_batch_to_multiple in the step loop: the
        # homogeneity check + repeat-last-row padding are the shared mesh
        # helpers, so the two paths cannot drift apart
        n_dev = self.mesh.devices.size
        sizes = [batch_leading_size(b) for b in raw]
        target = -(-max(sizes) // n_dev) * n_dev
        prepared: list[dict] = []
        for b in raw:
            padded, real = pad_batch_to_size(b, target)
            mask = np.zeros((target,), np.float32)
            mask[:real] = 1.0
            padded = dict(padded)
            padded["sample_mask"] = mask
            prepared.append(padded)
        stacked = {k: np.stack([np.asarray(p[k]) for p in prepared])
                   for k in prepared[0]}
        shard = NamedSharding(self.mesh, PartitionSpec(None, DATA_AXIS))
        repl = replicated_sharding(self.mesh)
        stacked = {
            k: jax.device_put(v, shard if v.ndim >= 2 else repl)
            for k, v in stacked.items()
        }
        return stacked, len(prepared)

    def train_epoch_scan(self, loader: Iterable[dict]) -> dict[str, float]:
        """One epoch as a single device-resident ``lax.scan`` over steps.

        ``train_epoch`` pays a dispatch + host->device transfer round trip
        per step; through the tunneled single-chip setup that overhead is
        ~1000x the sub-ms device step (scripts/profile_training.py measured
        0.88 ms device vs ~1.2 s wall per step). Here the epoch's batches
        are stacked host-side, uploaded in one transfer, and every
        ``value_and_grad`` + optax update runs inside ONE jitted scan; the
        per-step metrics come back as (S,) stacks in a single fetch and are
        replayed into TensorBoard with the same tags/step numbers.

        Identical math to ``train_epoch`` (same ``_train_step_impl``, same
        per-step dropout-rng fold on ``state.step``) — pinned by
        ``test_scan_epoch_matches_step_loop``. Constraints: every batch in
        the epoch must have identical shapes (uniform loader / drop_last),
        and the per-step host hooks (``_on_step_metrics`` sequence stats,
        attention-image logging) do not run — use ``train_epoch`` when
        those matter more than wall clock.
        """
        stacked, n_steps = self._stack_epoch(loader)
        if not n_steps:
            return {}

        if self._epoch_scan is None:
            def epoch_impl(state, batches):
                return jax.lax.scan(self._train_step_impl, state, batches)

            self._epoch_scan = jax.jit(
                epoch_impl, donate_argnums=0,
                out_shardings=(self._state_out, None))

        t0 = time.time()
        self.state, metrics = self._epoch_scan(self.state, stacked)
        host = {k: np.asarray(v) for k, v in metrics.items()}
        self._replay_scan_metrics(host, n_steps)
        self.global_step += n_steps
        logger.info("epoch %d (scan): %d steps in %.1fs", self.epoch,
                    n_steps, time.time() - t0)
        return {k: float(v.mean()) for k, v in host.items()}

    def train_epochs_scan(self, loader: Iterable[dict], n_epochs: int,
                          shuffle_seed: int = 0) -> list[dict[str, float]]:
        """Dataset-resident training: N epochs inside ONE jitted program.

        Uploads the epoch's batches once and runs ``n_epochs`` full epochs
        on device — each epoch is a ``lax.scan`` over a fresh on-device
        ``jax.random.permutation`` of the step order, nested in a scan
        over epochs. Eliminates the per-epoch host work that dominates
        even ``train_epoch_scan`` (re-upload, per-epoch metric fetch,
        checkpoint round trips): the rehearsal's 2000-step run is ~10 s
        of device time in one dispatch vs ~28 min through the per-epoch
        path on the tunneled chip.

        Use when the epoch's WINDOW SET is epoch-invariant (fixed stride).
        The on-device shuffle permutes STEP ORDER; batch membership is
        fixed at upload (vs the host loader, which can also re-form
        batches each epoch) — the standard fixed-batch trade-off.
        Progressive/mixed stride schedules change the window set per
        epoch: keep ``fit(use_scan=True)`` for those. Caller handles
        checkpointing (one save at the end, or chunk calls every K
        epochs).

        Returns per-epoch mean metrics (one dict per epoch, host floats);
        TensorBoard scalars are replayed at the configured cadence.
        """
        stacked, n_steps = self._stack_epoch(loader)
        if not n_steps or n_epochs <= 0:
            return []

        runner = self._epochs_scan_runners.get(n_steps)
        if runner is None:
            def run(state, batches, epoch_keys):
                def epoch_body(st, key):
                    perm = jax.random.permutation(key, n_steps)

                    def step(carry, i):
                        batch_i = jax.tree_util.tree_map(
                            lambda v: v[i], batches)
                        return self._train_step_impl(carry, batch_i)

                    return jax.lax.scan(step, st, perm)

                return jax.lax.scan(epoch_body, state, epoch_keys)

            runner = jax.jit(
                run, donate_argnums=0,
                out_shardings=(self._state_out, None))
            self._epochs_scan_runners[n_steps] = runner
        keys = jax.random.split(
            jax.random.PRNGKey(shuffle_seed), n_epochs)
        t0 = time.time()
        self.state, metrics = runner(self.state, stacked, keys)
        host = {k: np.asarray(v).reshape(n_epochs * n_steps)
                for k, v in metrics.items()}
        self._replay_scan_metrics(host, n_epochs * n_steps)
        self.global_step += n_epochs * n_steps
        self.epoch += n_epochs
        logger.info("%d epochs x %d steps (dataset-resident scan) in "
                    "%.1fs", n_epochs, n_steps, time.time() - t0)
        return [{k: float(v[e * n_steps:(e + 1) * n_steps].mean())
                 for k, v in host.items()} for e in range(n_epochs)]

    def _replay_scan_metrics(self, host: dict, n_steps: int) -> None:
        """Replay (S,)-stacked per-step metrics from a scan epoch into
        TensorBoard with the same tags/step numbers the step loop uses."""
        log_every = int(self.train_cfg.get("logging", {})
                        .get("log_every_n_steps", 50))
        for i in range(n_steps):
            step = self.global_step + i + 1
            if step % log_every == 0:
                scalars = {k: float(v[i]) for k, v in host.items()}
                scalars["lr"] = float(self._schedule(step))
                self._log_scalars("train", scalars, step)

    def validate(self, loader: Iterable[dict]) -> dict[str, float]:
        sums: dict[str, float] = {}
        count = 0
        for batch in loader:
            metrics = self._eval_step(self.state, self._prepare(batch))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        out = {k: v / max(1, count) for k, v in sums.items()}
        self._log_scalars("val", out, self.global_step)
        return out

    def resume(self) -> bool:
        """Restore params + optimizer state + bookkeeping from the run's
        last checkpoint (reference resume_from/checkpoint_path semantics,
        src/train_sequential.py:487-489; optimizer/scheduler state saved
        like src/train.py:300-328). For params-only checkpoints from older
        runs, the fresh optimizer's schedule counts are fast-forwarded to
        ``global_step`` so the applied LR still equals
        ``schedule(global_step)`` (momentum alone restarts)."""
        restored = self.checkpoints.latest(target=self.state.params,
                                           opt_target=self.state.opt_state)
        if restored is None:
            return False
        params, opt_state, meta = restored
        self.epoch = int(meta.get("epoch", -1)) + 1
        self.global_step = int(meta.get("global_step", 0))
        if opt_state is None:
            opt_state = _fast_forward_counts(self.state.opt_state,
                                             self.global_step)
        self.state = self.state.replace(
            params=replicate(params, self.mesh),
            opt_state=replicate(opt_state, self.mesh),
            step=self.global_step)
        logger.info("resumed from epoch %d (step %d)", self.epoch,
                    self.global_step)
        return True

    def fit(self, train_loader_fn: Callable[[], Iterable[dict]],
            val_loader_fn: Optional[Callable[[], Iterable[dict]]] = None,
            max_epochs: Optional[int] = None,
            use_scan: bool = False) -> dict:
        """Epoch loop. ``use_scan=True`` runs each epoch device-resident
        via :meth:`train_epoch_scan` (same math, ~no per-step host
        overhead; per-step hooks don't run — see its docstring)."""
        max_epochs = max_epochs or int(self.train_cfg.get("max_epochs", 1))
        check_every = int(self.train_cfg.get("check_val_every_n_epoch", 1))
        # checkpoint cadence: every save fetches params (+opt state) to the
        # host — ~25 MB through the TPU tunnel for the flagship model — so
        # short-epoch runs can thin it out; the final epoch always saves
        ckpt_every = int(self.train_cfg.get("checkpoint", {})
                         .get("every_n_epochs", 1))
        es_cfg = self.train_cfg.get("early_stopping", {})
        patience = int(es_cfg.get("patience", 0) or 0)
        best, since_best = float("inf"), 0
        history = {"train": [], "val": []}

        import inspect
        takes_epoch = len(inspect.signature(
            train_loader_fn).parameters) >= 1

        for self.epoch in range(self.epoch, max_epochs):
            # reshuffle per epoch: loader factories accepting an epoch arg
            # get it (Prefetcher.set_epoch / dataset.set_epoch hooks)
            loader = (train_loader_fn(self.epoch) if takes_epoch
                      else train_loader_fn())
            train_metrics = (self.train_epoch_scan(loader) if use_scan
                             else self.train_epoch(loader))
            history["train"].append(train_metrics)
            val_loss = None
            if val_loader_fn is not None and \
                    (self.epoch + 1) % check_every == 0:
                val_metrics = self.validate(val_loader_fn())
                history["val"].append(val_metrics)
                val_loss = val_metrics.get("loss")
            improved = val_loss is not None and val_loss < best
            # a val improvement always saves (the reference writes
            # best_model.pth on every improvement, src/train.py:300-328) —
            # otherwise every_n_epochs > 1 lets a later, worse epoch claim
            # the 'best' slot because the manager never saw the real best
            saved = ((self.epoch + 1) % max(1, ckpt_every) == 0
                     or self.epoch + 1 == max_epochs or improved)
            if saved:
                self.checkpoints.save(
                    self.state.params, epoch=self.epoch,
                    global_step=self.global_step, val_loss=val_loss,
                    opt_state=self.state.opt_state)
            if val_loss is not None:
                if improved:
                    best, since_best = val_loss, 0
                else:
                    since_best += 1
                    if patience and since_best >= patience:
                        logger.info("Early stopping at epoch %d", self.epoch)
                        if not saved:   # keep `last` current on early exit
                            self.checkpoints.save(
                                self.state.params, epoch=self.epoch,
                                global_step=self.global_step,
                                val_loss=val_loss,
                                opt_state=self.state.opt_state)
                        break
        return history

    # -- logging ---------------------------------------------------------------

    def _make_writer(self):
        if not self.train_cfg.get("logging", {}).get("tensorboard", True):
            return None
        try:
            from tensorboardX import SummaryWriter
            return SummaryWriter(str(self.work_dir / "tb"))
        except Exception:  # pragma: no cover - optional dep
            return None

    def _log_scalars(self, prefix: str, scalars: dict, step: int) -> None:
        if self.writer is None:
            return
        for k, v in scalars.items():
            if np.isscalar(v) or getattr(v, "ndim", 1) == 0:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)

    def _on_step_metrics(self, batch: dict, metrics: dict) -> None:
        """Per-step hook for subclass bookkeeping (sequence stats)."""

    def _on_epoch_end(self) -> None:
        """End-of-epoch hook (sequence-stat flush)."""

    def _log_attention_images(self, batch: dict) -> None:
        """Attention-weight heatmaps to TensorBoard
        (reference train_sequential.py:355-371: attention/mel and
        attention/emotion images every 100 steps)."""
        if self.writer is None or self._attn_image_fn is False:
            return
        if self._attn_image_fn is None:
            # jitted + cached: an eager forward would dispatch the whole
            # window decode op-by-op through the TPU tunnel. Probe the
            # kwarg by signature-free trace once; a TypeError here means
            # the model has no return_attention path — disable permanently
            # (False sentinel) so the failed trace is paid exactly once.
            fn = jax.jit(
                lambda p, a: self.state.apply_fn(
                    {"params": p}, a, return_attention=True,
                    deterministic=True))
            try:
                fn.lower(self.state.params, batch["audio"][:1])
            except TypeError as e:
                logger.info(
                    "attention images disabled: model has no "
                    "return_attention path (%s)", e)
                self._attn_image_fn = False
                return
            except Exception as e:  # pragma: no cover - defensive
                logger.debug("attention image logging skipped: %s", e)
                return
            self._attn_image_fn = fn
        try:
            out = self._attn_image_fn(self.state.params,
                                      batch["audio"][:1])
        except Exception as e:
            # transient call failure (e.g. a malformed batch element):
            # KEEP the compiled fn — rebuilding would re-pay the whole
            # window-decode trace every image interval — and retry on the
            # next interval rather than silently losing heatmaps
            logger.warning("attention image logging failed, will "
                           "retry next interval: %s", e)
            return
        if isinstance(out, tuple):
            out = out[0]
        for name, key in (("mel", "mel_attention_weights"),
                          ("emotion", "emotion_attention_weights")):
            w = out.get(key)
            if w is None:
                continue
            img = np.asarray(w[0], np.float32)
            while img.ndim > 2:      # sequential models: (n, Q, K) etc.
                img = img[-1]
            peak = float(img.max())
            if peak > 0:
                img = img / peak
            self.writer.add_image(f"attention/{name}", img,
                                  self.global_step, dataformats="HW")


def _mask_padded(pred: jnp.ndarray, target: jnp.ndarray,
                 batch: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Neutralize padding rows added by pad_batch_to_multiple: a padded
    row's prediction is replaced by its (detached) target, so its error
    terms and gradients are exactly zero; the returned scale corrects the
    mean-denominator so real rows keep full weight. Value-based
    regularizers (sparsity/smoothness/landmark) see the detached target
    values on padded rows — no gradient, small constant bias in the logged
    metric only."""
    mask = batch.get("sample_mask")
    if mask is None:
        return pred, jnp.float32(1.0)
    shape = (pred.shape[0],) + (1,) * (pred.ndim - 1)
    m = mask.reshape(shape)
    pred = m * pred + (1 - m) * jax.lax.stop_gradient(target)
    scale = pred.shape[0] / jnp.maximum(jnp.sum(mask), 1.0)
    return pred, scale


def _stream_weight_metrics(mel_w, emo_w) -> dict:
    """Stream-specialization scalars for TensorBoard (the reference logs
    attention/stream-weight diagnostics every N steps,
    train_dual_stream.py attention-weight logging)."""
    if mel_w is None or emo_w is None:
        return {}
    from koemorph_tpu.blendshapes import EXPRESSION_INDICES, MOUTH_INDICES

    mouth = np.asarray(MOUTH_INDICES)
    expr = np.asarray(EXPRESSION_INDICES)
    sm_mel = jax.nn.softmax(mel_w)
    sm_emo = jax.nn.softmax(emo_w)
    return {
        "stream/mel_on_mouth": jnp.sum(sm_mel[mouth]),
        "stream/emotion_on_expression": jnp.sum(sm_emo[expr]),
    }


def _fast_forward_counts(opt_state: Any, step: int) -> Any:
    """Set every ``count`` field in an optax state tree to ``step`` so
    embedded schedules (ScaleByScheduleState / ScaleByAdamState counts)
    resume mid-curve instead of replaying warmup from zero."""
    def rewrite(node):
        if hasattr(node, "_fields"):
            repl = {}
            for f in node._fields:
                v = rewrite(getattr(node, f))
                if f == "count":
                    v = jnp.asarray(step, dtype=jnp.asarray(v).dtype)
                repl[f] = v
            return type(node)(**repl)
        if isinstance(node, tuple):
            return tuple(rewrite(x) for x in node)
        if isinstance(node, list):
            return [rewrite(x) for x in node]
        if isinstance(node, dict):
            return {k: rewrite(v) for k, v in node.items()}
        return node

    return rewrite(opt_state)


def _plain(cfg: Any) -> Any:
    if isinstance(cfg, dict):
        return {k: _plain(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [_plain(v) for v in cfg]
    return cfg


class KoeMorphTrainer(Trainer):
    """Legacy trainer: first-frame target reduction ``arkit[:, 0, :]``
    (reference src/train.py:181-182) against the simplified frame model."""

    def __init__(self, model, config: dict, *, audio_samples: int = 16000,
                 **kw):
        self.audio_samples = audio_samples
        self.loss_config = loss_config_from(
            (config or {}).get("training", config or {}))
        super().__init__(model, config, **kw)

    def init_inputs(self) -> tuple:
        return (jnp.zeros((1, self.audio_samples), jnp.float32),)

    def loss_fn(self, params, batch, rng):
        rngs = {"dropout": rng} if rng is not None else None
        pred = self.state.apply_fn(
            {"params": params}, batch["audio"],
            deterministic=rng is None, rngs=rngs)
        target = batch["arkit"][:, 0, :]
        pred, scale = _mask_padded(pred, target, batch)
        loss, metrics = koemorph_loss(pred, target, config=self.loss_config)
        return loss * scale, metrics


class DualStreamTrainer(Trainer):
    """Single-window dual-stream trainer with the stream-separation
    regularizer (reference src/train_dual_stream.py:434-516, fixed wiring)."""

    def __init__(self, model, config: dict, *, audio_samples: Optional[int]
                 = None, **kw):
        cfg = config or {}
        tcfg = cfg.get("training", cfg).get("loss", {})
        self.l1_weight = float(tcfg.get("l1_weight", 1.0))
        self.l2_weight = float(tcfg.get("l2_weight",
                                        tcfg.get("mse_weight", 0.5)))
        self.separation_weight = float(
            tcfg.get("stream_separation_weight", 0.01))
        self.audio_samples = audio_samples or (
            model.mel_sequence_length * int(
                model.sample_rate / model.target_fps))
        super().__init__(model, config, **kw)

    def init_inputs(self) -> tuple:
        return (jnp.zeros((1, self.audio_samples), jnp.float32),)

    def loss_fn(self, params, batch, rng):
        rngs = {"dropout": rng} if rng is not None else None
        pred = self.state.apply_fn(
            {"params": params}, batch["audio"],
            deterministic=rng is None, rngs=rngs)["blendshapes"]
        target = batch["blendshapes"]
        if target.ndim == 3:  # (B, W, 52) window -> last frame is aligned
            target = target[:, -1, :]
        pred, scale = _mask_padded(pred, target, batch)
        attn = params.get("dual_stream_attention", {})
        mel_w = attn.get("mel_weights")
        emo_w = attn.get("emotion_weights")
        loss, metrics = dual_stream_loss(
            pred, target, mel_weights=mel_w, emotion_weights=emo_w,
            l1_weight=self.l1_weight, l2_weight=self.l2_weight,
            separation_weight=self.separation_weight)
        metrics.update(_stream_weight_metrics(mel_w, emo_w))
        return loss * scale, metrics


class SequentialTrainer(Trainer):
    """Sequence trainer over the sequential dual-stream model: each sample is
    a span longer than the model window; the model emits T_out frames in one
    forward (windows batched on the MXU) and the loss compares them against
    output-aligned targets with temporal/velocity terms
    (reference src/train_sequential.py:34, criterion fixed)."""

    def __init__(self, model, config: dict, *,
                 span_frames: Optional[int] = None, **kw):
        cfg = config or {}
        self.loss_config = loss_config_from(cfg.get("training", cfg))
        if self.loss_config.temporal_weight == 0 and \
                self.loss_config.velocity_weight == 0:
            self.loss_config = dataclasses.replace(
                self.loss_config, velocity_weight=0.1)
        data_cfg = cfg.get("data", {})
        self.span_frames = span_frames or int(
            data_cfg.get("window_frames", model.window_frames + 32))
        if self.span_frames <= model.window_frames:
            self.span_frames = model.window_frames + 32
        self.hop = int(model.sample_rate / model.target_fps)
        self._seq_losses: list = []
        self._seq_smoothness: list = []
        self._seq_file: int = -1
        super().__init__(model, config, **kw)

    def init_inputs(self) -> tuple:
        return (jnp.zeros((1, self.span_frames * self.hop), jnp.float32),)

    def loss_fn(self, params, batch, rng):
        rngs = {"dropout": rng} if rng is not None else None
        out = self.state.apply_fn(
            {"params": params}, batch["audio"],
            deterministic=rng is None, rngs=rngs)
        pred_seq = out["blendshapes"]              # (B, T_out, 52)
        target_seq = sequence_targets(
            batch["blendshapes"], self.model.window_frames,
            self.model.stride_frames, pred_seq.shape[1])
        pred_seq, scale = _mask_padded(pred_seq, target_seq, batch)
        loss, metrics = sequence_koemorph_loss(pred_seq, target_seq,
                                               config=self.loss_config)
        attn = params.get("dual_stream_attention", {})
        metrics.update(_stream_weight_metrics(attn.get("mel_weights"),
                                              attn.get("emotion_weights")))
        if pred_seq.shape[1] > 1:
            # temporal smoothness of the prediction itself (reference
            # train_sequential.py:373-410 per-sequence smoothness stats)
            metrics["smoothness"] = jnp.mean(jnp.abs(
                pred_seq[:, 1:] - pred_seq[:, :-1]))
        return loss * scale, metrics

    def _on_step_metrics(self, batch: dict, metrics: dict) -> None:
        """Per-sequence loss statistics at file boundaries (reference
        train_sequential.py:373-386: sequence/mean_loss, std_loss,
        loss_trend when the file being consumed changes)."""
        fi = batch.get("file_indices", batch.get("file_idx"))
        if fi is None:
            return
        current = int(np.asarray(fi).reshape(-1)[0])
        if current != self._seq_file and self._seq_losses:
            self._flush_sequence_stats()
        self._seq_file = current
        # device scalars; converted only at the flush boundary
        self._seq_losses.append(metrics["loss"])
        if "smoothness" in metrics:
            self._seq_smoothness.append(metrics["smoothness"])

    def _on_epoch_end(self) -> None:
        if self._seq_losses:
            self._flush_sequence_stats()
        self._seq_file = -1

    def _flush_sequence_stats(self) -> None:
        losses = np.asarray([float(v) for v in self._seq_losses])
        self._seq_losses = []
        smooth = np.asarray([float(v) for v in self._seq_smoothness])
        self._seq_smoothness = []
        stats = {
            "mean_loss": float(losses.mean()),
            "std_loss": float(losses.std()),
            "loss_trend": float(np.polyfit(
                np.arange(len(losses)), losses, 1)[0])
            if len(losses) > 1 else 0.0,
        }
        if smooth.size:
            stats["smoothness"] = float(smooth.mean())
        self._log_scalars("sequence", stats, self.global_step)
