"""Trainer tests: optimizer factories, checkpoint round-trip, and tiny
end-to-end training steps on the 8-device mesh (models shrunk so CPU
compiles stay fast)."""

import numpy as np
import optax
import pytest

from koemorph_tpu.models.dual_stream_model import (
    SequentialDualStreamModel,
    SimplifiedDualStreamModel,
)
from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel
from koemorph_tpu.train import (
    CheckpointManager,
    DualStreamTrainer,
    KoeMorphTrainer,
    SequentialTrainer,
    create_lr_schedule,
    create_optimizer,
    load_checkpoint,
    save_checkpoint,
    sequence_targets,
)

TRAIN_CFG = {
    "optimizer": {"name": "adamw", "lr": 1e-3, "weight_decay": 1e-5,
                  "betas": [0.9, 0.999]},
    "lr_scheduler": {"name": "cosine", "t_max": 2, "eta_min": 1e-6},
    "loss": {"mse_weight": 1.0, "l1_weight": 0.1, "perceptual_weight": 0.0},
    "gradient_clip_val": 1.0,
    "max_epochs": 1,
    "logging": {"log_every_n_steps": 1, "tensorboard": False},
    "checkpoint": {"keep_epoch_every": 100},
}


class TestOptimFactories:
    def test_cosine_schedule_decays(self):
        sched = create_lr_schedule(TRAIN_CFG, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-3, rel=1e-3)
        assert float(sched(19)) < float(sched(1))

    def test_cosine_restarts(self):
        cfg = dict(TRAIN_CFG,
                   lr_scheduler={"name": "cosine_restarts",
                                 "restart_period": 1, "restart_mult": 2})
        sched = create_lr_schedule(cfg, steps_per_epoch=10)
        # after a restart the LR jumps back up
        assert float(sched(10)) > float(sched(9))

    def test_warmup(self):
        cfg = dict(TRAIN_CFG, lr_scheduler={"name": "constant",
                                            "warmup_steps": 5})
        sched = create_lr_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
        assert float(sched(5)) == pytest.approx(1e-3, rel=1e-3)

    def test_optimizer_updates_params(self):
        tx = create_optimizer(TRAIN_CFG, steps_per_epoch=10)
        params = {"w": np.ones(3, np.float32)}
        state = tx.init(params)
        grads = {"w": np.ones(3, np.float32)}
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert not np.allclose(new["w"], params["w"])


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
        save_checkpoint(tmp_path / "ck", state, epoch=3, global_step=42,
                        best_val_loss=0.5, config={"a": 1})
        restored, meta = load_checkpoint(tmp_path / "ck", target=state)
        np.testing.assert_array_equal(restored["w"], state["w"])
        assert meta["epoch"] == 3
        assert meta["global_step"] == 42
        assert meta["config"] == {"a": 1}

    def test_manager_best_last_policy(self, tmp_path):
        mgr = CheckpointManager(tmp_path, keep_epoch_every=2)
        state = {"w": np.zeros(2, np.float32)}
        mgr.save(state, epoch=0, global_step=1, val_loss=1.0)
        mgr.save({"w": np.ones(2, np.float32)}, epoch=1, global_step=2,
                 val_loss=0.5)
        mgr.save(state, epoch=2, global_step=3, val_loss=0.9)  # not best
        best, meta = load_checkpoint(tmp_path / "best", target=state)
        np.testing.assert_array_equal(best["w"], np.ones(2))
        assert (tmp_path / "last").exists()
        assert (tmp_path / "epoch_2").exists()
        _, last_meta = load_checkpoint(tmp_path / "last", target=state)
        assert last_meta["epoch"] == 2


def _synthetic_batches(n, batch, samples, frames=None, key="arkit"):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        b = {"audio": rng.standard_normal((batch, samples)).astype(np.float32)
             * 0.1}
        t = frames or 2
        b[key] = rng.uniform(0, 1, (batch, t, 52)).astype(np.float32)
        if key == "arkit":
            b["arkit_mask"] = np.ones((batch, t), bool)
        out.append(b)
    return out


class TestKoeMorphTrainer:
    def test_two_steps_reduce_loss_shape(self, tmp_path):
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        trainer = KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                  audio_samples=1600,
                                  work_dir=tmp_path, steps_per_epoch=2)
        batches = _synthetic_batches(2, 8, 1600)
        metrics = trainer.train_epoch(iter(batches))
        assert "loss" in metrics and np.isfinite(metrics["loss"])
        assert trainer.global_step == 2

    def test_validate(self, tmp_path):
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        trainer = KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                  audio_samples=1600,
                                  work_dir=tmp_path, steps_per_epoch=2)
        val = trainer.validate(iter(_synthetic_batches(1, 8, 1600)))
        assert "loss" in val and np.isfinite(val["loss"])

    def test_scan_epoch_matches_step_loop(self, tmp_path):
        """train_epoch_scan (device-resident lax.scan) must reproduce the
        per-step host loop's parameter trajectory exactly: same
        _train_step_impl, same dropout-rng fold on state.step."""
        import jax

        def make():
            model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                            decoder_hidden=16)
            return KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                   audio_samples=1600,
                                   work_dir=tmp_path, steps_per_epoch=3)

        batches = _synthetic_batches(3, 8, 1600)
        # partial final batch: scan pads it to the epoch max and masks it
        batches[-1] = {k: v[:5] for k, v in batches[-1].items()}

        loop = make()
        m_loop = loop.train_epoch(iter(batches))
        scan = make()
        m_scan = scan.train_epoch_scan(iter(batches))

        assert scan.global_step == loop.global_step == 3
        la = {jax.tree_util.keystr(p): leaf for p, leaf in
              jax.tree_util.tree_leaves_with_path(loop.state.params)}
        lb = {jax.tree_util.keystr(p): leaf for p, leaf in
              jax.tree_util.tree_leaves_with_path(scan.state.params)}
        assert la.keys() == lb.keys()
        for k in la:
            np.testing.assert_allclose(np.asarray(la[k]),
                                       np.asarray(lb[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
        assert m_scan["loss"] == pytest.approx(m_loop["loss"], rel=1e-5)

    def test_epochs_scan_matches_per_epoch_scan(self, tmp_path):
        """train_epochs_scan (dataset-resident, N epochs in one program,
        on-device shuffle) must equal running train_epoch_scan per epoch
        with the same permutations applied host-side."""
        import jax

        def make():
            model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                            decoder_hidden=16)
            return KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                   audio_samples=1600,
                                   work_dir=tmp_path, steps_per_epoch=3)

        batches = _synthetic_batches(3, 8, 1600)
        multi = make()
        hist = multi.train_epochs_scan(iter(batches), n_epochs=2,
                                       shuffle_seed=5)
        assert len(hist) == 2 and np.isfinite(hist[-1]["loss"])
        assert multi.global_step == 6 and multi.epoch == 2

        ref = make()
        for key in jax.random.split(jax.random.PRNGKey(5), 2):
            perm = np.asarray(jax.random.permutation(key, 3))
            ref.train_epoch_scan(iter([batches[i] for i in perm]))

        la = {jax.tree_util.keystr(p): leaf for p, leaf in
              jax.tree_util.tree_leaves_with_path(multi.state.params)}
        lb = {jax.tree_util.keystr(p): leaf for p, leaf in
              jax.tree_util.tree_leaves_with_path(ref.state.params)}
        for k in la:
            np.testing.assert_allclose(np.asarray(la[k]),
                                       np.asarray(lb[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)

    def test_fit_checkpoints(self, tmp_path):
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        trainer = KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                  audio_samples=1600,
                                  work_dir=tmp_path, steps_per_epoch=1)
        trainer.fit(lambda: iter(_synthetic_batches(1, 8, 1600)),
                    lambda: iter(_synthetic_batches(1, 8, 1600)),
                    max_epochs=1)
        assert (tmp_path / "checkpoints" / "last").exists()
        assert (tmp_path / "checkpoints" / "best").exists()

    def test_checkpoint_cadence(self, tmp_path):
        """checkpoint.every_n_epochs thins the per-epoch orbax saves
        (each fetches params+opt state through the tunnel) but the final
        epoch always saves."""
        cfg = dict(TRAIN_CFG,
                   checkpoint={"keep_epoch_every": 1, "every_n_epochs": 3})
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        trainer = KoeMorphTrainer(model, {"training": cfg},
                                  audio_samples=1600,
                                  work_dir=tmp_path, steps_per_epoch=1)
        trainer.fit(lambda: iter(_synthetic_batches(1, 8, 1600)),
                    max_epochs=4)
        ck = tmp_path / "checkpoints"
        # epochs 2 (cadence) and 3 (final) save; 0 and 1 don't
        assert (ck / "epoch_2").exists() and (ck / "epoch_3").exists()
        assert not (ck / "epoch_0").exists()
        assert not (ck / "epoch_1").exists()
        assert (ck / "last").exists()


class TestDualStreamTrainer:
    def test_step_with_window_targets(self, tmp_path):
        model = SimplifiedDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=32,
            emotion_backend="basic", use_concatenation=False, target_fps=30)
        samples = 32 * 533
        trainer = DualStreamTrainer(model, {"training": TRAIN_CFG},
                                    work_dir=tmp_path, steps_per_epoch=1)
        assert trainer.audio_samples == samples
        batches = _synthetic_batches(1, 8, samples, frames=32,
                                     key="blendshapes")
        metrics = trainer.train_epoch(iter(batches))
        assert np.isfinite(metrics["loss"])
        assert "separation" in metrics  # stream regularizer active


class TestSequentialTrainer:
    def test_sequence_targets_alignment(self):
        bs = np.arange(10)[None, :, None] * np.ones((1, 10, 52))
        t = sequence_targets(bs, window_frames=4, stride_frames=2, n_out=3)
        np.testing.assert_array_equal(t[0, :, 0], [3, 5, 7])

    def test_step(self, tmp_path):
        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=4, target_fps=30)
        span = 24
        trainer = SequentialTrainer(
            model, {"training": TRAIN_CFG,
                    "data": {"window_frames": span}},
            work_dir=tmp_path, steps_per_epoch=1)
        batches = _synthetic_batches(1, 8, span * 533, frames=span,
                                     key="blendshapes")
        metrics = trainer.train_epoch(iter(batches))
        assert np.isfinite(metrics["loss"])


class TestReviewRegressions:
    """Regressions for code-review findings (padding loss bias, stale best
    on resume, epoch reshuffle)."""

    def test_mask_padded_zeroes_pad_rows(self):
        import jax
        import jax.numpy as jnp
        from koemorph_tpu.train.trainer import _mask_padded
        pred = jnp.ones((4, 52)) * 0.8
        target = jnp.zeros((4, 52))
        batch = {"sample_mask": jnp.asarray([1.0, 1.0, 0.0, 0.0])}
        masked, scale = _mask_padded(pred, target, batch)
        # padded rows equal target -> zero error; real rows untouched
        np.testing.assert_allclose(np.asarray(masked[:2]), 0.8)
        np.testing.assert_allclose(np.asarray(masked[2:]), 0.0)
        assert float(scale) == pytest.approx(2.0)
        # gradients do not flow through padded rows
        def loss(p):
            m, s = _mask_padded(p, target, batch)
            return jnp.mean((m - target) ** 2) * s
        g = np.asarray(jax.grad(loss)(pred))
        assert np.abs(g[:2]).sum() > 0
        np.testing.assert_allclose(g[2:], 0.0)

    def test_padded_loss_matches_unpadded(self, tmp_path):
        """Loss over a 5-real/3-pad batch equals the loss over the 5 real
        rows alone (the review's 5/8-gradient-weight bug)."""
        import jax.numpy as jnp
        from koemorph_tpu.models.losses import koemorph_loss, KoeMorphLossConfig
        from koemorph_tpu.train.trainer import _mask_padded
        rng = np.random.default_rng(0)
        pred5 = jnp.asarray(rng.uniform(0, 1, (5, 52)).astype(np.float32))
        tgt5 = jnp.asarray(rng.uniform(0, 1, (5, 52)).astype(np.float32))
        # error-based terms only: value-based regularizers (sparsity/
        # smoothness/landmark) see detached target values on padded rows —
        # gradient-free but not exactly equal to the unpadded loss
        cfg = KoeMorphLossConfig(mse_weight=1.0, l1_weight=0.1,
                                 perceptual_weight=0.0, temporal_weight=0.0,
                                 sparsity_weight=0.0, smoothness_weight=0.0,
                                 landmark_weight=0.0, velocity_weight=0.0)
        want, _ = koemorph_loss(pred5, tgt5, config=cfg)
        pred8 = jnp.concatenate([pred5, jnp.tile(pred5[-1:], (3, 1))])
        tgt8 = jnp.concatenate([tgt5, jnp.tile(tgt5[-1:], (3, 1))])
        batch = {"sample_mask": jnp.asarray([1.0] * 5 + [0.0] * 3)}
        masked, scale = _mask_padded(pred8, tgt8, batch)
        got, _ = koemorph_loss(masked, tgt8, config=cfg)
        np.testing.assert_allclose(float(got * scale), float(want),
                                   rtol=1e-6)

    def test_checkpoint_best_survives_resume(self, tmp_path):
        """'last' records the updated best_val_loss so resume cannot let a
        worse model overwrite 'best'."""
        mgr = CheckpointManager(tmp_path, keep_epoch_every=1000)
        best_state = {"w": np.ones(2, np.float32)}
        mgr.save({"w": np.zeros(2, np.float32)}, epoch=0, global_step=1,
                 val_loss=0.12)
        mgr.save(best_state, epoch=1, global_step=2, val_loss=0.10)
        # simulate crash + resume: a fresh manager restores from 'last'
        mgr2 = CheckpointManager(tmp_path, keep_epoch_every=1000)
        _, meta = load_checkpoint(tmp_path / "last")
        mgr2.best_val_loss = float(meta["best_val_loss"])
        assert mgr2.best_val_loss == pytest.approx(0.10)
        mgr2.save({"w": np.full(2, 9.0, np.float32)}, epoch=2,
                  global_step=3, val_loss=0.11)   # worse than true best
        best, bmeta = load_checkpoint(tmp_path / "best", target=best_state)
        np.testing.assert_array_equal(best["w"], best_state["w"])

class TestResume:
    """Full-state resume (reference saves optimizer + scheduler state,
    src/train.py:300-328): an interrupted run must continue exactly."""

    def _trainer(self, tmp_path):
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        cfg = dict(TRAIN_CFG,
                   lr_scheduler={"name": "cosine", "t_max": 2,
                                 "eta_min": 1e-6, "warmup_steps": 2})
        return KoeMorphTrainer(model, {"training": cfg}, audio_samples=1600,
                               work_dir=tmp_path, steps_per_epoch=2)

    def test_resume_matches_uninterrupted_trajectory(self, tmp_path):
        import jax

        batches = _synthetic_batches(4, 8, 1600)
        # uninterrupted: 2 epochs x 2 steps
        t_full = self._trainer(tmp_path / "full")
        t_full.fit(lambda e: iter(batches[2 * e: 2 * e + 2]),
                   lambda: iter(batches[:1]), max_epochs=2)

        # interrupted: 1 epoch, then a brand-new trainer resumes
        t_a = self._trainer(tmp_path / "split")
        t_a.fit(lambda e: iter(batches[2 * e: 2 * e + 2]),
                lambda: iter(batches[:1]), max_epochs=1)
        t_b = self._trainer(tmp_path / "split")
        assert t_b.resume()
        assert t_b.epoch == 1 and t_b.global_step == 2
        t_b.fit(lambda e: iter(batches[2 * e: 2 * e + 2]),
                lambda: iter(batches[:1]), max_epochs=2)

        flat_full = jax.tree_util.tree_leaves(t_full.state.params)
        flat_b = jax.tree_util.tree_leaves(t_b.state.params)
        for a, b in zip(flat_full, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_resume_restores_momentum(self, tmp_path):
        import jax

        batches = _synthetic_batches(2, 8, 1600)
        t_a = self._trainer(tmp_path)
        t_a.fit(lambda e: iter(batches), lambda: iter(batches[:1]),
                max_epochs=1)
        mu_before = [np.asarray(x) for x in
                     jax.tree_util.tree_leaves(t_a.state.opt_state)]
        t_b = self._trainer(tmp_path)
        assert t_b.resume()
        mu_after = [np.asarray(x) for x in
                    jax.tree_util.tree_leaves(t_b.state.opt_state)]
        assert len(mu_before) == len(mu_after)
        for a, b in zip(mu_before, mu_after):
            np.testing.assert_allclose(a, b, atol=1e-7)

    def test_params_only_checkpoint_fast_forwards_schedule(self, tmp_path):
        """Resuming a legacy params-only checkpoint must not replay warmup:
        every schedule count in the rebuilt optimizer state equals
        global_step, so the applied LR == schedule(global_step)."""
        t_a = self._trainer(tmp_path)
        # simulate a round-1 checkpoint: params only, no opt_state dir
        save_checkpoint(tmp_path / "checkpoints" / "last",
                        t_a.state.params, epoch=4, global_step=10)
        t_b = self._trainer(tmp_path)
        assert t_b.resume()
        assert t_b.global_step == 10

        counts = []

        def collect(node):
            if hasattr(node, "_fields"):
                for f in node._fields:
                    v = getattr(node, f)
                    if f == "count":
                        counts.append(int(np.asarray(v)))
                    else:
                        collect(v)
            elif isinstance(node, (tuple, list)):
                for x in node:
                    collect(x)

        collect(t_b.state.opt_state)
        assert counts and all(c == 10 for c in counts)


class TestReviewRegressions2:
    def test_fit_passes_epoch_to_loader(self, tmp_path):
        model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                        decoder_hidden=16)
        trainer = KoeMorphTrainer(model, {"training": TRAIN_CFG},
                                  audio_samples=1600, work_dir=tmp_path,
                                  steps_per_epoch=1)
        seen = []

        def loader(epoch):
            seen.append(epoch)
            return iter(_synthetic_batches(1, 8, 1600))

        trainer.fit(loader, max_epochs=2)
        assert seen == [0, 1]


class FakeWriter:
    def __init__(self):
        self.scalars = []
        self.images = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))

    def add_image(self, tag, img, step, dataformats="HW"):
        self.images.append((tag, np.asarray(img).shape, step, dataformats))

    def close(self):
        pass


class TestObservability:
    """Attention-image + per-sequence stat logging
    (reference train_sequential.py:355-410)."""

    def _trainer(self, tmp_path, log_images_every=2):
        model = SequentialDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=16,
            emotion_backend="basic", use_concatenation=False,
            stride_frames=4, target_fps=30)
        cfg = dict(TRAIN_CFG)
        cfg["logging"] = {"log_every_n_steps": 1, "tensorboard": False,
                          "log_images_every_n_steps": log_images_every}
        trainer = SequentialTrainer(
            model, {"training": cfg, "data": {"window_frames": 24}},
            work_dir=tmp_path, steps_per_epoch=1)
        trainer.writer = FakeWriter()
        return trainer

    def test_attention_images_logged(self, tmp_path):
        trainer = self._trainer(tmp_path, log_images_every=2)
        batches = _synthetic_batches(4, 8, 24 * 533, frames=24,
                                     key="blendshapes")
        trainer.train_epoch(iter(batches))
        tags = [t for t, *_ in trainer.writer.images]
        assert tags.count("attention/mel") == 2       # steps 2 and 4
        assert tags.count("attention/emotion") == 2
        # image is a 2-D heatmap (queries x keys)
        _, shape, _, fmt = trainer.writer.images[0]
        assert len(shape) == 2 and fmt == "HW"

    def test_sequence_stats_logged_on_file_change(self, tmp_path):
        trainer = self._trainer(tmp_path, log_images_every=0)
        batches = _synthetic_batches(4, 8, 24 * 533, frames=24,
                                     key="blendshapes")
        for i, b in enumerate(batches):
            b["file_indices"] = np.full((8,), i // 2, np.int64)
        trainer.train_epoch(iter(batches))
        tags = [t for t, *_ in trainer.writer.scalars]
        # one flush at the file boundary + one at epoch end
        assert tags.count("sequence/mean_loss") == 2
        assert tags.count("sequence/std_loss") == 2
        assert tags.count("sequence/loss_trend") == 2
        assert tags.count("sequence/smoothness") == 2
        vals = {t: v for t, v, _ in trainer.writer.scalars}
        assert np.isfinite(vals["sequence/mean_loss"])

    def test_smoothness_metric_present(self, tmp_path):
        trainer = self._trainer(tmp_path, log_images_every=0)
        batches = _synthetic_batches(1, 8, 24 * 533, frames=24,
                                     key="blendshapes")
        metrics = trainer.train_epoch(iter(batches))
        assert "smoothness" in metrics
        assert np.isfinite(metrics["smoothness"])
