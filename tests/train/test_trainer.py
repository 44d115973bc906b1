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
