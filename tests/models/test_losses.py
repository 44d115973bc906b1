"""Tests for loss functions and metrics (mirrors reference
tests/model/test_losses.py: composition, zero-loss-on-identical, grad flow,
metrics accumulate/compute/reset)."""

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.models.losses import (
    BlendshapeMetrics,
    KoeMorphLossConfig,
    compute_lip_sync_metrics,
    dual_stream_loss,
    frame_metrics,
    koemorph_loss,
    sequence_koemorph_loss,
)


class TestKoeMorphLoss:
    def test_zero_reconstruction_on_identical(self, dummy_blendshape_batch):
        x = jnp.asarray(dummy_blendshape_batch)
        total, metrics = koemorph_loss(x, x)
        assert float(metrics["mse"]) == 0.0
        assert float(metrics["l1"]) == 0.0
        assert float(metrics["mae"]) == 0.0
        # regularizers (sparsity/smoothness) still contribute
        assert float(total) > 0.0

    def test_active_weight_emphasizes_active_elements(self, rng):
        # same total error mass on an active vs an inactive element:
        # with active_weight > 1, the active-element error must cost more
        target = jnp.zeros((4, 52)).at[:, 3].set(0.5)   # channel 3 active
        err_active = target.at[:, 3].add(-0.1)
        err_inactive = target.at[:, 7].add(0.1)
        cfg = KoeMorphLossConfig(active_weight=4.0, perceptual_weight=0.0,
                                 landmark_weight=0.0, sparsity_weight=0.0,
                                 smoothness_weight=0.0)
        tot_a, met_a = koemorph_loss(err_active, target, config=cfg)
        tot_i, met_i = koemorph_loss(err_inactive, target, config=cfg)
        assert float(tot_a) > 2.0 * float(tot_i)
        # metrics stay UNWEIGHTED (advisor r4): same error mass -> same
        # reported mse/l1 regardless of which element carries it, so
        # 'l1' == MAE is comparable across active_weight settings
        np.testing.assert_allclose(float(met_a["mse"]), float(met_i["mse"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(met_a["l1"]), float(met_a["mae"]),
                                   rtol=1e-6)
        # weights renormalize to mean 1: identical pred/target still 0,
        # and active_weight=1.0 reproduces the plain mean exactly
        assert float(koemorph_loss(target, target, config=cfg)[1]["mse"]) == 0
        base = KoeMorphLossConfig(perceptual_weight=0.0, landmark_weight=0.0,
                                  sparsity_weight=0.0, smoothness_weight=0.0)
        np.testing.assert_allclose(
            float(koemorph_loss(err_active, target, config=base)[1]["mse"]),
            float(jnp.mean((err_active - target) ** 2)), rtol=1e-6)

    def test_loss_increases_with_error(self, rng):
        t = jnp.asarray(rng.uniform(0, 1, (4, 52)), jnp.float32)
        small = jnp.clip(t + 0.01, 0, 1)
        large = jnp.clip(t + 0.3, 0, 1)
        l_small, _ = koemorph_loss(small, t)
        l_large, _ = koemorph_loss(large, t)
        assert float(l_large) > float(l_small)

    def test_temporal_terms_require_prev(self, rng):
        p = jnp.asarray(rng.uniform(0, 1, (4, 52)), jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (4, 52)), jnp.float32)
        _, m_no = koemorph_loss(p, t)
        assert "temporal" not in m_no
        _, m_yes = koemorph_loss(p, t, prev_pred=p * 0.5, prev_target=t * 0.5)
        assert "temporal" in m_yes and "velocity" in m_yes

    def test_grad_flow(self, rng):
        t = jnp.asarray(rng.uniform(0, 1, (4, 52)), jnp.float32)

        def loss(p):
            return koemorph_loss(p, t)[0]

        g = jax.grad(loss)(t * 0.5)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_weights_disable_terms(self, rng):
        p = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        cfg = KoeMorphLossConfig(perceptual_weight=0.0, landmark_weight=0.0)
        _, m = koemorph_loss(p, t, config=cfg)
        assert "perceptual" not in m and "landmark" not in m

    def test_jit(self, rng):
        p = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        f = jax.jit(lambda a, b: koemorph_loss(a, b)[0])
        assert np.isfinite(float(f(p, t)))


class TestSequenceLoss:
    def test_matches_frame_loss_plus_temporal(self, rng):
        seq_p = jnp.asarray(rng.uniform(0, 1, (2, 8, 52)), jnp.float32)
        seq_t = jnp.asarray(rng.uniform(0, 1, (2, 8, 52)), jnp.float32)
        total, m = sequence_koemorph_loss(seq_p, seq_t)
        assert np.isfinite(float(total))
        assert "temporal" in m and "velocity" in m


class TestDualStreamLoss:
    def test_basic_and_separation(self, rng):
        p = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (2, 52)), jnp.float32)
        mel_w = jnp.ones(52)
        emo_w = jnp.ones(52)
        total, m = dual_stream_loss(p, t, mel_weights=mel_w,
                                    emotion_weights=emo_w)
        assert "separation" in m and float(total) > 0


class TestFrameMetrics:
    def test_perfect_prediction(self, rng):
        x = jnp.asarray(rng.uniform(0.2, 0.8, (4, 52)), jnp.float32)
        m = frame_metrics(x, x)
        assert float(m["mae"]) == 0.0
        assert float(m["correlation"]) > 0.99
        assert float(m["f1_score"]) > 0.99


class TestBlendshapeMetrics:
    def test_accumulate_compute_reset(self, rng):
        acc = BlendshapeMetrics()
        for _ in range(3):
            p = rng.uniform(0, 1, (4, 52)).astype(np.float32)
            acc.update(p, p + 0.01)
        m = acc.compute()
        assert abs(m["mae"] - 0.01) < 1e-4
        assert "temporal_consistency" in m
        acc.reset()
        assert acc.compute() == {}


class TestLipSync:
    def test_mouth_metrics(self, rng):
        p = rng.uniform(0, 1, (16, 52)).astype(np.float32)
        m = compute_lip_sync_metrics(p, p)
        assert m["mouth_mae"] == 0.0
        assert m["mouth_correlation"] > 0.99

    def test_audiovisual_sync(self, rng):
        p = rng.uniform(0, 1, (16, 52)).astype(np.float32)
        audio = rng.standard_normal((16, 10, 4)).astype(np.float32)
        m = compute_lip_sync_metrics(p, p, audio)
        assert "audiovisual_sync" in m

    def test_constant_signal_zero_correlation(self):
        p = np.full((8, 52), 0.5, np.float32)
        m = compute_lip_sync_metrics(p, p)
        assert m["mouth_correlation"] == 0.0
