"""Behavioral prosody tests (mirrors reference tests/features/test_prosody.py:
F0 of a synthesized sine, silent-audio VAD, normalizer round-trip)."""

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.prosody import (
    ProsodyConfig,
    denormalize_prosody,
    extract_prosody,
    interpolate_unvoiced,
    median3,
    normalize_prosody,
    preemphasis,
)

SR = 16000


def sine(freq, secs=1.0, amp=0.5):
    t = np.arange(int(secs * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestExtractProsody:
    def test_shape_at_target_fps(self):
        out = extract_prosody(jnp.asarray(sine(220.0, 2.0)))
        assert out.shape == (60, 4)  # 2 s * 30 fps

    def test_f0_of_sine(self):
        out = np.asarray(extract_prosody(jnp.asarray(sine(220.0, 2.0))))
        f0 = out[5:-5, 0]
        med = np.median(f0[f0 > 0])
        assert abs(med - 220.0) < 10.0

    def test_silent_audio_vad_low(self):
        out = np.asarray(extract_prosody(jnp.zeros(SR)))
        assert out[:, 2].mean() < 0.6  # VAD column not firing hard
        assert np.abs(out[:, 0]).max() == 0.0  # no F0

    def test_loud_vs_quiet_energy(self):
        loud = np.asarray(extract_prosody(jnp.asarray(sine(220.0, 1.0, 0.9))))
        quiet = np.asarray(extract_prosody(jnp.asarray(sine(220.0, 1.0, 0.05))))
        assert loud[:, 1].mean() > quiet[:, 1].mean()

    def test_batched(self):
        x = jnp.stack([jnp.asarray(sine(110.0)), jnp.asarray(sine(220.0))])
        out = extract_prosody(x)
        assert out.shape == (2, 30, 4)


class TestHelpers:
    def test_preemphasis(self):
        x = jnp.asarray(np.array([1.0, 1.0, 1.0], np.float32))
        y = np.asarray(preemphasis(x))
        np.testing.assert_allclose(y, [1.0, 0.03, 0.03], atol=1e-6)

    def test_median3_removes_spike(self):
        x = jnp.asarray(np.array([0, 0, 1, 0, 0], np.float32))
        y = np.asarray(median3(x, k=3))
        assert y[2] == 0.0

    def test_interpolate_unvoiced_interior_only(self):
        f0 = jnp.asarray(np.array([0, 100, 0, 0, 200, 0], np.float32))
        voiced = jnp.asarray(np.array([0, 1, 0, 0, 1, 0], bool))
        out = np.asarray(interpolate_unvoiced(f0, voiced))
        np.testing.assert_allclose(out[2], 100 + (200 - 100) / 3, rtol=1e-5)
        assert out[0] == 0.0 and out[5] == 0.0  # edges untouched


class TestNormalizer:
    def test_round_trip(self, rng):
        feats = np.zeros((20, 4), np.float32)
        feats[:, 0] = rng.uniform(100, 300, 20)   # F0
        feats[:, 1] = rng.uniform(-8, -2, 20)     # log energy
        feats[:, 2] = 1.0
        feats[:, 3] = rng.uniform(0, 1, 20)
        x = jnp.asarray(feats)
        back = np.asarray(denormalize_prosody(normalize_prosody(x)))
        np.testing.assert_allclose(back, feats, rtol=1e-3, atol=1e-3)

    def test_unvoiced_f0_stays_zero(self):
        feats = np.zeros((5, 4), np.float32)
        out = np.asarray(normalize_prosody(jnp.asarray(feats)))
        assert np.abs(out[:, 0]).max() == 0.0
