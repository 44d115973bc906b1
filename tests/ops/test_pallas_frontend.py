"""Fused Pallas frontend kernel: exactness vs the jnp reference path.

The kernel runs in interpreter mode on CPU, so this validates the same code
that compiles on TPU (padding-exactness included: 513 -> 640 bins and
80 -> 128 mels are zero-padded, not approximated).
"""

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.mel import mel_filterbank
from koemorph_tpu.ops.pallas import (
    fused_frames_to_logmel,
    fused_log_mel_frontend,
)
from koemorph_tpu.ops.stft import stft_power


def reference_logmel(audio, sr=16000, n_fft=1024, hop=533, n_mels=80,
                     f_min=80.0, f_max=8000.0):
    spec = stft_power(audio, n_fft=n_fft, hop_length=hop, center=True,
                      power=2.0)
    fb = mel_filterbank(sr, n_fft, n_mels=n_mels, f_min=f_min, f_max=f_max)
    return 10.0 * jnp.log10(jnp.maximum(spec @ fb, 1e-10))


class TestFusedFrontend:
    def test_matches_reference_path(self, dummy_audio):
        got = fused_log_mel_frontend(jnp.asarray(dummy_audio))
        want = reference_logmel(jnp.asarray(dummy_audio))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_batched(self, dummy_audio_batch):
        got = fused_log_mel_frontend(jnp.asarray(dummy_audio_batch))
        want = reference_logmel(jnp.asarray(dummy_audio_batch))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_frames_entry_point_odd_t(self, rng):
        # T not a multiple of the tile: padding must not leak into output
        frames = rng.standard_normal((37, 1024)).astype(np.float32)
        got = fused_frames_to_logmel(jnp.asarray(frames))
        assert got.shape == (37, 80)
        w = jnp.asarray(np.hanning(1025)[:-1].astype(np.float32))
        spec = jnp.abs(jnp.fft.rfft(jnp.asarray(frames) * w, axis=-1)) ** 2
        fb = mel_filterbank(16000, 1024, n_mels=80, f_min=80.0,
                            f_max=8000.0)
        want = 10.0 * jnp.log10(jnp.maximum(spec @ fb, 1e-10))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)


class TestFrontendIntegration:
    def test_pallas_option_removed_with_pointer(self, dummy_audio_batch):
        # the model-path option was deleted after v5e measurements showed
        # the XLA matmul path 1.2-2.9x faster at every flagship shape;
        # the frontend must fail loudly with the migration pointer
        from koemorph_tpu.ops.frontend import (LogMelFrontend,
                                               log_mel_spectrogram)
        import pytest

        with pytest.raises(ValueError, match="fused_log_mel_frontend"):
            log_mel_spectrogram(jnp.asarray(dummy_audio_batch),
                                LogMelFrontend(stft_method="pallas"))

    def test_kernel_matches_matmul_frontend_normalized(
            self, dummy_audio_batch):
        # the standalone kernel still reproduces the production frontend
        # when its dB output is normalized the same way
        from koemorph_tpu.ops.frontend import (
            LogMelFrontend, log_mel_spectrogram, normalize_log_mel)

        base = LogMelFrontend()
        a = jnp.asarray(dummy_audio_batch)
        want = log_mel_spectrogram(a, base)
        mel_db = fused_log_mel_frontend(
            a, sample_rate=base.sample_rate, n_fft=base.n_fft,
            hop_length=base.hop_length, n_mels=base.n_mels,
            f_min=base.f_min, f_max=base.effective_f_max)
        ref_db = jnp.max(mel_db, axis=(-2, -1), keepdims=True)
        got = normalize_log_mel(jnp.maximum(mel_db - ref_db, -80.0))
        assert got.shape == want.shape
        # normalized units: 0.02 dB tolerance -> 2.5e-4 normalized
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)
