"""Reference-named mel extractor classes (features/stft.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from koemorph_tpu.features import (  # noqa: E402
    InverseMelSpectrogram,
    MelSpectrogramExtractor,
)

SR = 16000


def tone(secs=2.0, freq=220.0):
    t = np.arange(int(secs * SR)) / SR
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestMelSpectrogramExtractor:
    def test_output_shape_matches_fps(self):
        ex = MelSpectrogramExtractor(target_fps=30.0)
        out = np.asarray(ex(tone(2.0)))
        assert out.shape == (1, 60, 80)      # duration * fps frames
        ex60 = MelSpectrogramExtractor(target_fps=60.0)
        assert np.asarray(ex60(tone(2.0))).shape == (1, 120, 80)

    def test_batch_and_1d_inputs(self):
        ex = MelSpectrogramExtractor()
        b = np.stack([tone(1.0), tone(1.0, 150.0)])
        assert np.asarray(ex(b)).shape == (2, 30, 80)
        with pytest.raises(ValueError):
            ex(np.zeros((1, 2, 100), np.float32))

    def test_get_output_length(self):
        ex = MelSpectrogramExtractor(target_fps=30.0)
        assert ex.get_output_length(SR) == 30

    def test_invalid_fps_raises(self):
        with pytest.raises(ValueError):
            MelSpectrogramExtractor(sample_rate=100, target_fps=200.0)


class TestInverseMelSpectrogram:
    def test_roundtrip_preserves_pitch_and_scale(self):
        """Griffin-Lim recovers phase only up to a global shift, so the
        meaningful assertions are spectral: the reconstruction keeps the
        tone's dominant frequency and a same-order amplitude (the
        reference's own test asserts spectral similarity, not waveform
        SNR — tests/features/test_stft.py:177-204). 60 fps -> hop 266
        gives the 1024-window the overlap Griffin-Lim needs (the 30 fps
        hop of 533 violates COLA for any n_fft <= 1024 — inherent to
        mel-at-video-rate, reference included)."""
        audio = tone(1.0)
        ex = MelSpectrogramExtractor(n_fft=1024, target_fps=60.0)
        inv = InverseMelSpectrogram(n_fft=1024, target_fps=60.0,
                                    n_iter=32)
        log_mel = ex(audio)
        rec = np.asarray(inv(log_mel))[0]
        assert np.isfinite(rec).all()
        spec = np.abs(np.fft.rfft(rec))
        freqs = np.fft.rfftfreq(len(rec), 1 / SR)
        dominant = freqs[np.argmax(spec)]
        assert abs(dominant - 220.0) < 15.0, dominant
        # normalized-analysis gain is undone: amplitude same order as 0.5
        peak = np.abs(rec).max()
        assert 0.05 < peak < 5.0, peak


class TestReferenceCallingConventions:
    def test_inverse_accepts_extractor_instance(self):
        """Reference signature: InverseMelSpectrogram(mel_extractor, ...)
        (reference stft.py:183-204)."""
        ex = MelSpectrogramExtractor(n_fft=1024, target_fps=60.0)
        inv = InverseMelSpectrogram(ex, n_iter=4)
        rec = np.asarray(inv(ex(tone(0.5))))
        assert rec.ndim == 2 and np.isfinite(rec).all()

    def test_opensmile_named_extractor_reference_defaults(self):
        """OpenSMILEeGeMAPSExtractor keeps the reference's constructor
        surface and its use_concatenation=False default (88-D)."""
        from koemorph_tpu.features import OpenSMILEeGeMAPSExtractor

        ex = OpenSMILEeGeMAPSExtractor(
            feature_set="eGeMAPSv02", feature_level="Functionals",
            enable_caching=True, device="cpu")
        assert ex.feature_dim == 88
        with pytest.raises(ValueError, match="feature_set"):
            OpenSMILEeGeMAPSExtractor(feature_set="ComParE_2016")
        with pytest.raises(ValueError, match="feature_level"):
            OpenSMILEeGeMAPSExtractor(feature_level="LLD")
