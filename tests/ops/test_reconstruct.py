"""Griffin-Lim reconstruction round-trip (the reference's load-bearing
behavioral frontend test: mel -> audio -> SNR,
reference tests/features/test_stft.py:144-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.ops.mel import mel_filterbank
from koemorph_tpu.ops.reconstruct import (
    compute_reconstruction_snr,
    griffin_lim,
    mel_to_linear,
    reconstruct_audio,
    validate_mel_parameters,
)
from koemorph_tpu.ops.stft import stft_power

SR = 16000
N_FFT = 512
HOP = 128


def sine(freq=440.0, dur=1.0):
    t = np.arange(int(SR * dur)) / SR
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestGriffinLim:
    def test_magnitude_roundtrip_spectral(self):
        """Griffin-Lim reconstructs the MAGNITUDE spectrogram (waveform SNR
        is meaningless: GL recovers phase only up to a global shift). The
        spectral relative error must be small and must improve with
        iterations."""
        x = sine()
        mag = jnp.sqrt(stft_power(jnp.asarray(x), n_fft=N_FFT,
                                  hop_length=HOP, center=True, power=2.0))

        def spectral_err(rec):
            m = jnp.sqrt(stft_power(rec, n_fft=N_FFT, hop_length=HOP,
                                    center=True, power=2.0))
            m = m[: mag.shape[0]]
            return float(jnp.linalg.norm(m - mag) / jnp.linalg.norm(mag))

        rec_2 = griffin_lim(mag, n_fft=N_FFT, hop_length=HOP,
                            length=len(x), n_iter=2)
        rec_48 = griffin_lim(mag, n_fft=N_FFT, hop_length=HOP,
                             length=len(x), n_iter=48)
        err_2, err_48 = spectral_err(rec_2), spectral_err(rec_48)
        assert err_48 < 0.15, f"spectral error {err_48:.3f}"
        assert err_48 < err_2, (err_2, err_48)

    def test_istft_exact_roundtrip(self):
        """With the TRUE complex STFT, overlap-add inversion is exact."""
        from koemorph_tpu.ops.reconstruct import _istft_overlap_add
        from koemorph_tpu.ops.window import frame_signal, hann_window
        x = sine()
        frames = frame_signal(jnp.asarray(x), N_FFT, HOP,
                              center=True) * hann_window(N_FFT)
        spec = jnp.fft.rfft(frames, axis=-1)
        rec = _istft_overlap_add(spec, N_FFT, HOP, len(x))
        snr = float(compute_reconstruction_snr(jnp.asarray(x), rec))
        assert snr > 60.0, snr

    def test_mel_roundtrip_preserves_pitch(self):
        """Through the mel bottleneck, the reconstruction keeps the
        dominant frequency (the reference asserts spectral similarity, not
        waveform SNR, tests/features/test_stft.py:177-204)."""
        x = sine(440.0)
        spec = stft_power(jnp.asarray(x), n_fft=N_FFT, hop_length=HOP,
                          center=True, power=2.0)
        fb = mel_filterbank(SR, N_FFT, n_mels=64, f_min=0.0, f_max=8000.0,
                            htk=True, norm=None)
        mel = spec @ fb
        rec = reconstruct_audio(mel, sample_rate=SR, n_fft=N_FFT,
                                hop_length=HOP, length=len(x),
                                f_max=8000.0, n_iter=48)
        # dominant frequency of the reconstruction
        spec_r = np.abs(np.fft.rfft(np.asarray(rec)))
        freq_r = np.fft.rfftfreq(len(x), 1 / SR)[np.argmax(spec_r)]
        assert abs(freq_r - 440.0) < 30.0, f"dominant {freq_r:.1f} Hz"

    def test_mel_to_linear_shapes(self, rng):
        mel = jnp.asarray(rng.uniform(0, 1, (10, 64)).astype(np.float32))
        lin = mel_to_linear(mel, sample_rate=SR, n_fft=N_FFT, n_mels=64,
                            htk=True, norm=None)
        assert lin.shape == (10, N_FFT // 2 + 1)
        assert float(lin.min()) >= 0.0

    def test_jit_compiles(self):
        x = sine(dur=0.25)
        mag = jnp.sqrt(stft_power(jnp.asarray(x), n_fft=N_FFT,
                                  hop_length=HOP, center=True, power=2.0))
        f = jax.jit(lambda m: griffin_lim(m, n_fft=N_FFT, hop_length=HOP,
                                          length=len(x), n_iter=4))
        out = f(mag)
        assert out.shape == (len(x),)
        assert np.isfinite(np.asarray(out)).all()


class TestSnr:
    def test_identical_is_huge(self):
        x = jnp.asarray(sine())
        assert float(compute_reconstruction_snr(x, x)) > 100.0

    def test_noise_lowers_snr(self, rng):
        x = sine()
        noisy = x + 0.5 * rng.standard_normal(len(x)).astype(np.float32)
        snr = float(compute_reconstruction_snr(jnp.asarray(x),
                                               jnp.asarray(noisy)))
        assert snr < 3.0


class TestValidateParams:
    def test_valid_config(self):
        r = validate_mel_parameters(16000, 1024, 80, 80.0, 8000.0, 30.0)
        assert r["valid"]

    def test_fmax_above_nyquist(self):
        r = validate_mel_parameters(16000, 1024, 80, 80.0, 9000.0, 30.0)
        assert not r["valid"]

    def test_fmin_above_fmax(self):
        r = validate_mel_parameters(16000, 1024, 80, 8000.0, 80.0, 30.0)
        assert not r["valid"]

    def test_too_many_mels_errors(self):
        r = validate_mel_parameters(16000, 64, 80, 0.0, 8000.0, 30.0)
        assert not r["valid"]

    def test_empty_filter_warning(self):
        with pytest.warns(UserWarning):
            r = validate_mel_parameters(16000, 256, 120, 0.0, 8000.0, 30.0)
        assert any("empty" in w for w in r["warnings"])
