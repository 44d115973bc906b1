"""Golden tests for the STFT/mel frontend.

Cross-validates the matmul-DFT spectrogram against two independent
implementations available in the image: ``numpy.fft.rfft`` and ``torch.stft``
(torch's STFT is the same C++ kernel torchaudio wraps, so this pins the
legacy-frontend math). Mel filterbank checks are property-based against the
published Slaney/HTK formulas.

Mirrors the intent of reference tests/features/test_stft.py (shape-vs-fps,
output-length math, grad flow, parameter validation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from koemorph_tpu.ops import (
    LogMelFrontend,
    dft_matrices,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    mel_with_temporal_detail,
    num_frames,
    power_to_db,
    stft_power,
)

SR = 16000


class TestFraming:
    def test_num_frames_centered(self):
        # librosa: 1 + L // hop for center=True
        assert num_frames(136448, 1024, 533) == 1 + 136448 // 533

    def test_frame_shapes(self, dummy_audio):
        frames = frame_signal(jnp.asarray(dummy_audio), 1024, 533)
        assert frames.shape == (1 + len(dummy_audio) // 533, 1024)

    def test_frame_content_matches_reflect_pad(self, dummy_audio):
        frames = np.asarray(frame_signal(jnp.asarray(dummy_audio), 512, 160))
        padded = np.pad(dummy_audio, 256, mode="reflect")
        np.testing.assert_allclose(frames[3], padded[3 * 160 : 3 * 160 + 512])

    def test_batched_framing(self, dummy_audio_batch):
        frames = frame_signal(jnp.asarray(dummy_audio_batch), 1024, 533)
        assert frames.shape[0] == 2 and frames.ndim == 3


class TestDFT:
    def test_matmul_dft_equals_numpy_rfft(self, rng):
        x = rng.standard_normal((4, 256)).astype(np.float32)
        c, s = dft_matrices(256)
        got = np.asarray(x @ np.asarray(c)) + 1j * np.asarray(x @ np.asarray(s))
        want = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestStftPower:
    @pytest.mark.parametrize("method", ["matmul", "rfft"])
    def test_against_torch_stft(self, dummy_audio, method):
        n_fft, hop = 512, 533
        got = np.asarray(
            stft_power(jnp.asarray(dummy_audio), n_fft=n_fft, hop_length=hop,
                       method=method)
        )
        ref = torch.stft(
            torch.from_numpy(dummy_audio), n_fft=n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
            return_complex=True,
        )
        ref_power = (ref.abs() ** 2).numpy().T  # (T, bins)
        assert got.shape == ref_power.shape
        np.testing.assert_allclose(got, ref_power, rtol=1e-3, atol=1e-3)

    def test_normalized_stft(self, dummy_audio):
        n_fft = 512
        w = np.asarray(hann_window(n_fft))
        plain = np.asarray(
            stft_power(jnp.asarray(dummy_audio), n_fft=n_fft, hop_length=533)
        )
        norm = np.asarray(
            stft_power(jnp.asarray(dummy_audio), n_fft=n_fft, hop_length=533,
                       normalized=True)
        )
        np.testing.assert_allclose(norm * (w * w).sum(), plain, rtol=1e-5)

    def test_sine_peak_bin(self):
        freq, n_fft = 1000.0, 1024
        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        spec = np.asarray(
            stft_power(jnp.asarray(x), n_fft=n_fft, hop_length=533)
        )
        peak_bin = spec[5].argmax()
        assert abs(peak_bin * SR / n_fft - freq) < SR / n_fft * 1.5


class TestMelFilterbank:
    def test_shape(self):
        fb = mel_filterbank(SR, 1024, 80, 80.0, 8000.0)
        assert fb.shape == (513, 80)

    def test_triangles_nonnegative_and_bounded(self):
        fb = np.asarray(mel_filterbank(SR, 1024, 80, 80.0, 8000.0))
        assert (fb >= 0).all()
        # each filter has one contiguous support region
        for m in range(80):
            nz = np.flatnonzero(fb[:, m] > 0)
            assert len(nz) > 0
            assert (np.diff(nz) == 1).all()

    def test_slaney_norm_area(self):
        # Slaney norm scales each triangle by 2 / bandwidth_hz so that the
        # *continuous* triangle integrates to 1; the discrete sum approximates
        # (n_bins-1)/(sr/2) * 1 ~ the bin density.
        fb = np.asarray(mel_filterbank(SR, 1024, 80, 80.0, 8000.0))
        density = 512 / (SR / 2)
        sums = fb.sum(axis=0)
        assert np.all(sums > 0.5 * density) and np.all(sums < 2.0 * density)

    def test_htk_differs_from_slaney(self):
        a = np.asarray(mel_filterbank(SR, 512, 80, 80.0, 8000.0))
        b = np.asarray(mel_filterbank(SR, 512, 80, 80.0, 8000.0, htk=True,
                                      norm=None))
        assert not np.allclose(a, b)

    def test_peak_frequencies_monotonic(self):
        fb = np.asarray(mel_filterbank(SR, 1024, 40, 80.0, 8000.0))
        peaks = fb.argmax(axis=0)
        assert (np.diff(peaks) >= 0).all()


class TestPowerToDb:
    def test_ref_max_top_db(self, rng):
        s = rng.uniform(1e-6, 1.0, size=(80, 100)).astype(np.float32)
        got = np.asarray(power_to_db(jnp.asarray(s), ref="max", top_db=80.0))
        want = 10 * np.log10(np.maximum(s, 1e-10))
        want = want - 10 * np.log10(np.maximum(s.max(), 1e-10))
        want = np.maximum(want, want.max() - 80.0)
        # f32 log10 on device vs f64 numpy
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
        assert got.max() == pytest.approx(0.0, abs=1e-6)
        assert got.min() >= -80.0 - 1e-6

    def test_batched_ref_axes(self, rng):
        s = rng.uniform(1e-6, 1.0, size=(2, 80, 50)).astype(np.float32)
        got = np.asarray(
            power_to_db(jnp.asarray(s), ref="max", top_db=80.0,
                        ref_axes=(-2, -1))
        )
        for b in range(2):
            want = np.asarray(power_to_db(jnp.asarray(s[b]), ref="max",
                                          top_db=80.0))
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


class TestLibrosaFrontend:
    CFG = LogMelFrontend(style="librosa")

    def test_output_shape_and_range(self, dummy_audio):
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(dummy_audio), self.CFG))
        assert mel.shape == (1 + len(dummy_audio) // 533, 80)
        assert mel.min() >= 0.0 - 1e-6 and mel.max() <= 1.0 + 1e-6
        assert mel.max() == pytest.approx(1.0, abs=1e-5)  # ref=max -> peak at 1

    def test_temporal_detail(self, dummy_audio_batch):
        mel, detail = mel_with_temporal_detail(
            jnp.asarray(dummy_audio_batch), self.CFG
        )
        assert detail.shape == (2, 3, 80)
        np.testing.assert_allclose(np.asarray(mel)[:, -3:, :],
                                   np.asarray(detail))

    def test_batch_independent_normalization(self, dummy_audio):
        quiet = dummy_audio * 0.01
        batch = jnp.asarray(np.stack([dummy_audio, quiet]))
        mel = np.asarray(log_mel_spectrogram(batch, self.CFG))
        # each sample normalized by its own max -> both peak at 1
        assert mel[0].max() == pytest.approx(1.0, abs=1e-5)
        assert mel[1].max() == pytest.approx(1.0, abs=1e-5)

    def test_jit_and_grad(self, dummy_audio):
        cfg = self.CFG

        @jax.jit
        def f(x):
            return log_mel_spectrogram(x, cfg).sum()

        g = jax.grad(f)(jnp.asarray(dummy_audio))
        assert g.shape == dummy_audio.shape
        assert np.isfinite(np.asarray(g)).all()

    def test_60fps_hop(self):
        cfg = LogMelFrontend(target_fps=60.0)
        assert cfg.hop_length == 266


class TestTorchaudioFrontend:
    CFG = LogMelFrontend(style="torchaudio", n_fft=512, f_max=None)

    def test_output_length_matches_duration_fps(self, dummy_audio):
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(dummy_audio), self.CFG))
        expected = int(len(dummy_audio) / SR * 30.0)
        assert mel.shape == (expected, 80)

    def test_pad_with_last_frame(self):
        # short audio -> fewer natural frames than duration*fps after trim
        cfg = LogMelFrontend(style="torchaudio", n_fft=512, f_max=None,
                             target_fps=100.0)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal(SR // 2).astype(np.float32))
        mel = log_mel_spectrogram(x, cfg)
        assert mel.shape[0] == int(0.5 * 100.0)


class TestFpsShapes:
    @pytest.mark.parametrize("fps,secs", [(30, 1.0), (30, 2.0), (60, 1.0)])
    def test_frame_count_tracks_fps(self, fps, secs):
        cfg = LogMelFrontend(target_fps=float(fps))
        x = jnp.zeros(int(SR * secs), dtype=jnp.float32)
        mel = log_mel_spectrogram(x, cfg)
        assert abs(mel.shape[0] - secs * fps) <= 2
