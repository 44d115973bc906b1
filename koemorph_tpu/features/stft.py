"""Reference-named batch mel extractor API.

Parity target: reference src/features/stft.py:23 (MelSpectrogramExtractor,
torchaudio-style log-mel at the target fps, padded/truncated to
``duration * fps`` frames) and :176 (InverseMelSpectrogram, Griffin-Lim
reconstruction for tests). The DSP lives in :mod:`koemorph_tpu.ops`
(device-side jnp/MXU); these classes provide the reference's class-based
surface so code written against the reference imports unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from koemorph_tpu.ops.frontend import LogMelFrontend, log_mel_spectrogram
from koemorph_tpu.ops.reconstruct import (
    compute_reconstruction_snr,
    griffin_lim,
    mel_to_linear,
    validate_mel_parameters,
)

__all__ = ["MelSpectrogramExtractor", "InverseMelSpectrogram",
           "compute_reconstruction_snr", "validate_mel_parameters"]


class MelSpectrogramExtractor:
    """Audio (B, L) or (L,) -> log-mel (B, T, n_mels) at ``target_fps``.

    Matches reference src/features/stft.py:23-145: torchaudio-style mel
    (HTK scale, normalized window), ``log(mel + eps)``, frames
    padded/truncated to ``len(audio)/sr * fps``.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        target_fps: float = 30.0,
        n_fft: int = 512,
        n_mels: int = 80,
        f_min: float = 80.0,
        f_max: Optional[float] = None,
        power: float = 2.0,
        normalized: bool = True,
        center: bool = True,
        pad_mode: str = "reflect",
        eps: float = 1e-8,
    ):
        if power != 2.0:
            raise ValueError("only power=2.0 is supported (the reference "
                             "default; magnitude mel was unused)")
        if pad_mode != "reflect" or not center or not normalized:
            raise ValueError("only the reference defaults center=True, "
                             "pad_mode='reflect', normalized=True are "
                             "supported")
        hop = int(sample_rate / target_fps)
        if hop <= 0:
            raise ValueError(
                f"Invalid hop_length {hop} for sr={sample_rate}, "
                f"fps={target_fps}")
        self.cfg = LogMelFrontend(
            sample_rate=sample_rate, target_fps=float(target_fps),
            n_fft=n_fft, n_mels=n_mels, f_min=f_min,
            f_max=f_max if f_max is not None else sample_rate / 2.0,
            style="torchaudio", eps=eps)
        self.sample_rate = sample_rate
        self.target_fps = target_fps
        self.n_fft = n_fft
        self.n_mels = n_mels
        self.hop_length = hop

    def __call__(self, waveform) -> jnp.ndarray:
        x = jnp.asarray(waveform)
        if x.ndim == 1:
            x = x[None]
        if x.ndim != 2:
            raise ValueError(f"Expected 1D or 2D input, got {x.ndim}D")
        return log_mel_spectrogram(x, self.cfg)

    # reference helper (stft.py:146-173)
    def get_output_length(self, input_length: int) -> int:
        return int(input_length / self.sample_rate * self.target_fps)


class InverseMelSpectrogram:
    """Log-mel (B, T, n_mels) -> waveform via pseudo-inverse mel +
    Griffin-Lim (reference src/features/stft.py:176-249; reconstruction
    quality checks, not production audio).

    Accepts either the reference calling convention —
    ``InverseMelSpectrogram(mel_extractor, n_iter=32)`` (stft.py:183-204)
    — or explicit DSP parameters.
    """

    def __init__(
        self,
        mel_extractor: Optional[MelSpectrogramExtractor] = None,
        *,
        sample_rate: int = 16000,
        target_fps: float = 30.0,
        n_fft: int = 512,
        n_mels: int = 80,
        f_min: float = 80.0,
        f_max: Optional[float] = None,
        n_iter: int = 32,
        momentum: float = 0.99,
        length: Optional[int] = None,
        eps: float = 1e-8,
    ):
        if mel_extractor is not None:
            # reference signature: derive everything from the extractor
            self.cfg = mel_extractor.cfg
            eps = mel_extractor.cfg.eps
        else:
            self.cfg = LogMelFrontend(
                sample_rate=sample_rate, target_fps=float(target_fps),
                n_fft=n_fft, n_mels=n_mels, f_min=f_min,
                f_max=f_max if f_max is not None else sample_rate / 2.0,
                style="torchaudio", eps=eps)
        self.n_iter = n_iter
        self.momentum = momentum
        self.length = length
        self.eps = eps

    def __call__(self, log_mel) -> jnp.ndarray:
        from koemorph_tpu.ops.window import hann_window

        mel_power = jnp.maximum(jnp.exp(jnp.asarray(log_mel)) - self.eps,
                                0.0)
        cfg = self.cfg
        linear = mel_to_linear(
            mel_power, sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
            n_mels=cfg.n_mels, f_min=cfg.f_min,
            f_max=cfg.effective_f_max)
        magnitude = jnp.sqrt(jnp.maximum(linear, 0.0))
        # analysis ran with torchaudio normalized=True (spectrum divided
        # by ||window||); undo it so Griffin-Lim sees physical magnitudes
        w = hann_window(cfg.n_fft)
        magnitude = magnitude * jnp.sqrt(jnp.sum(w * w))
        length = self.length or mel_power.shape[-2] * cfg.hop_length
        return griffin_lim(magnitude, n_fft=cfg.n_fft,
                           hop_length=cfg.hop_length, length=length,
                           n_iter=self.n_iter, momentum=self.momentum)
