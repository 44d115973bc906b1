"""Log-mel frontends with KoeMorph-compatible semantics.

Two named parameterizations exist in the reference and both are kept:

- **librosa-style** (production; reference
  src/model/simplified_dual_stream_model.py:184-216): n_fft=1024,
  hop=int(sr/fps), Slaney mel with fmin=80/fmax=8000, ``power_to_db`` with a
  per-utterance ``ref=max``, ``top_db=80``, then ``(db+80)/80``. The model
  consumes the long-term (T, 80) window plus the last 3 frames as a
  short-term detail tensor.
- **torchaudio-style** (legacy; reference src/features/stft.py:23-142):
  n_fft=512, window-normalized STFT, HTK mel without Slaney norm,
  ``log(mel + 1e-8)``, padded/truncated to ``duration * fps`` frames.

Everything is a pure static-shape function of the audio; batching comes from
leading axes (vmap-free broadcasting), so frontends compose into the jitted
training / streaming step.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp

from koemorph_tpu.ops.mel import (
    mel_filterbank,
    normalize_log_mel,
    power_to_db,
)
from koemorph_tpu.ops.stft import stft_power


@dataclasses.dataclass(frozen=True)
class LogMelFrontend:
    """Static configuration for a log-mel frontend.

    Instances are hashable and usable as jit static arguments.
    """

    sample_rate: int = 16000
    target_fps: float = 30.0
    n_fft: int = 1024
    n_mels: int = 80
    f_min: float = 80.0
    f_max: float | None = 8000.0
    style: Literal["librosa", "torchaudio"] = "librosa"
    # "matmul" is the measured-fastest TPU path at every shape the models
    # run (XLA fuses the window/power/dB elementwise chain into the DFT
    # GEMMs; the fused Pallas kernel in ops/pallas loses 1.2-2.9x at the
    # flagship shapes because its lane padding and fixed 128-frame tiling
    # outweigh the small HBM intermediate it avoids — measured v5e
    # numbers in docs/performance.md). The kernel remains available as
    # ops.pallas.fused_log_mel_frontend for direct callers.
    stft_method: str = "matmul"   # matmul | rfft
    eps: float = 1e-8

    @property
    def hop_length(self) -> int:
        # int(sr / fps): 533 @ 30 fps, 266 @ 60 fps (reference
        # src/model/simplified_dual_stream_model.py:54).
        return int(self.sample_rate / self.target_fps)

    @property
    def effective_f_max(self) -> float:
        return self.f_max if self.f_max is not None else self.sample_rate / 2.0

    def filterbank(self, dtype=jnp.float32) -> jnp.ndarray:
        htk = self.style == "torchaudio"
        norm = None if htk else "slaney"
        return mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, self.f_min,
            self.effective_f_max, htk=htk, norm=norm, dtype=dtype,
        )

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        return log_mel_spectrogram(audio, self)


def log_mel_spectrogram(audio: jnp.ndarray, cfg: LogMelFrontend) -> jnp.ndarray:
    """Log-mel spectrogram ``(..., T, n_mels)`` of ``audio (..., L)``.

    librosa style: normalized to ~[0, 1] via per-utterance ``ref=max``.
    torchaudio style: natural-log mel, padded/truncated to
    ``int(L / sr * fps)`` frames.
    """
    if cfg.stft_method == "pallas":
        raise ValueError(
            "stft_method='pallas' was removed from the model path: the "
            "XLA matmul path measured 1.2-2.9x faster at every flagship "
            "shape on v5e (docs/performance.md). Call "
            "ops.pallas.fused_log_mel_frontend directly if you need the "
            "fused kernel.")

    spec = stft_power(
        audio,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        center=True,
        power=2.0,
        normalized=cfg.style == "torchaudio",
        method=cfg.stft_method,
    )  # (..., T, n_bins)
    mel = jnp.matmul(spec, cfg.filterbank(dtype=spec.dtype),
                     precision="highest")  # (..., T, n_mels)

    if cfg.style == "librosa":
        # per-sample ref=max over the (T, n_mels) trailing axes
        mel_db = power_to_db(mel, ref="max", top_db=80.0,
                             ref_axes=(-2, -1))
        return normalize_log_mel(mel_db)

    # torchaudio style: log(mel + eps), then pad/trim to duration * fps
    log_mel = jnp.log(mel + cfg.eps)
    expected = int(audio.shape[-1] / cfg.sample_rate * cfg.target_fps)
    t = log_mel.shape[-2]
    if t > expected:
        log_mel = log_mel[..., :expected, :]
    elif t < expected:
        last = log_mel[..., -1:, :]
        reps = [1] * (log_mel.ndim - 2) + [expected - t, 1]
        log_mel = jnp.concatenate([log_mel, jnp.tile(last, reps)], axis=-2)
    return log_mel


def mel_with_temporal_detail(
    audio: jnp.ndarray, cfg: LogMelFrontend
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Long-term mel + short-term 3-frame detail, KoeMorph production shape.

    Returns ``(mel (..., T, 80), detail (..., 3, 80))`` where ``detail`` is
    the last 3 frames of the full spectrogram — taken *before* any
    truncation to the model's 256-frame context, matching the reference
    (src/model/simplified_dual_stream_model.py:205-214).
    """
    mel = log_mel_spectrogram(audio, cfg)
    detail = mel[..., -3:, :]
    return mel, detail
