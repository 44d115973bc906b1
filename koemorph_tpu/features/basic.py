"""Minimal 9-D prosodic emotion features, on device.

Parity target: reference src/features/emotion_extractor.py:503-545
(_extract_basic): [energy, zcr, spectral_centroid, f0_mean, f0_std,
mean, std, max, min] of the clip. The librosa host calls become jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.f0 import yin_f0
from koemorph_tpu.ops.window import frame_signal, hann_window

BASIC_DIM = 9


def basic_emotion_features(audio: jnp.ndarray,
                           sample_rate: int = 16000) -> jnp.ndarray:
    """9-D basic prosodic features of ``audio (..., L)`` -> ``(..., 9)``."""
    energy = jnp.mean(audio * audio, axis=-1)

    # zero-crossing rate (librosa frame convention approximated globally)
    sign = jnp.sign(audio)
    crossings = jnp.abs(sign[..., 1:] - sign[..., :-1]) > 0
    zcr = jnp.mean(crossings.astype(jnp.float32), axis=-1)

    # spectral centroid over 2048-sample frames
    n_fft = 2048
    frames = frame_signal(audio, n_fft, 512, center=True)
    spec = jnp.abs(jnp.fft.rfft(frames * hann_window(n_fft), axis=-1))
    freqs = jnp.asarray(
        np.linspace(0, sample_rate / 2, n_fft // 2 + 1, dtype=np.float32))
    centroid = (jnp.sum(spec * freqs, axis=-1)
                / (jnp.sum(spec, axis=-1) + 1e-10)).mean(axis=-1)

    # F0 stats over voiced frames (librosa.yin fmin=50 fmax=400 equivalent)
    res = yin_f0(audio, sample_rate=sample_rate, f0_min=50.0, f0_max=400.0)
    voiced = res.voiced_flag.astype(jnp.float32)
    denom = jnp.sum(voiced, axis=-1) + 1e-8
    f0_mean = jnp.sum(res.f0_hz * voiced, axis=-1) / denom
    f0_var = jnp.sum((res.f0_hz - f0_mean[..., None]) ** 2 * voiced,
                     axis=-1) / denom
    f0_std = jnp.sqrt(jnp.maximum(f0_var, 0.0))

    return jnp.stack(
        [energy, zcr, centroid, f0_mean, f0_std,
         jnp.mean(audio, axis=-1), jnp.std(audio, axis=-1),
         jnp.max(audio, axis=-1), jnp.min(audio, axis=-1)],
        axis=-1,
    )
