"""Mel filterbanks and log scaling, librosa- and torchaudio-compatible.

The filterbank is a precomputed constant matrix, so the mel projection is one
more matmul fused behind the DFT matmuls — the whole mel frontend compiles to
three GEMMs + elementwise ops on the MXU/VPU.

Replaces: librosa.filters.mel + librosa.power_to_db (reference
src/model/simplified_dual_stream_model.py:188-200), torchaudio MelScale
(reference src/features/stft.py:84-99).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hz_to_mel(freq, *, htk: bool = False):
    """Convert Hz to mels. Slaney (librosa default) or HTK (torchaudio)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, *, htk: bool = False):
    """Convert mels to Hz (inverse of :func:`hz_to_mel`)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    htk: bool,
    norm: str | None,
) -> np.ndarray:
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_min = hz_to_mel(f_min, htk=htk)
    mel_max = hz_to_mel(f_max, htk=htk)
    mel_pts = mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk=htk)

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_bins)

    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
        fb = fb * enorm[:, None]
    elif norm is not None:  # pragma: no cover - defensive
        raise ValueError(f"Unsupported mel norm: {norm!r}")

    return fb.astype(np.float32)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float | None = None,
    *,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Triangular mel filterbank of shape ``(n_fft // 2 + 1, n_mels)``.

    Defaults (``htk=False, norm='slaney'``) match ``librosa.filters.mel``;
    ``htk=True, norm=None`` matches ``torchaudio.transforms.MelScale``.
    The matrix is returned bins-major so the mel projection is
    ``power_spectrogram @ fb``.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    fb = _mel_filterbank_np(
        int(sample_rate), int(n_fft), int(n_mels), float(f_min), float(f_max),
        bool(htk), norm,
    )
    return jnp.asarray(fb.T, dtype=dtype)


def power_to_db(
    s: jnp.ndarray,
    *,
    ref: jnp.ndarray | float | str = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    ref_axes: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """``librosa.power_to_db`` semantics in jnp.

    Args:
        s: power spectrogram.
        ref: reference power; the string ``"max"`` uses the max over
            ``ref_axes`` (default: all axes), matching
            ``librosa.power_to_db(S, ref=np.max)`` per utterance.
        amin: floor for numerical stability.
        top_db: clip output to ``[max - top_db, max]`` (librosa default 80).
        ref_axes: axes over which "max" and the top_db clip are computed;
            pass per-sample axes when batching.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(s, amin))
    if isinstance(ref, str):
        if ref != "max":  # pragma: no cover - defensive
            raise ValueError(f"Unsupported ref: {ref!r}")
        ref_val = jnp.max(s, axis=ref_axes, keepdims=ref_axes is not None)
    else:
        ref_val = jnp.asarray(ref)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(ref_val, amin))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=ref_axes, keepdims=ref_axes is not None)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def normalize_log_mel(mel_db: jnp.ndarray) -> jnp.ndarray:
    """KoeMorph's ``(db + 80) / 80`` normalization to ~[0, 1].

    Applied after ``power_to_db(ref=max, top_db=80)``
    (reference: src/model/simplified_dual_stream_model.py:199-200).
    """
    return (mel_db + 80.0) / 80.0
