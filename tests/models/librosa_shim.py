"""Minimal NumPy implementation of the librosa surface the reference
model imports (librosa itself is not installed in this image).

Implemented from the published librosa semantics — NOT from this repo's
JAX ops — so the end-to-end parity test (test_e2e_reference_parity.py)
compares two independent implementations of the same spec:

* ``feature.melspectrogram``: Hann (periodic) window, ``center=True``
  reflect padding, ``np.fft.rfft`` power spectrum, Slaney-scale
  Slaney-normalized triangular mel filterbank.
* ``power_to_db``: ``10 log10(max(S, amin)) - 10 log10(max(ref, amin))``
  with callable ``ref`` support and ``top_db`` flooring.

Functions the reference imports but the parity test never executes
(`yin`, `zero_crossing_rate`, ...) raise if called, so accidental use is
loud rather than silently wrong.

Install with :func:`install`, which registers ``librosa`` and
``librosa.feature`` in ``sys.modules`` before the reference modules are
imported.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _hann(n: int) -> np.ndarray:
    # scipy.signal.get_window('hann', n, fftbins=True)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float64)


def _hz_to_mel_slaney(f):
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_t = f >= min_log_hz
    mel = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10)
                                               / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asanyarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_t = m >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                    fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') -> (n_mels, bins)."""
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float64)


def melspectrogram(*, y: np.ndarray, sr: int, n_fft: int, hop_length: int,
                   n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """Power mel spectrogram, (n_mels, T)."""
    if fmax is None:
        fmax = sr / 2.0
    y = np.asarray(y, dtype=np.float64)
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop_length
    window = _hann(n_fft)
    frames = np.stack([yp[i * hop_length: i * hop_length + n_fft]
                       for i in range(n_frames)])
    spec = np.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)            # (T, bins)
    fb = _mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (mels, bins)
    return (power @ fb.T).T                              # (mels, T)


def power_to_db(S, ref=1.0, amin: float = 1e-10,
                top_db: float = 80.0) -> np.ndarray:
    S = np.asarray(S, dtype=np.float64)
    ref_value = np.abs(ref(S)) if callable(ref) else np.abs(ref)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def _unimplemented(name):
    def fn(*args, **kwargs):
        raise NotImplementedError(
            f"librosa shim: {name} is not implemented (the parity test "
            "is not supposed to reach it)")

    fn.__name__ = name
    return fn


def install() -> types.ModuleType:
    """Register the shim as ``librosa`` in sys.modules (idempotent)."""
    if "librosa" in sys.modules and getattr(
            sys.modules["librosa"], "__is_koemorph_shim__", False):
        return sys.modules["librosa"]

    librosa = types.ModuleType("librosa")
    librosa.__is_koemorph_shim__ = True
    feature = types.ModuleType("librosa.feature")
    feature.melspectrogram = melspectrogram
    for name in ("zero_crossing_rate", "spectral_centroid", "rms", "mfcc"):
        setattr(feature, name, _unimplemented(f"feature.{name}"))
    librosa.feature = feature
    librosa.power_to_db = power_to_db
    librosa.yin = _unimplemented("yin")
    librosa.pyin = _unimplemented("pyin")
    librosa.resample = _unimplemented("resample")
    util = types.ModuleType("librosa.util")
    librosa.util = util
    filters = types.ModuleType("librosa.filters")
    filters.mel = lambda *, sr, n_fft, n_mels=128, fmin=0.0, fmax=None: (
        _mel_filterbank(sr, n_fft, n_mels, fmin,
                        fmax if fmax is not None else sr / 2.0))
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.feature"] = feature
    sys.modules["librosa.util"] = util
    sys.modules["librosa.filters"] = filters
    return librosa
