"""On-device F0 estimation (YIN with cumulative-mean normalization).

Replaces librosa.yin / librosa.pyin host calls (reference
src/features/prosody.py:118-126, src/features/emotion_extractor.py:521).

The difference function is computed in O(N log N) per frame via the
autocorrelation identity
``d(tau) = r(0) + r_tau(tau) - 2 c(tau)`` where ``c`` is the frame
autocorrelation (rFFT) and ``r_tau`` comes from a cumulative sum of squares,
so the whole extractor is static-shape jnp: framing -> batched rFFT ->
elementwise -> argmin with threshold, plus parabolic interpolation. Voicing
probability is derived from the CMNDF minimum (soft version of pyin's
voiced flag).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.window import frame_signal


class F0Result(NamedTuple):
    f0_hz: jnp.ndarray        # (..., T) — 0 where unvoiced
    voiced_prob: jnp.ndarray  # (..., T) in [0, 1]
    voiced_flag: jnp.ndarray  # (..., T) bool


@functools.lru_cache(maxsize=16)
def _tau_range(sample_rate: int, f0_min: float, f0_max: float
               ) -> tuple[int, int]:
    tau_min = max(int(sample_rate / f0_max), 1)
    tau_max = int(np.ceil(sample_rate / f0_min))
    return tau_min, tau_max


def yin_frame_difference(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """YIN difference function d(tau) for tau in [0, tau_max].

    Args:
        frames: (..., T, N) windowed signal frames; the correlation window is
            ``W = N - tau_max``.

    Returns:
        (..., T, tau_max + 1) difference values.
    """
    n = frames.shape[-1]
    w = n - tau_max
    if w <= 0:
        raise ValueError(f"frame length {n} must exceed tau_max {tau_max}")

    # autocorrelation c(tau) = sum_j x_j x_{j+tau} over the full frame,
    # restricted to j < W via the 'smart' YIN trick: compute full-frame
    # autocorr of x and of the tail, then combine with cumulative energies.
    # Autocorrelations run as MXU matmuls (Wiener-Khinchin) — TPU has no
    # native FFT and XLA's FFT lowering is ~100x slower at these sizes.
    from koemorph_tpu.ops.stft import autocorr_matmul

    acf_full = autocorr_matmul(frames, tau_max + 1)
    # subtract the contribution of j >= W: sum_{j=W}^{n-1-tau} x_j x_{j+tau}
    tail = frames[..., w:]
    acf_tail = autocorr_matmul(tail, tau_max + 1)
    c = acf_full - acf_tail  # c(tau) = sum_{j=0}^{W-1} x_j x_{j+tau}

    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    r0 = csum[..., w - 1 : w]                      # sum_{j<W} x_j^2
    # r_tau = sum_{j<W} x_{j+tau}^2 = csum[tau+W-1] - csum[tau-1]
    idx_hi = jnp.arange(tau_max + 1) + w - 1
    hi = jnp.take(csum, idx_hi, axis=-1)
    lo = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]),
         jnp.take(csum, jnp.arange(tau_max), axis=-1)], axis=-1)
    r_tau = hi - lo

    d = r0 + r_tau - 2.0 * c
    return jnp.maximum(d, 0.0)


def cmndf(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function d'(tau)."""
    tau = jnp.arange(d.shape[-1], dtype=d.dtype)
    cum = jnp.cumsum(d, axis=-1)
    out = d * tau / jnp.maximum(cum, 1e-12)
    return out.at[..., 0].set(1.0)


def yin_f0(
    audio: jnp.ndarray,
    *,
    sample_rate: int = 16000,
    frame_length: int = 1024,
    hop_length: int = 160,
    f0_min: float = 50.0,
    f0_max: float = 400.0,
    threshold: float = 0.15,
    center: bool = True,
) -> F0Result:
    """Per-frame F0 of ``audio (..., L)`` -> (..., T) Hz.

    Frames with CMNDF minimum above ~3x threshold are marked unvoiced with
    f0 = 0 (librosa.pyin ``fill_na=0`` semantics).
    """
    tau_min, tau_max = _tau_range(sample_rate, f0_min, f0_max)
    if frame_length <= tau_max + 8:
        raise ValueError(
            f"frame_length {frame_length} too small for f0_min {f0_min} "
            f"(needs > {tau_max + 8})")

    frames = frame_signal(audio, frame_length, hop_length, center=center)
    d = yin_frame_difference(frames, tau_max)
    dprime = cmndf(d)

    # search region [tau_min, tau_max]
    region = dprime[..., tau_min:]
    # YIN pick: the *local minimum* of the first dip below threshold (not the
    # first crossing, which sits on the dip's shoulder); global min fallback.
    nxt = jnp.concatenate(
        [region[..., 1:], jnp.full_like(region[..., :1], jnp.inf)], axis=-1)
    candidate = (region < threshold) & (region <= nxt)
    any_below = jnp.any(candidate, axis=-1, keepdims=True)
    idx = jnp.argmax(candidate, axis=-1)             # first qualifying dip
    idx_min = jnp.argmin(region, axis=-1)            # global min fallback
    pick = jnp.where(any_below[..., 0], idx, idx_min) + tau_min

    # parabolic interpolation around pick
    def gather(x, i):
        return jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]

    tau_max_idx = dprime.shape[-1] - 1
    i0 = jnp.clip(pick - 1, 0, tau_max_idx)
    i2 = jnp.clip(pick + 1, 0, tau_max_idx)
    y0, y1, y2 = (gather(dprime, i0), gather(dprime, pick),
                  gather(dprime, i2))
    denom = y0 - 2 * y1 + y2
    offset = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-12,
                                                   denom, 1.0),
                       0.0)
    offset = jnp.clip(offset, -1.0, 1.0)
    tau_refined = pick.astype(jnp.float32) + offset

    f0 = sample_rate / jnp.maximum(tau_refined, 1.0)
    dp_min = gather(dprime, pick)
    # energy gate: silent frames have a degenerate (all-zero) difference
    # function that would otherwise read as perfectly periodic
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    has_energy = rms > 1e-4
    voiced_prob = jnp.clip(1.0 - dp_min / (3.0 * threshold), 0.0, 1.0)
    voiced_prob = jnp.where(has_energy, voiced_prob, 0.0)
    voiced = (dp_min < 3.0 * threshold) & has_energy
    f0 = jnp.where(voiced, f0, 0.0)
    f0 = jnp.where((f0 >= f0_min * 0.9) & (f0 <= f0_max * 1.1), f0, 0.0)
    voiced = voiced & (f0 > 0)
    return F0Result(f0_hz=f0, voiced_prob=voiced_prob, voiced_flag=voiced)
