"""On-device prosodic features: F0, log energy, VAD, voicing -> (..., T, 4).

Parity target: reference src/features/prosody.py (ProsodyExtractor /
ProsodyNormalizer): pre-emphasis, PYIN-style F0, RMS log-energy,
energy-threshold VAD with median smoothing, unvoiced-F0 interpolation, and
linear resampling to the target fps. All static-shape jnp — the reference's
per-sample host loop (prosody.py:101-110) disappears.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from koemorph_tpu.ops.f0 import yin_f0
from koemorph_tpu.ops.window import frame_signal


def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """First-order pre-emphasis filter y[n] = x[n] - coeff * x[n-1]."""
    return jnp.concatenate(
        [x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def median3(x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Median filter along the last axis with odd kernel ``k`` (edge-padded)."""
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    stacked = jnp.stack([xp[..., i : i + x.shape[-1]] for i in range(k)],
                        axis=0)
    return jnp.median(stacked, axis=0)


def interpolate_unvoiced(f0: jnp.ndarray, voiced: jnp.ndarray) -> jnp.ndarray:
    """Linearly interpolate F0 across unvoiced gaps *between* voiced frames
    (edges keep their original values), vectorized over time.

    Mirrors reference prosody.py:205-235 semantics.
    """
    t = f0.shape[-1]
    idx = jnp.arange(t, dtype=f0.dtype)
    big = jnp.asarray(t + 1, f0.dtype)

    # nearest voiced index to the left (running max of voiced positions)
    left_pos = jnp.where(voiced, idx, -1.0)
    left_pos = jax.lax.associative_scan(jnp.maximum, left_pos, axis=-1)
    # nearest voiced index to the right (running min, reversed)
    right_pos = jnp.where(voiced, idx, big)
    right_pos = jnp.flip(
        jax.lax.associative_scan(
            jnp.minimum, jnp.flip(right_pos, axis=-1), axis=-1),
        axis=-1)

    def take(vals, pos):
        p = jnp.clip(pos, 0, t - 1).astype(jnp.int32)
        return jnp.take_along_axis(vals, p, axis=-1)

    f_left = take(f0, left_pos)
    f_right = take(f0, right_pos)
    span = jnp.maximum(right_pos - left_pos, 1.0)
    w = (idx - left_pos) / span
    interp = f_left * (1 - w) + f_right * w

    interior = (left_pos >= 0) & (right_pos <= t - 1) & (~voiced)
    return jnp.where(interior, interp, f0)


@dataclasses.dataclass(frozen=True)
class ProsodyConfig:
    sample_rate: int = 16000
    target_fps: float = 30.0
    frame_length: float = 0.025   # analysis frame (s)
    frame_shift: float = 0.010    # analysis hop (s)
    f0_min: float = 80.0
    f0_max: float = 400.0
    energy_floor: float = 1e-8
    vad_threshold: float = 0.01
    interpolate_unvoiced: bool = True

    @property
    def frame_length_samples(self) -> int:
        return int(self.frame_length * self.sample_rate)

    @property
    def frame_shift_samples(self) -> int:
        return int(self.frame_shift * self.sample_rate)


def extract_prosody(audio: jnp.ndarray,
                    cfg: ProsodyConfig = ProsodyConfig()) -> jnp.ndarray:
    """Prosodic features of ``audio (..., L)`` -> ``(..., T_fps, 4)``
    with columns [F0 Hz, log-energy, VAD, voicing-prob] at the target fps."""
    x = preemphasis(audio)

    # F0 at the analysis hop. YIN needs frame > tau_max (= sr/f0_min = 200
    # samples at 80 Hz); use a 512-sample frame which also matches the
    # 25 ms-ish analysis scale.
    f0_frame = max(512, cfg.frame_length_samples + 1)
    res = yin_f0(
        x, sample_rate=cfg.sample_rate, frame_length=f0_frame,
        hop_length=cfg.frame_shift_samples, f0_min=cfg.f0_min,
        f0_max=cfg.f0_max,
    )
    f0 = res.f0_hz
    voiced_probs = res.voiced_prob

    # log RMS energy on analysis frames (uncentered, librosa.util.frame
    # semantics per the reference)
    frames = frame_signal(x, cfg.frame_length_samples,
                          cfg.frame_shift_samples, center=False)
    energy = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    log_energy = jnp.log(energy + cfg.energy_floor)

    # energy-threshold VAD with min-max normalization + median smoothing
    e_min = jnp.min(log_energy, axis=-1, keepdims=True)
    e_max = jnp.max(log_energy, axis=-1, keepdims=True)
    e_norm = (log_energy - e_min) / (e_max - e_min + 1e-8)
    vad = (e_norm > cfg.vad_threshold).astype(jnp.float32)
    vad = median3(vad, k=5)

    if cfg.interpolate_unvoiced:
        f0 = interpolate_unvoiced(f0, res.voiced_flag)

    # align lengths (uncentered energy framing yields slightly fewer frames)
    t = min(f0.shape[-1], log_energy.shape[-1])
    feats = [f0[..., :t], log_energy[..., :t], vad[..., :t],
             voiced_probs[..., :t]]

    # linear resample from the analysis rate to the target fps
    audio_len = audio.shape[-1]
    n_out = int(audio_len / cfg.sample_rate * cfg.target_fps)
    src_times = jnp.arange(t) * cfg.frame_shift
    dst_times = jnp.arange(n_out) / cfg.target_fps
    out = [
        jnp.apply_along_axis(  # static-shape 1-D interp along time
            lambda row: jnp.interp(dst_times, src_times, row), -1, f
        ) if f.ndim > 1 else jnp.interp(dst_times, src_times, f)
        for f in feats
    ]
    return jnp.stack(out, axis=-1)  # (..., n_out, 4)


def normalize_prosody(
    features: jnp.ndarray,
    *,
    f0_log_transform: bool = True,
    f0_mean: float = 150.0,
    f0_std: float = 50.0,
    energy_mean: float = -5.0,
    energy_std: float = 2.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Speaker normalization (reference src/features/prosody.py:277-391):
    optionally log-transform F0 then z-score F0 and energy; VAD/voicing pass
    through."""
    f0, energy, vad, voicing = (features[..., 0], features[..., 1],
                                features[..., 2], features[..., 3])
    if f0_log_transform:
        ref = jnp.log(f0_mean)
        scale = f0_std / f0_mean  # delta-method std of log-F0
        f0n = jnp.where(f0 > 0, (jnp.log(f0 + eps) - ref) / (scale + eps),
                        0.0)
    else:
        f0n = jnp.where(f0 > 0, (f0 - f0_mean) / (f0_std + eps), 0.0)
    en = (energy - energy_mean) / (energy_std + eps)
    return jnp.stack([f0n, en, vad, voicing], axis=-1)


def denormalize_prosody(
    features: jnp.ndarray,
    *,
    f0_log_transform: bool = True,
    f0_mean: float = 150.0,
    f0_std: float = 50.0,
    energy_mean: float = -5.0,
    energy_std: float = 2.0,
) -> jnp.ndarray:
    """Inverse of :func:`normalize_prosody` (round-trip tested)."""
    f0n, en, vad, voicing = (features[..., 0], features[..., 1],
                             features[..., 2], features[..., 3])
    if f0_log_transform:
        ref = jnp.log(f0_mean)
        scale = f0_std / f0_mean
        f0 = jnp.where(f0n != 0, jnp.exp(f0n * scale + ref), 0.0)
    else:
        f0 = jnp.where(f0n != 0, f0n * f0_std + f0_mean, 0.0)
    energy = en * energy_std + energy_mean
    return jnp.stack([f0, energy, vad, voicing], axis=-1)

