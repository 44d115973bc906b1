"""Mel inversion + Griffin-Lim reconstruction (test/analysis path).

Parity target: reference src/features/stft.py:176-249
(InverseMelSpectrogram: torchaudio InverseMelScale + GriffinLim),
src/features/stft.py:252 (compute_reconstruction_snr) and :281
(validate_mel_parameters). The reference uses these only in tests — the
Griffin-Lim SNR round-trip is a load-bearing behavioral test of the whole
mel frontend (reference tests/features/test_stft.py:144-204) — so fidelity
matters more than speed here; everything is still jittable jnp.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.mel import mel_filterbank
from koemorph_tpu.ops.stft import dft_matrices
from koemorph_tpu.ops.window import frame_signal, hann_window

__all__ = ["mel_to_linear", "griffin_lim", "reconstruct_audio",
           "compute_reconstruction_snr", "validate_mel_parameters"]


def mel_to_linear(mel_power: jnp.ndarray, *, sample_rate: int, n_fft: int,
                  n_mels: int, f_min: float = 0.0,
                  f_max: float | None = None,
                  htk: bool = True, norm: str | None = None) -> jnp.ndarray:
    """Approximate inverse mel: (..., T, n_mels) -> (..., T, bins) power.

    Least-squares pseudo-inverse of the filterbank with non-negativity
    clamp (the role of torchaudio's iterative InverseMelScale; closed-form
    here — one matmul instead of an SGD loop).
    """
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min,
                        f_max if f_max is not None else sample_rate / 2,
                        htk=htk, norm=norm)                 # (bins, n_mels)
    pinv = jnp.linalg.pinv(fb)                              # (n_mels, bins)
    return jnp.maximum(mel_power @ pinv, 0.0)


def _istft_overlap_add(spec: jnp.ndarray, n_fft: int, hop: int,
                       length: int) -> jnp.ndarray:
    """Inverse STFT via overlap-add with window-square normalization.
    ``spec`` is complex (..., T, bins); output (..., length)."""
    window = hann_window(n_fft)
    # complex irfft per frame
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # (..., T, n_fft)
    t = frames.shape[-2]
    total = (t - 1) * hop + n_fft

    def ola(fr):  # (T, n_fft) -> (total,)
        out = jnp.zeros((total,), fr.dtype)
        wsum = jnp.zeros((total,), fr.dtype)
        wsq = window * window

        def body(i, carry):
            out, wsum = carry
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (i * hop,), (n_fft,))
                + fr[i], (i * hop,))
            wsum = jax.lax.dynamic_update_slice(
                wsum, jax.lax.dynamic_slice(wsum, (i * hop,), (n_fft,))
                + wsq, (i * hop,))
            return out, wsum

        out, wsum = jax.lax.fori_loop(0, t, body, (out, wsum))
        return out / jnp.maximum(wsum, 1e-8)

    for _ in range(frames.ndim - 2):
        ola = jax.vmap(ola)
    full = ola(frames)
    # center=True framing put sample 0 at n_fft//2
    start = n_fft // 2
    return full[..., start:start + length]


def griffin_lim(magnitude: jnp.ndarray, *, n_fft: int, hop_length: int,
                length: int, n_iter: int = 32, momentum: float = 0.99,
                key: jax.Array | None = None) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram
    (..., T, bins) -> audio (..., length).

    Uses the accelerated (momentum) variant of Perraudin et al., which is
    also what torchaudio's GriffinLim defaults to (momentum=0.99)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, magnitude.shape,
                               minval=-np.pi, maxval=np.pi)
    spec = magnitude * jnp.exp(1j * phase.astype(jnp.float32))
    window = hann_window(n_fft)
    cos_m, sin_m = dft_matrices(n_fft)

    def stft_complex(x):
        frames = frame_signal(x, n_fft, hop_length, center=True) * window
        re = jnp.matmul(frames, cos_m, precision="highest")
        im = jnp.matmul(frames, sin_m, precision="highest")
        return re + 1j * im

    def project(spec):
        """One GL projection: istft -> stft -> snap magnitude."""
        audio = _istft_overlap_add(spec, n_fft, hop_length, length)
        rebuilt = stft_complex(audio)[..., : magnitude.shape[-2], :]
        angle = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-16)
        return magnitude * angle

    def step(carry, _):
        spec, prev = carry
        accel = spec + momentum * (spec - prev)
        new = project(accel)
        return (new, spec), None

    (spec, _), _ = jax.lax.scan(step, (project(spec), spec), None,
                                length=n_iter)
    return _istft_overlap_add(spec, n_fft, hop_length, length)


def reconstruct_audio(mel_power: jnp.ndarray, *, sample_rate: int,
                      n_fft: int, hop_length: int, length: int,
                      f_min: float = 0.0, f_max: float | None = None,
                      htk: bool = True, norm: str | None = None,
                      n_iter: int = 32) -> jnp.ndarray:
    """Mel power spectrogram -> audio via pinv-mel + Griffin-Lim."""
    linear = mel_to_linear(
        mel_power, sample_rate=sample_rate, n_fft=n_fft,
        n_mels=mel_power.shape[-1], f_min=f_min, f_max=f_max,
        htk=htk, norm=norm)
    return griffin_lim(jnp.sqrt(linear), n_fft=n_fft,
                       hop_length=hop_length, length=length, n_iter=n_iter)


def compute_reconstruction_snr(original: jnp.ndarray,
                               reconstructed: jnp.ndarray) -> jnp.ndarray:
    """SNR in dB between original and reconstructed audio
    (reference src/features/stft.py:252-278)."""
    n = min(original.shape[-1], reconstructed.shape[-1])
    o = original[..., :n]
    r = reconstructed[..., :n]
    noise = o - r
    return 10.0 * jnp.log10(
        jnp.sum(o * o, axis=-1) /
        jnp.maximum(jnp.sum(noise * noise, axis=-1), 1e-12))


def validate_mel_parameters(sample_rate: int, n_fft: int, n_mels: int,
                            f_min: float, f_max: float | None,
                            target_fps: float) -> dict:
    """Sanity-check frontend parameters
    (reference src/features/stft.py:281-337)."""
    results: dict = {"valid": True, "warnings": [], "errors": []}
    nyquist = sample_rate / 2.0
    f_max = f_max if f_max is not None else nyquist
    if f_max > nyquist:
        results["errors"].append(
            f"f_max {f_max} exceeds Nyquist {nyquist}")
    if f_min >= f_max:
        results["errors"].append(f"f_min {f_min} >= f_max {f_max}")
    if n_fft & (n_fft - 1):
        results["warnings"].append(f"n_fft {n_fft} is not a power of 2")
    hop = int(sample_rate / target_fps)
    if hop > n_fft:
        results["warnings"].append(
            f"hop {hop} exceeds n_fft {n_fft}: frames don't overlap")
    if n_mels > n_fft // 2 + 1:
        results["errors"].append(
            f"n_mels {n_mels} exceeds bin count {n_fft // 2 + 1}")
    # empty-filter check: does every mel filter see at least one bin?
    fb = np.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min,
                                   f_max))
    empty = int(np.sum(fb.sum(axis=0) <= 0))
    if empty:
        results["warnings"].append(
            f"{empty} mel filters are empty (n_fft too small for n_mels)")
    results["valid"] = not results["errors"]
    for w in results["warnings"]:
        warnings.warn(w)
    return results
