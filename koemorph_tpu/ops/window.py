"""Signal framing and analysis windows.

Replaces librosa.util.frame / scipy window generation with static-shape JAX
ops. Framing avoids TPU gathers (measured 12x slower than data movement by
reshape at 20 s / hop 160): the signal is padded to a hop multiple, viewed
as (rows, hop), and each frame is the concatenation of ceil(n_fft/hop)
shifted row-slices — pure slices/concats that XLA lowers to copies, and
bit-exact vs the gather definition.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, *, periodic: bool = True,
                dtype=jnp.float32) -> jnp.ndarray:
    """Hann window.

    ``periodic=True`` matches librosa / torch.hann_window defaults
    (``scipy.signal.get_window('hann', n, fftbins=True)``).
    """
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else max(win_length - 1, 1)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    return jnp.asarray(w, dtype=dtype)


def num_frames(length: int, n_fft: int, hop_length: int,
               *, center: bool = True) -> int:
    """Number of STFT frames produced for a signal of ``length`` samples.

    Matches librosa/torch conventions: ``1 + length // hop`` when centered,
    ``1 + (length - n_fft) // hop`` otherwise.
    """
    if center:
        return 1 + length // hop_length
    return 1 + (length - n_fft) // hop_length


@functools.lru_cache(maxsize=64)
def _frame_indices(n_frames: int, n_fft: int, hop_length: int) -> np.ndarray:
    idx = (np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
           + np.arange(n_fft, dtype=np.int32)[None, :])
    return idx


def pad_center_reflect(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Reflect-pad the last axis by ``n_fft // 2`` on both sides.

    Matches librosa ``center=True`` / torch.stft ``pad_mode='reflect'``.
    """
    pad = n_fft // 2
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int,
                 *, center: bool = True) -> jnp.ndarray:
    """Slice a signal into overlapping frames.

    Args:
        x: signal of shape ``(..., L)``.
        n_fft: frame length.
        hop_length: hop between frame starts.
        center: reflect-pad by ``n_fft//2`` so frame ``t`` is centered on
            sample ``t * hop_length`` (librosa semantics).

    Returns:
        Frames of shape ``(..., n_frames, n_fft)``.
    """
    length = x.shape[-1]
    n = num_frames(length, n_fft, hop_length, center=center)
    if center:
        x = pad_center_reflect(x, n_fft)

    # reshape-based framing (no gather): frame t = rows[t : t + k] of the
    # (rows, hop) view, truncated to n_fft
    k = -(-n_fft // hop_length)                 # ceil(n_fft / hop)
    total = (n + k) * hop_length
    if total > x.shape[-1]:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, total - x.shape[-1])]
        x = jnp.pad(x, cfg)
    else:
        x = x[..., :total]
    grid = x.reshape(x.shape[:-1] + (n + k, hop_length))
    cols = [grid[..., i : i + n, :] for i in range(k)]
    frames = jnp.concatenate(cols, axis=-1)     # (..., n, k*hop)
    return frames[..., :n_fft]
