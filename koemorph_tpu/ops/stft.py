"""STFT power spectrogram, MXU-first.

On TPU the FLOPs live in matmuls, so the real-valued DFT is expressed as two
frame-by-matrix products against precomputed cos/sin matrices instead of an
FFT: ``re = F @ C``, ``im = F @ S``, ``power = re^2 + im^2``. For KoeMorph's
sizes (n_fft=1024, <=513 bins, <=257 frames) this is a tiny batched GEMM that
XLA tiles straight onto the 128x128 systolic array and fuses with the
windowing multiply and the downstream mel-filterbank matmul. An ``rfft`` path
is kept for parity checks and CPU tests.

Replaces: librosa.stft (reference src/model/simplified_dual_stream_model.py
:188-199), torchaudio.transforms.Spectrogram (reference src/features/stft.py
:84-96).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.window import frame_signal, hann_window


@functools.lru_cache(maxsize=8)
def _dft_matrices_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def dft_matrices(n_fft: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real-DFT basis matrices ``(cos, -sin)`` of shape ``(n_fft, n_fft//2+1)``.

    ``frames @ cos + 1j * frames @ (-sin)`` equals ``rfft(frames)``.
    """
    c, s = _dft_matrices_np(n_fft)
    return jnp.asarray(c, dtype=dtype), jnp.asarray(s, dtype=dtype)


@functools.lru_cache(maxsize=8)
def _iacf_matrix_np(n_fft: int, n_lags: int) -> np.ndarray:
    """Inverse-DFT cosine matrix mapping a power spectrum (n_fft//2+1 bins)
    to autocorrelation lags [0, n_lags):
    ``acf(tau) = (1/N) [P_0 + 2 sum_k P_k cos(2 pi k tau / N) + (-1)^tau P_{N/2}]``.
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    tau = np.arange(n_lags, dtype=np.float64)[None, :]
    m = np.cos(2.0 * np.pi * k * tau / n_fft)
    coef = np.full((n_bins, 1), 2.0)
    coef[0, 0] = 1.0
    if n_fft % 2 == 0:
        coef[-1, 0] = 1.0
    return (m * coef / n_fft).astype(np.float32)


def power_spectrum_matmul(frames: jnp.ndarray, n_fft: int,
                          precision: str = "highest") -> jnp.ndarray:
    """``|rfft(frames, n_fft)|^2`` as two MXU matmuls (TPU has no native
    FFT; XLA's generic FFT lowering is ~100x slower than the MXU path for
    these sizes). Frames shorter than ``n_fft`` are implicitly
    zero-padded by slicing the DFT matrices to the frame length —
    padded-sample rows would multiply zeros, so dropping them halves the
    GEMM's contraction dim at identical results (matters for YIN, whose
    512-sample frames transform at length 804+).

    ``precision`` selects the MXU pass count on TPU: "highest" is 6-pass
    f32 emulation (frontend parity paths), "high" is 3-pass bf16
    (~1e-6 relative — the eGeMAPS default, measured ~2x faster at
    batched-decode shapes with no behavioral drift).
    """
    n = frames.shape[-1]
    c, s = dft_matrices(n_fft, dtype=frames.dtype)
    if n < n_fft:
        c = c[:n]
        s = s[:n]
    # The 2^k + 1 bin counts of power-of-two n_ffts look like they pad a
    # whole extra 128-lane MXU tile (257 -> 384), but splitting the
    # Nyquist column out as a VPU reduction measured NO chain-level win
    # (2.09 -> 2.14 ms at B=8 x 17 s) — XLA's N-dim padding is cheap,
    # and the concatenate re-materializes the power tensor. Keep the
    # single GEMM pair.
    re = jnp.matmul(frames, c, precision=precision)
    im = jnp.matmul(frames, s, precision=precision)
    return re * re + im * im


def acf_from_power(power: jnp.ndarray, n_fft: int, n_lags: int,
                   precision: str = "highest") -> jnp.ndarray:
    """Autocorrelation lags ``[0, n_lags)`` from an ``n_fft``-point power
    spectrum already in hand (Wiener-Khinchin inverse as one cosine
    matmul). Exact (non-circular) whenever ``n_fft >= n + n_lags`` for the
    true signal support ``n`` — lets callers that already computed a
    spectrum (the eGeMAPS spectral chain) get LPC lags for free instead
    of paying a second DFT GEMM pair over the same frames."""
    iacf = jnp.asarray(_iacf_matrix_np(n_fft, n_lags), dtype=power.dtype)
    return jnp.matmul(power, iacf, precision=precision)


def autocorr_matmul(frames: jnp.ndarray, n_lags: int,
                    n_fft: int | None = None,
                    precision: str = "highest") -> jnp.ndarray:
    """Frame autocorrelation ``acf(tau), tau in [0, n_lags)`` via the
    Wiener-Khinchin identity, computed entirely as MXU matmuls.

    The transform length only needs ``n + n_lags`` to avoid circular
    aliasing at the requested lags (matmul DFT has no power-of-2
    constraint); rounding to the next pow2 as FFT code would costs up to
    2.5x the FLOPs for YIN/LPC-sized inputs.
    """
    n = frames.shape[-1]
    if n_fft is None:
        # lane-align the bin count; exactness only needs >= n + n_lags
        n_fft = ((n + n_lags + 7) // 8) * 8
    power = power_spectrum_matmul(frames, n_fft, precision=precision)
    iacf = jnp.asarray(_iacf_matrix_np(n_fft, n_lags), dtype=frames.dtype)
    return jnp.matmul(power, iacf, precision=precision)


def stft_power(
    x: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    power: float = 2.0,
    normalized: bool = False,
    method: str = "matmul",
) -> jnp.ndarray:
    """Magnitude/power spectrogram of ``x``.

    Args:
        x: signal ``(..., L)``.
        n_fft: FFT size.
        hop_length: hop between frames.
        win_length: analysis window length (padded to ``n_fft``); default n_fft.
        window: optional precomputed window of length ``win_length``.
        center: librosa-style reflect centering.
        power: 1.0 for magnitude, 2.0 for power.
        normalized: divide the STFT by ``sqrt(sum(window**2))``
            (torchaudio ``normalized=True``).
        method: "matmul" (MXU-friendly real DFT) or "rfft".

    Returns:
        Spectrogram ``(..., n_frames, n_fft // 2 + 1)``; note time-major
        layout (librosa returns freq-major; transpose as needed).
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        # center-pad window to n_fft (librosa util.pad_center semantics)
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = frame_signal(x, n_fft, hop_length, center=center)
    frames = frames * window

    if method == "matmul":
        c, s = dft_matrices(n_fft, dtype=frames.dtype)
        re = jnp.matmul(frames, c, precision="highest")
        im = jnp.matmul(frames, s, precision="highest")
        sq = re * re + im * im
    elif method == "rfft":
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        sq = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:  # pragma: no cover - defensive
        raise ValueError(f"Unknown stft method: {method!r}")

    if normalized:
        sq = sq / jnp.sum(window * window)

    if power == 2.0:
        return sq
    if power == 1.0:
        return jnp.sqrt(sq)
    return jnp.power(sq, power / 2.0)
