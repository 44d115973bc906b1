"""On-device eGeMAPS-style 88-D acoustic functionals.

Replaces the OpenSMILE C++ dependency (reference
src/features/opensmile_extractor.py:227-235: eGeMAPSv02 Functionals over a
20 s context window, 88 dims) with a fully static-shape jnp pipeline:

  audio (.., L) -> 10 ms-hop LLD matrix -> voiced/unvoiced masked
  functionals -> (.., 88)

The 88 feature *names* follow the eGeMAPSv02 Functionals layout (Eyben et
al., "The Geneva Minimalistic Acoustic Parameter Set", IEEE TAC 2016), and
every feature implements the real eGeMAPS algorithm: exact per-cycle
waveform-matched jitter, glottal-cycle peak shimmer, 26-band auditory
loudness with equal-loudness contour weighting, complex-LPC-root formant
bandwidths, harmonic-resolved formant amplitudes, HTK-mel MFCC 1-4. All 88
rows carry analytic tests against closed-form ground truth
(tests/ops/test_egemaps_analytic.py; per-row status in
docs/egemaps_parity.md). Bit-parity with the OpenSMILE binary is not
asserted in-image (no recorded goldens can ship from this machine —
scripts/egemaps_goldens.py records them wherever `pip install opensmile`
works); the known structural deviations have in-image closers — the
YIN-vs-SHS+Viterbi octave decisions via `f0_smoother="viterbi"`, the
low-pitch jitter frames via 1024-sample long frames
(`jitter_long_frames`) — with the residuals quantified in the parity
doc.

Everything jits; the hot path is: reshape framing (no TPU gathers) ->
matmul DFT / Wiener-Khinchin autocorrelation (no TPU FFT) -> filterbank
matmuls -> masked reductions, all MXU/VPU friendly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.f0 import yin_core
from koemorph_tpu.ops.gatherless import select_columns
from koemorph_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz
from koemorph_tpu.ops.window import frame_signal, hann_window

# ---------------------------------------------------------------------------
# feature name layout (88)
# ---------------------------------------------------------------------------

_F0_FUNCTIONALS = (
    "amean", "stddevNorm", "percentile20.0", "percentile50.0",
    "percentile80.0", "pctlrange0-2", "meanRisingSlope", "stddevRisingSlope",
    "meanFallingSlope", "stddevFallingSlope",
)


def feature_names() -> tuple[str, ...]:
    """The 88 eGeMAPSv02 functional names in this framework's canonical
    order."""
    names: list[str] = []
    names += [f"F0semitoneFrom27.5Hz_sma3nz_{f}" for f in _F0_FUNCTIONALS]
    names += ["jitterLocal_sma3nz_amean", "jitterLocal_sma3nz_stddevNorm"]
    names += [f"loudness_sma3_{f}" for f in _F0_FUNCTIONALS]
    names += ["shimmerLocaldB_sma3nz_amean", "shimmerLocaldB_sma3nz_stddevNorm"]
    names += ["HNRdBACF_sma3nz_amean", "HNRdBACF_sma3nz_stddevNorm"]
    names += ["logRelF0-H1-H2_sma3nz_amean", "logRelF0-H1-H2_sma3nz_stddevNorm"]
    names += ["logRelF0-H1-A3_sma3nz_amean", "logRelF0-H1-A3_sma3nz_stddevNorm"]
    for i in (1, 2, 3):
        names += [f"F{i}frequency_sma3nz_amean", f"F{i}frequency_sma3nz_stddevNorm"]
        names += [f"F{i}bandwidth_sma3nz_amean", f"F{i}bandwidth_sma3nz_stddevNorm"]
        names += [f"F{i}amplitudeLogRelF0_sma3nz_amean",
                  f"F{i}amplitudeLogRelF0_sma3nz_stddevNorm"]
    for band in ("alphaRatioV", "hammarbergIndexV", "slopeV0-500",
                 "slopeV500-1500", "spectralFluxV", "mfcc1V", "mfcc2V",
                 "mfcc3V", "mfcc4V"):
        names += [f"{band}_sma3nz_amean", f"{band}_sma3nz_stddevNorm"]
    for band in ("alphaRatioUV", "hammarbergIndexUV", "slopeUV0-500",
                 "slopeUV500-1500", "spectralFluxUV"):
        names += [f"{band}_sma3nz_amean"]
    # all-frame (sma3) spectral functionals — what makes v02 sum to 88
    for band in ("spectralFlux", "mfcc1", "mfcc2", "mfcc3", "mfcc4"):
        names += [f"{band}_sma3_amean", f"{band}_sma3_stddevNorm"]
    names += [
        "loudnessPeaksPerSec",
        "VoicedSegmentsPerSec",
        "MeanVoicedSegmentLengthSec",
        "StddevVoicedSegmentLengthSec",
        "MeanUnvoicedSegmentLength",
        "StddevUnvoicedSegmentLength",
        "equivalentSoundLevel_dBp",
    ]
    assert len(names) == 88, len(names)
    return tuple(names)


FEATURE_NAMES = feature_names()
NUM_FEATURES = 88


@dataclasses.dataclass(frozen=True)
class EgemapsConfig:
    sample_rate: int = 16000
    frame_length: int = 400      # 25 ms
    hop_length: int = 160        # 10 ms
    n_fft: int = 512
    f0_min: float = 55.0
    f0_max: float = 500.0
    lpc_order: int = 10
    # MXU pass count for the DFT/ACF matmuls: "high" (3-pass bf16,
    # ~1e-6 relative) halves their cost vs "highest" (6-pass f32
    # emulation) with no behavioral drift in the analytic test battery;
    # dB-scale outputs and CMNDF ratios tolerate it comfortably.
    precision: str = "high"
    # Per-period voice quality (default): jitter from per-glottal-cycle
    # waveform-matched periods, shimmer from glottal-cycle peak
    # amplitudes — the eGeMAPS definitions. False selects the cheaper
    # frame-level proxies (frame-to-frame F0 deltas / frame-RMS dB),
    # trading the last fidelity tier for ~25% more batched-decode
    # throughput (round-3 measurement 134k -> 177k frames/s/chip at
    # B=8 x 17 s on one v5e; the bench's fidelity ladder in
    # docs/performance.md carries the current numbers of record).
    per_period_voice_quality: bool = True
    # Per-cycle slots for exact consecutive-period jitter (OpenSMILE's
    # jitterLocal segmentation): cycle k vs k+1 period differences are
    # measurable whenever (k+2) periods + the search band fit in the
    # 512-sample YIN frame — full per-cycle fidelity for F0 >= ~95 Hz
    # with 0 selects the half-window-pair estimate everywhere (the
    # round-3 tier); frames whose pitch is too low for any consecutive
    # pair fall back to it per frame either way.
    jitter_cycles: int = 8
    # Low-pitch per-cycle jitter (VERDICT r4 item 4): frames whose period
    # is too long for a consecutive cycle pair to fit the 512-sample YIN
    # frame (F0 < ~95 Hz — common in low male voices) re-run the cycle
    # segmentation over a 1024-sample analysis frame ENDING at the same
    # sample (512 samples of left context: the previous samples in a
    # monolithic call, an audio-tail carry in chunked streaming, zeros
    # at stream start where cycles overlapping the unknown region are
    # masked invalid). Extends exact consecutive-cycle jitter down to
    # F0 >= ~47 Hz; engaged only when cfg.f0_min admits such periods
    # (trace-time branch), and only consulted on frames the 512-sample
    # path cannot serve.
    jitter_long_frames: bool = True
    # Pitch-contour decision layer: "viterbi" replaces YIN's per-frame
    # first-dip pick with a DP path over the top CMNDF dip candidates
    # (ops/f0.py _viterbi_pick) — octave-robust on creaky/diplophonic
    # stretches, the decision OpenSMILE makes with SHS+Viterbi. Off by
    # default: the path couples frames, so the chunked streaming path
    # smooths per refresh block rather than globally (monolithic and
    # chunked results then differ near chunk boundaries on ambiguous
    # frames — the bit-exact incremental==batch guarantee holds only
    # for "none"), and "none" is the round-4 parity-pinned contour.
    f0_smoother: str = "none"


# ---------------------------------------------------------------------------
# masked functional helpers
# ---------------------------------------------------------------------------

def _masked_mean(x, mask, eps=1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=-1) / (jnp.sum(m, axis=-1) + eps)


def _masked_std(x, mask, eps=1e-8):
    mean = _masked_mean(x, mask, eps)
    var = _masked_mean((x - mean[..., None]) ** 2, mask, eps)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def _stddev_norm(x, mask, eps=1e-8):
    """Coefficient of variation: stddev / |mean| (eGeMAPS stddevNorm)."""
    return _masked_std(x, mask, eps) / (jnp.abs(_masked_mean(x, mask, eps))
                                        + eps)


def _masked_percentiles(x, mask, qs: tuple[float, ...]):
    """Percentiles over masked values (mask True = include).

    One sort serves all requested quantiles — the contour functionals ask
    for p20/p50/p80 of the same masked contour, and sorting is the single
    most expensive VPU op in the functionals pass.
    """
    big = jnp.asarray(np.inf, x.dtype)
    vals = jnp.where(mask, x, big)
    s = jnp.sort(vals, axis=-1)
    n = jnp.sum(mask, axis=-1)
    out = []
    for q in qs:
        idx = jnp.clip((q * jnp.maximum(n - 1, 0)).astype(jnp.int32), 0,
                       x.shape[-1] - 1)
        picked = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
        out.append(jnp.where(n > 0, picked, 0.0))
    return out


def _masked_percentile(x, mask, q: float):
    """Single percentile over masked values."""
    return _masked_percentiles(x, mask, (q,))[0]


def _sma3(x, within=None):
    """3-frame symmetric moving average — the 'sma3' in every eGeMAPS
    feature name (Eyben et al. 2016 section III-A: all LLDs are smoothed
    over time with a 3-frame moving average; *nz* contours only within
    voiced regions). ``within`` restricts the average to masked neighbors
    and passes unmasked positions through unchanged."""
    if within is None:
        m = jnp.ones_like(x, dtype=x.dtype)
    else:
        m = jnp.broadcast_to(within, x.shape).astype(x.dtype)
    xm = x * m

    def left(a):
        return jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., :-1]],
                               axis=-1)

    def right(a):
        return jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])],
                               axis=-1)

    num = left(xm) + xm + right(xm)
    den = left(m) + m + right(m)
    sm = num / jnp.maximum(den, 1.0)
    return jnp.where(m > 0, sm, x)


def _majority3(mask):
    """3-frame majority filter on a boolean contour (de-flickers YIN
    voicing before segment statistics — the segment-level analog of the
    sma3 smoothing OpenSMILE applies before voiced-segment detection)."""
    m = mask.astype(jnp.int32)
    l_ = jnp.concatenate([m[..., :1], m[..., :-1]], axis=-1)
    r = jnp.concatenate([m[..., 1:], m[..., -1:]], axis=-1)
    return (l_ + m + r) >= 2


def _slope_stats(x, mask, frame_period: float):
    """Mean/std of rising and falling slopes of the masked contour."""
    dx = (x[..., 1:] - x[..., :-1]) / frame_period
    valid = mask[..., 1:] & mask[..., :-1]
    rising = valid & (dx > 0)
    falling = valid & (dx < 0)
    return (
        _masked_mean(dx, rising), _masked_std(dx, rising),
        _masked_mean(dx, falling), _masked_std(dx, falling),
    )


def _segment_stats(mask, frame_period: float, eps=1e-8):
    """Exact per-segment statistics of a boolean contour:
    ``(n_segments, mean_length_s, std_length_s)``.

    Segment lengths are recovered without host loops via an associative
    run-length scan: position t carries the length of the consecutive run
    of True values ending at t, so reading the scan at each segment's
    LAST frame yields that segment's exact length. Sums of lengths and
    squared lengths over those end positions give the exact mean and
    (population) standard deviation of segment lengths.
    """
    m = mask.astype(jnp.float32)
    starts = jnp.maximum(m[..., 1:] - m[..., :-1], 0.0)
    n_segments = jnp.sum(starts, axis=-1) + m[..., 0]

    def run_lengths(mm):
        """Length of the run of ones ending at each position."""
        def op(a, b):
            # (count, all_ones): concatenating blocks a|b — if b is all
            # ones its runs extend a's trailing run, else b's own count
            ca, fa = a
            cb, fb = b
            return (jnp.where(fb > 0, ca * fb + cb, cb), fa * fb)

        counts, _ = jax.lax.associative_scan(op, (mm, mm), axis=-1)
        return counts

    runs = run_lengths(m)
    # a segment's final frame is a True followed by False (or sequence end)
    seg_end = m * jnp.concatenate(
        [1.0 - m[..., 1:], jnp.ones_like(m[..., :1])], axis=-1)
    seg_lengths_sum = jnp.sum(runs * seg_end, axis=-1)
    seg_lengths_sq = jnp.sum((runs * seg_end) ** 2, axis=-1)
    mean_len = seg_lengths_sum / (n_segments + eps)
    var = seg_lengths_sq / (n_segments + eps) - mean_len ** 2
    std_len = jnp.sqrt(jnp.maximum(var, 0.0)) * frame_period
    return n_segments, mean_len * frame_period, std_len


# ---------------------------------------------------------------------------
# LLD computation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def equal_loudness_weights(sample_rate: int = 16000, n_bands: int = 26,
                           f_min: float = 20.0,
                           f_max: Optional[float] = None) -> np.ndarray:
    """Equal-loudness contour weights at the ``n_bands`` auditory-band
    centre frequencies, normalized to 1 at 1 kHz. Shape ``(n_bands,)``.

    eGeMAPS' loudness LLD weights each auditory band by an equal-loudness
    contour before the Stevens-law intensity exponent (Eyben et al. 2016
    section III-A: "auditory spectrum"; the reference consumes it through
    OpenSMILE, src/features/opensmile_extractor.py:227-235). The contour
    is the 40-phon approximation standard in auditory front ends (PLP
    analysis, Hermansky 1990, eq. 2):

        E(w) = ((w^2 + 56.8e6) * w^4)
               / ((w^2 + 6.3e6)^2 * (w^2 + 0.38e9)),      w = 2*pi*f

    which attenuates low frequencies (~-23 dB at 100 Hz relative to
    1 kHz) and boosts the ear's 2-5 kHz sensitivity region (~+5 dB near
    3.5 kHz). Band centres are the interior points of the HTK-mel grid
    the 26-band loudness filterbank is built on, so weight ``b`` sits at
    the peak of triangle ``b``.
    """
    f_max = sample_rate / 2.0 if f_max is None else f_max
    grid = mel_to_hz(
        np.linspace(hz_to_mel(f_min, htk=True), hz_to_mel(f_max, htk=True),
                    n_bands + 2), htk=True)
    centers = np.asarray(grid[1:-1], np.float64)

    def contour(f):
        w2 = (2.0 * np.pi * np.asarray(f, np.float64)) ** 2
        return ((w2 + 56.8e6) * w2 ** 2
                / ((w2 + 6.3e6) ** 2 * (w2 + 0.38e9)))

    return (contour(centers) / contour(1000.0)).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _mfcc_dct(n_mels: int = 26, n_out: int = 4) -> np.ndarray:
    k = np.arange(1, n_out + 1)[:, None]
    n = np.arange(n_mels)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    return (basis * np.sqrt(2.0 / n_mels)).astype(np.float32)


def _levinson(r: jnp.ndarray, order: int) -> jnp.ndarray:
    """Levinson-Durbin: autocorrelation (..., order+1) -> inverse (error)
    filter coefficients A = [1, a_1, ..., a_p] such that
    ``A @ [x_n, x_{n-1}, ...]`` is the prediction residual. Unrolled (order
    is small and static) as a pure elementwise DAG over per-order arrays —
    no dynamic-update-slices, so XLA fuses the whole recursion into one
    kernel (the ``.at[].set`` form cost ~0.3 ms at the batched-decode
    operating point). Validated against a direct Toeplitz solve."""
    # run the recursion in predictor convention (x_n ~= sum p_j x_{n-j}) ...
    p: list = [None] * (order + 1)
    err = r[..., 0] + 1e-9
    for i in range(1, order + 1):
        acc = jnp.zeros_like(err)
        for j in range(1, i):
            acc = acc + p[j] * r[..., i - j]
        k = (r[..., i] - acc) / err
        updated = {j: p[j] - k * p[i - j] for j in range(1, i)}
        for j, v in updated.items():
            p[j] = v
        p[i] = k
        err = err * (1.0 - k * k) + 1e-12
    # ... then flip to the error-filter polynomial: A = [1, -p_1, ..., -p_p]
    return jnp.stack([jnp.ones_like(err)] + [-p[j]
                     for j in range(1, order + 1)], axis=-1)


def _poly_roots_dk(a: jnp.ndarray, iters: int = 20) -> jnp.ndarray:
    """All ``p`` complex roots of the monic polynomial
    ``P(x) = x^p + a_1 x^{p-1} + ... + a_p`` (coefficients ``a`` of shape
    (..., p+1) with ``a[..., 0] == 1``) by Durand-Kerner (Weierstrass)
    iteration — simultaneous Newton-like updates of all roots, pure
    elementwise complex arithmetic, so it runs fused on the VPU with
    static shapes (vs host ``np.roots``' eigendecomposition, unavailable
    on TPU). LPC polynomials from Levinson are minimum-phase (roots
    strictly inside the unit circle), for which 20 fixed iterations
    converge to below float32 resolution (measured: every eGeMAPS
    formant feature matches the 32-iteration result to <=1e-7 relative
    on synthetic vowels and speech-like signals; 12 iterations break) —
    and each unrolled iteration costs ~3 kernel launches, which is what
    the B=1 streaming path actually pays (launch-bound, not FLOP-bound).
    Validated against ``np.roots`` in tests/ops/test_egemaps.py."""
    p = a.shape[-1] - 1
    ac = a.astype(jnp.complex64)
    k = np.arange(p)
    # distinct non-symmetric starting points on a 0.9 circle
    z0 = (0.9 * np.exp(2j * np.pi * (k + 0.35) / p)).astype(np.complex64)
    z = jnp.broadcast_to(z0, a.shape[:-1] + (p,))

    def poly(x):
        res = jnp.broadcast_to(ac[..., 0:1], x.shape)
        for i in range(1, p + 1):
            res = res * x + ac[..., i][..., None]
        return res

    eye = np.eye(p, dtype=bool)
    for _ in range(iters):
        diff = z[..., :, None] - z[..., None, :]
        diff = jnp.where(eye, jnp.ones((), jnp.complex64), diff)
        denom = jnp.prod(diff, axis=-1)
        small = jnp.abs(denom) < 1e-12
        denom = jnp.where(small, jnp.ones((), jnp.complex64), denom)
        step = poly(z) / denom
        z = z - jnp.where(small, jnp.zeros((), jnp.complex64), step)
    return z


def _poly_roots(a: jnp.ndarray) -> jnp.ndarray:
    """Backend dispatch for LPC root-solving: the Pallas kernel on TPU
    at small static row counts (whole Durand-Kerner iteration in one
    launch, VMEM-resident — see ops/pallas/dk_roots_kernel.py; measured
    chain-level 0.28 -> 0.26 ms at the launch-bound B=1 full-window
    shape), the unrolled XLA form elsewhere: at B=8 x 17 s the chain
    measured ~0.13 ms FASTER with XLA (the kernel boundary blocks
    producer/consumer fusion that matters once launches amortize), and
    the kernel's interpreter fallback is far slower than XLA on CPU.
    Cross-form agreement is pinned by tests/ops/test_pallas_dk.py; both
    forms show the same rare pairing instability on pathological
    near-unit-circle root clusters (~0.4% of noisy frames — the
    committed XLA form itself differs CPU-vs-TPU at the same rate, so
    this is inherent to 20-iteration Durand-Kerner, not a kernel
    property; such clustered junk roots fail the formant validity
    filter in the common case).

    Dispatch keys off the *lowering* platform (``lax.platform_dependent``),
    not ``jax.default_backend()``: on a TPU host a CPU-placed execution
    (``jit(..., backend="cpu")`` / committed CPU arrays) must take the XLA
    form — ``pallas_call`` has no compiled CPU lowering."""
    rows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
    if rows <= 4096:
        from koemorph_tpu.ops.pallas.dk_roots_kernel import (
            poly_roots_dk_pallas)

        return jax.lax.platform_dependent(
            a, tpu=poly_roots_dk_pallas, default=_poly_roots_dk)
    return _poly_roots_dk(a)


def _spectral_peak_db(mag_db: jnp.ndarray, center_bin: jnp.ndarray
                      ) -> jnp.ndarray:
    """Peak dB near ``center_bin``: local max over the nearest bins
    (flooring the bin index alone reads the leakage skirt and
    underestimates by up to ~1.5 dB at 512-point DFT).

    ``mag_db`` is (..., T, n_bins); ``center_bin`` (..., T, K) int32.
    Returns (..., T, K).
    """
    # 3-point local max as an elementwise pre-pass over the whole
    # spectrum (2 shifted maxes, ~free) so the data-dependent lookup
    # reads exactly K columns; the lookup itself is gather-free
    # (ops/gatherless.py — the TPU row-loop gather this replaces measured
    # 2.5 ms in the round-3 device trace)
    m3 = jnp.maximum(
        mag_db,
        jnp.maximum(
            jnp.concatenate([mag_db[..., :1], mag_db[..., :-1]], axis=-1),
            jnp.concatenate([mag_db[..., 1:], mag_db[..., -1:]], axis=-1)))
    return select_columns(m3, center_bin)


class LldCarry(NamedTuple):
    """Cross-chunk continuity state for the pairwise LLDs (spectral flux,
    jitter, shimmer), used by :func:`compute_lld_block` so a streaming LLD
    ring matches the monolithic :func:`compute_llds` at chunk boundaries.

    With per-period voice quality (the default) jitter/shimmer are
    measured WITHIN each analysis frame and need no cross-frame state —
    only spectral flux carries. With ``per_period_voice_quality=False``
    the frame-pairwise fallbacks need the previous frame's period/
    voicing/amplitude, carried in the optional fields (None in per-period
    mode so the pytree structure stays config-static)."""

    prev_mag: jnp.ndarray      # (..., n_bins) previous magnitude spectrum
    prev_period: Optional[jnp.ndarray] = None   # (...,) seconds
    prev_voiced: Optional[jnp.ndarray] = None   # (...,) bool
    prev_amp: Optional[jnp.ndarray] = None      # (...,) frame RMS
    # low-pitch jitter long-frame context (jitter_long_frames): the 512
    # samples immediately before the next chunk's first sample, and how
    # many of them are real stream samples (vs the zero prefill a
    # stream/monolithic call starts from) — cycles overlapping the zero
    # region are masked invalid so chunked == monolithic exactly.
    audio_tail: Optional[jnp.ndarray] = None    # (..., 512)
    ctx_filled: Optional[jnp.ndarray] = None    # (...,) int32 in [0, 512]


def _long_jitter_active(cfg: EgemapsConfig) -> bool:
    """Trace-time gate for the 1024-sample low-pitch jitter path: only
    when some in-range period has no consecutive cycle pair in the
    512-sample YIN frame (3*tau + ~7 > 511, i.e. f0_min < ~95 Hz)."""
    if not (cfg.per_period_voice_quality and cfg.jitter_cycles
            and cfg.jitter_long_frames):
        return False
    tau_max = int(np.ceil(cfg.sample_rate / cfg.f0_min))
    return 3 * tau_max + 7 > 511


def silence_lld_carry(cfg: EgemapsConfig = EgemapsConfig()) -> LldCarry:
    """Carry representing preceding silence (stream start)."""
    n_bins = cfg.n_fft // 2 + 1
    long_fields = {}
    if _long_jitter_active(cfg):
        long_fields = dict(audio_tail=jnp.zeros((512,), jnp.float32),
                           ctx_filled=jnp.zeros((), jnp.int32))
    if cfg.per_period_voice_quality:
        return LldCarry(
            prev_mag=jnp.full((n_bins,), 1e-10, jnp.float32),
            **long_fields,
        )
    return LldCarry(
        prev_mag=jnp.full((n_bins,), 1e-10, jnp.float32),
        prev_period=jnp.zeros((), jnp.float32),
        prev_voiced=jnp.zeros((), bool),
        prev_amp=jnp.zeros((), jnp.float32),
    )


# LLD channels a streaming ring must carry for functionals_from_llds
# (f0_hz is returned by compute_llds but unused by the functionals).
LLD_RING_SPEC: tuple[tuple[str, tuple[int, ...], object], ...] = (
    ("f0_semitone", (), jnp.float32), ("voiced", (), bool),
    ("jitter", (), jnp.float32), ("loudness", (), jnp.float32),
    ("shimmer_db", (), jnp.float32), ("hnr_db", (), jnp.float32),
    ("h1_h2", (), jnp.float32), ("h1_a3", (), jnp.float32),
    ("alpha_ratio", (), jnp.float32), ("hammarberg", (), jnp.float32),
    ("slope_0_500", (), jnp.float32), ("slope_500_1500", (), jnp.float32),
    ("spectral_flux", (), jnp.float32), ("mfcc", (4,), jnp.float32),
    ("formant_freq", (3,), jnp.float32), ("formant_bw", (3,), jnp.float32),
    ("formant_rel", (3,), jnp.float32), ("formant_valid", (3,), bool),
    ("jitter_valid", (), bool), ("shimmer_valid", (), bool),
    ("frame_power", (), jnp.float32),
)


def init_lld_ring(rows: int) -> dict[str, jnp.ndarray]:
    """All-silence LLD ring: zeros, unvoiced, no formants — what the
    monolithic pipeline produces for zero audio (modulo epsilons)."""
    return {k: jnp.zeros((rows,) + shape, dtype)
            for k, shape, dtype in LLD_RING_SPEC}


def roll_lld_ring(ring: dict[str, jnp.ndarray],
                  block: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Shift a block of new rows into the ring (newest rows last)."""
    n_new = block["voiced"].shape[0]
    return {k: jnp.concatenate([ring[k][n_new:], block[k]], axis=0)
            for k in ring}


def compute_llds(audio: jnp.ndarray, cfg: EgemapsConfig = EgemapsConfig()
                 ) -> dict[str, jnp.ndarray]:
    """Frame-level low-level descriptors of ``audio (..., L)``.

    Returns a dict of (..., T) arrays plus the voiced mask, with
    ``T = 1 + (L - 512) // hop``. Frames are interior-only (no edge
    padding), matching OpenSMILE's buffer framing — reflect-padded edge
    frames were found to inject a large artificial spectral-flux spike at
    the newest frame of every streaming refresh, inflating the flux
    functionals the reference never sees (opensmile frames entirely
    within its AudioBuffer, opensmile_extractor.py:115-153).
    """
    lld, _carry = compute_lld_block(audio, cfg, carry=None)
    return lld


def compute_lld_block(
    chunk: jnp.ndarray,
    cfg: EgemapsConfig = EgemapsConfig(),
    carry: LldCarry | None = None,
) -> tuple[dict[str, jnp.ndarray], LldCarry]:
    """LLD rows for a streaming chunk of real samples (no edge padding).

    ``chunk`` has shape ``(..., (n_new - 1) * hop + 512)``; the result has
    ``n_new`` rows whose YIN analysis windows tile the chunk at ``hop``
    spacing, the newest window ending at the chunk end (the 25 ms spectral
    window is centered inside each 512-sample YIN window). ``carry``
    supplies the previous frame's state so jitter/shimmer/spectral-flux are
    seamless across chunks; the returned carry feeds the next call.

    This is the amortization path for the 300 ms eGeMAPS refresh
    (runtime/streaming.py): instead of recomputing 20 s of LLDs every
    refresh (the reference recomputes the whole OpenSMILE window,
    opensmile_extractor.py:460-502), only the new rows are computed and
    rolled into a device-resident LLD ring; functionals then reduce over
    the ring.
    """
    hop = cfg.hop_length
    # one framing + one autocorrelation serve YIN *and* HNR: the ACF is
    # extended past YIN's tau_max to the deepest lag a voiced F0 can
    # request (f0 >= 0.9 * f0_min after parabolic refinement)
    n_acf = int(np.ceil(cfg.sample_rate / (cfg.f0_min * 0.9))) + 2
    per_period = cfg.per_period_voice_quality
    core = yin_core(chunk, sample_rate=cfg.sample_rate, frame_length=512,
                    hop_length=hop, f0_min=cfg.f0_min, f0_max=cfg.f0_max,
                    center=False, n_acf_lags=n_acf, precision=cfg.precision,
                    subwindow_periods=per_period,
                    cycle_periods=cfg.jitter_cycles if per_period else 0,
                    smoother=cfg.f0_smoother)
    f0 = core.result.f0_hz
    voiced = core.result.voiced_flag

    # --- low-pitch per-cycle jitter: 1024-sample frames ending at the
    # same sample as each 512-sample YIN frame (512 samples of left
    # context from the carry; zeros at stream/monolithic start, with
    # cycles overlapping the zero region masked invalid so chunked ==
    # monolithic exactly). Periods too long for a consecutive pair in
    # 512 samples (F0 < ~95 Hz) get exact cycle pairs here instead of
    # the half-window fallback. ---
    cycles_long = None
    new_tail = new_ctx = None
    if _long_jitter_active(cfg):
        from koemorph_tpu.ops.f0 import _per_cycle_periods

        n_new = f0.shape[-1]
        lead = chunk.shape[:-1]
        if carry is None or carry.audio_tail is None:
            audio_tail = jnp.zeros(lead + (512,), chunk.dtype)
            ctx_filled = jnp.zeros(lead, jnp.int32)
        else:
            audio_tail, ctx_filled = carry.audio_tail, carry.ctx_filled
        ext = jnp.concatenate([audio_tail, chunk], axis=-1)
        frames_long = frame_signal(ext, 1024, hop, center=False)
        tau_max = int(np.ceil(cfg.sample_rate / cfg.f0_min))
        # 5 slots cover every period the 512-frame path cannot serve
        # (tau > ~168 fits at most 5 cycles in 1024 samples). The
        # search band doubles to ±16: jitter is RELATIVE, so the same
        # 4% alternation that fits ±8 at 100-sample periods needs ±16
        # at 200+ — and YIN's pick can lock onto ONE of two alternating
        # periods, putting the other exactly on a ±8 band edge (which
        # the band-edge validity check would then discard).
        cp_l, cv_l = _per_cycle_periods(
            frames_long, tau_max, core.pick, core.tau,
            n_cycles=min(int(cfg.jitter_cycles), 5), half_lag=16)
        # cycles that start inside the zero-context region compare
        # prefill zeros, not stream samples - invalid
        t_off = jnp.arange(n_new, dtype=jnp.int32) * hop
        ctx_row = jnp.minimum(ctx_filled[..., None] + t_off, 512)
        zero_len = (512 - ctx_row).astype(jnp.float32)
        k_row = jnp.arange(cp_l.shape[-1], dtype=jnp.float32)
        cv_l = cv_l & (k_row * core.tau[..., None]
                       >= zero_len[..., None] - 1e-3)
        cycles_long = (cp_l, cv_l)
        new_tail = jnp.concatenate(
            [audio_tail, chunk[..., : n_new * hop]], axis=-1)[..., -512:]
        new_ctx = jnp.minimum(ctx_filled + n_new * hop, 512)

    # 25 ms spectral frames = centered slice of the 512-sample YIN frames
    # (identical values to re-framing the chunk, at zero framing cost)
    off = (512 - cfg.frame_length) // 2
    frames = core.frames[..., off:off + cfg.frame_length]
    wframes = frames * hann_window(cfg.frame_length)
    lld, new_carry = _lld_math(
        frames, wframes, f0, voiced, cfg, carry=carry,
        yin_acf=core.acf,
        yin_frames=core.frames if per_period else None,
        subwindow_periods=(core.period_first, core.period_second)
        if per_period else None,
        cycle_periods=(core.cycle_period, core.cycle_valid)
        if per_period and cfg.jitter_cycles else None,
        cycle_periods_long=cycles_long)
    if new_tail is not None:
        new_carry = new_carry._replace(audio_tail=new_tail,
                                       ctx_filled=new_ctx)
    return lld, new_carry


def _lld_math(
    frames: jnp.ndarray,       # (..., T, frame_length) raw frames
    wframes: jnp.ndarray,      # (..., T, frame_length) Hann-windowed
    f0: jnp.ndarray,           # (..., T) Hz, 0 where unvoiced
    voiced: jnp.ndarray,       # (..., T) bool
    cfg: EgemapsConfig,
    carry: LldCarry | None,
    yin_acf: jnp.ndarray | None = None,   # (..., T, lags) shared YIN ACF
    yin_frames: jnp.ndarray | None = None,   # (..., T, 512) YIN frames
    subwindow_periods: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    cycle_periods: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    cycle_periods_long: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[dict[str, jnp.ndarray], LldCarry]:
    """Shared LLD math. ``carry=None`` duplicates spectral flux's first
    frame as its predecessor (zero flux at frame 0 — the monolithic
    semantics); a :class:`LldCarry` makes chunked computation exactly
    continuous with the previous chunk. ``yin_acf`` reuses the
    autocorrelation YIN already computed for the HNR (one transform
    instead of two over the same samples); ``subwindow_periods`` are
    YIN's half-window waveform-matched periods for per-period jitter.
    With either optional input absent the corresponding LLD falls back
    to its frame-level form (standalone/test callers)."""
    sr = cfg.sample_rate
    prec = cfg.precision

    f0_semitone = jnp.where(
        f0 > 0, 12.0 * jnp.log2(jnp.maximum(f0, 1e-3) / 27.5), 0.0)

    # --- spectrum (MXU matmul DFT: TPU has no native FFT) ---
    from koemorph_tpu.ops.stft import (acf_from_power, autocorr_matmul,
                                       power_spectrum_matmul)

    ps = power_spectrum_matmul(wframes, cfg.n_fft, precision=prec)
    mag = jnp.sqrt(jnp.maximum(ps, 0.0)) + 1e-10
    power = mag * mag
    n_bins = cfg.n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins).astype(np.float32)
    bin_hz = sr / cfg.n_fft

    # --- loudness: 26-band auditory spectrum, equal-loudness contour
    # weighting per band, then per-band specific loudness (intensity^0.3,
    # Stevens law) summed across bands — the eGeMAPS definition (Eyben et
    # al. 2016 III-A: "loudness estimate from an auditory spectrum"; the
    # per-band exponent is what distinguishes an auditory loudness from
    # plain broadband energy^0.3, and the contour is what weights the
    # ear's sensitivity into the absolute scale) ---
    fb = mel_filterbank(sr, cfg.n_fft, 26, 20.0, sr / 2, htk=True, norm=None)
    mel_energy = jnp.matmul(power, fb)
    eq_w = jnp.asarray(equal_loudness_weights(sr, 26, 20.0, sr / 2.0))
    # the epsilon keeps gradients finite at zero energy (the model trains
    # through these features); its floor is subtracted so silence stays ~0
    loudness = (jnp.sum(jnp.power(mel_energy * eq_w + 1e-10, 0.3), axis=-1)
                - 26 * 1e-3)

    # --- spectral-flux predecessor (the only carry-dependent LLD) ---
    amp = jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-12)
    if carry is None:
        prev_mag = mag[..., 0, :]
    else:
        prev_mag = carry.prev_mag
    mag_prev = jnp.concatenate(
        [prev_mag[..., None, :], mag[..., :-1, :]], axis=-2)

    # --- jitter: per-period, WITHIN each frame (eGeMAPS jitterLocal =
    # mean relative difference of consecutive waveform-matched pitch
    # periods). The primary estimate segments actual glottal cycles
    # (ops/f0.py _per_cycle_periods — OpenSMILE's exact segmentation);
    # frames whose pitch is too low for any consecutive cycle pair to
    # fit the 512-sample YIN frame (F0 < ~95 Hz) are served by the
    # 1024-sample long-frame segmentation (cycle_periods_long); only
    # frames with no valid pair at either length fall back to the two
    # half-window period estimates ~5.5 ms apart. ---
    if subwindow_periods is not None:
        p1, p2 = subwindow_periods
        ok = voiced & (p1 > 0) & (p2 > 0)
        jitter = jnp.where(
            ok, jnp.abs(p2 - p1) / jnp.maximum(0.5 * (p1 + p2), 1e-6), 0.0)
        jitter_valid = ok

        def _pair_jitter(t_k, v_k):
            """Mean |consecutive cycle-period difference| / mean period
            over the valid cycle pairs, and the pair count."""
            pair = (v_k[..., :-1] & v_k[..., 1:]).astype(t_k.dtype)
            n_pair = jnp.sum(pair, axis=-1)
            d_t = jnp.abs(t_k[..., 1:] - t_k[..., :-1])
            vf = v_k.astype(t_k.dtype)
            mean_t = (jnp.sum(t_k * vf, axis=-1)
                      / jnp.maximum(jnp.sum(vf, axis=-1), 1.0))
            j = (jnp.sum(d_t * pair, axis=-1)
                 / jnp.maximum(n_pair, 1.0)
                 / jnp.maximum(mean_t, 1e-6))
            return j, n_pair

        has_cycles = None
        if cycle_periods is not None:
            jitter_cyc, n_pair = _pair_jitter(*cycle_periods)
            has_cycles = voiced & (n_pair >= 1.0)
            jitter = jnp.where(has_cycles, jitter_cyc, jitter)
            jitter_valid = jitter_valid | has_cycles
        if cycle_periods_long is not None:
            # low-pitch frames (no pair in the 512-sample frame) get
            # exact pairs from the 1024-sample frames; frames the short
            # path already serves keep its estimate
            jitter_long, n_pair_l = _pair_jitter(*cycle_periods_long)
            has_long = voiced & (n_pair_l >= 1.0)
            if has_cycles is not None:
                has_long = has_long & ~has_cycles
            jitter = jnp.where(has_long, jitter_long, jitter)
            jitter_valid = jitter_valid | has_long
    else:
        # fallback (no YIN sub-window data): frame-to-frame F0 deltas.
        # A carry with continuity fields supplies the previous chunk's
        # last frame; otherwise the first frame duplicates itself
        # (monolithic zero-at-frame-0 semantics).
        period = jnp.where(f0 > 0, 1.0 / jnp.maximum(f0, 1e-3), 0.0)
        if carry is not None and carry.prev_period is not None:
            first_p, first_v = carry.prev_period, carry.prev_voiced
        else:
            first_p, first_v = period[..., 0], voiced[..., 0]
        period_prev = jnp.concatenate(
            [first_p[..., None], period[..., :-1]], axis=-1)
        voiced_prev = jnp.concatenate(
            [first_v[..., None], voiced[..., :-1]], axis=-1)
        jitter_valid = voiced & voiced_prev
        jitter = jnp.where(jitter_valid,
                           jnp.abs(period - period_prev)
                           / jnp.maximum(period, 1e-6), 0.0)

    # --- shimmer dB: per-period peak amplitudes WITHIN each frame
    # (eGeMAPS shimmerLocaldB = mean |dB ratio of consecutive pitch
    # periods' peak amplitudes|). Cycle boundaries come arithmetically
    # from the frame's period — masks are iota comparisons, no gathers —
    # over the 512-sample YIN frame (covers >= 2 cycles for f0 >= 63 Hz).
    if yin_frames is not None:
        shimmer, shimmer_valid = _cycle_peak_shimmer(yin_frames, f0, voiced,
                                                     sr)
    else:
        # fallback: frame-to-frame RMS deltas, with the same carry
        # continuity as the jitter fallback above
        if carry is not None and carry.prev_amp is not None:
            first_a, first_av = carry.prev_amp, carry.prev_voiced
        else:
            first_a, first_av = amp[..., 0], voiced[..., 0]
        amp_prev = jnp.concatenate(
            [first_a[..., None], amp[..., :-1]], axis=-1)
        voiced_prev = jnp.concatenate(
            [first_av[..., None], voiced[..., :-1]], axis=-1)
        shimmer_valid = voiced & voiced_prev
        shimmer = jnp.where(
            shimmer_valid,
            jnp.abs(20.0 * (jnp.log10(amp + 1e-9)
                            - jnp.log10(amp_prev + 1e-9))), 0.0)

    # --- HNR via autocorrelation at the F0 lag (shared with YIN: one
    # framing + one transform serve both; the ACF of the 512-sample YIN
    # frame is as valid an HNR estimator as a separate 25 ms-frame ACF
    # and removes a (T, 400) x (400, 365) GEMM pair from the hot path) ---
    if yin_acf is not None:
        acf = yin_acf
        n_frame = yin_frames.shape[-1] if yin_frames is not None else 512
    else:
        n_hnr_lags = int(np.ceil(sr / max(cfg.f0_min * 0.9, 1.0))) + 2
        acf = autocorr_matmul(frames, n_hnr_lags, precision=prec)
        n_frame = frames.shape[-1]
    r0 = acf[..., 0] + 1e-12
    lag = jnp.clip((sr / jnp.maximum(f0, 1.0)).astype(jnp.int32), 1,
                   acf.shape[-1] - 1)
    r_lag = select_columns(acf, lag[..., None])[..., 0]
    # unbiased normalization: the raw ACF of an N-sample frame at lag tau
    # sums only N-tau products, biasing r_lag/r0 down by (N-tau)/N — for a
    # 200 Hz tone in a 25 ms frame that caps HNR at ~6 dB. Scale by
    # N/(N-tau) so a pure tone saturates the clip (~40 dB) as it should.
    unbias = n_frame / jnp.maximum(
        n_frame - lag.astype(jnp.float32), 1.0)
    ratio = jnp.clip(r_lag * unbias / r0, 1e-4, 1 - 1e-4)
    hnr_db = 10.0 * jnp.log10(ratio / (1.0 - ratio))
    hnr_db = jnp.where(voiced, hnr_db, 0.0)

    mag_db = 20.0 * jnp.log10(mag)

    # --- band energies for alpha ratio / hammarberg / slopes ---
    def band(lo, hi):
        m = ((freqs >= lo) & (freqs < hi)).astype(np.float32)
        return jnp.sum(power * m, axis=-1) + 1e-10

    alpha_ratio = 10.0 * (jnp.log10(band(50, 1000)) - jnp.log10(band(1000, 5000)))
    m02 = (freqs < 2000).astype(np.float32)
    m25 = ((freqs >= 2000) & (freqs < 5000)).astype(np.float32)
    hammarberg = 20.0 * (
        jnp.log10(jnp.max(mag * m02, axis=-1) + 1e-10)
        - jnp.log10(jnp.max(mag * m25, axis=-1) + 1e-10))

    def slope(lo, hi):
        sel = (freqs >= lo) & (freqs < hi)
        fsel = freqs[sel]
        y = mag_db[..., sel]
        fc = fsel - fsel.mean()
        denom = float((fc * fc).sum())
        return jnp.sum(y * fc, axis=-1) / denom

    slope_0_500 = slope(0, 500)
    slope_500_1500 = slope(500, 1500)

    # --- spectral flux ---
    dmag = mag - mag_prev
    flux = jnp.sum(dmag * dmag, axis=-1)

    # --- MFCC 1-4 ---
    log_mel = jnp.log(mel_energy + 1e-10)
    dct = jnp.asarray(_mfcc_dct(26, 4))
    mfcc = jnp.einsum("...tm,km->...tk", log_mel, dct)

    # --- formants via LPC root-solving (the real algorithm, replacing
    # round-2's 128-point envelope-peak proxy): Levinson -> polynomial
    # roots (Durand-Kerner) -> centre frequency from the root angle and
    # EXACT -3 dB bandwidth from the root radius, bw = -ln|z| * sr / pi
    # (Markel & Gray; what Praat/openSMILE derive from the same roots) ---
    if cfg.n_fft >= cfg.frame_length + cfg.lpc_order + 1:
        # the spectral chain's n_fft-point power spectrum already holds
        # these lags exactly (Wiener-Khinchin, non-circular because
        # n_fft >= frame + lags) — one cosine matmul instead of a second
        # DFT GEMM pair over the same windowed frames
        r = acf_from_power(ps, cfg.n_fft, cfg.lpc_order + 1, precision=prec)
    else:
        r = autocorr_matmul(wframes, cfg.lpc_order + 1, precision=prec)
    # white-noise correction (standard LPC conditioning, e.g. Praat's
    # noise floor): near-pure tones otherwise drive Levinson degenerate
    # (prediction error -> 0) and scatter clustered unit-circle roots
    r = jnp.concatenate([r[..., :1] * (1.0 + 1e-4), r[..., 1:]], axis=-1)
    a = _levinson(r, cfg.lpc_order)
    roots = _poly_roots(a)
    ang = jnp.angle(roots)                       # conjugate pairs: use +ang
    radius = jnp.abs(roots)
    cand_f = ang * (sr / (2.0 * np.pi))
    cand_bw = -jnp.log(jnp.clip(radius, 1e-4, 1.0 - 1e-6)) * (sr / np.pi)
    cand_ok = ((cand_f > 200.0) & (cand_f < 5450.0) & (cand_bw < 2000.0)
               & jnp.isfinite(cand_f))
    # F1..F3 = the three lowest-frequency valid roots, ascending
    neg_f = jnp.where(cand_ok, -cand_f, -jnp.inf)
    top, idx = jax.lax.top_k(neg_f, 3)           # 3 smallest freqs
    fmt_valid = jnp.isfinite(top)
    fmt_f = jnp.where(fmt_valid, -top, 0.0)
    fmt_bw = jnp.where(fmt_valid, select_columns(cand_bw, idx), 0.0)

    # --- spectral peak lookups, ONE batched gather: H1, H2, and the
    # harmonic-resolved formant amplitudes A1..A3 (eGeMAPS definition:
    # energy of the spectral harmonic peak nearest the formant centre
    # frequency, relative to the F0 peak H1 — not the LPC envelope
    # height) ---
    # harmonic index bound: the deepest valid combination is F3 just under
    # 5450 Hz over the lowest post-refinement f0 (0.9 * f0_min) — ~123 for
    # the default 50 Hz floor. A tighter static clip would silently read
    # A1..A3 at the wrong harmonic for low-pitched voices.
    k_max = float(np.ceil(5450.0 / max(cfg.f0_min * 0.9, 1.0)))
    k_harm = jnp.clip(jnp.round(fmt_f / jnp.maximum(f0, 1.0)[..., None]),
                      1.0, k_max)
    mults = jnp.concatenate(
        [jnp.ones_like(f0)[..., None], jnp.full_like(f0, 2.0)[..., None],
         k_harm], axis=-1)                           # (..., T, 5)
    centers = jnp.clip(jnp.round(mults * f0[..., None] / bin_hz)
                       .astype(jnp.int32), 1, n_bins - 2)
    peaks = _spectral_peak_db(mag_db, centers)       # (..., T, 5)
    h1 = peaks[..., 0]
    h2 = peaks[..., 1]
    fmt_amp = peaks[..., 2:5]
    h1_h2 = jnp.where(voiced, h1 - h2, 0.0)
    # frames missing the formant are zeroed AND excluded from the
    # functionals via formant_valid
    fmt_rel = jnp.where(voiced[..., None] & fmt_valid,
                        fmt_amp - h1[..., None], 0.0)
    h1_a3 = jnp.where(voiced & fmt_valid[..., 2],
                      h1 - fmt_amp[..., 2], 0.0)

    lld = {
        "f0_semitone": f0_semitone, "voiced": voiced, "f0_hz": f0,
        "jitter": jitter, "loudness": loudness, "shimmer_db": shimmer,
        "hnr_db": hnr_db, "h1_h2": h1_h2, "h1_a3": h1_a3,
        "alpha_ratio": alpha_ratio, "hammarberg": hammarberg,
        "slope_0_500": slope_0_500, "slope_500_1500": slope_500_1500,
        "spectral_flux": flux, "mfcc": mfcc,
        "formant_freq": fmt_f, "formant_bw": fmt_bw, "formant_rel": fmt_rel,
        "formant_valid": fmt_valid,
        "jitter_valid": jitter_valid, "shimmer_valid": shimmer_valid,
        "frame_power": amp * amp,
    }
    if cfg.per_period_voice_quality:
        new_carry = LldCarry(prev_mag=mag[..., -1, :])
    else:
        # frame-pairwise fallbacks need last-frame continuity state so the
        # next chunk's first row measures against a real predecessor
        last_period = jnp.where(
            f0[..., -1] > 0, 1.0 / jnp.maximum(f0[..., -1], 1e-3), 0.0)
        new_carry = LldCarry(
            prev_mag=mag[..., -1, :],
            prev_period=last_period,
            prev_voiced=voiced[..., -1],
            prev_amp=amp[..., -1],
        )
    return lld, new_carry


def _cycle_peak_shimmer(yin_frames: jnp.ndarray, f0: jnp.ndarray,
                        voiced: jnp.ndarray, sr: int,
                        max_cycles: int = 8
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-period shimmer (dB) within each frame: peak |x| of consecutive
    glottal cycles, cycle boundaries at multiples of the frame's period.

    All selection is arithmetic (iota/period comparisons) — no gathers.
    Frames whose period exceeds half the frame hold < 2 complete cycles
    and cannot be measured; they report (0, valid=False) so the
    functionals exclude them instead of averaging zeros (OpenSMILE
    likewise needs >= 2 period peaks and skips frames without them —
    matters for f0 < ~63 Hz where no 512-sample frame fits 2 cycles).
    Returns ``(shimmer_db, valid)``.
    """
    n = yin_frames.shape[-1]
    tau = jnp.where(f0 > 0, sr / jnp.maximum(f0, 1.0), jnp.inf)  # samples
    j = jnp.arange(n, dtype=jnp.float32)
    cyc = jnp.floor(j / tau[..., None])                 # (..., T, n)
    ax = jnp.abs(yin_frames)
    peaks = []
    for i in range(max_cycles):
        peaks.append(jnp.max(jnp.where(cyc == i, ax, 0.0), axis=-1))
    a = jnp.stack(peaks, axis=-1)                       # (..., T, C)
    # pair i is valid when cycle i+1 ends inside the frame
    i_idx = jnp.arange(max_cycles - 1, dtype=jnp.float32)
    pair_ok = ((i_idx + 2.0) * tau[..., None] <= n) & voiced[..., None]
    ratio_db = jnp.abs(20.0 * (jnp.log10(a[..., 1:] + 1e-9)
                               - jnp.log10(a[..., :-1] + 1e-9)))
    s = jnp.sum(jnp.where(pair_ok, ratio_db, 0.0), axis=-1)
    cnt = jnp.sum(pair_ok.astype(jnp.float32), axis=-1)
    return (jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0),
            voiced & (cnt > 0))


# ---------------------------------------------------------------------------
# functionals -> 88-D vector
# ---------------------------------------------------------------------------

def egemaps_functionals(audio: jnp.ndarray,
                        cfg: EgemapsConfig = EgemapsConfig()) -> jnp.ndarray:
    """88-D eGeMAPS-style functional vector of ``audio (..., L)`` ->
    ``(..., 88)``, ordered per :data:`FEATURE_NAMES`."""
    lld = compute_llds(audio, cfg)
    return functionals_from_llds(lld, cfg)


def functionals_from_llds(
    lld: dict[str, jnp.ndarray],
    cfg: EgemapsConfig = EgemapsConfig(),
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Functionals over a precomputed LLD matrix, optionally restricted to
    ``frame_mask`` (..., T). Computing LLDs once and reducing under several
    masks is how the 3-offset concatenated-eGeMAPS feature is produced in a
    single pass (vs the reference's three OpenSMILE invocations,
    opensmile_extractor.py:460-502).

    Internally every contour is STACKED: one ``_sma3`` over a (..., 25, T)
    contour tensor, one masked mean/stddevNorm reduction over the
    (..., 33, T) (contour, mask) combinations, one percentile sort over
    the two 10-functional contours, one segment run-length scan over both
    voicing polarities, and a static permutation into FEATURE_NAMES
    order. At B=1 the per-frame cost is kernel-launch bound (~380
    sequential fusions measured on-chip before this layout), so folding
    ~90 small reductions into 4 wide ones is worth more than any
    arithmetic micro-optimization.
    """
    raw_voiced = lld["voiced"]
    if frame_mask is not None:
        voiced = raw_voiced & frame_mask
        all_mask = jnp.broadcast_to(frame_mask, voiced.shape)
    else:
        voiced = raw_voiced
        all_mask = jnp.ones_like(voiced)
    unvoiced = (~raw_voiced) & all_mask
    fp = cfg.hop_length / cfg.sample_rate  # frame period (s)
    shape = voiced.shape                   # (..., T)

    # sma3: smooth every contour before reducing (voiced-only for the
    # *nz* contours, all-frame for loudness/spectral) — matches the
    # OpenSMILE preprocessing the feature names advertise. Smoothing is
    # restricted to frames inside ``frame_mask`` so each offset window's
    # last frame never averages in the first excluded (future) frame —
    # the reference's separate truncated-audio OpenSMILE invocations
    # (opensmile_extractor.py:460-502) never see past the window end.
    nz_within = raw_voiced & all_mask
    # jitter/shimmer carry their own measurability masks (a voiced frame
    # whose period does not fit 2 cycles, or whose predecessor was
    # unvoiced, holds a 0 that is NOT a measurement) — smooth and reduce
    # strictly within the valid frames so unmeasurable frames are
    # excluded, not averaged as zeros (OpenSMILE skips them too)
    jit_mask = jnp.broadcast_to(
        lld.get("jitter_valid", raw_voiced) & all_mask, shape)
    shim_mask = jnp.broadcast_to(
        lld.get("shimmer_valid", raw_voiced) & all_mask, shape)
    fv = jnp.swapaxes(lld["formant_valid"], -1, -2)      # (..., 3, T)
    mfcc_t = jnp.swapaxes(lld["mfcc"], -1, -2)           # (..., 4, T)
    fmt_f = jnp.swapaxes(lld["formant_freq"], -1, -2)
    fmt_bw = jnp.swapaxes(lld["formant_bw"], -1, -2)
    fmt_rel = jnp.swapaxes(lld["formant_rel"], -1, -2)
    h1a3_mask = voiced & fv[..., 2, :]

    # ---- smoothing stack: (contour, within) rows -> ONE _sma3 ----
    sm_x: list[jnp.ndarray] = []
    sm_w: list[jnp.ndarray] = []

    def sm(x, within):
        sm_x.append(jnp.broadcast_to(x, shape))
        sm_w.append(jnp.broadcast_to(within, shape))
        return len(sm_x) - 1

    i_f0 = sm(lld["f0_semitone"], nz_within)
    i_loud = sm(lld["loudness"], all_mask)
    i_jit = sm(lld["jitter"], jit_mask)
    i_shim = sm(lld["shimmer_db"], shim_mask)
    i_hnr = sm(lld["hnr_db"], nz_within)
    i_h1h2 = sm(lld["h1_h2"], nz_within)
    i_h1a3 = sm(lld["h1_a3"], nz_within)
    i_fmt = [[sm(arr[..., i, :], nz_within & fv[..., i, :])
              for arr in (fmt_f, fmt_bw, fmt_rel)] for i in range(3)]
    i_spec = [sm(lld[k], all_mask)
              for k in ("alpha_ratio", "hammarberg", "slope_0_500",
                        "slope_500_1500", "spectral_flux")]
    i_mfcc = [sm(mfcc_t[..., k, :], all_mask) for k in range(4)]

    smoothed = _sma3(jnp.stack(sm_x, axis=-2),
                     within=jnp.stack(sm_w, axis=-2))    # (..., 25, T)

    # ---- distinct reduce masks, stacked once ----
    masks = jnp.stack(
        [jnp.broadcast_to(m, shape)
         for m in (voiced, all_mask, unvoiced, jit_mask, shim_mask,
                   h1a3_mask, voiced & fv[..., 0, :], voiced & fv[..., 1, :],
                   voiced & fv[..., 2, :])], axis=-2)    # (..., 9, T)
    MI_V, MI_ALL, MI_UNV, MI_JIT, MI_SHIM, MI_H1A3 = range(6)
    MI_FM = [6, 7, 8]

    # ---- mean + stddevNorm rows: (smoothed row, mask row) -> ONE pass ----
    red: list[tuple[int, int]] = []

    def r(row, mask_idx):
        red.append((row, mask_idx))
        return len(red) - 1

    r_jit = r(i_jit, MI_JIT)
    r_shim = r(i_shim, MI_SHIM)
    r_hnr = r(i_hnr, MI_V)
    r_h1h2 = r(i_h1h2, MI_V)
    r_h1a3 = r(i_h1a3, MI_H1A3)
    # formants: frames missing formant i are excluded, not counted as zeros
    r_fmt = [[r(i_fmt[i][t], MI_FM[i]) for t in range(3)] for i in range(3)]
    v_rows = i_spec + i_mfcc                      # alpha..flux, mfcc1-4
    r_vspec = [r(row, MI_V) for row in v_rows]
    r_allspec = [r(row, MI_ALL) for row in [i_spec[4]] + i_mfcc]
    r_unv = [r(row, MI_UNV) for row in i_spec]    # amean only (5)

    rows = jnp.take(smoothed, jnp.asarray([a for a, _ in red]), axis=-2)
    rmasks = jnp.take(masks, jnp.asarray([b for _, b in red]), axis=-2)
    means = _masked_mean(rows, rmasks)            # (..., 33)
    stdns = _stddev_norm(rows, rmasks)            # (..., 33)

    # ---- the two 10-functional contours (F0 voiced, loudness all) ----
    pf = jnp.take(smoothed, jnp.asarray([i_f0, i_loud]), axis=-2)
    pfm = jnp.stack([voiced, all_mask], axis=-2)
    p20, p50, p80 = _masked_percentiles(pf, pfm, (0.2, 0.5, 0.8))
    mean2 = _masked_mean(pf, pfm)
    stdn2 = _stddev_norm(pf, pfm)
    mr, sr_, mf_, sf = _slope_stats(pf, pfm, fp)
    stat_blocks = [mean2, stdn2, p20, p50, p80, p80 - p20, mr, sr_, mf_, sf]

    # ---- temporal (6) + equivalent sound level (1) ----
    duration = jnp.sum(all_mask, axis=-1) * fp
    loud = smoothed[..., i_loud, :]
    l_prev = jnp.concatenate([loud[..., :1], loud[..., :-1]], axis=-1)
    l_next = jnp.concatenate([loud[..., 1:], loud[..., -1:]], axis=-1)
    thresh = (_masked_mean(loud, all_mask)[..., None] * 1.1)
    peaks = (loud > l_prev) & (loud >= l_next) & (loud > thresh) & all_mask
    rate_peaks = jnp.sum(peaks, axis=-1) / duration

    maj = _majority3(raw_voiced)
    seg_masks = jnp.stack([maj & all_mask, (~maj) & all_mask], axis=-2)
    n_seg, mean_seg, std_seg = _segment_stats(seg_masks, fp)
    temporal = jnp.stack(
        [rate_peaks, n_seg[..., 0] / duration, mean_seg[..., 0],
         std_seg[..., 0], mean_seg[..., 1], std_seg[..., 1],
         10.0 * jnp.log10(
             _masked_mean(lld["frame_power"], all_mask) + 1e-12)], axis=-1)

    # ---- assemble FEATURE_NAMES order via one static permutation ----
    # pool layout: [10 stat blocks x (f0, loud)] [means 33] [stdns 33]
    # [temporal 7]
    pool = jnp.concatenate(stat_blocks + [means, stdns, temporal], axis=-1)
    n_stats = 2 * len(stat_blocks)
    o_mean, o_stdn, o_temp = n_stats, n_stats + len(red), n_stats + 2 * len(red)

    def ms(row):                       # mean, stddevNorm pair
        return [o_mean + row, o_stdn + row]

    perm: list[int] = []
    perm += [2 * b for b in range(10)]            # F0 (10)
    perm += ms(r_jit)                             # jitter (2)
    perm += [2 * b + 1 for b in range(10)]        # loudness (10)
    perm += ms(r_shim)                            # shimmer (2)
    perm += ms(r_hnr) + ms(r_h1h2) + ms(r_h1a3)   # HNR, H1-H2, H1-A3 (6)
    for i in range(3):                            # formants (18)
        for t in range(3):
            perm += ms(r_fmt[i][t])
    for row in r_vspec:                           # voiced spectral (18)
        perm += ms(row)
    perm += [o_mean + row for row in r_unv]       # unvoiced amean (5)
    for row in r_allspec:                         # all-frame spectral (10)
        perm += ms(row)
    perm += [o_temp + k for k in range(7)]        # temporal + eq level (7)

    out = jnp.take(pool, jnp.asarray(perm), axis=-1)
    assert out.shape[-1] == NUM_FEATURES, out.shape
    # OpenSMILE-style NaN/Inf scrub (reference opensmile_extractor.py:449-452)
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


#: keys in a :func:`compute_llds` dict whose trailing axes are (T, C)
#: rather than (T,) — used when broadcasting contours over an offsets axis
_CHANNEL_KEYS = frozenset(
    {"mfcc", "formant_freq", "formant_bw", "formant_rel", "formant_valid"})


def functionals_multi_offset(
    lld: dict[str, jnp.ndarray],
    cfg: EgemapsConfig,
    frame_masks: jnp.ndarray,
) -> jnp.ndarray:
    """Functionals under several offset masks in ONE pass: (..., 88 * n).

    ``frame_masks`` is (n_off, T) (or broadcastable to batch + (n_off, T));
    every LLD contour gains a broadcast offsets axis and the whole
    functionals stage runs once with offsets as a batch dimension, instead
    of once per offset — at B=1 streaming/full-window shapes the stage is
    kernel-launch bound, so this divides its cost by ~n_off. Output offset
    order matches ``concatenate([functionals(mask_i) for i ...], -1)``.
    """
    t = lld["voiced"].shape[-1]
    batch = lld["voiced"].shape[:-1]
    n_off = frame_masks.shape[-2]

    def expand(k, v):
        if k in _CHANNEL_KEYS:
            return jnp.broadcast_to(
                v[..., None, :, :], batch + (n_off,) + v.shape[-2:])
        return jnp.broadcast_to(v[..., None, :], batch + (n_off, t))

    lld_b = {k: expand(k, v) for k, v in lld.items()}
    mask = jnp.broadcast_to(frame_masks, batch + (n_off, t))
    out = functionals_from_llds(lld_b, cfg, frame_mask=mask)
    return jnp.reshape(out, batch + (n_off * NUM_FEATURES,))


_CALIBRATION_CACHE: dict = {}


def load_calibration(path: str | None = None) -> np.ndarray | None:
    """Per-feature affine calibration fitted against OpenSMILE goldens
    (scripts/egemaps_goldens.py report --fit-calibration).

    Returns an (88, 2) [scale, offset] array, or None when no
    calibration file has been recorded. Identity rows are used for
    features absent from the file. Cached per (path, mtime), so a table
    written or refreshed mid-process is picked up on the next call.
    """
    import json
    from pathlib import Path

    p = Path(path) if path else (Path(__file__).parent
                                 / "egemaps_calibration.json")
    if not p.exists():
        return None
    key = (str(p), p.stat().st_mtime_ns)
    if key in _CALIBRATION_CACHE:
        return _CALIBRATION_CACHE[key]
    table = json.loads(p.read_text())
    out = np.tile(np.asarray([1.0, 0.0], np.float32), (NUM_FEATURES, 1))
    for i, name in enumerate(FEATURE_NAMES):
        if name in table:
            out[i] = np.asarray(table[name], np.float32)
    _CALIBRATION_CACHE.clear()
    _CALIBRATION_CACHE[key] = out
    return out


def apply_calibration(feats: jnp.ndarray,
                      calibration: np.ndarray | None = None
                      ) -> jnp.ndarray:
    """Map our functionals onto the OpenSMILE scale: ``a * x + b`` per
    feature. No-op when no calibration is recorded. The in-model path
    stays uncalibrated (the downstream projection is trained end to end
    on our features); this is for consumers expecting OpenSMILE-scaled
    values from the extractor API."""
    calib = calibration if calibration is not None else load_calibration()
    if calib is None:
        return feats
    c = jnp.asarray(calib)
    d = feats.shape[-1]
    if d % NUM_FEATURES != 0:
        raise ValueError(
            f"apply_calibration expects a trailing dim that is a "
            f"multiple of {NUM_FEATURES} (88-D functionals or their "
            f"concatenations), got {d}")
    if d != NUM_FEATURES:
        c = jnp.tile(c, (d // NUM_FEATURES, 1))
    return feats * c[:, 0] + c[:, 1]


def egemaps_concat_windows(
    audio: jnp.ndarray,
    cfg: EgemapsConfig = EgemapsConfig(),
    offsets_sec: tuple[float, ...] = (0.0, 0.3, 0.6),
) -> jnp.ndarray:
    """Concatenated multi-offset functionals: (..., L) -> (..., 88 * len).

    For each offset ``o`` the functionals are computed over the window
    *ending* ``o`` seconds before the end of ``audio`` (reference
    opensmile_extractor.py:504-527: same 20 s buffer, ending earlier). LLDs
    are computed once; each offset is just a different frame mask — one
    pass on device instead of three library invocations.

    The reference's 264 -> 256 compression Linear lives in the *model* as a
    trained parameter (see DualStreamModelConfig.emotion_projection), fixing
    the untrained-lazy-Linear defect noted in SURVEY.md section 2.2.
    """
    lld = compute_llds(audio, cfg)
    t = lld["voiced"].shape[-1]
    fp = cfg.hop_length / cfg.sample_rate
    cuts = np.asarray([t - int(round(off / fp)) for off in offsets_sec])
    masks = jnp.arange(t)[None, :] < jnp.asarray(cuts)[:, None]  # (n_off, T)
    return functionals_multi_offset(lld, cfg, masks)
