"""On-device F0 estimation (YIN with cumulative-mean normalization).

Replaces librosa.yin / librosa.pyin host calls (reference
src/features/prosody.py:118-126, src/features/emotion_extractor.py:521).

The difference function ``d(tau) = r0 + r_tau - 2 c(tau)`` is assembled
from MXU-friendly pieces: the cross-term ``c`` via the Wiener-Khinchin
autocorrelation identity as matmul DFTs (TPU has no native FFT), and the
energy terms ``r0``/``r_tau`` from a frame-local running energy — a
cumulative sum over the ``tau`` axis (length ``tau_max``) of slice
differences, NOT over the full frame axis. The frame-axis cumsum was the
single most expensive op in the round-2 eGeMAPS profile (~2 ms of the
8.4 ms LLD budget at the batched-decode operating point); the tau-axis
form is ~4x smaller and remains bit-reproducible across streaming chunk
boundaries because every quantity is computed per frame.

Voicing probability is derived from the CMNDF minimum (soft version of
pyin's voiced flag).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.window import frame_signal


class F0Result(NamedTuple):
    f0_hz: jnp.ndarray        # (..., T) — 0 where unvoiced
    voiced_prob: jnp.ndarray  # (..., T) in [0, 1]
    voiced_flag: jnp.ndarray  # (..., T) bool


class YinCore(NamedTuple):
    """yin_f0 result plus reusable intermediates (shared-work path for
    the eGeMAPS LLD chain, which needs the same frames and a longer-lag
    autocorrelation for HNR, plus sub-window period estimates for
    per-period jitter)."""

    result: F0Result
    frames: jnp.ndarray    # (..., T, frame_length) raw signal frames
    acf: jnp.ndarray       # (..., T, n_acf_lags) full-frame autocorrelation
    # sub-window waveform-matched periods (samples, sub-sample refined):
    # the period measured over the first / second half of the YIN
    # correlation window (~5.5 ms apart at 16 kHz / frame 512). Zeros
    # when subwindow_periods=False.
    period_first: jnp.ndarray   # (..., T)
    period_second: jnp.ndarray  # (..., T)
    # exact per-glottal-cycle periods (samples): cycle_period[..., k] is
    # the waveform-matched period between cycle k and cycle k+1 (cycle
    # boundaries at multiples of the frame-level period estimate), with
    # cycle_valid marking cycles whose compared samples fit inside the
    # frame. None when cycle_periods=0.
    cycle_period: Optional[jnp.ndarray] = None  # (..., T, K)
    cycle_valid: Optional[jnp.ndarray] = None   # (..., T, K) bool
    # frame-level YIN pick (integer lag, post-smoother) and its
    # sub-sample refinement — callers running the per-cycle machinery
    # on their own longer analysis frames (the eGeMAPS low-pitch jitter
    # path) reuse these instead of re-deriving the contour.
    pick: Optional[jnp.ndarray] = None          # (..., T) int32
    tau: Optional[jnp.ndarray] = None           # (..., T) float


@functools.lru_cache(maxsize=16)
def _tau_range(sample_rate: int, f0_min: float, f0_max: float
               ) -> tuple[int, int]:
    tau_min = max(int(sample_rate / f0_max), 1)
    tau_max = int(np.ceil(sample_rate / f0_min))
    return tau_min, tau_max


@functools.lru_cache(maxsize=8)
def _tri_ones_np(n: int) -> np.ndarray:
    # T[i, j] = 1 for j >= i, so x @ T is an inclusive prefix sum
    return np.triu(np.ones((n, n), np.float32))


def _cumsum_matmul(x: jnp.ndarray, precision: str) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis as a triangular matmul.

    XLA's native cumsum lowers to a VPU pass chain that measured ~0.08
    TF/s on the YIN lag axis (the single hottest op left in the round-3
    eGeMAPS profile at ~1 ms); the MXU runs the same reduction as a
    (..., n) x (n, n) triangular GEMM an order of magnitude faster for
    the short (~300-lag) axes YIN uses. At ``precision='high'`` the
    3-pass bf16 accumulation is within ~1e-6 relative of the sequential
    sum. Only sensible for short trailing axes (FLOPs scale as n^2).
    """
    tri = jnp.asarray(_tri_ones_np(x.shape[-1]), dtype=x.dtype)
    return jnp.matmul(x, tri, precision=precision)


def yin_frame_difference(frames: jnp.ndarray, tau_max: int,
                         precision: str = "highest") -> jnp.ndarray:
    """YIN difference function d(tau) for tau in [0, tau_max].

    Args:
        frames: (..., T, N) windowed signal frames; the correlation window is
            ``W = N - tau_max``.

    Returns:
        (..., T, tau_max + 1) difference values.
    """
    d, _acf, _c, _sub = _yin_difference_and_acf(frames, tau_max, tau_max + 1,
                                                precision)
    return d


#: static row-count bound for the stacked-ACF form. Below it the YIN
#: chain is kernel-launch bound (B=1 full-window = 850 rows: stacking
#: measured 0.33 -> 0.27 ms for the whole eGeMAPS call); above it the
#: separate right-sized transforms win (B=8 x 17 s = 13.6k rows: the
#: stacked form's ~47% extra DFT FLOPs and 4x-frames intermediate
#: measured 3.9 -> 4.3 ms). Shapes are static under jit, so this is a
#: trace-time branch.
_ACF_STACK_MAX_ROWS = 4096


def _corr_head(frames: jnp.ndarray, half: int, n_lags: int,
               precision: str = "high") -> jnp.ndarray:
    """Restricted cross term ``c(tau) = sum_{j < half} x_j x_{j+tau}`` for
    ``tau in [0, n_lags)`` via the Wiener-Khinchin sub-span pair:
    ``acf(x[:half + n_lags - 1]) - acf(that span's tail)``.

    The two DFT GEMM pairs spend ~10x the "useful" FLOPs
    (``half * n_lags`` ~= 32k MACs/row at the eGeMAPS shapes), which
    invites direct formulations — both were built and measured SLOWER
    at B=8 x 17 s (13.6k rows), so this stays the Wiener-Khinchin form:

    - unrolled static-slice multiply-adds: XLA does not fuse the chain;
      every partial sum materializes ((rows, n_lags) f32 each, ~3.5 GB
      of HBM traffic) — chain +5.5 ms.
    - one depthwise correlation (``conv_general_dilated`` with
      ``feature_group_count=rows``, each row's head as its own filter):
      1.8x faster STANDALONE (0.26 vs 0.46 ms, f32-exact at
      precision='high'), but chain-level +0.25 ms — the NCW reshape and
      conv layout block producer/consumer fusion with the neighboring
      ACF GEMMs, the same boundary effect that keeps the Pallas DK
      kernel out of the large-shape path (docs/performance.md).
    """
    from koemorph_tpu.ops.stft import autocorr_matmul

    sub = frames[..., : half + n_lags - 1]
    a1 = autocorr_matmul(sub, n_lags, precision=precision)
    a2 = autocorr_matmul(sub[..., half:], n_lags, precision=precision)
    return a1 - a2


def _yin_acfs(frames: jnp.ndarray, tau_max: int, n_lags: int,
              precision: str, subwindows: bool
              ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """Autocorrelations of the YIN spans: full frame at ``n_lags`` lags,
    tail (last ``tau_max`` samples), and — with ``subwindows`` — the
    first-half restricted cross term
    ``c_first(tau) = sum_{j < W/2} x_j x_{j+tau}`` at ``tau_max + 1``
    lags (what :func:`_subwindow_periods` actually consumes; the
    second half's term is ``c_all - c_first``).

    Small row counts compute all spans in ONE DFT GEMM pair, selecting
    each span by an in-place static mask rather than slice+pad — the ACF
    is shift-invariant, so masking within the frame gives identical lags
    while keeping every row the same length, and one (k*T, n) x (n, bins)
    GEMM replaces k separate launch-bound DFT pairs. Large row counts
    (see ``_ACF_STACK_MAX_ROWS``) keep separate right-sized transforms,
    with ``c_first`` from the sub-span pair in :func:`_corr_head` (see
    there for the direct formulations that measured slower)."""
    from koemorph_tpu.ops.stft import (acf_from_power, autocorr_matmul,
                                       power_spectrum_matmul)

    n = frames.shape[-1]
    w = n - tau_max
    half = w // 2
    rows = int(np.prod(frames.shape[:-1]))
    if rows <= _ACF_STACK_MAX_ROWS:
        spans = [(0, n), (w, n)]
        if subwindows:
            spans += [(0, half + tau_max), (half, half + tau_max)]
        iota = np.arange(n)
        masks = np.stack([((iota >= lo) & (iota < hi)).astype(np.float32)
                          for lo, hi in spans])            # (k, n)
        stacked = frames[..., None, :, :] * jnp.asarray(masks)[:, None, :]
        # non-circular for every row: support <= n, lags < n_lags
        n_fft = ((n + n_lags + 7) // 8) * 8
        power = power_spectrum_matmul(stacked, n_fft, precision=precision)
        acfs = acf_from_power(power, n_fft, n_lags, precision=precision)
        c_first = (acfs[..., 2, :, : tau_max + 1]
                   - acfs[..., 3, :, : tau_max + 1]) if subwindows else None
        return acfs[..., 0, :, :], acfs[..., 1, :, : tau_max + 1], c_first

    acf_full = autocorr_matmul(frames, n_lags, precision=precision)
    acf_tail = autocorr_matmul(frames[..., w:], tau_max + 1,
                               precision=precision)
    c_first = (_corr_head(frames, half, tau_max + 1, precision)
               if subwindows else None)
    return acf_full, acf_tail, c_first


def _yin_difference_and_acf(
    frames: jnp.ndarray, tau_max: int, n_acf_lags: int, precision: str,
    subwindows: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """(d(tau) for tau in [0, tau_max], full-frame acf[0, n_acf_lags),
    restricted cross-correlation c(tau) = sum_{j<W} x_j x_{j+tau},
    and — when ``subwindows`` — the (..., T, tau_max + 1) first-half
    cross term ``c_first`` for :func:`_subwindow_periods`).

    The full-frame autocorrelation is computed once at
    ``max(tau_max + 1, n_acf_lags)`` lags so callers needing longer lags
    (eGeMAPS HNR at the F0 lag) share the one DFT instead of running a
    second autocorrelation over the same frames.
    """
    n = frames.shape[-1]
    w = n - tau_max
    if w <= 0:
        raise ValueError(f"frame length {n} must exceed tau_max {tau_max}")

    # cross-term c(tau) = sum_{j<W} x_j x_{j+tau} via the 'smart' YIN
    # trick: full-frame autocorr minus the tail's autocorr. Matmul DFTs
    # (Wiener-Khinchin) — XLA's FFT lowering is ~100x slower here.
    acf_full, acf_tail, c_first = _yin_acfs(
        frames, tau_max, max(tau_max + 1, n_acf_lags), precision,
        subwindows)
    c = acf_full[..., : tau_max + 1] - acf_tail

    # energy terms, frame-locally: r0 = sum_{j<W} x_j^2 (one reduce);
    # r_tau(tau) = r_tau(tau-1) + x_{tau+W-1}^2 - x_{tau-1}^2, i.e. a
    # cumsum over the SHORT tau axis of a slice difference
    sq = frames * frames
    r0 = jnp.sum(sq[..., :w], axis=-1, keepdims=True)
    diff = sq[..., w:] - sq[..., : tau_max]         # (..., T, tau_max)
    r_tau = r0 + jnp.concatenate(
        [jnp.zeros_like(r0), _cumsum_matmul(diff, precision)], axis=-1)

    d = r0 + r_tau - 2.0 * c
    return jnp.maximum(d, 0.0), acf_full, c, c_first


def cmndf(d: jnp.ndarray, precision: str = "highest") -> jnp.ndarray:
    """Cumulative-mean-normalized difference function d'(tau)."""
    tau = jnp.arange(d.shape[-1], dtype=d.dtype)
    cum = _cumsum_matmul(d, precision)
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
    smoother: str = "none",
) -> F0Result:
    """Per-frame F0 of ``audio (..., L)`` -> (..., T) Hz.

    Frames with CMNDF minimum above ~3x threshold are marked unvoiced with
    f0 = 0 (librosa.pyin ``fill_na=0`` semantics). ``smoother="viterbi"``
    selects the octave-robust DP contour tracker (:func:`_viterbi_pick`).
    """
    return yin_core(
        audio, sample_rate=sample_rate, frame_length=frame_length,
        hop_length=hop_length, f0_min=f0_min, f0_max=f0_max,
        threshold=threshold, center=center, smoother=smoother).result


def yin_core(
    audio: jnp.ndarray,
    *,
    sample_rate: int = 16000,
    frame_length: int = 1024,
    hop_length: int = 160,
    f0_min: float = 50.0,
    f0_max: float = 400.0,
    threshold: float = 0.15,
    center: bool = True,
    n_acf_lags: Optional[int] = None,
    precision: str = "highest",
    subwindow_periods: bool = False,
    cycle_periods: int = 0,
    smoother: str = "none",
) -> YinCore:
    """:func:`yin_f0` plus the frames and full-frame autocorrelation it
    computed along the way (see :class:`YinCore`). ``n_acf_lags`` extends
    the returned autocorrelation beyond YIN's own ``tau_max + 1`` lags at
    marginal cost (the eGeMAPS HNR shares it instead of re-framing and
    re-transforming the same samples).

    ``subwindow_periods=True`` additionally refines the period over the
    first and second half of the correlation window independently
    (waveform matching restricted to each half, local dip around the
    frame-level pick, parabolic sub-sample refinement). The two
    estimates sit ~W/2 samples apart (~5.5 ms at 16 kHz / frame 512),
    i.e. at glottal-cycle granularity for speech F0 — the eGeMAPS
    per-period jitter is computed from their difference instead of
    from 10 ms frame-to-frame F0 deltas.

    ``smoother="viterbi"`` replaces YIN's per-frame first-dip pick with
    a dynamic-programming path over the top CMNDF dip candidates
    (:func:`_viterbi_pick`) — octave-robust contour tracking in the
    spirit of OpenSMILE's SHS+Viterbi pitch smoother (consumed by the
    reference via opensmile, src/features/opensmile_extractor.py:
    227-235). Off by default: the path couples frames, so chunked
    streaming calls smooth per block rather than globally, and the
    unsmoothed contour is the parity-pinned round-4 behavior."""
    if smoother not in ("none", "viterbi"):
        raise ValueError(f"smoother must be 'none' or 'viterbi', "
                         f"got {smoother!r}")
    tau_min, tau_max = _tau_range(sample_rate, f0_min, f0_max)
    if frame_length <= tau_max + 8:
        raise ValueError(
            f"frame_length {frame_length} too small for f0_min {f0_min} "
            f"(needs > {tau_max + 8})")

    frames = frame_signal(audio, frame_length, hop_length, center=center)
    d, acf, c_all, c_first = _yin_difference_and_acf(
        frames, tau_max, n_acf_lags or (tau_max + 1), precision,
        subwindows=subwindow_periods)
    dprime = cmndf(d, precision)

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
    if smoother == "viterbi":
        # periodicity hint from the GLOBAL CMNDF minimum (candidate-
        # independent): frames with no deep dip anywhere stay free
        # resets in the DP so noise cannot drag the contour
        rms_hint = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
        hint = (jnp.min(region, axis=-1) < 3.0 * threshold) & (
            rms_hint > 1e-4)
        pick = _viterbi_pick(dprime, tau_min=tau_min, voiced_hint=hint)

    # parabolic interpolation around pick — gather-free lookups
    # (ops/gatherless.py: the TPU row-loop gather this replaces measured
    # 1.5 ms at the batched-decode operating point)
    from koemorph_tpu.ops.gatherless import select_columns

    tau_max_idx = dprime.shape[-1] - 1
    i0 = jnp.clip(pick - 1, 0, tau_max_idx)
    i2 = jnp.clip(pick + 1, 0, tau_max_idx)
    ys = select_columns(dprime, jnp.stack([i0, pick, i2], axis=-1))
    y0, y1, y2 = ys[..., 0], ys[..., 1], ys[..., 2]
    denom = y0 - 2 * y1 + y2
    offset = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-12,
                                                   denom, 1.0),
                       0.0)
    offset = jnp.clip(offset, -1.0, 1.0)
    tau_refined = pick.astype(jnp.float32) + offset

    f0 = sample_rate / jnp.maximum(tau_refined, 1.0)
    dp_min = y1
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
    result = F0Result(f0_hz=f0, voiced_prob=voiced_prob, voiced_flag=voiced)

    if subwindow_periods:
        p1, p2 = _subwindow_periods(frames, tau_max, pick, c_all, precision,
                                    c_first)
    else:
        p1 = p2 = jnp.zeros_like(f0)
    if cycle_periods > 0:
        cp, cv = _per_cycle_periods(frames, tau_max, pick, tau_refined,
                                    cycle_periods)
    else:
        cp = cv = None
    return YinCore(result=result, frames=frames, acf=acf,
                   period_first=p1, period_second=p2,
                   cycle_period=cp, cycle_valid=cv,
                   pick=pick.astype(jnp.int32), tau=tau_refined)


def _viterbi_pick(dprime: jnp.ndarray, *, tau_min: int,
                  voiced_hint: jnp.ndarray,
                  n_candidates: int = 5,
                  transition_cost: float = 4.0,
                  octave_cost: float = 0.1) -> jnp.ndarray:
    """Octave-robust pitch pick: a Viterbi path over CMNDF dip candidates.

    Plain YIN decides each frame independently (first dip below
    threshold), so a creaky/diplophonic stretch — alternating-amplitude
    glottal cycles, whose CMNDF dips at BOTH the cycle lag and its
    double — flips the contour down an octave frame by frame. OpenSMILE
    tracks pitch with SHS candidates + a Viterbi smoother (consumed by
    the reference via opensmile, src/features/opensmile_extractor.py:
    227-235); this is the equivalent decision layer over YIN evidence:

    - candidates: the ``n_candidates`` best CMNDF local minima per frame
      (iterative masked argmin, a ±25%-of-period exclusion zone around
      each winner — pure elementwise passes, no gathers);
    - emission cost: the candidate's CMNDF value plus
      ``octave_cost * log2(lag / tau_min)`` (Praat-style mild preference
      for the higher-F0 interpretation of ambiguous evidence);
    - transition cost: ``transition_cost * |log2(lag_t / lag_{t-1})|``
      between consecutive frames that are both periodic
      (``voiced_hint``); unvoiced gaps reset the chain for free, so
      silence cannot drag the contour;
    - one forward ``lax.scan`` over frames (O(T * N^2) on (R, N, N)
      blocks), backpointer backtrack in a second reversed scan.

    Costs are calibrated against each other: a one-octave flip must beat
    ``2 * transition_cost`` (enter + leave) plus the per-frame octave
    bias, so brief subharmonic evidence rides through while a genuine
    sustained octave change (whose dips stay better for many frames)
    still wins — the DP is globally optimal, not sticky.

    Args:
        dprime: (..., T, n_lags) CMNDF.
        voiced_hint: (..., T) bool — frame shows periodicity at all.

    Returns:
        (..., T) int32 chosen lag (same units/range as the plain pick).
    """
    import jax
    from koemorph_tpu.ops.gatherless import select_columns

    lead = dprime.shape[:-2]
    t_frames, m = dprime.shape[-2], dprime.shape[-1] - tau_min
    region = dprime[..., tau_min:].reshape(-1, t_frames, m)
    hint = voiced_hint.reshape(-1, t_frames)
    r = region.shape[0]

    # ---- top-N local minima per frame (masked argmin extraction) ----
    iota = jnp.arange(m, dtype=jnp.float32)
    masked = region
    picks, vals = [], []
    for _ in range(n_candidates):
        cidx = jnp.argmin(masked, axis=-1)                  # (R, T)
        picks.append(cidx)
        vals.append(jnp.min(masked, axis=-1))
        # exclusion zone: ±25% of the winning period, so the same dip's
        # shoulder cannot reappear as a fresh candidate
        excl = 0.25 * (cidx.astype(jnp.float32) + tau_min)
        near = jnp.abs(iota - cidx[..., None].astype(jnp.float32)
                       ) < excl[..., None]
        masked = jnp.where(near, jnp.inf, masked)
    cand = jnp.stack(picks, axis=-1) + tau_min              # (R, T, N)
    emit = jnp.stack(vals, axis=-1)                         # (R, T, N)
    ltau = jnp.log2(cand.astype(jnp.float32))
    emit = emit + octave_cost * (ltau - np.log2(tau_min))
    # exhausted extraction slots (all-inf remainder) must never win
    emit = jnp.where(jnp.isfinite(emit), emit, 1e9)

    # ---- forward DP over frames ----
    link = (hint[:, 1:] & hint[:, :-1]).astype(jnp.float32)  # (R, T-1)
    link = jnp.concatenate([jnp.zeros((r, 1), jnp.float32), link], axis=1)

    def fwd(carry, inp):
        cost_prev, ltau_prev = carry
        e_t, lt_t, lk_t = inp
        trans = (transition_cost
                 * jnp.abs(lt_t[:, None, :] - ltau_prev[:, :, None])
                 * lk_t[:, None, None])                     # (R, Np, N)
        total = cost_prev[:, :, None] + trans
        bp = jnp.argmin(total, axis=1).astype(jnp.int32)    # (R, N)
        cost = e_t + jnp.min(total, axis=1)
        # renormalize so long utterances cannot overflow f32; argmins
        # are shift-invariant
        cost = cost - jnp.min(cost, axis=-1, keepdims=True)
        return (cost, lt_t), bp

    e_seq = jnp.moveaxis(emit, 1, 0)                        # (T, R, N)
    l_seq = jnp.moveaxis(ltau, 1, 0)
    k_seq = jnp.moveaxis(link, 1, 0)
    (cost_t, _), bps = jax.lax.scan(
        fwd, (e_seq[0], l_seq[0]), (e_seq[1:], l_seq[1:], k_seq[1:]))

    # ---- backtrack ----
    n_last = jnp.argmin(cost_t, axis=-1).astype(jnp.int32)  # (R,)

    def back(n_next, bp_t):
        n_t = select_columns(bp_t.astype(jnp.float32),
                             n_next[:, None])[:, 0].astype(jnp.int32)
        return n_t, n_t

    _n0, path_head = jax.lax.scan(back, n_last, bps, reverse=True)
    path = jnp.concatenate([path_head, n_last[None]], axis=0)  # (T, R)
    path = jnp.moveaxis(path, 0, 1)                            # (R, T)
    chosen = select_columns(cand.astype(jnp.float32),
                            path[..., None])[..., 0]
    return chosen.astype(jnp.int32).reshape(lead + (t_frames,))


def _refine_period_local(d_sub: jnp.ndarray, pick: jnp.ndarray,
                         half_width: int = 8) -> jnp.ndarray:
    """Sub-sample period from a (sub-window) difference function: local
    minimum of ``d_sub`` within ``pick +/- half_width`` lags, parabolic
    refinement. Gather-free — and cheaper than a ``select_columns`` window
    fetch: the window is CONTIGUOUS, so a range mask + masked argmin/min
    costs 1 x N lanes instead of the one-hot's (2w+1) x N (this pair of
    lookups was the single hottest fusion of the B=1 chain, 0.16 ms of a
    0.53 ms call, in the round-3 device trace)."""
    from koemorph_tpu.ops.gatherless import select_columns

    n = d_sub.shape[-1]
    iota = jnp.arange(n, dtype=pick.dtype)
    lo = jnp.clip(pick - half_width, 1, n - 2)[..., None]
    hi = jnp.clip(pick + half_width, 1, n - 2)[..., None]
    masked = jnp.where((iota >= lo) & (iota <= hi), d_sub, jnp.inf)
    # first-minimum semantics match the select_columns window argmin
    # (clipped duplicate edge reads resolved to the same lag)
    center = jnp.argmin(masked, axis=-1).astype(pick.dtype)
    y1 = jnp.min(masked, axis=-1)
    # 2-column lookup for the parabola neighbors around the local min
    duo = jnp.stack([jnp.clip(center - 1, 0, n - 1),
                     jnp.clip(center + 1, 0, n - 1)], axis=-1)
    ys = select_columns(d_sub, duo)
    y0, y2 = ys[..., 0], ys[..., 1]
    denom = y0 - 2 * y1 + y2
    off = jnp.where(jnp.abs(denom) > 1e-12,
                    0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-12,
                                                denom, 1.0), 0.0)
    return center.astype(jnp.float32) + jnp.clip(off, -1.0, 1.0)


def _shift_rows(x: jnp.ndarray, shift: jnp.ndarray, n_out: int,
                s_max: int) -> jnp.ndarray:
    """``z[r, j] = x[r, j + shift[r]]`` without a gather.

    The per-row shift is decomposed into its binary digits; each digit
    is one ``where`` between two STATIC overlapping slices, so the
    whole shift is ``ceil(log2(s_max))`` fused elementwise passes. The
    equivalent row gather (vmapped ``dynamic_slice``) measured 12.2 ms
    at the 13.6k-row batched-decode shape — TPU gathers serialize —
    vs ~2 orders less for the select-shift chain.

    Args:
        x: (rows, >= n_out + 2^ceil(log2(s_max+1)) - 1) source rows
            (zero-pad to cover the deepest shift).
        shift: (rows,) int32 in [0, s_max].
        n_out: output row length.

    Returns:
        (rows, n_out) shifted rows.
    """
    n_bits = max(int(np.ceil(np.log2(s_max + 1))), 1)
    steps = [1 << b for b in reversed(range(n_bits))]
    need = n_out + sum(steps)
    if x.shape[-1] < need:
        raise ValueError(f"source length {x.shape[-1]} < required {need}")
    z = x[..., :need]
    for i, step in enumerate(steps):
        keep = n_out + sum(steps[i + 1:])
        bit = (shift & step) > 0
        z = jnp.where(bit[..., None], z[..., step:step + keep],
                      z[..., :keep])
    return z


def _cycle_dsum(frames: jnp.ndarray, start: jnp.ndarray,
                tau: jnp.ndarray, *, tau_max: int, n_cycles: int,
                half_lag: int,
                off: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cycle-restricted difference sums d(k, o).

    The pick-aligned comparison span comes from the gather-free
    :func:`_shift_rows`, the search offsets become static overlapping
    slices, and the per-cycle reduction is one masked
    ``(K, J) x (J, L)`` einsum — mask build and squared differences
    fuse into its operands. Measured 2.1 ms at the 13.6k-row
    batched-decode shape (the vmapped-dynamic-slice + einsum first cut
    measured 16.5 ms, 12.2 of it the row gather alone).

    Args:
        frames: (rows, n) raw YIN frames.
        start: (rows,) int32 comparison-span starts (pick - half_lag).
        tau: (rows,) float frame-level refined periods.
        off: optional (rows,) float cycle-grid phase offsets — cycle k
            occupies ``[off + k*tau, off + (k+1)*tau)`` (0 when None).

    Returns:
        (rows, n_cycles, 2*half_lag + 1) float32 sums.
    """
    import jax

    rows, n = frames.shape
    n_lag = 2 * half_lag + 1
    span = n - n_lag + 1
    s_max = tau_max + half_lag
    n_bits = max(int(np.ceil(np.log2(s_max + 1))), 1)
    pad = (1 << n_bits) - 1          # zero tail covering every digit
    padded = jnp.concatenate(
        [frames, jnp.zeros((rows, pad), frames.dtype)], axis=-1)
    z = jax.lax.optimization_barrier(_shift_rows(padded, start, n, s_max))
    if off is None:
        off = jnp.zeros((rows,), jnp.float32)

    def _xla(fr, zz, st, tu, of):
        x_head = fr[..., :span]                              # (R, J)
        zs = jnp.stack([zz[..., o:o + span] for o in range(n_lag)],
                       axis=-1)                              # (R, J, L)
        e = (x_head[..., None] - zs) ** 2

        iota = jnp.arange(span, dtype=jnp.float32)
        k_idx = jnp.arange(n_cycles, dtype=jnp.float32)[:, None]  # (K, 1)
        tau_b = tu[..., None, None]                          # (R, 1, 1)
        off_b = of[..., None, None]
        start_b = st[..., None, None].astype(jnp.float32)
        # boundaries as off + k*tau / off + (k+1)*tau, EXACTLY like the
        # Pallas kernel's per-k compares (same rounding behavior)
        in_cycle = ((iota >= off_b + k_idx * tau_b)
                    & (iota < off_b + (k_idx + 1.0) * tau_b))
        # the compared sample x_{j + start + o} must be a real sample
        # for EVERY search offset (o <= 2*half_lag), so the mask is
        # offset-independent
        sample_ok = iota <= (n - 1.0) - 2.0 * half_lag - start_b
        m = (in_cycle & sample_ok).astype(fr.dtype)          # (R, K, J)
        return jnp.einsum("...kj,...jl->...kl", m, e,
                          precision="highest")               # (R, K, L)

    def _pallas(fr, zz, st, tu, of):
        from koemorph_tpu.ops.pallas.cycle_dsum_kernel import (
            cycle_dsum_lanes_pallas)

        return cycle_dsum_lanes_pallas(fr, zz, st, tu, of,
                                       n_cycles=n_cycles,
                                       half_lag=half_lag, tau_max=tau_max)

    # the XLA form materializes the shifted-difference tensor and cycle
    # masks in HBM (~1.4 GB / 3.2 ms at the 13.6k-row batched-decode
    # shape for ~2 GFLOP); the Pallas kernel keeps them in VMEM.
    # Dispatch keys off the LOWERING platform (not the default backend)
    # so CPU-placed executions on a TPU host take the XLA form —
    # pallas_call has no compiled CPU lowering.
    return jax.lax.platform_dependent(frames, z, start, tau, off,
                                      tpu=_pallas, default=_xla)


def _per_cycle_periods(frames: jnp.ndarray, tau_max: int,
                       pick: jnp.ndarray, tau: jnp.ndarray,
                       n_cycles: int, half_lag: int = 8,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-glottal-cycle period estimates by waveform matching
    (OpenSMILE's jitterLocal segmentation, reference
    src/features/opensmile_extractor.py eGeMAPS jitter rows).

    Cycle ``k`` occupies samples ``[off + k*tau, off + (k+1)*tau)`` of
    the frame, where ``off`` phase-aligns the grid so the first cycle's
    dominant waveform peak sits mid-window (OpenSMILE segments between
    pitch marks; boundaries from the frame-level period estimate
    ``tau`` — arithmetic iota masks, no gathers). Its period is the lag
    minimizing the cycle-restricted difference function

        d_k(o) = sum_{j in cycle k} (x_j - x_{j + pick - half_lag + o})^2

    over a ``±half_lag``-sample search band around the frame-level YIN
    pick, parabolically refined to sub-sample precision. Unlike the
    half-window estimates (:func:`_subwindow_periods`, which average over
    >=2 cycles at low pitch), this measures CONSECUTIVE cycle periods —
    alternating-period (diplophonic) jitter that window averaging
    cancels is recovered at full amplitude.

    TPU shape: fully gather-free — the pick-aligned comparison span
    comes from a binary select-shift chain (:func:`_shift_rows`; the
    row gather it replaces was 12.2 of the 16.5 ms first-cut cost at
    the batched-decode shape), the ``2*half_lag + 1`` lag offsets
    become static overlapping slices of it, and the per-cycle
    reduction is a masked ``(K, J) x (J, L)`` einsum per frame
    (:func:`_cycle_dsum`).

    Args:
        frames: (..., T, n) raw signal frames.
        pick: (..., T) int frame-level period lag (pre-refinement).
        tau: (..., T) float sub-sample refined frame-level period.

    Returns:
        (periods (..., T, n_cycles) float samples,
         valid (..., T, n_cycles) bool — cycle k and its comparison
         samples fully inside the frame).
    """
    from koemorph_tpu.ops.gatherless import select_columns

    n = frames.shape[-1]
    n_lag = 2 * half_lag + 1
    # z(j) = x[j + pick - half_lag] (pick >= tau_min > half_lag for
    # every supported f0_max, so the start never clips at 0; zero tail
    # padding covers the high end)
    start = jnp.clip(pick - half_lag, 0, tau_max + half_lag)
    import jax

    # phase-align the cycle grid to the first cycle's dominant |x| peak
    # so cycle windows CENTER the glottal pulses (OpenSMILE segments
    # between pitch marks; a fixed-phase grid straddles or misses
    # pulses — at 20% duty cycle that alternated 2-pulse and 0-pulse
    # windows, invalidating most cycles via the band-edge check).
    # One masked argmax per frame, fused elementwise — no gathers.
    iota_n = jnp.arange(n, dtype=jnp.float32)
    m0 = iota_n < jnp.ceil(tau)[..., None]
    p0 = jnp.argmax(jnp.where(m0, jnp.abs(frames), -1.0),
                    axis=-1).astype(jnp.float32)
    grid_off = jnp.maximum(p0 - 0.5 * tau, 0.0)

    d = _cycle_dsum(frames.reshape(-1, n),
                    start.reshape(-1).astype(jnp.int32),
                    tau.reshape(-1), tau_max=tau_max,
                    n_cycles=n_cycles, half_lag=half_lag,
                    off=grid_off.reshape(-1))
    d = d.reshape(frames.shape[:-1] + (n_cycles, n_lag))
    # d feeds argmin/min AND the parabola's neighbor lookups; the
    # barrier keeps the einsum from being re-fused into each consumer
    d = jax.lax.optimization_barrier(d)

    o_star = jnp.argmin(d, axis=-1)
    y1 = jnp.min(d, axis=-1)
    duo = jnp.stack([jnp.clip(o_star - 1, 0, n_lag - 1),
                     jnp.clip(o_star + 1, 0, n_lag - 1)], axis=-1)
    ys = select_columns(d, duo)
    y0, y2 = ys[..., 0], ys[..., 1]
    denom = y0 - 2.0 * y1 + y2
    off = jnp.where(jnp.abs(denom) > 1e-12,
                    0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-12,
                                                denom, 1.0), 0.0)
    # the measured lag IS start + o (d_k(o) compares x_j with
    # x_{j + start + o}), so the clipped slice start keeps this exact
    # even for configs where pick - half_lag would clip at 0
    periods = (start.astype(jnp.float32)[..., None]
               + o_star.astype(jnp.float32) + jnp.clip(off, -1.0, 1.0))

    k_row = jnp.arange(n_cycles, dtype=jnp.float32)
    # the in-cycle mask (_cycle_dsum) includes samples up to
    # ceil(off + (k+1)*tau) - 1, so validity must bound that exact
    # sample — (k+1)*tau - 1 would mark a cycle valid while sample_ok
    # zeroes its final sample for non-integer tau
    last_sample = jnp.ceil(grid_off[..., None]
                           + (k_row + 1.0) * tau[..., None]) - 1.0
    # band-edge argmin (o_star at 0 or n_lag-1) means the true period
    # lies outside the ±half_lag search band and the estimate saturated
    # at pick±half_lag — mark the cycle invalid rather than feed a
    # clamped period into the jitter mean (strong diplophonia case)
    in_band = (o_star > 0) & (o_star < n_lag - 1)
    valid = ((tau[..., None] > 0) & in_band
             & (last_sample
                + start.astype(jnp.float32)[..., None] + 2.0 * half_lag
                <= n - 1.0))
    return periods, valid


def _subwindow_periods(frames: jnp.ndarray, tau_max: int,
                       pick: jnp.ndarray, c_all: jnp.ndarray,
                       precision: str, c_first: jnp.ndarray,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform-matched period over each half of the YIN correlation
    window: d_half(tau) = sum over the half's samples of
    (x_j - x_{j+tau})^2, evaluated exactly like the main difference
    function but with the correlation restricted to j < W/2 (first) or
    W/2 <= j < W (second). ``c_all`` is the full-window cross term and
    ``c_first`` the first half's restricted cross term, both already
    computed by the main pass (stacked DFT at small shapes, the
    sub-span ACF pair at large ones — see :func:`_yin_acfs`)."""
    n = frames.shape[-1]
    w = n - tau_max
    half = w // 2

    c_second = c_all - c_first

    # energy terms per half, frame-locally (see _yin_difference_and_acf)
    sq = frames * frames
    def _energy(lo, count):
        r0 = jnp.sum(sq[..., lo: lo + count], axis=-1, keepdims=True)
        diff = (sq[..., lo + count: lo + count + tau_max]
                - sq[..., lo: lo + tau_max])
        return r0, r0 + jnp.concatenate(
            [jnp.zeros_like(r0), _cumsum_matmul(diff, precision)], axis=-1)

    r0_1, rtau_1 = _energy(0, half)
    r0_2, rtau_2 = _energy(half, w - half)
    d1 = jnp.maximum(r0_1 + rtau_1 - 2.0 * c_first, 0.0)
    d2 = jnp.maximum(r0_2 + rtau_2 - 2.0 * c_second, 0.0)
    return (_refine_period_local(d1, pick), _refine_period_local(d2, pick))
