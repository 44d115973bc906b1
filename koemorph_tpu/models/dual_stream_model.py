"""Production dual-stream models: audio in, blendshapes out, fully on-device.

Parity targets: reference src/model/simplified_dual_stream_model.py
(SimplifiedDualStreamModel: single-window forward + EMA smoothing with a
learnable alpha) and src/model/sequential_dual_stream_model.py
(SequentialDualStreamModel: sliding-window sequence decoding).

TPU-first redesign of the sequential forward (the reference drives a host
Python loop that recomputes librosa mel per window,
sequential_dual_stream_model.py:101-133):

1. The log-mel *power* spectrogram of the whole utterance is computed once
   (three GEMMs); a window's mel is a gather of 257 frame rows.
2. Per-window ``power_to_db(ref=max)`` normalization is a max-reduce and a
   subtract on the gathered window — no re-STFT.
3. All windows run through the attention core in parallel (one big batch on
   the MXU), because windows are independent given the emotion vector.
4. The exponential smoothing across windows is a *linear recurrence*,
   evaluated with ``jax.lax.associative_scan`` in O(log T) depth. Gradients
   match the reference exactly: the previous smoothed state enters through
   ``stop_gradient`` (reference detaches it,
   simplified_dual_stream_model.py:366).

Window-edge exactness: the reference re-runs STFT per window with reflect
padding at the window edges, so the first/last frame of each window differ
from the global STFT's interior frames (n_fft/2 = 512 < hop = 533, so
EXACTLY those two of the 257 rows). The global path therefore splices in
the two reflect-padded edge frames per window, computed directly from
gathered (n_fft,)-sample segments (2 extra DFT rows per window, ~1% more
STFT FLOPs) — the default decode is bit-equivalent to the reference's
per-window framing while still paying ONE global STFT for the 255 interior
rows. ``exact_window_stft=True`` keeps the brute-force per-window STFT as
the independent validation path. The streaming runtime intentionally keeps
interior-frame (real-sample, causal) semantics for rows it emits
incrementally — see runtime/streaming.py docstring for the bounded skew.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.features.emotion import EmotionFrontendConfig, emotion_features
from koemorph_tpu.models.dual_stream import DualStreamCrossAttention
from koemorph_tpu.features.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from koemorph_tpu.ops.frontend import LogMelFrontend
from koemorph_tpu.ops.stft import stft_power


@flax.struct.dataclass
class TemporalState:
    """EMA smoothing carry (replaces ``self.prev_blendshapes``)."""

    prev: jnp.ndarray         # (B, 52)
    initialized: jnp.ndarray  # (B,) bool — False until a frame has passed

    @classmethod
    def create(cls, batch_size: int, num_blendshapes: int = 52,
               dtype=jnp.float32) -> "TemporalState":
        return cls(prev=jnp.zeros((batch_size, num_blendshapes), dtype),
                   initialized=jnp.zeros((batch_size,), bool))

    def reset_where(self, mask: jnp.ndarray) -> "TemporalState":
        """Reset state for batch elements where ``mask`` is True (file
        boundaries in sequential training)."""
        return TemporalState(
            prev=jnp.where(mask[:, None], 0.0, self.prev),
            initialized=jnp.where(mask, False, self.initialized),
        )


class SimplifiedDualStreamModel(nn.Module):
    """Single-window dual-stream model: (B, L) audio -> (B, 52) frame.

    The mel and eGeMAPS frontends run inside the jitted forward; the
    264 -> 256 emotion compression is a trained Dense (fixing the
    reference's untrained lazy Linear, opensmile_extractor.py:587-604).
    """

    d_model: int = 256
    num_heads: int = 8
    num_blendshapes: int = 52
    sample_rate: int = 16000
    target_fps: int = 30
    mel_sequence_length: int = 256
    emotion_backend: str = "egemaps"   # egemaps | basic | precomputed
    #                                  # | emotion2vec (in-model wav2vec2)
    use_concatenation: bool = True
    # throughput knob: False trades the per-period jitter/shimmer tier
    # for ~25% faster batched decode (ops.egemaps.EgemapsConfig)
    egemaps_per_period: bool = True
    dropout: float = 0.1
    smoothing_alpha_init: float = 0.8
    stft_method: str = "matmul"        # matmul | rfft (see ops/frontend.py)
    use_learnable_weights: bool = True  # False: hard mouth/expression masks
    fusion_temperature: float = 1.0
    # emotion2vec backend: wav2vec2 encoder config (a compact trainable
    # default keeping the 1024-D contract; swap for the checkpoint's
    # config when loading pretrained weights via
    # features.wav2vec2.load_hf_checkpoint)
    emotion2vec_config: "Wav2Vec2Config" = Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=2, num_attention_heads=16,
        intermediate_size=2048)

    def _emotion_from_audio(self, audio: jnp.ndarray,
                            deterministic: bool = True) -> jnp.ndarray:
        """Raw emotion features computed inside the jitted forward.

        The emotion2vec branch embeds the wav2vec2 encoder as a trained
        Flax submodule (the reference runs torch Wav2Vec2 host-side,
        emotion2vec.py:96-122; here it is on-device and differentiable) —
        utterance mean pooling keeps the (B, 1024) contract. Other
        backends use the pure on-device feature functions.
        """
        if self.emotion_backend == "emotion2vec":
            feats = Wav2Vec2Encoder(
                self.emotion2vec_config, use_layer_fusion=True,
                name="emotion2vec")(audio, deterministic=deterministic)
            return jnp.mean(feats, axis=-2)            # (B, hidden)
        return emotion_features(audio, self.emotion_config)

    @property
    def mel_frontend(self) -> LogMelFrontend:
        return LogMelFrontend(
            sample_rate=self.sample_rate, target_fps=float(self.target_fps),
            n_fft=1024, n_mels=80, f_min=80.0, f_max=8000.0,
            style="librosa", stft_method=self.stft_method)

    @property
    def emotion_config(self) -> EmotionFrontendConfig:
        return EmotionFrontendConfig(
            backend=self.emotion_backend,
            use_concatenation=self.use_concatenation,
            sample_rate=self.sample_rate,
            egemaps_per_period=self.egemaps_per_period)

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate / self.target_fps)

    def _attention_module(self) -> DualStreamCrossAttention:
        return DualStreamCrossAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            num_mel_channels=80,
            mel_sequence_length=self.mel_sequence_length,
            mel_temporal_frames=3, emotion_dim=self.d_model,
            dropout=self.dropout, num_blendshapes=self.num_blendshapes,
            use_learnable_weights=self.use_learnable_weights,
            temperature=self.fusion_temperature,
            name="dual_stream_attention")

    def _project_emotion(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Raw backend features -> (B, d_model) compressed emotion vector."""
        return nn.Dense(self.d_model, name="emotion_projection")(raw)

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,                       # (B, L)
        state: Optional[TemporalState] = None,
        emotion_features_raw: Optional[jnp.ndarray] = None,  # (B, D_raw)
        return_attention: bool = False,
        deterministic: bool = True,
    ):
        from koemorph_tpu.ops.frontend import mel_with_temporal_detail

        # create the smoothing parameter unconditionally so init without a
        # temporal state still materializes it
        raw_alpha = self.param(
            "smoothing_alpha",
            lambda k: jnp.asarray(self.smoothing_alpha_init,
                                  dtype=jnp.float32))

        mel, detail = mel_with_temporal_detail(audio, self.mel_frontend)

        if emotion_features_raw is None:
            emotion_features_raw = self._emotion_from_audio(
                audio, deterministic=deterministic)
        emotion = self._project_emotion(emotion_features_raw)

        out = self._attention_module()(
            mel, detail, emotion, return_attention=return_attention,
            deterministic=deterministic)

        if state is not None:
            smoothed, state = _ema_step(
                out["blendshapes"], state, nn.sigmoid(raw_alpha))
            out["blendshapes"] = smoothed
            return out, state
        return out

    @nn.compact
    def apply_temporal_smoothing(
        self, blendshapes: jnp.ndarray, state: TemporalState
    ) -> tuple[jnp.ndarray, TemporalState]:
        """EMA with learnable alpha; first frame passes through unsmoothed
        (reference simplified_dual_stream_model.py:341-368). Standalone
        method entry point for the streaming runtime
        (``model.apply(params, ..., method='apply_temporal_smoothing')``)."""
        raw_alpha = self.param(
            "smoothing_alpha",
            lambda k: jnp.asarray(self.smoothing_alpha_init,
                                  dtype=jnp.float32))
        return _ema_step(blendshapes, state, nn.sigmoid(raw_alpha))


def _ema_step(blendshapes: jnp.ndarray, state: TemporalState,
              alpha: jnp.ndarray) -> tuple[jnp.ndarray, TemporalState]:
    """One EMA smoothing step; first frame passes through unsmoothed."""
    smoothed = alpha * blendshapes + (1 - alpha) * state.prev
    smoothed = jnp.where(state.initialized[:, None], smoothed, blendshapes)
    new_state = TemporalState(
        prev=jax.lax.stop_gradient(smoothed),
        initialized=jnp.ones_like(state.initialized))
    return smoothed, new_state


def _n_edge_frames(n_fft: int, hop: int) -> int:
    """Frames at each window end whose reflect-padded support differs
    from the global STFT: frame ``f`` reaches before the window start
    while ``f * hop < n_fft // 2`` (symmetrically at the end)."""
    return -(-(n_fft // 2) // hop)


@functools.lru_cache(maxsize=8)
def _edge_dft_matrices_np(n_fft: int, hop: int):
    """Mirror + hann + real-DFT folded into per-edge-frame matrices.

    Head frame ``f`` of a reflect-centered window reads sample offsets
    ``t = f*hop - n_fft//2 + i`` relative to the window start; ``t < 0``
    reflects to ``-t`` (librosa reflect, no edge repeat), so the frame is
    a LINEAR map of the window's first ``span+1`` samples
    (``span = (n_edge-1)*hop + n_fft//2``) — symmetrically for tail
    frames about the window's last sample. Folding the mirror, the hann
    window and the DFT basis into one ``(span+1, n_edge*n_bins)`` matrix
    turns edge-frame extraction into a single MXU GEMM on the gathered
    segments instead of materializing mirrored ``(…, n_fft)`` frames
    (measured ~3x cheaper at flagship decode shapes —
    docs/performance.md).

    Returns ``(head_cos, head_sin, tail_cos, tail_sin)`` float32 arrays
    of shape ``(span+1, n_edge*n_bins)``, accumulated in float64. Tail
    columns are ordered by ascending window frame
    ``W-n_edge+1 .. W``.
    """
    half = n_fft // 2
    n_edge = _n_edge_frames(n_fft, hop)
    span = (n_edge - 1) * hop + half
    n_bins = half + 1
    i = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * i * k / n_fft
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi
                              * np.arange(n_fft) / n_fft))[:, None]
    wc, ws = win * np.cos(ang), win * -np.sin(ang)   # (n_fft, n_bins)
    out = []
    for side in ("head", "tail"):
        mc = np.zeros((span + 1, n_edge, n_bins))
        ms = np.zeros_like(mc)
        for f in range(n_edge):
            if side == "head":
                t = f * hop - half + np.arange(n_fft)
                j = np.abs(t)                        # reflect about 0
            else:
                # ascending tail frames W-n_edge+1..W; frame W-fp has
                # offset o = i - fp*hop - half + 1 about the LAST sample
                fp = n_edge - 1 - f
                o = np.arange(n_fft) - fp * hop - half + 1
                j = span + np.where(o <= 0, o, -o)   # reflect about span
            np.add.at(mc[:, f], j, wc)
            np.add.at(ms[:, f], j, ws)
        out.append(
            (mc.reshape(span + 1, n_edge * n_bins).astype(np.float32),
             ms.reshape(span + 1, n_edge * n_bins).astype(np.float32)))
    (hc, hs), (tc, ts) = out
    return hc, hs, tc, ts


def _strided_segments(a: jnp.ndarray, start0: int, stride: int,
                      n: int, length: int) -> jnp.ndarray:
    """(B, L) -> (B, n, length) rows ``a[:, start0 + k*stride :][:length]``
    for a STATIC arithmetic grid, without a gather.

    Views the signal as ``stride``-sample blocks; segment k is the first
    ``length`` samples of blocks ``k .. k+q-1`` (``q = ceil(length /
    stride)``), so the rows assemble from one reshape plus ``q`` static
    block-slices concatenated on the sample axis — all fusable by XLA,
    unlike an element-wise gather of B*n*length scalars (measured ~3x
    the cost of the edge DFT GEMMs it feeds at the 30 fps bench shape).
    Pads with zeros past the end of ``a``; callers guarantee every real
    segment sample is in range, so padding only fills unused block tail.
    """
    b, L = a.shape
    if n == 1 or stride == 0:
        seg = a[:, start0:start0 + length]
        return seg[:, None, :]
    q = -(-length // stride)
    need = start0 + (n + q - 1) * stride
    if need > L:
        a = jnp.pad(a, ((0, 0), (0, need - L)))
    blocks = a[:, start0:start0 + (n + q - 1) * stride]
    blocks = blocks.reshape(b, n + q - 1, stride)
    seg = jnp.concatenate(
        [blocks[:, j:j + n] for j in range(q)], axis=-1)[:, :, :length]
    return seg


def _reflect_edge_rows(audio: jnp.ndarray, p, w_hop: int,
                       n_fft: int, hop: int,
                       fb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact reflect-padded log-mel dB rows of each window's two edges.

    The reference STFTs every window separately with librosa's reflect
    centering (sequential_dual_stream_model.py:101-133 via
    simplified_dual_stream_model.py:184-216); only the first and last
    ``n_edge = ceil(n_fft/2 / hop)`` frames of a window see reflected
    samples (one frame per end at 30 fps where hop 533 >= 512; two at
    60 fps where hop is 266) — every interior frame is identical to the
    global STFT's. Edge frames are computed as one GEMM per side against
    the folded mirror+hann+DFT matrices (:func:`_edge_dft_matrices_np`)
    over gathered ``span+1``-sample segments.

    Args:
        audio: (B, L) signal (already padded to cover every window).
        p: window start offsets in SAMPLES — a STATIC ``np.ndarray`` of
            shape (n,) (fixed-stride grid: gathers lower to static
            slices, measured ~3x faster than a dynamic gather) or a
            traced (B, n) int32 array (the ``window_starts`` path).
        w_hop: window length in samples (window_frames * hop).
        n_fft: transform size (even, n_fft // 2 < w_hop).
        hop: frame hop in samples.
        fb: (n_fft//2+1, n_mels) mel filterbank.

    Returns:
        (head_db, tail_db): (B, n, n_edge, n_mels) raw dB rows for window
        frames ``0..n_edge-1`` and ``W-n_edge+1..W``.
    """
    half = n_fft // 2
    n_edge = _n_edge_frames(n_fft, hop)
    span = (n_edge - 1) * hop + half     # real samples feeding one edge
    b = audio.shape[0]
    hc, hs, tc, ts = (jnp.asarray(m)
                      for m in _edge_dft_matrices_np(n_fft, hop))

    if isinstance(p, np.ndarray):        # static grid -> gather-free
        n = p.shape[0]
        stride = int(p[1] - p[0]) if n > 1 else 0
        uniform = n == 1 or bool(np.all(np.diff(p) == stride))
        if uniform:
            # Arithmetic grid: each (span+1)-sample segment is covered by
            # q = ceil((span+1)/stride) consecutive stride-blocks of the
            # signal, so the per-window segments assemble from a reshape
            # plus q static block-slices — no gather. The element-wise
            # gather of B*n*(span+1) scalars was the dominant cost of
            # this function on TPU (~0.64 of 0.69 ms at the bench shape;
            # the DFT GEMMs are ~0.2 ms).
            seg0 = _strided_segments(audio, int(p[0]), stride, n, span + 1)
            segw = _strided_segments(
                audio, int(p[0]) + w_hop - span - 1, stride, n, span + 1)
        else:
            ar = np.arange(span + 1)
            seg0 = jnp.take(audio, jnp.asarray(p[:, None] + ar), axis=1)
            segw = jnp.take(
                audio, jnp.asarray(p[:, None] + (w_hop - span - 1) + ar),
                axis=1)
    else:                                # traced starts -> dynamic gather
        ar = jnp.arange(span + 1, dtype=p.dtype)
        n = p.shape[1]

        def gather(idx):
            flat = jnp.take_along_axis(audio, idx.reshape(b, -1), axis=1)
            return flat.reshape(b, n, span + 1)

        seg0 = gather(p[..., None] + ar)
        segw = gather(p[..., None] + (w_hop - span - 1) + ar)

    def mel_rows(seg, c_m, s_m):
        cr = jnp.matmul(seg, c_m, precision="highest")
        si = jnp.matmul(seg, s_m, precision="highest")
        power = (cr * cr + si * si).reshape(b, n, n_edge, half + 1)
        melp = jnp.matmul(power, fb, precision="highest")
        return 10.0 * jnp.log10(jnp.maximum(melp, 1e-10))

    return mel_rows(seg0, hc, hs), mel_rows(segw, tc, ts)


_EMA_MATMUL_MAX_T = 2048


def _ema_associative(x_seq: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Forward EMA values s_t = alpha x_t + (1-alpha) s_{t-1}, s_0 = x_0,
    over axis 0.

    For sequences up to ``_EMA_MATMUL_MAX_T`` the recurrence is evaluated as
    one lower-triangular decay matmul — s = W x with
    W[t, k] = alpha (1-alpha)^(t-k) for 1 <= k <= t and W[t, 0] = (1-alpha)^t
    — a single MXU GEMM (~t^2 D FLOPs, ~3.4 MFLOP at the flagship decode's
    t=64) instead of an O(log t)-depth chain of small VPU kernels, which at
    decode shapes was latency- not FLOP-bound (~0.6 ms of a 3.6 ms decode).
    Longer sequences fall back to the affine-composition associative scan
    whose FLOPs stay O(t D). Callers consume the result under stop_gradient
    (the reference detaches the carried state each step,
    simplified_dual_stream_model.py:341-368), so the formulations also agree
    in the backward pass."""
    t = x_seq.shape[0]
    if t <= _EMA_MATMUL_MAX_T:
        dt = x_seq.dtype
        a = jnp.asarray(alpha, dt)
        idx = jnp.arange(t)
        diff = idx[:, None] - idx[None, :]
        decay = jnp.power(1.0 - a, jnp.maximum(diff, 0).astype(dt))
        w = jnp.where(diff >= 0, decay * a, jnp.zeros((), dt))
        # column 0 carries s_0 = x_0 (no alpha factor on the first frame)
        w = w.at[:, 0].set(decay[:, 0])
        s = jnp.matmul(w, x_seq.reshape(t, -1), precision="highest")
        return s.reshape(x_seq.shape)
    a = jnp.full((t,), 1.0 - alpha, x_seq.dtype).at[0].set(0.0)
    b = alpha * x_seq
    b = b.at[0].set(x_seq[0])
    a_b = jnp.broadcast_to(
        a.reshape((t,) + (1,) * (x_seq.ndim - 1)), x_seq.shape)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, s = jax.lax.associative_scan(combine, (a_b, b), axis=0)
    return s


class SequentialDualStreamModel(SimplifiedDualStreamModel):
    """Full-utterance decoding: (B, L) audio -> (B, T_out, 52) sequence."""

    stride_frames: int = 1
    decode_mode: str = "parallel"   # parallel | chunked ("scan" = chunked)
    window_chunk: int = 512         # windows per chunk in chunked mode
    exact_window_stft: bool = False  # reference-exact window-edge framing
    # "reflect" (default): splice the reference's reflect-padded edge
    # frames into the global-STFT windows — bit-equivalent to the
    # per-window framing, passes the <=1e-3 e2e gate, and since the
    # round-5 fusion (gather-free edge segments + never materializing
    # the spliced tensor) costs nothing over "interior" at the bench
    # decode shape (118.3k vs 116.0k frames/s — within scatter).
    # "interior": skip the splice (every frame sees real neighbor
    # samples); deviation vs the torch reference bounded <0.02 at the
    # edges — see docs/performance.md for the ladder.
    window_edge: str = "reflect"

    @property
    def window_frames(self) -> int:
        return self.mel_sequence_length

    @nn.compact
    def __call__(  # noqa: C901
        self,
        audio: jnp.ndarray,                # (B, L)
        emotion_features_raw: Optional[jnp.ndarray] = None,
        return_attention: bool = False,
        deterministic: bool = True,
        window_starts: Optional[jnp.ndarray] = None,
        return_raw: bool = False,
    ) -> dict[str, jnp.ndarray]:
        """``window_starts`` ((n,) or per-utterance (B, n) int frame
        indices, each <= L//hop - window_frames) overrides the fixed
        ``stride_frames`` grid — the progressive/adaptive-stride decode
        path (BASELINE.json config #5; schedules from
        :class:`~koemorph_tpu.data.sequential.StrideSchedule`). Rows
        must be temporally ordered (EMA smoothing runs across the window
        sequence). Requires the global-STFT path
        (``exact_window_stft=False``).

        ``return_raw=True`` adds the pre-smoothing per-window outputs as
        ``raw_blendshapes`` — the sequence-parallel decoder
        (:meth:`parallel.batched_decode.BatchedSequentialDecoder.
        decode_sequence_parallel`) decodes window shards on separate
        devices and replays the EMA recurrence over the stitched raw
        sequence, which chunk-local smoothing cannot produce."""
        b, audio_len = audio.shape
        hop = self.hop_length
        num_frames = audio_len // hop
        if self.window_edge not in ("reflect", "interior"):
            raise ValueError(
                f"window_edge must be 'reflect' or 'interior', "
                f"got {self.window_edge!r}")
        if window_starts is not None and self.exact_window_stft:
            raise ValueError(
                "window_starts requires the global-STFT path "
                "(exact_window_stft=False)")
        if window_starts is not None:
            n_out = window_starts.shape[-1]
        else:
            n_out = max(1, (num_frames - self.window_frames)
                        // self.stride_frames + 1)

        # ---- emotion once per sequence ----
        if emotion_features_raw is None:
            emotion_features_raw = self._emotion_from_audio(
                audio, deterministic=deterministic)
        emotion = self._project_emotion(emotion_features_raw)  # (B, d)

        # ---- mel power ----
        # pad so the last window has a full frame count (explicit
        # window_starts are already clipped to num_frames - window by the
        # caller, so the unpadded frame grid always covers them)
        if window_starts is None:
            needed = ((n_out - 1) * self.stride_frames
                      + self.window_frames) * hop
            if needed > audio_len:
                audio = jnp.pad(audio, ((0, 0), (0, needed - audio_len)))
        cfg = self.mel_frontend
        if self.exact_window_stft:
            # reference-exact edge semantics: STFT each window separately
            # with reflect padding at the WINDOW edges
            # (sequential_dual_stream_model.py:120 recomputes librosa mel
            # per window). Costs ~window/stride x more STFT FLOPs than
            # the global path; useful for parity validation and for
            # serving checkpoints trained by the reference itself.
            g = jnp.asarray(
                (np.arange(n_out) * self.stride_frames)[:, None] * hop
                + np.arange(self.window_frames * hop)[None, :])
            win_audio = jnp.take(audio, g, axis=1)   # (B, n, W*hop)
            win_audio = win_audio.reshape(b * n_out,
                                          self.window_frames * hop)
            spec_w = stft_power(win_audio, n_fft=cfg.n_fft,
                                hop_length=hop, center=True, power=2.0)
            melp = jnp.matmul(spec_w, cfg.filterbank(dtype=spec_w.dtype),
                              precision="highest")   # (B*n, W+1, 80)
            win_db = 10.0 * jnp.log10(jnp.maximum(melp, 1e-10))
            log_mel = win_db.reshape(b, n_out, self.window_frames + 1, 80)
        else:
            # ---- global mel power, one STFT ----
            spec = stft_power(audio, n_fft=cfg.n_fft, hop_length=hop,
                              center=True, power=2.0)    # (B, T+1, bins)
            fb = cfg.filterbank(dtype=spec.dtype)
            mel_power = jnp.matmul(spec, fb,
                                   precision="highest")   # (B, T+1, 80)
            log_mel = 10.0 * jnp.log10(jnp.maximum(mel_power, 1e-10))

        # ---- gather windows of 257 frames, normalize per window ----
        w_frames = self.window_frames + 1  # librosa yields W+1 centered frames
        starts = np.arange(n_out) * self.stride_frames

        attention = self._attention_module()

        def window_features(window_db):
            """(..., 257, 80) raw dB -> normalized (mel, detail)."""
            wmax = jnp.max(window_db, axis=(-2, -1), keepdims=True)
            norm = (jnp.maximum(window_db - wmax, -80.0) + 80.0) / 80.0
            return norm[..., : self.window_frames, :], norm[..., -3:, :]

        def spliced_features(windows, starts_samples):
            """window_features of the gathered windows with the first/last
            n_edge mel rows replaced by the reference's reflect-padded
            per-window STFT rows — the only rows where the global STFT
            differs (_reflect_edge_rows).

            The spliced ``(B, n, 257, 80)`` window tensor is NEVER built:
            the window max folds the tiny edge-row maxima into a
            statically-sliced interior reduce, and ``mel``/``detail`` are
            assembled per-output from static slices of the gathered
            windows plus the ``(B, n, n_edge, 80)`` edge rows. ``mel`` is
            materialized anyway as the attention dot input, so this path
            adds no full-size HBM buffer over ``window_edge="interior"``
            — the earlier concat/select formulations round-tripped the
            42 MB spliced buffer and cost ~27% of decode throughput
            (BENCH_r04 84.2k vs 115.9k frames/s; docs/performance.md)."""
            e0, ew = _reflect_edge_rows(
                audio, starts_samples, self.window_frames * hop,
                cfg.n_fft, hop, fb)
            ne = e0.shape[2]
            w = windows.shape[2]
            wmax = jnp.maximum(
                jnp.max(windows[:, :, ne:w - ne], axis=(-2, -1),
                        keepdims=True),
                jnp.maximum(
                    jnp.max(e0, axis=(-2, -1), keepdims=True),
                    jnp.max(ew, axis=(-2, -1), keepdims=True)))

            def norm(x):
                return (jnp.maximum(x - wmax, -80.0) + 80.0) / 80.0

            def rows(lo, hi):
                """Normalized spliced rows [lo, hi): row r comes from e0
                if r < ne, from ew if r >= w - ne, else from windows."""
                parts = []
                if lo < ne:
                    parts.append(norm(e0[:, :, lo:min(hi, ne)]))
                m_lo, m_hi = max(lo, ne), min(hi, w - ne)
                if m_lo < m_hi:
                    parts.append(norm(windows[:, :, m_lo:m_hi]))
                if hi > w - ne:
                    parts.append(norm(
                        ew[:, :, max(lo - (w - ne), 0):hi - (w - ne)]))
                return (jnp.concatenate(parts, axis=2)
                        if len(parts) > 1 else parts[0])

            return rows(0, self.window_frames), rows(w - 3, w)

        def decode_windows(start_idx: np.ndarray):
            """Decode the windows starting at these frame indices in one
            parallel batch; returns (raw (n, B, 52), extras)."""
            n = len(start_idx)
            if self.exact_window_stft:
                # per-window dB already materialized as (B, n_out, W+1, 80)
                sel = (start_idx // self.stride_frames).astype(np.int32)
                windows = jnp.take(log_mel, jnp.asarray(sel), axis=1)
            else:
                g = jnp.asarray(start_idx[:, None]
                                + np.arange(w_frames)[None, :])
                windows = jnp.take(log_mel, g, axis=1)    # (B,n,257,80)
            if not self.exact_window_stft and self.window_edge == "reflect":
                # static offsets -> static gather inside the splice
                mel_w, detail_w = spliced_features(
                    windows, np.asarray(start_idx) * hop)
            else:
                mel_w, detail_w = window_features(windows)
            # emotion rows are per-utterance; at inference the attention
            # module runs its emotion branch at B rows and repeats across
            # each utterance's n windows. In TRAINING mode the rows are
            # repeated here instead, so each window draws independent
            # dropout masks — sharing one realization across n windows
            # would weaken the emotion branch's regularization and zero
            # its intra-utterance variation under the velocity loss
            # (matches the reference, which always ran B*n rows).
            emo_rows = emotion if deterministic else jnp.repeat(
                emotion, n, axis=0)
            out = attention(
                mel_w.reshape(b * n, self.window_frames, 80),
                detail_w.reshape(b * n, 3, 80),
                emo_rows,
                return_attention=return_attention,
                deterministic=deterministic)
            raw = jnp.swapaxes(
                out["blendshapes"].reshape(b, n, -1), 0, 1)  # (n, B, 52)
            ex = {k: out[k].reshape((b, n) + out[k].shape[1:])
                  for k in ("mel_attention_weights",
                            "emotion_attention_weights") if k in out}
            return raw, ex

        def decode_windows_at(ws: jnp.ndarray):
            """Traced per-utterance window starts (B, n): one batched
            time-axis gather of the shared global mel (the only
            data-dependent indexing on this path), then the same
            attention batch as the fixed-stride grid."""
            n = ws.shape[1]
            g = (ws[:, :, None]
                 + jnp.arange(w_frames, dtype=ws.dtype)[None, None, :])
            windows = jnp.take_along_axis(
                log_mel, g.reshape(b, -1)[..., None], axis=1)
            windows = windows.reshape(b, n, w_frames, log_mel.shape[-1])
            if self.window_edge == "reflect":
                mel_w, detail_w = spliced_features(windows, ws * hop)
            else:
                mel_w, detail_w = window_features(windows)
            # emotion rows are per-utterance; at inference the attention
            # module runs its emotion branch at B rows and repeats across
            # each utterance's n windows. In TRAINING mode the rows are
            # repeated here instead, so each window draws independent
            # dropout masks — sharing one realization across n windows
            # would weaken the emotion branch's regularization and zero
            # its intra-utterance variation under the velocity loss
            # (matches the reference, which always ran B*n rows).
            emo_rows = emotion if deterministic else jnp.repeat(
                emotion, n, axis=0)
            out = attention(
                mel_w.reshape(b * n, self.window_frames, 80),
                detail_w.reshape(b * n, 3, 80),
                emo_rows,
                return_attention=return_attention,
                deterministic=deterministic)
            raw = jnp.swapaxes(
                out["blendshapes"].reshape(b, n, -1), 0, 1)
            ex = {k: out[k].reshape((b, n) + out[k].shape[1:])
                  for k in ("mel_attention_weights",
                            "emotion_attention_weights") if k in out}
            return raw, ex

        if window_starts is not None:
            ws = jnp.asarray(window_starts, jnp.int32)
            if ws.ndim == 1:
                ws = jnp.broadcast_to(ws[None, :], (b, n_out))
            raw_seq, extras = decode_windows_at(ws)
        elif self.decode_mode == "parallel" or n_out <= self.window_chunk:
            raw_seq, extras = decode_windows(starts)
        else:
            # chunked: bound activation memory to window_chunk windows per
            # attention batch (a static Python loop over chunks — flax-safe,
            # unlike calling the submodule inside a raw lax.scan)
            raws, chunk_extras = [], []
            for lo in range(0, n_out, self.window_chunk):
                r, ex = decode_windows(starts[lo:lo + self.window_chunk])
                raws.append(r)
                chunk_extras.append(ex)
            raw_seq = jnp.concatenate(raws, axis=0)
            extras = {
                k: jnp.concatenate([ex[k] for ex in chunk_extras], axis=1)
                for k in chunk_extras[0]
            }

        # ---- EMA smoothing across windows (associative scan) ----
        raw_alpha = self.param(
            "smoothing_alpha",
            lambda k: jnp.asarray(self.smoothing_alpha_init,
                                  dtype=jnp.float32))
        alpha = nn.sigmoid(raw_alpha)
        s = _ema_associative(raw_seq, alpha)
        # reference gradient semantics: prev state is detached per step
        s_prev = jax.lax.stop_gradient(
            jnp.concatenate([raw_seq[:1], s[:-1]], axis=0))
        smoothed = alpha * raw_seq + (1 - alpha) * s_prev
        smoothed = smoothed.at[0].set(raw_seq[0])

        results = {
            "blendshapes": jnp.swapaxes(smoothed, 0, 1),  # (B, T_out, 52)
            "num_frames": n_out,
            "fps": self.target_fps,
        }
        if return_raw:
            results["raw_blendshapes"] = jnp.swapaxes(raw_seq, 0, 1)
        if return_attention:
            results.update(extras)
        return results
