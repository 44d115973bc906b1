"""Real-time streaming inference: incremental mel, on-device ring buffers.

Parity targets: reference scripts/rt.py:241 (RealTimeInference),
scripts/rt_simplified.py:315 (SimplifiedRealTimeInference),
src/features/mel_sliding_window.py (MelAudioBuffer / MelSlidingWindowExtractor)
and src/features/opensmile_extractor.py:29 (AudioBuffer).

TPU-first redesign (SURVEY.md section 5.7): the reference keeps lock-guarded
circular numpy buffers on the host and *recomputes the full 8.5 s mel window
with librosa every frame* (mel_sliding_window.py:280-295). Here every piece
of streaming state is an explicit JAX carry (:class:`StreamState`) living in
HBM, and the per-frame step is ONE jitted function that:

1. shifts ``hop`` new samples into a 20 s audio ring (emotion context),
2. computes only the ONE new STFT/mel frame the hop makes available — a
   (1, n_fft) x (n_fft, bins) matmul — and rolls it into the (W+1, 80) dB
   ring (the reference's full-window recompute is O(W) redundant work),
3. re-normalizes the window (per-window ``power_to_db ref=max`` semantics:
   normalization is a subtract of the window max, so keeping *raw* dB rows
   makes the incremental update exact),
4. refreshes the eGeMAPS emotion vector every ``emotion_update_frames``
   frames under ``lax.cond`` (300 ms cadence,
   reference opensmile_extractor.py update_interval),
5. runs the dual-stream attention decode and the learnable-alpha EMA smooth.

Streaming frame semantics: mel row ``t`` is the STFT frame centered at
``t*hop`` computed from real samples only (no reflect padding), so the
stream runs one frame (~33 ms) behind the newest audio. The batch decoder
additionally splices the reference's reflect-padded window-edge frames
(models/dual_stream_model.py ``_reflect_edge_rows``) — a causal stream
cannot reproduce those (the reflection at the window's trailing edge uses
samples that ARE the newest audio), so the batch/stream skew is bounded to
the first/last ``ceil(n_fft/2 / hop)`` rows of the 257-row window, whose
reflected halves the interior rows replace with real samples.

Inherited train/serve skew (present in the reference too): training
extracts the emotion vector over the training span (~the 8.5 s model
window, or the full utterance in the reference), while streaming refreshes
it over ``emotion_context_s`` (20 s, the reference's production buffer,
opensmile_extractor.py). eGeMAPS functionals are window statistics, so
their distribution shifts with context length; set
``emotion_context_s`` to the training span length if exact
train/serve matching matters more than long-context emotion.

There are no locks anywhere on the device path by construction; the only
shared-memory boundary left is the host audio queue (see runtime/audio.py).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.features.emotion import EmotionFrontendConfig, emotion_features
from koemorph_tpu.features.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from koemorph_tpu.models.dual_stream import DualStreamCrossAttention
from koemorph_tpu.models.dual_stream_model import TemporalState, _ema_step
from koemorph_tpu.ops.egemaps import (
    EgemapsConfig,
    LldCarry,
    compute_lld_block,
    functionals_multi_offset,
    init_lld_ring,
    roll_lld_ring,
    silence_lld_carry,
)
from koemorph_tpu.ops.mel import mel_filterbank
from koemorph_tpu.ops.stft import dft_matrices
from koemorph_tpu.ops.window import hann_window

__all__ = ["StreamingConfig", "StreamState", "StreamingInference",
           "init_stream_state", "stream_frame"]


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    """Static streaming parameters (must match the trained model)."""

    sample_rate: int = 16000
    target_fps: int = 30
    window_frames: int = 256          # mel context (256 = 8.53 s at 30 fps)
    n_fft: int = 1024
    n_mels: int = 80
    f_min: float = 80.0
    f_max: float = 8000.0
    d_model: int = 256
    num_heads: int = 8
    num_blendshapes: int = 52
    emotion_backend: str = "egemaps"
    use_concatenation: bool = True
    emotion_context_s: float = 20.0   # emotion audio ring length
    emotion_update_frames: int = 9    # ~300 ms at 30 fps
    # Incremental eGeMAPS: keep a device-resident LLD ring and, on each
    # refresh, compute only the LLD rows the refresh interval made
    # available (~30 rows at 10 ms hop) instead of re-deriving 20 s of
    # LLDs; functionals then reduce over the ring. ~3x cheaper refresh
    # (the reference recomputes its whole OpenSMILE buffer every update,
    # opensmile_extractor.py:460-502).
    incremental_lld: bool = True
    # fusion knobs — MUST match the trained model's settings
    use_learnable_weights: bool = True
    fusion_temperature: float = 1.0
    # emotion2vec backend: the in-model wav2vec2 encoder re-runs over the
    # whole emotion ring at every refresh under the same lax.cond cadence
    # (the encoder is bidirectional — conv frontend + full self-attention
    # — so there is no exact incremental form; at the 300 ms cadence the
    # refresh cost is amortized 1/emotion_update_frames per frame). Must
    # match the trained model's emotion2vec_config.
    emotion2vec_config: Wav2Vec2Config = Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=2, num_attention_heads=16,
        intermediate_size=2048)

    def __post_init__(self):
        if self.emotion_backend not in ("egemaps", "basic", "emotion2vec"):
            raise ValueError(
                f"streaming supports emotion_backend 'egemaps', 'basic' "
                f"or 'emotion2vec', got {self.emotion_backend!r}")

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate / self.target_fps)

    @property
    def emotion_margin_samples(self) -> int:
        """Extra ring length for the shifted-window offsets (0.6 s at the
        default 0/0.3/0.6 s intervals)."""
        return int(max(self.emotion_config.window_offsets)
                   * self.sample_rate)

    @property
    def emotion_ring_len(self) -> int:
        # context + shifted-window margin, rounded up to whole hops
        n = int(self.emotion_context_s * self.sample_rate) \
            + self.emotion_margin_samples
        return ((n + self.hop_length - 1) // self.hop_length) \
            * self.hop_length

    @property
    def emotion_config(self) -> EmotionFrontendConfig:
        return EmotionFrontendConfig(
            backend=self.emotion_backend,
            use_concatenation=self.use_concatenation,
            sample_rate=self.sample_rate,
            egemaps_per_period=self.egemaps_per_period)

    @property
    def emotion_raw_dim(self) -> int:
        """Dim of the cached raw emotion vector in :class:`StreamState`."""
        if self.emotion_backend == "emotion2vec":
            return self.emotion2vec_config.hidden_size
        return self.emotion_config.feature_dim

    @property
    def emotion_encoder(self) -> Wav2Vec2Encoder:
        """The in-model wav2vec2 encoder (emotion2vec backend only);
        params come from the model tree under ``params['emotion2vec']``."""
        return Wav2Vec2Encoder(self.emotion2vec_config,
                               use_layer_fusion=True)

    # ---- incremental-LLD geometry (all static) ----

    @property
    def use_lld_ring(self) -> bool:
        return self.incremental_lld and self.emotion_backend == "egemaps"

    # throughput knob, matching the model's egemaps_per_period
    egemaps_per_period: bool = True

    @property
    def egemaps_config(self) -> EgemapsConfig:
        return EgemapsConfig(
            sample_rate=self.sample_rate,
            per_period_voice_quality=self.egemaps_per_period)

    @property
    def lld_ring_rows(self) -> int:
        """LLD rows covering the emotion audio ring (10 ms hop)."""
        return self.emotion_ring_len // self.egemaps_config.hop_length

    @property
    def lld_block_rows(self) -> int:
        """New LLD rows per refresh: the refresh interval in LLD hops.

        The refresh interval (emotion_update_frames * hop_length samples)
        is generally not an exact multiple of the 10 ms LLD hop, so the
        effective row spacing across refresh boundaries drifts by
        ``|interval - rows*160|`` samples per block (~0.19 ms at 30 fps
        where interval=9*533=4797 vs 4800; ~0.75 ms at 60 fps where
        interval=18*266=4788; <1 ms for any supported config) —
        irrelevant to 20 s window statistics, and still seamless for
        spectral flux thanks to
        :class:`~koemorph_tpu.ops.egemaps.LldCarry`.
        """
        interval = self.emotion_update_frames * self.hop_length
        return max(1, int(round(interval / self.egemaps_config.hop_length)))

    @property
    def attention(self) -> DualStreamCrossAttention:
        return DualStreamCrossAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            num_mel_channels=self.n_mels,
            mel_sequence_length=self.window_frames,
            mel_temporal_frames=3, emotion_dim=self.d_model,
            dropout=0.0, num_blendshapes=self.num_blendshapes,
            use_learnable_weights=self.use_learnable_weights,
            temperature=self.fusion_temperature)

    @classmethod
    def from_model(cls, model, *, match_training_context: bool = False,
                   training_span_frames: int | None = None,
                   **overrides) -> "StreamingConfig":
        """Build a config matching a SimplifiedDualStreamModel's settings
        (the safe way to avoid train/serve skew in fusion knobs).

        ``match_training_context=True`` additionally sets
        ``emotion_context_s`` to the training span length
        (``training_span_frames``, default the model window), eliminating
        the emotion-distribution skew between training (eGeMAPS over the
        training span) and streaming (20 s ring — the reference's
        production buffer, which inherits the same skew). Keep the 20 s
        default when long-context emotion matters more than exact
        train/serve matching.
        """
        if match_training_context and "emotion_context_s" not in overrides:
            span = training_span_frames or model.mel_sequence_length
            overrides["emotion_context_s"] = (
                span * int(model.sample_rate / model.target_fps)
                / model.sample_rate)
        if (model.emotion_backend == "emotion2vec"
                and "emotion2vec_config" not in overrides):
            overrides["emotion2vec_config"] = model.emotion2vec_config
        return cls(
            sample_rate=model.sample_rate, target_fps=model.target_fps,
            window_frames=model.mel_sequence_length,
            d_model=model.d_model, num_heads=model.num_heads,
            num_blendshapes=model.num_blendshapes,
            emotion_backend=model.emotion_backend,
            use_concatenation=model.use_concatenation,
            use_learnable_weights=model.use_learnable_weights,
            fusion_temperature=model.fusion_temperature,
            egemaps_per_period=model.egemaps_per_period,
            **overrides)


@flax.struct.dataclass
class StreamState:
    """All streaming state, as one device-resident carry pytree."""

    audio_ring: jnp.ndarray     # (ring_len,) newest sample last
    mel_db: jnp.ndarray         # (W+1, n_mels) raw dB rows, newest last
    emotion_raw: jnp.ndarray    # (D_raw,) cached raw emotion features
    frame_count: jnp.ndarray    # () int32
    temporal: TemporalState     # EMA carry (B=1)
    # incremental-eGeMAPS state (None when cfg.use_lld_ring is False)
    lld_ring: Optional[dict] = None       # {name: (rows, ...)} newest last
    lld_carry: Optional[LldCarry] = None  # pairwise-LLD continuity


def init_stream_state(cfg: StreamingConfig) -> StreamState:
    raw_dim = cfg.emotion_raw_dim
    lld_ring = lld_carry = None
    if cfg.use_lld_ring:
        lld_ring = init_lld_ring(cfg.lld_ring_rows)
        lld_carry = silence_lld_carry(cfg.egemaps_config)
    return StreamState(
        audio_ring=jnp.zeros((cfg.emotion_ring_len,), jnp.float32),
        mel_db=jnp.full((cfg.window_frames + 1, cfg.n_mels), -100.0,
                        jnp.float32),
        emotion_raw=jnp.zeros((raw_dim,), jnp.float32),
        frame_count=jnp.zeros((), jnp.int32),
        temporal=TemporalState.create(1),
        lld_ring=lld_ring,
        lld_carry=lld_carry,
    )


def _new_mel_row(cfg: StreamingConfig, ring: jnp.ndarray) -> jnp.ndarray:
    """dB mel row for the newest computable centered frame.

    With exactly ``hop`` samples pushed per step (total T = k*hop), the
    newest computable center is ``t = (T - n_fft/2) // hop``, whose window
    ends ``(-(n_fft//2)) mod hop`` samples before the ring end — a static
    offset, so the slice compiles to a fixed gather.
    """
    offset = (-(cfg.n_fft // 2)) % cfg.hop_length
    seg = jax.lax.dynamic_slice_in_dim(
        ring, ring.shape[0] - cfg.n_fft - offset, cfg.n_fft)
    frame = seg * hann_window(cfg.n_fft)
    cos_m, sin_m = dft_matrices(cfg.n_fft)
    re = frame @ cos_m
    im = frame @ sin_m
    power = re * re + im * im                       # (bins,)
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, n_mels=cfg.n_mels,
                        f_min=cfg.f_min, f_max=cfg.f_max)
    mel_power = power @ fb
    return 10.0 * jnp.log10(jnp.maximum(mel_power, 1e-10))


def stream_frame(
    params: dict,
    state: StreamState,
    hop_audio: jnp.ndarray,      # (hop,) newest samples
    cfg: StreamingConfig,
    update_every: jnp.ndarray | int | None = None,
) -> tuple[dict, StreamState]:
    """One 33 ms frame: returns ({'blendshapes': (52,), ...}, new state).

    ``update_every`` overrides ``cfg.emotion_update_frames`` and may be a
    *traced* value (so one executable serves several refresh cadences —
    bench.py uses cadence 1 / K / 0 to derive exact per-frame latency
    quantiles from the deterministic refresh schedule). ``0`` disables the
    refresh entirely.

    BENCHMARK-ONLY KNOB with the incremental LLD ring: each refresh rolls
    a block sized for ``cfg.emotion_update_frames`` regardless of when it
    fires, so a different *production* cadence would gap or overlap the
    ring's timeline. Static overrides other than 0/1/the configured
    cadence are rejected; change ``cfg.emotion_update_frames`` instead.
    """
    hop = cfg.hop_length
    if update_every is None:
        update_every = cfg.emotion_update_frames
    elif (isinstance(update_every, int) and cfg.use_lld_ring
          and update_every not in (0, 1, cfg.emotion_update_frames)):
        raise ValueError(
            f"update_every={update_every} would corrupt the incremental "
            f"LLD ring timeline (block geometry is fixed by "
            f"cfg.emotion_update_frames={cfg.emotion_update_frames}); "
            "set the cadence in StreamingConfig instead")

    ring, mel_db, mel, detail = _stream_pre(state, hop_audio, cfg)
    emotion_raw, lld_ring, lld_carry = _stream_refresh(
        params, state, ring, cfg, update_every)
    result, temporal = _stream_post(params, mel, detail, emotion_raw,
                                    state.temporal, cfg)
    new_state = StreamState(
        audio_ring=ring, mel_db=mel_db, emotion_raw=emotion_raw,
        frame_count=state.frame_count + 1, temporal=temporal,
        lld_ring=lld_ring, lld_carry=lld_carry)
    return result, new_state


def _stream_pre(state: StreamState, hop_audio: jnp.ndarray,
                cfg: StreamingConfig):
    """Steps 1-3 of the frame: ring shift, one new mel row, per-window
    ref=max normalization. Pure in the per-lane state — the multi-session
    server vmaps this over ALL lanes in one call regardless of cohort
    structure (multistream.py)."""
    hop = cfg.hop_length
    # 1. shift-register audio ring (one contiguous HBM copy)
    ring = jnp.concatenate([state.audio_ring[hop:], hop_audio])

    # 2. one new mel row
    row = _new_mel_row(cfg, ring)
    mel_db = jnp.concatenate([state.mel_db[1:], row[None, :]], axis=0)

    # 3. per-window ref=max normalization (exact, not incremental-approx)
    wmax = jnp.max(mel_db)
    norm = (jnp.maximum(mel_db - wmax, -80.0) + 80.0) / 80.0
    mel = norm[None, : cfg.window_frames, :]         # (1, W, n_mels)
    detail = norm[None, -3:, :]                      # (1, 3, n_mels)
    return ring, mel_db, mel, detail


def _refresh_tail_len(cfg: StreamingConfig) -> int:
    """Samples of post-hop ring tail the refresh actually reads — the
    multi-session cohort step slices ONLY this tail per lane instead of
    the whole 20 s ring (multistream.py)."""
    if cfg.use_lld_ring:
        ecfg = cfg.egemaps_config
        return (cfg.lld_block_rows - 1) * ecfg.hop_length + 512
    return (int(cfg.emotion_context_s * cfg.sample_rate)
            + cfg.emotion_margin_samples)


def _stream_refresh(params: dict, state: StreamState, ring: jnp.ndarray,
                    cfg: StreamingConfig,
                    update_every: jnp.ndarray | int | None = None):
    """Step 4: the emotion refresh ``lax.cond`` (heavy branch only runs on
    refresh frames). ``ring`` is the POST-hop audio ring from
    :func:`_stream_pre` — or any suffix of it at least
    ``_refresh_tail_len(cfg)`` samples long (the refresh only reads that
    tail, and reads it relative to the END). Only ``frame_count``,
    ``emotion_raw``, ``lld_ring`` and ``lld_carry`` of ``state`` are
    consulted. Returns (emotion_raw, lld_ring, lld_carry)."""
    if update_every is None:
        update_every = cfg.emotion_update_frames
    update_every = jnp.asarray(update_every, jnp.int32)
    do_refresh = jnp.logical_and(
        update_every > 0,
        (state.frame_count % jnp.maximum(update_every, 1)) == 0)

    if cfg.use_lld_ring:
        # Incremental path: roll only the new LLD rows into the ring, then
        # reduce functionals over the ring under the 3 offset masks. Block
        # geometry is fixed by cfg.emotion_update_frames (a traced
        # update_every override changes WHEN refreshes fire — a bench
        # knob — not how many rows each refresh rolls).
        ecfg = cfg.egemaps_config
        rows = cfg.lld_ring_rows
        n_block = cfg.lld_block_rows
        chunk_len = (n_block - 1) * ecfg.hop_length + 512

        def refresh(operand):
            lld_ring, lld_carry = operand
            chunk = ring[-chunk_len:]
            block, carry2 = compute_lld_block(chunk, ecfg, lld_carry)
            new_ring = roll_lld_ring(lld_ring, block)
            fp = ecfg.hop_length / ecfg.sample_rate
            offsets = (cfg.emotion_config.window_offsets
                       if cfg.use_concatenation else (0.0,))
            cuts = np.asarray(
                [rows - int(round(off / fp)) for off in offsets])
            masks = jnp.arange(rows)[None, :] < jnp.asarray(cuts)[:, None]
            feats = functionals_multi_offset(new_ring, ecfg, masks)
            return feats, new_ring, carry2

        emotion_raw, lld_ring, lld_carry = jax.lax.cond(
            do_refresh, refresh,
            lambda op: (state.emotion_raw, op[0], op[1]),
            (state.lld_ring, state.lld_carry))
    else:
        def refresh(_):
            ctx = ring[-int(cfg.emotion_context_s * cfg.sample_rate)
                       - cfg.emotion_margin_samples:]
            if cfg.emotion_backend == "emotion2vec":
                # full wav2vec2 pass over the ring at refresh cadence
                # (VERDICT r2 item 6; reference ran torch Wav2Vec2
                # host-side, emotion_extractor.py:137-174 — here it is
                # the model's own Flax submodule, on-device, under the
                # same lax.cond so non-refresh frames pay nothing)
                feats = cfg.emotion_encoder.apply(
                    {"params": params["emotion2vec"]}, ctx[None, :],
                    deterministic=True)          # (1, T, hidden)
                return jnp.mean(feats, axis=-2)[0]
            return emotion_features(ctx, cfg.emotion_config)

        emotion_raw = jax.lax.cond(do_refresh, refresh,
                                   lambda _: state.emotion_raw, None)
        lld_ring, lld_carry = state.lld_ring, state.lld_carry
    return emotion_raw, lld_ring, lld_carry


def _stream_post(params: dict, mel: jnp.ndarray, detail: jnp.ndarray,
                 emotion_raw: jnp.ndarray, temporal: TemporalState,
                 cfg: StreamingConfig):
    """Steps 5-6: emotion projection + dual-stream attention + EMA.
    Returns (result dict, new TemporalState)."""
    proj = params["emotion_projection"]
    emotion = emotion_raw @ proj["kernel"] + proj["bias"]   # (d_model,)
    out = cfg.attention.apply(
        {"params": params["dual_stream_attention"]},
        mel, detail, emotion[None, :], deterministic=True)

    alpha = jax.nn.sigmoid(params["smoothing_alpha"])
    smoothed, temporal = _ema_step(out["blendshapes"], temporal, alpha)
    return {"blendshapes": smoothed[0]}, temporal


class StreamingInference:
    """Host-facing real-time engine (reference scripts/rt_simplified.py:315).

    Wraps the jitted :func:`stream_frame` with hop-sized re-chunking, device
    placement, and the reference's performance accounting (frame-time deque,
    avg/max report — reference scripts/rt.py:467-536).
    """

    def __init__(self, params: dict, cfg: StreamingConfig = StreamingConfig(),
                 device: Optional[jax.Device] = None):
        self.cfg = cfg
        self.device = device or jax.devices()[0]
        self.params = jax.device_put(params, self.device)
        self.state = jax.device_put(init_stream_state(cfg), self.device)
        self._step = jax.jit(
            lambda p, s, a: stream_frame(p, s, a, cfg))
        self._pending = np.zeros((0,), np.float32)
        self.frame_times: deque[float] = deque(maxlen=300)
        self.frames_emitted = 0

    def reset(self) -> None:
        self.state = jax.device_put(init_stream_state(self.cfg), self.device)
        self._pending = np.zeros((0,), np.float32)
        self.frames_emitted = 0

    def warmup(self) -> None:
        """Compile the step ahead of the real-time loop."""
        hop = self.cfg.hop_length
        out, st = self._step(self.params, self.state,
                             jnp.zeros((hop,), jnp.float32))
        # materialize, don't block_until_ready: through the axon tunnel
        # block_until_ready returns before remote compile+execute finish,
        # leaving the compile to land on the first real-time frame
        np.asarray(out["blendshapes"])

    def process_audio(self, samples: np.ndarray) -> list[np.ndarray]:
        """Feed arbitrary-length audio; returns one (52,) frame per full hop
        now available."""
        hop = self.cfg.hop_length
        buf = np.concatenate([self._pending,
                              np.asarray(samples, np.float32).reshape(-1)])
        frames: list[np.ndarray] = []
        n_full = len(buf) // hop
        for i in range(n_full):
            t0 = time.perf_counter()
            chunk = jnp.asarray(buf[i * hop:(i + 1) * hop])
            out, self.state = self._step(self.params, self.state, chunk)
            bs = np.asarray(out["blendshapes"])
            self.frame_times.append(time.perf_counter() - t0)
            self.frames_emitted += 1
            frames.append(bs)
        self._pending = buf[n_full * hop:]
        return frames

    def performance_stats(self) -> dict:
        """avg/max frame time + realtime factor (reference rt.py:520-536)."""
        if not self.frame_times:
            return {"frames": 0}
        times = np.asarray(self.frame_times)
        budget = 1.0 / self.cfg.target_fps
        return {
            "frames": self.frames_emitted,
            "avg_frame_time_ms": float(times.mean() * 1e3),
            "max_frame_time_ms": float(times.max() * 1e3),
            "rtf": float(times.mean() / budget),
            "target_fps": self.cfg.target_fps,
        }
