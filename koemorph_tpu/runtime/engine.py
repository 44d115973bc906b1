"""Real-time engine loop: audio source -> jitted frame step -> streamer.

Parity target: the paced main loops of reference scripts/rt.py:465-519 and
scripts/rt_simplified.py:499-553 (drain queue -> model -> send -> sleep to
hold target fps), with the reference's frame-time accounting.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

import numpy as np

from koemorph_tpu.runtime.streamers import BlendshapeStreamer
from koemorph_tpu.runtime.streaming import StreamingInference

logger = logging.getLogger(__name__)

__all__ = ["build_streaming_model", "run_realtime_loop"]


def build_streaming_model(
    *,
    d_model: int = 256,
    num_heads: int = 8,
    fps: int = 30,
    emotion_backend: str = "egemaps",
    sample_rate: int = 16000,
    checkpoint: Optional[str] = None,
):
    """The one flagship streaming recipe — model construction, config
    derivation, jitted init, optional checkpoint load — shared by
    scripts/rt.py and scripts/serve.py so the single-session and
    multi-session CLIs can never serve diverging models.

    Returns ``(params, cfg)``; feed them to
    :class:`~koemorph_tpu.runtime.streaming.StreamingInference` or
    :class:`~koemorph_tpu.runtime.multistream.MultiStreamInference`.
    """
    import jax
    import jax.numpy as jnp

    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.runtime.streaming import StreamingConfig
    from koemorph_tpu.train.checkpoint import load_checkpoint

    model = SimplifiedDualStreamModel(
        d_model=d_model, num_heads=num_heads,
        mel_sequence_length=512 if fps == 60 else 256,
        emotion_backend=emotion_backend,
        use_concatenation=emotion_backend == "egemaps",
        sample_rate=sample_rate, target_fps=fps, dropout=0.0)
    # derive the streaming config from the model so fusion knobs
    # (use_learnable_weights / temperature) can't skew train vs serve
    cfg = StreamingConfig.from_model(
        model, emotion_update_frames=max(1, int(0.3 * fps)))
    example = jnp.zeros((1, cfg.window_frames * cfg.hop_length),
                        jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), example, TemporalState.create(1))["params"]
    if checkpoint:
        params, meta = load_checkpoint(checkpoint, target=params)
        logger.info("Loaded checkpoint %s (epoch %s)", checkpoint,
                    meta.get("epoch"))
    else:
        logger.warning(
            "No checkpoint given; using randomly initialized weights")
    return params, cfg


def run_realtime_loop(
    engine: StreamingInference,
    source,                                  # AudioFileReader / MicCapture
    streamer: Optional[BlendshapeStreamer] = None,
    *,
    max_frames: Optional[int] = None,
    on_frame: Optional[Callable[[np.ndarray, float], None]] = None,
    log_every: int = 150,
    max_idle_reads: int = 10,
) -> dict:
    """Run until the source ends (or ``max_frames``); returns perf stats.

    The source thread paces delivery at real time; this loop just drains the
    queue, so it never over-runs the source. A ``None`` read is a transient
    stall (retried up to ``max_idle_reads`` times); end-of-stream is the
    distinct ``audio.EOS`` sentinel. ``on_frame(blendshapes, t)`` is called
    per emitted frame after the streamer send with the wall-clock timestamp
    (``time.time()``, matching the reference packet format).
    """
    from koemorph_tpu.runtime.audio import EOS

    engine.warmup()
    frames = 0
    idle_reads = 0
    done = False
    t_start = time.perf_counter()
    while not done:
        chunk = source.read()
        if chunk is EOS:
            break
        if chunk is None:               # transient stall, not end-of-stream
            idle_reads += 1
            if idle_reads >= max_idle_reads:
                logger.warning("source idle for %d reads; stopping",
                               idle_reads)
                break
            continue
        idle_reads = 0
        for bs in engine.process_audio(chunk):
            now = time.time()           # wall clock: reference packet parity
            if streamer is not None:
                streamer.send(bs, now)
            if on_frame is not None:
                on_frame(bs, now)
            frames += 1
            if log_every and frames % log_every == 0:
                stats = engine.performance_stats()
                logger.info(
                    "frame %d: avg %.2f ms, max %.2f ms, RTF %.4f",
                    frames, stats["avg_frame_time_ms"],
                    stats["max_frame_time_ms"], stats["rtf"])
            if max_frames is not None and frames >= max_frames:
                done = True
                break
    stats = engine.performance_stats()
    stats["wall_s"] = time.perf_counter() - t_start
    return stats
