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

__all__ = ["run_realtime_loop"]


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
