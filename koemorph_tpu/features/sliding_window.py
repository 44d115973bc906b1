"""Host-facing sliding-window mel extractor API.

Parity target: reference src/features/mel_sliding_window.py
(MelAudioBuffer: thread-safe 8.5 s circular audio buffer with per-frame
writes of hop=533 samples; MelSlidingWindowExtractor: per-frame full-window
mel recompute, throttled to 30% of the frame interval, with cached-feature
fallback and perf stats; create_mel_extractor factory).

This class exists for API parity and host-driven use; the production
real-time path is :mod:`koemorph_tpu.runtime.streaming`, where the buffer
and the incremental mel rows live on device. Here the window recompute is
one jitted call (the reference's recompute was host librosa, its main cost);
the update throttle and stats surface are preserved.
"""

from __future__ import annotations

import logging
import threading
import time
from collections import deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.frontend import LogMelFrontend, mel_with_temporal_detail

logger = logging.getLogger(__name__)

__all__ = ["MelAudioBuffer", "MelSlidingWindowExtractor",
           "create_mel_extractor"]


class MelAudioBuffer:
    """Thread-safe circular audio buffer holding the mel context window
    (reference mel_sliding_window.py:21-154)."""

    def __init__(self, sample_rate: int = 16000, window_duration: float = 8.5,
                 frame_hop: int = 533):
        self.sample_rate = sample_rate
        self.window_samples = int(window_duration * sample_rate)
        self.frame_hop = frame_hop
        self._buf = np.zeros(self.window_samples, np.float32)
        self._lock = threading.Lock()
        self.total_written = 0
        self.frames_written = 0
        self.size_warnings = 0

    def add_audio_frame(self, audio_frame: np.ndarray) -> bool:
        """Append ~hop samples (±1 tolerance like the reference,
        mel_sliding_window.py:70-116). Oversized writes are accepted too
        (they just advance the window further)."""
        frame = np.asarray(audio_frame, np.float32).reshape(-1)
        if abs(len(frame) - self.frame_hop) > 1 and \
                len(frame) < self.frame_hop:
            self.size_warnings += 1
            logger.debug("unexpected frame size %d (hop %d)",
                         len(frame), self.frame_hop)
        n = min(len(frame), self.window_samples)
        with self._lock:
            if n:
                self._buf = np.concatenate([self._buf[n:], frame[-n:]])
            self.total_written += len(frame)
            self.frames_written += 1
        return True

    def get_current_audio(self) -> Optional[np.ndarray]:
        """Chronologically ordered window (oldest first)."""
        with self._lock:
            if self.total_written == 0:
                return None
            return self._buf.copy()

    def get_stats(self) -> Dict[str, Any]:
        return {
            "window_samples": self.window_samples,
            "total_written": self.total_written,
            "frames_written": self.frames_written,
            "size_warnings": self.size_warnings,
            "fill_ratio": min(1.0, self.total_written
                              / self.window_samples),
        }

    def reset(self) -> None:
        with self._lock:
            self._buf[:] = 0.0
            self.total_written = 0
            self.frames_written = 0


class MelSlidingWindowExtractor:
    """Per-frame (T, 80) mel window extraction with update throttling
    (reference mel_sliding_window.py:157-412)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        target_fps: float = 30.0,
        window_frames: int = 256,
        n_mels: int = 80,
        n_fft: int = 1024,
        update_ratio: float = 0.3,   # recompute budget: 30% of the interval
    ):
        self.sample_rate = sample_rate
        self.target_fps = target_fps
        self.window_frames = window_frames
        self.n_mels = n_mels
        self.frame_hop = int(sample_rate / target_fps)
        self.buffer = MelAudioBuffer(
            sample_rate, window_frames * self.frame_hop / sample_rate,
            self.frame_hop)
        self.update_interval = update_ratio / target_fps
        self._frontend = LogMelFrontend(
            sample_rate=sample_rate, target_fps=target_fps, n_fft=n_fft,
            n_mels=n_mels, f_min=80.0, f_max=8000.0, style="librosa")
        self._compute = jax.jit(
            lambda a: mel_with_temporal_detail(a, self._frontend))
        self._cached: Optional[np.ndarray] = None
        self._cached_detail: Optional[np.ndarray] = None
        self._last_update = 0.0
        self.extraction_times: deque[float] = deque(maxlen=100)
        self.cache_hits = 0
        self.extractions = 0
        self.failures = 0

    @property
    def feature_dim(self) -> int:
        return self.n_mels

    def process_audio_frame(self, audio_frame: np.ndarray
                            ) -> Optional[np.ndarray]:
        """Add one hop of audio; return the (window_frames, n_mels) window
        (cached between throttled updates, reference lines 252-324)."""
        self.buffer.add_audio_frame(audio_frame)
        now = time.perf_counter()
        if (self._cached is not None
                and now - self._last_update < self.update_interval):
            self.cache_hits += 1
            return self._cached
        audio = self.buffer.get_current_audio()
        if audio is None:
            return self._cached
        try:
            t0 = time.perf_counter()
            mel, detail = self._compute(jnp.asarray(audio))
            mel = np.asarray(mel)
            # pad/trim to the fixed window (reference lines 300-307)
            if mel.shape[0] < self.window_frames:
                mel = np.pad(mel,
                             ((self.window_frames - mel.shape[0], 0), (0, 0)))
            else:
                mel = mel[-self.window_frames:]
            self.extraction_times.append(time.perf_counter() - t0)
            self.extractions += 1
            self._cached = mel
            self._cached_detail = np.asarray(detail)
            self._last_update = now
            return mel
        except Exception as e:  # cached-feature fallback (reference :321-324)
            self.failures += 1
            logger.warning("mel extraction failed, reusing cache: %s", e)
            return self._cached

    def process_audio_batch(self, audio: np.ndarray) -> np.ndarray:
        """Whole-utterance batch path: (B, L) or (L,) -> (B, T, n_mels)."""
        a = np.asarray(audio, np.float32)
        if a.ndim == 1:
            a = a[None]
        mel, _ = self._compute(jnp.asarray(a))
        return np.asarray(mel)

    def get_current_features(self) -> Optional[np.ndarray]:
        return self._cached

    def get_temporal_detail(self) -> Optional[np.ndarray]:
        """Last 3 frames (the short-term detail tensor)."""
        return self._cached_detail

    def reset(self) -> None:
        self.buffer.reset()
        self._cached = None
        self._cached_detail = None
        self._last_update = 0.0

    def get_stats(self) -> Dict[str, Any]:
        times = np.asarray(self.extraction_times) if self.extraction_times \
            else np.zeros(1)
        return {
            "extractions": self.extractions,
            "cache_hits": self.cache_hits,
            "failures": self.failures,
            "avg_extraction_ms": float(times.mean() * 1e3),
            "max_extraction_ms": float(times.max() * 1e3),
            "buffer": self.buffer.get_stats(),
        }


def create_mel_extractor(config: Optional[dict] = None
                         ) -> MelSlidingWindowExtractor:
    """Factory (reference mel_sliding_window.py:415-440)."""
    config = config or {}
    return MelSlidingWindowExtractor(
        sample_rate=config.get("sample_rate", 16000),
        target_fps=config.get("target_fps", 30.0),
        window_frames=config.get("window_frames",
                                 config.get("mel_sequence_length", 256)),
        n_mels=config.get("n_mels", 80),
        n_fft=config.get("n_fft", 1024),
    )
