"""Batched multi-utterance sequential decoding over a device mesh.

BASELINE.json config #5: "multi-utterance batch with progressive-stride
windows sharded on v5e-8". The reference has no such path (single device,
one utterance at a time, SURVEY.md section 2.5); this is new capability the
TPU design makes cheap: the utterance batch is sharded on the data axis,
params are replicated, and each chip runs the full
global-STFT -> window-gather -> attention decode locally — zero collectives
in the forward (only the emotion/mel compute itself), so throughput scales
linearly over ICI-connected chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
)

__all__ = ["BatchedSequentialDecoder"]


class BatchedSequentialDecoder:
    """Decode batches of equal-length utterances across all local chips.

    Typical use::

        decoder = BatchedSequentialDecoder(model, params)
        out = decoder(audio_batch)          # (B, L) -> (B, T_out, 52)

    ``B`` must be divisible by the mesh size (pad with
    :func:`koemorph_tpu.parallel.pad_batch_to_multiple` upstream). One
    compiled executable per distinct ``L``; pad/bucket utterance lengths
    upstream to bound recompiles.
    """

    def __init__(self, model, params, mesh=None,
                 devices: Optional[list] = None):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(devices=devices)
        self.params = replicate(params, self.mesh)
        self._sharding = batch_sharding(self.mesh, DATA_AXIS)

        @jax.jit
        def decode(params, audio):
            out = model.apply({"params": params}, audio,
                              deterministic=True)
            return out["blendshapes"]

        self._decode = decode

        @jax.jit
        def decode_at(params, audio, starts):
            out = model.apply({"params": params}, audio,
                              deterministic=True, window_starts=starts)
            return out["blendshapes"]

        self._decode_at = decode_at

        @jax.jit
        def decode_raw_at(params, audio, starts):
            out = model.apply({"params": params}, audio,
                              deterministic=True, window_starts=starts,
                              return_raw=True)
            return out["raw_blendshapes"]

        self._decode_raw_at = decode_raw_at

        @jax.jit
        def ema_replay(params, raw_seq):
            # exact arithmetic of SequentialDualStreamModel.__call__'s
            # smoothing tail: s from the associative scan, final values
            # recomputed in one-step form (bit-identical outputs)
            from koemorph_tpu.models.dual_stream_model import (
                _ema_associative)
            alpha = jax.nn.sigmoid(params["smoothing_alpha"])
            s = _ema_associative(raw_seq, alpha)
            s_prev = jnp.concatenate([raw_seq[:1], s[:-1]], axis=0)
            smoothed = alpha * raw_seq + (1 - alpha) * s_prev
            return smoothed.at[0].set(raw_seq[0])

        self._ema_replay = ema_replay

    @property
    def num_devices(self) -> int:
        return int(self.mesh.devices.size)

    def __call__(self, audio_batch) -> jax.Array:
        audio = np.asarray(audio_batch, np.float32)
        b = audio.shape[0]
        if b % self.num_devices:
            raise ValueError(
                f"batch {b} not divisible by {self.num_devices} devices; "
                "pad upstream")
        sharded = jax.device_put(audio, self._sharding)
        return self._decode(self.params, sharded)

    def decode_scheduled(self, audio_batch, strides,
                         ) -> tuple[jax.Array, np.ndarray]:
        """Progressive/adaptive-stride batched decode (BASELINE.json
        config #5: "multi-utterance batch with progressive-stride
        windows").

        ``strides`` is a per-utterance window stride — an int, an (B,)
        array, or a :class:`~koemorph_tpu.data.sequential.StrideSchedule`
        resolved by the caller via
        ``[schedule.stride_for(epoch, i, B) for i in range(B)]``. Each
        utterance decodes windows at ``0, s_i, 2*s_i, ...``; all rows are
        padded to the densest stride's window count (extra windows clamp
        to the final valid start, keeping shapes static) and a boolean
        validity mask is returned alongside the (B, n_max, 52) output.
        One executable per distinct (audio length, n_max) pair.
        """
        audio = np.asarray(audio_batch, np.float32)
        bsz = audio.shape[0]
        if bsz % self.num_devices:
            raise ValueError(
                f"batch {bsz} not divisible by {self.num_devices} "
                "devices; pad upstream")
        strides = np.broadcast_to(
            np.asarray(strides, np.int64), (bsz,)).astype(np.int64)
        if (strides < 1).any():
            raise ValueError("strides must be >= 1")

        hop = int(self.model.sample_rate / self.model.target_fps)
        num_frames = audio.shape[1] // hop
        span = num_frames - self.model.window_frames
        if span < 0:
            raise ValueError(
                f"audio shorter than one {self.model.window_frames}-frame "
                "window")
        n_per = span // strides + 1                     # (B,)
        n_max = int(n_per.max())
        grid = np.arange(n_max)[None, :] * strides[:, None]   # (B, n_max)
        starts = np.minimum(grid, span).astype(np.int32)
        mask = np.arange(n_max)[None, :] < n_per[:, None]

        sharded = jax.device_put(audio, self._sharding)
        starts_sh = jax.device_put(starts, self._sharding)
        return self._decode_at(self.params, sharded, starts_sh), mask

    def decode_sequence_parallel(self, audio) -> jax.Array:
        """Sequence-parallel decode: ONE utterance, windows sharded over
        the mesh.

        Data parallelism cannot help the latency of a single long
        utterance (B=1 occupies one chip). Here the utterance's window
        sequence is split into ``num_devices`` contiguous chunks and
        decoded as a sharded pseudo-batch — each chip runs the
        window-gather + attention batch for its chunk only, so the
        dominant cost (the per-window attention batch) divides by the
        mesh size, with zero collectives in the decode itself. The
        full-utterance global STFT/mel and the eGeMAPS/emotion pass are
        replicated per chip (each lane holds the whole tiled utterance;
        sharding those sequence-level passes would need halo exchanges
        worth more than their cost share) — only the window-batch FLOPs
        scale with the mesh, not the whole forward.

        The EMA smoothing recurrence crosses chunk boundaries, so chips
        return PRE-smoothing windows (``return_raw``) and the recurrence
        is replayed over the stitched (T_out, 52) sequence in one tiny
        associative scan — bit-identical to single-device decode
        (pinned by tests/parallel/test_production_sharding.py).

        Accepts (L,) float audio; returns (T_out, 52). One executable
        per distinct (L, T_out) pair — bucket lengths upstream.
        """
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 2 and audio.shape[0] == 1:
            audio = audio[0]
        if audio.ndim != 1:
            raise ValueError(
                "decode_sequence_parallel takes ONE utterance (L,); use "
                "__call__ for multi-utterance batches")
        n_dev = self.num_devices
        hop = int(self.model.sample_rate / self.model.target_fps)
        span = audio.shape[0] // hop - self.model.window_frames
        if span < 0:
            raise ValueError(
                f"audio shorter than one {self.model.window_frames}-frame "
                "window")
        stride = int(self.model.stride_frames)
        n_out = span // stride + 1
        per = -(-n_out // n_dev)                 # windows per chip, padded
        grid = np.arange(n_dev * per) * stride   # global window order
        starts = np.minimum(grid, span).astype(np.int32).reshape(n_dev, per)
        tiled = np.broadcast_to(audio, (n_dev, audio.shape[0]))
        raw = self._decode_raw_at(
            self.params,
            jax.device_put(np.ascontiguousarray(tiled), self._sharding),
            jax.device_put(starts, self._sharding))      # (n_dev, per, 52)
        raw_flat = jnp.reshape(raw, (n_dev * per, -1))[:n_out]
        return self._ema_replay(self.params, raw_flat)

    def throughput_stats(self, audio_batch, iters: int = 10) -> dict:
        """Frames/sec/chip measurement over the mesh."""
        import time

        out = self(audio_batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self(audio_batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        b, t_out = out.shape[0], out.shape[1]
        return {
            "batch": b,
            "frames_per_call": b * t_out,
            "latency_ms": dt * 1e3,
            "frames_per_s": b * t_out / dt,
            "frames_per_s_per_chip": b * t_out / dt / self.num_devices,
            "devices": self.num_devices,
        }
