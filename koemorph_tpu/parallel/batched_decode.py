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
