#!/usr/bin/env python
"""Training throughput of the production sequential trainer on one chip.

Times the full jitted train step (forward over all windows + value_and_grad
+ adamw update, SequentialTrainer._train_step_impl) for the flagship model
(d=256, egemaps + 3-window concat, window 256, stride 4) at several batch
sizes, scan-amortized with the tunnel RTT subtracted (same methodology as
bench.py). Reported units:

* ``ms_per_step`` — one optimizer step (B spans of ``span_frames``).
* ``windows_per_s`` — attention windows trained per second.
* ``audio_s_per_s`` — seconds of training audio consumed per wall second
  (how fast an epoch's audio is chewed through).

The reference publishes only end-to-end wall-clock for its (private)
corpus — 16.6 h dense-stride vs 8.2 h mixed to MAE 0.028/0.030 on an
RTX 3080 (reference docs/experimental_results.md:144-166) — with no
per-step numbers, so these are the framework's numbers of record rather
than a head-to-head. Usage: python scripts/profile_training.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from tempfile import TemporaryDirectory

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402


from koemorph_tpu.utils.profiling import (  # noqa: E402
    fetch_scalar as _fetch,
    measure_rtt,
)


def profile_batch(trainer, batch_size: int, span_frames: int, hop: int,
                  rtt: float, n_steps: int = 8, reps: int = 3):
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal(
                (batch_size, span_frames * hop)).astype(np.float32) * 0.1),
        "blendshapes": jnp.asarray(
            rng.random((batch_size, span_frames, 52)).astype(np.float32)
            * 0.2),
        "sample_mask": jnp.ones((batch_size,), jnp.float32),
    }

    @jax.jit
    def run(state, batch):
        def body(state, _):
            state, metrics = trainer._train_step_impl(state, batch)
            return state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=n_steps)
        return losses[-1]

    t0 = time.perf_counter()
    _fetch(run(trainer.state, batch))
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(run(trainer.state, batch))
        best = min(best, time.perf_counter() - t0)
    step_s = max(best - rtt, 0.0) / n_steps

    model = trainer.model
    n_out = (span_frames - model.window_frames) // model.stride_frames + 1
    return {
        "batch": batch_size,
        "ms_per_step": round(step_s * 1e3, 3),
        "windows_per_s": round(batch_size * n_out / step_s, 1),
        "audio_s_per_s": round(
            batch_size * span_frames / model.target_fps / step_s, 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--span", type=int, default=288,
                    help="frames per training sample (window 256 + 32)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel)
    from koemorph_tpu.train.trainer import SequentialTrainer

    model = SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.1, stride_frames=4)
    hop = int(model.sample_rate / model.target_fps)

    rtt = measure_rtt()
    with TemporaryDirectory() as tmp:
        tcfg = {"training": {
            "optimizer": {"name": "adamw", "lr": 5e-4},
            "loss": {"mse_weight": 1.0, "l1_weight": 0.3,
                     "velocity_weight": 0.1},
            "logging": {"log_every_n_steps": 0,
                        "log_images_every_n_steps": 0},
        }}
        trainer = SequentialTrainer(model, tcfg, work_dir=tmp,
                                    span_frames=args.span)
        results = [
            profile_batch(trainer, b, args.span, hop, rtt,
                          n_steps=args.steps)
            for b in args.batches
        ]
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 3),
                      "span_frames": args.span,
                      "stride_frames": model.stride_frames,
                      "device": jax.devices()[0].device_kind,
                      "results": results}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
