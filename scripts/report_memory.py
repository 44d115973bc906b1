#!/usr/bin/env python
"""Static HBM footprint of every flagship executable, from XLA's own
buffer assignment (``compiled.memory_analysis()``) — no allocation
sampling needed, so the numbers are deterministic and available through
the TPU tunnel (whose PJRT client does not expose ``memory_stats``).

Reported per workload: argument / output / temp bytes and XLA's peak
buffer-assignment bytes, plus the resident cost a serving process pays
(params + carried state). The reference publishes process-RSS-style
figures — ~355 MB @30 fps / ~450 MB @60 fps inference, ~2.6 GB training
(reference README.md:320-321) — which bundle the CUDA context and torch
allocator slack; the XLA numbers here are the device-side truth and are
two orders of magnitude smaller for inference.

    python scripts/report_memory.py            # all workloads
    python scripts/report_memory.py --skip-train --sessions 0
"""

from __future__ import annotations

import argparse
import json
import sys
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


def _mb(n: int) -> float:
    return round(n / 2**20, 2)


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size"))


def analyze(name, fn, *args, results=None, extra_resident=0, **kw):
    """Lower+compile ``fn(*args)`` and record its buffer-assignment stats
    (compile only — nothing is dispatched, so this is tunnel-friendly)."""
    mem = jax.jit(fn, **kw).lower(*args).compile().memory_analysis()
    row = {
        "argument_mb": _mb(mem.argument_size_in_bytes),
        "output_mb": _mb(mem.output_size_in_bytes),
        "temp_mb": _mb(mem.temp_size_in_bytes),
        "xla_peak_mb": _mb(mem.peak_memory_in_bytes),
        "code_mb": _mb(mem.generated_code_size_in_bytes),
    }
    if extra_resident:
        # params + carried state live across calls; XLA's peak covers one
        # call's internal buffers only
        row["resident_mb"] = _mb(extra_resident)
        row["serving_total_mb"] = round(
            row["resident_mb"] + row["temp_mb"] + row["code_mb"], 2)
    results[name] = row
    print(f"{name:26s} args {row['argument_mb']:9.2f}  "
          f"out {row['output_mb']:8.2f}  temp {row['temp_mb']:8.2f}  "
          f"peak {row['xla_peak_mb']:8.2f} MB", flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, default=384,
                    help="multi-session lane count (0 skips)")
    ap.add_argument("--decode-batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel, SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.runtime.streaming import (
        StreamingConfig, init_stream_state, stream_frame)

    rng = np.random.default_rng(0)
    results: dict = {}

    model = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0)
    hop30 = int(model.sample_rate / model.target_fps)
    window_audio = jnp.asarray(
        rng.standard_normal((1, 256 * hop30)).astype(np.float32) * 0.1)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), window_audio,
        TemporalState.create(1))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    params_b = tree_bytes(params)
    results["model"] = {
        "n_params": int(n_params),
        "params_mb_f32": _mb(params_b),
        "params_mb_bf16": _mb(params_b // 2),
    }
    print(f"flagship params: {n_params:,} ({_mb(params_b)} MB f32; "
          f"reference model-size row: ~8.2 MB)", flush=True)

    # ---- streaming step, 30 and 60 fps ----
    for fps, window in ((30, 256), (60, 512)):
        cfg = StreamingConfig(
            target_fps=fps, window_frames=window,
            emotion_update_frames=max(1, int(round(0.3 * fps))))
        state = init_stream_state(cfg)
        p = params
        if fps == 60:
            model60 = SimplifiedDualStreamModel(
                d_model=256, num_heads=8, mel_sequence_length=512,
                emotion_backend="egemaps", use_concatenation=True,
                target_fps=60, dropout=0.0)
            p = jax.jit(model60.init)(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 512 * cfg.hop_length), jnp.float32),
                TemporalState.create(1))["params"]
        hop = jnp.zeros((cfg.hop_length,), jnp.float32)
        analyze(
            f"stream_step_{fps}fps",
            lambda pr, st, h, c=cfg: stream_frame(pr, st, h, c),
            p, state, hop, results=results,
            extra_resident=tree_bytes(p) + tree_bytes(state),
            donate_argnums=1)

    # ---- multi-session serving step ----
    if args.sessions:
        from koemorph_tpu.runtime.multistream import MultiStreamInference

        cfg = StreamingConfig(target_fps=30, window_frames=256,
                              emotion_update_frames=9)
        server = MultiStreamInference(params, cfg, n_sessions=args.sessions)
        hops = jnp.zeros((args.sessions, cfg.hop_length), jnp.float32)
        analyze(
            f"multistream_{args.sessions}",
            server._vstep, server.params, server.states, hops,
            results=results,
            extra_resident=tree_bytes(params) + tree_bytes(server.states),
            donate_argnums=1)

    # ---- full-window recompute (reference-equivalent path) ----
    st = TemporalState.create(1)
    analyze(
        "full_window_b1",
        lambda pr, a, s: model.apply({"params": pr}, a, s,
                                     deterministic=True),
        params, window_audio, st, results=results,
        extra_resident=tree_bytes(params))

    # ---- batched sequential decode ----
    seq_model = SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0, stride_frames=4)
    audio_b = jnp.asarray(
        rng.standard_normal(
            (args.decode_batch, 512 * hop30)).astype(np.float32) * 0.1)
    analyze(
        f"batched_decode_b{args.decode_batch}",
        lambda pr, a: seq_model.apply({"params": pr}, a,
                                      deterministic=True),
        params, audio_b, results=results,
        extra_resident=tree_bytes(params))

    # ---- training step (fwd + bwd + adamw) ----
    if not args.skip_train:
        from koemorph_tpu.train.trainer import SequentialTrainer

        span = 288
        batch = {
            "audio": jnp.zeros(
                (args.train_batch, span * hop30), jnp.float32),
            "blendshapes": jnp.zeros(
                (args.train_batch, span, 52), jnp.float32),
            "sample_mask": jnp.ones((args.train_batch,), jnp.float32),
        }
        with TemporaryDirectory() as tmp:
            tcfg = {"training": {
                "optimizer": {"name": "adamw", "lr": 5e-4},
                "loss": {"mse_weight": 1.0, "l1_weight": 0.3,
                         "velocity_weight": 0.1},
                "logging": {"log_every_n_steps": 0,
                            "log_images_every_n_steps": 0},
            }}
            trainer = SequentialTrainer(
                SequentialDualStreamModel(
                    d_model=256, num_heads=8, mel_sequence_length=256,
                    emotion_backend="egemaps", use_concatenation=True,
                    target_fps=30, dropout=0.1, stride_frames=4),
                tcfg, work_dir=tmp, span_frames=span)
            analyze(
                f"train_step_b{args.train_batch}",
                trainer._train_step_impl, trainer.state, batch,
                results=results,
                extra_resident=tree_bytes(trainer.state))

    results["device"] = jax.devices()[0].device_kind
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
