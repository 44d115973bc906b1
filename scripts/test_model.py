#!/usr/bin/env python
"""Offline evaluation CLI: checkpoint + test split -> metrics report.

Parity target: reference scripts/test_model.py (loads a checkpoint, runs the
test split, accumulates BlendshapeMetrics — without its hard-coded
sys.path hack, line 16).

Usage:
    python scripts/test_model.py --data-dir data/test [--model <ckpt>] \
        [--model-name sequential_dual_stream] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

logger = logging.getLogger("test_model")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--model", help="checkpoint dir (orbax)")
    p.add_argument("--model-name", default="sequential_dual_stream",
                   choices=["simplified", "simplified_dual_stream",
                            "sequential_dual_stream"])
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--emotion-backend", default="egemaps")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--output", help="write metrics JSON here")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.data.sequential import create_sequential_dataloader
    from koemorph_tpu.models.losses import BlendshapeMetrics
    from koemorph_tpu.train.checkpoint import load_checkpoint
    from koemorph_tpu.train.trainer import sequence_targets

    window = 512 if args.fps == 60 else 256
    span = window + 32

    if args.model_name == "simplified":
        from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel
        model = SimplifiedKoeMorphModel(
            d_model=args.d_model, num_heads=args.num_heads,
            target_fps=args.fps)
        span = window
        decode = jax.jit(lambda p, a: model.apply(
            {"params": p}, a, deterministic=True))

        def predict(params, batch):
            pred = decode(params, jnp.asarray(batch["audio"]))
            return pred, batch["blendshapes"][:, -1, :]
    else:
        from koemorph_tpu.models.dual_stream_model import (
            SequentialDualStreamModel, SimplifiedDualStreamModel)
        common = dict(
            d_model=args.d_model, num_heads=args.num_heads,
            mel_sequence_length=window, target_fps=args.fps,
            emotion_backend=args.emotion_backend,
            use_concatenation=args.emotion_backend == "egemaps",
            dropout=0.0)
        if args.model_name == "simplified_dual_stream":
            model = SimplifiedDualStreamModel(**common)
            span = window
            decode = jax.jit(lambda p, a: model.apply(
                {"params": p}, a, deterministic=True)["blendshapes"])

            def predict(params, batch):
                pred = decode(params, jnp.asarray(batch["audio"]))
                return pred, batch["blendshapes"][:, -1, :]
        else:
            model = SequentialDualStreamModel(**common, stride_frames=1)
            decode = jax.jit(lambda p, a: model.apply(
                {"params": p}, a, deterministic=True)["blendshapes"])

            def predict(params, batch):
                pred = np.asarray(
                    decode(params, jnp.asarray(batch["audio"])))
                tgt = sequence_targets(batch["blendshapes"], window, 1,
                                       pred.shape[1])
                b, t, _ = pred.shape
                return pred.reshape(b * t, -1), \
                    np.asarray(tgt).reshape(b * t, -1)

    hop = int(16000 / args.fps)
    example = jnp.zeros((args.batch_size, span * hop), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)["params"]
    if args.model:
        params, meta = load_checkpoint(args.model, target=params)
        logger.info("Loaded %s (epoch %s)", args.model, meta.get("epoch"))
    else:
        logger.warning("No --model; evaluating random weights")

    loader_fn, _ = create_sequential_dataloader(
        args.data_dir, batch_size=args.batch_size, window_frames=span,
        stride_frames=span, target_fps=float(args.fps), drop_last=True)

    metrics = BlendshapeMetrics()
    n = 0
    for batch in loader_fn():
        pred, target = predict(params, batch)
        metrics.update(np.asarray(pred), np.asarray(target))
        n += 1
        if args.max_batches and n >= args.max_batches:
            break
    result = metrics.compute()
    result["batches"] = n
    logger.info("metrics: %s", {k: round(float(v), 5)
                                for k, v in result.items()})
    print(json.dumps({k: float(v) for k, v in result.items()}))
    if args.output:
        Path(args.output).write_text(
            json.dumps({k: float(v) for k, v in result.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
