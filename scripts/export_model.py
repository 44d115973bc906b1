#!/usr/bin/env python
"""Export CLI: checkpoint -> TF SavedModel / TFLite with parity gates.

Parity target: reference scripts/export_model.py:380 (TorchScript/ONNX/
TensorRT exporter with verification + latency benchmark). Formats map to
jax2tf SavedModel (mobile parity per BASELINE.json) and TFLite.

Unlike the reference (which had to exclude temporal smoothing from ONNX,
export_model.py:174-183), the exported graph here includes the EMA smoothing
as explicit state inputs/outputs.

Usage:
    python scripts/export_model.py --model <ckpt_dir> --format saved_model \
        --output exports/ --benchmark
    python scripts/export_model.py --format tflite --output exports/ --cpu
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

logger = logging.getLogger("export")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", help="checkpoint dir (orbax); random if unset")
    p.add_argument("--output", default="exports")
    p.add_argument("--format", default="saved_model",
                   choices=["saved_model", "tflite", "all"])
    p.add_argument("--quantize", default=None,
                   choices=["dynamic", "float16"],
                   help="TFLite quantization: dynamic-range int8 weights "
                        "(the reference's mobile INT8 path, ~4x smaller) "
                        "or float16")
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--emotion-backend", default="egemaps",
                   choices=["egemaps", "basic"])
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.export import (
        benchmark_fn, export_savedmodel, export_tflite)
    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.train.checkpoint import load_checkpoint

    window = 512 if args.fps == 60 else 256
    model = SimplifiedDualStreamModel(
        d_model=args.d_model, num_heads=args.num_heads,
        mel_sequence_length=window, target_fps=args.fps,
        emotion_backend=args.emotion_backend,
        use_concatenation=args.emotion_backend == "egemaps",
        dropout=0.0)
    hop = int(model.sample_rate / args.fps)
    audio = jnp.zeros((1, window * hop), jnp.float32)
    state = TemporalState.create(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio, state)["params"]
    if args.model:
        params, meta = load_checkpoint(args.model, target=params)
        logger.info("Loaded %s (epoch %s)", args.model, meta.get("epoch"))
    else:
        logger.warning("No --model; exporting randomly initialized weights")

    def frame_fn(audio, prev, initialized):
        st = TemporalState(prev=prev, initialized=initialized)
        out, new_state = model.apply({"params": params}, audio, st,
                                     deterministic=True)
        return (out["blendshapes"], new_state.prev, new_state.initialized)

    example = (np.zeros((1, window * hop), np.float32),
               np.zeros((1, 52), np.float32),
               np.zeros((1,), bool))
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    reports = []

    sm_dir = out_dir / "saved_model"
    if args.format in ("saved_model", "all", "tflite"):
        reports.append(export_savedmodel(frame_fn, example, sm_dir))
    if args.format in ("tflite", "all"):
        suffix = f"_{args.quantize}" if args.quantize else ""
        reports.append(export_tflite(
            sm_dir, out_dir / f"model{suffix}.tflite",
            fn=frame_fn, example_args=example, quantize=args.quantize))

    if args.benchmark:
        import time as _time
        import tensorflow as _tf

        jax_stats = benchmark_fn(jax.jit(frame_fn), example)
        logger.info("jax latency: %.3f ms", jax_stats["latency_ms"])
        # measure each exported artifact itself (the reference benchmarked
        # each engine, export_model.py:329-377)
        for r in reports:
            if r.format == "saved_model":
                loaded = _tf.saved_model.load(r.path)
                for _ in range(5):
                    loaded.serve(*example)
                t0 = _time.perf_counter()
                for _ in range(20):
                    loaded.serve(*example)
                r.latency_ms = (_time.perf_counter() - t0) / 20 * 1e3
            elif r.format == "tflite":
                interp = _tf.lite.Interpreter(model_path=r.path)
                runner = interp.get_signature_runner("serving_default")
                names = sorted(runner.get_input_details().keys())
                feed = {n: np.asarray(a) for n, a in zip(names, example)}
                for _ in range(5):
                    runner(**feed)
                t0 = _time.perf_counter()
                for _ in range(20):
                    runner(**feed)
                r.latency_ms = (_time.perf_counter() - t0) / 20 * 1e3
            logger.info("%s latency: %.3f ms", r.format, r.latency_ms)

    print(json.dumps([r.as_dict() for r in reports], indent=2))
    return 0 if all(r.passed for r in reports) else 1


if __name__ == "__main__":
    sys.exit(main())
