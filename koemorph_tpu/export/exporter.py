"""Model export: jax2tf -> TF SavedModel / TFLite with parity gates.

Parity target: reference scripts/export_model.py (TorchScript trace, ONNX
with stateful smoothing excluded, TensorRT engine; numerical verification
against eager with max-abs-diff thresholds 1e-5/1e-4; latency benchmark
harness, lines 84-377). TPU-native replacements:

- TorchScript/ONNX -> jax2tf + tf.saved_model (the BASELINE.json north star
  names jax2tf/SavedModel for mobile parity); TensorRT -> TFLite.
- The reference had to EXCLUDE temporal smoothing from ONNX because it was
  hidden mutable module state (export_model.py:174-183). Here the EMA carry
  is an explicit function input/output, so the exported graph is the FULL
  model including smoothing — callers thread the state exactly like the JAX
  runtime does.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Callable, Optional, Sequence, Union

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["ExportReport", "export_savedmodel", "export_tflite",
           "verify_export", "benchmark_fn"]


@dataclasses.dataclass
class ExportReport:
    path: str
    format: str
    max_abs_diff: float
    passed: bool
    threshold: float
    latency_ms: Optional[float] = None
    size_bytes: Optional[int] = None

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def _dir_size(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def export_savedmodel(
    fn: Callable,
    example_args: Sequence,
    out_dir: Union[str, Path],
    *,
    verify_threshold: float = 1e-5,
) -> ExportReport:
    """Convert a jittable ``fn(*example_args)`` to a TF SavedModel and gate
    on max-abs-diff vs the JAX output (reference export gate: 1e-5 for the
    traced path, export_model.py:134-149)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    out_dir = Path(out_dir)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec(np.shape(a), tf.as_dtype(np.asarray(a).dtype))
            for a in example_args
        ])
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, str(out_dir),
                        signatures={"serving_default": tf_fn})

    diff = _max_diff(fn, lambda *a: module.serve(*a), example_args)
    report = ExportReport(
        path=str(out_dir), format="saved_model",
        max_abs_diff=diff, passed=diff < verify_threshold,
        threshold=verify_threshold, size_bytes=_dir_size(out_dir))
    (logger.info if report.passed else logger.warning)(
        "SavedModel export: max|diff|=%.2e (threshold %.0e) -> %s",
        diff, verify_threshold, "OK" if report.passed else "FAILED")
    return report


def export_tflite(
    saved_model_dir: Union[str, Path],
    out_file: Union[str, Path],
    *,
    fn: Optional[Callable] = None,
    example_args: Sequence = (),
    verify_threshold: float = 1e-4,
    quantize: Optional[str] = None,
) -> ExportReport:
    """SavedModel -> .tflite flatbuffer; gate at 1e-4 (the reference's ONNX
    threshold, export_model.py:222-257) when ``fn`` is provided.

    ``quantize``: None (float32), ``"dynamic"`` (dynamic-range int8
    weights — the reference's mobile INT8 story, ~4x smaller,
    docs/experimental_results.md:201-206), or ``"float16"``. Quantized
    exports gate at max(verify_threshold, 0.05): blendshapes live in
    [0, 1], so 0.05 is a visible-artifact bound, not numerical noise.
    """
    if quantize not in (None, "dynamic", "float16"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")

    import tensorflow as tf

    converter = tf.lite.TFLiteConverter.from_saved_model(
        str(saved_model_dir))
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    if quantize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        if quantize == "float16":
            converter.target_spec.supported_types = [tf.float16]
        verify_threshold = max(verify_threshold, 0.05)
    blob = converter.convert()
    out_file = Path(out_file)
    out_file.write_bytes(blob)

    diff = float("nan")
    passed = True
    if fn is not None:
        interp = tf.lite.Interpreter(model_content=blob)
        runner = interp.get_signature_runner("serving_default")
        # bind positionally by the numeric suffix of jax2tf's generated
        # names (args_0..args_N / output_0..output_N) — dict order is not
        # guaranteed and lexicographic order misbinds past 10 tensors
        input_names = sorted(runner.get_input_details().keys(),
                             key=_name_index)
        output_names = sorted(runner.get_output_details().keys(),
                              key=_name_index)

        def tflite_fn(*args):
            out = runner(**{n: np.asarray(a) for n, a in
                            zip(input_names, args)})
            vals = [out[n] for n in output_names]
            return vals[0] if len(vals) == 1 else tuple(vals)

        diff = _max_diff(fn, tflite_fn, example_args)
        passed = diff < verify_threshold
        (logger.info if passed else logger.warning)(
            "TFLite export: max|diff|=%.2e (threshold %.0e) -> %s",
            diff, verify_threshold, "OK" if passed else "FAILED")
    return ExportReport(
        path=str(out_file), format="tflite", max_abs_diff=diff,
        passed=passed, threshold=verify_threshold,
        size_bytes=len(blob))


def _name_index(name: str) -> tuple:
    """Sort key for jax2tf tensor names: numeric suffix when present."""
    tail = name.rsplit("_", 1)[-1]
    return (0, int(tail)) if tail.isdigit() else (1, name)


def _flatten(out) -> list[np.ndarray]:
    # bool leaves (e.g. EMA `initialized` state) compare as floats
    return [np.asarray(x, dtype=np.float64)
            for x in jax.tree_util.tree_leaves(out)]


def _max_diff(fn_a: Callable, fn_b: Callable, args: Sequence) -> float:
    a = _flatten(fn_a(*args))
    b = _flatten(fn_b(*args))
    if len(a) != len(b):
        raise ValueError(
            f"Output leaf count mismatch: {len(a)} vs {len(b)} — parity "
            "comparison would silently truncate")
    return float(max(np.max(np.abs(x - y)) for x, y in zip(a, b)))


def verify_export(fn: Callable, exported_fn: Callable, args: Sequence,
                  threshold: float = 1e-5) -> tuple[bool, float]:
    diff = _max_diff(fn, exported_fn, args)
    return diff < threshold, diff


def benchmark_fn(fn: Callable, args: Sequence, *, warmup: int = 10,
                 iters: int = 100) -> dict:
    """Warmup + timed latency harness (reference export_model.py:329-377;
    cuda.synchronize becomes block_until_ready)."""
    for _ in range(max(warmup, 1)):   # at least one call compiles fn
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"latency_ms": dt * 1e3, "iters": iters,
            "throughput_per_s": 1.0 / dt}
