"""Profiling / timing utilities with the reference's RTF report format.

Parity target: the reference's ad-hoc wall-clock instrumentation — per-frame
timing deques + avg/max reports in the rt loops (reference
scripts/rt.py:467-536), `benchmark_model` warmup+timed runs with
cuda.synchronize (scripts/export_model.py:329-377) — upgraded with
`jax.profiler` trace capture for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Callable, Optional, Sequence

import jax
import numpy as np

__all__ = ["FrameTimer", "benchmark", "trace", "rtf_report",
           "fetch_scalar", "measure_rtt", "scan_timed"]


def _tree_sum(out):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.asarray(leaf, jnp.float32)) for leaf in leaves)


def scan_timed(fn, args, *, rtt: float, iters: int = 8, reps: int = 3,
               perturb_arg: int = 0):
    """Time ``fn(*args)`` amortized over ``iters`` scan steps in one
    program — the canonical tunnel-safe timing harness (the profiling
    scripts import this instead of keeping copies, same policy as
    :func:`fetch_scalar`). The carry feeds a 1e-12 perturbation into one
    input so XLA cannot hoist the body out of the loop; the returned sum
    reduces over ALL outputs so dead-code elimination cannot delete any
    (the round-2 trap). Returns ``(ms_per_iter, flops)``.

    FLOPs come from XLA cost analysis, which counts a ``lax.scan`` body
    ONCE regardless of trip count, so the whole-program figure ~= one
    iteration's — do NOT divide by ``iters`` (the round-3 saturation
    sweep was first read 16x low by dividing)."""
    import time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a0):
        def step(carry, _):
            a = list(a0)
            a[perturb_arg] = a[perturb_arg] + 1e-12 * carry
            out = fn(*a)
            return _tree_sum(out), None

        total, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return total

    compiled = run.lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    fetch_scalar(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_scalar(run(*args))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - rtt, 0.0) / iters * 1e3
    return ms, flops


def fetch_scalar(x) -> float:
    """True synchronization: materialize one value on the host.

    The canonical sync for every tunnel-aware timing path (bench.py and
    the profiling scripts import this instead of keeping copies, so the
    RTT methodology can only be changed in one place).
    """
    return float(np.asarray(x).ravel()[0])


def measure_rtt() -> float:
    """Best-of-30 dispatch+fetch round trip of a trivial program (s).

    Under the tunneled single-chip setup the host<->device round trip
    (~tens of ms) dwarfs sub-ms device compute; subtracting this floor is
    how all timing scripts recover device-side cost from wall clock. The
    companion device-trace methodology (utils/trace_latency.py) validates
    the subtraction against profiler ground truth.
    """
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    x = jnp.zeros((8,), jnp.float32)
    fetch_scalar(trivial(x))
    best = float("inf")
    for _ in range(30):
        t0 = time.perf_counter()
        fetch_scalar(trivial(x))
        best = min(best, time.perf_counter() - t0)
    return best


class FrameTimer:
    """Rolling per-frame timing with RTF accounting
    (replaces the reference's frame_times list, rt.py:467-536)."""

    def __init__(self, target_fps: float = 30.0, window: int = 300):
        self.target_fps = target_fps
        self.times: deque[float] = deque(maxlen=window)
        self.total_frames = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self.total_frames += 1

    def report(self) -> dict:
        return rtf_report(np.asarray(self.times), self.target_fps,
                          total_frames=self.total_frames)


def rtf_report(frame_times_s: np.ndarray, target_fps: float,
               total_frames: Optional[int] = None) -> dict:
    """The canonical RTF report (reference
    docs/technical_specifications.md:269-279 format)."""
    if len(frame_times_s) == 0:
        return {"frames": 0}
    budget = 1.0 / target_fps
    return {
        "frames": total_frames if total_frames is not None
        else len(frame_times_s),
        "avg_ms": float(frame_times_s.mean() * 1e3),
        "p50_ms": float(np.percentile(frame_times_s, 50) * 1e3),
        "p95_ms": float(np.percentile(frame_times_s, 95) * 1e3),
        "max_ms": float(frame_times_s.max() * 1e3),
        "rtf": float(frame_times_s.mean() / budget),
        "rtf_p95": float(np.percentile(frame_times_s, 95) / budget),
        "target_fps": target_fps,
        "realtime_ok": bool(frame_times_s.mean() < budget),
    }


def benchmark(fn: Callable, args: Sequence = (), *, warmup: int = 10,
              iters: int = 100, reps: int = 3) -> dict:
    """Warmup + best-of-reps timed runs with block_until_ready
    (the TPU analogue of the reference's cuda.synchronize harness)."""
    for _ in range(max(warmup, 1)):   # at least one call so `out` exists
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"latency_ms": best * 1e3, "iters": iters, "reps": reps,
            "throughput_per_s": 1.0 / best}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", *, host: bool = False):
    """Capture a jax.profiler trace around a block (view with
    tensorboard --logdir or xprof)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=host)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
