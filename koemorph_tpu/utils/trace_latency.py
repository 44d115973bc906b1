"""Device-truth per-step latency from a ``jax.profiler`` trace.

The bench's primary streaming numbers are *constructed*: the only branch
in the streaming step is the eGeMAPS refresh on a deterministic cadence,
so timing one scanned executable at cadence 0 / 1 / production yields the
base-frame (p50), refresh-frame (p99/max) and mean per-frame costs
(``bench.py`` docstring). That construction is cheap and RTT-robust, but
it cannot see real per-execution jitter — queueing, host wakeups,
module-launch overhead — because the scan amortizes all of it.

This module provides the independent cross-check: dispatch N *individual*
chained step executions under a ``jax.profiler`` device trace and read
each execution's device duration out of the trace, giving a sampled
histogram of true device times (reference analog: the ad-hoc wall-clock
deques in src/features/mel_sliding_window.py:383-407 — except those
measured host wall time around a CUDA dispatch, not device truth).

Traces are parsed from the chrome-trace JSON the profiler always writes
(``*.trace.json.gz``): device processes are named ``/device:...`` and
each XLA module execution is one complete event whose ``dur`` is the
device execution time in microseconds. No TensorBoard/xplane proto
dependency is needed.
"""

from __future__ import annotations

import glob
import gzip
import json
import logging
import os
import shutil
from typing import Any, Callable, Sequence

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "parse_device_durations",
    "capture_step_trace",
    "summarize_ms",
]


def parse_device_durations(log_dir: str,
                           name_prefix: str | None = None
                           ) -> dict[str, list[float]]:
    """Per-execution device durations (ms) from a profiler run directory.

    Reads every ``*.trace.json.gz`` under ``log_dir``'s newest
    ``plugins/profile/<run>/`` directory, keeps complete events
    (``ph == "X"``) on device processes (``process_name`` starting with
    ``/device:``), and groups their durations by event base name (the
    XLA module fingerprint suffix ``(1234...)`` is stripped, so repeated
    executions of one program land in one bucket).

    Args:
        log_dir: directory passed to ``jax.profiler.start_trace``.
        name_prefix: if given, only event names starting with it are kept.

    Returns:
        ``{base_name: [duration_ms, ...]}`` in event order.
    """
    runs = sorted(glob.glob(os.path.join(log_dir, "plugins", "profile", "*")))
    if not runs:
        raise FileNotFoundError(f"no profiler runs under {log_dir!r}")
    traces = sorted(glob.glob(os.path.join(runs[-1], "*.trace.json.gz")))
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {runs[-1]!r}")

    durations: dict[str, list[float]] = {}
    for path in traces:
        with gzip.open(path, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        device_pids = {
            ev["pid"] for ev in events
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
            and str(ev.get("args", {}).get("name", "")).startswith("/device:")
        }
        for ev in events:
            if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
                continue
            name = str(ev.get("name", ""))
            if name_prefix is not None and not name.startswith(name_prefix):
                continue
            base = name.split("(", 1)[0]
            durations.setdefault(base, []).append(
                float(ev.get("dur", 0.0)) / 1e3)
    return durations


def capture_step_trace(step_fn: Callable[..., Any],
                       carry: Any,
                       inputs: Sequence[Any],
                       *,
                       log_dir: str = "/tmp/koemorph-trace-latency",
                       warmup: int = 10,
                       sync: Callable[[Any], None] | None = None
                       ) -> dict[str, list[float]]:
    """Run ``carry = step_fn(carry, x)`` for each x under a device trace.

    The carry chaining serializes the executions on the device, so each
    trace event is one frame. Dispatch is asynchronous (the host does not
    fetch between steps), so host/tunnel latency does not gate the device
    timeline. Host tracing is disabled when the installed JAX supports
    ``ProfileOptions`` (smaller traces; the device plane is unaffected).

    Returns :func:`parse_device_durations` of the captured trace.
    """
    import jax

    if sync is None:
        sync = jax.block_until_ready

    n_warm = min(warmup, len(inputs))
    for x in inputs[:n_warm]:
        carry = step_fn(carry, x)
    sync(carry)

    shutil.rmtree(log_dir, ignore_errors=True)
    kwargs = {}
    if hasattr(jax.profiler, "ProfileOptions"):
        try:
            options = jax.profiler.ProfileOptions()
            options.host_tracer_level = 0
            kwargs["profiler_options"] = options
        except Exception:  # pragma: no cover - best effort
            pass
    jax.profiler.start_trace(log_dir, **kwargs)
    try:
        for x in inputs:
            carry = step_fn(carry, x)
        sync(carry)
    finally:
        jax.profiler.stop_trace()
    durations = parse_device_durations(log_dir)
    if not durations:
        # Pure-CPU traces have no "/device:" process (executions appear as
        # host events) — return empty rather than mis-timing host wall time.
        logger.warning("no device-plane events in trace under %s "
                       "(CPU backend?)", log_dir)
    return durations


def summarize_ms(samples: Sequence[float]) -> dict[str, float]:
    """p50/p90/p99/max/mean (ms) summary of a duration sample list."""
    arr = np.asarray(list(samples), dtype=np.float64)
    if arr.size == 0:
        raise ValueError("no samples")
    return {
        "n": int(arr.size),
        "p50_ms": float(np.percentile(arr, 50)),
        "p90_ms": float(np.percentile(arr, 90)),
        "p99_ms": float(np.percentile(arr, 99)),
        "max_ms": float(arr.max()),
        "mean_ms": float(arr.mean()),
    }
