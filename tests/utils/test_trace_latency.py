"""Tests for the device-trace latency histogram helpers.

The parser is pinned against a synthetic chrome-trace fixture (exact
durations known), and the end-to-end capture is exercised on the CPU
backend — the same code path ``bench.py`` runs on the TPU chip.
"""

import gzip
import json
import os

import numpy as np
import pytest

from koemorph_tpu.utils.trace_latency import (
    capture_step_trace, parse_device_durations, summarize_ms)


def _write_trace(run_dir, events, name="vm.trace.json.gz"):
    os.makedirs(run_dir, exist_ok=True)
    with gzip.open(os.path.join(run_dir, name), "wt") as fh:
        json.dump({"traceEvents": events}, fh)


def _synthetic_events():
    # pid 3 is a device, pid 701 the host; only pid-3 X events count.
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 701, "name": "jit_step(99)", "dur": 5000.0},
    ]
    for i, dur_us in enumerate([40.0, 50.0, 460.0, 45.0]):
        events.append({"ph": "X", "pid": 3, "tid": 1,
                       "name": "jit_step(12345)", "ts": i * 100.0,
                       "dur": dur_us})
    events.append({"ph": "X", "pid": 3, "tid": 2,
                   "name": "copy-start", "ts": 0.0, "dur": 1.0})
    return events


def test_parse_groups_by_base_name_and_device_pid(tmp_path):
    run = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    _write_trace(str(run), _synthetic_events())
    durs = parse_device_durations(str(tmp_path))
    # host-side jit_step event (pid 701) excluded; fingerprint stripped
    assert durs["jit_step"] == [0.040, 0.050, 0.460, 0.045]
    assert durs["copy-start"] == [0.001]


def test_parse_name_prefix_filter(tmp_path):
    run = tmp_path / "plugins" / "profile" / "r0"
    _write_trace(str(run), _synthetic_events())
    durs = parse_device_durations(str(tmp_path), name_prefix="jit_")
    assert set(durs) == {"jit_step"}


def test_parse_picks_newest_run(tmp_path):
    old = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    new = tmp_path / "plugins" / "profile" / "2026_01_02_00_00_00"
    _write_trace(str(old), _synthetic_events())
    _write_trace(str(new), [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 3, "name": "jit_step(1)", "dur": 10.0},
    ])
    durs = parse_device_durations(str(tmp_path))
    assert durs["jit_step"] == [0.010]


def test_parse_missing_run_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_device_durations(str(tmp_path))


def test_summarize_ms():
    samples = [0.04] * 98 + [0.46, 0.47]
    s = summarize_ms(samples)
    assert s["n"] == 100
    assert s["p50_ms"] == pytest.approx(0.04)
    assert s["p99_ms"] >= 0.45
    assert s["max_ms"] == pytest.approx(0.47)
    assert s["mean_ms"] == pytest.approx(np.mean(samples))
    with pytest.raises(ValueError):
        summarize_ms([])


def test_capture_step_trace_cpu(tmp_path):
    """End-to-end capture on the CPU backend: a trace is produced and
    parsed without error. Pure-CPU traces carry no ``/device:`` process
    (XLA:CPU executions are host events), so the device histogram is
    empty here — on the TPU chip the same call yields one ``jit_roll``
    duration per dispatched step (exercised by ``bench.py``,
    ``trace_p*_ms`` fields in BENCH_r03.json)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def roll(carry, x):
        return carry @ x + 1.0

    carry = jnp.ones((32, 32))
    steps = [jnp.full((32, 32), 0.01)] * 12
    durs = capture_step_trace(roll, carry, steps,
                              log_dir=str(tmp_path / "trace"), warmup=2)
    if jax.devices()[0].platform == "cpu":
        assert durs == {}
    else:  # pragma: no cover - requires accelerator
        assert len(durs["jit_roll"]) == len(steps)
