"""Headline benchmark: the metrics of record from BASELINE.json —
frames/sec/chip + p50/p99 per-frame latency (ms) at 30 and 60 fps, plus
end-to-end RTF — for the production dual-stream model on one chip.

Reference baseline: RTF ~0.06 at 30 fps, ~0.08 at 60 fps on an RTX 3080
(reference README.md:316, docs/experimental_results.md:226-233; BASELINE.md).

Methodology (all timings are device compute time per frame):

* Each streaming variant runs N frames inside ONE ``lax.scan`` and returns
  only the last (52,) frame, so a timed call is
  ``dispatch + N x frame + fetch``. Through a remote-TPU tunnel the
  dispatch+fetch round trip is ~28 ms — large enough to swamp sub-ms frames —
  so the RTT is measured directly (best-of-30 trivial dispatch+fetch) and
  subtracted: ``per_frame = (total - rtt) / N``. Round 1 did not subtract
  it, overstating every number (BENCH_r01.json).
* The per-frame latency *distribution* is exact, not sampled: the only
  data-dependent branch is the eGeMAPS refresh, which fires on a
  deterministic cadence (every 9th frame at 30 fps). One executable runs
  with cadence 0 (never refresh -> the p50 frame), cadence 1 (every frame
  refreshes -> the p99/max frame), and the production cadence (-> mean).
  With 11% of frames refreshing, p99 IS a refresh frame and p50 a base
  frame.
* The constructed distribution is cross-checked by a *sampled* one:
  ``trace_p50/p99_ms`` come from a ``jax.profiler`` device trace of 630
  individually dispatched chained steps at production cadence — each
  trace event is one frame's true device execution time, including
  module-launch overhead and queueing the scan construction cannot see
  (``koemorph_tpu/utils/trace_latency.py``).
* ``full_window`` is the reference-equivalent recompute (whole 8.5 s mel
  window + 3-window eGeMAPS + attention each frame,
  SimplifiedDualStreamModel) — the apples-to-apples number against the
  RTX 3080's 0.06.
* ``frames_per_sec_chip`` batch-decodes 8 utterances of 8.53 s with the
  sequential model on the single available chip.

Prints ONE JSON line with {"metric", "value", "unit", "vs_baseline"} plus
the diagnostics above.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from koemorph_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

BASELINE_RTF_30 = 0.06        # RTX 3080, 30 fps enhanced (BASELINE.md)
BASELINE_RTF_60 = 0.08        # RTX 3080, 60 fps (BASELINE.md)


from koemorph_tpu.utils.profiling import (  # noqa: E402
    fetch_scalar as _fetch,
    measure_rtt,
)


def timed_call(fn, *args, rtt: float, reps: int = 3) -> float:
    """Best-of-reps wall time minus the dispatch/fetch round trip (s)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 0.0)


def stream_metrics(params, fps: int, rtt: float, n_frames: int = 600):
    """p50/p99/mean per-frame ms for the streaming step at ``fps``.

    ``params`` must belong to a model whose mel window matches the fps mode
    (256 frames at 30 fps, 512 at 60 fps — reference
    configs/model/dual_stream_60fps.yaml's ``${eval:}`` sizing).
    """
    from koemorph_tpu.runtime.streaming import (
        StreamingConfig, init_stream_state, stream_frame)

    window = 256 if fps == 30 else 512
    cadence = max(1, int(round(0.3 * fps)))   # 300 ms refresh interval
    cfg = StreamingConfig(target_fps=fps, window_frames=window,
                          emotion_update_frames=cadence)
    hop = cfg.hop_length
    rng = np.random.default_rng(0)
    hops = jnp.asarray(
        rng.standard_normal((n_frames, hop)).astype(np.float32) * 0.1)

    @jax.jit
    def run(params, state, hops, update_every):
        def step(state, hop_audio):
            out, state = stream_frame(params, state, hop_audio, cfg,
                                      update_every=update_every)
            return state, None

        state, _ = jax.lax.scan(step, state, hops)
        return state.temporal.prev

    state0 = init_stream_state(cfg)
    t0 = time.perf_counter()
    _fetch(run(params, state0, hops, jnp.int32(cadence)))
    compile_s = time.perf_counter() - t0

    per_frame = {}
    for name, upd in (("mean", cadence), ("p50", 0), ("p99", 1)):
        total = timed_call(run, params, state0, hops, jnp.int32(upd),
                           rtt=rtt)
        per_frame[name] = total / n_frames * 1e3
    # cadence-0 run never refreshes: that IS the non-refresh (p50) frame;
    # cadence-1 runs refresh every frame: that IS the refresh (p99/max)
    # frame. Derived mean cross-checks the measured production-cadence run.
    return {
        "p50_ms": per_frame["p50"],
        "p99_ms": per_frame["p99"],
        "max_ms": per_frame["p99"],
        "mean_ms": per_frame["mean"],
        "refresh_every": cadence,
        "compile_s": compile_s,
    }, cfg


def trace_metrics(params, cfg, n_steps: int = 630):
    """Device-truth cross-check of the constructed p50/p99: dispatch
    ``n_steps`` *individual* chained streaming steps at the production
    refresh cadence under a ``jax.profiler`` device trace and read each
    execution's device duration from the trace (VERDICT r2 item 3).

    Unlike the scan-based construction, every execution here pays real
    module-launch overhead and any queueing jitter, and the refresh
    frames land in the histogram at their natural 1-in-``refresh_every``
    rate — so ``trace_p99_ms`` is a sampled refresh frame and
    ``trace_p50_ms`` a sampled base frame.
    """
    from koemorph_tpu.runtime.streaming import (
        init_stream_state, stream_frame)
    from koemorph_tpu.utils.trace_latency import (
        capture_step_trace, summarize_ms)

    @jax.jit
    def stream_step(carry, hop_audio):
        params, state = carry
        _out, state = stream_frame(params, state, hop_audio, cfg)
        return (params, state)

    rng = np.random.default_rng(1)
    hops = [
        jax.device_put(jnp.asarray(h))
        for h in rng.standard_normal(
            (n_steps, cfg.hop_length)).astype(np.float32) * 0.1
    ]
    durs = capture_step_trace(
        stream_step, (params, init_stream_state(cfg)), hops,
        log_dir="/tmp/koemorph-bench-trace", warmup=2 * cfg.emotion_update_frames)
    samples = durs.get("jit_stream_step")
    if not samples:
        raise RuntimeError(
            f"no jit_stream_step device events in trace; saw {sorted(durs)[:8]}")
    return summarize_ms(samples)


def main() -> None:
    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel, SimplifiedDualStreamModel, TemporalState)

    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    hop30 = 533

    model = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0)
    window_audio = jnp.asarray(
        rng.standard_normal((1, 256 * hop30)).astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), window_audio,
        TemporalState.create(1))["params"]
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0

    # ---- primary: streaming per-frame latency at 30 fps and 60 fps ----
    s30, cfg30 = stream_metrics(params, fps=30, rtt=rtt)

    # ---- device-truth cross-check: sampled per-step trace histogram ----
    try:
        tr30 = trace_metrics(params, cfg30)
        trace_fields = {
            "trace_p50_ms": round(tr30["p50_ms"], 4),
            "trace_p90_ms": round(tr30["p90_ms"], 4),
            "trace_p99_ms": round(tr30["p99_ms"], 4),
            "trace_max_ms": round(tr30["max_ms"], 4),
            "trace_mean_ms": round(tr30["mean_ms"], 4),
            "trace_n_steps": tr30["n"],
        }
    except Exception as exc:  # never fail the bench on profiler issues
        trace_fields = {"trace_error": f"{type(exc).__name__}: {exc}"}

    hop60 = 266
    model60 = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=512,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=60, dropout=0.0)
    params60 = jax.jit(model60.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 512 * hop60), jnp.float32),
        TemporalState.create(1))["params"]
    s60, _ = stream_metrics(params60, fps=60, rtt=rtt)

    # ---- reference-equivalent: full-window recompute every frame ----
    n_full = 120

    @jax.jit
    def run_full(params, audio, state):
        def step(carry, _):
            out, _st = model.apply(
                {"params": params}, audio + 1e-12 * jnp.mean(carry),
                state, deterministic=True)
            return out["blendshapes"], None

        frames, _ = jax.lax.scan(step, jnp.zeros((1, 52)), None,
                                 length=n_full)
        return frames[-1]

    st = TemporalState.create(1)
    _fetch(run_full(params, window_audio, st))
    full_ms = timed_call(run_full, params, window_audio, st,
                         rtt=rtt) / n_full * 1e3

    # ---- throughput: batched sequential decode, frames/s/chip ----
    seq_model = SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0, stride_frames=4)
    batch = 8
    seq_len = 512 * hop30                     # 17 s per utterance
    audio_b = jnp.asarray(
        rng.standard_normal((batch, seq_len)).astype(np.float32) * 0.1)

    n_dec = 4   # repeat inside one program so RTT noise is amortized

    @jax.jit
    def decode(params, audio):
        def step(carry, _):
            out = seq_model.apply(
                {"params": params}, audio + 1e-12 * jnp.mean(carry),
                deterministic=True)
            return out["blendshapes"][:, -1], None

        last, _ = jax.lax.scan(step, jnp.zeros((batch, 52)), None,
                               length=n_dec)
        return last[0]

    n_out = (512 - seq_model.window_frames) // seq_model.stride_frames + 1
    _fetch(decode(params, audio_b))
    dec_s = timed_call(decode, params, audio_b, rtt=rtt) / n_dec
    frames_per_sec = batch * n_out / dec_s

    rtf30 = s30["mean_ms"] / 1e3 * 30.0
    rtf60 = s60["mean_ms"] / 1e3 * 60.0
    device = jax.devices()[0]
    print(json.dumps({
        "metric": "rtf_30fps",
        "value": round(rtf30, 6),
        "unit": "ratio",
        "vs_baseline": round(rtf30 / BASELINE_RTF_30, 4),
        "stream30_p50_ms": round(s30["p50_ms"], 4),
        "stream30_p99_ms": round(s30["p99_ms"], 4),
        "stream30_max_ms": round(s30["max_ms"], 4),
        "stream30_mean_ms": round(s30["mean_ms"], 4),
        "rtf_60fps": round(rtf60, 6),
        "rtf_60fps_vs_baseline": round(rtf60 / BASELINE_RTF_60, 4),
        "stream60_p50_ms": round(s60["p50_ms"], 4),
        "stream60_p99_ms": round(s60["p99_ms"], 4),
        "stream60_mean_ms": round(s60["mean_ms"], 4),
        "full_window_ms_per_frame": round(full_ms, 4),
        "full_window_rtf": round(full_ms / 1e3 * 30.0, 5),
        "frames_per_sec_chip": round(frames_per_sec, 1),
        "batched_decode": {"batch": batch, "frames": batch * n_out,
                           "seconds": round(dec_s, 4)},
        **trace_fields,
        "rtt_ms": round(rtt * 1e3, 3),
        "compile_s": round(s30["compile_s"], 2),
        "init_s": round(init_s, 2),
        "device": f"{device.platform}:{device.device_kind}",
    }))


if __name__ == "__main__":
    main()
