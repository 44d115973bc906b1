"""Headline benchmark: per-frame streaming latency / RTF of the production
dual-stream model on one chip.

Reference baseline: RTF ~0.06 at 30 fps on an RTX 3080 (reference
README.md:316, docs/experimental_results.md:226-229; BASELINE.md).

Primary metric — the production streaming step (runtime/streaming.py):
incremental mel row + cond-gated eGeMAPS refresh (300 ms cadence) +
dual-stream attention + EMA smoothing. N frames run inside ONE lax.scan so
the measurement is pure device work (no dispatch overhead), and the clock
stops on a *value fetch* of the result — through a remote-TPU tunnel,
``block_until_ready`` alone has been observed to return early, so only a
materialized value is trusted.

Secondary metric — the full-window recompute step (what the reference does
every frame: whole 8.5 s mel window + 3-window eGeMAPS + attention,
SimplifiedDualStreamModel; 6.3 GFLOPs/frame by XLA cost analysis).

Prints ONE JSON line:
    {"metric": "rtf_30fps", "value": ..., "unit": "ratio",
     "vs_baseline": value / 0.06, ...diagnostics}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.06           # RTX 3080, 30 fps enhanced (BASELINE.md)
FRAME_PERIOD_S = 1.0 / 30.0   # 33.3 ms budget per frame at 30 fps
N_FRAMES = 300                # 10 s of audio -> 33 emotion refreshes


def _timed(fn, *args, reps: int = 3):
    """Best-of-reps wall time, synchronized by materializing a value."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])   # true sync: value fetch
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.runtime.streaming import (
        StreamingConfig, init_stream_state, stream_frame)

    model = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0)
    cfg = StreamingConfig()
    hop = cfg.hop_length
    rng = np.random.default_rng(0)

    window_audio = jnp.asarray(
        rng.standard_normal((1, 256 * hop)).astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), window_audio,
        TemporalState.create(1))["params"]
    init_s = time.perf_counter() - t0

    # ---- primary: N streaming frames inside one scan ----
    hops = jnp.asarray(rng.standard_normal(
        (N_FRAMES, hop)).astype(np.float32) * 0.1)

    @jax.jit
    def run_stream(params, state, hops):
        def step(state, hop_audio):
            out, state = stream_frame(params, state, hop_audio, cfg)
            return state, out["blendshapes"]

        state, frames = jax.lax.scan(step, state, hops)
        return frames

    state0 = init_stream_state(cfg)
    t0 = time.perf_counter()
    frames = run_stream(params, state0, hops)
    float(np.asarray(frames).ravel()[0])
    compile_s = time.perf_counter() - t0
    stream_total = _timed(run_stream, params, state0, hops)
    stream_ms = stream_total / N_FRAMES * 1e3

    # ---- secondary: full-window recompute (reference per-frame work) ----
    @jax.jit
    def full_window(params, audio, state):
        out, new_state = model.apply({"params": params}, audio, state,
                                     deterministic=True)
        return out["blendshapes"]

    st = TemporalState.create(1)
    _ = full_window(params, window_audio, st)
    float(np.asarray(_).ravel()[0])

    n_full = 20

    @jax.jit
    def run_full(params, audio, state):
        def step(carry, _):
            # real (numerically negligible) dependency on the previous
            # output so XLA cannot hoist the body out of the scan
            out, _st = model.apply(
                {"params": params}, audio + 1e-12 * jnp.mean(carry),
                state, deterministic=True)
            return out["blendshapes"], None

        frames, _ = jax.lax.scan(step, jnp.zeros((1, 52)), None,
                                 length=n_full)
        return frames

    _ = run_full(params, window_audio, st)
    float(np.asarray(_).ravel()[0])
    full_total = _timed(run_full, params, window_audio, st)
    full_ms = full_total / n_full * 1e3

    rtf = stream_ms / 1e3 / FRAME_PERIOD_S
    device = jax.devices()[0]
    print(json.dumps({
        "metric": "rtf_30fps",
        "value": round(rtf, 6),
        "unit": "ratio",
        "vs_baseline": round(rtf / BASELINE_RTF, 4),
        "stream_ms_per_frame": round(stream_ms, 4),
        "full_window_ms_per_frame": round(full_ms, 4),
        "full_window_rtf": round(full_ms / 1e3 / FRAME_PERIOD_S, 5),
        "compile_s": round(compile_s, 2),
        "init_s": round(init_s, 2),
        "device": f"{device.platform}:{device.device_kind}",
    }))


if __name__ == "__main__":
    main()
