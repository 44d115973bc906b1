"""Headline benchmark: per-frame streaming latency / RTF of the production
dual-stream model on one chip.

Reference baseline: RTF ~0.06 at 30 fps on an RTX 3080 (reference
README.md:316, docs/experimental_results.md:226-229; BASELINE.md). One
"frame" of work = what the reference does per output frame: recompute the
full 8.5 s / 256-frame mel window, the 3-window concatenated eGeMAPS
emotion vector, the dual-stream attention forward, and EMA smoothing
(reference scripts/rt_simplified.py hot loop + SURVEY.md section 3.4).
Here all of it is one jitted static-shape function on device.

Prints ONE JSON line:
    {"metric": "rtf_30fps", "value": ..., "unit": "ratio",
     "vs_baseline": value / 0.06, ...extra diagnostics}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.06           # RTX 3080, 30 fps enhanced (BASELINE.md)
FRAME_PERIOD_S = 1.0 / 30.0   # 33.3 ms budget per frame at 30 fps


def main() -> None:
    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)

    model = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0,
        stft_method="matmul")
    hop = int(model.sample_rate / model.target_fps)
    window_samples = model.mel_sequence_length * hop       # 8.53 s

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((1, window_samples)).astype(np.float32) * 0.1)
    state = TemporalState.create(batch_size=1)
    # jitted init: eager init is pathological through the TPU tunnel
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), audio, state)["params"]

    @jax.jit
    def frame_step(params, audio, state):
        out, new_state = model.apply({"params": params}, audio, state,
                                     deterministic=True)
        return out["blendshapes"], new_state

    # warmup / compile
    t0 = time.perf_counter()
    bs, state = frame_step(params, audio, state)
    jax.block_until_ready(bs)
    compile_s = time.perf_counter() - t0

    for _ in range(20):
        bs, state = frame_step(params, audio, state)
    jax.block_until_ready(bs)

    # best-of-N repetitions: the tunnel adds sporadic multi-ms stalls, so
    # the minimum is the honest device-throughput number
    iters, reps = 200, 4
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            bs, state = frame_step(params, audio, state)
        jax.block_until_ready(bs)
        best = min(best, time.perf_counter() - t0)

    latency_s = best / iters
    rtf = latency_s / FRAME_PERIOD_S
    device = jax.devices()[0]
    print(json.dumps({
        "metric": "rtf_30fps",
        "value": round(rtf, 6),
        "unit": "ratio",
        "vs_baseline": round(rtf / BASELINE_RTF, 4),
        "latency_ms_per_frame": round(latency_s * 1e3, 4),
        "compile_s": round(compile_s, 2),
        "device": f"{device.platform}:{device.device_kind}",
    }))


if __name__ == "__main__":
    main()
