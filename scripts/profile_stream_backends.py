#!/usr/bin/env python
"""Per-frame streaming cost by emotion backend (VERDICT r2 item 6).

Measures the base-frame and refresh-frame device cost of the streaming
step for each emotion backend — ``egemaps`` (incremental LLD ring) and
``emotion2vec`` (full wav2vec2 pass over the 20 s audio ring inside the
``lax.cond`` refresh) — using bench.py's exact-cadence methodology:
one executable timed at refresh cadence 0 (base frame), 1 (refresh
frame), and the production 300 ms cadence (mean).

The emotion2vec encoder is bidirectional, so a refresh is a full-ring
re-encode by construction (reference analog: host-side torch Wav2Vec2 in
src/features/emotion_extractor.py:137-174, which also re-encoded the
whole buffer). The question this script answers is what that costs
on-device at each encoder depth, and where the 33 ms frame budget
breaks.

Usage: python scripts/profile_stream_backends.py [--frames 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402


from koemorph_tpu.utils.profiling import (  # noqa: E402
    fetch_scalar as _fetch,
    measure_rtt,
)


def profile_backend(name: str, model, rtt: float, n_frames: int):
    from koemorph_tpu.models.dual_stream_model import TemporalState
    from koemorph_tpu.runtime.streaming import (
        StreamingConfig, init_stream_state, stream_frame)

    cfg = StreamingConfig.from_model(model)
    hop = cfg.hop_length
    rng = np.random.default_rng(0)
    window_audio = jnp.asarray(
        rng.standard_normal((1, model.mel_sequence_length * hop))
        .astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), window_audio,
        TemporalState.create(1))["params"]
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0

    hops = jnp.asarray(
        rng.standard_normal((n_frames, hop)).astype(np.float32) * 0.1)

    @jax.jit
    def run(params, state, hops, update_every):
        def step(state, hop_audio):
            _out, state = stream_frame(params, state, hop_audio, cfg,
                                       update_every=update_every)
            return state, None

        state, _ = jax.lax.scan(step, state, hops)
        return state.temporal.prev

    state0 = init_stream_state(cfg)
    t0 = time.perf_counter()
    _fetch(run(params, state0, hops, jnp.int32(cfg.emotion_update_frames)))
    compile_s = time.perf_counter() - t0

    out = {"backend": name, "init_s": round(init_s, 2),
           "compile_s": round(compile_s, 2),
           "refresh_every": cfg.emotion_update_frames}
    for key, upd in (("mean_ms", cfg.emotion_update_frames),
                     ("base_ms", 0), ("refresh_ms", 1)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(run(params, state0, hops, jnp.int32(upd)))
            best = min(best, time.perf_counter() - t0)
        out[key] = round(max(best - rtt, 0.0) / n_frames * 1e3, 4)
    # amortized per-frame cost of the refresh alone
    out["refresh_cost_ms"] = round(out["refresh_ms"] - out["base_ms"], 4)
    out["budget_33ms_ok"] = bool(out["refresh_ms"] < 33.3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.features.wav2vec2 import Wav2Vec2Config
    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel)

    common = dict(d_model=256, num_heads=8, mel_sequence_length=256,
                  use_concatenation=True, target_fps=30, dropout=0.0)
    rtt = measure_rtt()
    results = [
        profile_backend(
            "egemaps",
            SimplifiedDualStreamModel(emotion_backend="egemaps", **common),
            rtt, args.frames),
        profile_backend(
            "emotion2vec-2L (in-model default)",
            SimplifiedDualStreamModel(emotion_backend="emotion2vec",
                                      **common),
            rtt, args.frames),
        profile_backend(
            "emotion2vec-12L (base-size)",
            SimplifiedDualStreamModel(
                emotion_backend="emotion2vec",
                emotion2vec_config=Wav2Vec2Config(
                    hidden_size=1024, num_hidden_layers=12,
                    num_attention_heads=16, intermediate_size=4096),
                **common),
            rtt, args.frames),
    ]
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 3),
                      "n_frames": args.frames,
                      "results": results}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
