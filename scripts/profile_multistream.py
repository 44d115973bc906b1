#!/usr/bin/env python
"""Concurrent-session capacity sweep for the multi-stream server.

Measures sustained per-frame step latency of
:class:`koemorph_tpu.runtime.MultiStreamInference` (production streaming
config: d=256, egemaps 3-window concat, incremental LLD ring, 300 ms
refresh) across session counts, and reports the largest S that still
meets the 33 ms frame budget — "concurrent 30 fps avatars per chip".
The reference serves exactly ONE session per process (scripts/rt.py).

Methodology matches bench.py: scan-amortized, value-fetch synchronized,
fresh warm scan before timing. Run on the TPU:

    python scripts/profile_multistream.py --sessions 8 32 64
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

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, nargs="+",
                    default=[8, 32, 64, 128])
    ap.add_argument("--frames", type=int, default=120,
                    help="timed frames per measurement")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--refresh-cohorts", type=int, default=1,
                    help="stagger the emotion refresh over N session "
                         "cohorts (uniform step cost instead of a spike "
                         "every 300 ms)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.runtime import MultiStreamInference, StreamingConfig

    window = 256 if args.fps == 30 else 512
    cadence = max(1, int(round(0.3 * args.fps)))
    model = SimplifiedDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=window,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=args.fps, dropout=0.0)
    cfg = StreamingConfig(target_fps=args.fps, window_frames=window,
                          emotion_update_frames=cadence)
    hop = cfg.hop_length
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (1, window * hop)).astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), audio, TemporalState.create(1))["params"]
    jax.block_until_ready(params)
    print(f"# init {time.perf_counter() - t0:.1f}s on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    rows = []
    for s in args.sessions:
        server = MultiStreamInference(params, cfg, n_sessions=s,
                                      refresh_cohorts=args.refresh_cohorts)
        t0 = time.perf_counter()
        stats = server.sustained_stats(n_frames=args.frames)
        # subtract EVERY scan sustained_stats ran (warmups + timed), not
        # just the timed one, so warm execution isn't booked as compile
        stats["compile_s"] = round(
            time.perf_counter() - t0
            - stats["step_ms"] * args.frames * stats["scans_run"] / 1e3, 1)
        stats = {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in stats.items()}
        rows.append(stats)
        print(json.dumps(stats))

    realtime = [r for r in rows if r["realtime"]]
    if realtime:
        best = max(realtime, key=lambda r: r["sessions"])
        print(json.dumps({
            "summary": "max_realtime_sessions_measured",
            "sessions": best["sessions"],
            "step_ms": best["step_ms"],
            "budget_ms": round(1000 / args.fps, 2),
            "headroom_x": round((1000 / args.fps) / best["step_ms"], 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
