#!/usr/bin/env python
"""End-to-end integration harness.

Parity targets: the reference's root-level manual scripts —
test_realtime_dual_stream.py (synthesized speech -> streaming pipeline with
RTF checks), test_emotion_processing.py (backend fallback matrix), and
test_egemaps_comparison.py (backend perf comparison + png) — folded into one
CLI that prints a JSON summary.

Usage:
    python scripts/integration_check.py [--cpu] [--seconds 4] [--plot out/]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np                                      # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

logger = logging.getLogger("integration")


def synth_speech(seconds: float, sr: int = 16000, seed: int = 0) -> np.ndarray:
    """Speech-like audio: F0 glide + formant-ish AM + noise bursts."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140 + 40 * np.sin(2 * np.pi * 0.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    voiced = (np.sin(phase) + 0.4 * np.sin(2 * phase)
              + 0.2 * np.sin(3 * phase))
    am = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))          # syllable rate
    noise = 0.05 * rng.standard_normal(len(t))
    return (0.35 * voiced * am + noise).astype(np.float32)


def check_streaming(audio: np.ndarray, fps: int = 30) -> dict:
    import jax
    import jax.numpy as jnp
    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel, TemporalState)
    from koemorph_tpu.runtime.streaming import (
        StreamingConfig, StreamingInference)

    cfg = StreamingConfig(target_fps=fps, d_model=128, num_heads=4,
                          window_frames=64, emotion_backend="egemaps",
                          use_concatenation=True, emotion_context_s=4.0)
    model = SimplifiedDualStreamModel(
        d_model=cfg.d_model, num_heads=cfg.num_heads,
        mel_sequence_length=cfg.window_frames,
        emotion_backend=cfg.emotion_backend,
        use_concatenation=cfg.use_concatenation, target_fps=fps,
        dropout=0.0)
    a0 = jnp.zeros((1, cfg.window_frames * cfg.hop_length), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), a0, TemporalState.create(1))["params"]
    eng = StreamingInference(params, cfg)
    eng.warmup()
    frames = eng.process_audio(audio)
    stats = eng.performance_stats()
    arr = np.stack(frames)
    return {
        "frames": len(frames),
        "rtf": round(stats["rtf"], 5),
        "avg_frame_ms": round(stats["avg_frame_time_ms"], 3),
        "output_in_range": bool(arr.min() >= 0 and arr.max() <= 1),
        "output_varies": bool(arr.std() > 1e-6),
        "realtime_ok": stats["rtf"] < 1.0,
    }


def check_fallback_matrix(audio: np.ndarray) -> dict:
    from koemorph_tpu.features.emotion import EmotionExtractor

    results = {}
    for backend in ("emotion2vec", "egemaps", "basic"):
        ex = EmotionExtractor(backend=backend, enable_caching=False)
        out = ex.extract_features(audio)
        emb = out["embeddings"]
        results[backend] = {
            "resolved_backend": out["metadata"]["backend_used"],
            "dim": int(emb.shape[-1]),
            "finite": bool(np.isfinite(emb).all()),
            "blendshapes_valid": bool(
                (out["blendshape_weights"] >= 0).all()
                and (out["blendshape_weights"] <= 1).all()),
        }
    # emotion2vec without weights must demote to egemaps (88 or 264-D)
    results["fallback_demotion_ok"] = \
        results["emotion2vec"]["resolved_backend"] != "emotion2vec"
    return results


def check_backend_perf(audio: np.ndarray, plot_dir: str | None) -> dict:
    import jax
    import jax.numpy as jnp
    from koemorph_tpu.features.basic import basic_emotion_features
    from koemorph_tpu.ops.egemaps import EgemapsConfig, egemaps_functionals

    a = jnp.asarray(audio)
    timings = {}
    for name, fn in (
        ("egemaps", jax.jit(lambda x: egemaps_functionals(
            x, EgemapsConfig()))),
        ("basic", jax.jit(lambda x: basic_emotion_features(x))),
    ):
        out = fn(a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(a)
        jax.block_until_ready(out)
        timings[name] = round((time.perf_counter() - t0) / 10 * 1e3, 3)

    if plot_dir:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(5, 3))
            ax.bar(list(timings), list(timings.values()))
            ax.set_ylabel("ms / extraction")
            ax.set_title("emotion backend latency")
            Path(plot_dir).mkdir(parents=True, exist_ok=True)
            out_png = Path(plot_dir) / "egemaps_performance_comparison.png"
            fig.tight_layout()
            fig.savefig(out_png, dpi=100)
            plt.close(fig)
            timings["plot"] = str(out_png)
        except Exception as e:  # pragma: no cover
            logger.warning("plotting failed: %s", e)
    return timings


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--plot", default=None, help="directory for PNGs")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    audio = synth_speech(args.seconds)
    report = {
        "streaming": check_streaming(audio, args.fps),
        "fallback_matrix": check_fallback_matrix(audio[:32000]),
        "backend_perf_ms": check_backend_perf(audio[:32000], args.plot),
    }
    ok = (report["streaming"]["output_in_range"]
          and report["streaming"]["output_varies"]
          and report["fallback_matrix"]["fallback_demotion_ok"])
    report["ok"] = ok
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
