#!/usr/bin/env python
"""Stage split of the flagship batched sequential decode.

Round-3 follow-up: the eGeMAPS chain now accounts for only ~2.0-2.1 ms of
the ~3.7 ms B=8 x 17 s decode (docs/performance.md), so the *other* ~1.6 ms
— global mel STFT, the 65-window gather + per-window ref=max normalization,
the (B*n)-row attention batch, the EMA scan — is the next target. This
script times each stage in isolation with the tunnel-safe methodology of
scripts/profile_egemaps.py (scan-amortized, value-fetch sync, RTT
subtracted) and prints the split next to the full decode so the residual
(fusion overlap between stages) is visible.

    python scripts/profile_decode.py                  # B=8, 17 s, stride 4
    python scripts/profile_decode.py --batch 1 --seconds 8.55 --stride 1
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from koemorph_tpu.utils.profiling import (  # noqa: E402
    measure_rtt,
    scan_timed,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=17.05)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from koemorph_tpu.features.emotion import emotion_features
    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel, _ema_associative)
    from koemorph_tpu.ops.stft import stft_power

    rtt = measure_rtt()
    print(f"# rtt_ms={rtt * 1e3:.2f}  device={jax.devices()[0].device_kind}",
          flush=True)

    model = SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0, stride_frames=args.stride)
    hop = model.hop_length
    b = args.batch
    length = int(args.seconds * model.sample_rate)
    num_frames = length // hop
    n_out = max(1, (num_frames - model.window_frames) // args.stride + 1)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((b, length)).astype(np.float32) * 0.1)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, length), jnp.float32))["params"]
    jax.block_until_ready(params)

    results = {}

    def report(name, ms, flops):
        tf = flops / (ms / 1e3) / 1e12 if ms > 0 else 0.0
        results[name] = {"ms": round(ms, 4), "gflop": round(flops / 1e9, 2),
                         "tflops": round(tf, 2)}
        print(f"{name:32s} {ms:8.3f} ms   {flops / 1e9:8.2f} GF  "
              f"{tf:6.2f} TF/s", flush=True)

    # ---- full decode ----
    def full(a):
        return model.apply({"params": params}, a,
                           deterministic=True)["blendshapes"]

    ms, fl = scan_timed(full, (audio,), rtt=rtt, iters=args.iters)
    report("full_decode", ms, fl)
    print(f"    -> {b * n_out / (ms / 1e3):,.0f} frames/s/chip", flush=True)

    # ---- stage: emotion chain (eGeMAPS 3-window concat, B rows) ----
    ms, fl = scan_timed(
        lambda a: emotion_features(a, model.emotion_config), (audio,),
        rtt=rtt, iters=args.iters)
    report("emotion_features (egemaps)", ms, fl)

    # ---- stage: global mel (STFT + filterbank + log) ----
    cfg = model.mel_frontend

    def global_mel(a):
        spec = stft_power(a, n_fft=cfg.n_fft, hop_length=hop,
                          center=True, power=2.0)
        melp = jnp.matmul(spec, cfg.filterbank(dtype=spec.dtype),
                          precision="highest")
        return 10.0 * jnp.log10(jnp.maximum(melp, 1e-10))

    ms, fl = scan_timed(global_mel, (audio,), rtt=rtt, iters=args.iters)
    report("global_mel", ms, fl)

    log_mel = jax.jit(global_mel)(audio)
    log_mel = jnp.asarray(log_mel)
    w_frames = model.window_frames + 1
    starts = np.arange(n_out) * args.stride
    g = jnp.asarray(starts[:, None] + np.arange(w_frames)[None, :])

    # ---- stage: window gather + per-window ref=max normalization ----
    def gather_norm(lm):
        windows = jnp.take(lm, g, axis=1)              # (B, n, 257, 80)
        wmax = jnp.max(windows, axis=(-2, -1), keepdims=True)
        norm = (jnp.maximum(windows - wmax, -80.0) + 80.0) / 80.0
        return norm[..., : model.window_frames, :], norm[..., -3:, :]

    ms, fl = scan_timed(gather_norm, (log_mel,), rtt=rtt, iters=args.iters)
    report("window_gather_norm", ms, fl)

    # ---- stage: attention batch over all windows ----
    mel_w, detail_w = jax.jit(gather_norm)(log_mel)
    mel_w = jnp.asarray(mel_w).reshape(b * n_out, model.window_frames, 80)
    detail_w = jnp.asarray(detail_w).reshape(b * n_out, 3, 80)
    emotion = jnp.asarray(
        rng.standard_normal((b, model.d_model)).astype(np.float32))
    from koemorph_tpu.models.dual_stream import DualStreamCrossAttention

    attn = DualStreamCrossAttention(
        d_model=model.d_model, num_heads=model.num_heads,
        num_mel_channels=80, mel_sequence_length=model.mel_sequence_length,
        mel_temporal_frames=3, emotion_dim=model.d_model,
        dropout=0.0, num_blendshapes=model.num_blendshapes,
        use_learnable_weights=model.use_learnable_weights,
        temperature=model.fusion_temperature)
    attn_params = params["dual_stream_attention"]

    def attention_batch(mw, dw, emo):
        return attn.apply({"params": attn_params}, mw, dw, emo,
                          deterministic=True)["blendshapes"]

    ms, fl = scan_timed(attention_batch, (mel_w, detail_w, emotion),
                        rtt=rtt, iters=args.iters)
    report(f"attention_batch ({b * n_out} rows)", ms, fl)

    # same stage with the pre-dedup per-window emotion rows, for the A/B
    emotion_rep = jnp.repeat(emotion, n_out, axis=0)
    ms, fl = scan_timed(attention_batch, (mel_w, detail_w, emotion_rep),
                        rtt=rtt, iters=args.iters)
    report("attention_batch (emo per win)", ms, fl)

    # ---- stage: EMA associative scan ----
    raw_seq = jnp.asarray(
        rng.standard_normal((n_out, b, 52)).astype(np.float32))

    def ema(rs):
        return _ema_associative(rs, jnp.float32(0.7))

    ms, fl = scan_timed(ema, (raw_seq,), rtt=rtt, iters=args.iters)
    report("ema_scan", ms, fl)

    staged = sum(v["ms"] for k, v in results.items() if k != "full_decode")
    print(f"# stage sum {staged:.3f} ms vs full "
          f"{results['full_decode']['ms']:.3f} ms "
          f"(residual = fusion overlap / projection / scheduling)",
          flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
