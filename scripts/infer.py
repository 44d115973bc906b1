#!/usr/bin/env python
"""Offline file inference CLI (BASELINE config #2): WAV -> blendshape JSONL.

Full-utterance dual-stream decoding via SequentialDualStreamModel: one
global STFT, all sliding windows batched on the MXU, associative-scan EMA
smoothing (reference equivalent: the per-window host loop of
src/model/sequential_dual_stream_model.py:101-133, run offline).

Usage:
    python scripts/infer.py --input speech.wav --output frames.jsonl \
        [--model <ckpt>] [--fps 30|60] [--cpu]
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

import jax                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

logger = logging.getLogger("infer")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="blendshapes.jsonl")
    p.add_argument("--model", help="checkpoint dir (orbax)")
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--stride-frames", type=int, default=1)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--emotion-backend", default="egemaps",
                   choices=["egemaps", "basic"])
    p.add_argument("--decode-mode", default="parallel",
                   choices=["parallel", "chunked", "scan"],
                   help="'scan' is a legacy alias for 'chunked'")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.data.wav import read_wav, resample_linear
    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel)
    from koemorph_tpu.train.checkpoint import load_checkpoint

    window = 512 if args.fps == 60 else 256
    model = SequentialDualStreamModel(
        d_model=args.d_model, num_heads=args.num_heads,
        mel_sequence_length=window, target_fps=args.fps,
        emotion_backend=args.emotion_backend,
        use_concatenation=args.emotion_backend == "egemaps",
        stride_frames=args.stride_frames, decode_mode=args.decode_mode,
        dropout=0.0)
    hop = int(model.sample_rate / args.fps)

    audio, sr = read_wav(args.input)
    if sr != model.sample_rate:
        audio = resample_linear(audio, sr, model.sample_rate)
    # pad to at least one full window + whole hops (static-friendly shapes)
    min_len = (window + 1) * hop
    if len(audio) < min_len:
        audio = np.pad(audio, (0, min_len - len(audio)))
    usable = (len(audio) // hop) * hop
    audio_j = jnp.asarray(audio[:usable][None].astype(np.float32))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio_j)["params"]
    if args.model:
        params, meta = load_checkpoint(args.model, target=params)
        logger.info("Loaded %s (epoch %s)", args.model, meta.get("epoch"))
    else:
        logger.warning("No --model; decoding with random weights")

    decode = jax.jit(
        lambda p, a: model.apply({"params": p}, a, deterministic=True))
    t0 = time.perf_counter()
    out = decode(params, audio_j)
    seq = np.asarray(out["blendshapes"][0])     # (T_out, 52)
    dt = time.perf_counter() - t0
    audio_s = usable / model.sample_rate
    logger.info("decoded %d frames from %.2f s audio in %.2f s "
                "(RTF %.4f incl. compile)", seq.shape[0], audio_s, dt,
                dt / audio_s)

    with open(args.output, "w") as f:
        for i, frame in enumerate(seq):
            # frame i is aligned to the END of window i (see
            # koemorph_tpu/train/trainer.py sequence_targets)
            t = (window - 1 + i * args.stride_frames) / args.fps
            f.write(json.dumps({
                "timestamp": round(t, 6),
                "blendshapes": frame.round(6).tolist()}) + "\n")
    logger.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
