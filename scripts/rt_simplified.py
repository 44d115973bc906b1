#!/usr/bin/env python
"""Real-time mel-only inference CLI (BASELINE config #1).

Parity target: reference scripts/rt_simplified.py (SimplifiedRealTimeInference:
1 s audio window -> SimplifiedKoeMorphModel -> UDP/OSC/file streamer, paced
at the target fps with frame-time reporting). The model forward is one jitted
static-shape function; the rolling 1 s window lives on the host (it's the
model input, not carried state).

Usage:
    python scripts/rt_simplified.py --input speech.wav --output file \
        --output-file frames.jsonl --no-realtime
    python scripts/rt_simplified.py --input speech.wav --output udp --port 9001
"""

from __future__ import annotations

import argparse
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

logger = logging.getLogger("rt_simplified")


def build_model_and_params(args):
    from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel
    from koemorph_tpu.train.checkpoint import load_checkpoint

    model = SimplifiedKoeMorphModel(
        d_model=args.d_model, num_heads=args.num_heads,
        target_fps=args.fps, dropout=0.0)
    window = args.sample_rate  # 1 s window (reference rt_simplified.py)
    example = jnp.zeros((1, window), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)["params"]
    if args.model:
        params, meta = load_checkpoint(args.model, target=params)
        logger.info("Loaded checkpoint %s (epoch %s)", args.model,
                    meta.get("epoch"))
    else:
        logger.warning("No --model given; using randomly initialized weights")
    return model, params, window


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="WAV file to stream (omit for --mic)")
    p.add_argument("--mic", action="store_true", help="capture microphone")
    p.add_argument("--model", help="checkpoint dir (orbax, from training)")
    p.add_argument("--output", default="file",
                   choices=["udp", "osc", "file", "none"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9001)
    p.add_argument("--osc-address", default="/blendshapes")
    p.add_argument("--output-file", default="blendshapes.jsonl")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--no-realtime", action="store_true",
                   help="process the file as fast as possible")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (functional checks)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from koemorph_tpu.runtime.audio import AudioFileReader, MicCapture
    from koemorph_tpu.runtime.streamers import BlendshapeStreamer

    model, params, window = build_model_and_params(args)
    hop = int(args.sample_rate / args.fps)

    @jax.jit
    def frame_step(params, audio_window):
        return model.apply({"params": params}, audio_window,
                           deterministic=True)

    # warmup compile
    buf = np.zeros(window, np.float32)
    jax.block_until_ready(frame_step(params, jnp.asarray(buf[None])))
    logger.info("Model compiled; starting stream")

    if args.mic:
        source = MicCapture(args.sample_rate, hop)
    elif args.input:
        source = AudioFileReader(args.input, args.sample_rate, hop,
                                 realtime=not args.no_realtime)
        source.start()
    else:
        p.error("--input or --mic required")

    streamer = None
    if args.output != "none":
        streamer = BlendshapeStreamer(
            args.output, host=args.host, port=args.port,
            osc_address=args.osc_address,
            output_file=args.output_file if args.output == "file" else None)

    from koemorph_tpu.runtime.audio import EOS

    frame_times: list[float] = []
    frames = 0
    idle = 0
    try:
        while True:
            chunk = source.read()
            if chunk is EOS:
                break
            if chunk is None:       # transient stall
                idle += 1
                if idle >= 10:
                    logger.warning("source idle; stopping")
                    break
                continue
            idle = 0
            t0 = time.perf_counter()
            buf = np.concatenate([buf[len(chunk):], chunk])
            bs = np.asarray(
                frame_step(params, jnp.asarray(buf[None]))[0])
            frame_times.append(time.perf_counter() - t0)
            if streamer is not None:
                streamer.send(bs, time.time())
            frames += 1
            if args.max_frames and frames >= args.max_frames:
                break
    finally:
        source.stop()
        if streamer is not None:
            streamer.close()

    if frame_times:
        times = np.asarray(frame_times)
        budget = 1.0 / args.fps
        logger.info(
            "frames=%d avg=%.2fms max=%.2fms RTF=%.4f",
            frames, times.mean() * 1e3, times.max() * 1e3,
            times.mean() / budget)
    return 0


if __name__ == "__main__":
    sys.exit(main())
