#!/usr/bin/env python
"""Real-time dual-stream streaming inference CLI (BASELINE config #4).

Parity target: reference scripts/rt.py (mic/file -> per-frame features ->
model -> UDP/OSC/file streamer). Redesign: all streaming state (20 s audio
ring, incremental mel rows, cached eGeMAPS vector, EMA carry) is one
device-resident JAX pytree and the per-frame step is a single jitted call
(koemorph_tpu/runtime/streaming.py) — no host-side feature extraction.

Usage:
    python scripts/rt.py --input speech.wav --output file \
        --output-file frames.jsonl --no-realtime
    python scripts/rt.py --mic --output udp --port 9001
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

logger = logging.getLogger("rt")


def build_engine(args):
    from koemorph_tpu.runtime.engine import build_streaming_model
    from koemorph_tpu.runtime.streaming import StreamingInference

    params, cfg = build_streaming_model(
        d_model=args.d_model, num_heads=args.num_heads, fps=args.fps,
        emotion_backend=args.emotion_backend,
        sample_rate=args.sample_rate, checkpoint=args.model)
    return StreamingInference(params, cfg)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="WAV file to stream (omit for --mic)")
    p.add_argument("--mic", action="store_true")
    p.add_argument("--model", help="checkpoint dir (orbax)")
    p.add_argument("--output", default="file",
                   choices=["udp", "osc", "file", "none"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9001)
    p.add_argument("--osc-address", default="/blendshapes")
    p.add_argument("--output-file", default="blendshapes.jsonl")
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--emotion-backend", default="egemaps",
                   choices=["egemaps", "basic"])
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--no-realtime", action="store_true")
    p.add_argument("--list-devices", action="store_true",
                   help="list audio input devices and exit")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (functional checks)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from koemorph_tpu.runtime.audio import (
        AudioFileReader, MicCapture, list_audio_devices)
    from koemorph_tpu.runtime.engine import run_realtime_loop
    from koemorph_tpu.runtime.streamers import BlendshapeStreamer

    if args.list_devices:
        for d in list_audio_devices():
            print(d)
        return 0

    engine = build_engine(args)
    hop = engine.cfg.hop_length

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

    try:
        stats = run_realtime_loop(engine, source, streamer,
                                  max_frames=args.max_frames)
    finally:
        source.stop()
        if streamer is not None:
            streamer.close()
    logger.info("done: %s", stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
