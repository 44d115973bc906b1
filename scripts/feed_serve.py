#!/usr/bin/env python
"""UDP feeder for the multi-session server: replay WAV lanes into
``scripts/serve.py --listen`` at the real-time wire cadence.

One process simulates N independent clients: every tick it sends one
int16 PCM datagram per session (``!I`` session id + hop samples,
little-endian — the listen protocol, see scripts/serve.py docstring),
paced at the target fps. This is the client half of the live-loop
serving validation in docs/performance.md ("Live-loop serving
validation"): the reference has no serving client either — its
scripts/rt.py reads the microphone directly (reference
scripts/rt.py:465-519) — so this stands in for a fleet of capture
clients.

Usage (feed 64 lanes for 500 ticks):

    python scripts/serve.py --listen --listen-port 9100 --sessions 64 &
    # wait for the server's "loop is live" log line, then:
    python scripts/feed_serve.py --port 9100 --sessions 64 \
        --ticks 500 a.wav b.wav
"""

from __future__ import annotations

import argparse
import socket
import struct
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from koemorph_tpu.data.wav import read_wav  # noqa: E402

_HEADER = struct.Struct("!I")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wavs", nargs="+", help="WAV files tiled across lanes")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9100)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--ticks", type=int, default=None,
                    help="stop after this many ticks (default: shortest "
                         "lane)")
    ap.add_argument("--fps", type=int, default=30, choices=(30, 60))
    ap.add_argument("--sample-rate", type=int, default=16000)
    args = ap.parse_args()

    hop = args.sample_rate // args.fps
    lanes = []
    for i in range(args.sessions):
        audio, sr = read_wav(args.wavs[i % len(args.wavs)], mono=True)
        if sr != args.sample_rate:
            raise SystemExit(f"{args.wavs[i % len(args.wavs)]}: sample "
                             f"rate {sr} != {args.sample_rate}")
        lanes.append(np.clip(np.asarray(audio) * 32767.0,
                             -32768, 32767).astype("<i2"))
    n = min(lane.size // hop for lane in lanes)
    if args.ticks is not None:
        n = min(n, args.ticks)

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    budget = hop / args.sample_rate
    next_tick = time.perf_counter()
    t0 = time.perf_counter()
    late = 0
    for t in range(n):
        now = time.perf_counter()
        if now < next_tick:
            time.sleep(next_tick - now)
        next_tick = max(next_tick + budget, now)
        for s in range(args.sessions):
            sock.sendto(
                _HEADER.pack(s)
                + lanes[s][t * hop:(t + 1) * hop].tobytes(),
                (args.host, args.port))
        if time.perf_counter() > next_tick:
            late += 1
    elapsed = time.perf_counter() - t0
    print(f"fed {n} ticks x {args.sessions} lanes in {elapsed:.1f}s "
          f"({n / elapsed:.1f} ticks/s, {late} late)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
