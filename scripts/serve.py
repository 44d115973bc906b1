#!/usr/bin/env python
"""Multi-session streaming server CLI: N concurrent avatars on one chip.

The reference serves exactly ONE session per process (reference
scripts/rt.py main loop: one AudioBuffer + one model instance). This CLI
fronts :class:`koemorph_tpu.runtime.MultiStreamInference` — the batched
vmap streaming step that serves hundreds of independent real-time
sessions per chip (docs/performance.md: 384 concurrent 30 fps sessions
measured real-time at full production fidelity) — with two ingest
modes:

replay
    Feed WAV files (tiled across the session lanes) through the batched
    step, paced at the target fps or as fast as possible
    (``--no-realtime``). Offline-testable: the CLI smoke tests drive
    this mode on CPU.

listen
    One UDP socket ingests interleaved audio datagrams from any number
    of clients: ``!I`` session id (0..sessions-1) followed by int16
    little-endian mono PCM at the configured sample rate. Sessions that
    underrun a tick receive silence (the engine treats silence as a
    quiet microphone). An EMPTY payload for a session id re-admits that
    lane as a fresh session (silence rings, unsmoothed first frame) via
    ``MultiStreamInference.reset_sessions``.

Output fan-out (``--output``):
    udp   one socket, one JSON datagram per session per frame with a
          ``session`` field (consumers demux on it)
    osc   per-session OSC address ``<base>/<session>``
    file  one JSONL stream with a ``session`` field per row
    none  discard (capacity testing)

Usage:
    python scripts/serve.py --replay a.wav b.wav --sessions 4 \
        --output file --output-file frames.jsonl --no-realtime
    python scripts/serve.py --listen --listen-port 9100 --sessions 16 \
        --output udp --port 9200
"""

from __future__ import annotations

import argparse
import json
import logging
import socket
import struct
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax                                              # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()
import numpy as np                                      # noqa: E402

logger = logging.getLogger("serve")

_HEADER = struct.Struct("!I")


class SessionIngest:
    """Assembles per-session sample queues from interleaved datagrams.

    Pure host-side bookkeeping (no JAX): feed datagrams with
    :meth:`push`, then :meth:`take_block` returns the next (sessions,
    hop) float32 block, zero-filling lanes that underran. Session ids
    outside [0, sessions) and malformed datagrams are counted and
    dropped, never raised — one bad client must not kill the server.
    """

    def __init__(self, sessions: int, hop: int,
                 max_buffer_hops: int = 300):
        self.sessions = sessions
        self.hop = hop
        # bound each lane's backlog (~10 s at 30 fps) so one fast client
        # cannot grow host memory without limit; overflow drops OLDEST
        # samples (the stream stays current, like a real-time mic ring)
        self.max_samples = max_buffer_hops * hop
        # queues hold RAW int16 PCM: the engine converts on device
        # (bit-exact x * 2^-15), so the server never touches the samples
        # and each tick uploads half the bytes of a float32 block
        self.queues: list[np.ndarray] = [
            np.zeros(0, np.int16) for _ in range(sessions)]
        self.resets: set[int] = set()
        self.dropped_datagrams = 0
        self.overflowed_samples = 0

    def push(self, datagram: bytes) -> None:
        if len(datagram) < _HEADER.size:
            self.dropped_datagrams += 1
            return
        (sid,) = _HEADER.unpack_from(datagram)
        if sid >= self.sessions:
            self.dropped_datagrams += 1
            return
        payload = datagram[_HEADER.size:]
        if not payload:                       # empty payload = lane reset
            self.resets.add(sid)
            self.queues[sid] = np.zeros(0, np.int16)
            return
        if len(payload) % 2:
            self.dropped_datagrams += 1
            return
        pcm = np.frombuffer(payload, "<i2")
        q = np.concatenate([self.queues[sid], pcm])
        if q.size > self.max_samples:
            self.overflowed_samples += q.size - self.max_samples
            q = q[-self.max_samples:]
        self.queues[sid] = q

    def take_resets(self) -> list[int]:
        out = sorted(self.resets)
        self.resets.clear()
        return out

    def take_block(self) -> np.ndarray:
        """Next (sessions, hop) int16 block; lanes with < hop samples
        queued are zero-filled (silence) without consuming their partial
        data."""
        block = np.zeros((self.sessions, self.hop), np.int16)
        for i, q in enumerate(self.queues):
            if q.size >= self.hop:
                block[i] = q[: self.hop]
                self.queues[i] = q[self.hop:]
        return block


class SessionSender:
    """Per-session output fan-out over one BlendshapeStreamer-compatible
    surface (UDP JSON with a ``session`` field / per-session OSC address
    / one JSONL file with a ``session`` field).

    The UDP/file JSON paths use the native batch formatter when available
    (native/koemorph_host.cpp ``km_emit_frames_udp`` /
    ``km_format_frames_jsonl``): the Python json.dumps loop measures
    ~130 us/session — 67 ms/tick at 512 sessions, twice the 33 ms frame
    budget and the real serving ceiling — vs ~6 us/session in C (values
    agree within 5e-10; consumers parse the same fields). The Python loop
    remains the fallback and the wire-contract reference."""

    def __init__(self, mode: str, host: str, port: int,
                 osc_address: str, output_file: str | None,
                 native: bool = True):
        self.mode = mode
        self.host = host
        self.port = port
        self.osc_address = osc_address
        self.frames_sent = 0
        self.emit_path = "python"
        self._sock = None
        self._fh = None
        self._ip = None
        if mode in ("udp", "osc"):
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        elif mode == "file":
            if not output_file:
                raise ValueError("output_file required for file mode")
            self._fh = open(output_file, "w")
        elif mode != "none":
            raise ValueError(f"unknown output mode: {mode}")
        if native and mode in ("udp", "file"):
            from koemorph_tpu.data.native import native_lib
            if native_lib() is not None:
                self.emit_path = "native"
                if mode == "udp":
                    try:
                        self._ip = socket.gethostbyname(host)
                    except OSError:
                        self.emit_path = "python"

    def send(self, frames: np.ndarray, timestamp: float) -> None:
        """``frames`` is (sessions, 52)."""
        if self.mode == "none":
            self.frames_sent += len(frames)
            return
        if self.mode == "osc":
            from koemorph_tpu.runtime.streamers import encode_osc_message
            for i, row in enumerate(frames):
                self._sock.sendto(
                    encode_osc_message(f"{self.osc_address}/{i}",
                                       np.asarray(row).tolist()),
                    (self.host, self.port))
                self.frames_sent += 1
            return
        if self.emit_path == "native":
            from koemorph_tpu.data.native import (
                emit_frames_udp_native, format_frames_jsonl_native)
            if self.mode == "udp":
                sent = emit_frames_udp_native(
                    frames, timestamp, self._sock.fileno(),
                    self._ip, self.port)
                if sent is not None:
                    self.frames_sent += sent
                    return
            else:
                payload = format_frames_jsonl_native(frames, timestamp)
                if payload is not None:
                    self._fh.write(payload.decode("utf-8"))
                    self._fh.flush()
                    self.frames_sent += len(frames)
                    return
            self.emit_path = "python"   # native refused -> stay on Python
        for i, row in enumerate(frames):
            payload = json.dumps({
                "timestamp": timestamp,
                "session": i,
                "blendshapes": np.asarray(row, np.float32).tolist(),
            })
            if self.mode == "udp":
                self._sock.sendto(payload.encode("utf-8"),
                                  (self.host, self.port))
            else:
                self._fh.write(payload + "\n")
            self.frames_sent += 1
        if self._fh is not None:
            self._fh.flush()

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
        if self._fh is not None:
            self._fh.close()


def build_server(args):
    from koemorph_tpu.runtime import MultiStreamInference
    from koemorph_tpu.runtime.engine import build_streaming_model

    params, cfg = build_streaming_model(
        d_model=args.d_model, num_heads=args.num_heads, fps=args.fps,
        emotion_backend=args.emotion_backend,
        sample_rate=args.sample_rate, checkpoint=args.model)
    mesh = None
    if args.mesh_devices:
        from koemorph_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices=args.mesh_devices)
    return MultiStreamInference(params, cfg, n_sessions=args.sessions,
                                mesh=mesh,
                                refresh_cohorts=args.refresh_cohorts)


def _load_replay_lanes(paths: list[str], sessions: int, sample_rate: int,
                       hop: int) -> np.ndarray:
    """WAV files tiled across lanes -> (sessions, k*hop) float32."""
    from koemorph_tpu.data.wav import read_wav

    cache: dict[str, np.ndarray] = {}
    lanes = []
    for i in range(sessions):
        path = str(paths[i % len(paths)])
        a = cache.get(path)
        if a is None:
            audio, sr = read_wav(path, mono=True)
            if sr != sample_rate:
                raise ValueError(
                    f"{path}: sample rate {sr} != {sample_rate} "
                    f"(resample offline)")
            a = np.asarray(audio, np.float32).reshape(-1)
            cache[path] = a
        lanes.append(a)
    n = max(a.size for a in lanes)
    n = ((n + hop - 1) // hop) * hop
    block = np.zeros((sessions, n), np.float32)
    for i, a in enumerate(lanes):
        block[i, : a.size] = a
    return block


def _emit_stats(server, sender, *, mode: str, ticks: int, elapsed: float,
                work_s: list[float], late: int, ingest=None,
                pipelined: bool = True) -> None:
    """One JSON line of live-loop serving stats on stdout — the number
    the scan-probe capacity is validated against (VERDICT r4 item 6):
    sustained tick rate through the REAL ingest->step->emit loop, the
    full per-tick host+device work wall (not just dispatch), and
    drop/overflow accounting."""
    w = np.asarray(work_s) if work_s else np.zeros(1)
    stats = {
        "mode": mode,
        "ticks": ticks,
        "sustained_fps": round(ticks / elapsed, 2) if elapsed > 0 else 0.0,
        "target_fps": server.cfg.target_fps,
        "work_p50_ms": round(float(np.percentile(w, 50)) * 1e3, 3),
        "work_p99_ms": round(float(np.percentile(w, 99)) * 1e3, 3),
        "work_max_ms": round(float(w.max()) * 1e3, 3),
        "late_ticks": late,
        "late_frac": round(late / max(ticks, 1), 4),
        "frames_sent": sender.frames_sent,
        "emit_path": sender.emit_path,
        "emit_mode": "pipelined" if pipelined else "sync",
        "step": {k: round(v, 3) if isinstance(v, float) else v
                 for k, v in server.performance_stats().items()},
    }
    if ingest is not None:
        stats["dropped_datagrams"] = ingest.dropped_datagrams
        stats["overflowed_samples"] = ingest.overflowed_samples
    print(json.dumps({"performance_stats": stats}), flush=True)


def serve_replay(server, sender, args) -> int:
    hop = server.cfg.hop_length
    lanes = _load_replay_lanes(args.replay, args.sessions,
                               args.sample_rate, hop)
    n_frames = lanes.shape[1] // hop
    if args.max_frames is not None:
        n_frames = min(n_frames, args.max_frames)
    budget = hop / args.sample_rate
    logger.info("replay: %d sessions x %d frames", args.sessions, n_frames)
    server.warmup()
    # --device-replay pre-stages the whole (S, T) lane block in HBM and
    # slices each tick's hop ON DEVICE (one jitted dynamic-slice with a
    # traced tick index, so every tick reuses one executable). Removes
    # the per-tick (S, hop) host->device audio upload — the transport
    # bandwidth wall when the chip sits behind a network tunnel
    # (measured: 1.1 MB/tick at S=512/30 fps float32 = 33 MB/s).
    lanes_dev = None
    take_hop = None
    if args.device_replay:
        import jax.numpy as jnp
        from jax import lax
        lanes_dev = server._put_hops(jnp.asarray(lanes))
        take_hop = jax.jit(lambda block, t: lax.dynamic_slice_in_dim(
            block, t * hop, hop, axis=1))
        np.asarray(take_hop(lanes_dev, 0))   # compile before the clock
    # Pipelined emit (default): dispatch tick t's device step, start an
    # async device->host copy of its output, and emit tick t-1's frames
    # (whose copy has been in flight for a whole tick, so materializing
    # it is nearly free). The device->host fetch costs a full transport
    # round trip when taken synchronously (~30 ms through the axon
    # tunnel — the entire 33 ms frame budget); overlapping it with the
    # next step's device work + pacing sleep removes it from the tick
    # wall at the price of ONE frame (33 ms at 30 fps) of added output
    # latency. --sync-emit restores the reference-style synchronous
    # loop (reference scripts/rt.py:465-519 fetches every frame).
    pipeline = not args.sync_emit
    work_s: list[float] = []
    late = 0
    pending = None                       # (device frames, wall timestamp)
    next_tick = time.perf_counter()
    t_start = time.perf_counter()
    for t in range(n_frames):
        if not args.no_realtime:
            now = time.perf_counter()
            if now < next_tick:
                time.sleep(next_tick - now)
            # resync after a stall (same rule as the listen loop): a
            # deadline that fell more than one budget behind would mark
            # every later tick late and skip every later sleep, so one
            # hiccup would poison the whole run's accounting
            next_tick = max(next_tick + budget, now)
        w0 = time.perf_counter()
        if lanes_dev is not None:
            out = server.step(take_hop(lanes_dev, t))
        else:
            out = server.step(lanes[:, t * hop: (t + 1) * hop])
        if pipeline:
            try:
                out.copy_to_host_async()
            except AttributeError:       # non-jax array (CPU paths)
                pass
            if pending is not None:
                sender.send(np.asarray(pending[0]), pending[1])
            pending = (out, time.time())
        else:
            sender.send(np.asarray(out), time.time())
        work_s.append(time.perf_counter() - w0)
        if not args.no_realtime and time.perf_counter() > next_tick:
            late += 1                    # tick finished past its deadline
        if args.stats_every and (t + 1) % args.stats_every == 0:
            ms = 1e3 * float(np.mean(server.step_times or [0.0]))
            logger.info("frame %d/%d  step %.2f ms (%d sessions)",
                        t + 1, n_frames, ms, args.sessions)
    if pending is not None:              # flush the last pipelined frame
        sender.send(np.asarray(pending[0]), pending[1])
    elapsed = time.perf_counter() - t_start
    logger.info("done: %d frames sent", sender.frames_sent)
    _emit_stats(server, sender, mode="replay", ticks=n_frames,
                elapsed=elapsed, work_s=work_s, late=late,
                pipelined=pipeline)
    return 0


def serve_listen(server, sender, args) -> int:
    hop = server.cfg.hop_length
    budget = hop / args.sample_rate
    ingest = SessionIngest(args.sessions, hop)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((args.listen_host, args.listen_port))
    logger.info("listening on udp://%s:%d for %d sessions (hop %d)",
                args.listen_host, args.listen_port, args.sessions, hop)
    server.warmup(dtype=np.int16)        # the loop feeds raw PCM blocks
    # pre-compile the single-lane reset executable so a client's first
    # reset datagram doesn't pay an XLA compile inside a 33 ms tick (all
    # lanes are fresh at startup, so this is a state no-op)
    server.reset_sessions([0])
    logger.info("serving: warmup complete, loop is live")
    pipeline = not args.sync_emit        # see serve_replay
    sent = 0
    work_s: list[float] = []
    late = 0
    pending = None
    t_start = time.perf_counter()
    next_tick = time.perf_counter() + budget
    try:
        while args.max_frames is None or sent < args.max_frames:
            # guaranteed drain: take everything already queued even when
            # the previous tick overran the budget, so sustained overload
            # degrades to late frames instead of permanently starved ingest
            while True:
                sock.settimeout(0.0)
                try:
                    datagram, _addr = sock.recvfrom(65536)
                except (BlockingIOError, socket.timeout):
                    break
                ingest.push(datagram)
            # then block-drain until the tick deadline
            while True:
                remain = next_tick - time.perf_counter()
                if remain <= 0:
                    break
                sock.settimeout(remain)
                try:
                    datagram, _addr = sock.recvfrom(65536)
                except socket.timeout:
                    break
                ingest.push(datagram)
            # resync after overload: a deadline that fell behind the wall
            # clock would otherwise make every later tick skip its
            # block-drain phase forever
            behind = time.perf_counter() > next_tick + budget
            next_tick = max(next_tick + budget, time.perf_counter())
            resets = ingest.take_resets()
            for sid in resets:
                # one lane per call: reuses the pre-compiled size-1
                # executable regardless of how many lanes a client resets
                server.reset_sessions([sid])
            if resets:
                logger.info("reset sessions %s", resets)
            w0 = time.perf_counter()
            out = server.step(ingest.take_block())
            if pipeline:
                try:
                    out.copy_to_host_async()
                except AttributeError:
                    pass
                if pending is not None:
                    sender.send(np.asarray(pending[0]), pending[1])
                pending = (out, time.time())
            else:
                sender.send(np.asarray(out), time.time())
            work_s.append(time.perf_counter() - w0)
            if behind:
                late += 1
            sent += 1
            if args.stats_every and sent % args.stats_every == 0:
                ms = 1e3 * float(np.mean(server.step_times or [0.0]))
                logger.info(
                    "tick %d  step %.2f ms (%d sessions)  dropped=%d "
                    "overflowed=%d", sent, ms, args.sessions,
                    ingest.dropped_datagrams, ingest.overflowed_samples)
    except KeyboardInterrupt:
        logger.info("interrupted")
    finally:
        sock.close()
    if pending is not None:              # flush the last pipelined frame
        sender.send(np.asarray(pending[0]), pending[1])
    logger.info("done: %d ticks, %d frames sent, %d dropped datagrams",
                sent, sender.frames_sent, ingest.dropped_datagrams)
    _emit_stats(server, sender, mode="listen", ticks=sent,
                elapsed=time.perf_counter() - t_start, work_s=work_s,
                pipelined=pipeline,
                late=late, ingest=ingest)
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sessions", type=int, default=4)
    p.add_argument("--replay", nargs="+",
                   help="WAV files tiled across session lanes")
    p.add_argument("--listen", action="store_true",
                   help="ingest UDP audio datagrams (see module docstring)")
    p.add_argument("--listen-host", default="127.0.0.1")
    p.add_argument("--listen-port", type=int, default=9100)
    p.add_argument("--model", help="checkpoint dir (orbax)")
    p.add_argument("--output", default="file",
                   choices=["udp", "osc", "file", "none"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9200)
    p.add_argument("--osc-address", default="/blendshapes")
    p.add_argument("--output-file", default="sessions.jsonl")
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--emotion-backend", default="egemaps",
                   choices=["egemaps", "basic"])
    p.add_argument("--refresh-cohorts", type=int, default=1,
                   help="stagger the emotion refresh over this many "
                        "session cohorts (1..emotion_update_frames); "
                        "flattens the every-300ms refresh spike and "
                        "raises per-chip capacity")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="shard the session axis over this many devices "
                        "(0 = single device; sessions must divide evenly; "
                        "capacity scales linearly — zero collectives)")
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop after this many ticks (tests/capacity runs)")
    p.add_argument("--no-realtime", action="store_true",
                   help="replay mode: as fast as possible")
    p.add_argument("--device-replay", action="store_true",
                   help="replay mode: pre-stage the whole lane block in "
                        "device memory and slice each tick's hop on "
                        "device — removes the per-tick audio upload "
                        "(the bandwidth wall behind a network tunnel)")
    p.add_argument("--stats-every", type=int, default=0)
    p.add_argument("--sync-emit", action="store_true",
                   help="fetch and emit each tick's frames synchronously "
                        "(reference-style loop). Default is pipelined "
                        "emit: the device->host copy of tick t overlaps "
                        "tick t+1's device work, hiding the transport "
                        "round trip at the cost of one frame of output "
                        "latency")
    p.add_argument("--python-emit", action="store_true",
                   help="force the pure-Python json.dumps output loop "
                        "(the wire-contract reference; the native batch "
                        "emitter is ~22x faster and is used by default "
                        "when the C++ library builds)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (functional checks)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    if bool(args.replay) == bool(args.listen):
        p.error("exactly one of --replay or --listen is required")

    server = build_server(args)
    sender = SessionSender(args.output, args.host, args.port,
                           args.osc_address,
                           args.output_file if args.output == "file"
                           else None,
                           native=not args.python_emit)
    try:
        if args.replay:
            return serve_replay(server, sender, args)
        return serve_listen(server, sender, args)
    finally:
        sender.close()


if __name__ == "__main__":
    sys.exit(main())
