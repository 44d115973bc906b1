"""Multi-session server CLI (scripts/serve.py): ingest unit tests plus
subprocess smoke tests for the replay and UDP-listen modes.

The reference has no multi-session counterpart (reference scripts/rt.py
serves one session per process); the server fronts
koemorph_tpu.runtime.MultiStreamInference, whose lane-equivalence with
the single-session engine is pinned by tests/runtime/test_multistream.py
— these tests cover the CLI surface around it.
"""

import importlib.util
import json
import socket
import struct
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]


def _load_serve_module():
    spec = importlib.util.spec_from_file_location(
        "serve_cli", REPO / "scripts" / "serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def serve_mod():
    return _load_serve_module()


class TestSessionIngest:
    def test_push_and_take_block(self, serve_mod):
        ing = serve_mod.SessionIngest(sessions=3, hop=4)
        pcm = (np.array([0.5, -0.5, 0.25, -0.25], np.float32)
               * 32768.0).astype("<i2").tobytes()
        ing.push(struct.pack("!I", 1) + pcm)
        block = ing.take_block()
        assert block.shape == (3, 4)
        # blocks stay raw int16 (the engine converts on device: x * 2^-15
        # is bit-exact to the old host-side x / 32768.0)
        assert block.dtype == np.int16
        np.testing.assert_allclose(block[0], 0)
        np.testing.assert_allclose(block[1] / 32768.0,
                                   [0.5, -0.5, 0.25, -0.25], atol=1e-4)
        np.testing.assert_allclose(block[2], 0)
        # queue consumed: next block is silence again
        assert not ing.take_block().any()

    def test_partial_lane_not_consumed(self, serve_mod):
        ing = serve_mod.SessionIngest(sessions=1, hop=4)
        half = (np.ones(2, np.float32) * 16384).astype("<i2").tobytes()
        ing.push(struct.pack("!I", 0) + half)
        assert not ing.take_block().any()          # underrun -> silence
        ing.push(struct.pack("!I", 0) + half)
        assert ing.take_block().any()              # 4 samples now queued

    def test_bad_datagrams_dropped_not_raised(self, serve_mod):
        ing = serve_mod.SessionIngest(sessions=2, hop=4)
        ing.push(b"\x00")                          # short header
        ing.push(struct.pack("!I", 9) + b"\x00\x00")   # bad session id
        ing.push(struct.pack("!I", 0) + b"\x00")       # odd payload
        assert ing.dropped_datagrams == 3
        assert not ing.take_block().any()

    def test_empty_payload_is_reset(self, serve_mod):
        ing = serve_mod.SessionIngest(sessions=2, hop=2)
        pcm = (np.ones(2, np.float32) * 16384).astype("<i2").tobytes()
        ing.push(struct.pack("!I", 1) + pcm)
        ing.push(struct.pack("!I", 1))             # reset: clears queue too
        assert ing.take_resets() == [1]
        assert ing.take_resets() == []
        assert not ing.take_block().any()

    def test_backlog_bounded_drops_oldest(self, serve_mod):
        ing = serve_mod.SessionIngest(sessions=1, hop=2, max_buffer_hops=2)
        ramp = (np.arange(8, dtype=np.float32) / 8 * 32767).astype("<i2")
        ing.push(struct.pack("!I", 0) + ramp.tobytes())
        assert ing.overflowed_samples == 4
        block = ing.take_block()                   # newest 4 samples kept
        np.testing.assert_allclose(
            block[0].astype(np.float32) / 32768.0 * 8 * 32768 / 32767,
            [4, 5], atol=1e-2)


def run(args, timeout=420):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, timeout=timeout,
        capture_output=True, text=True)


@pytest.fixture(scope="module")
def speech_wavs(tmp_path_factory):
    from koemorph_tpu.data.wav import write_wav
    d = tmp_path_factory.mktemp("serve_wavs")
    paths = []
    for k, f0 in enumerate((160.0, 220.0)):
        t = np.arange(int(1.5 * 16000)) / 16000
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        p = d / f"speech{k}.wav"
        write_wav(p, x, 16000)
        paths.append(p)
    return paths


@pytest.mark.slow
class TestServeCli:
    def test_replay_smoke(self, speech_wavs, tmp_path):
        out = tmp_path / "sessions.jsonl"
        r = run(["scripts/serve.py", "--replay",
                 *(str(p) for p in speech_wavs),
                 "--sessions", "3", "--output", "file",
                 "--output-file", str(out), "--no-realtime",
                 "--max-frames", "6", "--cpu",
                 "--emotion-backend", "basic",
                 "--d-model", "32", "--num-heads", "2"])
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 6 * 3
        assert sorted({row["session"] for row in rows}) == [0, 1, 2]
        assert all(len(row["blendshapes"]) == 52 for row in rows)
        assert all(0.0 <= v <= 1.0
                   for row in rows for v in row["blendshapes"])
        # live-loop stats line (VERDICT r4 item 6): sustained rate, full
        # per-tick work wall percentiles, and the dispatch-path stats
        stats_lines = [l for l in r.stdout.splitlines()
                       if '"performance_stats"' in l]
        assert stats_lines, r.stdout[-500:]
        st = json.loads(stats_lines[-1])["performance_stats"]
        assert st["mode"] == "replay" and st["ticks"] == 6
        assert st["frames_sent"] == 6 * 3
        assert st["work_p99_ms"] > 0.0
        assert st["step"]["p99_step_ms"] >= st["step"]["p50_step_ms"] > 0

    def test_replay_smoke_mesh_sharded(self, speech_wavs, tmp_path):
        """--mesh-devices shards the session axis over the virtual
        8-device CPU mesh (conftest exports the XLA flag to
        subprocesses); outputs must be well-formed per lane."""
        out = tmp_path / "sessions.jsonl"
        r = run(["scripts/serve.py", "--replay",
                 *(str(p) for p in speech_wavs),
                 "--sessions", "4", "--mesh-devices", "4",
                 "--output", "file",
                 "--output-file", str(out), "--no-realtime",
                 "--max-frames", "5", "--cpu",
                 "--emotion-backend", "basic",
                 "--d-model", "32", "--num-heads", "2"])
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 5 * 4
        assert sorted({row["session"] for row in rows}) == [0, 1, 2, 3]
        assert all(len(row["blendshapes"]) == 52 for row in rows)

    def test_replay_smoke_60fps(self, speech_wavs, tmp_path):
        """--fps 60 serves the reference's 60 fps production mode
        (dual_stream_60fps.yaml sizing: 512-frame mel window, hop 266,
        ~18-frame refresh cadence) through the same CLI."""
        out = tmp_path / "sessions.jsonl"
        r = run(["scripts/serve.py", "--replay",
                 *(str(p) for p in speech_wavs),
                 "--sessions", "2", "--fps", "60",
                 "--output", "file",
                 "--output-file", str(out), "--no-realtime",
                 "--max-frames", "4", "--cpu",
                 "--emotion-backend", "basic",
                 "--d-model", "32", "--num-heads", "2"])
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 4 * 2
        assert all(len(row["blendshapes"]) == 52 for row in rows)

    def test_listen_loopback(self, tmp_path):
        # receiver socket for the server's UDP output
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(120.0)  # first frame waits out the server's warmup
        out_port = rx.getsockname()[1]
        # pick the ingest port the same way (bind-then-release keeps the
        # test free of hardcoded ports)
        probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        probe.bind(("127.0.0.1", 0))
        in_port = probe.getsockname()[1]
        probe.close()

        proc = subprocess.Popen(
            [sys.executable, "scripts/serve.py", "--listen",
             "--listen-port", str(in_port), "--sessions", "2",
             "--output", "udp", "--port", str(out_port),
             "--max-frames", "8", "--cpu",
             "--emotion-backend", "basic",
             "--d-model", "32", "--num-heads", "2"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            # feed session 1 while the server ticks; session 0 underruns
            pcm = (np.random.default_rng(0)
                   .standard_normal(533 * 10).astype(np.float32)
                   * 0.1 * 32767).astype("<i2").tobytes()
            deadline = time.time() + 300
            rows = []
            while len(rows) < 8 and time.time() < deadline:
                tx.sendto(struct.pack("!I", 1) + pcm, ("127.0.0.1", in_port))
                try:
                    data, _ = rx.recvfrom(65536)
                except socket.timeout:
                    break
                rows.append(json.loads(data))
            assert len(rows) >= 8, f"only {len(rows)} frames received"
            assert {r["session"] for r in rows} <= {0, 1}
            assert all(len(r["blendshapes"]) == 52 for r in rows)
        finally:
            tx.close()
            rx.close()
            try:
                proc.wait(timeout=300)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
        assert proc.returncode == 0, proc.stderr.read()[-2000:]


@pytest.mark.slow
class TestNativeEmit:
    def test_native_vs_python_file_output_agree(self, speech_wavs,
                                                tmp_path):
        """The native batch formatter (default) and the --python-emit
        json.dumps loop produce numerically identical JSONL streams
        (values within the formatter's 5e-10 bound) — the Python loop is
        the wire-contract reference."""
        outs = {}
        for name, extra in (("native", []), ("python", ["--python-emit"])):
            out = tmp_path / f"{name}.jsonl"
            r = run(["scripts/serve.py", "--replay", str(speech_wavs[0]),
                     "--sessions", "2", "--output", "file",
                     "--output-file", str(out), "--no-realtime",
                     "--max-frames", "5", "--cpu",
                     "--emotion-backend", "basic",
                     "--d-model", "32", "--num-heads", "2", *extra])
            assert r.returncode == 0, r.stderr[-2000:]
            stats = json.loads(
                [l for l in r.stdout.splitlines()
                 if '"performance_stats"' in l][-1])["performance_stats"]
            if name == "python":
                assert stats["emit_path"] == "python"
            outs[name] = [json.loads(l)
                          for l in out.read_text().splitlines()]
        assert len(outs["native"]) == len(outs["python"]) == 10
        for g, w in zip(outs["native"], outs["python"]):
            assert g["session"] == w["session"]
            np.testing.assert_allclose(g["blendshapes"], w["blendshapes"],
                                       atol=5e-10)


@pytest.mark.slow
class TestDeviceReplay:
    def test_device_replay_matches_host_replay(self, speech_wavs,
                                               tmp_path):
        """--device-replay (lanes pre-staged in device memory, hop sliced
        on device by one jitted dynamic-slice) must produce the same
        frame stream as the host-upload replay loop."""
        outs = {}
        for name, extra in (("host", []), ("device", ["--device-replay"])):
            out = tmp_path / f"{name}.jsonl"
            r = run(["scripts/serve.py", "--replay", str(speech_wavs[0]),
                     "--sessions", "2", "--output", "file",
                     "--output-file", str(out), "--no-realtime",
                     "--max-frames", "6", "--cpu",
                     "--emotion-backend", "basic",
                     "--d-model", "32", "--num-heads", "2", *extra])
            assert r.returncode == 0, r.stderr[-2000:]
            outs[name] = [json.loads(l)
                          for l in out.read_text().splitlines()]
        assert len(outs["host"]) == len(outs["device"]) == 12
        for g, w in zip(outs["device"], outs["host"]):
            assert g["session"] == w["session"]
            np.testing.assert_allclose(g["blendshapes"], w["blendshapes"],
                                       atol=1e-6)


@pytest.mark.slow
class TestFeedServe:
    def test_feeder_drives_listen_server(self, speech_wavs, tmp_path):
        """scripts/feed_serve.py (the client half of the live-loop
        validation) streams real int16 speech datagrams into all lanes
        of a listen server; the served frames must reflect the audio
        (non-constant output) with zero dropped datagrams."""
        out = tmp_path / "sessions.jsonl"
        probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        probe.bind(("127.0.0.1", 0))
        in_port = probe.getsockname()[1]
        probe.close()
        proc = subprocess.Popen(
            [sys.executable, "scripts/serve.py", "--listen",
             "--listen-port", str(in_port), "--sessions", "2",
             "--output", "file", "--output-file", str(out),
             "--max-frames", "10", "--cpu",
             "--emotion-backend", "basic",
             "--d-model", "32", "--num-heads", "2"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        try:
            # the feeder paces itself; start it immediately — the server
            # drains queued datagrams on every tick, and the OS buffer
            # absorbs the overlap with warmup at this tiny scale
            feed = run(["scripts/feed_serve.py", "--port", str(in_port),
                        "--sessions", "2", "--ticks", "40",
                        str(speech_wavs[0]), str(speech_wavs[1])],
                       timeout=120)
            assert feed.returncode == 0, feed.stderr[-2000:]
            proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        assert proc.returncode == 0, proc.stderr.read()[-2000:]
        stats_lines = [l for l in proc.stdout.read().splitlines()
                       if '"performance_stats"' in l]
        assert stats_lines
        st = json.loads(stats_lines[-1])["performance_stats"]
        assert st["dropped_datagrams"] == 0
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 10 * 2
        bs = np.array([r["blendshapes"] for r in rows])
        assert bs.std() > 0          # audio reached the model
