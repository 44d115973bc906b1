"""Native host-library tests: exactness vs the pure-Python reference path
and fallback semantics. Skipped cleanly if the toolchain can't build it."""

import json

import numpy as np
import pytest

from koemorph_tpu.data.native import (
    decode_wav_native,
    native_lib,
    parse_blendshape_jsonl_native,
)
from koemorph_tpu.data.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(native_lib() is None,
                                reason="native library unavailable")


def _python_read_wav(path, mono=False):
    """Force the pure-Python decode path (dtype float64 skips native)."""
    audio, sr = read_wav(path, mono=mono, dtype=np.float64)
    return audio.astype(np.float32), sr


class TestWavDecode:
    @pytest.mark.parametrize("subtype", ["pcm16", "float32"])
    def test_bit_exact_vs_python(self, tmp_path, rng, subtype):
        x = rng.uniform(-0.9, 0.9, 8000).astype(np.float32)
        p = tmp_path / "t.wav"
        write_wav(p, x, 16000, subtype=subtype)
        a, sr = decode_wav_native(p.read_bytes())
        b, sr2 = _python_read_wav(p)
        assert sr == sr2 == 16000
        np.testing.assert_array_equal(a, b)

    def test_stereo_and_mono_mix(self, tmp_path, rng):
        x = rng.uniform(-0.5, 0.5, (4000, 2)).astype(np.float32)
        p = tmp_path / "s.wav"
        write_wav(p, x, 16000)
        a, _ = decode_wav_native(p.read_bytes())
        assert a.shape == (4000, 2)
        m, _ = decode_wav_native(p.read_bytes(), mono=True)
        np.testing.assert_allclose(m, a.mean(axis=1), atol=1e-7)

    def test_garbage_returns_none(self):
        assert decode_wav_native(b"not a wav at all") is None


class TestJsonlParse:
    def _payload(self, rng, n=100, extra_key=False):
        rows = rng.uniform(0, 1, (n, 52)).astype(np.float32)
        lines = []
        for i in range(n):
            rec = {"timestamp": i / 30.0,
                   "blendshapes": rows[i].round(6).tolist()}
            if extra_key:
                rec["session"] = "abc"
            lines.append(json.dumps(rec))
        return ("\n".join(lines) + "\n").encode(), np.round(rows, 6)

    def test_exact_parse(self, rng):
        raw, want = self._payload(rng)
        bs, ts = parse_blendshape_jsonl_native(raw)
        np.testing.assert_allclose(bs, want, atol=1e-6)
        np.testing.assert_allclose(ts, np.arange(100) / 30.0, atol=1e-9)

    def test_extra_keys_tolerated(self, rng):
        raw, want = self._payload(rng, extra_key=True)
        bs, _ = parse_blendshape_jsonl_native(raw)
        np.testing.assert_allclose(bs, want, atol=1e-6)

    def test_wrong_count_falls_back(self):
        raw = (json.dumps({"timestamp": 0.0,
                           "blendshapes": [0.1] * 51}) + "\n").encode()
        assert parse_blendshape_jsonl_native(raw) is None

    def test_bad_json_falls_back(self, rng):
        raw, _ = self._payload(rng, n=3)
        assert parse_blendshape_jsonl_native(raw + b"not json\n") is None

    def test_missing_field_falls_back(self):
        raw = (json.dumps({"blendshapes": [0.1] * 52}) + "\n").encode()
        assert parse_blendshape_jsonl_native(raw) is None

    def test_loader_integration(self, tmp_path, rng):
        """ARKitDataLoader returns identical data through the native path
        and the strict Python path."""
        from koemorph_tpu.data.io import ARKitDataLoader
        import koemorph_tpu.data.io as io_mod

        x = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
        write_wav(tmp_path / "a.wav", x, 16000)
        rows = rng.uniform(0, 1, (30, 52))
        with open(tmp_path / "a.jsonl", "w") as f:
            for i in range(30):
                f.write(json.dumps({
                    "timestamp": i / 30.0,
                    "blendshapes": rows[i].round(6).tolist()}) + "\n")
        loader = ARKitDataLoader(sample_rate=16000, target_fps=30.0)
        fast = loader.load_sample(tmp_path / "a.jsonl", tmp_path / "a.wav")

        import unittest.mock as mock
        with mock.patch.object(io_mod, "json", wraps=json):
            with mock.patch(
                    "koemorph_tpu.data.native.parse_blendshape_jsonl_native",
                    return_value=None):
                slow = loader.load_sample(tmp_path / "a.jsonl",
                                          tmp_path / "a.wav")
        np.testing.assert_allclose(fast["arkit"], slow["arkit"], atol=1e-6)
        np.testing.assert_array_equal(fast["wav"], slow["wav"])


class TestEmitFrames:
    """Native serving-emit hot path (km_emit_frames_udp /
    km_format_frames_jsonl): the Python json.dumps loop in
    scripts/serve.py SessionSender is the wire-contract reference —
    same fields, values within the formatter's 5e-10 bound."""

    def _python_rows(self, frames, ts):
        return [{"timestamp": ts, "session": i,
                 "blendshapes": np.asarray(row, np.float32).tolist()}
                for i, row in enumerate(frames)]

    def test_format_jsonl_matches_python_contract(self, rng):
        from koemorph_tpu.data.native import format_frames_jsonl_native
        frames = rng.uniform(0, 1, (17, 52)).astype(np.float32)
        ts = 1234.567891
        payload = format_frames_jsonl_native(frames, ts)
        assert payload is not None
        got = [json.loads(line) for line in payload.decode().splitlines()]
        want = self._python_rows(frames, ts)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert set(g) == set(w) == {"timestamp", "session",
                                        "blendshapes"}
            assert g["session"] == w["session"]
            assert abs(g["timestamp"] - w["timestamp"]) < 1e-6
            np.testing.assert_allclose(g["blendshapes"], w["blendshapes"],
                                       atol=5e-10)

    def test_format_edge_values(self):
        from koemorph_tpu.data.native import format_frames_jsonl_native
        frames = np.array([[0.0, 1.0, 0.5, 1e-6, 0.9999999, -0.25,
                            3.25e8, 0.03125]], np.float32)
        line = format_frames_jsonl_native(frames, 0.0).decode()
        got = np.asarray(json.loads(line)["blendshapes"], np.float64)
        np.testing.assert_allclose(got, frames[0].astype(np.float64),
                                   rtol=1e-8, atol=5e-10)
        # values >= 2^-6 round-trip float32 bit-exactly
        big = got[np.abs(frames[0]) >= 2.0 ** -6]
        ref = frames[0][np.abs(frames[0]) >= 2.0 ** -6]
        assert (big.astype(np.float32) == ref).all()

    def test_emit_udp_delivers_every_session(self, rng):
        import select
        import socket
        from koemorph_tpu.data.native import emit_frames_udp_native
        frames = rng.uniform(0, 1, (9, 52)).astype(np.float32)
        recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        recv.bind(("127.0.0.1", 0))
        port = recv.getsockname()[1]
        send = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            sent = emit_frames_udp_native(frames, 7.5, send.fileno(),
                                          "127.0.0.1", port)
            assert sent == 9
            rows = []
            while select.select([recv], [], [], 0.5)[0]:
                rows.append(json.loads(recv.recvfrom(65536)[0]))
                if len(rows) == 9:
                    break
            assert sorted(r["session"] for r in rows) == list(range(9))
            by_s = {r["session"]: r["blendshapes"] for r in rows}
            for i in range(9):
                np.testing.assert_allclose(by_s[i], frames[i], atol=5e-10)
        finally:
            recv.close()
            send.close()

    def test_bad_ip_returns_none(self, rng):
        import socket
        from koemorph_tpu.data.native import emit_frames_udp_native
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            frames = rng.uniform(0, 1, (2, 52)).astype(np.float32)
            assert emit_frames_udp_native(frames, 0.0, s.fileno(),
                                          "not-an-ip", 9999) is None
        finally:
            s.close()
