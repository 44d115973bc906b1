"""Data I/O tests with synthesized WAV+JSONL fixtures written to tmp_path
(mirrors reference tests/data/test_io.py)."""

import json

import numpy as np
import pytest

from koemorph_tpu.data.io import (
    ARKitDataLoader,
    detect_fps,
    load_blendshapes_with_fps,
    resample_blendshapes,
    validate_data_consistency,
)
from koemorph_tpu.data.wav import read_wav, resample_linear, write_wav

SR = 16000


def make_pair(tmp_path, name="sample", duration=2.0, fps=30.0, sr=SR,
              stereo=False, n_coeffs=52, bad_json=False, missing_field=None,
              subtype="pcm16"):
    rng = np.random.default_rng(0)
    n = int(duration * sr)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)).astype(
        np.float32)
    if stereo:
        audio = np.stack([audio, audio * 0.5], axis=1)
    wav_path = tmp_path / f"{name}.wav"
    write_wav(wav_path, audio, sr, subtype=subtype)

    jsonl_path = tmp_path / f"{name}.jsonl"
    frames = int(duration * fps)
    with open(jsonl_path, "w") as f:
        for t in range(frames):
            if bad_json and t == 1:
                f.write("not json\n")
                continue
            rec = {"timestamp": t / fps,
                   "blendshapes": rng.uniform(0, 1, n_coeffs).tolist()}
            if missing_field:
                rec.pop(missing_field)
            f.write(json.dumps(rec) + "\n")
    return jsonl_path, wav_path


class TestWav:
    @pytest.mark.parametrize("subtype", ["pcm16", "float32"])
    def test_round_trip(self, tmp_path, subtype):
        x = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.5).astype(
            np.float32)
        p = tmp_path / "x.wav"
        write_wav(p, x, SR, subtype=subtype)
        y, sr = read_wav(p)
        assert sr == SR
        tol = 1e-4 if subtype == "pcm16" else 1e-7
        np.testing.assert_allclose(y, x, atol=tol)

    def test_stereo_to_mono(self, tmp_path):
        left = np.full(100, 0.5, np.float32)
        right = np.full(100, -0.5, np.float32)
        p = tmp_path / "st.wav"
        write_wav(p, np.stack([left, right], 1), SR, subtype="float32")
        y, _ = read_wav(p, mono=True)
        np.testing.assert_allclose(y, 0.0, atol=1e-7)

    def test_not_a_wav_raises(self, tmp_path):
        p = tmp_path / "junk.wav"
        p.write_bytes(b"hello world, definitely not riff")
        with pytest.raises(ValueError, match="RIFF"):
            read_wav(p)

    def test_resample_linear_length(self):
        x = np.random.default_rng(0).standard_normal(SR).astype(np.float32)
        y = resample_linear(x, SR, 8000)
        assert abs(len(y) - 8000) <= 1

    @staticmethod
    def _write_extensible(path, payload, *, sub_format, bits, channels=1,
                          sr=SR):
        import struct
        guid = (struct.pack("<H", sub_format)
                + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa"
                  b"\x00\x38\x9b\x71")
        ext = struct.pack("<HI16s", bits, 0, guid)
        fmt = struct.pack("<HHIIHHH", 0xFFFE, channels, sr,
                          sr * channels * bits // 8, channels * bits // 8,
                          bits, len(ext)) + ext
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        path.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body))
                         + b"WAVE" + body)

    def test_extensible_int32_pcm_decodes_as_pcm(self, tmp_path):
        """A 32-bit integer PCM EXTENSIBLE WAV must decode via the SubFormat
        GUID, not be guessed as float32 from bit depth."""
        x = (np.sin(2 * np.pi * 440 * np.arange(1000) / SR) * 0.5)
        payload = (x * 2147483647).astype("<i4").tobytes()
        p = tmp_path / "ext_i32.wav"
        self._write_extensible(p, payload, sub_format=1, bits=32)
        y, sr = read_wav(p)
        assert sr == SR
        np.testing.assert_allclose(y, x.astype(np.float32), atol=1e-6)

    def test_extensible_float32_decodes_as_float(self, tmp_path):
        x = np.linspace(-0.9, 0.9, 1000).astype("<f4")
        p = tmp_path / "ext_f32.wav"
        self._write_extensible(p, x.tobytes(), sub_format=3, bits=32)
        y, _ = read_wav(p)
        np.testing.assert_allclose(y, x, atol=1e-7)

    def test_extensible_unknown_subformat_raises(self, tmp_path):
        p = tmp_path / "ext_alaw.wav"
        self._write_extensible(p, b"\x00" * 64, sub_format=6, bits=8)
        with pytest.raises(ValueError, match="SubFormat"):
            read_wav(p)


class TestARKitDataLoader:
    def test_load_sample(self, tmp_path):
        jsonl, wav = make_pair(tmp_path)
        loader = ARKitDataLoader()
        s = loader.load_sample(jsonl, wav)
        assert s["wav"].shape == (2 * SR,)
        assert s["arkit"].shape == (60, 52)

    def test_missing_file(self, tmp_path):
        jsonl, wav = make_pair(tmp_path)
        loader = ARKitDataLoader()
        with pytest.raises(FileNotFoundError):
            loader.load_sample(tmp_path / "nope.jsonl", wav)
        with pytest.raises(FileNotFoundError):
            loader.load_sample(jsonl, tmp_path / "nope.wav")

    def test_wrong_blendshape_count(self, tmp_path):
        jsonl, wav = make_pair(tmp_path, n_coeffs=51)
        with pytest.raises(ValueError, match="Expected 52"):
            ARKitDataLoader().load_sample(jsonl, wav)

    def test_duration_drift_gate(self, tmp_path):
        # 2 s audio but only 0.5 s of blendshapes -> drift 1.5 s > 1.0 s
        jsonl, wav = make_pair(tmp_path, duration=2.0)
        lines = jsonl.read_text().splitlines()[:15]
        jsonl.write_text("\n".join(lines) + "\n")
        with pytest.raises(ValueError, match="Time drift"):
            ARKitDataLoader().load_sample(jsonl, wav)

    def test_bad_json(self, tmp_path):
        jsonl, wav = make_pair(tmp_path, bad_json=True)
        with pytest.raises(ValueError, match="Invalid JSON"):
            ARKitDataLoader().load_sample(jsonl, wav)

    def test_missing_fields(self, tmp_path):
        jsonl, wav = make_pair(tmp_path, missing_field="timestamp")
        with pytest.raises(ValueError, match="timestamp"):
            ARKitDataLoader().load_sample(jsonl, wav)

    def test_stereo_mixed_to_mono(self, tmp_path):
        jsonl, wav = make_pair(tmp_path, stereo=True)
        s = ARKitDataLoader().load_sample(jsonl, wav)
        assert s["wav"].ndim == 1

    def test_out_of_range_warns(self, tmp_path):
        jsonl, wav = make_pair(tmp_path)
        rec = {"timestamp": 99.0, "blendshapes": [1.5] * 52}
        # rewrite with one bad row but keep duration ok
        lines = jsonl.read_text().splitlines()
        lines[0] = json.dumps(rec | {"timestamp": 0.0})
        jsonl.write_text("\n".join(lines) + "\n")
        with pytest.warns(UserWarning, match="outside"):
            ARKitDataLoader().load_sample(jsonl, wav)


class TestFpsDetection:
    def test_detect_30(self):
        assert detect_fps(np.arange(100) / 30.0) == 30.0

    def test_detect_60(self):
        assert detect_fps(np.arange(100) / 60.0) == 60.0

    def test_resample_30_to_60_doubles(self):
        bs = np.random.default_rng(0).uniform(0, 1, (30, 52)).astype(
            np.float32)
        out = resample_blendshapes(bs, 30.0, 60.0)
        assert out.shape == (60, 52)
        # endpoints preserved
        np.testing.assert_allclose(out[0], bs[0])
        np.testing.assert_allclose(out[-1], bs[-1])

    def test_round_trip_60_30_60(self, tmp_path):
        jsonl, wav = make_pair(tmp_path, fps=60.0)
        bs, fps = load_blendshapes_with_fps(jsonl)
        assert fps == 60.0
        down = resample_blendshapes(bs, 60.0, 30.0)
        assert down.shape[0] == bs.shape[0] // 2


class TestConsistency:
    def test_valid_samples(self, tmp_path):
        jsonl, wav = make_pair(tmp_path)
        s = ARKitDataLoader().load_sample(jsonl, wav)
        res = validate_data_consistency([s])
        assert res["valid"]

    def test_empty(self):
        assert not validate_data_consistency([])["valid"]
