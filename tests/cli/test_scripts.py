"""CLI smoke tests: every user-facing script runs end to end on CPU with
tiny settings (subprocess-level, so argument wiring and imports are covered
— the reference's CLIs rotted precisely because nothing executed them)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]


@pytest.fixture(scope="module")
def speech_wav(tmp_path_factory):
    from koemorph_tpu.data.wav import write_wav
    t = np.arange(3 * 16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 180 * t)
         * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    p = tmp_path_factory.mktemp("wav") / "speech.wav"
    write_wav(p, x, 16000)
    return p


def run(args, timeout=420):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, timeout=timeout,
        capture_output=True, text=True)


@pytest.mark.slow
class TestCliSmoke:
    def test_rt_simplified(self, speech_wav, tmp_path):
        out = tmp_path / "f.jsonl"
        r = run(["scripts/rt_simplified.py", "--input", str(speech_wav),
                 "--output", "file", "--output-file", str(out),
                 "--no-realtime", "--max-frames", "8", "--cpu",
                 "--d-model", "32", "--num-heads", "2"])
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) >= 1 and len(rows[0]["blendshapes"]) == 52

    def test_rt_dual_stream(self, speech_wav, tmp_path):
        out = tmp_path / "f.jsonl"
        r = run(["scripts/rt.py", "--input", str(speech_wav),
                 "--output", "file", "--output-file", str(out),
                 "--no-realtime", "--max-frames", "5", "--cpu",
                 "--emotion-backend", "basic",
                 "--d-model", "32", "--num-heads", "2"])
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 5
        assert rows[0]["timestamp"] > 1e9  # wall-clock epoch seconds

    def test_infer(self, speech_wav, tmp_path):
        out = tmp_path / "seq.jsonl"
        r = run(["scripts/infer.py", "--input", str(speech_wav),
                 "--output", str(out), "--cpu", "--d-model", "32",
                 "--num-heads", "2", "--emotion-backend", "basic",
                 "--stride-frames", "8"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists() and out.read_text().strip()

    def test_train_then_eval(self, tmp_path):
        work = tmp_path / "run"
        r = run(["-m", "koemorph_tpu.train",
                 "--config", "configs/config.yaml", "--synthetic", "2",
                 "--max-epochs", "1", "--steps-per-epoch", "1", "--cpu",
                 "--work-dir", str(work), "data.batch_size=2",
                 "model.d_model=32", "model.num_heads=4"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert (work / "checkpoints" / "last").exists()
        r2 = run(["scripts/test_model.py", "--data-dir",
                  str(work / "synth_data"), "--model-name", "simplified",
                  "--cpu", "--d-model", "32", "--num-heads", "4",
                  "--batch-size", "2", "--max-batches", "1",
                  "--model", str(work / "checkpoints" / "last")])
        assert r2.returncode == 0, r2.stderr[-2000:]
        metrics = json.loads(r2.stdout.strip().splitlines()[-1])
        assert "mae" in metrics

    def test_train_scan_epochs(self, tmp_path):
        """--scan-epochs runs the device-resident lax.scan epoch path
        through the CLI (trajectory equality vs the step loop is pinned
        in tests/train/test_trainer.py)."""
        work = tmp_path / "run_scan"
        r = run(["-m", "koemorph_tpu.train",
                 "--config", "configs/config.yaml", "--synthetic", "2",
                 "--max-epochs", "1", "--steps-per-epoch", "1", "--cpu",
                 "--scan-epochs",
                 "--work-dir", str(work), "data.batch_size=2",
                 "model.d_model=32", "model.num_heads=4"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert (work / "checkpoints" / "last").exists()
        metrics = json.loads(r.stdout.strip().splitlines()[-1])
        assert "loss" in metrics["final_train_metrics"]

    def test_reproduce_results_smoke(self, tmp_path):
        """The pre-staged real-corpus reproduction recipe
        (scripts/reproduce_results.py) must run its full train -> val ->
        early-stop -> report pipeline on synthetic data, so the one
        command that consumes a corpus the moment one appears stays
        green. Smoke mode checks the pipeline, not accuracy."""
        r = run(["scripts/reproduce_results.py", "--smoke", "--cpu",
                 "--work-dir", str(tmp_path / "repro")], timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["mode"] == "smoke"
        assert np.isfinite(summary["mae"])
        report = REPO / summary["report"]
        assert report.exists()
        text = report.read_text()
        assert "NOT corpus results" in text
        assert "0.028" in text          # the reference target is cited

    def test_integration_check(self, tmp_path):
        r = run(["scripts/integration_check.py", "--cpu",
                 "--seconds", "2"], timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        report = json.loads(r.stdout)
        assert report["ok"]
