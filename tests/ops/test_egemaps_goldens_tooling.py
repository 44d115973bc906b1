"""Exercises scripts/egemaps_goldens.py's report + calibration machinery
without OpenSMILE: synthetic goldens (our features, affine-distorted +
noise) stand in for recorded OpenSMILE outputs, so the comparison report,
per-feature matching, and calibration fitting are tested end to end. The
`generate` subcommand itself can only run on an opensmile-capable
machine (its ImportError path is asserted here)."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REPO = Path(__file__).resolve().parents[2]


def load_tool(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "egemaps_goldens", REPO / "scripts" / "egemaps_goldens.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "GOLDEN_DIR", tmp_path / "goldens")
    monkeypatch.setattr(mod, "REPORT_PATH", tmp_path / "report.md")
    monkeypatch.setattr(mod, "CALIB_PATH", tmp_path / "calib.json")
    return mod


def make_goldens(mod, n_clips=4):
    """Synthetic goldens = our features, scaled 2x + offset + noise, under
    OpenSMILE's own feature names."""
    from koemorph_tpu.ops.egemaps import (
        FEATURE_NAMES, egemaps_functionals)

    mod.GOLDEN_DIR.mkdir(parents=True)
    rng = np.random.default_rng(0)
    clips = dict(list(mod.synthetic_corpus().items())[:n_clips])
    for name, audio in clips.items():
        ours = np.asarray(egemaps_functionals(jnp.asarray(audio)))
        golden = 2.0 * ours + 1.0 + 0.01 * rng.standard_normal(88)
        np.savez_compressed(
            mod.GOLDEN_DIR / f"{name}.npz",
            audio=audio, sample_rate=16000,
            values=golden.astype(np.float32),
            names=np.asarray(list(FEATURE_NAMES), dtype=object))


class TestReport:
    def test_report_and_calibration(self, monkeypatch, tmp_path):
        mod = load_tool(monkeypatch, tmp_path)
        make_goldens(mod)

        class Args:
            fit_calibration = True

        assert mod.cmd_report(Args()) == 0
        report = mod.REPORT_PATH.read_text()
        assert "| feature |" in report
        assert "F0semitoneFrom27.5Hz_sma3nz_amean" in report

        calib = json.loads(mod.CALIB_PATH.read_text())
        # the affine distortion (2x + 1) must be recovered for features
        # with nonzero variance across the corpus
        a, b = calib["F0semitoneFrom27.5Hz_sma3nz_amean"]
        assert abs(a - 2.0) < 0.05, (a, b)
        assert abs(b - 1.0) < 1.0, (a, b)

        # and apply_calibration inverts the distortion
        from koemorph_tpu.ops.egemaps import (
            FEATURE_NAMES, apply_calibration, egemaps_functionals,
            load_calibration)

        table = load_calibration(str(mod.CALIB_PATH))
        audio = list(mod.synthetic_corpus().values())[0]
        ours = np.asarray(egemaps_functionals(jnp.asarray(audio)))
        cal = np.asarray(apply_calibration(jnp.asarray(ours), table))
        i = FEATURE_NAMES.index("F0semitoneFrom27.5Hz_sma3nz_amean")
        assert abs(cal[i] - (2.0 * ours[i] + 1.0)) < 0.2

    def test_report_without_goldens_errors(self, monkeypatch, tmp_path):
        mod = load_tool(monkeypatch, tmp_path)

        class Args:
            fit_calibration = False

        assert mod.cmd_report(Args()) == 2

    def test_generate_requires_opensmile(self, monkeypatch, tmp_path):
        mod = load_tool(monkeypatch, tmp_path)
        monkeypatch.setitem(sys.modules, "opensmile", None)

        class Args:
            wav_dir = None

        # sys.modules entry None -> `import opensmile` raises ImportError
        assert mod.cmd_generate(Args()) == 2


class TestRecordedGoldensEscapeHatch:
    """Meta-test of tests/ops/test_egemaps_recorded_goldens.py: with
    synthetic goldens present the gates must activate and pass, so that
    committing real OpenSMILE .npz files needs zero code changes."""

    def test_gates_activate_and_pass(self, monkeypatch, tmp_path):
        mod = load_tool(monkeypatch, tmp_path)
        make_goldens(mod, n_clips=5)

        import importlib.util as _ilu
        spec = _ilu.spec_from_file_location(
            "recorded_goldens",
            REPO / "tests" / "ops" / "test_egemaps_recorded_goldens.py")
        rg = _ilu.module_from_spec(spec)
        spec.loader.exec_module(rg)
        monkeypatch.setattr(rg, "GOLDEN_DIR", mod.GOLDEN_DIR)
        monkeypatch.setattr(rg, "GOLDENS",
                            sorted(mod.GOLDEN_DIR.glob("*.npz")))
        assert len(rg.GOLDENS) == 5

        pairs = rg._load_pairs()
        t = rg.TestRecordedGoldens()
        t.test_all_matched_features_finite(pairs)
        # synthetic goldens are an affine map of our features -> every
        # non-degenerate feature correlates perfectly and calibration
        # recovers the map
        t.test_analytic_groups_correlate(pairs)
        t.test_calibration_reduces_mae(pairs)
