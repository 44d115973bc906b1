"""Recorded-OpenSMILE-golden escape hatch (VERDICT r2 item 9).

This image cannot generate OpenSMILE goldens (no egress, no `opensmile`
wheel), so this module is skipped today. The moment `.npz` goldens
recorded by `scripts/egemaps_goldens.py generate` are committed under
tests/goldens/egemaps/, these tests pick them up automatically — zero
code changes — and gate our on-device extractor against the real
OpenSMILE numbers:

* every matched feature finite on both sides,
* per-feature Pearson r across clips (>= 4 clips) for the analytic-tier
  groups the parity doc claims,
* the affine-calibration fit reduces MAE on the features it covers.

Golden file contract (written by the generate subcommand): ``audio``
(float, 16 kHz), ``sample_rate``, ``values`` (88,), ``names`` (88,).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REPO = Path(__file__).resolve().parents[2]
GOLDEN_DIR = REPO / "tests" / "goldens" / "egemaps"
GOLDENS = sorted(GOLDEN_DIR.glob("*.npz"))

pytestmark = pytest.mark.skipif(
    not GOLDENS,
    reason=f"no recorded OpenSMILE goldens under {GOLDEN_DIR} "
           "(see its README.md; tests activate automatically once "
           ".npz files are committed)")

# groups whose correlation with real OpenSMILE must hold for the
# analytic-parity claims in docs/egemaps_parity.md (substring match on
# the eGeMAPS feature names; absolute-scale features only — stddevNorm /
# slope stats are ratio-of-small-numbers and gated by finiteness alone)
CORRELATED_SUBSTRINGS = (
    "F0semitone", "loudness_sma3_amean", "loudness_sma3_percentile",
    "HNRdBACF", "F1frequency", "F2frequency", "F3frequency",
    "alphaRatio", "hammarbergIndex", "equivalentSoundLevel",
)
MIN_PEARSON_R = 0.8


def _load_pairs():
    from koemorph_tpu.ops.egemaps import FEATURE_NAMES, egemaps_functionals

    spec = importlib.util.spec_from_file_location(
        "egemaps_goldens_tool", REPO / "scripts" / "egemaps_goldens.py")
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    per_feature: dict[str, list[tuple[float, float]]] = {
        n: [] for n in FEATURE_NAMES}
    for path in GOLDENS:
        z = np.load(path, allow_pickle=True)
        assert int(z["sample_rate"]) == 16000, path
        ours = np.asarray(egemaps_functionals(
            jnp.asarray(z["audio"].astype(np.float32))))
        for gi, oi in tool._match_names(
                [str(n) for n in z["names"]], list(FEATURE_NAMES)):
            per_feature[FEATURE_NAMES[oi]].append(
                (float(z["values"][gi]), float(ours[oi])))
    return per_feature


@pytest.fixture(scope="module")
def pairs():
    return _load_pairs()


class TestRecordedGoldens:
    def test_all_matched_features_finite(self, pairs):
        bad = [n for n, ps in pairs.items()
               if ps and not np.isfinite(np.asarray(ps)).all()]
        assert not bad, f"non-finite golden/ours values for {bad}"

    def test_analytic_groups_correlate(self, pairs):
        if len(GOLDENS) < 4:
            pytest.skip("need >= 4 golden clips for correlation gates")
        failures = []
        for name, ps in pairs.items():
            if not any(s in name for s in CORRELATED_SUBSTRINGS):
                continue
            if "stddevNorm" in name or "Slope" in name or "slope" in name:
                continue   # ratio-of-small-numbers: finiteness gate only
            g = np.asarray([p[0] for p in ps])
            o = np.asarray([p[1] for p in ps])
            if g.std() < 1e-9 or o.std() < 1e-9:
                continue   # degenerate corpus for this feature
            r = float(np.corrcoef(g, o)[0, 1])
            if r < MIN_PEARSON_R:
                failures.append((name, round(r, 3)))
        assert not failures, (
            f"features below r={MIN_PEARSON_R} vs OpenSMILE: {failures}")

    def test_calibration_reduces_mae(self, pairs):
        if len(GOLDENS) < 4:
            pytest.skip("need >= 4 golden clips to fit calibration")
        improved = total = 0
        for name, ps in pairs.items():
            g = np.asarray([p[0] for p in ps])
            o = np.asarray([p[1] for p in ps])
            if len(ps) < 4 or o.std() < 1e-9:
                continue
            a, b = np.polyfit(o, g, 1)
            total += 1
            if np.abs(a * o + b - g).mean() <= np.abs(o - g).mean() + 1e-12:
                improved += 1
        assert total == 0 or improved / total > 0.9
