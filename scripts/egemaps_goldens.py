#!/usr/bin/env python
"""OpenSMILE golden-parity harness for the on-device eGeMAPS extractor.

This image has no network egress and no `opensmile` wheel, so the
harness is split in two:

* ``generate`` — run on any machine where ``pip install opensmile``
  works. Builds the synthetic validation corpus (deterministic; same
  generator as tests/ops/test_egemaps_analytic.py) plus any WAVs you
  pass, extracts eGeMAPSv02 Functionals with OpenSMILE, and writes
  self-contained goldens (audio + names + values) to
  ``tests/goldens/egemaps/*.npz``.
* ``report`` — run anywhere. Loads the goldens, recomputes our 88
  features on the *stored* audio, and writes a per-feature comparison
  (per-clip values, corpus-wide Pearson r, MAE, relative error) to
  ``docs/egemaps_parity_report.md``; ``--fit-calibration`` additionally
  least-squares-fits a per-feature affine map (ours -> OpenSMILE) and
  saves it to ``koemorph_tpu/ops/egemaps_calibration.json`` for
  :func:`koemorph_tpu.ops.egemaps.apply_calibration`.

Reference: /root/reference/src/features/opensmile_extractor.py:227-235
(eGeMAPSv02 Functionals, 88 dims).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np                                      # noqa: E402

GOLDEN_DIR = REPO / "tests" / "goldens" / "egemaps"
REPORT_PATH = REPO / "docs" / "egemaps_parity_report.md"
CALIB_PATH = REPO / "koemorph_tpu" / "ops" / "egemaps_calibration.json"
SR = 16000


def synthetic_corpus() -> dict[str, np.ndarray]:
    """Deterministic clips spanning the feature space: tones, glides,
    AM/FM, noise at several SNRs, gated bursts, vowel-like resonances,
    silence."""
    rng = np.random.default_rng(42)
    t = np.arange(3 * SR) / SR
    clips: dict[str, np.ndarray] = {}
    clips["tone220"] = 0.5 * np.sin(2 * np.pi * 220 * t)
    clips["tone120_soft"] = 0.1 * np.sin(2 * np.pi * 120 * t)
    inst = 100.0 * np.power(4.0, t / 3.0)
    clips["glide100_400"] = 0.4 * np.sin(2 * np.pi * np.cumsum(inst) / SR)
    env = 1.0 + 0.3 * np.sin(2 * np.pi * 4.0 * t)
    clips["am_tone"] = 0.4 * env * np.sin(2 * np.pi * 200 * t)
    fm = 180.0 * (1 + 0.04 * np.sin(2 * np.pi * 47.0 * t))
    clips["fm_tone"] = 0.5 * np.sin(2 * np.pi * np.cumsum(fm) / SR)
    sig = 0.5 * np.sin(2 * np.pi * 200 * t)
    noise = rng.standard_normal(len(t))
    for snr in (5, 10, 20):
        k = np.sqrt((sig ** 2).mean() / (noise ** 2).mean()
                    / 10 ** (snr / 10))
        clips[f"tone_snr{snr}"] = sig + k * noise
    gate = (np.floor(t / 0.5) % 2) == 0
    clips["bursts"] = 0.5 * np.sin(2 * np.pi * 180 * t) * gate
    clips["white"] = 0.2 * rng.standard_normal(len(t))
    clips["silence"] = np.zeros(len(t))
    # vowel-like: pulse train through three resonators
    exc = np.zeros(len(t))
    exc[:: SR // 120] = 1.0
    x = exc
    for fc, bw in ((700, 90), (1200, 110), (2600, 150)):
        r = np.exp(-np.pi * bw / SR)
        a1, a2 = 2 * r * np.cos(2 * np.pi * fc / SR), -r * r
        y = np.zeros_like(x)
        for i in range(2, len(x)):
            y[i] = x[i] + a1 * y[i - 1] + a2 * y[i - 2]
        x = y
    clips["vowel"] = 0.4 * x / np.abs(x).max()
    # speech-like composite
    f0 = 140 + 40 * np.sin(2 * np.pi * 0.5 * t)
    am2 = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
    clips["speechlike"] = (0.35 * am2 * np.sin(
        2 * np.pi * np.cumsum(f0) / SR)
        + 0.05 * rng.standard_normal(len(t)))
    return {k: v.astype(np.float32) for k, v in clips.items()}


def cmd_generate(args) -> int:
    try:
        import opensmile
    except ImportError:
        print("ERROR: `opensmile` is not installed. Run this subcommand "
              "on a machine with `pip install opensmile` (the report "
              "subcommand runs anywhere).", file=sys.stderr)
        return 2

    smile = opensmile.Smile(
        feature_set=opensmile.FeatureSet.eGeMAPSv02,
        feature_level=opensmile.FeatureLevel.Functionals)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)

    clips = synthetic_corpus()
    if args.wav_dir:
        from koemorph_tpu.data.wav import read_wav

        for p in sorted(Path(args.wav_dir).glob("*.wav")):
            audio, sr = read_wav(p)
            if sr != SR:
                print(f"skip {p.name}: sample rate {sr} != {SR}")
                continue
            clips[f"wav_{p.stem}"] = np.asarray(audio, np.float32)

    names = list(smile.feature_names)
    for clip_name, audio in clips.items():
        df = smile.process_signal(audio, SR)
        values = df.to_numpy().reshape(-1).astype(np.float32)
        np.savez_compressed(
            GOLDEN_DIR / f"{clip_name}.npz",
            audio=audio, sample_rate=SR, values=values,
            names=np.asarray(names, dtype=object),
            opensmile_version=getattr(opensmile, "__version__", "?"))
        print(f"golden {clip_name}: {values.shape[0]} features")
    return 0


def _match_names(golden_names: list[str], our_names: list[str]
                 ) -> list[tuple[int, int]]:
    """Index pairs (golden_idx, our_idx) for features present in both
    (names match OpenSMILE's layout; order may differ)."""
    gmap = {n: i for i, n in enumerate(golden_names)}
    return [(gmap[n], j) for j, n in enumerate(our_names) if n in gmap]


def cmd_report(args) -> int:
    import jax.numpy as jnp

    from koemorph_tpu.ops.egemaps import (
        FEATURE_NAMES, egemaps_functionals)

    goldens = sorted(GOLDEN_DIR.glob("*.npz"))
    if not goldens:
        print(f"No goldens under {GOLDEN_DIR}. Run "
              "`egemaps_goldens.py generate` on an opensmile-capable "
              "machine and commit the .npz files.", file=sys.stderr)
        return 2

    rows: dict[str, list[tuple[float, float]]] = {n: [] for n in
                                                  FEATURE_NAMES}
    clip_names = []
    for path in goldens:
        z = np.load(path, allow_pickle=True)
        ours = np.asarray(egemaps_functionals(
            jnp.asarray(z["audio"].astype(np.float32))))
        pairs = _match_names([str(n) for n in z["names"]],
                             list(FEATURE_NAMES))
        for gi, oi in pairs:
            rows[FEATURE_NAMES[oi]].append(
                (float(z["values"][gi]), float(ours[oi])))
        clip_names.append(path.stem)

    lines = [
        "# eGeMAPS per-feature parity report",
        "",
        f"Corpus: {len(clip_names)} clips ({', '.join(clip_names)})",
        "",
        "| feature | pearson r | MAE | mean abs golden | status |",
        "|---|---|---|---|---|",
    ]
    calib = {}
    for name, pairs in rows.items():
        if not pairs:
            lines.append(f"| {name} | — | — | — | no golden |")
            continue
        g = np.asarray([p[0] for p in pairs])
        o = np.asarray([p[1] for p in pairs])
        mae = float(np.abs(g - o).mean())
        scale = float(np.abs(g).mean()) + 1e-9
        if g.std() > 1e-9 and o.std() > 1e-9:
            r = float(np.corrcoef(g, o)[0, 1])
        else:
            r = float("nan")
        status = ("exact" if mae < 1e-3 * scale else
                  "close" if mae < 0.1 * scale or r > 0.95 else
                  "proxy")
        lines.append(f"| {name} | {r:.3f} | {mae:.4g} | {scale:.4g} |"
                     f" {status} |")
        if args.fit_calibration and o.std() > 1e-9:
            a, b = np.polyfit(o, g, 1)
            calib[name] = [float(a), float(b)]

    REPORT_PATH.write_text("\n".join(lines) + "\n")
    print(f"wrote {REPORT_PATH}")
    if args.fit_calibration:
        CALIB_PATH.write_text(json.dumps(calib, indent=1))
        print(f"wrote {CALIB_PATH} ({len(calib)} features)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate", help="record OpenSMILE goldens "
                                        "(needs `pip install opensmile`)")
    g.add_argument("--wav-dir", help="extra 16 kHz WAVs to include")
    g.set_defaults(fn=cmd_generate)
    r = sub.add_parser("report", help="compare our features vs goldens")
    r.add_argument("--fit-calibration", action="store_true")
    r.set_defaults(fn=cmd_report)
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
