#!/usr/bin/env python
"""Reproduce the reference's accuracy table on a real corpus, one command.

The reference's headline numbers (MAE 0.028, correlation/stream
specialization — /root/reference/docs/experimental_results.md:21-41) come
from a private mocap corpus this image does not ship. This script is the
pre-staged recipe: the moment a corpus is available, run

    python scripts/reproduce_results.py --data-dir /path/to/train \\
        [--val-dir /path/to/val] [--fps 30|60]

and it trains the production SequentialDualStreamModel with the
REFERENCE's training recipe (configs/training/default.yaml: AdamW lr 1e-4,
weight decay 1e-5, cosine T_max 100 -> eta_min 1e-6, mse 1.0 / l1 0.1 /
perceptual 0.5, grad clip 1.0, 100 epochs, val every 5 epochs, early stop
patience 15), evaluates on the held-out split, and writes
``docs/real_corpus_results.md`` with the measured table next to the
reference's published targets.

Data layout: a directory of ``<name>.wav`` (16 kHz mono) +
``<name>.jsonl`` ARKit frames (the reference's own format,
src/data/io.py:44). ``--val-dir`` names a held-out split; without it the
last ``--val-frac`` of files (sorted) are held out.

``--smoke`` exercises the full pipeline on in-image synthetic data (tiny
model, few epochs) so the recipe itself stays test-covered
(tests/cli/test_scripts.py) — its numbers are NOT corpus results and the
report says so.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np                                      # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

REPORT = REPO / "docs" / "real_corpus_results.md"

# reference targets: docs/experimental_results.md "Information Balance
# Analysis" + "Multi-Frame Rate Comparison"
REFERENCE_TARGETS = {
    30: {"mae": 0.028, "mae_tol": 0.003},
    60: {"mae": 0.030, "mae_tol": 0.003},
}


def split_files(data_dir: Path, val_frac: float) -> tuple[list, list]:
    wavs = sorted(data_dir.glob("*.wav"))
    if len(wavs) < 2:
        raise SystemExit(f"need >=2 wav files in {data_dir}, found "
                         f"{len(wavs)}")
    n_val = max(1, int(round(len(wavs) * val_frac)))
    return wavs[:-n_val], wavs[-n_val:]


def stage_split(files: list, out: Path) -> Path:
    out.mkdir(parents=True, exist_ok=True)
    for wav in files:
        for p in (wav, wav.with_suffix(".jsonl")):
            dst = out / p.name
            if not dst.exists():
                shutil.copy2(p, dst)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--data-dir", help="corpus dir: <name>.wav + "
                                       "<name>.jsonl ARKit pairs")
    ap.add_argument("--val-dir", help="held-out split (default: split "
                                      "--val-frac off --data-dir)")
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--fps", type=int, default=30, choices=(30, 60))
    ap.add_argument("--epochs", type=int, default=100,
                    help="reference max_epochs "
                         "(configs/training/default.yaml)")
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="reference AdamW lr")
    ap.add_argument("--batch-size", type=int, default=16,
                    help="reference data/default.yaml batch size")
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--work-dir", default="outputs/reproduce")
    ap.add_argument("--val-every", type=int, default=5,
                    help="reference check_val_every_n_epoch")
    ap.add_argument("--patience", type=int, default=15,
                    help="reference early-stopping patience (in "
                         "validation rounds)")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic in-image pipeline check (tiny model)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from koemorph_tpu.data.sequential import create_sequential_dataloader
    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel)
    from koemorph_tpu.train.__main__ import write_synthetic_dataset
    from koemorph_tpu.train.trainer import SequentialTrainer

    work = REPO / args.work_dir
    work.mkdir(parents=True, exist_ok=True)

    if args.smoke:
        train_dir = write_synthetic_dataset(
            work / "smoke_train", 3, duration_s=12.0, seed=11,
            fps=float(args.fps), speech_correlated=True)
        val_dir = write_synthetic_dataset(
            work / "smoke_val", 1, duration_s=12.0, seed=99,
            fps=float(args.fps), speech_correlated=True)
        args.d_model = min(args.d_model, 64)
        args.epochs = min(args.epochs, 4)
        args.batch_size = min(args.batch_size, 4)
    elif not args.data_dir:
        ap.error("--data-dir is required (or --smoke)")
    else:
        data_dir = Path(args.data_dir)
        if args.val_dir:
            train_dir, val_dir = data_dir, Path(args.val_dir)
        else:
            train_files, val_files = split_files(data_dir, args.val_frac)
            train_dir = stage_split(train_files, work / "train_split")
            val_dir = stage_split(val_files, work / "val_split")

    window = 512 if args.fps == 60 else 256
    model = SequentialDualStreamModel(
        d_model=args.d_model, num_heads=8, mel_sequence_length=window,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=args.fps, dropout=0.1, stride_frames=4)
    span = model.window_frames + 32

    def loader_of(d, drop_last=True):
        return create_sequential_dataloader(
            str(d), batch_size=args.batch_size, window_frames=span,
            stride_frames=64, sample_rate=16000,
            target_fps=float(args.fps), drop_last=drop_last)

    loader_fn, dataset = loader_of(train_dir)
    # validation keeps partial batches (a small held-out split can have
    # fewer windows than one batch; _prepare pads + masks them)
    val_loader_fn, _val_dataset = loader_of(val_dir, drop_last=False)
    steps = max(1, dataset.get_num_windows() // args.batch_size)

    # the REFERENCE recipe, configs/training/default.yaml
    tcfg = {
        "training": {
            "optimizer": {"name": "adamw", "lr": args.lr,
                          "weight_decay": 1e-5},
            "lr_scheduler": {"name": "cosine", "t_max": args.epochs,
                             "eta_min": 1e-6},
            "loss": {"mse_weight": 1.0, "l1_weight": 0.1,
                     "perceptual_weight": 0.5},
            "gradient_clip_val": 1.0,
            "max_epochs": args.epochs,
            "logging": {"log_every_n_steps": 50,
                        "log_images_every_n_steps": 0},
        },
        "data": {"window_frames": span},
    }
    trainer = SequentialTrainer(model, tcfg, work_dir=work,
                                steps_per_epoch=steps, span_frames=span)

    t0 = time.time()
    history, val_history = [], []
    best = (float("inf"), -1, {})
    bad_rounds = 0
    done_epochs = 0
    round_epochs = max(1, args.val_every)
    chunk = 0
    while done_epochs < args.epochs:
        n_ep = min(round_epochs, args.epochs - done_epochs)
        dataset.set_epoch(chunk)
        history += trainer.train_epochs_scan(loader_fn(), n_epochs=n_ep,
                                             shuffle_seed=1000 + chunk)
        chunk += 1
        done_epochs += n_ep
        val = trainer.validate(val_loader_fn())
        val["epoch"] = done_epochs
        val_history.append(val)
        vloss = float(val.get("loss", val.get("mae", np.inf)))
        if vloss < best[0] - 1e-6:
            best = (vloss, done_epochs, val)
            trainer.checkpoints.save(
                trainer.state.params, epoch=done_epochs,
                global_step=trainer.global_step, val_loss=vloss,
                opt_state=trainer.state.opt_state)
            bad_rounds = 0
        else:
            bad_rounds += 1
            if bad_rounds >= args.patience:
                print(f"early stop at epoch {done_epochs} "
                      f"(best val {best[0]:.5f} @ {best[1]})",
                      file=sys.stderr)
                break
    train_s = time.time() - t0

    # report the BEST checkpoint's metrics (the saved artifact), not the
    # last validation round's: with early stopping the last round is by
    # construction past the optimum, and the verdict/exit code must
    # describe the model a user would actually load
    final_val = best[2] if best[1] >= 0 else (
        val_history[-1] if val_history else {})
    tgt = REFERENCE_TARGETS[args.fps]
    mae = float(final_val.get("mae", final_val.get("l1", float("nan"))))
    rows = [
        ("MAE", f"{mae:.4f}",
         f"{tgt['mae']:.3f} ± {tgt['mae_tol']:.3f}"),
        ("RMSE", f"{float(final_val.get('rmse', float('nan'))):.4f}", "—"),
        ("correlation",
         f"{float(final_val.get('correlation', float('nan'))):.3f}", "—"),
        ("F1 @0.1",
         f"{float(final_val.get('f1_score', float('nan'))):.3f}", "—"),
        ("precision @0.1",
         f"{float(final_val.get('precision', float('nan'))):.3f}", "—"),
        ("recall @0.1",
         f"{float(final_val.get('recall', float('nan'))):.3f}", "—"),
    ]
    mode = ("SMOKE (synthetic in-image data — NOT corpus results)"
            if args.smoke else "real corpus")
    lines = [
        "# Real-corpus reproduction",
        "",
        f"Mode: **{mode}** — `scripts/reproduce_results.py`, "
        f"{args.fps} fps, d={args.d_model}, window {window}, "
        f"{done_epochs}/{args.epochs} epochs "
        f"(early stop patience {args.patience} x {args.val_every} "
        f"epochs), batch {args.batch_size}, lr {args.lr:g}, "
        f"{train_s:.0f} s wall; table = best checkpoint "
        f"(epoch {best[1]}).",
        "",
        "Training recipe = the reference's "
        "configs/training/default.yaml (AdamW 1e-4 / wd 1e-5, cosine "
        "T_max 100 -> 1e-6, mse 1.0 / l1 0.1 / perceptual 0.5, clip "
        "1.0); targets = docs/experimental_results.md:21-41.",
        "",
        "| metric | measured | reference target |",
        "|---|---|---|",
        *(f"| {k} | {v} | {t} |" for k, v, t in rows),
        "",
        f"Best val loss {best[0]:.5f} at epoch {best[1]}; "
        f"checkpoint under `{args.work_dir}/checkpoints`.",
        "",
    ]
    if val_history:
        lines += ["| epoch | val loss | val MAE |", "|---|---|---|"]
        for v in val_history:
            lines.append(
                f"| {v['epoch']} | {float(v.get('loss', np.nan)):.5f} "
                f"| {float(v.get('l1', np.nan)):.5f} |")
        lines.append("")
    # smoke numbers must never land in committed docs (the round-3
    # training report was overwritten by exactly this mistake)
    report_path = (work / "real_corpus_results_smoke.md" if args.smoke
                   else REPORT)
    report_path.parent.mkdir(parents=True, exist_ok=True)
    report_path.write_text("\n".join(lines))

    summary = {
        "mode": "smoke" if args.smoke else "corpus",
        "fps": args.fps,
        "epochs_run": done_epochs,
        "mae": mae,
        "target_mae": tgt["mae"],
        "within_target": bool(mae <= tgt["mae"] + tgt["mae_tol"]),
        "best_val_loss": best[0],
        "train_seconds": round(train_s, 1),
        "report": (str(report_path.relative_to(REPO))
                   if report_path.is_relative_to(REPO)
                   else str(report_path)),
    }
    print(json.dumps(summary))
    # smoke mode checks the PIPELINE, not accuracy
    if args.smoke:
        return 0 if np.isfinite(mae) else 1
    return 0 if summary["within_target"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
