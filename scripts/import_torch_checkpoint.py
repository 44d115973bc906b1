#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint (.pth) into an orbax checkpoint.

Migration path for users of the reference repo: their trained
SimplifiedDualStreamModel / SequentialDualStreamModel checkpoints
(train.py:300-328 format, or a raw state_dict) become directly usable by
scripts/rt.py, scripts/infer.py, scripts/export_model.py and
`python -m koemorph_tpu.train --resume`.

Usage:
    python scripts/import_torch_checkpoint.py best_model.pth \
        --output checkpoints/imported --d-model 256
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("pth", help="reference .pth checkpoint")
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--mel-sequence-length", type=int, default=256)
    p.add_argument("--fps", type=int, default=30, choices=[30, 60])
    p.add_argument("--emotion-backend", default="egemaps",
                   choices=["egemaps", "basic"])
    p.add_argument("--fixed-fusion", action="store_true",
                   help="the checkpoint was trained with fixed (hard "
                        "mouth/expression) stream fusion instead of "
                        "learnable weights")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")   # conversion is host work

    from koemorph_tpu.models.dual_stream_model import (
        SimplifiedDualStreamModel)
    from koemorph_tpu.utils.torch_import import import_torch_checkpoint

    model = SimplifiedDualStreamModel(
        d_model=args.d_model, num_heads=args.num_heads,
        mel_sequence_length=args.mel_sequence_length,
        emotion_backend=args.emotion_backend, use_concatenation=True,
        target_fps=args.fps, dropout=0.0,
        use_learnable_weights=not args.fixed_fusion)
    out = import_torch_checkpoint(args.pth, model, args.output)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
