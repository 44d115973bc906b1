"""Map-style dataset, padding collate, and datamodule.

Parity target: reference src/data/dataset.py (KoeMorphDataset / collate_fn /
KoeMorphDataModule): pair discovery by basename, length cap, dummy-sample
error recovery, variable-length padding with boolean masks, train/val/test
wiring. Torch's DataLoader is replaced by a thread-prefetched numpy batcher
(:class:`Prefetcher`) feeding ``jax.device_put`` — the host side of the
TPU input pipeline.
"""

from __future__ import annotations

import logging
import queue
import threading
import warnings
from pathlib import Path
from typing import Iterator, Optional, Union

import numpy as np

from koemorph_tpu.data.io import ARKitDataLoader

logger = logging.getLogger(__name__)
PathLike = Union[str, Path]


class KoeMorphDataset:
    """Per-file samples of paired WAV + JSONL blendshapes."""

    def __init__(
        self,
        data_dir: PathLike,
        sample_rate: int = 16000,
        target_fps: float = 30.0,
        max_time_drift: float = 1.0,
        max_samples: Optional[int] = None,
    ):
        self.data_dir = Path(data_dir)
        self.loader = ARKitDataLoader(sample_rate, target_fps, max_time_drift)
        self.sample_rate = sample_rate
        self.target_fps = target_fps
        self.file_pairs = self._find_pairs()
        if max_samples is not None:
            self.file_pairs = self.file_pairs[:max_samples]
        if not self.file_pairs:
            raise ValueError(f"No valid data pairs found in {self.data_dir}")

    def _find_pairs(self) -> list[tuple[Path, Path]]:
        # pair discovery by basename: *.jsonl <-> *.wav
        # (reference src/data/dataset.py:59-77)
        pairs = []
        for jsonl_path in sorted(self.data_dir.glob("**/*.jsonl")):
            wav_path = jsonl_path.with_suffix(".wav")
            if wav_path.exists():
                pairs.append((jsonl_path, wav_path))
        return pairs

    def __len__(self) -> int:
        return len(self.file_pairs)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        jsonl_path, wav_path = self.file_pairs[idx]
        try:
            return self.loader.load_sample(jsonl_path, wav_path)
        except (ValueError, FileNotFoundError) as e:
            # dummy-sample error recovery (reference dataset.py:114-122)
            warnings.warn(f"Failed to load sample {idx} ({jsonl_path}): {e}; "
                          "substituting dummy sample")
            return {
                "wav": np.zeros(self.sample_rate, dtype=np.float32),
                "arkit": np.zeros((int(self.target_fps), 52),
                                  dtype=np.float32),
            }

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]


def collate_fn(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    """Pad variable-length samples and build boolean validity masks
    (reference src/data/dataset.py:135-178).

    Returns keys: ``audio (B, L_max)``, ``audio_mask (B, L_max)``,
    ``arkit (B, T_max, 52)``, ``arkit_mask (B, T_max)``.
    """
    if not samples:
        raise ValueError("Empty batch")
    b = len(samples)
    l_max = max(len(s["wav"]) for s in samples)
    t_max = max(len(s["arkit"]) for s in samples)

    audio = np.zeros((b, l_max), dtype=np.float32)
    audio_mask = np.zeros((b, l_max), dtype=bool)
    arkit = np.zeros((b, t_max, 52), dtype=np.float32)
    arkit_mask = np.zeros((b, t_max), dtype=bool)
    for i, s in enumerate(samples):
        nl, nt = len(s["wav"]), len(s["arkit"])
        audio[i, :nl] = s["wav"]
        audio_mask[i, :nl] = True
        arkit[i, :nt] = s["arkit"]
        arkit_mask[i, :nt] = True
    return {"audio": audio, "audio_mask": audio_mask,
            "arkit": arkit, "arkit_mask": arkit_mask}


def pad_to_multiple(batch: dict[str, np.ndarray],
                    audio_multiple: int = 533) -> dict[str, np.ndarray]:
    """Pad the audio axis to a multiple (static-shape bucketing helper so XLA
    recompiles are bounded)."""
    audio = batch["audio"]
    l = audio.shape[1]
    target = ((l + audio_multiple - 1) // audio_multiple) * audio_multiple
    if target != l:
        pad = target - l
        batch = dict(batch)
        batch["audio"] = np.pad(audio, ((0, 0), (0, pad)))
        batch["audio_mask"] = np.pad(batch["audio_mask"], ((0, 0), (0, pad)))
    return batch


class Prefetcher:
    """Background-thread batch producer (replaces torch DataLoader workers).

    Iterates index batches over a dataset, collates on the host thread pool,
    and keeps ``prefetch`` ready batches in a queue so device steps never
    wait on WAV decode.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 collate=collate_fn):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.collate = collate
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def produce():
            for idxs in batches:
                yield self.collate([self.dataset[int(i)] for i in idxs])

        # shared background producer: propagates worker exceptions to the
        # consumer instead of silently ending the epoch
        from koemorph_tpu.data.sequential import prefetch_iterator
        yield from prefetch_iterator(produce, depth=self.prefetch)()


class KoeMorphDataModule:
    """Train/val/test wiring (reference src/data/dataset.py:181-316)."""

    def __init__(
        self,
        train_data_dir: Optional[PathLike] = None,
        val_data_dir: Optional[PathLike] = None,
        test_data_dir: Optional[PathLike] = None,
        batch_size: int = 16,
        sample_rate: int = 16000,
        target_fps: float = 30.0,
        max_time_drift: float = 1.0,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.train_data_dir = train_data_dir
        self.val_data_dir = val_data_dir
        self.test_data_dir = test_data_dir
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.target_fps = target_fps
        self.max_time_drift = max_time_drift
        self.prefetch = prefetch
        self.seed = seed
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self) -> None:
        def make(d):
            return KoeMorphDataset(
                d, self.sample_rate, self.target_fps, self.max_time_drift
            ) if d else None

        self.train_dataset = make(self.train_data_dir)
        self.val_dataset = make(self.val_data_dir)
        self.test_dataset = make(self.test_data_dir)

    def train_dataloader(self) -> Prefetcher:
        assert self.train_dataset is not None, "call setup() first"
        return Prefetcher(self.train_dataset, self.batch_size, shuffle=True,
                          drop_last=True, seed=self.seed,
                          prefetch=self.prefetch)

    def val_dataloader(self) -> Optional[Prefetcher]:
        if self.val_dataset is None:
            return None
        return Prefetcher(self.val_dataset, self.batch_size, shuffle=False,
                          drop_last=False, prefetch=self.prefetch)

    def test_dataloader(self) -> Optional[Prefetcher]:
        if self.test_dataset is None:
            return None
        return Prefetcher(self.test_dataset, self.batch_size, shuffle=False,
                          drop_last=False, prefetch=self.prefetch)
