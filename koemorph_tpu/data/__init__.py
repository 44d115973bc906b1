"""Host-side data pipeline: WAV/JSONL I/O, datasets, windowing, batching."""

from koemorph_tpu.data.wav import read_wav, write_wav, resample_linear
from koemorph_tpu.data.io import (
    ARKitDataLoader,
    detect_fps,
    load_blendshapes_with_fps,
    resample_blendshapes,
    validate_data_consistency,
)
from koemorph_tpu.data.dataset import (
    KoeMorphDataModule,
    KoeMorphDataset,
    Prefetcher,
    collate_fn,
)
from koemorph_tpu.data.sequential import (
    AdaptiveSequentialDataset,
    prefetch_iterator,
    SequentialBatchSampler,
    SequentialKoeMorphDataset,
    StrideSchedule,
    create_adaptive_dataloader,
    create_sequential_dataloader,
    sequential_collate,
)

__all__ = [
    "read_wav", "write_wav", "resample_linear",
    "ARKitDataLoader", "detect_fps", "load_blendshapes_with_fps",
    "resample_blendshapes", "validate_data_consistency",
    "KoeMorphDataset", "KoeMorphDataModule", "Prefetcher", "collate_fn",
    "SequentialKoeMorphDataset", "SequentialBatchSampler",
    "AdaptiveSequentialDataset",
    "StrideSchedule", "create_sequential_dataloader",
    "create_adaptive_dataloader", "sequential_collate", "prefetch_iterator",
]
