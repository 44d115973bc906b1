"""Dataset / collate / sequential windowing tests (mirrors reference
tests/data/test_dataset.py padding+mask invariants, plus stride schedules)."""

import numpy as np
import pytest

from koemorph_tpu.data.dataset import (
    KoeMorphDataModule,
    KoeMorphDataset,
    Prefetcher,
    collate_fn,
)
from koemorph_tpu.data.sequential import (
    AdaptiveSequentialDataset,
    SequentialKoeMorphDataset,
    StrideSchedule,
    create_sequential_dataloader,
    sequential_collate,
)
from tests.data.test_io import make_pair


@pytest.fixture()
def data_dir(tmp_path):
    for i, dur in enumerate([10.0, 12.0, 11.0]):
        make_pair(tmp_path, name=f"clip_{i}", duration=dur)
    return tmp_path


class TestKoeMorphDataset:
    def test_len_and_getitem(self, data_dir):
        ds = KoeMorphDataset(data_dir)
        assert len(ds) == 3
        s = ds[0]
        assert s["wav"].ndim == 1 and s["arkit"].shape[1] == 52

    def test_max_samples_cap(self, data_dir):
        assert len(KoeMorphDataset(data_dir, max_samples=2)) == 2

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(ValueError, match="No valid data"):
            KoeMorphDataset(tmp_path / "empty_does_not_exist")

    def test_dummy_sample_on_corrupt_file(self, data_dir):
        # corrupt one jsonl after discovery
        ds = KoeMorphDataset(data_dir)
        bad = ds.file_pairs[1][0]
        bad.write_text('{"timestamp": 0.0, "blendshapes": [0.1, 0.2]}\n')
        with pytest.warns(UserWarning, match="dummy"):
            s = ds[1]
        assert s["arkit"].shape == (30, 52)  # dummy fallback shapes


class TestCollate:
    def test_padding_and_masks(self, data_dir):
        ds = KoeMorphDataset(data_dir)
        batch = collate_fn([ds[i] for i in range(3)])
        b, l = batch["audio"].shape
        assert b == 3
        assert batch["arkit"].shape[:2] == batch["arkit_mask"].shape
        # longest clip (12 s) defines L; its mask is all-true
        lengths = [len(ds[i]["wav"]) for i in range(3)]
        assert l == max(lengths)
        for i in range(3):
            assert batch["audio_mask"][i].sum() == lengths[i]
            # padded region is zeros
            assert np.all(batch["audio"][i, lengths[i]:] == 0)

    def test_empty_batch_raises(self):
        with pytest.raises(ValueError):
            collate_fn([])


class TestPrefetcher:
    def test_batches_and_epochs(self, data_dir):
        ds = KoeMorphDataset(data_dir)
        pf = Prefetcher(ds, batch_size=2, shuffle=True, drop_last=True)
        batches = list(pf)
        assert len(batches) == 1  # 3 samples, bs 2, drop_last
        assert batches[0]["audio"].shape[0] == 2

    def test_no_drop_last(self, data_dir):
        ds = KoeMorphDataset(data_dir)
        pf = Prefetcher(ds, batch_size=2, drop_last=False)
        batches = list(pf)
        assert sum(b["audio"].shape[0] for b in batches) == 3


class TestDataModule:
    def test_wiring(self, data_dir):
        dm = KoeMorphDataModule(train_data_dir=data_dir,
                                val_data_dir=data_dir, batch_size=2)
        dm.setup()
        assert dm.train_dataloader() is not None
        assert dm.val_dataloader() is not None
        assert dm.test_dataloader() is None


class TestSequentialDataset:
    def test_window_math(self, data_dir):
        ds = SequentialKoeMorphDataset(data_dir, window_frames=64,
                                       stride_frames=16, shuffle_files=False)
        starts = ds.windows_for_file(0)
        # 10 s * 30 fps ~= 300 frames; audio clamp may trim 1
        _, bs = ds._load_file(0)
        expected = (len(bs) - 64) // 16 + 1
        assert len(starts) == expected
        assert starts[1] - starts[0] == 16

    def test_window_shapes_fixed(self, data_dir):
        ds = SequentialKoeMorphDataset(data_dir, window_frames=64,
                                       stride_frames=16, shuffle_files=False)
        w = ds.get_window(0, 0)
        assert w["audio"].shape == (64 * 533,)
        assert w["blendshapes"].shape == (64, 52)

    def test_temporal_order_within_file(self, data_dir):
        ds = SequentialKoeMorphDataset(data_dir, window_frames=64,
                                       stride_frames=32, shuffle_files=False,
                                       max_files=1)
        frames = [w["start_frame"] for w in ds]
        assert frames == sorted(frames)

    def test_audio_blendshape_alignment(self, data_dir):
        """Window audio and blendshapes cover the same time span."""
        ds = SequentialKoeMorphDataset(data_dir, window_frames=64,
                                       stride_frames=64, shuffle_files=False)
        w = ds.get_window(0, 64)
        assert w["start_frame"] == 64
        audio, bs = ds._load_file(0)
        np.testing.assert_allclose(
            w["audio"], audio[64 * 533 : 128 * 533])
        np.testing.assert_allclose(w["blendshapes"], bs[64:128])

    def test_collate(self, data_dir):
        ds = SequentialKoeMorphDataset(data_dir, window_frames=32,
                                       stride_frames=32, shuffle_files=False)
        batch = sequential_collate([ds.get_window(0, 0),
                                    ds.get_window(0, 32)])
        assert batch["audio"].shape == (2, 32 * 533)
        assert batch["blendshapes"].shape == (2, 32, 52)
        assert list(batch["file_indices"]) == [0, 0]

    def test_dataloader_factory(self, data_dir):
        iterate, ds = create_sequential_dataloader(
            data_dir, batch_size=4, window_frames=32, stride_frames=64,
            shuffle_files=False)
        batch = next(iterate())
        assert batch["audio"].shape[0] == 4


class TestStrideSchedule:
    def test_dense(self):
        s = StrideSchedule(mode="dense")
        assert s.stride_for(0, 0, 10) == 1

    def test_sparse(self):
        s = StrideSchedule(mode="sparse", sparse_stride=8)
        assert s.stride_for(5, 0, 10) == 8

    def test_progressive_decays_to_one(self):
        s = StrideSchedule(mode="progressive", sparse_stride=16,
                           progressive_epochs=5)
        strides = [s.stride_for(e, 0, 10) for e in range(6)]
        assert strides[0] == 16
        assert strides[4] == 1 and strides[5] == 1
        assert all(a >= b for a, b in zip(strides, strides[1:]))

    def test_mixed_ratio(self):
        s = StrideSchedule(mode="mixed", sparse_stride=8, dense_ratio=0.5,
                           seed=1)
        strides = [s.stride_for(0, i, 100) for i in range(100)]
        dense_count = sum(1 for x in strides if x == 1)
        assert 30 < dense_count < 70  # ~50%
        # deterministic per epoch
        again = [s.stride_for(0, i, 100) for i in range(100)]
        assert strides == again

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            StrideSchedule(mode="bogus")

    def test_adaptive_dataset_uses_schedule(self, data_dir):
        ds = AdaptiveSequentialDataset(
            data_dir, window_frames=64, shuffle_files=False, max_files=1,
            schedule=StrideSchedule(mode="sparse", sparse_stride=32))
        frames = [w["start_frame"] for w in ds]
        assert frames[1] - frames[0] == 32


class TestSequentialBatchSampler:
    def test_batches_never_mix_files(self, tmp_path):
        from koemorph_tpu.data.sequential import (
            SequentialBatchSampler, SequentialKoeMorphDataset)
        from koemorph_tpu.train.__main__ import write_synthetic_dataset

        write_synthetic_dataset(tmp_path, 2, duration_s=6.0,
                                speech_correlated=False)
        ds = SequentialKoeMorphDataset(
            str(tmp_path), window_frames=32, stride_frames=16,
            sample_rate=16000, target_fps=30.0)
        sampler = SequentialBatchSampler(ds, batch_size=3, drop_last=False)
        batches = list(sampler)
        assert batches, "no batches yielded"
        for b in batches:
            files = np.unique(np.asarray(b["file_indices"]))
            assert len(files) == 1, "batch mixes files"
        # every window appears exactly once across batches
        total = sum(len(np.asarray(b["file_indices"])) for b in batches)
        assert total == ds.get_num_windows()
