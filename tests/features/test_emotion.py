"""Tests for the emotion feature chain (fallback levels, heuristic maps,
basic features, emotion2vec backbone + cache)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.blendshapes import ARKIT_BLENDSHAPES
from koemorph_tpu.features.basic import BASIC_DIM, basic_emotion_features
from koemorph_tpu.features.emotion import (
    CONCAT_DIM,
    EmotionExtractor,
    EmotionFrontendConfig,
    basic_emotion_heuristic,
    egemaps_to_emotion,
    emotion_features,
    emotion_to_blendshapes,
    create_emotion_extractor,
)
from koemorph_tpu.features.emotion2vec import (
    ConvEmotionEncoder,
    Emotion2VecCache,
    pool_to_fps,
)

SR = 16000


def sine(freq=220.0, secs=1.0, amp=0.5):
    t = np.arange(int(secs * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFrontendConfig:
    def test_dims(self):
        assert EmotionFrontendConfig(backend="egemaps").feature_dim == 264
        assert EmotionFrontendConfig(
            backend="egemaps", use_concatenation=False).feature_dim == 88
        assert EmotionFrontendConfig(backend="basic").feature_dim == BASIC_DIM
        assert EmotionFrontendConfig(
            backend="emotion2vec").feature_dim == 1024

    def test_unknown_backend(self):
        with pytest.raises(ValueError):
            EmotionFrontendConfig(backend="bogus").feature_dim


class TestDeviceFeatures:
    def test_egemaps_concat_shape(self):
        cfg = EmotionFrontendConfig(backend="egemaps")
        out = emotion_features(jnp.asarray(sine(secs=2.0)), cfg)
        assert out.shape == (CONCAT_DIM,)
        assert np.isfinite(np.asarray(out)).all()

    def test_basic_shape(self):
        cfg = EmotionFrontendConfig(backend="basic")
        out = emotion_features(jnp.asarray(sine()), cfg)
        assert out.shape == (BASIC_DIM,)

    def test_basic_f0_and_energy(self):
        out = np.asarray(basic_emotion_features(jnp.asarray(sine(220.0))))
        assert abs(out[3] - 220.0) < 10.0  # f0_mean
        assert out[0] > 0  # energy

    def test_emotion2vec_denied_here(self):
        with pytest.raises(ValueError, match="through"):
            emotion_features(jnp.zeros(SR),
                             EmotionFrontendConfig(backend="emotion2vec"))


class TestHeuristics:
    def test_emotion_to_blendshapes_angry(self):
        w = emotion_to_blendshapes({"angry": 1.0})
        assert w[ARKIT_BLENDSHAPES.index("browDownLeft")] == pytest.approx(0.8)
        assert w[ARKIT_BLENDSHAPES.index("jawOpen")] == 0.0

    def test_neutral_maps_to_zero(self):
        assert emotion_to_blendshapes({"neutral": 1.0}).sum() == 0.0

    def test_egemaps_to_emotion_returns_distribution(self):
        preds = egemaps_to_emotion(np.zeros(88, np.float32))
        assert sum(preds.values()) > 0
        assert all(0 <= v <= 1 for v in preds.values())

    def test_basic_heuristic_branches(self):
        assert "angry" in basic_emotion_heuristic(0.2, 0.1, 150, 60)
        assert "sad" in basic_emotion_heuristic(0.001, 0.1, 150, 10)


class TestExtractorChain:
    def test_no_e2v_params_demotes_to_egemaps(self):
        ex = EmotionExtractor(backend="emotion2vec")
        assert ex.fallback_level == 1
        assert ex._get_backend_name() == "opensmile"
        assert ex.feature_dim == CONCAT_DIM

    def test_basic_backend(self):
        ex = EmotionExtractor(backend="basic")
        assert ex.fallback_level == 2
        res = ex.extract_features(sine(secs=0.5))
        assert res["embeddings"].shape == (1, BASIC_DIM)
        assert res["blendshape_weights"].shape == (1, 52)
        assert res["metadata"]["backend_used"] == "basic"

    def test_egemaps_extract(self):
        ex = EmotionExtractor(backend="opensmile")
        res = ex.extract_features(np.stack([sine(), sine(110.0)]))
        assert res["embeddings"].shape == (2, CONCAT_DIM)
        assert len(res["predictions"]) == 2

    def test_caching(self, tmp_path):
        ex = EmotionExtractor(backend="basic", cache_dir=tmp_path)
        x = sine(secs=0.5)
        ex.extract_features(x)
        before = ex.extraction_stats["cache_hits"]
        ex.extract_features(x)
        assert ex.extraction_stats["cache_hits"] == before + 1

    def test_factory(self):
        ex = create_emotion_extractor({"backend": "basic"})
        assert ex.fallback_level == 2

    def test_statistics(self):
        ex = EmotionExtractor(backend="basic")
        ex.extract_features(sine(secs=0.25))
        stats = ex.get_statistics()
        assert stats["total_calls"] == 1
        ex.reset_statistics()
        assert ex.get_statistics()["total_calls"] == 0

    def test_double_demotion_mid_batch_stays_homogeneous(self, monkeypatch):
        """Two demotions across the batch re-runs (0->1 on the first pass,
        1->2 during the retry) must still yield a homogeneous embedding
        stack — the single-retry version crashed in np.stack here."""
        import koemorph_tpu.features.emotion as emo_mod

        ex = EmotionExtractor(backend="basic", enable_caching=False)

        class FlakyE2V:
            calls = 0

            def apply(self, params, x):
                FlakyE2V.calls += 1
                if FlakyE2V.calls >= 2:
                    raise RuntimeError("e2v backend lost")
                return jnp.zeros((1, 4, 1024))

        ex._e2v_module = FlakyE2V()
        ex._e2v_params = {}
        ex.fallback_level = 0

        real_emotion_features = emo_mod.emotion_features
        state = {"egemaps_calls": 0}

        def flaky_egemaps(audio, cfg):
            state["egemaps_calls"] += 1
            if state["egemaps_calls"] >= 2:
                raise RuntimeError("egemaps backend lost")
            return real_emotion_features(audio, cfg)

        monkeypatch.setattr(emo_mod, "emotion_features", flaky_egemaps)

        res = ex.extract_features(np.stack([sine(secs=0.5),
                                            sine(110.0, secs=0.5)]))
        assert ex.fallback_level == 2
        assert res["embeddings"].shape == (2, BASIC_DIM)
        assert res["metadata"]["backend_used"] == "basic"


class TestEmotion2Vec:
    def test_encoder_shapes(self):
        mod = ConvEmotionEncoder()
        audio = jnp.zeros((2, SR))
        params = mod.init(jax.random.key(0), audio)
        out = mod.apply(params, audio)
        assert out.shape[0] == 2 and out.shape[2] == 1024
        assert 40 <= out.shape[1] <= 60  # ~50 Hz frame rate

    def test_pool_to_fps(self):
        feats = jnp.ones((1, 50, 8))
        out = pool_to_fps(feats, SR, SR, 30.0, method="linear")
        assert out.shape == (1, 30, 8)
        out2 = pool_to_fps(feats, SR, SR, 30.0, method="adaptive")
        assert out2.shape == (1, 30, 8)

    def test_cache_lru_eviction(self):
        cache = Emotion2VecCache(max_size=2)
        a, b, c = (np.full(10, i, np.float32) for i in range(3))
        cache.put(a, np.zeros(4))
        cache.put(b, np.ones(4))
        assert cache.get(a) is not None   # refreshes a
        cache.put(c, np.ones(4))          # evicts b (LRU)
        assert cache.get(b) is None
        assert cache.get(a) is not None
        assert cache.stats()["size"] == 2
