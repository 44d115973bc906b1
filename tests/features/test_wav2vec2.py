"""Numerical parity of the Flax Wav2Vec2 encoder vs transformers.

Pins the pretrained-emotion2vec path (reference
src/features/emotion2vec.py:96-122,207-221): if a user drops real
wav2vec2-family weights into a checkpoint dir, our on-device encoder
computes the same hidden states and the same softmax layer fusion as the
torch reference implementation.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from koemorph_tpu.features.wav2vec2 import (  # noqa: E402
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    hf_state_dict_to_params,
    load_hf_checkpoint,
)

HF_KW = dict(
    hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
    intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 3), conv_bias=True, feat_extract_norm="layer",
    do_stable_layer_norm=True, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    cfg = transformers.Wav2Vec2Config(**HF_KW)
    model = transformers.Wav2Vec2Model(cfg)
    model.eval()
    return model


def our_config() -> Wav2Vec2Config:
    return Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)


def audio(b=2, n=3200, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (b, n)).astype(np.float32) * 0.2


class TestTransplantParity:
    def test_last_hidden_state_matches(self, torch_model):
        cfg = our_config()
        params = hf_state_dict_to_params(
            {k: v.numpy() for k, v in torch_model.state_dict().items()},
            cfg)
        x = audio()
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(x)).last_hidden_state.numpy()

        enc = Wav2Vec2Encoder(cfg, use_layer_fusion=False)
        got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_layer_fusion_matches(self, torch_model):
        cfg = our_config()
        params = hf_state_dict_to_params(
            {k: v.numpy() for k, v in torch_model.state_dict().items()},
            cfg)
        n = cfg.num_hidden_layers + 1
        rng = np.random.default_rng(3)
        fusion = rng.standard_normal((n,)).astype(np.float32)
        params["layer_fusion_weights"] = fusion

        x = audio(seed=1)
        with torch.no_grad():
            out = torch_model(torch.from_numpy(x),
                              output_hidden_states=True)
            hs = torch.stack(out.hidden_states, dim=0)
            w = torch.softmax(torch.from_numpy(fusion), dim=0)
            ref = torch.sum(w.view(-1, 1, 1, 1) * hs, dim=0).numpy()

        enc = Wav2Vec2Encoder(cfg, use_layer_fusion=True)
        got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_param_tree_matches_init(self, torch_model):
        """The transplanted tree has exactly the shapes init creates."""
        cfg = our_config()
        params = hf_state_dict_to_params(
            {k: v.numpy() for k, v in torch_model.state_dict().items()},
            cfg)
        params["layer_fusion_weights"] = np.zeros(
            (cfg.num_hidden_layers + 1,), np.float32)
        enc = Wav2Vec2Encoder(cfg, use_layer_fusion=True)
        init = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3200)))["params"]
        want = jax.tree_util.tree_map(np.shape, init)
        got = jax.tree_util.tree_map(np.shape, params)
        assert want == got


class TestCheckpointLoading:
    def test_load_from_local_dir(self, torch_model, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps({
            "hidden_size": 32, "num_hidden_layers": 3,
            "num_attention_heads": 2, "intermediate_size": 64,
            "conv_dim": [16, 16, 16], "conv_stride": [5, 2, 2],
            "conv_kernel": [10, 3, 3], "conv_bias": True,
            "num_conv_pos_embeddings": 16,
            "num_conv_pos_embedding_groups": 4,
        }))
        torch.save(torch_model.state_dict(),
                   tmp_path / "pytorch_model.bin")

        cfg, params = load_hf_checkpoint(tmp_path)
        assert cfg.hidden_size == 32
        x = audio(seed=2)
        with torch.no_grad():
            out = torch_model(torch.from_numpy(x),
                              output_hidden_states=True)
            hs = torch.stack(out.hidden_states, dim=0)
            ref = hs.mean(dim=0).numpy()   # uniform fusion weights

        enc = Wav2Vec2Encoder(cfg, use_layer_fusion=True)
        got = np.asarray(enc.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_missing_checkpoint_raises(self, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps({
            "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "conv_dim": [16], "conv_stride": [5], "conv_kernel": [10],
            "num_conv_pos_embeddings": 16,
            "num_conv_pos_embedding_groups": 4,
        }))
        with pytest.raises(FileNotFoundError):
            load_hf_checkpoint(tmp_path)


class TestEmotionExtractorIntegration:
    def test_pretrained_path_backend(self, torch_model, tmp_path):
        """EmotionExtractor(backend='emotion2vec', pretrained_path=...)
        serves real wav2vec2 features at fallback level 0."""
        (tmp_path / "config.json").write_text(json.dumps({
            "hidden_size": 32, "num_hidden_layers": 3,
            "num_attention_heads": 2, "intermediate_size": 64,
            "conv_dim": [16, 16, 16], "conv_stride": [5, 2, 2],
            "conv_kernel": [10, 3, 3], "conv_bias": True,
            "num_conv_pos_embeddings": 16,
            "num_conv_pos_embedding_groups": 4,
        }))
        torch.save(torch_model.state_dict(),
                   tmp_path / "pytorch_model.bin")

        from koemorph_tpu.features.emotion import EmotionExtractor

        ex = EmotionExtractor(backend="emotion2vec", enable_caching=False,
                              pretrained_path=tmp_path)
        assert ex.fallback_level == 0
        out = ex.extract_features(audio(b=2, seed=4))
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 32)   # hidden_size of the tiny checkpoint
        assert np.isfinite(emb).all() and np.abs(emb).max() > 0

    def test_pretrained_path_missing_demotes(self, tmp_path):
        from koemorph_tpu.features.emotion import EmotionExtractor

        ex = EmotionExtractor(backend="emotion2vec", enable_caching=False,
                              pretrained_path=tmp_path / "nope")
        assert ex.fallback_level == 1   # demoted to eGeMAPS

    def test_precomputed_features_roundtrip(self, tmp_path):
        from koemorph_tpu.features.emotion import (
            EmotionExtractor, PrecomputedEmotionFeatures)

        a = audio(b=1, seed=6)[0]
        feats = np.random.default_rng(7).standard_normal(
            (5, 1024)).astype(np.float32)
        PrecomputedEmotionFeatures.save(tmp_path, a, feats)

        ex = EmotionExtractor(backend="emotion2vec", enable_caching=False,
                              precomputed_dir=tmp_path)
        assert ex.fallback_level == 0
        out = ex.extract_features(a[None])
        emb = np.asarray(out["embeddings"])[0]
        np.testing.assert_allclose(emb, feats.mean(axis=0), rtol=1e-6)

    def test_precomputed_miss_demotes_at_runtime(self, tmp_path):
        from koemorph_tpu.features.emotion import (
            EmotionExtractor, PrecomputedEmotionFeatures)

        known = audio(b=1, seed=6)[0]
        PrecomputedEmotionFeatures.save(
            tmp_path, known, np.ones((1024,), np.float32))
        ex = EmotionExtractor(backend="emotion2vec", enable_caching=False,
                              precomputed_dir=tmp_path)
        unknown = audio(b=1, seed=99)[0]
        out = ex.extract_features(unknown[None])
        # the miss batch is served with eGeMAPS features...
        assert np.asarray(out["embeddings"]).shape[-1] in (88, 264)
        assert out["metadata"]["backend_used"] == "opensmile"
        # ...but a store miss is per-utterance, not a backend failure:
        # the extractor re-promotes so later batches of KNOWN utterances
        # still get their 1024-D features
        assert ex.fallback_level == 0
        out2 = ex.extract_features(known[None])
        np.testing.assert_allclose(np.asarray(out2["embeddings"])[0],
                                   np.ones(1024), rtol=1e-6)
