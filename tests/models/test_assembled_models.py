"""End-to-end forward tests for assembled models (mirrors reference
tests/model/test_koemorph_model.py: shapes/ranges, prev-state conditioning,
temporal-state reset changes outputs, config factory round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.models.legacy import (
    KoeMorphModel,
    KoeMorphModelState,
    create_koemorph_model,
)
from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel


class TestSimplifiedKoeMorphModel:
    def test_audio_to_blendshapes(self, dummy_audio_batch):
        mod = SimplifiedKoeMorphModel(dropout=0.0)
        audio = jnp.asarray(dummy_audio_batch)
        params = mod.init(jax.random.key(0), audio)
        out = np.asarray(mod.apply(params, audio))
        assert out.shape == (2, 52)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_precomputed_mel_path(self, rng):
        mod = SimplifiedKoeMorphModel(dropout=0.0)
        mel = jnp.asarray(rng.uniform(0, 1, (2, 60, 80)), jnp.float32)
        params = mod.init(jax.random.key(0), mel_features=mel)
        out = mod.apply(params, mel_features=mel)
        assert out.shape == (2, 52)

    def test_jit_forward(self, dummy_audio_batch):
        mod = SimplifiedKoeMorphModel(dropout=0.0)
        audio = jnp.asarray(dummy_audio_batch)
        params = mod.init(jax.random.key(0), audio)
        f = jax.jit(lambda p, a: mod.apply(p, a))
        np.testing.assert_allclose(np.asarray(f(params, audio)),
                                   np.asarray(mod.apply(params, audio)),
                                   rtol=2e-4, atol=2e-5)


class TestLegacyKoeMorphModel:
    def _make(self, **kw):
        mod = KoeMorphModel(dropout=0.0, attention_dropout=0.0,
                            num_attention_layers=2, num_encoder_layers=1,
                            **kw)
        mel = jnp.zeros((2, 16, 80))
        emo = jnp.zeros((2, 16, 256))
        state = KoeMorphModelState.create(2)
        params = mod.init(jax.random.key(0), mel, emo, state)
        return mod, params, state

    def test_forward_shapes_and_range(self, rng):
        mod, params, state = self._make()
        mel = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
        out, new_state = mod.apply(params, mel, emo, state)
        bs = np.asarray(out["blendshapes"])
        assert bs.shape == (2, 52)
        assert bs.min() >= 0.0 and bs.max() <= 1.0
        assert out["raw_blendshapes"].shape == (2, 52)
        assert new_state is not None

    def test_prev_blendshape_conditioning_changes_output(self, rng):
        mod, params, state = self._make()
        mel = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
        out_a, _ = mod.apply(params, mel, emo, state)
        out_b, _ = mod.apply(params, mel, emo, state,
                             prev_blendshapes=jnp.ones((2, 52)))
        assert not np.allclose(np.asarray(out_a["raw_blendshapes"]),
                               np.asarray(out_b["raw_blendshapes"]))

    def test_temporal_state_carry_changes_outputs(self, rng):
        """Same input twice with carried state -> different (smoothed)
        outputs; reset state -> reproduces the first output."""
        mod, params, state0 = self._make()
        mel = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
        out1, state1 = mod.apply(params, mel, emo, state0)
        out2, _ = mod.apply(params, mel, emo, state1)
        assert not np.allclose(np.asarray(out1["blendshapes"]),
                               np.asarray(out2["blendshapes"]))
        out_reset, _ = mod.apply(params, mel, emo,
                                 KoeMorphModelState.create(2))
        np.testing.assert_allclose(np.asarray(out_reset["blendshapes"]),
                                   np.asarray(out1["blendshapes"]),
                                   rtol=1e-5, atol=1e-6)

    def test_attention_return(self, rng):
        mod, params, state = self._make()
        mel = jnp.asarray(rng.standard_normal((1, 16, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((1, 16, 256)), jnp.float32)
        out, _ = mod.apply(params, mel, emo, state, return_attention=True)
        assert len(out["attention_weights"]) == 2
        assert out["attention_weights"][0].shape == (1, 8, 52, 16)

    def test_config_factory_round_trip(self):
        cfg = {"d_model": 128, "num_heads": 4, "num_attention_layers": 2,
               "decoder_hidden_dim": 64, "window_size": None}
        mod = create_koemorph_model(cfg)
        assert mod.d_model == 128 and mod.num_heads == 4
        mel = jnp.zeros((1, 8, 80))
        emo = jnp.zeros((1, 8, 256))
        state = KoeMorphModelState.create(1)
        params = mod.init(jax.random.key(0), mel, emo, state)
        out, _ = mod.apply(params, mel, emo, state)
        assert out["blendshapes"].shape == (1, 52)
