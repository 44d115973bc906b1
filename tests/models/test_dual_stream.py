"""Tests for the production DualStreamCrossAttention core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.blendshapes import EXPRESSION_INDICES, MOUTH_INDICES
from koemorph_tpu.models.dual_stream import (
    DualStreamCrossAttention,
    DualStreamEncoder,
)


@pytest.fixture(scope="module")
def module_and_params():
    mod = DualStreamCrossAttention(dropout=0.0)
    mel = jnp.zeros((2, 256, 80))
    detail = jnp.zeros((2, 3, 80))
    emo = jnp.zeros((2, 256))
    params = mod.init(jax.random.key(0), mel, detail, emo)
    return mod, params


class TestDualStreamCrossAttention:
    def test_output_shape_and_range(self, module_and_params, rng):
        mod, params = module_and_params
        mel = jnp.asarray(rng.uniform(0, 1, (2, 256, 80)), jnp.float32)
        detail = jnp.asarray(rng.uniform(0, 1, (2, 3, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
        out = mod.apply(params, mel, detail, emo)
        bs = np.asarray(out["blendshapes"])
        assert bs.shape == (2, 52)
        assert bs.min() >= 0.0 and bs.max() <= 1.0

    def test_short_mel_gets_padded(self, module_and_params, rng):
        mod, params = module_and_params
        mel = jnp.asarray(rng.uniform(0, 1, (1, 100, 80)), jnp.float32)
        detail = jnp.zeros((1, 3, 80))
        emo = jnp.zeros((1, 256))
        out = mod.apply(params, mel, detail, emo)
        assert out["blendshapes"].shape == (1, 52)

    def test_long_mel_gets_truncated(self, module_and_params, rng):
        mod, params = module_and_params
        mel = jnp.asarray(rng.uniform(0, 1, (1, 300, 80)), jnp.float32)
        out = mod.apply(params, mel, jnp.zeros((1, 3, 80)),
                        jnp.zeros((1, 256)))
        assert out["blendshapes"].shape == (1, 52)

    def test_attention_weight_shapes(self, module_and_params, rng):
        mod, params = module_and_params
        out = mod.apply(
            params,
            jnp.asarray(rng.uniform(0, 1, (2, 256, 80)), jnp.float32),
            jnp.zeros((2, 3, 80)), jnp.zeros((2, 256)),
            return_attention=True,
        )
        assert out["mel_attention_weights"].shape == (2, 28, 80)
        assert out["emotion_attention_weights"].shape == (2, 24, 1)
        # stream-split analysis outputs live on disjoint index sets
        mel_bs = np.asarray(out["mel_blendshapes"])
        emo_bs = np.asarray(out["emotion_blendshapes"])
        assert (mel_bs[:, list(EXPRESSION_INDICES)] == 0).all()
        assert (emo_bs[:, list(MOUTH_INDICES)] == 0).all()

    def test_stream_weight_init_bias(self, module_and_params):
        _, params = module_and_params
        mel_w = np.asarray(params["params"]["mel_weights"])
        emo_w = np.asarray(params["params"]["emotion_weights"])
        assert (mel_w[list(MOUTH_INDICES)] == 2.0).all()
        assert (mel_w[list(EXPRESSION_INDICES)] == 0.5).all()
        assert (emo_w[list(MOUTH_INDICES)] == 0.5).all()
        assert (emo_w[list(EXPRESSION_INDICES)] == 2.0).all()

    def test_mel_only_affects_via_attention(self, module_and_params, rng):
        """Changing mel input changes mouth outputs."""
        mod, params = module_and_params
        detail = jnp.zeros((1, 3, 80))
        emo = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
        mel_a = jnp.asarray(rng.uniform(0, 1, (1, 256, 80)), jnp.float32)
        mel_b = jnp.asarray(rng.uniform(0, 1, (1, 256, 80)), jnp.float32)
        out_a = np.asarray(mod.apply(params, mel_a, detail, emo)["blendshapes"])
        out_b = np.asarray(mod.apply(params, mel_b, detail, emo)["blendshapes"])
        assert not np.allclose(out_a[:, list(MOUTH_INDICES)],
                               out_b[:, list(MOUTH_INDICES)])

    def test_grad_flow_through_all_params(self, module_and_params, rng):
        mod, params = module_and_params
        mel = jnp.asarray(rng.uniform(0, 1, (2, 256, 80)), jnp.float32)
        detail = jnp.asarray(rng.uniform(0, 1, (2, 3, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)

        def loss(p):
            return mod.apply(p, mel, detail, emo)["blendshapes"].var()

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        nonzero = {jax.tree_util.keystr(k): float(np.abs(np.asarray(v)).max())
                   for k, v in flat}
        # every major parameter group receives gradient. Note:
        # expression_queries are architecturally vestigial in the
        # concatenated-emotion config — softmax over a single KV token is
        # identically 1, so they get zero gradient (true of the reference
        # too: dual_stream_attention.py's emotion stream has 1 key).
        for key in ["mouth_queries", "mel_weights",
                    "emotion_weights", "mel_channel_encoder",
                    "emotion_encoder"]:
            hits = [v for k, v in nonzero.items() if key in k]
            assert hits and max(hits) > 0, f"no grad through {key}"
        expr_hits = [v for k, v in nonzero.items()
                     if "expression_queries" in k]
        assert expr_hits and max(expr_hits) == 0.0  # vestigial by design

    def test_jit_and_scan_compatible(self, module_and_params, rng):
        mod, params = module_and_params
        mel = jnp.asarray(rng.uniform(0, 1, (1, 256, 80)), jnp.float32)

        @jax.jit
        def f(p, m):
            return mod.apply(p, m, jnp.zeros((1, 3, 80)),
                             jnp.zeros((1, 256)))["blendshapes"]

        a = f(params, mel)
        b = f(params, mel)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_shared_emotion_rows_match_repeated_rows(self, module_and_params,
                                                     rng):
        """The sequential decode passes one emotion row per utterance
        (utterance-major window batch); the module must produce exactly what
        explicit per-window repetition produces, including attention-weight
        shapes."""
        mod, params = module_and_params
        b_u, n_w = 2, 3
        mel = jnp.asarray(rng.uniform(0, 1, (b_u * n_w, 256, 80)),
                          jnp.float32)
        detail = jnp.asarray(rng.uniform(0, 1, (b_u * n_w, 3, 80)),
                             jnp.float32)
        emo = jnp.asarray(rng.standard_normal((b_u, 256)), jnp.float32)
        o_shared = mod.apply(params, mel, detail, emo,
                             return_attention=True)
        o_repeat = mod.apply(params, mel, detail,
                             jnp.repeat(emo, n_w, axis=0),
                             return_attention=True)
        for k in o_repeat:
            np.testing.assert_allclose(
                np.asarray(o_shared[k]), np.asarray(o_repeat[k]),
                rtol=1e-6, atol=1e-7, err_msg=k)

    def test_mismatched_emotion_rows_rejected(self, module_and_params):
        mod, params = module_and_params
        with pytest.raises(ValueError, match="not a multiple"):
            mod.apply(params, jnp.zeros((5, 256, 80)), jnp.zeros((5, 3, 80)),
                      jnp.zeros((2, 256)))

    def test_fixed_weights_variant(self, rng):
        mod = DualStreamCrossAttention(dropout=0.0,
                                       use_learnable_weights=False)
        mel = jnp.zeros((1, 256, 80))
        params = mod.init(jax.random.key(0), mel, jnp.zeros((1, 3, 80)),
                          jnp.zeros((1, 256)))
        assert "mel_weights" not in params["params"]
        out = mod.apply(params, mel, jnp.zeros((1, 3, 80)),
                        jnp.zeros((1, 256)))
        assert out["blendshapes"].shape == (1, 52)


class TestDualStreamEncoder:
    def test_shapes(self, rng):
        mod = DualStreamEncoder(num_layers=1, dropout=0.0)
        mel = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
        emo = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
        params = mod.init(jax.random.key(0), mel, emo)
        m, e = mod.apply(params, mel, emo)
        assert m.shape == (2, 16, 256) and e.shape == (2, 16, 256)
