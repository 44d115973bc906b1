"""Tests for attention modules (mirrors reference tests/model/test_attention.py:
masks, grad flow, error paths, fusion modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.models.attention import (
    BlendshapeQueryEmbedding,
    MultiHeadCrossAttention,
    MultiStreamAudioEncoder,
    PositionalEncoding,
    TorchStyleMHA,
    causal_mask,
    create_attention_mask,
    window_mask,
)


class TestMasks:
    def test_causal_mask(self):
        m = causal_mask(4, 4)
        assert m[0, 1] and m[0, 3] and not m[1, 0] and not m[3, 3]

    def test_window_mask_local(self):
        m = window_mask(10, 100, window_size=10)
        # query 5 maps to key 50; window [45, 55]
        assert not m[5, 50] and not m[5, 46] and m[5, 30] and m[5, 70]

    def test_create_attention_mask_combined(self):
        m = create_attention_mask(20, window_size=6, causal=True)
        assert m[0, 1]           # causal
        assert m[10, 2]          # outside window
        assert not m[10, 9]      # within window, past


class TestMultiHeadCrossAttention:
    def _run(self, **kw):
        mod = MultiHeadCrossAttention(causal=False, dropout=0.0, **kw)
        q = jnp.ones((2, 52, 128))
        k = jnp.ones((2, 30, 256))
        v = jnp.ones((2, 30, 256))
        params = mod.init(jax.random.key(0), q, k, v)
        return mod, params, (q, k, v)

    def test_output_shape(self):
        mod, params, (q, k, v) = self._run()
        out, _ = mod.apply(params, q, k, v)
        assert out.shape == (2, 52, 256)

    def test_head_divisibility_error(self):
        with pytest.raises(ValueError, match="divisible"):
            mod = MultiHeadCrossAttention(d_model=250, num_heads=8,
                                          causal=False)
            mod.init(jax.random.key(0), jnp.ones((1, 4, 128)),
                     jnp.ones((1, 4, 256)), jnp.ones((1, 4, 256)))

    def test_batch_mismatch_error(self):
        mod = MultiHeadCrossAttention(causal=False)
        with pytest.raises(ValueError, match="Batch size mismatch"):
            mod.init(jax.random.key(0), jnp.ones((2, 4, 128)),
                     jnp.ones((3, 4, 256)), jnp.ones((3, 4, 256)))

    def test_key_padding_mask_zeroes_padded_keys(self):
        mod = MultiHeadCrossAttention(causal=False, dropout=0.0)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 4, 128)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 8, 256)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 8, 256)), jnp.float32)
        params = mod.init(jax.random.key(0), q, k, v)
        mask_full = jnp.ones((1, 8), bool)
        mask_half = mask_full.at[0, 4:].set(False)
        _, attn_full = mod.apply(params, q, k, v, key_padding_mask=mask_full,
                                 return_attention=True)
        _, attn_half = mod.apply(params, q, k, v, key_padding_mask=mask_half,
                                 return_attention=True)
        assert np.asarray(attn_half)[..., 4:].max() < 1e-6
        assert np.asarray(attn_full)[..., 4:].max() > 1e-6

    def test_causal_blocks_future(self):
        mod = MultiHeadCrossAttention(causal=True, dropout=0.0)
        q = jnp.ones((1, 6, 128))
        kv = jnp.ones((1, 6, 256))
        params = mod.init(jax.random.key(0), q, kv, kv)
        _, attn = mod.apply(params, q, kv, kv, return_attention=True)
        a = np.asarray(attn)[0, 0]  # (Q, T)
        assert np.triu(a, k=1).max() < 1e-6

    def test_grad_flow(self):
        mod, params, (q, k, v) = self._run()

        def loss(p):
            out, _ = mod.apply(p, q, k, v)
            return (out ** 2).mean()

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


class TestTorchStyleMHA:
    def test_matches_torch(self):
        """Weight-transplant equivalence against torch.nn.MultiheadAttention."""
        import torch

        e, h, b, q_len, t = 64, 4, 2, 5, 7
        tm = torch.nn.MultiheadAttention(e, h, batch_first=True)
        tm.eval()
        rng = np.random.default_rng(1)
        q = rng.standard_normal((b, q_len, e)).astype(np.float32)
        k = rng.standard_normal((b, t, e)).astype(np.float32)
        v = rng.standard_normal((b, t, e)).astype(np.float32)
        with torch.no_grad():
            t_out, t_attn = tm(torch.from_numpy(q), torch.from_numpy(k),
                               torch.from_numpy(v), need_weights=True)

        mod = TorchStyleMHA(e, h, dropout=0.0)
        params = {
            "params": {
                "in_proj_weight": jnp.asarray(
                    tm.in_proj_weight.detach().numpy()),
                "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
                "out_proj": {
                    "kernel": jnp.asarray(
                        tm.out_proj.weight.detach().numpy().T),
                    "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
                },
            }
        }
        j_out, j_attn = mod.apply(params, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), need_weights=True)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestMultiStreamEncoder:
    @pytest.mark.parametrize("fusion", ["concat", "add", "gate"])
    def test_fusion_modes(self, fusion):
        mod = MultiStreamAudioEncoder(fusion_method=fusion, num_layers=1,
                                      dropout=0.0)
        mel = jnp.ones((2, 10, 80))
        pros = jnp.ones((2, 10, 4))
        emo = jnp.ones((2, 10, 256))
        params = mod.init(jax.random.key(0), mel, pros, emo)
        out = mod.apply(params, mel, pros, emo)
        assert out.shape == (2, 10, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_fusion_raises(self):
        mod = MultiStreamAudioEncoder(fusion_method="bogus", dropout=0.0)
        with pytest.raises(ValueError, match="Unknown fusion"):
            mod.init(jax.random.key(0), jnp.ones((1, 4, 80)),
                     jnp.ones((1, 4, 4)), jnp.ones((1, 4, 256)))


class TestPositionalEncoding:
    def test_adds_position_dependent_signal(self):
        mod = PositionalEncoding(64, dropout=0.0)
        x = jnp.zeros((1, 10, 64))
        params = mod.init(jax.random.key(0), x)
        out = np.asarray(mod.apply(params, x))
        assert not np.allclose(out[0, 0], out[0, 5])


class TestBlendshapeQueryEmbedding:
    def test_conditioning_changes_queries(self):
        mod = BlendshapeQueryEmbedding(dropout=0.0)
        params = mod.init(jax.random.key(0), 2, jnp.ones((2, 52)))
        base = mod.apply(params, 2, None)
        cond = mod.apply(params, 2, jnp.ones((2, 52)))
        assert base.shape == (2, 52, 128)
        assert not np.allclose(np.asarray(base), np.asarray(cond))
