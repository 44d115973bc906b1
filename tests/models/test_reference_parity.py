"""Numerical parity vs the PyTorch reference via weight transplant.

Imports the reference's production attention module directly from
/root/reference (torch-cpu is available), copies its randomly initialized
weights into our Flax module, and asserts the outputs match to float32
tolerance on random inputs. This pins the full operator chain — per-channel
encoder, LayerNorms, packed-QKV attention, scatter-combine, decoder head,
stream-weight softmax fusion, clamp — not just shapes.

Skipped cleanly when torch or the reference tree is unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
if not (REFERENCE / "src" / "model" / "dual_stream_attention.py").exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

import jax  # noqa: E402

from koemorph_tpu.models.dual_stream import (  # noqa: E402
    DualStreamCrossAttention,
)

D_MODEL = 64
HEADS = 4
T_MEL = 32


@pytest.fixture(scope="module")
def modules():
    from src.model.dual_stream_attention import (
        DualStreamCrossAttention as TorchDSCA)

    torch.manual_seed(0)
    ref = TorchDSCA(d_model=D_MODEL, num_heads=HEADS,
                    mel_sequence_length=T_MEL, emotion_dim=D_MODEL,
                    dropout=0.0)
    ref.eval()

    ours = DualStreamCrossAttention(
        d_model=D_MODEL, num_heads=HEADS, mel_sequence_length=T_MEL,
        emotion_dim=D_MODEL, dropout=0.0)
    return ref, ours


def transplant(ref) -> dict:
    """Torch state_dict -> our Flax param tree.

    Delegates to the production mapping
    (koemorph_tpu.utils.torch_import.attention_params_from_state_dict) so
    the parity tests pin the SAME code the checkpoint importer ships —
    one mapping, no drift.
    """
    from koemorph_tpu.utils.torch_import import (
        attention_params_from_state_dict)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return attention_params_from_state_dict(sd)


def random_inputs(rng, b=2):
    mel = rng.uniform(0, 1, (b, T_MEL, 80)).astype(np.float32)
    detail = rng.uniform(0, 1, (b, 3, 80)).astype(np.float32)
    emotion = rng.standard_normal((b, D_MODEL)).astype(np.float32)
    return mel, detail, emotion


class TestWeightTransplantParity:
    def test_param_tree_covers_reference(self, modules):
        ref, ours = modules
        mel, detail, emotion = random_inputs(np.random.default_rng(0))
        variables = jax.jit(ours.init)(
            jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray(detail),
            jnp.asarray(emotion))
        got = transplant(ref)
        want_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(np.shape, got)
        assert want_shapes == got_shapes

    def test_outputs_match(self, modules):
        ref, ours = modules
        rng = np.random.default_rng(1)
        mel, detail, emotion = random_inputs(rng)
        params = transplant(ref)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(mel), torch.from_numpy(detail),
                          torch.from_numpy(emotion))
        our_out = ours.apply({"params": params}, jnp.asarray(mel),
                             jnp.asarray(detail), jnp.asarray(emotion),
                             deterministic=True)
        np.testing.assert_allclose(
            np.asarray(our_out["blendshapes"]),
            ref_out["blendshapes"].numpy(), rtol=1e-5, atol=1e-5)

    def test_attention_weights_match(self, modules):
        ref, ours = modules
        rng = np.random.default_rng(2)
        mel, detail, emotion = random_inputs(rng)
        params = transplant(ref)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(mel), torch.from_numpy(detail),
                          torch.from_numpy(emotion), return_attention=True)
        our_out = ours.apply({"params": params}, jnp.asarray(mel),
                             jnp.asarray(detail), jnp.asarray(emotion),
                             return_attention=True, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(our_out["mel_attention_weights"]),
            ref_out["mel_attention_weights"].numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(our_out["emotion_blendshapes"]),
            ref_out["emotion_blendshapes"].numpy(), rtol=1e-5, atol=1e-5)

    def test_short_mel_padding_matches(self, modules):
        """T < mel_sequence_length exercises the zero-pad branch."""
        ref, ours = modules
        rng = np.random.default_rng(3)
        mel = rng.uniform(0, 1, (1, T_MEL // 2, 80)).astype(np.float32)
        detail = rng.uniform(0, 1, (1, 3, 80)).astype(np.float32)
        emotion = rng.standard_normal((1, D_MODEL)).astype(np.float32)
        params = transplant(ref)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(mel), torch.from_numpy(detail),
                          torch.from_numpy(emotion))
        our_out = ours.apply({"params": params}, jnp.asarray(mel),
                             jnp.asarray(detail), jnp.asarray(emotion),
                             deterministic=True)
        np.testing.assert_allclose(
            np.asarray(our_out["blendshapes"]),
            ref_out["blendshapes"].numpy(), rtol=1e-5, atol=1e-5)


class TestLegacyAttentionParity:
    """Legacy MultiHeadCrossAttention weight-transplant parity
    (reference src/model/attention.py:22-246)."""

    def _pair(self, causal=False, window_size=None, temperature=1.0):
        from src.model.attention import (
            MultiHeadCrossAttention as TorchMHA)
        from koemorph_tpu.models.attention import MultiHeadCrossAttention

        torch.manual_seed(1)
        ref = TorchMHA(d_query=32, d_key=48, d_value=48, d_model=64,
                       num_heads=4, dropout=0.0, causal=causal,
                       window_size=window_size, temperature=temperature)
        ref.eval()
        ours = MultiHeadCrossAttention(
            d_query=32, d_key=48, d_value=48, d_model=64, num_heads=4,
            dropout=0.0, causal=causal, window_size=window_size,
            temperature=temperature)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = {name: {"kernel": sd[f"{name}.weight"].T,
                         "bias": sd[f"{name}.bias"]}
                  for name in ("q_proj", "k_proj", "v_proj", "out_proj")}
        return ref, ours, params

    def _inputs(self, rng, b=2, q=52, t=20):
        return (rng.standard_normal((b, q, 32)).astype(np.float32),
                rng.standard_normal((b, t, 48)).astype(np.float32),
                rng.standard_normal((b, t, 48)).astype(np.float32))

    def test_outputs_match(self):
        ref, ours, params = self._pair()
        q, k, v = self._inputs(np.random.default_rng(4))
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                             torch.from_numpy(v))
        our_out, _ = ours.apply({"params": params}, jnp.asarray(q),
                                jnp.asarray(k), jnp.asarray(v),
                                deterministic=True)
        np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_temperature_scaling_matches(self):
        ref, ours, params = self._pair(temperature=2.0)
        q, k, v = self._inputs(np.random.default_rng(5))
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                             torch.from_numpy(v))
        our_out, _ = ours.apply({"params": params}, jnp.asarray(q),
                                jnp.asarray(k), jnp.asarray(v),
                                deterministic=True)
        np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_key_padding_mask_matches(self):
        ref, ours, params = self._pair()
        rng = np.random.default_rng(6)
        q, k, v = self._inputs(rng)
        valid = np.ones((2, 20), bool)
        valid[:, 15:] = False
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                             torch.from_numpy(v),
                             key_padding_mask=torch.from_numpy(valid))
        our_out, _ = ours.apply({"params": params}, jnp.asarray(q),
                                jnp.asarray(k), jnp.asarray(v),
                                key_padding_mask=jnp.asarray(valid),
                                deterministic=True)
        np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                                   rtol=1e-5, atol=1e-5)


class TestDecoderParity:
    """BlendshapeDecoder weight-transplant parity
    (reference src/model/decoder.py:21-177)."""

    def _pair(self):
        from src.model.decoder import BlendshapeDecoder as TorchDecoder
        from koemorph_tpu.models.decoder import BlendshapeDecoder

        torch.manual_seed(2)
        ref = TorchDecoder(d_model=64, hidden_dim=32, num_layers=2,
                           dropout=0.0, activation="gelu",
                           output_activation="sigmoid")
        ref.eval()
        ours = BlendshapeDecoder(d_model=64, hidden_dim=32, num_layers=2,
                                 dropout=0.0, activation="gelu",
                                 output_activation="sigmoid")
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = {
            "input_proj": {"kernel": sd["input_proj.weight"].T,
                           "bias": sd["input_proj.bias"]},
            "output_proj": {"kernel": sd["output_proj.weight"].T,
                            "bias": sd["output_proj.bias"]},
        }
        for i in range(2):
            params[f"hidden_{i}"] = {
                "kernel": sd[f"hidden_layers.{i}.weight"].T,
                "bias": sd[f"hidden_layers.{i}.bias"]}
            params[f"norm_{i}"] = {
                "scale": sd[f"layer_norms.{i}.weight"],
                "bias": sd[f"layer_norms.{i}.bias"]}
        return ref, ours, params

    def test_outputs_match(self):
        ref, ours, params = self._pair()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 52, 64)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        our_out = ours.apply({"params": params}, jnp.asarray(x),
                             deterministic=True)
        np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_prev_state_residual_matches(self):
        ref, ours, params = self._pair()
        rng = np.random.default_rng(8)
        x = rng.standard_normal((2, 52, 64)).astype(np.float32)
        prev = rng.uniform(0, 1, (2, 52)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(prev))
        our_out = ours.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(prev), deterministic=True)
        # float32 accumulation noise pushes a couple of elements to ~2e-5
        np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                                   rtol=1e-5, atol=5e-5)
