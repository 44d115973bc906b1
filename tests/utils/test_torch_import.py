"""Reference .pth checkpoint import (utils/torch_import.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")

REFERENCE = Path("/root/reference")
if not (REFERENCE / "src" / "model" / "dual_stream_attention.py").exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

import jax  # noqa: E402

from koemorph_tpu.models.dual_stream import (  # noqa: E402
    DualStreamCrossAttention,
)
from koemorph_tpu.utils.torch_import import (  # noqa: E402
    attention_params_from_state_dict,
    load_torch_state_dict,
    model_params_from_state_dict,
)

D, H, W = 64, 4, 32


def torch_attention():
    from src.model.dual_stream_attention import (
        DualStreamCrossAttention as TorchDSCA)

    torch.manual_seed(3)
    att = TorchDSCA(d_model=D, num_heads=H, mel_sequence_length=W,
                    emotion_dim=D, dropout=0.0)
    att.eval()
    return att


class TestAttentionImport:
    def test_imported_params_reproduce_torch_outputs(self):
        ref = torch_attention()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = attention_params_from_state_dict(sd)

        ours = DualStreamCrossAttention(
            d_model=D, num_heads=H, mel_sequence_length=W,
            emotion_dim=D, dropout=0.0)
        rng = np.random.default_rng(0)
        mel = rng.uniform(0, 1, (2, W, 80)).astype(np.float32)
        det = rng.uniform(0, 1, (2, 3, 80)).astype(np.float32)
        emo = rng.standard_normal((2, D)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(mel), torch.from_numpy(det),
                       torch.from_numpy(emo))["blendshapes"].numpy()
        got = np.asarray(ours.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(mel), jnp.asarray(det), jnp.asarray(emo),
            deterministic=True)["blendshapes"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestCheckpointImport:
    def test_pth_to_orbax_roundtrip(self, tmp_path):
        """Full flow: reference-style .pth -> orbax dir -> loadable params
        that still match the torch module."""
        from koemorph_tpu.models.dual_stream_model import (
            SimplifiedDualStreamModel)
        from koemorph_tpu.train.checkpoint import load_checkpoint
        from koemorph_tpu.utils.torch_import import import_torch_checkpoint

        ref = torch_attention()
        # wrap like a trainer checkpoint (reference train.py:300-328)
        sd = {f"dual_stream_attention.{k}": v
              for k, v in ref.state_dict().items()}
        sd["smoothing_alpha"] = torch.tensor(0.37)
        pth = tmp_path / "best_model.pth"
        torch.save({"model_state_dict": sd, "epoch": 7}, pth)

        model = SimplifiedDualStreamModel(
            d_model=D, num_heads=H, mel_sequence_length=W,
            emotion_backend="basic", use_concatenation=False,
            target_fps=30, dropout=0.0)
        out_dir = tmp_path / "imported"
        import_torch_checkpoint(pth, model, out_dir)

        params, meta = load_checkpoint(out_dir)
        assert abs(float(params["smoothing_alpha"]) - 0.37) < 1e-6
        got_q = np.asarray(
            params["dual_stream_attention"]["mouth_queries"])
        np.testing.assert_allclose(
            got_q, ref.state_dict()["mouth_queries"].numpy(), rtol=1e-6)

    def test_missing_keys_raise(self):
        with pytest.raises((ValueError, KeyError)):
            model_params_from_state_dict(
                {"dual_stream_attention.mouth_queries":
                 np.zeros((28, D))},
                {"dual_stream_attention": {"mouth_queries": None},
                 "smoothing_alpha": None})

    def test_load_raw_state_dict(self, tmp_path):
        ref = torch_attention()
        pth = tmp_path / "raw.pth"
        torch.save(ref.state_dict(), pth)
        sd = load_torch_state_dict(pth)
        assert "mouth_queries" in sd
        assert isinstance(sd["mouth_queries"], np.ndarray)


class TestImportValidation:
    def test_wrong_d_model_fails_fast(self, tmp_path):
        from koemorph_tpu.models.dual_stream_model import (
            SimplifiedDualStreamModel)
        from koemorph_tpu.utils.torch_import import import_torch_checkpoint

        ref = torch_attention()        # d_model = 64
        sd = {f"dual_stream_attention.{k}": v
              for k, v in ref.state_dict().items()}
        pth = tmp_path / "m.pth"
        torch.save({"model_state_dict": sd}, pth)
        model = SimplifiedDualStreamModel(
            d_model=128, num_heads=H, mel_sequence_length=W,
            emotion_backend="basic", use_concatenation=False,
            target_fps=30, dropout=0.0)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torch_checkpoint(pth, model, tmp_path / "out")

    def test_fusion_weights_dropped_for_fixed_fusion_model(self, tmp_path):
        """The reference stores fusion weights as buffers even in fixed
        mode, so every reference checkpoint carries them; importing into
        a use_learnable_weights=False model drops them (the fixed masks
        are recomputed statically — identical values) instead of writing
        orphan params."""
        from koemorph_tpu.models.dual_stream_model import (
            SimplifiedDualStreamModel)
        from koemorph_tpu.train.checkpoint import load_checkpoint
        from koemorph_tpu.utils.torch_import import import_torch_checkpoint

        ref = torch_attention()
        sd = {f"dual_stream_attention.{k}": v
              for k, v in ref.state_dict().items()}
        pth = tmp_path / "learnable.pth"
        torch.save({"model_state_dict": sd}, pth)
        model = SimplifiedDualStreamModel(
            d_model=D, num_heads=H, mel_sequence_length=W,
            emotion_backend="basic", use_concatenation=False,
            target_fps=30, dropout=0.0, use_learnable_weights=False)
        out = import_torch_checkpoint(pth, model, tmp_path / "out")
        params, _ = load_checkpoint(out)
        assert "mel_weights" not in params["dual_stream_attention"]
