"""Flax Wav2Vec2 encoder + HuggingFace checkpoint loader.

The reference's emotion2vec backend optionally runs a pretrained
transformers ``Wav2Vec2Model`` with learned layer-fusion weights
(reference src/features/emotion2vec.py:96-122, 207-221). This module is
the TPU-native equivalent: the same architecture in Flax (so the encoder
runs inside jit on device, not as a host-side torch call), plus a weight
loader for standard HuggingFace wav2vec2 checkpoints.

Scope: the *large*-family architecture variant used by 1024-D emotion
models (``feat_extract_norm="layer"``, ``do_stable_layer_norm=True`` —
wav2vec2-large / emotion2vec_plus_large lineage). Numerical parity with
``transformers.Wav2Vec2Model`` is pinned by weight-transplant tests
(tests/features/test_wav2vec2.py) at 1e-4 on hidden states and the fused
output.

No network access is assumed: weights load from a local checkpoint
directory (``model.safetensors`` or ``pytorch_model.bin``); absent
weights, the encoder is a trainable random-init backbone (exactly the
reference's DummyWav2Vec2Model role, but with the real architecture).
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["Wav2Vec2Config", "Wav2Vec2Encoder", "load_hf_checkpoint",
           "hf_state_dict_to_params"]


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Subset of transformers.Wav2Vec2Config this encoder consumes."""

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple[int, ...] = (512,) * 7
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf_config(cls, path: Path) -> "Wav2Vec2Config":
        cfg = json.loads(Path(path).read_text())
        return cls(
            hidden_size=cfg["hidden_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            conv_dim=tuple(cfg["conv_dim"]),
            conv_stride=tuple(cfg["conv_stride"]),
            conv_kernel=tuple(cfg["conv_kernel"]),
            conv_bias=cfg.get("conv_bias", True),
            num_conv_pos_embeddings=cfg["num_conv_pos_embeddings"],
            num_conv_pos_embedding_groups=cfg[
                "num_conv_pos_embedding_groups"],
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        )


class _ConvFeatureEncoder(nn.Module):
    """7-layer strided conv ladder, layer-norm variant
    (transformers Wav2Vec2LayerNormConvLayer)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        x = audio[..., None]                       # (B, L, 1)
        for i, (dim, k, s) in enumerate(zip(
                self.cfg.conv_dim, self.cfg.conv_kernel,
                self.cfg.conv_stride)):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=self.cfg.conv_bias,
                        name=f"conv_{i}")(x)
            x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                             name=f"layer_norm_{i}")(x)
            x = nn.gelu(x, approximate=False)
        return x                                    # (B, T, conv_dim[-1])


class _PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(self.cfg.hidden_size, (k,), padding=[(pad, pad)],
                    feature_group_count=(
                        self.cfg.num_conv_pos_embedding_groups),
                    name="conv")(x)
        if k % 2 == 0:                # SamePadLayer: drop the extra column
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class _Attention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.cfg.hidden_size
        h = self.cfg.num_attention_heads
        hd = d // h
        q = nn.Dense(d, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)

        def split(t):
            return t.reshape(t.shape[:-1] + (h, hd))

        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        probs = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v))
        ctx = ctx.reshape(x.shape)
        return nn.Dense(d, name="out_proj")(ctx)


class _EncoderLayer(nn.Module):
    """Stable-layer-norm transformer layer
    (Wav2Vec2EncoderLayerStableLayerNorm)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        eps = self.cfg.layer_norm_eps
        a = _Attention(self.cfg, name="attention")(
            nn.LayerNorm(epsilon=eps, name="layer_norm")(x))
        x = x + a
        f = nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x)
        f = nn.Dense(self.cfg.intermediate_size,
                     name="intermediate_dense")(f)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.cfg.hidden_size, name="output_dense")(f)
        return x + f


class Wav2Vec2Encoder(nn.Module):
    """Raw 16 kHz audio -> hidden states; optional softmax layer fusion.

    ``__call__`` returns the fused features (B, T, hidden) when
    ``use_layer_fusion`` (the reference's weighted sum over all hidden
    states, emotion2vec.py:207-221) else the final hidden state.
    """

    cfg: Wav2Vec2Config = Wav2Vec2Config()
    use_layer_fusion: bool = True

    @nn.compact
    def __call__(self, audio: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        eps = self.cfg.layer_norm_eps
        feats = _ConvFeatureEncoder(self.cfg, name="feature_extractor")(
            audio)
        x = nn.LayerNorm(epsilon=eps, name="fp_layer_norm")(feats)
        x = nn.Dense(self.cfg.hidden_size, name="fp_projection")(x)

        x = x + _PositionalConvEmbedding(self.cfg, name="pos_conv_embed")(x)

        hidden_states = [x]
        for i in range(self.cfg.num_hidden_layers):
            x = _EncoderLayer(self.cfg, name=f"layer_{i}")(x)
            if i < self.cfg.num_hidden_layers - 1:
                hidden_states.append(x)
        x = nn.LayerNorm(epsilon=eps, name="encoder_layer_norm")(x)
        hidden_states.append(x)   # == transformers' last_hidden_state

        if not self.use_layer_fusion:
            return x
        n = len(hidden_states)
        fusion = self.param("layer_fusion_weights",
                            lambda k: jnp.zeros((n,), jnp.float32))
        w = nn.softmax(fusion)
        stacked = jnp.stack(hidden_states, axis=0)   # (n, B, T, D)
        return jnp.einsum("l,lbtd->btd", w, stacked)


# ---------------------------------------------------------------------------
# HuggingFace checkpoint loading
# ---------------------------------------------------------------------------

def _weight_norm_weight(sd: dict, prefix: str) -> np.ndarray:
    """Reconstruct a weight-normed conv weight from either the legacy
    (weight_g/weight_v) or parametrized (original0/original1) layout."""
    if f"{prefix}.weight_g" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    else:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    g = np.asarray(g, np.float64)
    v = np.asarray(v, np.float64)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def hf_state_dict_to_params(sd: dict, cfg: Wav2Vec2Config) -> dict:
    """transformers Wav2Vec2Model state_dict -> Wav2Vec2Encoder params."""
    sd = {k: np.asarray(v, np.float32) if not isinstance(v, np.ndarray)
          else v for k, v in sd.items()}

    def conv(key):       # torch (out, in/groups, k) -> flax (k, in/g, out)
        return np.transpose(sd[key], (2, 1, 0))

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    params: dict = {}
    fe = {}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        entry = {"kernel": conv(f"{base}.conv.weight")}
        if cfg.conv_bias:
            entry["bias"] = sd[f"{base}.conv.bias"]
        fe[f"conv_{i}"] = entry
        fe[f"layer_norm_{i}"] = ln(f"{base}.layer_norm")
    params["feature_extractor"] = fe

    params["fp_layer_norm"] = ln("feature_projection.layer_norm")
    params["fp_projection"] = lin("feature_projection.projection")

    pos_w = _weight_norm_weight(sd, "encoder.pos_conv_embed.conv")
    params["pos_conv_embed"] = {"conv": {
        "kernel": np.transpose(pos_w, (2, 1, 0)),
        "bias": sd["encoder.pos_conv_embed.conv.bias"],
    }}

    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm": ln(f"{base}.layer_norm"),
            "attention": {
                "q_proj": lin(f"{base}.attention.q_proj"),
                "k_proj": lin(f"{base}.attention.k_proj"),
                "v_proj": lin(f"{base}.attention.v_proj"),
                "out_proj": lin(f"{base}.attention.out_proj"),
            },
            "final_layer_norm": ln(f"{base}.final_layer_norm"),
            "intermediate_dense": lin(
                f"{base}.feed_forward.intermediate_dense"),
            "output_dense": lin(f"{base}.feed_forward.output_dense"),
        }
    params["encoder_layer_norm"] = ln("encoder.layer_norm")
    return params


def load_hf_checkpoint(
    path: str | Path,
    *,
    layer_fusion_weights: Optional[np.ndarray] = None,
) -> tuple[Wav2Vec2Config, dict]:
    """Load (config, params) from a local HuggingFace checkpoint dir.

    Accepts ``model.safetensors`` or ``pytorch_model.bin`` next to
    ``config.json``. ``layer_fusion_weights`` seeds the fusion logits
    (uniform when None)."""
    path = Path(path)
    cfg = Wav2Vec2Config.from_hf_config(path / "config.json")

    st_path = path / "model.safetensors"
    pt_path = path / "pytorch_model.bin"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st_path))
    elif pt_path.exists():
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(pt_path, map_location="cpu",
                         weights_only=True).items()}
    else:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model.bin under {path}")

    sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
    params = hf_state_dict_to_params(sd, cfg)
    n = cfg.num_hidden_layers + 1
    if layer_fusion_weights is None:
        params["layer_fusion_weights"] = np.zeros((n,), np.float32)
    else:
        fw = np.asarray(layer_fusion_weights, np.float32)
        if fw.shape != (n,):
            raise ValueError(f"layer_fusion_weights must be ({n},)")
        params["layer_fusion_weights"] = fw
    return cfg, params
