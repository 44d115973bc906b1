"""Legacy assembled model: encoder -> 4x cross-attention -> decoder ->
smoother -> constraints.

Parity target: reference src/model/gaussian_face.py:27-368 (KoeMorphModel).
The averaged dual-stream fusion (an acknowledged shim in the reference,
gaussian_face.py:211-213) is kept for behavioral parity; the production path
is :class:`koemorph_tpu.models.dual_stream.DualStreamCrossAttention`.

Temporal smoothing / constraint state is an explicit carry
(:class:`KoeMorphModelState`), so ``inference_step`` is a pure function
suitable for jit and the streaming runtime.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from koemorph_tpu.models.attention import (
    BlendshapeQueryEmbedding,
    MultiHeadCrossAttention,
)
from koemorph_tpu.models.decoder import (
    BlendshapeConstraints,
    BlendshapeDecoder,
    ConstraintState,
    SmootherState,
    TemporalSmoother,
)
from koemorph_tpu.models.dual_stream import DualStreamEncoder


@flax.struct.dataclass
class KoeMorphModelState:
    """Carried temporal state of the legacy model."""

    smoother: SmootherState
    constraints: ConstraintState

    @classmethod
    def create(cls, batch_size: int, num_blendshapes: int = 52,
               window_size: int = 5) -> "KoeMorphModelState":
        return cls(
            smoother=SmootherState.create(batch_size, num_blendshapes,
                                          window_size),
            constraints=ConstraintState.create(batch_size, num_blendshapes),
        )


class KoeMorphModel(nn.Module):
    """Complete legacy model for real-time blendshape generation."""

    mel_dim: int = 80
    emotion_dim: int = 256
    d_model: int = 256
    d_query: int = 128
    num_heads: int = 8
    num_encoder_layers: int = 2
    num_attention_layers: int = 4
    attention_dropout: float = 0.1
    decoder_hidden_dim: int = 128
    decoder_layers: int = 2
    decoder_activation: str = "gelu"
    output_activation: str = "sigmoid"
    use_temporal_smoothing: bool = True
    smoothing_method: str = "exponential"
    smoothing_alpha: float = 0.8
    use_constraints: bool = True
    causal: bool = True
    window_size: Optional[int] = 30
    num_blendshapes: int = 52
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        mel_features: jnp.ndarray,       # (B, T, mel_dim)
        emotion_features: jnp.ndarray,   # (B, T, emotion_dim)
        state: Optional[KoeMorphModelState] = None,
        audio_mask: Optional[jnp.ndarray] = None,       # (B, T) True=valid
        prev_blendshapes: Optional[jnp.ndarray] = None,  # (B, 52)
        apply_smoothing: bool = True,
        apply_constraints: bool = True,
        return_attention: bool = False,
        deterministic: bool = True,
    ):
        b = mel_features.shape[0]

        mel_enc, emo_enc = DualStreamEncoder(
            mel_dim=self.mel_dim, emotion_dim=self.emotion_dim,
            d_model=self.d_model, num_layers=self.num_encoder_layers,
            dropout=self.dropout, name="audio_encoder",
        )(mel_features, emotion_features, mel_mask=audio_mask,
          emotion_mask=audio_mask, deterministic=deterministic)
        # simple averaged fusion (parity with reference shim)
        encoded_audio = (mel_enc + emo_enc) / 2

        queries = BlendshapeQueryEmbedding(
            num_blendshapes=self.num_blendshapes, d_query=self.d_query,
            use_conditioning=True, dropout=self.dropout,
            name="query_embeddings",
        )(b, prev_blendshapes, deterministic=deterministic)

        attention_output = queries
        attention_weights = []
        for i in range(self.num_attention_layers):
            attn_out, attn_w = MultiHeadCrossAttention(
                d_query=(self.d_query if i == 0 else self.d_model),
                d_key=self.d_model, d_value=self.d_model,
                d_model=self.d_model, num_heads=self.num_heads,
                dropout=self.attention_dropout, causal=self.causal,
                window_size=self.window_size, name=f"cross_attention_{i}",
            )(attention_output, encoded_audio, encoded_audio,
              key_padding_mask=audio_mask, return_attention=return_attention,
              deterministic=deterministic)
            if i == 0 and self.d_query != self.d_model:
                # project the query residual up to d_model for the first layer
                attention_output = nn.Dense(
                    self.d_model, name="query_up_proj")(attention_output)
            attention_output = nn.LayerNorm(name=f"attention_norm_{i}")(
                attn_out + attention_output)
            if return_attention and attn_w is not None:
                attention_weights.append(attn_w)

        raw = BlendshapeDecoder(
            d_model=self.d_model, hidden_dim=self.decoder_hidden_dim,
            num_blendshapes=self.num_blendshapes,
            num_layers=self.decoder_layers,
            activation=self.decoder_activation,
            output_activation=self.output_activation, dropout=self.dropout,
            name="decoder",
        )(attention_output, prev_blendshapes, deterministic=deterministic)

        new_state = state
        smoothed = raw
        if apply_smoothing and self.use_temporal_smoothing and state is not None:
            smoothed, sm_state = TemporalSmoother(
                num_blendshapes=self.num_blendshapes,
                smoothing_method=self.smoothing_method,
                alpha=self.smoothing_alpha, learnable=True,
                name="temporal_smoother",
            )(raw, state.smoother)
            new_state = state.replace(smoother=sm_state)

        final = smoothed
        if apply_constraints and self.use_constraints:
            if new_state is not None:
                final, _, c_state = BlendshapeConstraints(
                    num_blendshapes=self.num_blendshapes, name="constraints",
                )(smoothed, new_state.constraints)
                new_state = new_state.replace(constraints=c_state)
            else:
                final, _ = BlendshapeConstraints(
                    num_blendshapes=self.num_blendshapes, name="constraints",
                )(smoothed)

        out = {"blendshapes": final, "raw_blendshapes": raw}
        if return_attention and attention_weights:
            out["attention_weights"] = attention_weights
        return out, new_state


def create_koemorph_model(config: dict) -> KoeMorphModel:
    """Build a legacy model from a flat config dict
    (reference src/model/gaussian_face.py:325-368)."""
    return KoeMorphModel(
        mel_dim=config.get("mel_dim", 80),
        emotion_dim=config.get("emotion_dim", 256),
        d_model=config.get("d_model", 256),
        d_query=config.get("d_query", 128),
        num_heads=config.get("num_heads", 8),
        num_encoder_layers=config.get("num_encoder_layers", 2),
        num_attention_layers=config.get("num_attention_layers", 4),
        attention_dropout=config.get("attention_dropout", 0.1),
        decoder_hidden_dim=config.get("decoder_hidden_dim", 128),
        decoder_layers=config.get("decoder_layers", 2),
        decoder_activation=config.get("decoder_activation", "gelu"),
        output_activation=config.get("output_activation", "sigmoid"),
        use_temporal_smoothing=config.get("use_temporal_smoothing", True),
        smoothing_method=config.get("smoothing_method", "exponential"),
        smoothing_alpha=config.get("smoothing_alpha", 0.8),
        use_constraints=config.get("use_constraints", True),
        causal=config.get("causal", True),
        window_size=config.get("window_size", 30),
        num_blendshapes=config.get("num_blendshapes", 52),
        dropout=config.get("dropout", 0.1),
    )
