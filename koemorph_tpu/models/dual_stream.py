"""Dual-stream cross-attention decoder — the production KoeMorph core.

Two independent attention streams over one set of 52 learned ARKit queries
(reference: src/model/dual_stream_attention.py:48-294):

- **Mel stream** (mouth): the 80 mel channels are the attention *tokens*.
  Each channel's 256-frame long-term context is concatenated with a 3-frame
  short-term detail and encoded per-channel (259 -> d_model); 28 learned
  mouth queries attend over those 80 tokens. Attention cost is O(28 x 80),
  independent of audio length.
- **Emotion stream** (expression): a single compressed 256-D eGeMAPS token;
  24 learned expression queries attend over it.

Outputs are scatter-combined to (B, 52, d_model), decoded by a shared
sigmoid head, then fused by learnable per-blendshape stream weights
(softmax / temperature; initialized 2.0 toward the intended stream) and
clamped to [0, 1].

Faithfully-reproduced reference quirk: the stream-weight softmax normalizes
ACROSS the 52 blendshapes (reference dual_stream_attention.py:252-267), so
``final = (softmax(w_mel) + softmax(w_emo)) / 2 * sigmoid(head)`` bounds
each coefficient near 1/52-scale unless the softmax concentrates. Weight
transplant tests pin this behavior; training can sharpen the softmax but
uniformly large outputs are unreachable by construction.

Everything is static-shape; the module jits, vmaps, and scans.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.blendshapes import (
    EXPRESSION_INDICES,
    MOUTH_INDICES,
    NUM_BLENDSHAPES,
)
from koemorph_tpu.models.attention import TorchStyleMHA, TransformerEncoderLayer


def _stream_weight_init(mouth_val: float, expr_val: float):
    """Per-blendshape stream-weight init biased toward the intended stream
    (reference src/model/dual_stream_attention.py:126-134)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        w = np.ones(shape, dtype=np.float32)
        w[list(MOUTH_INDICES)] = mouth_val
        w[list(EXPRESSION_INDICES)] = expr_val
        return jnp.asarray(w, dtype=dtype)

    return init


class DualStreamCrossAttention(nn.Module):
    """Enhanced dual-stream cross-attention (production core)."""

    d_model: int = 256
    num_heads: int = 8
    num_mel_channels: int = 80
    mel_sequence_length: int = 256
    mel_temporal_frames: int = 3
    emotion_dim: int = 256          # concatenated+compressed eGeMAPS dim
    dropout: float = 0.1
    num_blendshapes: int = NUM_BLENDSHAPES
    use_learnable_weights: bool = True
    temperature: float = 1.0

    @nn.compact
    def __call__(
        self,
        mel_features: jnp.ndarray,            # (B, T, 80)
        mel_temporal_features: jnp.ndarray,   # (B, 3, 80)
        emotion_features: jnp.ndarray,        # (B or B//r, emotion_dim)
        return_attention: bool = False,
        deterministic: bool = True,
    ) -> dict[str, jnp.ndarray]:
        """``emotion_features`` may carry fewer rows than the mel batch when
        consecutive mel rows share one emotion vector (the sequential decode
        batches ``r`` windows per utterance in utterance-major order,
        sequential_dual_stream_model.py:86-88 extracts emotion once per
        sequence): with ``B = Be * r`` the emotion branch — encoder, 24-query
        attention and its decoder-head half — runs at ``Be`` rows and the
        per-utterance outputs are repeated across each utterance's ``r``
        windows, instead of recomputing identical rows ``r`` times."""
        b = mel_features.shape[0]
        be = emotion_features.shape[0]
        if b % be:
            raise ValueError(
                f"mel batch {b} not a multiple of emotion batch {be}")
        rep = b // be
        n_mouth, n_expr = len(MOUTH_INDICES), len(EXPRESSION_INDICES)

        # ---- mel branch: (B, T, 80) -> (B, 80, 256) -> concat detail ----
        mel = jnp.swapaxes(mel_features, 1, 2)  # (B, 80, T)
        t = mel.shape[2]
        if t < self.mel_sequence_length:
            mel = jnp.pad(mel, ((0, 0), (0, 0),
                                (0, self.mel_sequence_length - t)))
        elif t > self.mel_sequence_length:
            mel = mel[:, :, : self.mel_sequence_length]
        detail = jnp.swapaxes(mel_temporal_features, 1, 2)  # (B, 80, 3)
        enhanced = jnp.concatenate([mel, detail], axis=2)   # (B, 80, 259)

        mel_encoded = nn.Dense(self.d_model, name="mel_channel_encoder")(
            enhanced)                                       # (B, 80, d)
        mel_encoded = nn.LayerNorm(name="mel_norm")(mel_encoded)

        # ---- emotion branch: (Be, E) -> (Be, 1, d) ----
        emo_encoded = nn.Dense(self.d_model, name="emotion_encoder")(
            emotion_features)
        emo_encoded = nn.LayerNorm(name="emotion_norm")(emo_encoded[:, None, :])

        # ---- learned queries (1-row: MHA broadcasts after projection) ----
        q_init = nn.initializers.normal(stddev=0.02)
        mouth_q = self.param("mouth_queries", q_init, (n_mouth, self.d_model))
        expr_q = self.param("expression_queries", q_init,
                            (n_expr, self.d_model))
        mouth_q = mouth_q[None]                 # (1, 28, d)
        expr_q = expr_q[None]                   # (1, 24, d)

        # ---- dual attention ----
        mel_out, mel_attn = TorchStyleMHA(
            self.d_model, self.num_heads, dropout=self.dropout,
            name="mel_attention",
        )(mouth_q, mel_encoded, mel_encoded, need_weights=return_attention,
          deterministic=deterministic)
        mel_out = nn.Dense(self.d_model, name="mel_output_proj")(mel_out)

        emo_out, emo_attn = TorchStyleMHA(
            self.d_model, self.num_heads, dropout=self.dropout,
            name="emotion_attention",
        )(expr_q, emo_encoded, emo_encoded, need_weights=return_attention,
          deterministic=deterministic)
        emo_out = nn.Dense(self.d_model, name="emotion_output_proj")(emo_out)

        # ---- shared decoder head: d -> d/2 -> 1, sigmoid ----
        # Applied per stream (the head is rowwise, so this equals the
        # reference's scatter-then-decode on the combined (B, 52, d) tensor,
        # dual_stream_attention.py:242-248) — the emotion half stays at Be
        # rows until the final scatter.
        decoder_hidden = nn.Dense(self.d_model // 2, name="decoder_hidden")
        decoder_out = nn.Dense(1, name="decoder_out")
        head_dropout = nn.Dropout(self.dropout)

        def head(x):
            h = head_dropout(nn.relu(decoder_hidden(x)),
                             deterministic=deterministic)
            return nn.sigmoid(decoder_out(h)).squeeze(-1)

        mouth_bs = head(mel_out)                 # (B, 28)
        expr_bs = head(emo_out)                  # (Be, 24)
        if rep != 1:
            expr_bs = jnp.repeat(expr_bs, rep, axis=0)
            if return_attention and emo_attn is not None:
                emo_attn = jnp.repeat(emo_attn, rep, axis=0)

        # ---- scatter-combine to (B, 52) ----
        blendshapes = jnp.zeros((b, self.num_blendshapes),
                                dtype=mouth_bs.dtype)
        blendshapes = blendshapes.at[:, np.asarray(MOUTH_INDICES)].set(
            mouth_bs)
        blendshapes = blendshapes.at[:, np.asarray(EXPRESSION_INDICES)].set(
            expr_bs)

        # ---- learnable stream-weight fusion ----
        if self.use_learnable_weights:
            mel_w = self.param("mel_weights",
                               _stream_weight_init(2.0, 0.5),
                               (self.num_blendshapes,))
            emo_w = self.param("emotion_weights",
                               _stream_weight_init(0.5, 2.0),
                               (self.num_blendshapes,))
        else:
            mel_w_np = np.zeros(self.num_blendshapes, np.float32)
            emo_w_np = np.zeros(self.num_blendshapes, np.float32)
            mel_w_np[list(MOUTH_INDICES)] = 1.0
            emo_w_np[list(EXPRESSION_INDICES)] = 1.0
            mel_w, emo_w = jnp.asarray(mel_w_np), jnp.asarray(emo_w_np)

        norm_mel_w = nn.softmax(mel_w / self.temperature)
        norm_emo_w = nn.softmax(emo_w / self.temperature)
        final = (norm_mel_w * blendshapes * 0.5
                 + norm_emo_w * blendshapes * 0.5)
        final = jnp.clip(final, 0.0, 1.0)

        out: dict[str, jnp.ndarray] = {"blendshapes": final}
        if return_attention:
            out["mel_attention_weights"] = mel_attn        # (B, 28, 80)
            out["emotion_attention_weights"] = emo_attn    # (B, 24, 1)
            mel_bs = jnp.zeros_like(blendshapes)
            emo_bs = jnp.zeros_like(blendshapes)
            mel_bs = mel_bs.at[:, np.asarray(MOUTH_INDICES)].set(
                blendshapes[:, np.asarray(MOUTH_INDICES)])
            emo_bs = emo_bs.at[:, np.asarray(EXPRESSION_INDICES)].set(
                blendshapes[:, np.asarray(EXPRESSION_INDICES)])
            out["mel_blendshapes"] = mel_bs
            out["emotion_blendshapes"] = emo_bs
        return out


class DualStreamEncoder(nn.Module):
    """Independent mel / emotion encoders with optional transformer layers
    (legacy variant; reference src/model/dual_stream_attention.py:297-391)."""

    mel_dim: int = 80
    emotion_dim: int = 256
    d_model: int = 256
    num_layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        mel_features: jnp.ndarray,       # (B, T, mel_dim)
        emotion_features: jnp.ndarray,   # (B, T, emotion_dim)
        mel_mask: Optional[jnp.ndarray] = None,
        emotion_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        def encode(x, name):
            h = nn.Dense(self.d_model, name=f"{name}_dense")(x)
            h = nn.Dropout(self.dropout)(nn.relu(h),
                                         deterministic=deterministic)
            return nn.LayerNorm(name=f"{name}_norm")(h)

        mel = encode(mel_features, "mel")
        emo = encode(emotion_features, "emotion")
        for i in range(self.num_layers):
            mel = TransformerEncoderLayer(
                self.d_model, dim_feedforward=self.d_model * 4,
                dropout=self.dropout, name=f"mel_layer_{i}",
            )(mel, key_padding_mask=mel_mask, deterministic=deterministic)
            emo = TransformerEncoderLayer(
                self.d_model, dim_feedforward=self.d_model * 4,
                dropout=self.dropout, name=f"emotion_layer_{i}",
            )(emo, key_padding_mask=emotion_mask, deterministic=deterministic)
        return mel, emo
