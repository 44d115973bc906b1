"""Cross-attention primitives for blendshape generation (Flax).

Contains the legacy-generation attention family of the reference
(reference: src/model/attention.py): a generic multi-head cross-attention
with separate query/key/value input dims, temperature-scaled scores and
causal / windowed / padding masks; a multi-stream audio encoder with
concat / add / gated fusion; sinusoidal positional encoding; and learned
blendshape query embeddings with optional previous-state conditioning.

Plus :class:`TorchStyleMHA`, a faithful port of
``torch.nn.MultiheadAttention`` semantics (packed in-projection, per-head
scale, attention weights averaged over heads) used by the production
dual-stream module so that reference checkpoints are weight-transplantable.

All masks are built as compile-time constants (numpy) — no data-dependent
control flow, so every module jits and scans cleanly.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # large-negative logits instead of -inf: safe under softmax+grad


def causal_mask(q_len: int, k_len: int) -> np.ndarray:
    """Boolean mask (q_len, k_len); True = *masked out* (upper triangle).

    Mirrors reference src/model/attention.py:217-224.
    """
    return np.triu(np.ones((q_len, k_len), dtype=bool), k=1)


def window_mask(q_len: int, k_len: int, window_size: int) -> np.ndarray:
    """Local-attention mask; True = masked. Query i maps to key position
    ``int(i * k_len / q_len)`` and may attend within +-window_size/2
    (reference src/model/attention.py:226-246)."""
    mask = np.ones((q_len, k_len), dtype=bool)
    for i in range(q_len):
        key_pos = int(i * k_len / q_len) if q_len > 0 else 0
        start = max(0, key_pos - window_size // 2)
        end = min(k_len, key_pos + window_size // 2 + 1)
        mask[i, start:end] = False
    return mask


def create_attention_mask(
    seq_length: int,
    window_size: Optional[int] = None,
    causal: bool = False,
) -> np.ndarray:
    """Self-attention mask combining causal and windowed constraints
    (True = masked). Mirrors reference src/model/attention.py:516-553."""
    mask = np.zeros((seq_length, seq_length), dtype=bool)
    if causal:
        mask = causal_mask(seq_length, seq_length)
    if window_size is not None:
        mask = mask | window_mask(seq_length, seq_length, window_size)
    return mask


def _apply_masks(
    scores: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
    attn_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """scores (B, H, Q, T); key_padding_mask (B, T) True=valid;
    attn_mask (Q, T) or (B, Q, T) True=masked."""
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], scores, NEG_INF
        )
    if attn_mask is not None:
        if attn_mask.ndim == 2:
            m = attn_mask[None, None]
        else:
            m = attn_mask[:, None]
        scores = jnp.where(m, NEG_INF, scores)
    return scores


class MultiHeadCrossAttention(nn.Module):
    """Legacy cross-attention: 52 blendshape queries over audio features.

    Parity target: reference src/model/attention.py:22-246 (separate
    d_query/d_key/d_value projections, scale = (head_dim * temperature)^-0.5,
    optional causal/window masks applied to the *key time axis*).
    """

    d_query: int = 128
    d_key: int = 256
    d_value: int = 256
    d_model: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    causal: bool = True
    window_size: Optional[int] = None
    temperature: float = 1.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,           # (B, Q, d_query)
        key: jnp.ndarray,             # (B, T, d_key)
        value: jnp.ndarray,           # (B, T, d_value)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True=valid
        attn_mask: Optional[jnp.ndarray] = None,         # (Q,T)/(B,Q,T) True=masked
        return_attention: bool = False,
        deterministic: bool = True,
    ):
        if self.d_model % self.num_heads != 0:
            raise ValueError(
                f"d_model ({self.d_model}) must be divisible by num_heads "
                f"({self.num_heads})"
            )
        b, q_len, _ = query.shape
        t = key.shape[1]
        if key.shape[0] != b:
            raise ValueError(
                f"Batch size mismatch: query {b}, key {key.shape[0]}"
            )
        head_dim = self.d_model // self.num_heads
        scale = (head_dim * self.temperature) ** -0.5
        init = nn.initializers.xavier_uniform()

        def split(x, n):
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.d_model, use_bias=self.qkv_bias,
                           kernel_init=init, name="q_proj")(query), q_len)
        k = split(nn.Dense(self.d_model, use_bias=self.qkv_bias,
                           kernel_init=init, name="k_proj")(key), t)
        v = split(nn.Dense(self.d_model, use_bias=self.qkv_bias,
                           kernel_init=init, name="v_proj")(value), t)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if self.causal:
            scores = jnp.where(jnp.asarray(causal_mask(q_len, t)),
                               NEG_INF, scores)
        if self.window_size is not None:
            scores = jnp.where(
                jnp.asarray(window_mask(q_len, t, self.window_size)),
                NEG_INF, scores,
            )
        scores = _apply_masks(scores, key_padding_mask, attn_mask)

        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, q_len, self.d_model)
        out = nn.Dense(self.d_model, kernel_init=init, name="out_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if return_attention:
            return out, attn
        return out, None


class TorchStyleMHA(nn.Module):
    """``torch.nn.MultiheadAttention`` (batch_first) semantics in Flax.

    Packed QKV in-projection, scale = head_dim^-0.5, output projection, and
    ``need_weights=True`` returning head-averaged attention — so parameters
    map 1:1 onto reference checkpoints of ``nn.MultiheadAttention``.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,   # (B, Q, E) or (1, Q, E) shared across the batch
        key: jnp.ndarray,     # (B, T, E)
        value: jnp.ndarray,   # (B, T, E)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True=valid
        need_weights: bool = False,
        deterministic: bool = True,
    ):
        """A query batch dim of 1 against a larger key batch broadcasts the
        (projected) queries across the batch — learned-query callers pass
        (1, Q, E) so the Q projection runs once instead of per batch row
        (the reference projects the broadcast queries every row,
        dual_stream_attention.py:221-240)."""
        e = self.embed_dim
        if e % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        head_dim = e // self.num_heads
        bq, q_len, _ = query.shape
        b, t = key.shape[0], key.shape[1]
        if bq not in (1, b):
            raise ValueError(
                f"query batch {bq} must be 1 or match key batch {b}")

        # packed in-projection: torch stores (3E, E) weight, (3E,) bias
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * e, e)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        wq, wk, wv = jnp.split(in_proj_w, 3, axis=0)
        bq_bias, bk, bv = jnp.split(in_proj_b, 3, axis=0)

        q = query @ wq.T + bq_bias
        k = key @ wk.T + bk
        v = value @ wv.T + bv

        def split(x, n, rows=None):
            rows = b if rows is None else rows
            return x.reshape(
                rows, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(q, q_len, rows=bq)
        if bq != b:
            q = jnp.broadcast_to(q, (b,) + q.shape[1:])
        k, v = split(k, t), split(v, t)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
        if key_padding_mask is not None:
            # torch semantics: padded keys (mask False) are excluded
            scores = jnp.where(
                key_padding_mask[:, None, None, :], scores, NEG_INF)
        attn = nn.softmax(scores, axis=-1)
        attn_dropped = nn.Dropout(self.dropout)(attn,
                                                deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn_dropped, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, q_len, e)
        out = nn.Dense(e, name="out_proj")(out)
        if need_weights:
            return out, attn.mean(axis=1)  # torch averages over heads
        return out, None


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding
    (reference src/model/attention.py:409-431)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        pos = np.arange(self.max_len, dtype=np.float32)[:, None]
        div = np.exp(
            np.arange(0, self.d_model, 2, dtype=np.float32)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = np.zeros((self.max_len, self.d_model), dtype=np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        x = x + jnp.asarray(pe)[: x.shape[1]][None]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer, GELU FFN
    (torch ``nn.TransformerEncoderLayer`` defaults, batch_first)."""

    d_model: int
    num_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        attn_out, _ = TorchStyleMHA(
            self.d_model, self.num_heads, dropout=self.dropout,
            name="self_attn",
        )(x, x, x, key_padding_mask=key_padding_mask,
          deterministic=deterministic)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(
            attn_out, deterministic=deterministic))
        h = nn.Dense(self.dim_feedforward)(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(
            h, deterministic=deterministic))
        return x


class MultiStreamAudioEncoder(nn.Module):
    """mel + prosody + emotion per-stream MLPs with concat/add/gated fusion
    and a transformer stack (reference src/model/attention.py:249-406)."""

    mel_dim: int = 80
    prosody_dim: int = 4
    emotion_dim: int = 256
    d_model: int = 256
    num_layers: int = 2
    dropout: float = 0.1
    fusion_method: str = "concat"  # concat | add | gate
    use_positional_encoding: bool = True

    @nn.compact
    def __call__(
        self,
        mel_features: jnp.ndarray,      # (B, T, mel_dim)
        prosody_features: jnp.ndarray,  # (B, T, prosody_dim)
        emotion_features: jnp.ndarray,  # (B, T, emotion_dim)
        mask: Optional[jnp.ndarray] = None,  # (B, T) True=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)  # noqa: E731

        mel = nn.Dense(self.d_model)(
            drop(nn.relu(nn.Dense(self.d_model // 2)(mel_features))))
        pros = nn.Dense(self.d_model)(
            drop(nn.relu(nn.Dense(self.d_model // 4)(prosody_features))))
        emo = drop(nn.relu(nn.Dense(self.d_model)(emotion_features)))

        if self.fusion_method == "concat":
            fused = nn.Dense(self.d_model)(
                jnp.concatenate([mel, pros, emo], axis=-1))
        elif self.fusion_method == "add":
            fused = mel + pros + emo
        elif self.fusion_method == "gate":
            gm = nn.sigmoid(nn.Dense(1)(mel))
            gp = nn.sigmoid(nn.Dense(1)(pros))
            ge = nn.sigmoid(nn.Dense(1)(emo))
            s = gm + gp + ge + 1e-8
            fused = (gm / s) * mel + (gp / s) * pros + (ge / s) * emo
        else:
            raise ValueError(f"Unknown fusion method: {self.fusion_method}")

        if self.use_positional_encoding:
            fused = PositionalEncoding(self.d_model, self.dropout)(
                fused, deterministic=deterministic)

        x = fused
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, dim_feedforward=self.d_model * 4,
                dropout=self.dropout, name=f"layer_{i}",
            )(x, key_padding_mask=mask, deterministic=deterministic)
        return nn.LayerNorm()(x)


class BlendshapeQueryEmbedding(nn.Module):
    """52 learned query vectors + optional conditioning on the previous
    blendshape state (reference src/model/attention.py:434-513)."""

    num_blendshapes: int = 52
    d_query: int = 128
    use_conditioning: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        batch_size: int,
        prev_blendshapes: Optional[jnp.ndarray] = None,  # (B, 52)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        emb = self.param(
            "query_embeddings", nn.initializers.xavier_uniform(),
            (self.num_blendshapes, self.d_query),
        )
        queries = jnp.broadcast_to(
            emb[None], (batch_size, self.num_blendshapes, self.d_query)
        )
        if self.use_conditioning:
            # always run the conditioning net so its params exist regardless
            # of how the module was initialized; contribute only when a
            # previous state is provided
            prev = (prev_blendshapes if prev_blendshapes is not None
                    else jnp.zeros((batch_size, self.num_blendshapes)))
            h = nn.Dense(self.d_query // 2)(prev)
            h = nn.Dropout(self.dropout)(nn.relu(h),
                                         deterministic=deterministic)
            cond = nn.Dense(self.d_query)(h)
            if prev_blendshapes is not None:
                queries = queries + cond[:, None, :]
        return nn.Dropout(self.dropout)(queries, deterministic=deterministic)
