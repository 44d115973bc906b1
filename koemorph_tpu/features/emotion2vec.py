"""Emotion embedding backbone (wav2vec2-style conv encoder) in Flax.

Parity target: reference src/features/emotion2vec.py (Emotion2VecExtractor
with its DummyWav2Vec2Model CNN fallback, layer-fusion weights, temporal
pooling to the target fps, LRU cache). The real FunASR emotion2vec weights
are an optional external artifact in the reference (never used by the
production config, configs/model/dual_stream.yaml:26); here the backbone is
a trainable conv encoder with the same 1024-D contract, so the
``backend="emotion2vec"`` path trains end to end instead of depending on an
absent download.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

EMBED_DIM = 1024


class ConvEmotionEncoder(nn.Module):
    """Strided conv stack: raw 16 kHz audio -> ~50 Hz frames of 1024-D.

    Matches the downsampling ladder of wav2vec2's feature encoder
    (5,2,2,2,2,2,2 strides -> 320x) so embeddings align with the usual
    emotion2vec frame rate.
    """

    embed_dim: int = EMBED_DIM
    num_fusion_layers: int = 4

    @nn.compact
    def __call__(self, audio: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """audio (B, L) -> (B, T', embed_dim) at ~sr/320 frame rate."""
        x = audio[..., None]  # (B, L, 1)
        widths = (512, 512, 512, 512, 512, 512, 512)
        strides = (5, 2, 2, 2, 2, 2, 2)
        kernels = (10, 3, 3, 3, 3, 2, 2)
        for i, (w, s, k) in enumerate(zip(widths, strides, kernels)):
            x = nn.Conv(w, (k,), strides=(s,), name=f"conv_{i}")(x)
            x = nn.LayerNorm(name=f"norm_{i}")(x)
            x = nn.gelu(x)
        # a small stack of "layers" whose outputs are fused with learned
        # weights (reference emotion2vec.py:77-84,207-221)
        layer_outs = []
        h = nn.Dense(self.embed_dim, name="proj")(x)
        for i in range(self.num_fusion_layers):
            h = h + nn.Dense(self.embed_dim, name=f"ff_{i}")(nn.gelu(h))
            layer_outs.append(nn.LayerNorm(name=f"lnorm_{i}")(h))
        fusion_w = self.param(
            "layer_fusion_weights",
            lambda k: jnp.full((self.num_fusion_layers,),
                               1.0 / self.num_fusion_layers))
        w = nn.softmax(fusion_w)
        stacked = jnp.stack(layer_outs, axis=0)
        return jnp.einsum("l,lbtd->btd", w, stacked)


def pool_to_fps(
    features: jnp.ndarray,    # (B, T_in, D)
    audio_len: int,
    sample_rate: int,
    target_fps: float,
    method: str = "linear",
) -> jnp.ndarray:
    """Temporal pooling of encoder frames to the blendshape frame rate
    (reference emotion2vec.py:256-306: adaptive/linear/conv)."""
    b, t_in, d = features.shape
    t_out = max(1, int(audio_len / sample_rate * target_fps))
    if method == "adaptive":
        # adaptive average pooling: mean over equal chunks
        edges = np.linspace(0, t_in, t_out + 1).astype(int)
        pooled = [features[:, lo:hi].mean(axis=1) if hi > lo
                  else features[:, min(lo, t_in - 1)]
                  for lo, hi in zip(edges[:-1], edges[1:])]
        return jnp.stack(pooled, axis=1)
    if method == "linear":
        src = jnp.linspace(0.0, t_in - 1.0, t_out)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, t_in - 1)
        hi = jnp.clip(lo + 1, 0, t_in - 1)
        w = (src - lo.astype(src.dtype))[None, :, None]
        return features[:, lo] * (1 - w) + features[:, hi] * w
    if method == "conv":
        # strided average pooling (the conv variant of reference
        # emotion2vec.py:296-306): kernel = stride = ceil(t_in / t_out),
        # then linear-resample the remainder to exactly t_out
        k = max(1, int(np.ceil(t_in / t_out)))
        t_trim = (t_in // k) * k
        pooled = features[:, :t_trim].reshape(b, t_trim // k, k, d).mean(2)
        if pooled.shape[1] == t_out:
            return pooled
        return pool_to_fps(pooled, audio_len, sample_rate, target_fps,
                           method="linear")
    raise ValueError(f"Unknown pooling method: {method}")


def utterance_embedding(features: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, D) utterance-level mean embedding."""
    return features.mean(axis=1)


class Emotion2VecCache:
    """Host-side LRU cache of utterance embeddings keyed by an audio hash
    (reference emotion2vec.py:358-392)."""

    def __init__(self, max_size: int = 100):
        self.max_size = max_size
        self._store: OrderedDict[int, np.ndarray] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def compute_audio_hash(audio: np.ndarray) -> str:
        import hashlib
        # stable content hash (Python's hash() is salted per process)
        return hashlib.sha1(
            np.ascontiguousarray(audio).tobytes()).hexdigest()

    def get(self, audio: np.ndarray) -> Optional[np.ndarray]:
        key = self.compute_audio_hash(audio)
        if key in self._store:
            self._store.move_to_end(key)
            self.hits += 1
            return self._store[key]
        self.misses += 1
        return None

    def put(self, audio: np.ndarray, embedding: np.ndarray) -> None:
        key = self.compute_audio_hash(audio)
        self._store[key] = embedding
        self._store.move_to_end(key)
        while len(self._store) > self.max_size:
            self._store.popitem(last=False)

    def __len__(self) -> int:
        return len(self._store)

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {"size": len(self._store), "hits": self.hits,
                "misses": self.misses,
                "hit_rate": self.hits / total if total else 0.0}
