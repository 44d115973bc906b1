"""Minimal end-to-end model: audio -> mel -> MHA(52 queries) -> 52 coeffs.

Parity target: reference src/model/simplified_model.py (the smallest runnable
slice, used by train.py and rt_simplified.py). Structural difference: the
reference loops librosa over batch items on the host per forward; here the
mel frontend is on-device jnp, so the whole forward is one jitted graph.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from koemorph_tpu.models.attention import TorchStyleMHA
from koemorph_tpu.ops.frontend import LogMelFrontend, log_mel_spectrogram


class SimplifiedKoeMorphModel(nn.Module):
    """Mel-only single-stream model producing one (B, 52) frame per clip."""

    d_model: int = 256
    num_heads: int = 8
    num_blendshapes: int = 52
    decoder_hidden: int = 128
    dropout: float = 0.1
    sample_rate: int = 16000
    target_fps: int = 30
    n_mels: int = 80

    @property
    def frontend(self) -> LogMelFrontend:
        return LogMelFrontend(
            sample_rate=self.sample_rate, target_fps=float(self.target_fps),
            n_fft=1024, n_mels=self.n_mels, f_min=80.0, f_max=8000.0,
            style="librosa",
        )

    @nn.compact
    def __call__(
        self,
        audio: Optional[jnp.ndarray] = None,      # (B, L)
        mel_features: Optional[jnp.ndarray] = None,  # (B, T, n_mels)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if mel_features is None:
            if audio is None:
                raise ValueError("Provide audio or mel_features")
            mel_features = log_mel_spectrogram(audio, self.frontend)
        b = mel_features.shape[0]
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)  # noqa: E731

        # audio encoder: two ReLU MLP layers
        h = drop(nn.relu(nn.Dense(self.d_model, name="enc_0")(mel_features)))
        h = drop(nn.relu(nn.Dense(self.d_model, name="enc_1")(h)))

        queries = self.param(
            "blendshape_queries", nn.initializers.normal(stddev=0.1),
            (self.num_blendshapes, self.d_model),
        )
        queries = jnp.broadcast_to(
            queries[None], (b, self.num_blendshapes, self.d_model))

        attn_out, _ = TorchStyleMHA(
            self.d_model, self.num_heads, dropout=self.dropout,
            name="attention",
        )(queries, h, h, deterministic=deterministic)

        # decoder MLP -> (B, 52, 52), mean over query axis
        d = drop(nn.relu(nn.Dense(self.decoder_hidden, name="dec_0")(attn_out)))
        d = drop(nn.relu(nn.Dense(self.decoder_hidden, name="dec_1")(d)))
        out = nn.sigmoid(nn.Dense(self.num_blendshapes, name="dec_out")(d))
        return out.mean(axis=1)  # (B, 52)
