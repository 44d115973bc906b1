"""Attention visualization: mel frequency-band heatmaps, stream weights.

Parity target: reference src/visualization/attention_viz.py:22
(AttentionVisualizer: heatmaps of the (28 x 80) mouth-query/mel-channel
attention by frequency band, stream-specialization plots; plotly optional).
matplotlib-only here (plotly isn't in this image); all functions are
analysis-side numpy and import-gate matplotlib.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Union

import numpy as np

from koemorph_tpu.blendshapes import (
    ARKIT_BLENDSHAPES,
    EXPRESSION_INDICES,
    MOUTH_INDICES,
)

logger = logging.getLogger(__name__)

__all__ = ["frequency_bands", "AttentionVisualizer"]


def frequency_bands(n_mels: int = 80, sample_rate: int = 16000,
                    f_min: float = 80.0, f_max: float = 8000.0) -> dict:
    """Mel-channel index ranges of named frequency bands
    (reference dual_stream_attention.py:282-294 get_frequency_bands)."""
    from koemorph_tpu.ops.mel import hz_to_mel, mel_to_hz

    mel_lo, mel_hi = hz_to_mel(np.asarray(f_min)), hz_to_mel(
        np.asarray(f_max))
    centers = mel_to_hz(np.linspace(mel_lo, mel_hi, n_mels))
    bands = {"low (F0)": (0, 1000), "mid (formants)": (1000, 4000),
             "high (fricatives)": (4000, 8000)}
    out = {}
    for name, (lo, hi) in bands.items():
        idx = np.where((centers >= lo) & (centers < hi))[0]
        if len(idx):
            out[name] = (int(idx[0]), int(idx[-1]) + 1)
    return out


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


class AttentionVisualizer:
    """Plots from a model's returned attention weights."""

    def __init__(self, save_dir: Union[str, Path] = "attention_plots"):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)

    def plot_mel_attention(
        self,
        mel_attention: np.ndarray,        # (28, 80) or (B, 28, 80)
        title: str = "Mouth-query attention over mel channels",
        save_name: str = "mel_attention.png",
    ) -> str:
        """Heatmap of mouth queries x mel channels with band annotations."""
        plt = _plt()
        att = np.asarray(mel_attention)
        if att.ndim == 3:
            att = att.mean(axis=0)
        fig, ax = plt.subplots(figsize=(10, 6))
        im = ax.imshow(att, aspect="auto", origin="lower", cmap="viridis")
        ax.set_xlabel("mel channel")
        ax.set_ylabel("mouth blendshape query")
        ax.set_yticks(range(len(MOUTH_INDICES)))
        ax.set_yticklabels(
            [ARKIT_BLENDSHAPES[i] for i in MOUTH_INDICES], fontsize=5)
        for name, (lo, hi) in frequency_bands(att.shape[-1]).items():
            ax.axvline(lo, color="w", lw=0.5, ls="--")
            ax.text(lo + 0.5, att.shape[0] - 1.5, name, color="w",
                    fontsize=6)
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
        out = self.save_dir / save_name
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return str(out)

    def plot_stream_weights(
        self,
        mel_weights: np.ndarray,          # (52,) logits
        emotion_weights: np.ndarray,      # (52,) logits
        temperature: float = 1.0,
        save_name: str = "stream_weights.png",
    ) -> str:
        """Per-blendshape softmax stream weights: the mouth/expression
        specialization picture (reference attention_viz stream plots)."""
        plt = _plt()
        logits = np.stack([np.asarray(mel_weights),
                           np.asarray(emotion_weights)]) / temperature
        ex = np.exp(logits - logits.max(axis=0, keepdims=True))
        w = ex / ex.sum(axis=0, keepdims=True)
        fig, ax = plt.subplots(figsize=(12, 4))
        x = np.arange(52)
        ax.bar(x, w[0], label="mel stream", color="#3b7dd8")
        ax.bar(x, w[1], bottom=w[0], label="emotion stream",
               color="#d87a3b")
        for i in MOUTH_INDICES:
            ax.axvspan(i - 0.5, i + 0.5, color="k", alpha=0.04)
        ax.set_xticks(x)
        ax.set_xticklabels(ARKIT_BLENDSHAPES, rotation=90, fontsize=5)
        ax.set_ylabel("stream weight")
        ax.legend(loc="upper right")
        ax.set_title("Per-blendshape stream fusion weights "
                     "(shaded = mouth set)")
        out = self.save_dir / save_name
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return str(out)

    def specialization_summary(self, mel_weights, emotion_weights,
                               temperature: float = 1.0) -> dict:
        """Scalar stream-specialization metrics (no plotting)."""
        logits = np.stack([np.asarray(mel_weights),
                           np.asarray(emotion_weights)]) / temperature
        ex = np.exp(logits - logits.max(axis=0, keepdims=True))
        w = ex / ex.sum(axis=0, keepdims=True)
        mouth = np.asarray(MOUTH_INDICES)
        expr = np.asarray(EXPRESSION_INDICES)
        return {
            "mel_weight_on_mouth": float(w[0, mouth].mean()),
            "mel_weight_on_expression": float(w[0, expr].mean()),
            "emotion_weight_on_mouth": float(w[1, mouth].mean()),
            "emotion_weight_on_expression": float(w[1, expr].mean()),
            "specialization": float(
                w[0, mouth].mean() + w[1, expr].mean()) / 2,
        }
