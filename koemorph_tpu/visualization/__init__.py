"""Analysis-side plots: attention heatmaps, stream-weight specialization."""

from koemorph_tpu.visualization.attention_viz import (
    AttentionVisualizer,
    frequency_bands,
)

__all__ = ["AttentionVisualizer", "frequency_bands"]
