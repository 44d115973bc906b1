"""Attention visualization tests (shapes + file outputs, analysis-only)."""

from pathlib import Path

import numpy as np

from koemorph_tpu.visualization import AttentionVisualizer, frequency_bands


class TestFrequencyBands:
    def test_bands_cover_channels(self):
        bands = frequency_bands(80)
        assert set(bands) == {"low (F0)", "mid (formants)",
                              "high (fricatives)"}
        lo = bands["low (F0)"]
        hi = bands["high (fricatives)"]
        assert lo[0] == 0
        assert hi[1] == 80


class TestVisualizer:
    def test_mel_attention_plot(self, tmp_path, rng):
        viz = AttentionVisualizer(tmp_path)
        att = rng.uniform(0, 1, (28, 80)).astype(np.float32)
        out = viz.plot_mel_attention(att)
        assert out.endswith(".png")
        # batched input also accepted
        out2 = viz.plot_mel_attention(att[None].repeat(2, 0),
                                      save_name="b.png")
        assert out2.endswith("b.png")

    def test_stream_weight_plot_and_summary(self, tmp_path, rng):
        viz = AttentionVisualizer(tmp_path)
        mel_w = rng.standard_normal(52)
        emo_w = rng.standard_normal(52)
        out = viz.plot_stream_weights(mel_w, emo_w)
        assert out.endswith(".png")
        s = viz.specialization_summary(mel_w, emo_w)
        # softmax weights sum to 1 per blendshape
        assert 0 <= s["specialization"] <= 1
        assert np.isclose(s["mel_weight_on_mouth"]
                          + s["emotion_weight_on_mouth"], 1.0, atol=1e-6)


class TestInteractiveHtml:
    def test_creates_selfcontained_html(self, tmp_path):
        from koemorph_tpu.visualization.attention_viz import (
            create_interactive_attention_html)

        rng = np.random.default_rng(0)
        out = create_interactive_attention_html(
            rng.random((28, 80)).astype(np.float32),
            rng.random((2, 24, 1)).astype(np.float32),
            tmp_path / "att.html")
        html = Path(out).read_text()
        # self-contained: no external scripts/styles
        assert "http" not in html.lower().replace("http-equiv", "")
        assert "<svg" in html and "jawOpen" in html
        assert "browInnerUp" in html          # expression names present
        assert "frequency band" in html.lower()

    def test_batched_mel_input_averaged(self, tmp_path):
        from koemorph_tpu.visualization.attention_viz import (
            create_interactive_attention_html)

        rng = np.random.default_rng(1)
        out = create_interactive_attention_html(
            rng.random((4, 28, 80)), None, tmp_path / "a.html")
        assert Path(out).exists()
