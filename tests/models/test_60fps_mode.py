"""60 fps mode (BASELINE config #3): hop halves (533 -> 266), window frames
double for the same time context, blendshape targets auto-resample 30<->60
(reference configs/model/dual_stream_60fps.yaml + sequential_dataset fps
resampling)."""

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.data.io import resample_blendshapes
from koemorph_tpu.models.dual_stream_model import (
    SequentialDualStreamModel,
    SimplifiedDualStreamModel,
    TemporalState,
)


class TestSixtyFps:
    def test_hop_length(self):
        m30 = SimplifiedDualStreamModel(target_fps=30)
        m60 = SimplifiedDualStreamModel(target_fps=60)
        assert m30.hop_length == 533
        assert m60.hop_length == 266

    def test_forward_at_60fps(self, dummy_audio):
        model = SimplifiedDualStreamModel(
            d_model=32, num_heads=2, mel_sequence_length=32,
            emotion_backend="basic", use_concatenation=False,
            target_fps=60, dropout=0.0)
        audio = jnp.asarray(dummy_audio[: 32 * 266][None])
        st = TemporalState.create(1)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), audio, st)
        out, _ = model.apply(params, audio, st)
        bs = np.asarray(out["blendshapes"])
        assert bs.shape == (1, 52)
        assert bs.min() >= 0 and bs.max() <= 1

    def test_sequential_output_rate_doubles(self, dummy_audio):
        """Same audio span yields ~2x the output frames at 60 fps."""
        kw = dict(d_model=32, num_heads=2, mel_sequence_length=16,
                  emotion_backend="basic", use_concatenation=False,
                  stride_frames=1, dropout=0.0)
        audio_s = 0.8  # seconds beyond the window
        outs = {}
        for fps in (30, 60):
            model = SequentialDualStreamModel(target_fps=fps, **kw)
            hop = model.hop_length
            span = 16 * hop + int(audio_s * 16000)
            a = jnp.asarray(dummy_audio[:span][None])
            params = jax.jit(model.init)(jax.random.PRNGKey(0), a)
            outs[fps] = model.apply(params, a)["blendshapes"].shape[1]
        assert outs[60] == 2 * outs[30] or abs(outs[60] - 2 * outs[30]) <= 2

    def test_blendshape_resample_30_to_60(self):
        """Linear-interpolation resampling fidelity (reference
        sequential_dataset.py:108-154): a linear ramp stays exact."""
        t30 = np.linspace(0, 1, 31)[:, None] * np.ones((31, 52))
        up = resample_blendshapes(t30.astype(np.float32), 30.0, 60.0)
        assert up.shape[0] in (61, 62)
        # ramp stays a ramp (linear interp is exact on linear signals)
        diffs = np.diff(up[:, 0])
        np.testing.assert_allclose(diffs, diffs[0], atol=1e-5)

    def test_blendshape_resample_60_to_30(self):
        x = np.random.default_rng(0).uniform(0, 1, (60, 52)).astype(
            np.float32)
        down = resample_blendshapes(x, 60.0, 30.0)
        assert down.shape[0] in (30, 31)
        assert down.min() >= 0 and down.max() <= 1

    def test_roundtrip_preserves_signal(self):
        """30 -> 60 -> 30 round trip stays close on smooth signals."""
        t = np.arange(90) / 30.0
        x = (0.5 + 0.4 * np.sin(2 * np.pi * 1.5 * t))[:, None] * np.ones(
            (90, 52))
        up = resample_blendshapes(x.astype(np.float32), 30.0, 60.0)
        back = resample_blendshapes(up, 60.0, 30.0)
        n = min(len(back), len(x))
        np.testing.assert_allclose(back[:n, 0], x[:n, 0], atol=0.02)
