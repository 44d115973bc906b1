"""Export tests: SavedModel/TFLite round-trip parity on a tiny model
(reference export verification semantics, scripts/export_model.py:134-257)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from koemorph_tpu.export import (  # noqa: E402
    benchmark_fn,
    export_savedmodel,
    export_tflite,
    verify_export,
)
from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel  # noqa: E402


@pytest.fixture(scope="module")
def tiny_frame_fn():
    model = SimplifiedKoeMorphModel(d_model=32, num_heads=2,
                                    decoder_hidden=16, dropout=0.0)
    audio = jnp.zeros((1, 8000), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio)["params"]

    def fn(audio):
        return model.apply({"params": params}, audio, deterministic=True)

    example = (np.random.default_rng(0)
               .standard_normal((1, 8000)).astype(np.float32) * 0.1,)
    return fn, example


class TestSavedModel:
    def test_export_and_parity(self, tmp_path, tiny_frame_fn):
        fn, example = tiny_frame_fn
        report = export_savedmodel(fn, example, tmp_path / "sm")
        assert report.passed, f"max|diff|={report.max_abs_diff}"
        assert report.size_bytes > 0

    def test_reload_and_run(self, tmp_path, tiny_frame_fn):
        fn, example = tiny_frame_fn
        export_savedmodel(fn, example, tmp_path / "sm")
        loaded = tf.saved_model.load(str(tmp_path / "sm"))
        out = loaded.serve(example[0])
        ok, diff = verify_export(fn, lambda a: loaded.serve(a), example)
        assert ok, diff
        assert out.shape == (1, 52)


class TestTFLite:
    def test_export_and_parity(self, tmp_path, tiny_frame_fn):
        fn, example = tiny_frame_fn
        export_savedmodel(fn, example, tmp_path / "sm")
        report = export_tflite(tmp_path / "sm", tmp_path / "m.tflite",
                               fn=fn, example_args=example)
        assert report.passed, f"max|diff|={report.max_abs_diff}"
        assert (tmp_path / "m.tflite").stat().st_size == report.size_bytes


class TestBenchmark:
    def test_benchmark_fn(self, tiny_frame_fn):
        fn, example = tiny_frame_fn
        stats = benchmark_fn(jax.jit(fn), example, warmup=2, iters=5)
        assert stats["latency_ms"] > 0
        assert stats["throughput_per_s"] > 0


class TestQuantizedTflite:
    def test_dynamic_range_int8_smaller_and_close(self, tmp_path):
        """Dynamic-range quantization (the reference's mobile INT8 story,
        docs/experimental_results.md:201-206): ~4x smaller weights, output
        deviation bounded at 0.05 on [0,1] blendshapes."""
        import jax
        import jax.numpy as jnp

        from koemorph_tpu.export.exporter import (
            export_savedmodel, export_tflite)
        from koemorph_tpu.models.dual_stream import DualStreamCrossAttention

        att = DualStreamCrossAttention(
            d_model=64, num_heads=4, mel_sequence_length=32,
            emotion_dim=64, dropout=0.0)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.uniform(0, 1, (1, 32, 80)).astype(np.float32))
        det = jnp.asarray(rng.uniform(0, 1, (1, 3, 80)).astype(np.float32))
        emo = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))
        params = jax.jit(att.init)(jax.random.PRNGKey(0), mel, det, emo)

        def fn(mel, det, emo):
            return att.apply(params, mel, det, emo,
                             deterministic=True)["blendshapes"]

        sm = tmp_path / "sm"
        export_savedmodel(fn, (mel, det, emo), sm)
        fp32 = export_tflite(sm, tmp_path / "m.tflite", fn=fn,
                             example_args=(mel, det, emo))
        q = export_tflite(sm, tmp_path / "m_q.tflite", fn=fn,
                          example_args=(mel, det, emo),
                          quantize="dynamic")
        assert q.passed, q.max_abs_diff
        assert q.size_bytes < 0.6 * fp32.size_bytes, (
            q.size_bytes, fp32.size_bytes)

    def test_unknown_quantize_mode_raises(self, tmp_path):
        from koemorph_tpu.export.exporter import export_tflite

        with pytest.raises(ValueError):
            export_tflite(tmp_path, tmp_path / "x.tflite",
                          quantize="int4")
