"""Profiling utility tests (RTF report format parity)."""

import time

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.utils.profiling import FrameTimer, benchmark, rtf_report


class TestFrameTimer:
    def test_timing_and_report(self):
        timer = FrameTimer(target_fps=30.0)
        for _ in range(5):
            with timer:
                time.sleep(0.001)
        r = timer.report()
        assert r["frames"] == 5
        assert r["avg_ms"] >= 1.0
        assert r["realtime_ok"]
        assert 0 < r["rtf"] < 1

    def test_empty_report(self):
        assert FrameTimer().report() == {"frames": 0}


class TestRtfReport:
    def test_fields(self):
        times = np.full(10, 0.01)
        r = rtf_report(times, 30.0)
        np.testing.assert_allclose(r["rtf"], 0.3, rtol=1e-6)
        np.testing.assert_allclose(
            [r["p95_ms"], r["max_ms"]], [r["avg_ms"]] * 2, rtol=1e-9)

    def test_over_budget_flags(self):
        r = rtf_report(np.full(3, 0.05), 30.0)
        assert not r["realtime_ok"]
        assert r["rtf"] > 1


class TestBenchmark:
    def test_jitted_fn(self):
        import jax
        f = jax.jit(lambda x: x * 2 + 1)
        stats = benchmark(f, (jnp.ones((64, 64)),), warmup=2, iters=5,
                          reps=2)
        assert stats["latency_ms"] > 0
        assert stats["throughput_per_s"] > 0


class TestConvPooling:
    def test_conv_pooling_shape_and_mean(self):
        from koemorph_tpu.features.emotion2vec import pool_to_fps
        x = jnp.asarray(np.arange(2 * 100 * 4, dtype=np.float32)
                        .reshape(2, 100, 4))
        out = pool_to_fps(x, audio_len=16000, sample_rate=16000,
                          target_fps=25.0, method="conv")
        assert out.shape == (2, 25, 4)
        # first pooled frame = mean of first k frames
        k = 4
        np.testing.assert_allclose(np.asarray(out[0, 0]),
                                   np.asarray(x[0, :k].mean(0)), rtol=1e-6)
