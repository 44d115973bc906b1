"""Behavioral DSP tests for on-device F0 (mirrors reference
tests/features/test_prosody.py: detects a synthesized sine's F0 within
tolerance, silence -> unvoiced, noise robustness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.ops.f0 import yin_f0

SR = 16000


def sine(freq, secs=1.0, amp=0.5):
    t = np.arange(int(secs * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestYinF0:
    @pytest.mark.parametrize("freq", [110.0, 220.0, 330.0])
    def test_detects_sine_f0(self, freq):
        res = yin_f0(jnp.asarray(sine(freq)))
        f0 = np.asarray(res.f0_hz)
        voiced = np.asarray(res.voiced_flag)
        # interior frames (skip edges) must be voiced at ~freq
        inner = slice(5, -5)
        assert voiced[inner].mean() > 0.9
        med = np.median(f0[inner][voiced[inner]])
        assert abs(med - freq) < freq * 0.03  # 3% tolerance

    def test_silence_unvoiced(self):
        res = yin_f0(jnp.zeros(SR))
        assert np.asarray(res.voiced_flag).mean() < 0.1
        assert np.abs(np.asarray(res.f0_hz)).max() == 0.0

    def test_noise_mostly_unvoiced(self, rng):
        x = rng.standard_normal(SR).astype(np.float32) * 0.3
        res = yin_f0(jnp.asarray(x))
        assert np.asarray(res.voiced_flag).mean() < 0.5

    def test_noisy_sine_still_detected(self, rng):
        x = sine(220.0) + 0.05 * rng.standard_normal(SR).astype(np.float32)
        res = yin_f0(jnp.asarray(x))
        f0 = np.asarray(res.f0_hz)
        voiced = np.asarray(res.voiced_flag)
        inner = slice(5, -5)
        med = np.median(f0[inner][voiced[inner]])
        assert abs(med - 220.0) < 10.0

    def test_batched(self):
        x = jnp.stack([jnp.asarray(sine(110.0)), jnp.asarray(sine(220.0))])
        res = yin_f0(x)
        assert res.f0_hz.shape[0] == 2
        m0 = np.median(np.asarray(res.f0_hz)[0, 5:-5])
        m1 = np.median(np.asarray(res.f0_hz)[1, 5:-5])
        assert abs(m0 - 110) < 5 and abs(m1 - 220) < 8

    def test_frame_count(self):
        res = yin_f0(jnp.asarray(sine(220.0, secs=0.5)), hop_length=160)
        assert res.f0_hz.shape[0] == 1 + (SR // 2) // 160

    def test_frame_length_validation(self):
        with pytest.raises(ValueError, match="too small"):
            yin_f0(jnp.zeros(SR), frame_length=128, f0_min=50.0)


class TestStackedAcfGate:
    """The stacked-ACF form (small shapes) and the separate right-sized
    transforms (large shapes) must agree — same YIN spans, different GEMM
    layout, float-rounding-level differences only."""

    def test_stacked_matches_separate(self, monkeypatch):
        import koemorph_tpu.ops.f0 as f0m

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 40, 512)).astype(np.float32))
        stacked = f0m._yin_acfs(x, 326, 330, "highest", True)
        monkeypatch.setattr(f0m, "_ACF_STACK_MAX_ROWS", 0)
        separate = f0m._yin_acfs(x, 326, 330, "highest", True)
        for u, v in zip(stacked, separate):
            scale = float(np.max(np.abs(np.asarray(u))))
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-5 * scale)

    def test_f0_identical_across_gate(self, monkeypatch):
        import koemorph_tpu.ops.f0 as f0m

        t = np.arange(SR, dtype=np.float64) / SR
        x = jnp.asarray(np.sin(2 * np.pi * 170.0 * t).astype(np.float32))
        a = np.asarray(yin_f0(x).f0_hz)
        monkeypatch.setattr(f0m, "_ACF_STACK_MAX_ROWS", 0)
        b = np.asarray(yin_f0(x).f0_hz)
        np.testing.assert_allclose(a, b, atol=1e-3)


class TestShiftRows:
    def test_matches_dynamic_slice(self):
        import jax

        from koemorph_tpu.ops.f0 import _shift_rows

        rng = np.random.default_rng(11)
        s_max = 299
        n_out = 512
        n_bits = int(np.ceil(np.log2(s_max + 1)))
        src_len = n_out + (1 << n_bits) - 1
        x = jnp.asarray(rng.standard_normal((64, src_len)).astype(
            np.float32))
        shift = jnp.asarray(rng.integers(0, s_max + 1, size=64).astype(
            np.int32))
        got = np.asarray(_shift_rows(x, shift, n_out, s_max))
        want = np.asarray(jax.vmap(
            lambda a, s: jax.lax.dynamic_slice(a, (s,), (n_out,)))(
                x, shift))
        np.testing.assert_array_equal(got, want)

    def test_edge_shifts(self):
        import jax

        from koemorph_tpu.ops.f0 import _shift_rows

        x = jnp.asarray(np.arange(4 * 530, dtype=np.float32).reshape(
            4, 530))
        shift = jnp.asarray(np.array([0, 1, 7, 8], np.int32))
        got = np.asarray(_shift_rows(x, shift, 512, 7 + 1))
        want = np.asarray(jax.vmap(
            lambda a, s: jax.lax.dynamic_slice(a, (s,), (512,)))(
                x, shift))
        np.testing.assert_array_equal(got, want)

    def test_source_too_short_raises(self):
        from koemorph_tpu.ops.f0 import _shift_rows

        x = jnp.zeros((2, 500))
        with pytest.raises(ValueError, match="source length"):
            _shift_rows(x, jnp.zeros((2,), jnp.int32), 512, 10)
