"""Pallas cycle-dsum kernel == the XLA form, element-exact semantics.

The per-cycle jitter's difference sums (ops/f0.py:_cycle_dsum) have two
implementations: the lanes-layout Pallas kernel (TPU) and the masked
einsum (everywhere else). Both must compute the same sums — the kernel
runs here in interpreter mode so CPU CI validates the same code path
the chip compiles.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from koemorph_tpu.ops.f0 import _cycle_dsum, _shift_rows, yin_core  # noqa: E402
from koemorph_tpu.ops.pallas.cycle_dsum_kernel import (  # noqa: E402
    cycle_dsum_lanes_pallas,
)

TAU_MAX = 291          # ceil(16000 / 55), the eGeMAPS YIN config
N = 512
K = 8
H = 8


def _inputs(rows: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((rows, N)).astype(np.float32) * 0.3
    pick = rng.integers(32, TAU_MAX, size=rows).astype(np.int32)
    start = np.clip(pick - H, 0, TAU_MAX + H).astype(np.int32)
    tau = (pick + rng.uniform(-0.5, 0.5, size=rows)).astype(np.float32)
    return jnp.asarray(frames), jnp.asarray(start), jnp.asarray(tau)


def _z_of(frames, start):
    s_max = TAU_MAX + H
    n_bits = int(np.ceil(np.log2(s_max + 1)))
    pad = (1 << n_bits) - 1
    padded = jnp.concatenate(
        [frames, jnp.zeros((frames.shape[0], pad), frames.dtype)], -1)
    return _shift_rows(padded, start, N, s_max)


class TestCycleDsumKernel:
    @pytest.mark.parametrize("rows", [1, 8, 200])
    def test_matches_xla_form(self, rows):
        frames, start, tau = _inputs(rows, seed=rows)
        # _cycle_dsum on CPU lowers to the XLA branch (the reference)
        want = np.asarray(_cycle_dsum(frames, start, tau,
                                      tau_max=TAU_MAX, n_cycles=K,
                                      half_lag=H))
        z = _z_of(frames, start)
        got = np.asarray(cycle_dsum_lanes_pallas(
            frames, z, start, tau, n_cycles=K, half_lag=H,
            tau_max=TAU_MAX, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_extreme_periods(self):
        # lowest pitch (start at the clip edge) and highest pitch
        # (many cycles, deep shifts) both stay exact
        frames = jnp.asarray(
            np.random.default_rng(3).standard_normal((4, N)).astype(
                np.float32))
        start = jnp.asarray(np.array([0, TAU_MAX + H, 24, 100], np.int32))
        tau = jnp.asarray(np.array([8.0, TAU_MAX, 32.4, 108.7],
                                   np.float32))
        want = np.asarray(_cycle_dsum(frames, start, tau,
                                      tau_max=TAU_MAX, n_cycles=K,
                                      half_lag=H))
        got = np.asarray(cycle_dsum_lanes_pallas(
            frames, _z_of(frames, start), start, tau, n_cycles=K,
            half_lag=H, tau_max=TAU_MAX, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_shift_rows_matches_gather(self):
        # the XLA-side z construction the kernel consumes == a true
        # per-row gather
        frames, start, _ = _inputs(37, seed=5)
        got = np.asarray(_z_of(frames, start))
        s_max = TAU_MAX + H
        pad = (1 << int(np.ceil(np.log2(s_max + 1)))) - 1
        padded = jnp.concatenate(
            [frames, jnp.zeros((37, pad), jnp.float32)], -1)
        want = np.asarray(jax.vmap(
            lambda a, s: jax.lax.dynamic_slice(a, (s,), (N,)))(
                padded, start))
        np.testing.assert_array_equal(got, want)

    def test_yin_core_cycle_periods_consistent(self):
        # the public entry (yin_core(cycle_periods=8)) produces sane
        # periods through whichever backend computed the sums — on CPU
        # the dispatch takes the XLA branch, pinning the glue; the
        # kernel equality above pins the other branch
        rng = np.random.default_rng(7)
        t = np.arange(16000) / 16000.0
        x = jnp.asarray((0.4 * np.sin(2 * np.pi * 170.0 * t)
                         + 0.01 * rng.standard_normal(len(t))
                         ).astype(np.float32))
        core = yin_core(x, sample_rate=16000, frame_length=512,
                        hop_length=160, f0_min=55, f0_max=500,
                        center=False, cycle_periods=8)
        cp = np.asarray(core.cycle_period)
        cv = np.asarray(core.cycle_valid)
        voiced = np.asarray(core.result.voiced_flag)
        per = 16000.0 / 170.0
        assert cv[voiced].sum(-1).min() >= 2
        got = cp[voiced][cv[voiced]]
        assert np.abs(got - per).max() < 1.5, (got.min(), got.max())

    def test_phase_offset_matches_xla_form(self):
        # the cycle-grid phase alignment (off): both forms place cycle k
        # at [off + k*tau, off + (k+1)*tau) with identical rounding
        rng = np.random.default_rng(9)
        frames, start, tau = _inputs(64, seed=9)
        off = jnp.asarray(
            (rng.uniform(0, 0.5, 64) * np.asarray(tau)).astype(np.float32))
        want = np.asarray(_cycle_dsum(frames, start, tau,
                                      tau_max=TAU_MAX, n_cycles=K,
                                      half_lag=H, off=off))
        got = np.asarray(cycle_dsum_lanes_pallas(
            frames, _z_of(frames, start), start, tau, off, n_cycles=K,
            half_lag=H, tau_max=TAU_MAX, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
