"""Tests for decoder / smoother / constraints (mirrors reference
tests/model/test_decoder.py: output range per activation, smoothing state
semantics, learnable-alpha grads, constraints, validator warnings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koemorph_tpu.models.decoder import (
    BlendshapeConstraints,
    BlendshapeDecoder,
    ConstraintState,
    SmootherState,
    TemporalSmoother,
    validate_blendshape_output,
)


class TestBlendshapeDecoder:
    def _make(self, **kw):
        mod = BlendshapeDecoder(dropout=0.0, **kw)
        x = jnp.ones((2, 52, 256))
        params = mod.init(jax.random.key(0), x)
        return mod, params, x

    def test_sigmoid_range(self, rng):
        mod, params, _ = self._make()
        x = jnp.asarray(rng.standard_normal((2, 52, 256)) * 3, jnp.float32)
        out = np.asarray(mod.apply(params, x))
        assert out.shape == (2, 52)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_tanh_range(self, rng):
        mod, params, _ = self._make(output_activation="tanh")
        x = jnp.asarray(rng.standard_normal((2, 52, 256)) * 3, jnp.float32)
        out = np.asarray(mod.apply(params, x))
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_wrong_seq_len_raises(self):
        mod = BlendshapeDecoder(dropout=0.0)
        with pytest.raises(ValueError, match="Expected 52"):
            mod.init(jax.random.key(0), jnp.ones((1, 51, 256)))

    def test_prev_blendshape_residual(self, rng):
        mod, params, _ = self._make()
        x = jnp.asarray(rng.standard_normal((1, 52, 256)), jnp.float32)
        prev = jnp.ones((1, 52))
        base = np.asarray(mod.apply(params, x))
        with_prev = np.asarray(mod.apply(params, x, prev))
        np.testing.assert_allclose(with_prev, 0.9 * base + 0.1, rtol=1e-5,
                                   atol=1e-5)

    def test_grad_flow(self, rng):
        mod, params, _ = self._make()
        x = jnp.asarray(rng.standard_normal((2, 52, 256)), jnp.float32)
        g = jax.grad(lambda p: mod.apply(p, x).var())(params)
        assert any(np.abs(np.asarray(v)).max() > 0
                   for v in jax.tree.leaves(g))

    @pytest.mark.parametrize("act", ["relu", "gelu", "swish", "leaky_relu"])
    def test_activations(self, act):
        mod, params, x = self._make(activation=act)
        out = mod.apply(params, x)
        assert np.isfinite(np.asarray(out)).all()


class TestTemporalSmoother:
    def test_exponential_state_carry(self):
        mod = TemporalSmoother(smoothing_method="exponential", alpha=0.8)
        params = mod.init(jax.random.key(0), jnp.ones((2, 52)),
                          SmootherState.create(2))
        state = SmootherState.create(2)
        x = jnp.ones((2, 52))
        # first: prev=0 -> smoothed = 0.8*0 + 0.2*1 = 0.2
        s1, state = mod.apply(params, x, state)
        np.testing.assert_allclose(np.asarray(s1), 0.2, rtol=1e-6)
        # second: 0.8*0.2 + 0.2*1 = 0.36
        s2, state = mod.apply(params, x, state)
        np.testing.assert_allclose(np.asarray(s2), 0.36, rtol=1e-6)

    def test_gaussian_smoothing_averages_history(self):
        mod = TemporalSmoother(smoothing_method="gaussian", window_size=5)
        state = SmootherState.create(1, window_size=5)
        params = mod.init(jax.random.key(0), jnp.ones((1, 52)), state)
        for v in [0.0, 1.0, 0.0, 1.0, 0.0]:
            out, state = mod.apply(params, jnp.full((1, 52), v), state)
        o = np.asarray(out)
        assert 0.0 < o.min() and o.max() < 1.0  # a weighted average

    def test_median_smoothing_rejects_outlier(self):
        mod = TemporalSmoother(smoothing_method="median", window_size=5)
        state = SmootherState.create(1, window_size=5)
        params = mod.init(jax.random.key(0), jnp.ones((1, 52)), state)
        for v in [0.5, 0.5, 0.5, 0.5, 99.0]:  # outlier last
            out, state = mod.apply(params, jnp.full((1, 52), v), state)
        np.testing.assert_allclose(np.asarray(out), 0.5)

    def test_learnable_alpha_gets_grad(self):
        mod = TemporalSmoother(smoothing_method="exponential", alpha=0.8,
                               learnable=True)
        state = SmootherState.create(1)
        params = mod.init(jax.random.key(0), jnp.ones((1, 52)), state)

        def loss(p):
            out, _ = mod.apply(p, jnp.ones((1, 52)), state)
            return out.sum()

        g = jax.grad(loss)(params)
        assert abs(float(g["params"]["alpha"])) > 0

    def test_scan_compatible(self):
        mod = TemporalSmoother(smoothing_method="exponential", alpha=0.8)
        state = SmootherState.create(1)
        params = mod.init(jax.random.key(0), jnp.ones((1, 52)), state)
        xs = jnp.ones((10, 1, 52))

        def step(carry, x):
            out, carry = mod.apply(params, x, carry)
            return carry, out

        _, outs = jax.lax.scan(step, state, xs)
        o = np.asarray(outs)[:, 0, 0]
        # monotone approach toward 1.0 from 0
        assert (np.diff(o) > 0).all() and o[-1] < 1.0


class TestBlendshapeConstraints:
    def test_value_clamp(self):
        mod = BlendshapeConstraints()
        x = jnp.full((2, 52), 1.5)
        params = mod.init(jax.random.key(0), x)
        out, _ = mod.apply(params, x)
        assert np.asarray(out).max() <= 1.0

    def test_mutual_exclusion_normalizes_pairs(self):
        mod = BlendshapeConstraints(mutual_exclusions=((0, 1),))
        x = jnp.zeros((1, 52)).at[0, 0].set(0.8).at[0, 1].set(0.8)
        params = mod.init(jax.random.key(0), x)
        out, _ = mod.apply(params, x)
        o = np.asarray(out)
        np.testing.assert_allclose(o[0, 0] + o[0, 1], 1.0, rtol=1e-4)

    def test_violation_reporting(self):
        mod = BlendshapeConstraints(mutual_exclusions=((0, 1),))
        x = jnp.full((1, 52), 1.2)
        params = mod.init(jax.random.key(0), x)
        out, violations = mod.apply(params, x, apply_constraints=True,
                                    return_violations=True)
        assert float(violations["range_violations"]) > 0
        assert "exclusion_0_1" in violations

    def test_temporal_smoothness_state(self):
        mod = BlendshapeConstraints()
        state = ConstraintState.create(1)
        x1 = jnp.zeros((1, 52))
        params = mod.init(jax.random.key(0), x1, state)
        _, v1, state = mod.apply(params, x1, state, return_violations=True)
        assert float(v1["temporal_smoothness"]) == 0.0  # no prev yet
        x2 = jnp.ones((1, 52))
        _, v2, state = mod.apply(params, x2, state, return_violations=True)
        np.testing.assert_allclose(float(v2["temporal_smoothness"]), 1.0)


class TestValidator:
    def test_valid_output(self, rng):
        res = validate_blendshape_output(
            rng.uniform(0, 1, (4, 52)).astype(np.float32))
        assert res["valid"]

    def test_wrong_shape(self):
        res = validate_blendshape_output(np.zeros((4, 51)))
        assert not res["valid"]

    def test_nan_detected(self):
        x = np.zeros((2, 52))
        x[0, 0] = np.nan
        res = validate_blendshape_output(x)
        assert not res["valid"]
        assert any("NaN" in w for w in res["warnings"])

    def test_out_of_range_warned(self):
        x = np.full((2, 52), 1.5)
        res = validate_blendshape_output(x)
        assert any("above 1" in w for w in res["warnings"])

    def test_dead_blendshapes_warned(self):
        res = validate_blendshape_output(np.zeros((4, 52)))
        assert any("inactive" in w for w in res["warnings"])
