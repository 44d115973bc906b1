"""Blendshape decoder, temporal smoothing, and output constraints.

Parity targets: reference src/model/decoder.py. The key structural change is
that every piece of mutable state the reference keeps in registered buffers
(``prev_output``, circular ``history``, ``history_ptr``) becomes an explicit
functional carry (:class:`SmootherState`, :class:`ConstraintState`) so the
modules compose under ``jit`` / ``lax.scan`` and are race-free by
construction (reference hazard noted in SURVEY.md section 5.2).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


class BlendshapeDecoder(nn.Module):
    """MLP decoder (B, 52, d_model) -> (B, 52) with residual hidden layers
    and per-blendshape diagonal extraction
    (reference src/model/decoder.py:21-177)."""

    d_model: int = 256
    hidden_dim: int = 128
    num_blendshapes: int = 52
    num_layers: int = 2
    activation: str = "gelu"
    dropout: float = 0.1
    output_activation: str = "sigmoid"  # sigmoid | tanh | none
    use_residual: bool = True
    use_layer_norm: bool = True
    bias: bool = True

    def _act(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "gelu":
            # exact (erf) gelu — torch nn.GELU default; flax defaults to the
            # tanh approximation, which differs by ~2e-4
            return nn.gelu(x, approximate=False)
        if self.activation == "swish":
            return nn.silu(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=0.1)
        raise ValueError(f"Unknown activation: {self.activation}")

    @nn.compact
    def __call__(
        self,
        attention_output: jnp.ndarray,              # (B, 52, d_model)
        prev_blendshapes: Optional[jnp.ndarray] = None,  # (B, 52)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, seq_len, _ = attention_output.shape
        if seq_len != self.num_blendshapes:
            raise ValueError(
                f"Expected {self.num_blendshapes} blendshapes, got {seq_len}"
            )
        init = nn.initializers.xavier_uniform()
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)  # noqa: E731

        x = drop(self._act(
            nn.Dense(self.hidden_dim, use_bias=self.bias, kernel_init=init,
                     name="input_proj")(attention_output)))
        for i in range(self.num_layers):
            residual = x
            x = nn.Dense(self.hidden_dim, use_bias=self.bias,
                         kernel_init=init, name=f"hidden_{i}")(x)
            if self.use_layer_norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
            x = drop(self._act(x))
            if self.use_residual:
                x = x + residual

        # (B, 52, 52): each query token predicts all 52; keep the diagonal so
        # blendshape i depends only on its own attention output
        # (reference src/model/decoder.py:152-159).
        x = nn.Dense(self.num_blendshapes, use_bias=self.bias,
                     kernel_init=init, name="output_proj")(x)
        diag = jnp.arange(self.num_blendshapes)
        blendshapes = x[:, diag, diag]  # (B, 52)

        if self.output_activation == "sigmoid":
            blendshapes = nn.sigmoid(blendshapes)
        elif self.output_activation == "tanh":
            blendshapes = jnp.tanh(blendshapes)
        elif self.output_activation != "none":
            raise ValueError(
                f"Unknown output activation: {self.output_activation}")

        if prev_blendshapes is not None and self.use_residual:
            alpha = 0.1  # small stabilizing residual toward previous state
            blendshapes = (1 - alpha) * blendshapes + alpha * prev_blendshapes
        return blendshapes


@flax.struct.dataclass
class SmootherState:
    """Carry for :class:`TemporalSmoother` — explicit, static-shape."""

    prev_output: jnp.ndarray   # (B, 52)
    history: jnp.ndarray       # (window, B, 52)
    history_ptr: jnp.ndarray   # scalar int32

    @classmethod
    def create(cls, batch_size: int, num_blendshapes: int = 52,
               window_size: int = 5, dtype=jnp.float32) -> "SmootherState":
        return cls(
            prev_output=jnp.zeros((batch_size, num_blendshapes), dtype),
            history=jnp.zeros((window_size, batch_size, num_blendshapes),
                              dtype),
            history_ptr=jnp.zeros((), jnp.int32),
        )


class TemporalSmoother(nn.Module):
    """Exponential / Gaussian-window / median smoothing with an explicit
    state carry (reference src/model/decoder.py:180-350).

    Call as ``smoothed, new_state = smoother(blendshapes, state)``.
    """

    num_blendshapes: int = 52
    smoothing_method: str = "exponential"  # exponential | gaussian | median
    alpha: float = 0.8
    window_size: int = 5
    learnable: bool = False

    @staticmethod
    def _gaussian_weights(window_size: int) -> np.ndarray:
        x = np.arange(window_size, dtype=np.float32)
        center = (window_size - 1) / 2
        sigma = window_size / 6  # 3-sigma window
        w = np.exp(-0.5 * ((x - center) / sigma) ** 2)
        return (w / w.sum()).astype(np.float32)

    @nn.compact
    def __call__(
        self, blendshapes: jnp.ndarray, state: SmootherState
    ) -> tuple[jnp.ndarray, SmootherState]:
        if self.smoothing_method == "exponential":
            if self.learnable:
                raw = self.param("alpha", lambda k: jnp.asarray(
                    self.alpha, dtype=jnp.float32))
                alpha = nn.sigmoid(raw)
            else:
                alpha = jnp.asarray(self.alpha)
            smoothed = alpha * state.prev_output + (1 - alpha) * blendshapes
            new_state = state.replace(
                prev_output=jax.lax.stop_gradient(smoothed))
            return smoothed, new_state

        # windowed methods share the circular history update
        history = state.history.at[state.history_ptr].set(
            jax.lax.stop_gradient(blendshapes))
        ptr = (state.history_ptr + 1) % self.window_size

        if self.smoothing_method == "gaussian":
            if self.learnable:
                w = self.param(
                    "gaussian_weights",
                    lambda k: jnp.full((self.window_size,),
                                       1.0 / self.window_size),
                )
                w = nn.softmax(w)
            else:
                w = jnp.asarray(self._gaussian_weights(self.window_size))
            smoothed = jnp.sum(w[:, None, None] * history, axis=0)
        elif self.smoothing_method == "median":
            smoothed = jnp.median(history, axis=0)
        else:
            raise ValueError(
                f"Unknown smoothing method: {self.smoothing_method}")

        return smoothed, state.replace(history=history, history_ptr=ptr)


@flax.struct.dataclass
class ConstraintState:
    """Previous-frame state for temporal-smoothness violation reporting."""

    prev_blendshapes: jnp.ndarray  # (B, 52)
    valid: jnp.ndarray             # scalar bool — prev holds a real frame

    @classmethod
    def create(cls, batch_size: int, num_blendshapes: int = 52,
               dtype=jnp.float32) -> "ConstraintState":
        return cls(
            prev_blendshapes=jnp.zeros((batch_size, num_blendshapes), dtype),
            valid=jnp.zeros((), bool),
        )


class BlendshapeConstraints(nn.Module):
    """Value-range clamp, soft mutual exclusion, and temporal-smoothness
    reporting (reference src/model/decoder.py:353-470)."""

    num_blendshapes: int = 52
    mutual_exclusions: tuple[tuple[int, int], ...] = ((25, 26), (20, 21))
    min_values: tuple[float, ...] | None = None
    max_values: tuple[float, ...] | None = None

    @nn.compact
    def __call__(
        self,
        blendshapes: jnp.ndarray,                  # (B, 52)
        state: Optional[ConstraintState] = None,
        apply_constraints: bool = True,
        return_violations: bool = False,
    ):
        mins = (jnp.asarray(self.min_values)
                if self.min_values is not None
                else jnp.zeros(self.num_blendshapes))
        maxs = (jnp.asarray(self.max_values)
                if self.max_values is not None
                else jnp.ones(self.num_blendshapes))

        constrained = blendshapes
        violations: dict[str, jnp.ndarray] = {}

        if apply_constraints:
            constrained = jnp.clip(constrained, mins, maxs)
        if return_violations:
            violations["range_violations"] = jnp.mean(
                ((blendshapes < mins) | (blendshapes > maxs)).astype(
                    jnp.float32))

        for bs1, bs2 in self.mutual_exclusions:
            if apply_constraints:
                combined = constrained[:, bs1] + constrained[:, bs2] + 1e-8
                constrained = constrained.at[:, bs1].set(
                    constrained[:, bs1] / combined)
                constrained = constrained.at[:, bs2].set(
                    constrained[:, bs2] / combined)
            if return_violations:
                overlap = jnp.minimum(blendshapes[:, bs1],
                                      blendshapes[:, bs2])
                violations[f"exclusion_{bs1}_{bs2}"] = overlap.mean()

        new_state = None
        if state is not None:
            if return_violations:
                diff = jnp.abs(blendshapes - state.prev_blendshapes)
                violations["temporal_smoothness"] = jnp.where(
                    state.valid, diff.mean(), 0.0)
            new_state = state.replace(
                prev_blendshapes=jax.lax.stop_gradient(blendshapes),
                valid=jnp.ones((), bool),
            )

        if state is None:
            return constrained, (violations if return_violations else None)
        return constrained, (violations if return_violations else None), new_state


def validate_blendshape_output(blendshapes) -> dict:
    """Host-side QA of a (B, 52) blendshape array
    (reference src/model/decoder.py:473-533)."""
    bs = np.asarray(blendshapes)
    results: dict = {"valid": True, "warnings": [], "stats": {}}

    if bs.ndim != 2 or bs.shape[1] != 52:
        results["valid"] = False
        results["warnings"].append(f"Expected shape (B, 52), got {bs.shape}")
        return results

    mn, mx = float(bs.min()), float(bs.max())
    results["stats"]["value_range"] = (mn, mx)
    if mn < 0:
        results["warnings"].append(f"Negative values detected: {mn:.3f}")
    if mx > 1:
        results["warnings"].append(f"Values above 1 detected: {mx:.3f}")

    if np.isnan(bs).any():
        results["valid"] = False
        results["warnings"].append("NaN values detected")
    if np.isinf(bs).any():
        results["valid"] = False
        results["warnings"].append("Infinite values detected")

    mean_act = bs.mean(axis=0)
    results["stats"]["mean_activation"] = float(mean_act.mean())
    results["stats"]["std_activation"] = float(bs.std(axis=0).mean())
    results["stats"]["active_blendshapes"] = int((mean_act > 0.1).sum())

    dead = int((bs.max(axis=0) < 0.01).sum())
    results["stats"]["dead_blendshapes"] = dead
    if dead > 10:
        results["warnings"].append(f"Many inactive blendshapes: {dead}/52")

    saturated = int((bs.min(axis=0) > 0.9).sum())
    results["stats"]["saturated_blendshapes"] = saturated
    if saturated > 5:
        results["warnings"].append(
            f"Many saturated blendshapes: {saturated}/52")
    return results

