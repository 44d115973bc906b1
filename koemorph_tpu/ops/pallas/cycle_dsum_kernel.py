"""Per-glottal-cycle difference sums as ONE Pallas kernel.

The exact per-cycle jitter (ops/f0.py:_per_cycle_periods, OpenSMILE's
jitterLocal segmentation — reference src/features/opensmile_extractor.py
eGeMAPS rows) needs, per YIN frame,

    d(k, o) = sum_{j in cycle k} (x_j - z_{j + o})^2,
    z = the pick-aligned comparison span x[start : start + n]

for K cycle slots and the L = 2*half_lag+1 search offsets around the
frame-level pick. The XLA form materializes the shifted-difference
tensor ``(rows, J, L)`` and the cycle masks ``(rows, K, J)`` in HBM —
~1.4 GB of traffic for ~2 GFLOP of compute, measured 3.2 ms at the
B=8 x 17 s batched-decode shape. Per row the working set is ~1 KB, so
this kernel keeps every intermediate in VMEM.

Layout is Mosaic-canonical: ROWS ON LANES (128 frames per block),
samples on sublanes — the L offsets become static SUBLANE slices of the
z block, the cycle masks come from a sublane iota compared against the
per-lane period vector, and each (k, o) sum is one sublane reduction on
the VPU. No dynamic indexing, no scalar memory: the pick-aligned z is
gathered OUTSIDE in XLA by the gather-free binary select-shift chain
(ops/f0.py:_shift_rows — a real per-row gather measured 12.2 ms).

Semantics match ``_cycle_dsum`` exactly (same masks, f32 sums);
agreement is pinned by tests/ops/test_pallas_cycle_dsum.py. On non-TPU
backends the caller dispatches to the XLA form
(``lax.platform_dependent``); interpreter mode exists for the
equivalence test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cycle_dsum_lanes_pallas"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, z_ref, tau_ref, lim_ref, off_ref, out_ref, *, n: int,
            n_cycles: int, half_lag: int):
    n_lag = 2 * half_lag + 1
    span = n - n_lag + 1
    lanes = x_ref.shape[1]
    xh = x_ref[:span, :]                                   # (J, R)
    t = tau_ref[0, :]                                      # (R,)
    lim = lim_ref[0, :]                                    # (R,)
    off = off_ref[0, :]                                    # (R,)
    jj = jax.lax.broadcasted_iota(
        jnp.int32, (span, lanes), 0).astype(jnp.float32)
    sample_ok = jj <= lim[None, :]
    for k in range(n_cycles):
        # boundaries as fl(off + k*t) / fl(off + (k+1)*t), EXACTLY like
        # the XLA form's iota compares — fl(lo)+t can round differently
        # and double-count (or drop) a boundary sample between adjacent
        # cycles
        lo = off + k * t
        hi = off + (k + 1.0) * t
        m = ((jj >= lo[None, :]) & (jj < hi[None, :])
             & sample_ok).astype(jnp.float32)              # (J, R)
        for o in range(n_lag):
            e = xh - z_ref[o:o + span, :]
            out_ref[k * n_lag + o, :] = jnp.sum(m * e * e, axis=0)


@functools.partial(jax.jit, static_argnames=("n_cycles", "half_lag",
                                             "tau_max", "interpret"))
def cycle_dsum_lanes_pallas(
    frames: jnp.ndarray,             # (rows, n) f32 raw YIN frames
    z: jnp.ndarray,                  # (rows, n) f32 pick-aligned span
    start: jnp.ndarray,              # (rows,) int32 pick - half_lag
    tau: jnp.ndarray,                # (rows,) f32 frame-level period
    off: jnp.ndarray | None = None,  # (rows,) f32 cycle-grid phase
    *,
    n_cycles: int,
    half_lag: int,
    tau_max: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Cycle-restricted difference sums, (rows, n_cycles, 2*half_lag+1).

    Cycle k spans ``[off + k*tau, off + (k+1)*tau)`` (``off=0`` when
    None — the pre-phase-alignment grid)."""
    rows, n = frames.shape
    n_lag = 2 * half_lag + 1
    r_pad = _round_up(max(rows, _LANE), _LANE)
    # rows on lanes (samples on sublanes) — one transpose each in XLA
    xt = jnp.pad(frames.astype(jnp.float32).T, ((0, 0), (0, r_pad - rows)))
    zt = jnp.pad(z.astype(jnp.float32).T, ((0, 0), (0, r_pad - rows)))
    t = jnp.pad(tau.astype(jnp.float32), (0, r_pad - rows))[None, :]
    lim = ((n - 1.0) - 2.0 * half_lag
           - start.astype(jnp.float32))
    lim = jnp.pad(lim, (0, r_pad - rows))[None, :]
    if off is None:
        off = jnp.zeros((rows,), jnp.float32)
    offp = jnp.pad(off.astype(jnp.float32), (0, r_pad - rows))[None, :]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    span = n - n_lag + 1
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, n_cycles=n_cycles,
                          half_lag=half_lag),
        grid=(r_pad // _LANE,),
        in_specs=[
            pl.BlockSpec((n, _LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_cycles * n_lag, _LANE),
                               lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cycles * n_lag, r_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * r_pad * n_cycles * span * n_lag,
            bytes_accessed=4 * r_pad * (2 * n + n_cycles * n_lag),
            transcendentals=0),
        interpret=interpret,
    )(xt, zt, t, lim, offp)
    return out.T[:rows].reshape(rows, n_cycles, n_lag)
