"""Durand-Kerner polynomial roots as ONE Pallas kernel.

The eGeMAPS formant stage solves a degree-10 LPC polynomial per frame
(ops/egemaps.py:_poly_roots_dk, replacing the host ``np.roots``
eigendecomposition the reference implicitly relies on through
opensmile). The XLA form unrolls 20 Weierstrass iterations into ~60-100
tiny elementwise kernels with an HBM round-trip between each — at the
B=1 streaming/full-window operating point the whole eGeMAPS chain is
kernel-launch bound, and at B=8 the iteration intermediates
((rows, 10, 10) complex pairwise differences) burn HBM bandwidth.

This kernel runs the ENTIRE iteration in VMEM: rows live on the 128
lanes, the 10 roots on sublanes, and a ``fori_loop`` carries the root
estimates through all iterations without ever leaving the core. Complex
arithmetic is explicit re/im f32 pairs (the VPU has no complex type).

Semantics match ``_poly_roots_dk`` exactly: same 0.9-circle starting
points, same simultaneous (Jacobi-style) update from the previous
iterate, same small-denominator guard. Exactness is pinned by
tests/ops/test_pallas_dk.py against the XLA form and ``np.roots``.

On non-TPU backends the kernel runs in interpreter mode (slow but
exact), so CPU tests validate the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["poly_roots_dk_pallas"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dk_kernel(a_ref, zre_ref, zim_ref, *, p: int, iters: int):
    """a_ref (p+1, R) monic coefficients -> roots re/im (p, R)."""
    a = [a_ref[i, :] for i in range(p + 1)]        # each (R,) f32
    r = a_ref.shape[1]

    # distinct non-symmetric starting points on a 0.9 circle (matches
    # _poly_roots_dk's z0 = 0.9 * exp(2j*pi*(k + 0.35)/p))
    ang = [2.0 * np.pi * (k + 0.35) / p for k in range(p)]
    zre0 = jnp.concatenate(
        [jnp.full((1, r), 0.9 * np.cos(t), jnp.float32) for t in ang])
    zim0 = jnp.concatenate(
        [jnp.full((1, r), 0.9 * np.sin(t), jnp.float32) for t in ang])

    def body(_, zz):
        zre, zim = zz                               # (p, R)
        # Horner P(z) for all roots at once: res = res * z + a_c
        pre = jnp.ones_like(zre)
        pim = jnp.zeros_like(zre)
        for c in range(1, p + 1):
            pre, pim = (pre * zre - pim * zim + a[c][None, :],
                        pre * zim + pim * zre)
        # denom_i = prod_{j != i} (z_i - z_j); row i of the j-th factor
        # is replaced by 1 (static mask — i == j contributes nothing)
        dre = jnp.ones_like(zre)
        dim = jnp.zeros_like(zre)
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        for j in range(p):
            ure = zre - zre[j, :][None, :]
            uim = zim - zim[j, :][None, :]
            skip = rows == j
            ure = jnp.where(skip, 1.0, ure)
            uim = jnp.where(skip, 0.0, uim)
            dre, dim = dre * ure - dim * uim, dre * uim + dim * ure
        mag2 = dre * dre + dim * dim
        small = mag2 < 1e-24                        # |denom| < 1e-12
        dre = jnp.where(small, 1.0, dre)
        dim = jnp.where(small, 0.0, dim)
        inv = 1.0 / (dre * dre + dim * dim)
        sre = (pre * dre + pim * dim) * inv         # P / denom
        sim = (pim * dre - pre * dim) * inv
        return (zre - jnp.where(small, 0.0, sre),
                zim - jnp.where(small, 0.0, sim))

    zre, zim = jax.lax.fori_loop(0, iters, body, (zre0, zim0))
    zre_ref[:, :] = zre
    zim_ref[:, :] = zim


@functools.partial(jax.jit, static_argnames=("iters", "block_r",
                                             "interpret"))
def poly_roots_dk_pallas(
    a: jnp.ndarray,                  # (..., p+1), a[..., 0] == 1
    iters: int = 20,
    *,
    block_r: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """All ``p`` complex roots of monic polynomials, (..., p) complex64.

    Drop-in for ``ops.egemaps._poly_roots_dk`` — one kernel launch per
    ``block_r`` rows instead of ~3 launches per iteration."""
    p = a.shape[-1] - 1
    batch = a.shape[:-1]
    rows = int(np.prod(batch)) if batch else 1
    r_pad = _round_up(max(rows, _LANE), min(block_r, _round_up(rows, _LANE)))
    block = min(block_r, r_pad)
    r_pad = _round_up(r_pad, block)
    # rows on lanes: (p+1, R). Padded rows get P(x) = x^p (all-zero
    # trailing coefficients) — their roots are discarded below.
    at = jnp.reshape(a.astype(jnp.float32), (rows, p + 1)).T
    at = jnp.pad(at, ((0, 0), (0, r_pad - rows)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    per_root = 10 * (p + 1) + 10 * p + 14           # flops/iter (re+im)
    zre, zim = pl.pallas_call(
        functools.partial(_dk_kernel, p=p, iters=iters),
        grid=(r_pad // block,),
        in_specs=[pl.BlockSpec((p + 1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((p, r_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=iters * p * per_root * r_pad,
            bytes_accessed=4 * r_pad * (3 * p + 1),
            transcendentals=0),
        interpret=interpret,
    )(at)
    z = (zre + 1j * zim).astype(jnp.complex64)      # (p, r_pad)
    return jnp.reshape(z[:, :rows].T, batch + (p,))
