"""Gather-free per-row indexing for TPU.

``jnp.take_along_axis`` on the minor axis lowers to a serial per-row loop
on TPU: a round-3 device trace (jax.profiler xplane) of the batched decode
measured 1.2-2.5 ms per gather over (8, 1703, .) arrays — independent of
how many columns were fetched, and ~100x the cost of streaming the same
array through the VPU. For small index counts K over a bin axis of a few
hundred, a one-hot compare + masked reduce is a dense elementwise pass
(K x the array size) that XLA fuses and vectorizes; it replaced every
data-dependent lookup in the eGeMAPS LLD chain.

Use take_along_axis when K * n_bins is large (the crossover is roughly
K * n_bins > ~10k per row) or when running on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["select_columns"]


def select_columns(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(x, idx, axis=-1)`` without a gather.

    Args:
        x: (..., N) values.
        idx: (..., K) int32 column indices into the last axis of ``x``.

    Returns:
        (..., K) selected values, as a one-hot compare + sum reduction
        (cost K * N elementwise ops — profitable on TPU for the small
        K, moderate N lookups DSP code makes).
    """
    n = x.shape[-1]
    iota = jnp.arange(n, dtype=idx.dtype)
    onehot = (idx[..., None] == iota).astype(x.dtype)   # (..., K, N)
    # multiply + reduce (not einsum/dot): stays a single VPU fusion, never
    # routed to the MXU as a degenerate batched matvec
    return jnp.sum(onehot * x[..., None, :], axis=-1)
