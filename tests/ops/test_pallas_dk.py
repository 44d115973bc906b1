"""Durand-Kerner Pallas kernel vs the unrolled XLA form.

The kernel (ops/pallas/dk_roots_kernel.py) must be a drop-in for
ops.egemaps._poly_roots_dk: same starting points, same simultaneous
update, same guard. On CPU it runs in interpreter mode — the same code
path the TPU executes, minus Mosaic lowering.
"""

import jax.numpy as jnp
import numpy as np

from koemorph_tpu.ops.egemaps import _levinson, _poly_roots_dk
from koemorph_tpu.ops.pallas.dk_roots_kernel import poly_roots_dk_pallas
from koemorph_tpu.ops.stft import autocorr_matmul

SR = 16000


def _lpc_polys(n_frames: int = 24) -> np.ndarray:
    """Monic LPC polynomials from Levinson over vowel-like frames — the
    only inputs the production chain ever feeds the root solver."""
    rng = np.random.default_rng(0)
    t = np.arange(400) / SR
    x = rng.standard_normal((n_frames, 400)).astype(np.float32) * 0.05
    x += (0.5 * np.sin(2 * np.pi * 700 * t)
          + 0.3 * np.sin(2 * np.pi * 1220 * t)
          + 0.2 * np.sin(2 * np.pi * 2600 * t))[None, :].astype(np.float32)
    x *= np.hanning(400)[None, :].astype(np.float32)
    r = np.asarray(autocorr_matmul(jnp.asarray(x), 11)).copy()
    r[..., 0] *= 1.0001
    return np.asarray(_levinson(jnp.asarray(r), 10)).astype(np.float32)


def _hausdorff(za: np.ndarray, zb: np.ndarray) -> np.ndarray:
    """Per-row set distance (root ORDER is arbitrary in both forms)."""
    d = np.abs(za[:, :, None] - zb[:, None, :])
    return np.maximum(d.min(axis=2).max(axis=1), d.min(axis=1).max(axis=1))


class TestPallasDk:
    def test_matches_xla_form_on_lpc_polys(self):
        a = _lpc_polys()
        za = np.asarray(poly_roots_dk_pallas(jnp.asarray(a)))
        zb = np.asarray(_poly_roots_dk(jnp.asarray(a)))
        h = _hausdorff(za, zb)
        # float-rounding-level agreement on well-conditioned frames
        # (pathological clustered-root frames can diverge in BOTH forms
        # across backends; these clean vowel frames never do)
        assert np.median(h) < 1e-5
        assert np.max(h) < 1e-3, h.max()

    def test_matches_np_roots(self):
        a = _lpc_polys(8)
        za = np.asarray(poly_roots_dk_pallas(jnp.asarray(a)))
        for i in range(8):
            ref = np.sort_complex(np.roots(a[i]).astype(np.complex64))
            got = np.sort_complex(za[i])
            d = _hausdorff(got[None], ref[None])[0]
            assert d < 1e-3, (i, d)

    def test_batch_shapes(self):
        a = _lpc_polys(6)
        flat = np.asarray(poly_roots_dk_pallas(jnp.asarray(a)))
        nested = np.asarray(poly_roots_dk_pallas(
            jnp.asarray(a.reshape(3, 2, 11))))
        assert nested.shape == (3, 2, 10)
        np.testing.assert_allclose(nested.reshape(6, 10), flat)

    def test_multi_block_grid(self):
        a = np.tile(_lpc_polys(6), (50, 1))         # 300 rows -> 3 blocks
        one = np.asarray(poly_roots_dk_pallas(jnp.asarray(a)))
        blocked = np.asarray(poly_roots_dk_pallas(jnp.asarray(a),
                                                  block_r=128))
        np.testing.assert_allclose(blocked, one)
