"""Shared pytest fixtures.

Tests run on a virtual 8-device CPU platform so sharding/collective code
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Environment must be set before jax is first imported.

Fixture semantics mirror the reference test suite (reference:
tests/conftest.py): 16 kHz rate, 2 s sine+noise audio, random 52-coeff
blendshape targets.
"""

import os

# The image's profile exports JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on the virtual CPU mesh, so override forcibly before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is compile-bound on CPU (egemaps /
# prosody graphs take minutes); cached executables cut reruns drastically
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/koemorph_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

SAMPLE_RATE = 16000


@pytest.fixture(scope="session")
def sample_rate():
    return SAMPLE_RATE


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def dummy_audio(rng):
    """2 s of 220 Hz sine + noise, shape (L,) float32 in [-1, 1]."""
    t = np.arange(2 * SAMPLE_RATE) / SAMPLE_RATE
    x = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.05 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


@pytest.fixture()
def dummy_audio_batch(dummy_audio):
    """Batch of 2 audio clips, shape (2, L)."""
    return np.stack([dummy_audio, np.roll(dummy_audio, 123)], axis=0)


@pytest.fixture()
def dummy_blendshapes(rng):
    """Random valid blendshape frame, shape (52,) in [0, 1]."""
    return rng.uniform(0, 1, size=(52,)).astype(np.float32)


@pytest.fixture()
def dummy_blendshape_batch(rng):
    return rng.uniform(0, 1, size=(4, 52)).astype(np.float32)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
