"""Persistent XLA compilation cache.

The streaming step's first compile costs ~20 s through a remote-TPU
tunnel (BENCH_r01.json), which the reference never pays (eager PyTorch).
Enabling JAX's persistent compilation cache brings every later process
start to well under a second for already-seen graphs, so the rt/infer
CLIs reach frame one quickly (reference parity: scripts/rt.py starts
streaming immediately after model load).

Call :func:`enable_persistent_cache` before the first ``jit`` execution.
The env var ``KOEMORPH_COMPILE_CACHE`` overrides the location; setting it
to ``0``/``off`` disables the cache.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = "~/.cache/koemorph_tpu/xla"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing). Returns the cache directory, or None if disabled."""
    env = os.environ.get("KOEMORPH_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "false", "none"):
        return None
    cache_dir = os.path.expanduser(path or env or DEFAULT_CACHE_DIR)
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as exc:  # pragma: no cover - defensive
        logger.warning("persistent compile cache unavailable: %s", exc)
        return None
    return cache_dir
