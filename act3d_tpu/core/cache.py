"""Persistent XLA compilation cache setup.

First compilation of the reference-scale training step takes minutes; the
persistent cache makes subsequent processes start in seconds.  Call
``enable_compilation_cache()`` before the first jit execution (bench.py,
CLIs and tests do).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("ACT3D_JAX_CACHE", "~/.cache/act3d_tpu_jax"))


def enable_fast_prng() -> None:
    """Use the TPU-native 'rbg' PRNG (XLA RngBitGenerator) for all
    jax.random keys created afterwards.

    Threefry dropout-mask generation costs ~22 ms of the 75 ms training
    step at reference scale (BENCH_NOTES.md); rbg recovers most of it.
    Must run before the first key creation.
    """
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")


def enable_compilation_cache(path=None) -> None:
    import jax

    # per-platform subdirs: the remote compile server's CPU AOT artifacts
    # target different machine features than this host (SIGILL risk if a
    # shared cache serves them to local CPU runs)
    cache_dir = Path(path or _DEFAULT).expanduser() / jax.default_backend()
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
