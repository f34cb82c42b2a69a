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
    """Enable the persistent compile cache — TPU backend only.

    TPU entries come from the remote compile server targeting the chip
    (re-warming costs ~10 min of remote compiles), so caching them is the
    difference between a 15-min and a 30-s bench start.

    The CPU backend is deliberately NOT cached: XLA:CPU persists
    AOT-compiled machine code stamped with the *compile-time* feature
    list, which includes tuning pseudo-features (+prefer-no-scatter,
    +prefer-no-gather) that never appear in the host's real CPU-flag set
    — so every load fails the feature check ("machine features ...
    doesn't match", cpu_aot_loader.cc) and recompiles anyway.  Verified
    round 4: entries written by THIS host minutes earlier re-fail on the
    next process; a host-ISA-fingerprinted subdir did not help.  The CPU
    cache therefore never hits here and only costs failed-load time plus
    an error line per lookup that drowns the driver's dryrun output.
    ACT3D_CPU_CACHE=1 re-enables it for experiments on hosts where the
    loader works.
    """
    import jax

    backend = jax.default_backend()
    if backend == "cpu" and os.environ.get("ACT3D_CPU_CACHE", "0") != "1":
        return
    cache_dir = Path(path or _DEFAULT).expanduser() / backend
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
