"""Persistent XLA compilation cache for TPU-side entry points.

This host has a single CPU core, so cold compiles dominate iteration time;
caching compiled executables on disk makes repeated runs of the perf
harnesses / apps start in seconds. Tests configure their own cache
(tests/conftest.py); call ``enable_persistent_cache()`` at the top of any
TPU entry point.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.environ.get("EDE_JAX_CACHE", "/root/.cache/ede_jax")


def enable_persistent_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
