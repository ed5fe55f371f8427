"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
XLA client is created with 8 host devices — this is the "fake backend" for
multi-chip mesh tests (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon boot hook (sitecustomize) force-sets
# jax_platforms="axon,cpu"; override it before any backend is created so the
# whole test session runs on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-forward tests are compile-bound on CPU;
# caching makes repeated suite runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
