"""Backend-selection guard shared by the CLI entry points.

Some environments install a boot hook (sitecustomize) that force-sets
``jax_platforms`` to a hardware backend. If that backend's transport is down,
any app blocks indefinitely at first device use — even when the user
explicitly asked for CPU via ``JAX_PLATFORMS=cpu``. Calling this before the
first backend creation restores the explicit request (same guard as
``__graft_entry__._force_cpu_if_requested``).
"""

from __future__ import annotations

import os


def honor_explicit_cpu_request() -> None:
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # pragma: no cover - config locked after backend init
            pass
