"""Batch normalization with exact PyTorch numerics.

Functional form used by the model modules; channel-last (NHWC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["batch_norm"]


def batch_norm(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-5,
) -> jax.Array:
    """Normalize NHWC ``x`` with per-channel statistics.

    In eval mode callers pass running statistics (torch BatchNorm2d eval);
    in train mode callers pass batch statistics and maintain EMAs themselves
    (see models/common.py BatchNorm module).
    """
    inv = jax.lax.rsqrt(var + eps)
    if scale is not None:
        inv = inv * scale
    out = x * inv + ((bias if bias is not None else 0.0) - mean * inv)
    return out
