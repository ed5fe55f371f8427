"""Sobel gradient operator (fixed-weight 3×3 stencil).

TPU-native equivalent of the reference's ``Sobel`` module
(ReSIDE/sobel.py:5-23): a constant-kernel conv producing (Gx, Gy) with zero
padding 1. Here it is a constant 3×3 depth-to-2ch conv that XLA folds and
fuses into the surrounding loss computation; the fully fused training loss
lives in ops/pallas/fused_loss.py and training/loss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.ops.conv import conv2d

__all__ = ["SOBEL_KX", "SOBEL_KY", "sobel_gradients"]

SOBEL_KX = np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], np.float32)
SOBEL_KY = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], np.float32)

# HWIO kernel: 3×3, 1 input channel, 2 output channels (Gx, Gy).
_SOBEL_HWIO = np.stack([SOBEL_KX, SOBEL_KY], axis=-1)[:, :, None, :]


def sobel_gradients(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Return (gx, gy), each (N, H, W, 1), for a single-channel NHWC input."""
    k = jnp.asarray(_SOBEL_HWIO, dtype=x.dtype)
    out = conv2d(x, k, stride=1, padding=1)
    return out[..., 0:1], out[..., 1:2]
