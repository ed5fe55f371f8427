"""The 4-term depth training loss (depth + ∇x + ∇y + surface normal).

Exact semantics of the reference's inline loss (ReSIDE/train.py:216-236):

    L = mean(log(|ô−d|+0.5))
      + mean(|1 − cos(n̂, n)|)          n = (−∇x, −∇y, 1), cosine eps = 0
      + mean(log(|∇x̂−∇x|+0.5)) + mean(log(|∇ŷ−∇ŷ|+0.5))

with ∇ the fixed Sobel stencil (zero padding 1). Two implementations:

  * ``depth_loss_terms`` — pure XLA; the Sobel convs and elementwise terms
    fuse into a handful of kernels.
  * ``fused_depth_loss`` (ops/pallas/fused_loss.py) — a single Pallas kernel
    computing the stencil and all four reductions in one VMEM pass, with a
    custom VJP; used by the TPU train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.ops.sobel import sobel_gradients

__all__ = ["depth_loss_terms", "depth_loss"]


def depth_loss_terms(output: jax.Array, depth: jax.Array) -> dict[str, jax.Array]:
    """Loss terms for NHWC single-channel ``output``/``depth``."""
    output = output.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    gx_o, gy_o = sobel_gradients(output)
    gx_d, gy_d = sobel_gradients(depth)

    loss_depth = jnp.mean(jnp.log(jnp.abs(output - depth) + 0.5))
    loss_dx = jnp.mean(jnp.log(jnp.abs(gx_o - gx_d) + 0.5))
    loss_dy = jnp.mean(jnp.log(jnp.abs(gy_o - gy_d) + 0.5))

    # normals (−gx, −gy, 1); cosine similarity with eps=0
    dot = gx_o * gx_d + gy_o * gy_d + 1.0
    norm_o = jnp.sqrt(jnp.square(gx_o) + jnp.square(gy_o) + 1.0)
    norm_d = jnp.sqrt(jnp.square(gx_d) + jnp.square(gy_d) + 1.0)
    cos = dot / (norm_o * norm_d)
    loss_normal = jnp.mean(jnp.abs(1.0 - cos))

    return {
        "depth": loss_depth,
        "dx": loss_dx,
        "dy": loss_dy,
        "normal": loss_normal,
    }


def depth_loss(output: jax.Array, depth: jax.Array) -> jax.Array:
    t = depth_loss_terms(output, depth)
    return t["depth"] + t["normal"] + (t["dx"] + t["dy"])
