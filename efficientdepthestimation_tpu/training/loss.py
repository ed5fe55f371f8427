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


def depth_loss_terms(output: jax.Array, depth: jax.Array,
                     num_valid=None) -> dict[str, jax.Array]:
    """Loss terms for NHWC single-channel ``output``/``depth``.

    ``num_valid`` (optional traced scalar): only the first ``num_valid``
    samples contribute — pad_last duplicates in the final batch of an epoch
    carry zero loss weight, so the tail gradient matches training at the true
    batch size (torch's DataLoader default keeps the partial batch).
    """
    output = output.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    gx_o, gy_o = sobel_gradients(output)
    gx_d, gy_d = sobel_gradients(depth)

    term_depth = jnp.log(jnp.abs(output - depth) + 0.5)
    term_dx = jnp.log(jnp.abs(gx_o - gx_d) + 0.5)
    term_dy = jnp.log(jnp.abs(gy_o - gy_d) + 0.5)

    # normals (−gx, −gy, 1); cosine similarity with eps=0
    dot = gx_o * gx_d + gy_o * gy_d + 1.0
    norm_o = jnp.sqrt(jnp.square(gx_o) + jnp.square(gy_o) + 1.0)
    norm_d = jnp.sqrt(jnp.square(gx_d) + jnp.square(gy_d) + 1.0)
    cos = dot / (norm_o * norm_d)
    term_normal = jnp.abs(1.0 - cos)

    if num_valid is None:
        reduce = jnp.mean
    else:
        n = output.shape[0]
        mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
        mask = mask.reshape((n,) + (1,) * (output.ndim - 1))
        denom = jnp.sum(mask) * float(np_prod(output.shape[1:]))

        def reduce(x):
            return jnp.sum(x * mask) / denom

    return {
        "depth": reduce(term_depth),
        "dx": reduce(term_dx),
        "dy": reduce(term_dy),
        "normal": reduce(term_normal),
    }


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def depth_loss(output: jax.Array, depth: jax.Array, num_valid=None) -> jax.Array:
    t = depth_loss_terms(output, depth, num_valid)
    return t["depth"] + t["normal"] + (t["dx"] + t["dy"])
