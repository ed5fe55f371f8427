"""Fused Sobel + 4-term depth loss as a single Pallas TPU kernel.

The reference computes the training loss with two extra conv launches and a
dozen elementwise kernels per step (ReSIDE/train.py:221-236). Here the Sobel
stencil, the log-L1 terms and the surface-normal cosine term are evaluated in
one VMEM pass per image — one HBM read of (pred, target), no intermediate
gradient tensors materialized.

Design:
  * grid over the batch; each program handles one (H, W) image block in VMEM.
  * the 3×3 stencil is computed by shifting a zero-padded copy (VPU shifts,
    no conv needed for a fixed 1-channel kernel).
  * per-image partial sums (4 terms) land in SMEM-sized outputs; the final
    mean is a tiny XLA reduction.
  * custom VJP: the backward pass is a short XLA graph (elementwise factors
    + two correlations with the flipped Sobel kernels) — exact gradients.

CPU tests run the kernel with ``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU for interpret mode, but be defensive.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from efficientdepthestimation_tpu.ops.sobel import SOBEL_KX, SOBEL_KY, sobel_gradients

__all__ = ["fused_depth_loss"]


def _pad2(x):
    # concat-based zero padding (update-slice/scatter don't lower on TPU TC)
    h, w = x.shape
    col = jnp.zeros((h, 1), x.dtype)
    x = jnp.concatenate([col, x, col], axis=1)
    row = jnp.zeros((1, w + 2), x.dtype)
    return jnp.concatenate([row, x, row], axis=0)


def _sobel2d(x):
    """(H, W) → (gx, gy) with zero padding, as VPU shift-adds."""
    p = _pad2(x)
    h, w = x.shape
    # neighbourhood slices: p[dy:dy+h, dx:dx+w] is x shifted by (1-dy, 1-dx)
    tl = p[0:h, 0:w]
    tc = p[0:h, 1:w + 1]
    tr = p[0:h, 2:w + 2]
    ml = p[1:h + 1, 0:w]
    mr = p[1:h + 1, 2:w + 2]
    bl = p[2:h + 2, 0:w]
    bc = p[2:h + 2, 1:w + 1]
    br = p[2:h + 2, 2:w + 2]
    gx = (tl - tr) + 2.0 * (ml - mr) + (bl - br)
    gy = (tl + 2.0 * tc + tr) - (bl + 2.0 * bc + br)
    return gx, gy


def _loss_kernel(pred_ref, target_ref, sums_ref):
    pred = pred_ref[0].astype(jnp.float32)
    target = target_ref[0].astype(jnp.float32)

    gx_o, gy_o = _sobel2d(pred)
    gx_d, gy_d = _sobel2d(target)

    s_depth = jnp.sum(jnp.log(jnp.abs(pred - target) + 0.5))
    s_dx = jnp.sum(jnp.log(jnp.abs(gx_o - gx_d) + 0.5))
    s_dy = jnp.sum(jnp.log(jnp.abs(gy_o - gy_d) + 0.5))

    dot = gx_o * gx_d + gy_o * gy_d + 1.0
    norm = jnp.sqrt((jnp.square(gx_o) + jnp.square(gy_o) + 1.0)
                    * (jnp.square(gx_d) + jnp.square(gy_d) + 1.0))
    s_normal = jnp.sum(jnp.abs(1.0 - dot / norm))

    # per-image partial sums land in a TPU-tile-shaped (8, 128) block
    # (Mosaic requires the trailing block dims be (8k, 128k)); only the
    # first 4 lanes of row 0 carry data.
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    block = jnp.zeros((8, 128), jnp.float32)
    for lane, value in enumerate((s_depth, s_dx, s_dy, s_normal)):
        block = jnp.where((rows == 0) & (cols == lane), value, block)
    sums_ref[0] = block


def _run_kernel(pred: jax.Array, target: jax.Array, mask: jax.Array,
                interpret: bool) -> jax.Array:
    n, h, w = pred.shape
    sums = pl.pallas_call(
        _loss_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(pred, target)
    # per-sample validity weighting (pad_last duplicates carry weight 0)
    per_term = jnp.sum(sums[:, 0, :4] * mask[:, None], axis=0)
    per_term = per_term / (jnp.sum(mask) * h * w)
    # total = depth + normal + dx + dy (train.py:236)
    return per_term[0] + per_term[3] + per_term[1] + per_term[2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_depth_loss(pred: jax.Array, target: jax.Array, mask: jax.Array,
                      interpret: bool) -> jax.Array:
    return _run_kernel(pred.reshape(pred.shape[0], *pred.shape[1:3]),
                       target.reshape(target.shape[0], *target.shape[1:3]),
                       mask, interpret)


def fused_depth_loss(pred: jax.Array, target: jax.Array,
                     interpret: bool = False, num_valid=None) -> jax.Array:
    """Fused loss over NHWC (N,H,W,1) or (N,H,W) pred/target.

    ``num_valid`` (optional traced scalar): only the first ``num_valid``
    samples contribute to the loss and its gradient — the masked mean is
    Σ valid / (num_valid·H·W).
    """
    n = pred.shape[0]
    if num_valid is None:
        mask = jnp.ones((n,), jnp.float32)
    else:
        mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
    return _fused_depth_loss(pred, target, mask, interpret)


def _fwd(pred, target, mask, interpret):
    return _fused_depth_loss(pred, target, mask, interpret), (pred, target, mask)


def _bwd(interpret, residuals, g):
    pred, target, mask = residuals
    shape = pred.shape
    p = pred.reshape(shape[0], shape[1], shape[2], 1).astype(jnp.float32)
    t = target.reshape(shape[0], shape[1], shape[2], 1).astype(jnp.float32)
    n_pix = jnp.sum(mask) * (p.shape[1] * p.shape[2])

    gx_o, gy_o = sobel_gradients(p)
    gx_d, gy_d = sobel_gradients(t)

    # dL_depth/dp
    diff = p - t
    d_depth = jnp.sign(diff) / (jnp.abs(diff) + 0.5)

    # dL_dx/dgx_o, dL_dy/dgy_o
    ddx = jnp.sign(gx_o - gx_d) / (jnp.abs(gx_o - gx_d) + 0.5)
    ddy = jnp.sign(gy_o - gy_d) / (jnp.abs(gy_o - gy_d) + 0.5)

    # normal term: c = dot / (no * nd)
    dot = gx_o * gx_d + gy_o * gy_d + 1.0
    no2 = jnp.square(gx_o) + jnp.square(gy_o) + 1.0
    no = jnp.sqrt(no2)
    nd = jnp.sqrt(jnp.square(gx_d) + jnp.square(gy_d) + 1.0)
    c = dot / (no * nd)
    s = -jnp.sign(1.0 - c)  # d|1-c|/dc
    dn_dgx = s * (gx_d / (no * nd) - c * gx_o / no2)
    dn_dgy = s * (gy_d / (no * nd) - c * gy_o / no2)

    # Backprop the stencil: correlation with flipped kernels == conv with the
    # 180°-rotated Sobel kernels (both are antisymmetric: flip == negate).
    import numpy as np

    from efficientdepthestimation_tpu.ops.conv import conv2d

    kx_flip = jnp.asarray(np.ascontiguousarray(SOBEL_KX[::-1, ::-1])[:, :, None, None])
    ky_flip = jnp.asarray(np.ascontiguousarray(SOBEL_KY[::-1, ::-1])[:, :, None, None])

    grad_from_gx = conv2d(ddx + dn_dgx, kx_flip, stride=1, padding=1)
    grad_from_gy = conv2d(ddy + dn_dgy, ky_flip, stride=1, padding=1)

    per_sample = mask.reshape((shape[0], 1, 1, 1))
    dp = (d_depth + grad_from_gx + grad_from_gy) * per_sample * (g / n_pix)
    return (dp.reshape(shape).astype(pred.dtype), jnp.zeros_like(target),
            jnp.zeros_like(mask))


_fused_depth_loss.defvjp(_fwd, _bwd)
