"""Fused upsample→conv: exact algebraic rewrite of the UpProjection pattern.

The Hu2018 decoder's hot pattern is ``conv5×5(bilinear_upsample(x))``
(ReSIDE/models/modules.py:33-37). Computed directly, the MFF branch
upsamples a 2048-channel 8×10 map to 114×152 *before* reducing it to 16
channels — a ~71 MB intermediate and ~28 GFLOPs per frame for RN50.

Because both the bilinear resize and the channel contraction are linear,
they commute exactly:

    y[p,q,o] = Σ_{dp,dq} Σ_{i,j} A[p+dp-2, i] · B[q+dq-2, j]
                 · (Σ_c K[dp,dq,c,o] · x[i,j,c])

so we (1) apply all 25 kernel taps as one matmul at the SMALL resolution,
then (2) resize each tap's result with row/column-shifted interpolation
matrices (zero rows outside the conv's zero padding). FLOPs and the HBM
intermediate shrink by roughly the upsampling area ratio.

``should_fuse`` picks the path with the smaller intermediate, so the 2×
decoder upsamples stay on the direct path while the many-×-upscale MFF
branches use the rewrite. Bit-wise this reorders float accumulation only
(≤1e-6 relative, test-verified).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.ops.resize import bilinear_align_corners_matrix

__all__ = ["should_fuse", "upsample_conv"]


@functools.lru_cache(maxsize=None)
def _shifted_matrices(in_size: int, out_size: int, taps: int = 5) -> np.ndarray:
    """(taps, out_size, in_size): row p of slice d is the interpolation row
    for upsampled position p + d - taps//2, zero outside (conv zero padding)."""
    base = bilinear_align_corners_matrix(in_size, out_size)
    radius = taps // 2
    shifted = np.zeros((taps, out_size, in_size), np.float32)
    for d in range(taps):
        lo = max(0, radius - d)
        hi = min(out_size, out_size + radius - d)
        shifted[d, lo:hi] = base[lo + d - radius: hi + d - radius]
    return shifted


def should_fuse(in_hw: tuple[int, int], out_hw: tuple[int, int],
                cin: int, cout: int, taps: int = 5) -> bool:
    """Fuse when the 25-tap small-res intermediate is smaller than the
    direct upsampled intermediate (guarantees both FLOP and HBM wins)."""
    small = taps * taps * in_hw[0] * in_hw[1] * cout
    direct = out_hw[0] * out_hw[1] * cin
    return small < direct


def upsample_conv(x: jax.Array, kernel: jax.Array,
                  size: tuple[int, int]) -> jax.Array:
    """Exactly ``conv2d(resize_bilinear_align_corners(x, size), kernel,
    padding=taps//2)`` for NHWC ``x`` and HWIO ``kernel`` (square, odd)."""
    taps = kernel.shape[0]
    n, hs, ws, ci = x.shape
    h_out, w_out = int(size[0]), int(size[1])
    co = kernel.shape[-1]

    a = jnp.asarray(_shifted_matrices(hs, h_out, taps), x.dtype)
    b = jnp.asarray(_shifted_matrices(ws, w_out, taps), x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    # (1) all taps' channel contractions at the small resolution (one matmul)
    k = kernel.astype(x.dtype).reshape(taps, taps, ci, co)
    z = jnp.einsum("nhwc,pqco->nhwpqo", x, k, precision=prec)
    # (2) width resize per dq tap, then height resize per dp tap
    v = jnp.einsum("qWw,nhwpqo->nhWpo", b, z, precision=prec)
    y = jnp.einsum("pHh,nhWpo->nHWo", a, v, precision=prec)
    return y
