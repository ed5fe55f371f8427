"""Fused upsample→conv: exact algebraic rewrite of the UpProjection pattern.

The Hu2018 decoder's hot pattern is ``conv5×5(bilinear_upsample(x))``
(ReSIDE/models/modules.py:33-37). Computed directly, the MFF branch
upsamples a 2048-channel 8×10 map to 114×152 *before* reducing it to 16
channels — a ~71 MB intermediate and ~28 GFLOPs per frame for RN50.

Because both the bilinear resize and the channel contraction are linear,
they commute exactly:

    y[P,Q,o] = Σ_{dp,dq} Σ_{h,w} A[P+dp-2, h] · B[Q+dq-2, w]
                 · (Σ_c K[dp,dq,c,o] · x[h,w,c])

so we (1) apply all 25 kernel taps as one matmul at the SMALL resolution,
then (2) resize each tap's result with row/column-shifted interpolation
matrices (zero rows outside the conv's zero padding). FLOPs and the HBM
intermediates shrink by roughly the upsampling area ratio.

An alternative decomposition (base-matrix resizes of the whole tap stack +
zero-padded output shifts) has ~5× fewer resize FLOPs but materializes a
taps²-wide stack at the *mid* resolution; measured on the v5e it loses to
this form on HBM traffic (118.8 vs 82.3 ms for the RN50-HU model stage at
batch 96), so the shifted-matrix form stays.

``should_fuse`` picks the cheaper path under a roofline cost model whose
predictions were validated per-site on the v5e chip
(perf/upproj_experiment.py), so cheap 2× decoder steps and the
many-×-upscale MFF branches each get their best form. Bit-wise the rewrite
reorders float accumulation only (≤1e-6 relative, test-verified).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.ops.resize import bilinear_align_corners_matrix

__all__ = ["should_fuse", "fuse_costs", "upsample_conv", "upsample_conv_pair"]


# ---------------------------------------------------------------------------
# cost model
# ---------------------------------------------------------------------------

# Achievable single-chip rates used by the roofline cost model (v5e: 197
# bf16 TFLOP/s peak, 819 GB/s HBM). Derated to what dense convs/einsums of
# these shapes actually sustain; only the ratio matters for the decision.
_FLOPS_PER_S = 1.0e14
_BYTES_PER_S = 5.5e11
_BPE = 2  # bf16 activations on the serving path


def _roofline(flops: float, bytes_: float) -> float:
    return max(flops / _FLOPS_PER_S, bytes_ / _BYTES_PER_S)


def fuse_costs(in_hw: tuple[int, int], out_hw: tuple[int, int],
               cin: int, cout: int, taps: int = 5) -> tuple[float, float]:
    """(direct, fused) estimated seconds per frame per branch.

    direct: bilinear upsample (write+read the out_px·cin intermediate) then
    a taps² conv at the large resolution.
    fused (upsample_conv): taps²-tap channel contraction at the small
    resolution (write+read the in_px·taps²·cout intermediate ``z``), then
    shifted width/height resizes (write+read of ``v``).
    XLA does not fuse dot→dot, so each einsum's operands round-trip HBM —
    the intermediates' bytes are the real cost driver, which is why neither
    pure-FLOP nor pure-memory comparisons pick the right path for every site.
    """
    t2 = taps * taps
    in_px = in_hw[0] * in_hw[1]
    out_px = out_hw[0] * out_hw[1]

    d_flops = 2 * out_px * t2 * cin * cout + 2 * out_px * cin * (in_hw[0] + taps)
    d_bytes = _BPE * (in_px * cin + 2 * 2 * out_px * cin + out_px * cout)
    direct = _roofline(d_flops, d_bytes)

    f_flops = (
        2 * in_px * t2 * cin * cout                      # z contraction
        + 2 * in_hw[0] * out_hw[1] * taps * cout * taps * in_hw[1]  # width
        + 2 * out_px * cout * taps * in_hw[0]            # height
    )
    f_bytes = _BPE * (
        in_px * cin + 2 * in_px * t2 * cout              # z write+read
        + 2 * in_hw[0] * out_hw[1] * taps * cout         # v write+read
        + out_px * cout
    )
    fused = _roofline(f_flops, f_bytes)
    return direct, fused


def should_fuse(in_hw: tuple[int, int], out_hw: tuple[int, int],
                cin: int, cout: int, taps: int = 5) -> bool:
    """Pick the cheaper path under the roofline model (validated against
    per-site measurements on the v5e chip — perf/upproj_experiment.py)."""
    direct, fused = fuse_costs(in_hw, out_hw, cin, cout, taps)
    return fused < direct


# ---------------------------------------------------------------------------
# fused implementation
# ---------------------------------------------------------------------------


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


def _upsample_conv_multi(x: jax.Array, kernels: jax.Array,
                         size: tuple[int, int]) -> jax.Array:
    """Core: NHWC ``x``, stacked HWIO ``kernels`` (taps, taps, ci, co_total);
    returns (n, H, W, co_total)."""
    taps = kernels.shape[0]
    n, hs, ws, ci = x.shape
    h_out, w_out = int(size[0]), int(size[1])

    a = jnp.asarray(_shifted_matrices(hs, h_out, taps), x.dtype)
    b = jnp.asarray(_shifted_matrices(ws, w_out, taps), x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    # (1) all taps² channel contractions at the small resolution (one matmul)
    k = kernels.astype(x.dtype).reshape(taps, taps, ci, -1)
    z = jnp.einsum("nhwc,pqco->nhwpqo", x, k, precision=prec)
    # (2) width resize per dq tap, then height resize per dp tap
    v = jnp.einsum("qWw,nhwpqo->nhWpo", b, z, precision=prec)
    y = jnp.einsum("pHh,nhWpo->nHWo", a, v, precision=prec)
    return y


def upsample_conv(x: jax.Array, kernel: jax.Array,
                  size: tuple[int, int]) -> jax.Array:
    """Exactly ``conv2d(resize_bilinear_align_corners(x, size), kernel,
    padding=taps//2)`` for NHWC ``x`` and HWIO ``kernel`` (square, odd)."""
    return _upsample_conv_multi(x, kernel, size)


def upsample_conv_pair(x: jax.Array, k1: jax.Array, k2: jax.Array,
                       size: tuple[int, int]) -> tuple[jax.Array, jax.Array]:
    """Both UpProjection branches in one pass: the channel contraction and
    resize pipelines run once over the stacked kernels (shared ``x``), which
    halves matmul launches and doubles their N dims (better MXU tiling)."""
    co = k1.shape[-1]
    y = _upsample_conv_multi(x, jnp.concatenate([k1, k2], axis=-1), size)
    return y[..., :co], y[..., co:]
