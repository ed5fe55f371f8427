"""Pallas direct-path UpProjection: VMEM-resident upsample -> 5x5 conv.

The Hu2018 ``_UpProjection`` (reference: ReSIDE/models/modules.py:16-41)
computes ``conv5x5(bilinear_up(x))`` twice (two branches) on the same
upsampled tensor. On the decoder's final 2x step (D.up4: 57x76x128 ->
114x152x64(+64) for RN50) the two algebraic forms tie (perf/upproj_rn50.json)
because the XLA direct path must round-trip the 114x152x128 upsampled
intermediate through HBM between the resize einsums and the conv.

This kernel removes that round-trip: each grid cell (batch n, row-tile t)

  1. loads the full small-resolution input for one batch element into VMEM
     (~1.1 MB for RN50 D.up4),
  2. computes the align-corners bilinear upsample of the tile's rows via two
     MXU matmuls against precomputed interpolation matrices whose border
     rows/cols are zero (the conv's zero padding, so no edge cases),
  3. applies all 25 conv taps as unrolled (TH*W, C) @ (C, O) matmuls with
     branch-stacked output channels (both UpProjection branches in one pass
     -> full 128-lane MXU tiles even when features=64),
  4. accumulates in f32 and writes only the final (TH, W, O) tile to HBM.

Exactly equal to ``conv2d(resize_bilinear_align_corners(x, size), k)`` up to
f32-accumulation order (test-verified in interpret mode and on device).

**Measured outcome (v5e, RN50 D.up4, batch 128): the XLA composition wins.**
With branch-stacked output channels the XLA direct path runs 13.7 ms at
132 TFLOP/s (67 % bf16 MFU) — the site is FLOP-bound, so the HBM round-trip
this kernel eliminates is only a ~1.4 ms bound. This kernel measures ~100 ms:
the W-major/H-major relayout transposes between the resize matmuls and the
25 tap matmuls dominate, and the VMEM budget forces a 6-row tile whose
(912, 128) @ (128, 128) dots underfeed the MXU. Kept as a working, tested
demonstration of the direct-path kernel with an honest negative result
(perf/upproj_pallas_bench.py); the model uses the XLA paths
(models/hu2018.py picks stacked-direct or the algebraic rewrite per site via
the roofline cost model in ops/fused.py).

The public wrapper exposes a custom VJP whose backward falls back to the XLA
composition's gradient (exact), so the kernel is safe inside a training
graph even though only eval would use it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficientdepthestimation_tpu.ops.resize import bilinear_align_corners_matrix

__all__ = ["upsample_conv_pallas"]


@functools.lru_cache(maxsize=None)
def _padded_matrix(in_size: int, out_size: int, pad: int) -> np.ndarray:
    """(out_size + 2*pad, in_size) align-corners matrix with zero border
    rows — upsampled coordinates outside [0, out_size) are the conv's zero
    padding, folded into the resize so the kernel has no edge cases."""
    m = np.zeros((out_size + 2 * pad, in_size), dtype=np.float32)
    m[pad:pad + out_size] = bilinear_align_corners_matrix(in_size, out_size)
    return m


def _kernel(x_ref, a_ref, b_ref, k_ref, o_ref, *, taps: int, th: int):
    """One (batch, row-tile) cell. Shapes (leading block dims of 1 squeezed
    by indexing):
      x_ref: (1, hs, ws, C)   small-res input, full per batch
      a_ref: (1, r, hs)       this tile's rows of the padded row matrix
                              (blocked on the tile axis — Mosaic cannot prove
                              alignment of a dynamic row slice, so the tiles
                              are pre-stacked host-side instead)
      b_ref: (W + 2p, ws)     col matrix (zero-padded border)
      k_ref: (taps*taps, C, O) stacked conv kernels
      o_ref: (1, th, W, O)    output tile
    """
    p = taps // 2
    hs, ws, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    wp, out_ch = b_ref.shape[0], k_ref.shape[2]
    w = wp - 2 * p
    r = th + 2 * p

    # (1) rows of the (padded) upsampled image needed by this tile
    rows = a_ref[0]                                         # (r, hs)
    x2 = x_ref[0].reshape(hs, ws * c)
    xr = jnp.dot(rows, x2,
                 preferred_element_type=jnp.float32)        # (r, ws*c)
    xr = xr.reshape(r, ws, c).astype(x2.dtype)

    # (2) width resize: (wp, ws) @ (ws, r*c) -> padded upsampled tile,
    # W-major layout so the conv windows below slice leading dims only
    xr_t = xr.transpose(1, 0, 2).reshape(ws, r * c)
    upw = jnp.dot(b_ref[:, :], xr_t,
                  preferred_element_type=jnp.float32)       # (wp, r*c)
    upw = upw.reshape(wp, r, c).astype(x2.dtype)

    # (3) all taps as stacked matmuls, f32 accumulation
    acc = jnp.zeros((w * th, out_ch), jnp.float32)
    for dp in range(taps):
        for dq in range(taps):
            win = upw[dq:dq + w, dp:dp + th, :].reshape(w * th, c)
            acc = acc + jnp.dot(win, k_ref[dp * taps + dq],
                                preferred_element_type=jnp.float32)

    out = acc.reshape(w, th, out_ch).transpose(1, 0, 2)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_tile(h: int, w: int, c: int, out_ch: int, bpe: int) -> int:
    """Largest divisor of ``h`` whose per-cell working set (f32 accumulator +
    double-buffered upsampled tile + relayout temporaries) stays well under
    the 16 MB VMEM budget (measured headroom: tile 19 at RN50 D.up4 OOMs at
    20.4 MB, tile 6 fits)."""
    for cand in (24, 19, 16, 12, 8, 6, 4, 3, 2):
        if h % cand != 0:
            continue
        acc = cand * w * out_ch * 4
        up = (cand + 4) * (w + 4) * c * bpe
        if 3 * (acc + 2 * up) < 6 * 2**20:
            return cand
    return 1


def _forward(x: jax.Array, kernels: jax.Array, size: tuple[int, int],
             interpret: bool = False) -> jax.Array:
    taps = kernels.shape[0]
    p = taps // 2
    n, hs, ws, c = x.shape
    h, w = int(size[0]), int(size[1])
    out_ch = kernels.shape[-1]
    th = _pick_tile(h, w, c, out_ch, x.dtype.itemsize)

    nh = h // th
    r = th + 2 * p
    a_full = _padded_matrix(hs, h, p)
    # per-tile overlapping row windows, stacked so BlockSpec indexing (not a
    # dynamic in-kernel slice) selects them
    a_tiles = np.stack([a_full[t * th:t * th + r] for t in range(nh)])
    a = jnp.asarray(a_tiles, x.dtype)
    b = jnp.asarray(_padded_matrix(ws, w, p), x.dtype)
    k = kernels.astype(x.dtype).reshape(taps * taps, c, out_ch)

    grid = (n, nh)
    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, th=th),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hs, ws, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, hs), lambda i, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, out_ch), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, out_ch), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * taps * taps * c * out_ch,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * h * w * out_ch * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, a, b, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def upsample_conv_pallas(x: jax.Array, kernels: jax.Array,
                         size: tuple[int, int],
                         interpret: bool = False) -> jax.Array:
    """``conv2d(resize_bilinear_align_corners(x, size), kernels,
    padding=taps//2)`` as one Pallas kernel (upsampled intermediate lives in
    VMEM only). NHWC ``x``; HWIO ``kernels`` may carry branch-stacked output
    channels. Gradient falls back to the XLA composition (exact).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    return _forward(x, kernels, size, interpret)


def _xla_reference(x, kernels, size):
    from efficientdepthestimation_tpu.ops.conv import conv2d
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    up = resize_bilinear_align_corners(x, size)
    return conv2d(up, kernels.astype(up.dtype), stride=1,
                  padding=kernels.shape[0] // 2)


def _fwd(x, kernels, size, interpret):
    return _forward(x, kernels, size, interpret), (x, kernels)


def _bwd(size, interpret, res, g):
    x, kernels = res
    _, vjp = jax.vjp(lambda xx, kk: _xla_reference(xx, kk, size), x, kernels)
    return vjp(g)


upsample_conv_pallas.defvjp(_fwd, _bwd)
