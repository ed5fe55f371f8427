"""Fused depthwise-conv + folded-BN + swish (+ SE spatial sums) Pallas kernel.

The MBConv hot path (ReSIDE's EfficientNet encoders via efficientnet_pytorch,
reference ReSIDE/models/modules.py:124-200) is HBM-bound on TPU: XLA runs the
depthwise conv, BatchNorm, swish and the squeeze-excite *mean* as separate
passes over the 6×-expanded activation tensor. This kernel does all four in
ONE VMEM pass — the expanded tensor is read from HBM once and written once:

    y = swish(dw_conv(x) * scale + bias)        # BN folded to scale/bias
    sums[b, c] = Σ_{h,w} y[b, h, w, c]          # feeds SE's global mean

Design:
  * grid (batch, channel-tiles); each program holds the block's FULL spatial
    extent for a channel slice in VMEM (serving spatial sizes are small:
    ≤115×153 after the stem), so conv taps are in-register shifts — no halo
    exchange between programs.
  * zero padding (asymmetric, efficientnet-pytorch static-same) happens in
    VMEM via concat (update-slice doesn't lower on the TPU TC).
  * strided taps (stride-2 blocks) use strided `lax.slice` on the loaded
    value.
  * eval-mode only (serving path); training keeps the XLA/shift lowerings.

CPU tests run with ``interpret=True``; exactness vs the unfused module path
is pinned in tests/test_pallas_depthwise.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports on CPU for interpret mode, but be defensive.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["depthwise_bn_swish", "fold_bn"]


def fold_bn(bn_params, bn_stats, eps: float = 1e-3):
    """Eval-mode BatchNorm as (scale, bias): y = x·scale + bias (f32)."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * gamma
    return inv, beta - mean * inv


def _pick_channel_tile(c: int, px_in: int, px_out: int) -> int | None:
    """Largest *TPU-legal* channel tile whose f32 working set fits VMEM.

    Mosaic requires the last block dim to equal the array's channel count
    or be a multiple of the 128-lane width; anything else (e.g. 16 of 32)
    fails lowering on real hardware. The (px_in+px_out)·4·ct estimate runs
    ~3.7× under Mosaic's scoped-VMEM accounting (padded f32 copy, tap
    temporaries, double-buffered in/out blocks): a 4.5 MB estimate was
    measured at 16.92 MB scoped vs the 16 MB limit, so 3 MB here ≈ 12 MB
    real. Returns None when no legal tile fits — the caller falls back to
    the XLA lowering for that site.
    """
    budget = 3_000_000
    legal = [c] + [t for t in (512, 384, 256, 128) if t < c and c % t == 0]
    fitting = [ct for ct in legal if (px_in + px_out) * 4 * ct <= budget]
    return max(fitting) if fitting else None


def _xla_fallback(x, taps, scale, bias, *, stride, padding):
    """Same (y, sums) contract via plain XLA ops, for kernel-ineligible sites."""
    from efficientdepthestimation_tpu.ops.conv import depthwise_conv2d

    y = depthwise_conv2d(x, taps[:, :, None, :].astype(x.dtype),
                         stride=stride, padding=padding)
    y = y.astype(jnp.float32) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype), jnp.sum(y, axis=(1, 2))


def _kernel(x_ref, taps_ref, scale_ref, bias_ref, out_ref, sums_ref,
            *, kh, kw, pad, stride, out_dtype):
    v = x_ref[0].astype(jnp.float32)  # (H, W, Ct)
    h, w, ct = v.shape
    (pt, pb), (pl_, pr) = pad
    if pl_ or pr:
        left = jnp.zeros((h, pl_, ct), v.dtype)
        right = jnp.zeros((h, pr, ct), v.dtype)
        v = jnp.concatenate([left, v, right], axis=1)
    if pt or pb:
        top = jnp.zeros((pt, w + pl_ + pr, ct), v.dtype)
        bot = jnp.zeros((pb, w + pl_ + pr, ct), v.dtype)
        v = jnp.concatenate([top, v, bot], axis=0)
    hp, wp = h + pt + pb, w + pl_ + pr
    sh, sw = stride
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1

    acc = None
    for di in range(kh):
        for dj in range(kw):
            sl = jax.lax.slice(
                v, (di, dj, 0),
                (di + (oh - 1) * sh + 1, dj + (ow - 1) * sw + 1, ct),
                (sh, sw, 1))
            term = sl * taps_ref[di, dj].astype(jnp.float32)
            acc = term if acc is None else acc + term

    y = acc * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_dtype)
    sums_ref[0, 0] = jnp.sum(y, axis=(0, 1))


def depthwise_bn_swish(x, taps, scale, bias, *, stride=(1, 1),
                       padding=((0, 0), (0, 0)),
                       interpret: bool | None = None):
    """swish(BN(depthwise_conv(x))) in one HBM pass, plus SE spatial sums.

    x: (B, H, W, C); taps: (kh, kw, C) per-channel kernel; scale/bias: (C,)
    folded eval-mode BN (see ``fold_bn``). Returns ``(y, sums)`` where
    y: (B, oh, ow, C) in x.dtype and sums: (B, C) f32 — so the squeeze-excite
    mean is ``sums / (oh · ow)`` without re-reading y from HBM.
    """
    if interpret is None:  # TPU compiles the kernel; CPU interprets it
        interpret = jax.default_backend() == "cpu"
    if tuple(stride) != (1, 1):
        # Mosaic can't lower strided vector slices (stride-2 taps fail
        # verification); stride-2 blocks write 4× fewer pixels so the fusion
        # win is marginal there anyway — keep them on the XLA lowering.
        return _xla_fallback(x, taps, scale, bias, stride=tuple(stride),
                             padding=padding)
    b, h, w, c = x.shape
    kh, kw, _ = taps.shape
    (pt, pb), (pl_, pr) = padding
    sh, sw = stride
    oh = (h + pt + pb - kh) // sh + 1
    ow = (w + pl_ + pr - kw) // sw + 1
    ct = _pick_channel_tile(c, (h + pt + pb) * (w + pl_ + pr), oh * ow)
    if ct is None:  # no legal VMEM-fitting tile (early layers: huge spatial)
        return _xla_fallback(x, taps, scale, bias, stride=(sh, sw),
                             padding=padding)

    kern = functools.partial(
        _kernel, kh=kh, kw=kw, pad=padding, stride=(sh, sw),
        out_dtype=x.dtype)
    vm = {} if _VMEM is None else {"memory_space": _VMEM}
    y, sums = pl.pallas_call(
        kern,
        grid=(b, c // ct),
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j), **vm),
            pl.BlockSpec((kh, kw, ct), lambda i, j: (0, 0, j), **vm),
            pl.BlockSpec((ct,), lambda i, j: (j,), **vm),
            pl.BlockSpec((ct,), lambda i, j: (j,), **vm),
        ],
        out_specs=[
            pl.BlockSpec((1, oh, ow, ct), lambda i, j: (i, 0, 0, j), **vm),
            pl.BlockSpec((1, 1, ct), lambda i, j: (i, 0, j), **vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, taps, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return y, sums[:, 0, :]
