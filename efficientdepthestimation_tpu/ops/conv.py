"""Convolution / pooling wrappers with exact PyTorch padding semantics.

NHWC activations, HWIO kernels — the layouts XLA tiles best onto the TPU MXU.
The ``.pth`` importer (checkpoints/pth_import.py) transposes torch's OIHW
weights into HWIO once at load time.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp
from jax import lax

from efficientdepthestimation_tpu.ops import quant as _quant

__all__ = [
    "conv2d",
    "depthwise_conv2d",
    "depthwise_impl",
    "max_pool",
    "avg_pool_global",
    "same_padding_static",
]

# Trace-time switch for how channels==groups convs are lowered. "xla" uses
# the grouped-conv lowering; "shift" expands the conv into per-tap
# strided-slice × scale FMAs (a pure VPU/bandwidth formulation that dodges
# XLA's weak TPU grouped-conv emitter — see perf/enb0_encoder_probe.py).
# Both are numerically exact reorderings of the same sums.
_DEPTHWISE_IMPL = "xla"


@contextlib.contextmanager
def depthwise_impl(mode: str):
    """Select the depthwise-conv lowering while tracing a program.

    Usage: trace/jit the forward inside ``with depthwise_impl("shift"):``.
    The flag is consulted at trace time only; compiled programs are
    unaffected by later changes.
    """
    global _DEPTHWISE_IMPL
    if mode not in ("xla", "shift"):
        raise ValueError(f"unknown depthwise impl: {mode!r}")
    prev = _DEPTHWISE_IMPL
    _DEPTHWISE_IMPL = mode
    try:
        yield
    finally:
        _DEPTHWISE_IMPL = prev


def _depthwise_shifted(x, kernel, stride, padding):
    """Depthwise conv as a sum of strided-slice × per-channel-tap products.

    kernel: (kh, kw, 1, C). Exact reordering of the grouped conv's sums —
    each of the kh·kw taps contributes ``x_shifted * k[di, dj]`` elementwise.
    """
    kh, kw, _, _ = kernel.shape
    (pt, pb), (pl, pr) = padding
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    sh, sw = stride
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    taps = kernel[:, :, 0, :]
    out = None
    for di in range(kh):
        for dj in range(kw):
            sl = lax.slice(
                xp,
                (0, di, dj, 0),
                (xp.shape[0], di + (oh - 1) * sh + 1,
                 dj + (ow - 1) * sw + 1, xp.shape[3]),
                (1, sh, sw, 1),
            )
            term = sl * taps[di, dj]
            out = term if out is None else out + term
    return out


def _norm_padding(padding) -> tuple[tuple[int, int], tuple[int, int]]:
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    (ph, pw) = padding
    if isinstance(ph, int):
        return ((ph, ph), (pw, pw))
    return (tuple(ph), tuple(pw))


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple = 0,
    groups: int = 1,
    bias: jax.Array | None = None,
    dilation: int | tuple[int, int] = 1,
    precision=None,
) -> jax.Array:
    """2-D convolution: NHWC input, HWIO kernel, torch-style zero padding.

    ``precision`` defaults to HIGHEST so f32 parity tests pass on TPU (whose
    default matmul precision is bf16). Inference paths that quantize to
    bfloat16 pass their own policy.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    if (
        _DEPTHWISE_IMPL == "shift"
        and groups > 1
        and groups == x.shape[-1]
        and kernel.shape[2] == 1
        and kernel.shape[3] == groups
        and dilation == (1, 1)
    ):
        out = _depthwise_shifted(x, kernel, stride, _norm_padding(padding))
        if bias is not None:
            out = out + bias
        return out
    if _quant.quant_enabled() and _quant.should_quantize(
            kernel.shape, groups, dilation):
        return _quant.quant_conv2d(x, kernel, stride=stride,
                                   padding=_norm_padding(padding), bias=bias)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=_norm_padding(padding),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def depthwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Depthwise conv: kernel shape (H, W, 1, C) — torch groups == channels."""
    c = x.shape[-1]
    return conv2d(x, kernel, stride=stride, padding=padding, groups=c, bias=bias)


def same_padding_static(
    image_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    dilation: tuple[int, int] = (1, 1),
) -> tuple[tuple[int, int], tuple[int, int]]:
    """TensorFlow-style 'SAME' padding computed for a *fixed* image size.

    Reproduces efficientnet-pytorch 0.6.3's ``Conv2dStaticSamePadding``
    (asymmetric ZeroPad2d with the extra pixel on the right/bottom), which is
    baked into the released checkpoints. The padding is a function of the
    *construction-time* canonical image size — NOT the runtime input — which
    matters when runtime spatial dims have different parity than the
    canonical ones (e.g. 228×304 inputs through a net built for 224 / 380).
    """
    pads = []
    for size, k, s, d in zip(image_size, kernel_size, stride, dilation):
        eff_k = (k - 1) * d + 1
        out = math.ceil(size / s)
        total = max((out - 1) * s + eff_k - size, 0)
        pads.append((total // 2, total - total // 2))
    return (pads[0], pads[1])


def max_pool(
    x: jax.Array,
    window: int | tuple[int, int],
    stride: int | tuple[int, int],
    padding: int | tuple = 0,
    ceil_mode: bool = False,
) -> jax.Array:
    """Max pooling with torch semantics (incl. ``ceil_mode=True`` for SENet).

    torch pads with -inf and, in ceil mode, additionally extends the
    right/bottom so the last window starting inside the (padded) input is
    kept; windows that would start entirely in the padding are dropped.
    """
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    (ph, pw) = _norm_padding(padding)
    n, h, w, c = x.shape
    pad_h, pad_w = list(ph), list(pw)
    if ceil_mode:
        for dim, size, k, s, pad in ((0, h, window[0], stride[0], pad_h),
                                     (1, w, window[1], stride[1], pad_w)):
            out_floor = (size + pad[0] + pad[1] - k) // s + 1
            out_ceil = math.ceil((size + pad[0] + pad[1] - k) / s) + 1
            # Drop the extra window if it starts beyond the real input+left pad.
            if out_ceil > out_floor and (out_ceil - 1) * s >= size + pad[0]:
                out_ceil -= 1
            extra = max((out_ceil - 1) * s + k - (size + pad[0] + pad[1]), 0)
            pad[1] += extra
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), tuple(pad_h), tuple(pad_w), (0, 0)),
    )


def avg_pool_global(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Global average pool over H, W (torch AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
