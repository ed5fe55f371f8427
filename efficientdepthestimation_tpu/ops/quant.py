"""Dynamic-range int8 convolution for the opt-in quantized serving path.

The v5e MXU runs s8×s8→s32 at twice the bf16 MAC rate, and XLA lowers
``lax.conv_general_dilated`` with int8 operands and
``preferred_element_type=int32`` straight onto it — measured 1.96× on a
FLOP-bound 5×5 1024→512 conv, ~1× on lane-starved small-channel shapes
(``perf/int8_probe.py`` / ``perf/int8_probe.json``).

Scheme (standard dynamic PTQ, no calibration pass):

* weights: symmetric per-output-channel scales, ``s_w = max|K[..,o]|/127``;
* activations: symmetric per-tensor scale computed *in-program* from the
  running batch (``s_x = max|x|/127``) — one VPU reduction, negligible next
  to a FLOP-bound conv, and it removes any train/serve calibration skew;
* conv in int8 → int32 accumulator → exact dequant ``y·s_x·s_w``.

Quantization error is bounded by construction (≤ s_x/2 + s_w/2 per
operand); end-to-end depth error is measured, not assumed — see
``tests/test_quant.py`` and the accuracy row the autotuner records. This
path NEVER turns on implicitly: ``quantized_convs()`` must wrap the trace
(mirroring ``ops.conv.depthwise_impl``), and the serving autotuner only
measures it under ``--int8``.

The reference has no quantized path (CUDA fp32/fp16 only,
ReSIDE/inference_benchmark.py); this is a TPU-native serving extension.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["quant_conv2d", "quantize_kernel", "quantized_convs",
           "quant_enabled", "should_quantize"]

# Trace-time switch consulted by ops.conv.conv2d: None = off, else the
# minimum per-pixel MAC depth (kh·kw·cin) a dense conv needs before the
# int8 form is used. Lane-starved convs (small cin·kh·kw) gain nothing on
# the MXU and only pay the quantize/dequantize passes.
_QUANT_MIN_MACS: int | None = None


@contextlib.contextmanager
def quantized_convs(min_macs_per_px: int = 1600):
    """Route eligible dense convs through int8 while tracing a program.

    ``min_macs_per_px``: eligibility threshold on kh·kw·cin (the MAC depth
    feeding one output pixel). Eligibility additionally requires
    ``cin % 128 == 0``: int8 packs 4 values per sublane, so misaligned
    input-channel counts pad *worse* than bf16 and measure slower
    (perf/int8_probe.json: cin 130 → 0.89×, 104 → 0.95×, 64 → 1.01×,
    while 128/256/512/1024 → 1.6–2.0×).
    """
    global _QUANT_MIN_MACS
    prev = _QUANT_MIN_MACS
    _QUANT_MIN_MACS = int(min_macs_per_px)
    try:
        yield
    finally:
        _QUANT_MIN_MACS = prev


def quant_enabled() -> bool:
    return _QUANT_MIN_MACS is not None


def should_quantize(kernel_shape, groups: int, dilation) -> bool:
    """Static (trace-time) eligibility of one conv site."""
    if _QUANT_MIN_MACS is None or groups != 1:
        return False
    if tuple(dilation) != (1, 1):
        return False
    kh, kw, cin, cout = kernel_shape
    # cin alignment dominates (see quantized_convs); even the 1-wide-output
    # RefineR head wins 1.62× when its cin is 128-aligned.
    return cin % 128 == 0 and kh * kw * cin >= _QUANT_MIN_MACS


def quantize_kernel(kernel: jax.Array):
    """HWIO kernel → (int8 kernel, per-output-channel f32 scale)."""
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def quant_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride=(1, 1),
    padding=((0, 0), (0, 0)),
    bias: jax.Array | None = None,
) -> jax.Array:
    """Dense NHWC/HWIO conv computed as s8×s8→s32 with exact dequant.

    Activation scale is dynamic (per-tensor max of this batch); weight
    scales are per output channel. Output dtype matches ``x``.
    """
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    kq, s_w = quantize_kernel(kernel)
    y = lax.conv_general_dilated(
        xq,
        kq,
        window_strides=tuple(stride),
        padding=tuple(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
