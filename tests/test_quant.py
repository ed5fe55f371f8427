"""Int8 dynamic-quantization serving path (ops/quant.py).

Three layers of proof:
  * the int8 conv's integer math is EXACT vs an int64 numpy oracle after
    the same quantization (the MXU int32 accumulation never rounds);
  * the trace-time gate only rewrites eligible dense sites — ineligible
    convs are bit-identical to the float path;
  * end-to-end quantization error through a realistic conv/BN/ReLU tower
    stays within the dynamic-range bound (the accuracy knob is opt-in:
    serving defaults never enable this path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdepthestimation_tpu.ops.conv import conv2d
from efficientdepthestimation_tpu.ops.quant import (
    quant_conv2d,
    quantize_kernel,
    quantized_convs,
    should_quantize,
)


def _np_quant_conv(x, k, stride, pad, bias=None):
    """int64 numpy oracle of the exact scheme in quant_conv2d."""
    xf = np.asarray(x, np.float64)
    kf = np.asarray(k, np.float64)
    s_x = max(np.abs(xf).max(), 1e-30) / 127.0
    xq = np.clip(np.round(xf / s_x), -127, 127).astype(np.int64)
    s_w = np.maximum(np.abs(kf).max(axis=(0, 1, 2)), 1e-30) / 127.0
    kq = np.clip(np.round(kf / s_w), -127, 127).astype(np.int64)
    (pt, pb), (pl, pr) = pad
    xq = np.pad(xq, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    kh, kw, ci, co = kq.shape
    sh, sw = stride
    b, h, w, _ = xq.shape
    oh, ow = (h - kh) // sh + 1, (w - kw) // sw + 1
    out = np.zeros((b, oh, ow, co), np.int64)
    for i in range(kh):
        for j in range(kw):
            sl = xq[:, i:i + (oh - 1) * sh + 1:sh, j:j + (ow - 1) * sw + 1:sw]
            out += np.einsum("bhwc,co->bhwo", sl, kq[i, j], dtype=np.int64)
    y = out.astype(np.float64) * (s_x * s_w)
    if bias is not None:
        y = y + np.asarray(bias, np.float64)
    return y


@pytest.mark.parametrize("stride,pad", [((1, 1), ((2, 2), (2, 2))),
                                        ((2, 2), ((1, 1), (1, 1)))])
def test_quant_conv_exact_vs_int_oracle(stride, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, 12, 64)).astype(np.float32)
    k = (rng.standard_normal((5, 5, 64, 32)) * 0.1).astype(np.float32)
    bias = rng.standard_normal((32,)).astype(np.float32)
    got = quant_conv2d(jnp.asarray(x), jnp.asarray(k), stride=stride,
                       padding=pad, bias=jnp.asarray(bias))
    want = _np_quant_conv(x, k, stride, pad, bias)
    # float32 dequant multiply is the only rounding left
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-5, atol=1e-5)


def test_quantize_kernel_per_channel():
    rng = np.random.default_rng(1)
    k = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    k[..., 3] *= 50.0  # one hot channel must not crush the others' range
    kq, sc = quantize_kernel(jnp.asarray(k))
    assert kq.dtype == jnp.int8 and sc.shape == (16,)
    back = np.asarray(kq, np.float32) * np.asarray(sc)
    err = np.abs(back - k).max(axis=(0, 1, 2)) / np.abs(k).max(axis=(0, 1, 2))
    assert err.max() < 1 / 127  # every channel keeps its own 8-bit range


def test_gate_eligibility_static():
    with quantized_convs(min_macs_per_px=1600):
        assert should_quantize((5, 5, 128, 32), 1, (1, 1))      # 3200 MACs
        assert should_quantize((5, 5, 128, 1), 1, (1, 1))       # 1-wide head wins too
        assert not should_quantize((3, 3, 128, 32), 1, (1, 1))  # 1152 MACs
        assert not should_quantize((5, 5, 64, 32), 1, (1, 1))   # cin not 128-aligned
        assert not should_quantize((5, 5, 130, 32), 1, (1, 1))  # measured 0.89x
        assert not should_quantize((5, 5, 128, 32), 2, (1, 1))  # grouped
        assert not should_quantize((5, 5, 128, 32), 1, (2, 2))  # dilated
        assert should_quantize((1, 1, 2048, 1024), 1, (1, 1))
    assert not should_quantize((5, 5, 128, 32), 1, (1, 1))  # off outside ctx


def test_conv2d_routes_through_gate():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    k_big = jnp.asarray(rng.standard_normal((5, 5, 128, 32)) * 0.1, jnp.float32)
    k_small = jnp.asarray(rng.standard_normal((3, 3, 128, 32)) * 0.1, jnp.float32)
    base_big = conv2d(x, k_big, stride=1, padding=2)
    base_small = conv2d(x, k_small, stride=1, padding=1)
    with quantized_convs():
        q_big = conv2d(x, k_big, stride=1, padding=2)
        q_small = conv2d(x, k_small, stride=1, padding=1)
    # ineligible site: bit-identical to the float path
    assert jnp.array_equal(base_small, q_small)
    # eligible site: rewritten (different result), but close
    assert not jnp.array_equal(base_big, q_big)
    rel = float(jnp.linalg.norm(q_big - base_big) / jnp.linalg.norm(base_big))
    assert rel < 0.02


def test_e2e_tower_error_bounded():
    """Three eligible conv+BN-ish+ReLU stages: compounded int8 error stays
    in the ~1% band that makes this a viable opt-in serving mode."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 128)), jnp.float32)
    ks = [jnp.asarray(rng.standard_normal((5, 5, 128, 128)) * 0.05, jnp.float32)
          for _ in range(3)]

    def tower(x):
        for k in ks:
            x = conv2d(x, k, stride=1, padding=2)
            x = jax.nn.relu(x * 0.9 + 0.01)
        return x

    base = tower(x)
    with quantized_convs():
        quant = jax.jit(tower)(x)
    rel = float(jnp.linalg.norm(quant - base) / jnp.linalg.norm(base))
    assert 0 < rel < 0.03


def test_jit_trace_time_binding():
    """The context is consulted at trace time; a program traced inside stays
    quantized when called outside (and vice versa)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, 128, 32)) * 0.1, jnp.float32)
    f = jax.jit(lambda a, b: conv2d(a, b, stride=1, padding=2))
    with quantized_convs():
        quant_out = f(x, k)  # traced (and cached) inside the context
    assert jnp.array_equal(f(x, k), quant_out)
