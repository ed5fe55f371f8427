"""Golden tests: conv / pooling / batchnorm / sobel vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from efficientdepthestimation_tpu.ops import conv as C
from efficientdepthestimation_tpu.ops import norm as N
from efficientdepthestimation_tpu.ops import sobel as S


def _to_nchw(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def _from_nchw(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("k,stride,pad,groups", [
    (1, 1, 0, 1),
    (3, 1, 1, 1),
    (5, 1, 2, 1),
    (3, 2, 1, 1),
    (7, 2, 3, 1),
    (3, 1, 1, 4),   # grouped (SENet uses groups=64)
])
def test_conv2d_matches_torch(rng, k, stride, pad, groups):
    cin, cout = 8, 12
    x = rng.standard_normal((2, 13, 17, cin), dtype=np.float32)
    w = rng.standard_normal((cout, cin // groups, k, k), dtype=np.float32)  # OIHW
    b = rng.standard_normal(cout, dtype=np.float32)
    ours = np.asarray(
        C.conv2d(
            jnp.asarray(x),
            jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            stride=stride,
            padding=pad,
            groups=groups,
            bias=jnp.asarray(b),
        )
    )
    theirs = _from_nchw(
        F.conv2d(_to_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride, pad, 1, groups)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_matches_torch(rng):
    c = 6
    x = rng.standard_normal((1, 11, 9, c), dtype=np.float32)
    w = rng.standard_normal((c, 1, 3, 3), dtype=np.float32)  # OIHW depthwise
    ours = np.asarray(
        C.depthwise_conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), stride=2, padding=1)
    )
    theirs = _from_nchw(F.conv2d(_to_nchw(x), torch.from_numpy(w), None, 2, 1, 1, c))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad,bias", [
    (3, 1, ((1, 1), (1, 1)), False),
    (5, 1, ((2, 2), (2, 2)), True),
    (3, 2, ((0, 1), (0, 1)), False),   # ENB0 static-same asymmetric
    (5, 2, ((1, 2), (1, 2)), True),
])
def test_depthwise_shift_impl_matches_xla(rng, k, stride, pad, bias):
    """depthwise_impl("shift") is an exact reordering of the grouped conv."""
    c = 6
    x = jnp.asarray(rng.standard_normal((2, 13, 17, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, 1, c), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(c, dtype=np.float32)) if bias else None
    ref = C.conv2d(x, w, stride=stride, padding=pad, groups=c, bias=b)
    with C.depthwise_impl("shift"):
        alt = C.conv2d(x, w, stride=stride, padding=pad, groups=c, bias=b)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # flag restores: back to the XLA lowering afterwards
    again = C.conv2d(x, w, stride=stride, padding=pad, groups=c, bias=b)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))


def test_asymmetric_padding_matches_zeropad2d(rng):
    # efficientnet-pytorch static same padding: ZeroPad2d((left, right, top, bottom))
    x = rng.standard_normal((1, 15, 15, 4), dtype=np.float32)
    w = rng.standard_normal((8, 4, 3, 3), dtype=np.float32)
    pad = ((0, 1), (0, 1))
    ours = np.asarray(
        C.conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), stride=2, padding=pad)
    )
    xt = F.pad(_to_nchw(x), (0, 1, 0, 1))
    theirs = _from_nchw(F.conv2d(xt, torch.from_numpy(w), None, 2, 0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_same_padding_static_matches_efficientnet_pytorch():
    # Hand-checked values of Conv2dStaticSamePadding's formula.
    assert C.same_padding_static((224, 224), (3, 3), (2, 2)) == ((0, 1), (0, 1))
    assert C.same_padding_static((57, 76), (3, 3), (2, 2)) == ((1, 1), (0, 1))
    assert C.same_padding_static((28, 28), (5, 5), (2, 2)) == ((1, 2), (1, 2))
    assert C.same_padding_static((29, 29), (5, 5), (2, 2)) == ((2, 2), (2, 2))
    assert C.same_padding_static((14, 14), (5, 5), (1, 1)) == ((2, 2), (2, 2))
    assert C.same_padding_static((112, 112), (3, 3), (1, 1)) == ((1, 1), (1, 1))


@pytest.mark.parametrize("hw,ceil", [
    ((228, 304), False),
    ((57, 76), False),
    ((115, 153), True),   # SENet ceil_mode pool, odd size
    ((114, 152), True),
])
def test_max_pool_matches_torch(rng, hw, ceil):
    x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
    pad = 0 if ceil else 1
    ours = np.asarray(C.max_pool(jnp.asarray(x), 3, 2, padding=pad, ceil_mode=ceil))
    theirs = _from_nchw(F.max_pool2d(_to_nchw(x), 3, 2, pad, ceil_mode=ceil))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_batch_norm_eval_matches_torch(rng):
    c = 16
    x = rng.standard_normal((2, 7, 9, c), dtype=np.float32)
    mean = rng.standard_normal(c, dtype=np.float32)
    var = rng.uniform(0.5, 2.0, c).astype(np.float32)
    gamma = rng.standard_normal(c, dtype=np.float32)
    beta = rng.standard_normal(c, dtype=np.float32)
    ours = np.asarray(
        N.batch_norm(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var),
                     jnp.asarray(gamma), jnp.asarray(beta), eps=1e-5)
    )
    theirs = _from_nchw(
        F.batch_norm(
            _to_nchw(x), torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(gamma), torch.from_numpy(beta), False, 0.1, 1e-5,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_sobel_matches_reference_kernels(rng):
    # Reference: fixed (Gx, Gy) 3×3 conv with zero padding (ReSIDE/sobel.py).
    x = rng.standard_normal((2, 12, 14, 1), dtype=np.float32)
    gx, gy = S.sobel_gradients(jnp.asarray(x))
    kx = torch.from_numpy(S.SOBEL_KX).view(1, 1, 3, 3)
    ky = torch.from_numpy(S.SOBEL_KY).view(1, 1, 3, 3)
    tx = _from_nchw(F.conv2d(_to_nchw(x), kx, None, 1, 1))
    ty = _from_nchw(F.conv2d(_to_nchw(x), ky, None, 1, 1))
    np.testing.assert_allclose(np.asarray(gx), tx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), ty, rtol=1e-5, atol=1e-5)
