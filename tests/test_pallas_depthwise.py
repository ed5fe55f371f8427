"""Pallas fused depthwise+BN+swish kernel vs the unfused op composition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.ops.conv import conv2d, same_padding_static
from efficientdepthestimation_tpu.ops.pallas.depthwise import (
    depthwise_bn_swish,
    fold_bn,
)


def _reference(x, taps, scale, bias, stride, padding):
    kern = taps[:, :, None, :]  # (kh, kw, 1, C)
    y = conv2d(x, kern, stride=stride, padding=padding, groups=x.shape[-1])
    y = y.astype(jnp.float32) * scale + bias
    y = y * jax.nn.sigmoid(y)
    return y


@pytest.mark.parametrize("k,stride,c,hw", [
    (3, (1, 1), 32, (19, 27)),
    (5, (1, 1), 48, (15, 19)),
    (3, (2, 2), 16, (21, 26)),   # even/odd mixed, asymmetric same padding
    (5, (2, 2), 32, (29, 38)),
])
def test_kernel_matches_unfused(rng, k, stride, c, hw):
    h, w = hw
    pad = same_padding_static((224, 224), (k, k), stride)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((k, k, c)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    ref = _reference(x, taps, scale, bias, stride, pad)
    y, sums = depthwise_bn_swish(x, taps, scale, bias, stride=stride,
                                 padding=pad, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # SE feed: spatial sums of the activated output, per (batch, channel)
    np.testing.assert_allclose(np.asarray(sums),
                               np.asarray(jnp.sum(ref, axis=(1, 2))),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_encoder_matches_module(rng):
    """efficientnet_apply_fused (Pallas fused-MBConv hot path) reproduces
    EfficientNetFeatures.apply exactly on the same randomized variable tree,
    including running-stat BN folding, SE-from-sums, taps and residuals."""
    from efficientdepthestimation_tpu.models.efficientnet import (
        EfficientNetFeatures,
        efficientnet_apply_fused,
    )

    model = EfficientNetFeatures("efficientnet-b0")
    x0 = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0)
    # randomize params AND running stats so the BN fold is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    leaves = [jnp.asarray(rng.uniform(0.2, 1.0, l.shape), l.dtype)
              for l in leaves]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    ref = model.apply(variables, x, False)
    out = efficientnet_apply_fused(variables, x, "efficientnet-b0",
                                   interpret=True)
    assert len(out) == len(ref) == 4
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_channel_tiling_covers_all_tiles(rng):
    """C larger than one tile: every channel tile must be computed."""
    c, h, w = 96, 9, 11
    pad = ((1, 1), (1, 1))
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    ref = _reference(x, taps, scale, bias, (1, 1), pad)
    y, _ = depthwise_bn_swish(x, taps, scale, bias, stride=(1, 1),
                              padding=pad, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
