"""Fused upsample→conv rewrite: exactness vs the direct path."""

import numpy as np
import pytest

import jax.numpy as jnp

from efficientdepthestimation_tpu.ops.conv import conv2d
from efficientdepthestimation_tpu.ops.fused import should_fuse, upsample_conv
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners


@pytest.mark.parametrize("in_hw,out_hw,cin,cout", [
    ((8, 10), (114, 152), 64, 16),   # MFF-style: huge upscale, big reduction
    ((15, 19), (114, 152), 24, 16),
    ((57, 76), (114, 152), 12, 8),   # 2× upscale
    ((7, 9), (14, 19), 20, 10),      # odd sizes
])
def test_upsample_conv_matches_direct(rng, in_hw, out_hw, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, *in_hw, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * 0.1)
    direct = conv2d(resize_bilinear_align_corners(x, out_hw), k, stride=1, padding=2)
    fused = upsample_conv(x, k, out_hw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_upsample_conv_pair_matches_direct(rng):
    from efficientdepthestimation_tpu.ops.fused import upsample_conv_pair

    in_hw, out_hw, cin, cout = (15, 19), (29, 38), 24, 12
    x = jnp.asarray(rng.standard_normal((2, *in_hw, cin)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * 0.1)
    up = resize_bilinear_align_corners(x, out_hw)
    b1, b2 = upsample_conv_pair(x, k1, k2, out_hw)
    np.testing.assert_allclose(
        np.asarray(b1), np.asarray(conv2d(up, k1, stride=1, padding=2)),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(b2), np.asarray(conv2d(up, k2, stride=1, padding=2)),
        rtol=1e-4, atol=1e-4)


def test_should_fuse_heuristic():
    # MFF up4 for RN50: 2048ch 8×10 → 114×152, 16 out: fuse
    assert should_fuse((8, 10), (114, 152), 2048, 16)
    # decoder 2× step with channel halving: direct
    assert not should_fuse((57, 76), (114, 152), 128, 64)


def test_hu_model_unchanged_by_fusion(rng):
    """The fused path must not change HU model outputs (vs torch parity is
    covered separately; here: same params, same result at f32 tolerance)."""
    import jax

    from efficientdepthestimation_tpu.models import build_model

    model = build_model("resnet18", "hu2018")
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 32, 48, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("in_hw,out_hw,cin,cout", [
    ((9, 11), (18, 22), 16, 8),      # 2× (D.up4-shaped, small)
    ((7, 9), (13, 19), 12, 16),      # odd sizes, odd tile split
])
def test_upsample_conv_pallas_matches_direct(rng, in_hw, out_hw, cin, cout):
    """VMEM-resident Pallas direct path ≡ XLA resize→conv (interpret mode)."""
    import jax

    from efficientdepthestimation_tpu.ops.pallas.upproj import (
        upsample_conv_pallas,
    )

    x = jnp.asarray(rng.standard_normal((2, *in_hw, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * 0.1)
    ref = conv2d(resize_bilinear_align_corners(x, out_hw), k, stride=1, padding=2)
    out = upsample_conv_pallas(x, k, out_hw, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # gradient falls back to the XLA composition: must match exactly
    f = lambda xx, kk: jnp.sum(upsample_conv_pallas(xx, kk, out_hw, True) ** 2)
    g = lambda xx, kk: jnp.sum(conv2d(
        resize_bilinear_align_corners(xx, out_hw), kk, stride=1, padding=2) ** 2)
    gx1, gk1 = jax.grad(f, (0, 1))(x, k)
    gx2, gk2 = jax.grad(g, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("block_diag", [False, True])
def test_mff_merged_matches_module(rng, block_diag):
    """mff_apply_merged (grouped/block-diagonal tail merge) ≡ MFF.apply in
    eval mode, reading the identical variable tree."""
    import jax

    from efficientdepthestimation_tpu.models.hu2018 import MFF, mff_apply_merged

    taps = [
        jnp.asarray(rng.standard_normal((2, 16, 24, 16)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 8, 12, 32)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 6, 64)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 2, 3, 128)).astype(np.float32)),
    ]
    size = (32, 48)
    mff = MFF()
    variables = mff.init(jax.random.PRNGKey(0), taps, size)
    # non-trivial BN stats so the eval math is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim == 1 else v, variables)

    ref = mff.apply(variables, taps, size, False)
    out = mff_apply_merged(variables, taps, size, block_diag=block_diag)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
