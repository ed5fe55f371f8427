"""Golden tests: resize ops vs torch.nn.functional.interpolate and PIL."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F
from PIL import Image

from efficientdepthestimation_tpu.ops import resize as R


SIZES = [
    ((8, 10), (15, 19)),     # upsample
    ((114, 152), (228, 304)),  # decoder final 2x
    ((29, 38), (57, 76)),    # odd sizes
    ((240, 320), (120, 160)),  # downsample
    ((5, 7), (5, 7)),        # identity
    ((9, 9), (1, 1)),        # degenerate out=1
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(R.resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 1), dtype=np.float32)
    ours = np.asarray(R.resize_nearest_torch(jnp.asarray(x), out_hw))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("filt,pil_filt", [
    ("bilinear", Image.BILINEAR),
    ("bicubic", Image.BICUBIC),
])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((480, 640), (240, 320)),   # Scale(240) landscape NYU
    ((228, 304), (114, 152)),   # CenterCrop depth resize
    ((60, 80), (90, 120)),      # upsample
])
def test_pil_float_resize(rng, filt, pil_filt, in_hw, out_hw):
    # Float path ('F' mode images): PIL computes in float64 — expect tight match.
    x = rng.uniform(0.0, 10.0, size=in_hw).astype(np.float32)
    img = Image.fromarray(x, mode="F").resize((out_hw[1], out_hw[0]), pil_filt)
    theirs = np.asarray(img)
    ours = np.asarray(R.pil_resize(jnp.asarray(x[None, :, :, None]), out_hw, filt))[0, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((480, 640), (240, 320)),
    ((13, 17), (7, 5)),
])
def test_pil_nearest(rng, in_hw, out_hw):
    x = rng.integers(0, 255, size=in_hw).astype(np.float32)
    img = Image.fromarray(x, mode="F").resize((out_hw[1], out_hw[0]), Image.NEAREST)
    theirs = np.asarray(img)
    ours = np.asarray(R.pil_resize(jnp.asarray(x[None, :, :, None]), out_hw, "nearest"))[0, :, :, 0]
    np.testing.assert_array_equal(ours, theirs)


def test_pil_uint8_resize_close(rng):
    # uint8 path: PIL quantizes filter coefficients; allow 1 level of error.
    x = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    img = Image.fromarray(x).resize((320, 240), Image.BILINEAR)
    theirs = np.asarray(img).astype(np.float32)
    ours = np.asarray(
        R.pil_resize(
            jnp.asarray(x[None].astype(np.float32)), (240, 320), "bilinear", quantize_uint8=True
        )
    )[0]
    # PIL quantizes filter coefficients to fixed point on the uint8 path;
    # expect at most one uint8 level of difference (≪ parity budget).
    assert np.abs(ours - theirs).max() <= 1.0
    assert (ours == theirs).mean() > 0.8
