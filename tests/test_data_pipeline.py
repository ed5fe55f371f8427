"""Data pipeline: device preprocessing vs a PIL ground-truth of the
reference's transform stacks, dataset/batching behaviour, prefetch."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from efficientdepthestimation_tpu.data import (
    DepthPairDataset,
    VideoFrameDataset,
    batch_iterator,
    demo_preprocess,
    device_prefetch,
    eval_preprocess,
    train_preprocess,
)
from efficientdepthestimation_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop_box,
    scale_short_side_size,
)


@pytest.fixture
def nyu_fixture(tmp_path, rng):
    """Synthetic NYU-like pair: 480×640 RGB + 16-bit (test) / 8-bit (train) depth."""
    image = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    depth16 = rng.integers(500, 10000, (480, 640), dtype=np.uint16)
    depth8 = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    img_path = str(tmp_path / "rgb.png")
    d16_path = str(tmp_path / "depth16.png")
    d8_path = str(tmp_path / "depth8.png")
    Image.fromarray(image).save(img_path)
    Image.fromarray(depth16, mode="I;16").save(d16_path)
    Image.fromarray(depth8, mode="L").save(d8_path)
    return dict(image=image, depth16=depth16, depth8=depth8,
                img_path=img_path, d16_path=d16_path, d8_path=d8_path,
                tmp_path=tmp_path)


def _pil_eval_reference(image_u8, depth_u16):
    """The reference test transform stack verbatim in PIL (loaddata.py:68-85)."""
    img = Image.fromarray(image_u8)
    dep = Image.fromarray(depth_u16, mode="I;16")
    # Scale(240): landscape 480×640 → 320 wide, 240 tall
    oh, ow = scale_short_side_size(*image_u8.shape[:2], 240)
    img = img.resize((ow, oh), Image.BILINEAR)
    dep = dep.resize((ow, oh), Image.NEAREST)
    # CenterCrop([304, 228]) for both; depth NOT resized (test path)
    y1, x1 = center_crop_box(oh, ow, 228, 304)
    img = img.crop((x1, y1, 304 + x1, 228 + y1))
    dep = dep.crop((x1, y1, 304 + x1, 228 + y1))
    image = np.asarray(img).astype(np.float32) / 255.0
    image = (image - IMAGENET_MEAN) / IMAGENET_STD
    depth = np.asarray(dep).astype(np.float32) / 1000.0
    return image, depth


def test_eval_preprocess_matches_pil(nyu_fixture):
    images, depths = eval_preprocess(
        jnp.asarray(nyu_fixture["image"][None]),
        jnp.asarray(nyu_fixture["depth16"][None]),
    )
    ref_img, ref_dep = _pil_eval_reference(nyu_fixture["image"], nyu_fixture["depth16"])
    assert images.shape == (1, 228, 304, 3)
    assert depths.shape == (1, 228, 304, 1)
    # depth path is nearest (exact gather); only f32 ÷1000 rounding differs
    np.testing.assert_allclose(np.asarray(depths)[0, :, :, 0], ref_dep,
                               rtol=0, atol=2e-6)
    # image path: ≤1 uint8 level from PIL fixed-point coefficients
    diff = np.abs(np.asarray(images)[0] - ref_img)
    assert diff.max() <= 1.001 / 255.0 / IMAGENET_STD.min()
    assert (diff < 1e-6).mean() > 0.75


def test_demo_preprocess_shape(nyu_fixture):
    out = demo_preprocess(jnp.asarray(nyu_fixture["image"][None]))
    assert out.shape == (1, 228, 304, 3)


def test_train_preprocess_shapes_and_ranges(nyu_fixture):
    key = jax.random.PRNGKey(0)
    images, depths = train_preprocess(
        key,
        jnp.asarray(nyu_fixture["image"][None].repeat(2, 0)),
        jnp.asarray(nyu_fixture["depth8"][None].repeat(2, 0)),
    )
    assert images.shape == (2, 228, 304, 3)
    assert depths.shape == (2, 114, 152, 1)
    d = np.asarray(depths)
    assert d.min() >= -1.0 and d.max() <= 11.0  # metres (×10 scaling)
    # different key → different augmentation
    images2, _ = train_preprocess(
        jax.random.PRNGKey(1),
        jnp.asarray(nyu_fixture["image"][None].repeat(2, 0)),
        jnp.asarray(nyu_fixture["depth8"][None].repeat(2, 0)),
    )
    assert np.abs(np.asarray(images) - np.asarray(images2)).max() > 1e-3


def test_rotate_shear_matches_exact_bilinear():
    """The gather-free three-shear rotate (the training fast path) agrees
    with the exact one-pass bilinear rotate — which itself matches
    scipy.ndimage.rotate(order=1) exactly — to interpolation-scheme
    tolerance on smooth images (nyu_transform.py:36-49)."""
    import scipy.ndimage as ndi

    from efficientdepthestimation_tpu.data.transforms import (
        _rotate_gather,
        _rotate_shear,
    )

    rng = np.random.default_rng(3)
    base = ndi.gaussian_filter(
        rng.standard_normal((2, 48, 64, 3)).astype(np.float32), (0, 2, 2, 0))
    x = jnp.asarray(base)
    angles_np = np.array([3.7, -4.9], np.float32)
    angles = jnp.asarray(angles_np)

    gathered = np.asarray(_rotate_gather(x, angles))
    sheared = np.asarray(_rotate_shear(x, angles))

    # angle 0 is the identity (weights collapse onto tap 0)
    np.testing.assert_allclose(
        np.asarray(_rotate_shear(x, jnp.zeros(2))), base, atol=1e-5)

    # gather path is exactly scipy order-1 away from the frame edge (the
    # edge differs: per-tap zero masking vs scipy's cval for the whole sample)
    interior = (slice(None), slice(8, 40), slice(8, 56))
    for i, a in enumerate(angles_np):
        ref = np.stack(
            [ndi.rotate(base[i, ..., c], float(a), reshape=False, order=1,
                        mode="constant") for c in range(3)], -1)
        np.testing.assert_allclose(gathered[i][interior[1:]],
                                   ref[interior[1:]], atol=1e-4)

    # three-pass linear vs one-pass bilinear: small interior divergence only
    assert np.abs(gathered[interior] - sheared[interior]).max() < 0.05


def test_depth_pair_dataset_and_batching(nyu_fixture):
    csv_path = nyu_fixture["tmp_path"] / "pairs.csv"
    with open(csv_path, "w") as f:
        for _ in range(5):
            f.write(f"{nyu_fixture['img_path']},{nyu_fixture['d16_path']}\n")
    ds = DepthPairDataset(str(csv_path), is_test=True)
    assert len(ds) == 5
    batches = list(batch_iterator(ds, 2, pad_last=True))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 480, 640, 3)
    assert batches[-1]["num_valid"] == 1
    assert batches[-1]["image"].shape == (2, 480, 640, 3)  # padded


def test_video_frame_dataset(nyu_fixture):
    frames = nyu_fixture["tmp_path"] / "frames"
    os.makedirs(frames)
    for i in range(3):
        Image.fromarray(nyu_fixture["image"]).save(frames / f"{i:03d}.png")
    ds = VideoFrameDataset(str(frames))
    assert len(ds) == 3
    batches = list(batch_iterator(ds, 2))
    assert batches[0]["image"].shape == (2, 480, 640, 3)
    assert batches[1]["image"].shape == (1, 480, 640, 3)


def test_device_prefetch_order():
    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
