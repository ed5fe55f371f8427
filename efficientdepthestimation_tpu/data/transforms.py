"""Batched, jit-able NYU preprocessing — the TPU-native replacement for the
reference's per-sample PIL/torch transform stacks.

The reference preprocesses one sample at a time on 4 CPU workers
(ReSIDE/loaddata.py:32-85, nyu_transform.py). Here the host only decodes
PNGs to uint8/uint16 arrays; everything else — resize (exact PIL semantics
via the matmul resampler), crop, depth rescaling, normalization, and the
train-time augmentations — runs batched on device inside one jit program.

Pipelines (shapes are static per pipeline, so each compiles once):

  * eval  (loaddata.py:68-85):   Scale(240) → CenterCrop(304×228) →
    ToTensor(is_test=True: 16-bit depth ÷ 1000) → Normalize.
  * train (loaddata.py:32-65):   Scale(240) → RandomHorizontalFlip →
    RandomRotate(5°) → CenterCrop(image 304×228, depth → 152×114) →
    ToTensor(8-bit depth × 10) → Lighting(0.1, ImageNet PCA) → ColorJitter →
    Normalize.
  * demo  (loaddata_demo.py:23-38): Scale(320×240) → CenterCrop(304×228) →
    ToTensor → Normalize.

Known divergence (documented): RandomRotate uses a Paeth three-shear
resampling on device (per-pass linear interpolation, gather-free — see
``_rotate_shear``) where the reference uses scipy's order-2 spline
(nyu_transform.py:36-49); the augmentation is random so this does not affect
eval parity. ``_rotate_gather`` keeps the exact one-pass bilinear formulation
for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.ops.resize import pil_resize

__all__ = [
    "IMAGENET_MEAN", "IMAGENET_STD", "IMAGENET_PCA_EIGVAL", "IMAGENET_PCA_EIGVEC",
    "normalize_imagenet", "scale_short_side", "center_crop",
    "eval_preprocess", "train_preprocess", "demo_preprocess",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# loaddata.py:33-40
IMAGENET_PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
IMAGENET_PCA_EIGVEC = np.array(
    [[-0.5675, 0.7192, 0.4009],
     [-0.5808, -0.0045, -0.8140],
     [-0.5836, -0.6948, 0.4203]], np.float32)


def normalize_imagenet(images: jax.Array) -> jax.Array:
    """(x - mean) / std on [0,1] NHWC images."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def scale_short_side_size(h: int, w: int, size: int) -> tuple[int, int]:
    """PIL Scale(size) output dims (nyu_transform.py:105-116)."""
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def center_crop_box(h: int, w: int, th: int, tw: int) -> tuple[int, int]:
    """Top-left corner of a PIL-arithmetic center crop (nyu_transform.py:146-147)."""
    x1 = int(round((w - tw) / 2.0))
    y1 = int(round((h - th) / 2.0))
    return y1, x1


def scale_short_side(x: jax.Array, size: int, filter: str,
                     quantize_uint8: bool) -> jax.Array:
    n, h, w, c = x.shape
    oh, ow = scale_short_side_size(h, w, size)
    return pil_resize(x, (oh, ow), filter, quantize_uint8=quantize_uint8)


def center_crop(x: jax.Array, th: int, tw: int) -> jax.Array:
    n, h, w, c = x.shape
    if (h, w) == (th, tw):
        return x
    y1, x1 = center_crop_box(h, w, th, tw)
    return x[:, y1:y1 + th, x1:x1 + tw, :]


# ---------------------------------------------------------------------------
# eval / demo pipelines
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("crop_hw",))
def eval_preprocess(images_u8: jax.Array, depths_u16: jax.Array,
                    crop_hw: tuple[int, int] = (228, 304)):
    """Test-split preprocessing (loaddata.py:68-85).

    images_u8: (N, 480, 640, 3) uint8; depths_u16: (N, 480, 640[, 1]) uint16
    (millimetres). Returns normalized images (N,228,304,3) f32 and depths in
    metres (N,228,304,1).
    """
    if depths_u16.ndim == 3:
        depths_u16 = depths_u16[..., None]
    images = scale_short_side(images_u8.astype(jnp.float32), 240, "bilinear", True)
    depths = scale_short_side(depths_u16.astype(jnp.float32), 240, "nearest", False)
    images = center_crop(images, *crop_hw)
    depths = center_crop(depths, *crop_hw)
    images = normalize_imagenet(images / 255.0)
    depths = depths / 1000.0  # 16-bit test depths are mm (nyu_transform.py:173)
    return images, depths


@functools.partial(jax.jit, static_argnames=("crop_hw",))
def eval_preprocess_image_only(images_u8: jax.Array,
                               crop_hw: tuple[int, int] = (228, 304)) -> jax.Array:
    """Image half of the eval pipeline (for inference-only paths)."""
    images = scale_short_side(images_u8.astype(jnp.float32), 240, "bilinear", True)
    images = center_crop(images, *crop_hw)
    return normalize_imagenet(images / 255.0)


@functools.partial(jax.jit, static_argnames=("crop_hw", "scale_wh"))
def demo_preprocess(images_u8: jax.Array, crop_hw: tuple[int, int] = (228, 304),
                    scale_wh: tuple[int, int] = (320, 240)):
    """Single-image/demo pipeline (loaddata_demo.py:23-38): fixed-size scale."""
    w, h = scale_wh
    images = pil_resize(images_u8.astype(jnp.float32), (h, w), "bilinear",
                        quantize_uint8=True)
    images = center_crop(images, *crop_hw)
    return normalize_imagenet(images / 255.0)


# ---------------------------------------------------------------------------
# train pipeline (randomized, keyed by jax.random)
# ---------------------------------------------------------------------------


def _fractional_shift(x: jax.Array, s: jax.Array, axis: int,
                      max_abs: float) -> jax.Array:
    """Per-line fractional translation along ``axis`` (1=y or 2=x), zero-fill.

    ``out[..., p] = in[..., p + s(line)]`` with linear interpolation in the
    fractional part of ``s``. ``s`` has shape (N, L) where L is the length of
    the *other* spatial axis (each row gets its own x-shift, or each column
    its own y-shift). Implemented as a static sum of rolled copies weighted
    per line — rolls are slice+concat and the weighted accumulation fuses, so
    this runs at HBM bandwidth instead of the gather unit (TPU gathers are
    ~40x slower; measured in perf/train_profile.py). ``max_abs`` bounds |s|
    and fixes the static tap range.
    """
    size = x.shape[axis]
    k0 = jnp.floor(s)
    if axis == 1:
        expand = lambda t: t[:, None, :, None]   # (N,W) -> per-column y-shift
    else:
        expand = lambda t: t[:, :, None, None]   # (N,H) -> per-row x-shift
    f = expand(s - k0)
    pos = jnp.arange(size)
    taps = int(np.ceil(max_abs))
    out = jnp.zeros_like(x)
    for k in range(-taps, taps + 1):
        # tap k samples in[p + k]: weight (1-f) when k == floor(s), f when
        # k == floor(s)+1; out-of-range source positions contribute zero.
        wk = (expand(jnp.where(k0 == k, 1.0, 0.0)) * (1.0 - f)
              + expand(jnp.where(k0 == k - 1, 1.0, 0.0)) * f)
        valid = (pos + k >= 0) & (pos + k < size)
        valid = valid[None, :, None, None] if axis == 1 else valid[None, None, :, None]
        out = out + jnp.roll(x, -k, axis) * jnp.where(valid, wk, 0.0)
    return out


def _rotate_shear(x: jax.Array, angle_deg: jax.Array,
                  max_angle_deg: float = 5.0) -> jax.Array:
    """Rotate an NHWC batch about the image centre (per-sample angles) with
    the Paeth three-shear decomposition: Sx(a) . Sy(b) . Sx(a) with
    a = tan(theta/2), b = -sin(theta) equals the inverse-map rotation the
    reference's ``scipy.ndimage.rotate`` applies (nyu_transform.py:36-49).

    Each shear is a per-line 1-D fractional shift (no gathers) so the whole
    rotation runs at HBM bandwidth; the gather formulation
    (``_rotate_gather``) costs ~200 ms per call at (64,240,320) on v5e vs
    ~5 ms for this. Interpolation is per-pass linear (three-pass) rather than
    one-pass bilinear — both diverge comparably from the reference's order-2
    spline, which is fine for a *random* augmentation (documented at module
    top). Zero-filled outside the source frame, like ``reshape=False``
    rotate.
    """
    n, h, w, c = x.shape
    theta = -angle_deg * jnp.pi / 180.0  # match _rotate_gather's convention
    max_t = abs(max_angle_deg) * np.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yc = jnp.arange(h, dtype=jnp.float32) - cy     # (H,)
    xc = jnp.arange(w, dtype=jnp.float32) - cx     # (W,)
    a = jnp.tan(theta / 2.0)[:, None]              # (N,1)
    b = -jnp.sin(theta)[:, None]
    max_a = np.tan(max_t / 2.0) * max(cy, h - 1 - cy)
    max_b = np.sin(max_t) * max(cx, w - 1 - cx)
    # src = Sx(a).Sy(b).Sx(a) . dest applied as three sampling passes.
    x = _fractional_shift(x, a * yc[None, :], axis=2, max_abs=max_a)
    x = _fractional_shift(x, b * xc[None, :], axis=1, max_abs=max_b)
    x = _fractional_shift(x, a * yc[None, :], axis=2, max_abs=max_a)
    return x


def _rotate_gather(x: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Rotate NHWC batch about the image centre, zero-filled, per-sample angle.

    Exact one-pass bilinear resampling via 4-neighbour gathers. Kept as the
    reference implementation for tests; the training pipeline uses
    ``_rotate_shear`` (gathers are ~40x slower on TPU).
    """
    n, h, w, c = x.shape
    theta = -angle_deg * jnp.pi / 180.0  # ndimage rotates CCW for positive angle
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    fy = src_y - y0
    fx = src_x - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, ys, xs: img[ys, xs])(x, yi, xi)
        return jnp.where(valid[..., None], vals, 0.0)

    out = (gather(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
           + gather(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
           + gather(y0 + 1, x0) * (fy * (1 - fx))[..., None]
           + gather(y0 + 1, x0 + 1) * (fy * fx)[..., None])
    return out


def _grayscale(img: jax.Array) -> jax.Array:
    """nyu_transform.py:242-249 luma weights."""
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.stack([g, g, g], axis=-1)


@functools.partial(jax.jit, static_argnames=("crop_hw", "depth_hw"))
def train_preprocess(key: jax.Array, images_u8: jax.Array, depths_u8: jax.Array,
                     crop_hw: tuple[int, int] = (228, 304),
                     depth_hw: tuple[int, int] | None = None):
    """Training preprocessing + augmentation (loaddata.py:32-65), batched.

    images_u8: (N,480,640,3) uint8; depths_u8: (N,480,640[,1]) uint8 (depth
    stored ×25.5/m in 8-bit train PNGs; ToTensor maps /255×10 → metres).
    ``depth_hw`` defaults to half the crop — the decoder's output resolution
    (152×114 for the reference's 304×228 crop, nyu_transform.py:121-151).
    """
    if depth_hw is None:
        depth_hw = (crop_hw[0] // 2, crop_hw[1] // 2)
    if depths_u8.ndim == 3:
        depths_u8 = depths_u8[..., None]
    n = images_u8.shape[0]
    (k_flip, k_rot, k_light, k_order, k_b, k_c, k_s) = jax.random.split(key, 7)

    # Scale(240)
    images = scale_short_side(images_u8.astype(jnp.float32), 240, "bilinear", True)
    depths = scale_short_side(depths_u8.astype(jnp.float32), 240, "nearest", False)

    # RandomHorizontalFlip (p=0.5, shared between image and depth)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)
    depths = jnp.where(flip[:, None, None, None], depths[:, :, ::-1], depths)

    # RandomRotate(±5°) — three-shear on device (reference: scipy spline
    # order 2). One fused 4-channel call: image and depth share the shear
    # weight computation and the memory passes.
    angles = jax.random.uniform(k_rot, (n,), minval=-5.0, maxval=5.0)
    rotated = _rotate_shear(jnp.concatenate([images, depths], axis=-1), angles)
    images = jnp.clip(jnp.round(rotated[..., :3]), 0, 255)
    depths = rotated[..., 3:]

    # CenterCrop: image → crop_hw, depth → crop then resize to depth_hw
    images = center_crop(images, *crop_hw)
    depths = center_crop(depths, *crop_hw)
    depths = pil_resize(depths, depth_hw, "bicubic")  # PIL resize default

    # ToTensor: [0,1]; train depths ×10 → metres (nyu_transform.py:175)
    images = images / 255.0
    depths = depths / 255.0 * 10.0

    # Lighting(alphastd=0.1) with ImageNet PCA (nyu_transform.py:219-239)
    alpha = jax.random.normal(k_light, (n, 3)) * 0.1
    eigvec = jnp.asarray(IMAGENET_PCA_EIGVEC)
    eigval = jnp.asarray(IMAGENET_PCA_EIGVAL)
    rgb = jnp.sum(eigvec[None] * alpha[:, None, :] * eigval[None, None, :], axis=-1)
    images = images + rgb[:, None, None, :]

    # ColorJitter: brightness/contrast/saturation lerps in random order
    # (nyu_transform.py:252-315); alphas ~ U(-0.4, 0.4) per sample.
    a_b = jax.random.uniform(k_b, (n, 1, 1, 1), minval=-0.4, maxval=0.4)
    a_c = jax.random.uniform(k_c, (n, 1, 1, 1), minval=-0.4, maxval=0.4)
    a_s = jax.random.uniform(k_s, (n, 1, 1, 1), minval=-0.4, maxval=0.4)

    def brightness(img):
        return img * (1.0 - a_b)  # lerp(img, 0, alpha)

    def contrast(img):
        gs_mean = jnp.mean(_grayscale(img), axis=(1, 2, 3), keepdims=True)
        return img + a_c * (gs_mean - img)

    def saturation(img):
        return img + a_s * (_grayscale(img) - img)

    order = jax.random.permutation(k_order, 3)
    branches = [
        lambda im: brightness(im), lambda im: contrast(im), lambda im: saturation(im)
    ]
    for slot in range(3):
        images = jax.lax.switch(order[slot], branches, images)

    images = normalize_imagenet(images)
    return images, depths
