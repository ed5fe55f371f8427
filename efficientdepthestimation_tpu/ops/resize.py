"""Resampling ops with exact PyTorch / PIL semantics, expressed as matmuls.

TPU-first design: bilinear interpolation is *separable*, so a resize
``(H_in, W_in) -> (H_out, W_out)`` is two small dense matmuls

    y = A_h @ x @ A_w.T        (per batch/channel, via einsum)

with interpolation matrices built host-side at trace time (shapes are
static under jit). XLA lowers the einsums onto the MXU — far faster on TPU
than the gather formulation, and bit-exact in f32.

Semantics reproduced (and unit-tested against torch / PIL):

  * ``resize_bilinear_align_corners``: ``torch.nn.functional.interpolate(
    mode='bilinear', align_corners=True)`` — used by every decoder and eval
    upsample in the reference (e.g. ReSIDE/models/modules.py:34,
    ReSIDE/train.py:273-276, ReSIDE/models/lasinger2019.py:244,289).
  * ``resize_nearest_torch``: torch nearest (floor of ``i * in/out``).
  * ``pil_resize``: PIL's antialiased convolution resampler (NEAREST /
    BILINEAR / BICUBIC) — used by the host preprocessing (Scale / CenterCrop,
    ReSIDE/nyu_transform.py:97-151) and replicated here so preprocessing can
    run batched on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bilinear_align_corners_matrix",
    "resize_bilinear_align_corners",
    "upsample_align_corners",
    "resize_nearest_torch",
    "pil_resize_matrix",
    "pil_nearest_indices",
    "pil_resize",
]


# ---------------------------------------------------------------------------
# torch align_corners=True bilinear
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def bilinear_align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix for 1-D align_corners=True bilinear.

    torch maps output index ``i`` to source coordinate
    ``i * (in_size - 1) / (out_size - 1)`` (and 0 when out_size == 1).
    """
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        mat[0, 0] = 1.0
        return mat.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat.astype(np.float32)


def _apply_separable(x: jax.Array, mat_h: np.ndarray, mat_w: np.ndarray) -> jax.Array:
    """Apply 1-D resampling matrices along H and W of an NHWC tensor."""
    a_h = jnp.asarray(mat_h, dtype=x.dtype)
    a_w = jnp.asarray(mat_w, dtype=x.dtype)
    # f32 inputs keep full precision on the MXU (TPU default is bf16 passes).
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    # (N,h,w,C) -> (N,H,w,C) -> (N,H,W,C); both contractions hit the MXU.
    x = jnp.einsum("Hh,nhwc->nHwc", a_h, x, precision=prec)
    x = jnp.einsum("Ww,nhwc->nhWc", a_w, x, precision=prec)
    return x


def resize_bilinear_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize matching torch ``align_corners=True``."""
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_separable(
        x,
        bilinear_align_corners_matrix(h_in, h_out),
        bilinear_align_corners_matrix(w_in, w_out),
    )


def upsample_align_corners(x: jax.Array, factor: int = 2) -> jax.Array:
    """Upsample NHWC by an integer factor with align_corners=True semantics."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (h * factor, w * factor))


# ---------------------------------------------------------------------------
# torch nearest
# ---------------------------------------------------------------------------


def resize_nearest_torch(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NHWC nearest resize matching torch ``interpolate(mode='nearest')``."""
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    rows = np.minimum((np.arange(h_out) * (h_in / h_out)).astype(np.int64), h_in - 1)
    cols = np.minimum((np.arange(w_out) * (w_in / w_out)).astype(np.int64), w_in - 1)
    return x[:, rows][:, :, cols]


# ---------------------------------------------------------------------------
# PIL convolution resampler (antialiased)
# ---------------------------------------------------------------------------


def _pil_filter(name: str):
    name = name.lower()
    if name == "bilinear":
        def triangle(x):
            x = np.abs(x)
            return np.where(x < 1.0, 1.0 - x, 0.0)

        return triangle, 1.0
    if name == "bicubic":
        # Keys cubic with a = -0.5 (Pillow's default bicubic kernel).
        a = -0.5

        def cubic(x):
            x = np.abs(x)
            return np.where(
                x < 1.0,
                ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
                np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
            )

        return cubic, 2.0
    if name == "box":
        def box(x):
            return np.where((x > -0.5) & (x <= 0.5), 1.0, 0.0)

        return box, 0.5
    raise ValueError(f"Unsupported PIL filter '{name}'")


@functools.lru_cache(maxsize=None)
def pil_resize_matrix(in_size: int, out_size: int, filter: str = "bilinear") -> np.ndarray:
    """Dense (out_size, in_size) matrix reproducing PIL's 1-D resampler.

    PIL widens the filter support by the scale factor when downsampling
    (antialiasing) and normalizes weights per output pixel.
    """
    fn, support = _pil_filter(filter)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support * filterscale
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        j = np.arange(lo, hi)
        w = fn((j + 0.5 - center) / filterscale)
        total = w.sum()
        if total != 0:
            w = w / total
        mat[i, lo:hi] = w
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def pil_nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Source index per output pixel for PIL NEAREST resampling."""
    scale = in_size / out_size
    idx = ((np.arange(out_size) + 0.5) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def pil_resize(
    x: jax.Array,
    size: tuple[int, int],
    filter: str = "bilinear",
    quantize_uint8: bool = False,
) -> jax.Array:
    """NHWC resize matching ``PIL.Image.resize`` (float path).

    ``quantize_uint8`` rounds and clips to [0, 255] after resampling,
    matching the uint8 storage PIL applies between pipeline stages (the
    reference resizes uint8 RGB images; the rounding is observable).
    """
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) != (h_out, w_out):
        if filter.lower() == "nearest":
            rows = pil_nearest_indices(h_in, h_out)
            cols = pil_nearest_indices(w_in, w_out)
            x = x[:, rows][:, :, cols]
        else:
            x = _apply_separable(
                x,
                pil_resize_matrix(h_in, h_out, filter),
                pil_resize_matrix(w_in, w_out, filter),
            )
    if quantize_uint8:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x
