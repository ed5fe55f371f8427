"""Native C++ batch decoder: bit-exact vs PIL, error handling."""

import numpy as np
import pytest
from PIL import Image

from efficientdepthestimation_tpu.native import (
    build_library,
    decode_depth16_batch,
    decode_rgb_batch,
    is_available,
)


@pytest.fixture(scope="module")
def native_ready():
    if not is_available():
        pytest.skip("native loader could not be built")
    return True


def test_build(native_ready):
    assert build_library() is not None


def test_rgb_png_matches_pil(native_ready, tmp_path, rng):
    paths = []
    refs = []
    for i in range(3):
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        refs.append(arr)
    out = decode_rgb_batch(paths, 48, 64)
    np.testing.assert_array_equal(out, np.stack(refs))


def test_rgba_and_gray_png(native_ready, tmp_path, rng):
    rgba = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "g.png")
    Image.fromarray(rgba).save(p1)
    Image.fromarray(gray).save(p2)
    out = decode_rgb_batch([p1, p2], 16, 16)
    np.testing.assert_array_equal(out[0], rgba[..., :3])
    np.testing.assert_array_equal(out[1], np.stack([gray] * 3, -1))


def test_jpeg_close_to_pil(native_ready, tmp_path, rng):
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    ref = np.asarray(Image.open(p))
    out = decode_rgb_batch([p], 32, 32)
    # both decode the same DCT stream; IDCT rounding may differ by ±1
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1


def test_depth16_png_exact(native_ready, tmp_path, rng):
    arr = rng.integers(0, 10000, (24, 32)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(arr, mode="I;16").save(p)
    out = decode_depth16_batch([p], 24, 32)
    np.testing.assert_array_equal(out[0], arr)


def test_depth8_png_widened(native_ready, tmp_path, rng):
    arr = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    p = str(tmp_path / "d8.png")
    Image.fromarray(arr).save(p)
    out = decode_depth16_batch([p], 24, 32)
    np.testing.assert_array_equal(out[0], arr.astype(np.uint16))


def test_failure_reporting(native_ready, tmp_path, rng):
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = str(tmp_path / "ok.png")
    Image.fromarray(arr).save(good)
    with pytest.raises(IOError):
        decode_rgb_batch([good, str(tmp_path / "missing.png")], 8, 8)
    with pytest.raises(IOError):
        decode_rgb_batch([good], 9, 9)  # wrong shape
