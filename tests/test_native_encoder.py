"""Native C++ encoders: PNG/JPEG/MJPEG-AVI round-trips + writer dispatch.

Write-side counterpart of test_native_loader.py (VERDICT r4 #4 — the E2E
was ~85% single-core host encode). Every artifact written natively must be
readable by the stacks that consume it downstream: PIL (benchmark loaders),
OpenCV VideoCapture (MTurk side-by-side videos), and our own native
decoder.
"""

import os

import numpy as np
import pytest

from efficientdepthestimation_tpu.native import encoder

pytestmark = pytest.mark.skipif(not encoder.is_available(),
                                reason="native encoder unavailable")


@pytest.fixture()
def rng():
    return np.random.default_rng(5)


def test_png_roundtrip_all_shapes(tmp_path, rng):
    from PIL import Image

    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    gray16 = rng.integers(0, 65536, (37, 53)).astype(np.uint16)

    for name, arr in (("rgb", rgb), ("gray", gray), ("gray16", gray16)):
        path = str(tmp_path / f"{name}.png")
        encoder.encode_png(path, arr, compress_level=1)
        back = np.asarray(Image.open(path))
        np.testing.assert_array_equal(back, arr, err_msg=name)

    # 16-bit PNGs also round-trip through the native decoder (the NYU test
    # depth convention both sides of the pipeline rely on)
    from efficientdepthestimation_tpu.native import decode_depth16_batch

    path = str(tmp_path / "gray16.png")
    dec = decode_depth16_batch([path], 37, 53)
    np.testing.assert_array_equal(dec[0], gray16)


def test_jpeg_rgb_and_grayscale(tmp_path):
    from PIL import Image

    # smooth content: JPEG must be near-lossless on it
    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack([xx * 4, yy * 6, (xx + yy) * 2], -1).astype(np.uint8)
    p = str(tmp_path / "a.jpg")
    encoder.encode_jpeg(p, rgb, quality=95)
    back = np.asarray(Image.open(p))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 3

    gray = ((xx + yy) * 2).astype(np.uint8)
    p = str(tmp_path / "g.jpg")
    encoder.encode_jpeg(p, gray, quality=95)
    back = np.asarray(Image.open(p))
    assert back.ndim == 2  # stays grayscale
    assert np.abs(back.astype(int) - gray.astype(int)).mean() < 3


def test_mjpeg_avi_readable_by_opencv(tmp_path):
    import cv2

    yy, xx = np.mgrid[0:48, 0:64]
    frames = np.stack(
        [np.repeat((((xx + 3 * i) % 64) * 4)[..., None], 3, -1)
         for i in range(10)], 0).astype(np.uint8)
    path = str(tmp_path / "v.avi")
    encoder.write_mjpeg_avi(path, frames, fps=24, quality=92)

    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(24.0)
    read = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        read.append(frame[:, :, ::-1])  # BGR -> RGB
    assert len(read) == 10
    err = np.abs(np.stack(read).astype(int) - frames.astype(int)).mean()
    assert err < 5  # MJPEG quality-92 on smooth content


def test_async_image_writer_uses_native_path(tmp_path, rng):
    from PIL import Image

    from efficientdepthestimation_tpu.utils import AsyncImageWriter

    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    d16 = rng.integers(0, 65536, (32, 48)).astype(np.uint16)
    p_rgb = str(tmp_path / "rgb.png")
    p_d16 = str(tmp_path / "d16.png")
    with AsyncImageWriter(num_workers=2) as w:
        w.submit(rgb, p_rgb)
        w.submit(d16, p_d16)
    np.testing.assert_array_equal(np.asarray(Image.open(p_rgb)), rgb)
    back = np.asarray(Image.open(p_d16))
    np.testing.assert_array_equal(back.astype(np.uint16), d16)

    # float arrays (not natively encodable) still go through the PIL path
    f32 = rng.random((8, 8)).astype(np.float32)
    p_f32 = str(tmp_path / "f.tiff")
    with AsyncImageWriter(num_workers=1) as w:
        w.submit(f32, p_f32)
    assert os.path.isfile(p_f32)


def test_streaming_avi_writer_and_async_wrapper(tmp_path):
    """NativeVideoWriter streams arbitrarily many frames (count patched at
    close) and AsyncVideoWriter routes BGR frames through it in order."""
    import cv2

    from efficientdepthestimation_tpu.native.encoder import NativeVideoWriter
    from efficientdepthestimation_tpu.utils import AsyncVideoWriter

    yy, xx = np.mgrid[0:32, 0:48]

    p1 = str(tmp_path / "stream.avi")
    with NativeVideoWriter(p1, (48, 32), fps=30) as w:
        for i in range(7):
            w.write(np.repeat((((xx + i) % 48) * 5)[..., None],
                              3, -1).astype(np.uint8))
    cap = cv2.VideoCapture(p1)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(30.0)

    # AsyncVideoWriter: out-of-order submits come out in order; frames are
    # BGR (cv2 convention), round-tripped through MJPEG back to BGR
    p2 = str(tmp_path / "async.avi")
    frames = [np.full((32, 48, 3), 20 * (i + 1), np.uint8)
              for i in range(5)]
    w = AsyncVideoWriter(p2, (48, 32), fps=24.0)
    w.submit(frames[1], index=1)
    w.submit(frames[0], index=0)
    for i in (2, 3, 4):
        w.submit(frames[i], index=i)
    w.cleanup()
    cap = cv2.VideoCapture(p2)
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(int(f.mean()))
    assert len(got) == 5
    assert got == sorted(got)  # ordered by index despite out-of-order submit
    assert abs(got[0] - 20) < 4 and abs(got[-1] - 100) < 4
