"""I/O utilities: .raw codec, COLMAP model round-trips, PLY, async writers."""

import os

import numpy as np
import pytest

from efficientdepthestimation_tpu.utils import AsyncImageWriter, Timer
from efficientdepthestimation_tpu.utils import colmap_io as C
from efficientdepthestimation_tpu.utils import image_io as IO
from efficientdepthestimation_tpu.utils.pointcloud import (
    read_ply,
    render_point_cloud,
    unproject_depth,
    write_ply,
)


@pytest.mark.parametrize("shape", [(7, 9), (7, 9, 3)])
def test_raw_float32_round_trip(tmp_path, rng, shape):
    image = rng.standard_normal(shape).astype(np.float32)
    path = str(tmp_path / "img.raw")
    IO.save_raw_float32_image(path, image)
    out = IO.load_raw_float32_image(path)
    np.testing.assert_array_equal(out, image)


def test_raw_header_layout(tmp_path):
    # freadimg-compatible header: h, w int32; cv_type int32; pixel_size uint64
    image = np.ones((2, 3, 4), np.float32)
    path = str(tmp_path / "img.raw")
    IO.save_raw_float32_image(path, image)
    import struct

    with open(path, "rb") as f:
        h, w, cv_type = struct.unpack("iii", f.read(12))
        (pixel_size,) = struct.unpack("Q", f.read(8))
    assert (h, w) == (2, 3)
    assert cv_type == 5 + (3 << 3)
    assert pixel_size == 16


def test_save_image_dispatch(tmp_path, rng):
    img = rng.uniform(size=(5, 6, 3)).astype(np.float32)
    IO.save_image(str(tmp_path / "a.raw"), img)
    IO.save_image(str(tmp_path / "a.png"), img)
    assert os.path.exists(tmp_path / "a.raw")
    assert os.path.exists(tmp_path / "a.png")


def _tiny_model():
    cameras = {1: C.Camera(1, "SIMPLE_PINHOLE", 640, 480, [525.0, 320.0, 240.0])}
    images = {
        2: C.Image(2, [1.0, 0.0, 0.0, 0.0], [0.1, 0.2, 0.3], 1, "frame.png",
                   np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([7, -1])),
    }
    points = {
        7: C.Point3D(7, [0.5, -0.5, 2.0], [255, 128, 0], 0.25,
                     np.array([2]), np.array([0])),
    }
    return cameras, images, points


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_colmap_model_round_trip(tmp_path, ext):
    cameras, images, points = _tiny_model()
    C.write_model(cameras, images, points, str(tmp_path), ext)
    cams2, imgs2, pts2 = C.read_model(str(tmp_path), ext)
    cam = cams2[1]
    assert (cam.width, cam.height) == (640, 480)
    assert cam.focal_length == pytest.approx(525.0)
    img = imgs2[2]
    assert img.name == "frame.png"
    assert img.points2D[0].point3d_id == 7
    np.testing.assert_allclose(img.tvec, [0.1, 0.2, 0.3])
    pt = pts2[7]
    np.testing.assert_allclose(pt.xyz, [0.5, -0.5, 2.0])
    assert int(pt.r) == 255 and int(pt.b) == 0


def test_camera_json_round_trip(tmp_path):
    cam = C.Camera(3, "SIMPLE_PINHOLE", 320, 240, [260.0, 160.0, 120.0])
    path = str(tmp_path / "camera.json")
    cam.save_json(path)
    cam2 = C.Camera.load_json(path)
    np.testing.assert_allclose(cam2.get_matrix(), cam.get_matrix())
    assert np.allclose(cam.get_inverse_matrix() @ cam.get_matrix(), np.eye(3),
                       atol=1e-12)


def test_qvec_rotmat_round_trip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = C.qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(C.rotmat2qvec(R), q, atol=1e-8)


@pytest.mark.parametrize("binary", [True, False])
def test_ply_round_trip(tmp_path, rng, binary):
    points = rng.standard_normal((20, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (20, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, points, colors, binary=binary)
    pts2, col2 = read_ply(path)
    np.testing.assert_allclose(pts2, points, atol=1e-5)
    np.testing.assert_array_equal(col2, colors)


def test_unproject_depth_geometry():
    depth = np.full((4, 6), 2.0, np.float32)
    depth[0, 0] = 0.0  # dropped
    points, rgb = unproject_depth(depth, np.ones((4, 6, 3)) * 0.5,
                                  fx=10.0, fy=10.0, cx=3.0, cy=2.0,
                                  flip_vertical=False)
    assert points.shape == (23, 3)
    assert np.allclose(points[:, 2], 2.0)
    # pixel (u=3, v=2) maps to the optical axis
    on_axis = points[(np.abs(points[:, 0]) < 1e-6) & (np.abs(points[:, 1]) < 1e-6)]
    assert len(on_axis) == 1


def test_render_point_cloud(rng):
    points = rng.standard_normal((100, 3)).astype(np.float32)
    img = render_point_cloud(points, None, (32, 32))
    assert img.shape == (32, 32, 3)
    assert (img != 1.0).any()  # something was splatted


def test_async_image_writer(tmp_path, rng):
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    with AsyncImageWriter(2) as writer:
        for i in range(5):
            writer.submit(img, str(tmp_path / f"{i}.png"))
    assert len(os.listdir(tmp_path)) == 5


def test_timer_context():
    with Timer() as t:
        pass
    assert t.elapsed.total_seconds() >= 0
    assert t.stop_time is not None
