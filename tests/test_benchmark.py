"""Benchmark harness: metric golden tests, datasets, renderer, mini e2e run."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F
from PIL import Image

from efficientdepthestimation_tpu.benchmark.datasets import (
    DepthDataset,
    ImageFolderDataset,
    MidasResize,
    NestedImageFolderDataset,
    RatioCenterCrop,
    nyu_eval_sample,
)
from efficientdepthestimation_tpu.benchmark.depth_model import (
    FlatDepthEstimator,
    ReSIDEModel,
)
from efficientdepthestimation_tpu.benchmark.metrics import (
    VisualMetricsTracker,
    gaussian_kernel_1d,
    mifd,
    psnr,
    ssim,
)
from efficientdepthestimation_tpu.benchmark.noise import create_noisy_depth_maps, perlin
from efficientdepthestimation_tpu.benchmark.renderer import (
    Compose,
    reference_camera_animation,
    render_novel_views,
)


def _torch_ssim(img1, img2):
    """The reference SSIM verbatim (benchmark.py:32-134)."""
    kernel_size, sigma = 11, 1.5
    radius = kernel_size // 2
    x = torch.arange(-radius, radius + 1).float()
    k1 = torch.exp(-0.5 / sigma ** 2 * x ** 2)
    k1 = (k1 / k1.sum()).unsqueeze(1)
    k2 = (k1 @ k1.T)[None, None]
    c = img1.shape[1]
    kernel = k2.expand(c, 1, kernel_size, kernel_size).contiguous()
    mu_x = F.conv2d(img1, kernel, padding=radius, groups=c)
    mu_y = F.conv2d(img2, kernel, padding=radius, groups=c)
    var_x = F.conv2d(img1 * img1, kernel, padding=radius, groups=c) - mu_x ** 2
    var_y = F.conv2d(img2 * img2, kernel, padding=radius, groups=c) - mu_y ** 2
    covar = F.conv2d(img1 * img2, kernel, padding=radius, groups=c) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * covar + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return (num / den).mean().item()


def test_ssim_matches_reference(rng):
    a = rng.uniform(size=(2, 32, 40, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = _torch_ssim(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                         torch.from_numpy(b.transpose(0, 3, 1, 2)))
    assert abs(ours - theirs) < 1e-5


def test_psnr_matches_reference(rng):
    a = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = torch.mean((torch.from_numpy(a) - torch.from_numpy(b)) ** 2, dim=[1, 2, 3])
    theirs = (10 * torch.log10(1.0 / mse)).mean().item()
    assert abs(ours - theirs) < 1e-4


def test_gaussian_kernel_matches_scipy():
    # scipy-style truncated gaussian (benchmark.py:32-52)
    k = gaussian_kernel_1d(11, 1.5)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    assert k[5] == k.max()
    np.testing.assert_allclose(k, k[::-1])


def test_mifd_identical_images(rng):
    img = (rng.uniform(size=(120, 160, 3)) * 255).astype(np.uint8)
    # identical images → zero reprojection error (if features found)
    value = mifd(img, img)
    assert value == pytest.approx(0.0, abs=1e-3) or np.isnan(value)


def test_perlin_determinism_and_range():
    np.random.seed(42)
    a = perlin(64, 48, scale=16)
    np.random.seed(42)
    b = perlin(64, 48, scale=16)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 64)
    assert -1.5 < a.min() < a.max() < 1.5


def test_create_noisy_depth_maps(tmp_path, rng):
    depths = [rng.uniform(0, 10, (24, 32)).astype(np.float32) for _ in range(2)]
    create_noisy_depth_maps(str(tmp_path), depths)
    files = sorted(os.listdir(tmp_path))
    assert files == ["000000.png", "000001.png"]
    arr = np.asarray(Image.open(tmp_path / files[0]))
    assert arr.dtype == np.uint8 and arr.shape == (24, 32)


def test_midas_resize_sizes():
    r = MidasResize(320, 240, keep_aspect_ratio=True, ensure_multiple_of=32,
                    resize_method="upper_bound")
    # 4:3 NYU 0.95-cropped input 456×608 → upper bound 320×240 → multiples of 32
    assert r.get_size(608, 456) == (320, 224)
    r2 = MidasResize(320, 240, keep_aspect_ratio=True, ensure_multiple_of=1,
                     resize_method="upper_bound")
    assert r2.get_size(608, 456) == (320, 240)
    r3 = MidasResize(384, 384, keep_aspect_ratio=True, ensure_multiple_of=32,
                     resize_method="lower_bound")
    w, h = r3.get_size(640, 480)
    assert w >= 384 and h >= 384 and w % 32 == 0 and h % 32 == 0


def test_ratio_center_crop(rng):
    crop = RatioCenterCrop([0.95, 0.95])
    sample = {"image": rng.uniform(size=(480, 640, 3)),
              "depth": rng.uniform(size=(480, 640))}
    out = crop(sample)
    assert out["image"].shape == (456, 608, 3)
    assert out["depth"].shape == (456, 608)


@pytest.fixture
def nyu_csv(tmp_path, rng):
    image = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    depth = rng.integers(500, 9000, (480, 640)).astype(np.uint16)
    Image.fromarray(image).save(tmp_path / "rgb.png")
    Image.fromarray(depth, mode="I;16").save(tmp_path / "d.png")
    with open(tmp_path / "pairs.csv", "w") as f:
        for _ in range(2):
            f.write("rgb.png,d.png\n")
    with open(tmp_path / "camera.json", "w") as f:
        json.dump({"width": 640, "height": 480, "fx": 525.0, "fy": 525.0,
                   "cx": 320.0, "cy": 240.0}, f)
    return str(tmp_path / "pairs.csv")


def test_depth_dataset_with_camera(nyu_csv):
    ds = DepthDataset(nyu_csv, transform=nyu_eval_sample(1))
    assert len(ds) == 2
    sample = ds[0]
    assert sample["image"].shape == (240, 320, 3)
    assert sample["depth"].shape == (240, 320, 1)
    assert 0 < sample["depth"].max() <= 10.0
    assert ds.camera_intrinsics["fx"] == 525.0


def test_image_folder_datasets(tmp_path, rng):
    from efficientdepthestimation_tpu.utils import image_io

    flat = tmp_path / "flat"
    flat.mkdir()
    image_io.save_raw_float32_image(str(flat / "000000.raw"),
                                    rng.uniform(size=(8, 10)).astype(np.float32))
    Image.fromarray((rng.uniform(size=(8, 10)) * 255).astype(np.uint8)).save(
        flat / "000001.png")
    ds = ImageFolderDataset(str(flat))
    assert len(ds) == 2
    assert ds[0].shape == (8, 10)

    nested = tmp_path / "nested"
    for sub in ("000000", "000001"):
        (nested / sub).mkdir(parents=True)
        Image.fromarray((rng.uniform(size=(8, 10, 3)) * 255).astype(np.uint8)).save(
            nested / sub / "000000.png")
    nds = NestedImageFolderDataset(str(nested))
    assert len(nds) == 2


def test_render_novel_views_identity(rng):
    image = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    depth = rng.uniform(size=(48, 64)).astype(np.float32)
    views = np.eye(4, dtype=np.float32)[None]
    frames = np.asarray(render_novel_views(
        jnp.asarray(image), jnp.asarray(depth * 0), jnp.asarray(views)))
    assert frames.shape == (1, 48, 64, 3)
    # flat depth + identity view ≈ the source image (sub-pixel rounding only)
    assert np.abs(frames[0] - image).mean() < 0.05


def test_render_novel_views_moves_with_camera(rng):
    image = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    depth = rng.uniform(size=(48, 64)).astype(np.float32)
    anim = reference_camera_animation()
    views = np.stack([anim.transform_at(t) for t in (0.0, 1.2)]).astype(np.float32)
    frames = np.asarray(render_novel_views(
        jnp.asarray(image), jnp.asarray(depth), jnp.asarray(views)))
    assert frames.shape[0] == 2
    assert np.abs(frames[0] - frames[1]).mean() > 1e-3  # views differ


def test_visual_metrics_tracker(rng):
    labels = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    outputs = np.clip(labels + rng.normal(0, 0.02, labels.shape), 0, 1).astype(np.float32)
    tracker = VisualMetricsTracker(lpips_weights=None)
    tracker.update(outputs, labels)
    d = tracker.to_dict()
    assert 0.5 < d["ssim"] <= 1.0
    assert d["psnr"] > 20
    s = str(tracker)
    assert "SSIM" in s


def test_mini_benchmark_end_to_end(nyu_csv, tmp_path):
    """Flat-baseline run through the full harness at tiny renderer settings."""
    from efficientdepthestimation_tpu.benchmark import harness

    out = str(tmp_path / "bench")
    results = harness.main([
        "--csv-path", nyu_csv,
        "--output-path", out,
        "--batch-size", "2",
        "--renderer-fps", "2",
    ])
    assert "flat" in results["nyu"]
    assert "random" in results["nyu"]
    assert os.path.isfile(os.path.join(out, "nyu.csv"))
    flat = results["nyu"]["flat"]
    assert "ssim" in flat and "frame_time" in flat
    # cached rerun exercises the idempotent paths
    results2 = harness.main([
        "--csv-path", nyu_csv,
        "--output-path", out,
        "--batch-size", "2",
        "--renderer-fps", "2",
    ])
    assert results2["nyu"]["flat"]["abs_rel"] == pytest.approx(
        flat["abs_rel"], abs=1e-9)


def test_get_and_save_sample_output(nyu_csv, tmp_path):
    from efficientdepthestimation_tpu.benchmark.datasets import (
        DepthDataset,
        nyu_eval_sample,
    )
    from efficientdepthestimation_tpu.benchmark.depth_model import FlatDepthEstimator
    from efficientdepthestimation_tpu.benchmark.harness import (
        get_sample_output,
        save_sample_output,
    )

    ds = DepthDataset(nyu_csv, transform=nyu_eval_sample(1))
    samples = get_sample_output(FlatDepthEstimator(), ds, num_samples=2)
    assert samples.shape[0] == 2
    assert 0.0 <= samples.min() and samples.max() <= 1.0
    save_sample_output(FlatDepthEstimator(), "flat", ds, str(tmp_path))
    assert len(os.listdir(tmp_path / "flat" / "depth")) == 2


def test_preset_model_tables_match_reference():
    """--preset chapter3/chapter4 reproduce the reference's experiment
    tables (benchmark.py:513-557): model names, order, and the chapter-4
    auto random-weights entry + senet baseline. Loaders stay lazy, so no
    checkpoints are needed to pin the table shape."""
    import argparse

    from efficientdepthestimation_tpu.benchmark.harness import preset_model_loaders

    args = argparse.Namespace(
        preset="chapter3",
        reside_enb0_path="ENB0-HU.pth", reside_enb4_path="ENB4-HU.pth",
        reside_resnet50_path="RN50-HU.pth", reside_senet_path="SENET-HU.pth",
        midas_enb0_path="ENB0-LR.pth", midas_enb4_path="ENB4-LR.pth",
        midas_resnet50_path="RN50-LR.pth",
    )
    names3 = [name for name, _, _ in preset_model_loaders(args, data=None)]
    assert names3 == ["reside_enb0", "reside_enb4", "reside_resnet50",
                      "midas_enb0", "midas_enb4", "midas_resnet50"]

    args.preset = "chapter4"
    names4 = [name for name, _, _ in preset_model_loaders(args, data=None)]
    assert names4 == ["reside_enb0", "reside_senet",
                      "reside_enb0-random_weights", "flat"]

    args.preset = None
    assert preset_model_loaders(args, data=None) == []
