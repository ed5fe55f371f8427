"""LPIPS completion tests (VERDICT round-1 item 7).

1. converter round-trip: a synthetic torchvision-AlexNet state dict + lpips
   0.1.4 linear heads (exact key layouts) are converted by lpips_convert and
   loaded by load_lpips_weights.
2. numeric parity: ``lpips_alex`` matches a torch implementation of the
   LPIPS formula (scaling layer → AlexNet relu1..5 features → channel unit
   normalization → squared diff → 1×1 lin heads → spatial mean → sum) on the
   same fixed weights.
3. the visual benchmark records finite LPIPS when weights are supplied.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from efficientdepthestimation_tpu.benchmark.metrics import (
    VisualMetricsTracker,
    load_lpips_weights,
    lpips_alex,
)
from efficientdepthestimation_tpu.checkpoints.lpips_convert import convert

_CH = [64, 192, 384, 256, 256]
_ALEX = [  # (cin, cout, kernel, stride, pad) for torchvision features convs
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_FEATURE_IDX = [0, 3, 6, 8, 10]


def _make_synthetic_pths(tmp_path):
    g = torch.Generator().manual_seed(0)
    alex_sd = {}
    for idx, (cin, cout, k, _, _) in zip(_FEATURE_IDX, _ALEX):
        alex_sd[f"features.{idx}.weight"] = torch.randn(
            cout, cin, k, k, generator=g) * 0.05
        alex_sd[f"features.{idx}.bias"] = torch.randn(cout, generator=g) * 0.05
    # torchvision checkpoints also carry the classifier — converter must skip
    alex_sd["classifier.1.weight"] = torch.randn(4096, 9216, generator=g)
    alex_sd["classifier.1.bias"] = torch.randn(4096, generator=g)

    lin_sd = {f"lin{i}.model.1.weight":
              torch.rand(1, c, 1, 1, generator=g) * 0.1
              for i, c in enumerate(_CH)}

    alex_path = tmp_path / "alexnet.pth"
    lpips_path = tmp_path / "lpips_alex.pth"
    torch.save(alex_sd, alex_path)
    torch.save(lin_sd, lpips_path)
    return str(alex_path), str(lpips_path), alex_sd, lin_sd


def _torch_lpips(img1_nchw, img2_nchw, alex_sd, lin_sd):
    """Straight-line torch transcription of the LPIPS(net='alex') formula."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        for i, (idx, (_, _, _, s, p)) in enumerate(zip(_FEATURE_IDX, _ALEX)):
            if i in (1, 2):
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(x, alex_sd[f"features.{idx}.weight"],
                         alex_sd[f"features.{idx}.bias"], stride=s, padding=p)
            x = F.relu(x)
            out.append(x)
        return out

    def unit(x):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + 1e-10)

    total = 0.0
    for i, (a, b) in enumerate(zip(feats(img1_nchw), feats(img2_nchw))):
        diff = (unit(a) - unit(b)) ** 2
        lin = lin_sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(diff, lin).mean(dim=(1, 2, 3))
    return total


def test_converter_round_trip_and_numeric_parity(tmp_path):
    alex_path, lpips_path, alex_sd, lin_sd = _make_synthetic_pths(tmp_path)
    out_path = str(tmp_path / "lpips_alex.npz")
    convert(alex_path, lpips_path, out_path)

    weights = load_lpips_weights(out_path)
    assert weights is not None
    assert weights["conv0"]["kernel"].shape == (11, 11, 3, 64)
    assert weights["lin4"].shape == (1, 1, 256, 1)

    rng = np.random.default_rng(0)
    img1 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(lpips_alex(jnp.asarray(img1), jnp.asarray(img2), weights))
    with torch.no_grad():
        theirs = _torch_lpips(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)), alex_sd, lin_sd).numpy()
    assert ours.shape == (2,)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    # identical images → exactly zero distance
    zero = np.asarray(lpips_alex(jnp.asarray(img1), jnp.asarray(img1), weights))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)


def test_lpips_convert_accepts_lins_dot_keys(tmp_path):
    """lpips 0.1.4 also publishes heads under 'lins.{i}.model.1.weight'."""
    alex_path, lpips_path, _, lin_sd = _make_synthetic_pths(tmp_path)
    alt = {f"lins.{i}.model.1.weight": lin_sd[f"lin{i}.model.1.weight"]
           for i in range(5)}
    alt_path = tmp_path / "lpips_lins.pth"
    torch.save(alt, alt_path)
    out_path = str(tmp_path / "out.npz")
    convert(alex_path, str(alt_path), out_path)
    assert load_lpips_weights(out_path) is not None


def test_visual_benchmark_reports_finite_lpips(tmp_path):
    alex_path, lpips_path, _, _ = _make_synthetic_pths(tmp_path)
    out_path = str(tmp_path / "lpips_alex.npz")
    convert(alex_path, lpips_path, out_path)
    weights = load_lpips_weights(out_path)

    tracker = VisualMetricsTracker(lpips_weights=weights)
    rng = np.random.default_rng(0)
    outputs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    labels = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    tracker.update(outputs, labels)
    result = tracker.to_dict()
    assert np.isfinite(result["lpips"])
    assert result["lpips"] > 0
