"""LPIPS weight conversion + architecture, Discriminator checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from efficientdepthestimation_tpu.benchmark.metrics import (
    VisualMetricsTracker,
    load_lpips_weights,
    lpips_alex,
)
from efficientdepthestimation_tpu.checkpoints.lpips_convert import convert
from efficientdepthestimation_tpu.checkpoints.serialization import (
    load_discriminator,
    save_discriminator,
)
from efficientdepthestimation_tpu.models.midas import Discriminator

_ALEX_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                (256, 384, 3, 3), (256, 256, 3, 3)]
_ALEX_IDX = [0, 3, 6, 8, 10]


@pytest.fixture
def lpips_npz(tmp_path, rng):
    alex = {}
    for idx, shape in zip(_ALEX_IDX, _ALEX_SHAPES):
        alex[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal(shape).astype(np.float32) * 0.05)
        alex[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(shape[0]).astype(np.float32) * 0.05)
    heads = {}
    for i, shape in enumerate(_ALEX_SHAPES):
        heads[f"lin{i}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.1, (1, shape[0], 1, 1)).astype(np.float32))
    a_path, l_path = str(tmp_path / "alex.pth"), str(tmp_path / "lin.pth")
    torch.save(alex, a_path)
    torch.save(heads, l_path)
    out = str(tmp_path / "lpips_alex.npz")
    convert(a_path, l_path, out)
    return out


def test_lpips_convert_and_forward(lpips_npz, rng):
    weights = load_lpips_weights(lpips_npz)
    assert weights is not None
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d_ab = np.asarray(lpips_alex(a, b, weights))
    d_aa = np.asarray(lpips_alex(a, a, weights))
    assert d_ab.shape == (2,)
    assert (d_aa < 1e-6).all()          # identical images → zero distance
    assert (d_ab > d_aa).all()          # different images → positive


def test_visual_tracker_with_lpips(lpips_npz, rng):
    tracker = VisualMetricsTracker(lpips_weights=load_lpips_weights(lpips_npz))
    labels = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    outputs = np.clip(labels + rng.normal(0, 0.1, labels.shape), 0, 1).astype(np.float32)
    tracker.update(outputs, labels)
    assert np.isfinite(tracker.to_dict()["lpips"])


def test_discriminator_forward_and_checkpoint(tmp_path, rng):
    model = Discriminator(in_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1, 1, 1)

    path = str(tmp_path / "disc.ede")
    save_discriminator(path, model, jax.tree_util.tree_map(np.asarray, variables))
    model2, variables2 = load_discriminator(path)
    assert model2.in_channels == 4
    out2 = model2.apply(variables2, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)
