"""Loss + metrics: golden vs torch formulas and Pallas-vs-XLA consistency."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from efficientdepthestimation_tpu.ops.pallas.fused_loss import fused_depth_loss
from efficientdepthestimation_tpu.ops.sobel import SOBEL_KX, SOBEL_KY
from efficientdepthestimation_tpu.training.loss import depth_loss, depth_loss_terms
from efficientdepthestimation_tpu.training.metrics import (
    MetricsTracker,
    depth_metrics_batch,
    edge_metrics_batch,
)


def _torch_loss(output, depth):
    """The reference loss verbatim in torch (train.py:216-236)."""
    cos = nn.CosineSimilarity(dim=1, eps=0)
    k = torch.from_numpy(np.stack([SOBEL_KX, SOBEL_KY])).view(2, 1, 3, 3)

    def grad(x):
        return F.conv2d(x, k, None, 1, 1)

    ones = torch.ones(depth.size(0), 1, depth.size(2), depth.size(3))
    dg, og = grad(depth), grad(output)
    ddx, ddy = dg[:, 0:1], dg[:, 1:2]
    odx, ody = og[:, 0:1], og[:, 1:2]
    d_normal = torch.cat((-ddx, -ddy, ones), 1)
    o_normal = torch.cat((-odx, -ody, ones), 1)
    loss_depth = torch.log(torch.abs(output - depth) + 0.5).mean()
    loss_dx = torch.log(torch.abs(odx - ddx) + 0.5).mean()
    loss_dy = torch.log(torch.abs(ody - ddy) + 0.5).mean()
    loss_normal = torch.abs(1 - cos(o_normal, d_normal)).mean()
    return (loss_depth + loss_normal + (loss_dx + loss_dy)).item()


def test_depth_loss_matches_torch(rng):
    o = rng.uniform(0.1, 9.0, (2, 24, 32, 1)).astype(np.float32)
    d = rng.uniform(0.1, 9.0, (2, 24, 32, 1)).astype(np.float32)
    ours = float(depth_loss(jnp.asarray(o), jnp.asarray(d)))
    theirs = _torch_loss(
        torch.from_numpy(o.transpose(0, 3, 1, 2)),
        torch.from_numpy(d.transpose(0, 3, 1, 2)),
    )
    assert abs(ours - theirs) < 1e-5


def test_fused_pallas_loss_matches_xla(rng):
    o = rng.uniform(0.1, 9.0, (3, 16, 128, 1)).astype(np.float32)
    d = rng.uniform(0.1, 9.0, (3, 16, 128, 1)).astype(np.float32)
    ref = float(depth_loss(jnp.asarray(o), jnp.asarray(d)))
    fused = float(fused_depth_loss(jnp.asarray(o), jnp.asarray(d), True))
    assert abs(ref - fused) < 1e-5


def test_fused_loss_gradient_matches_autodiff(rng):
    o = rng.uniform(0.5, 5.0, (2, 16, 128, 1)).astype(np.float32)
    d = rng.uniform(0.5, 5.0, (2, 16, 128, 1)).astype(np.float32)
    g_ref = jax.grad(lambda p: depth_loss(p, jnp.asarray(d)))(jnp.asarray(o))
    g_fused = jax.grad(lambda p: fused_depth_loss(p, jnp.asarray(d), True))(jnp.asarray(o))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def _torch_metrics(outputs, labels):
    """Reference MetricsTracker.update math verbatim (util.py:39-92)."""
    nan_mask = torch.isnan(labels)
    invalid_mask = ~(labels > 0)
    num_valid = (~nan_mask).sum().item()
    bs = labels.shape[0]
    res = outputs - labels
    mae = bs * torch.sum(torch.abs(res)).item() / num_valid
    mse = bs * torch.sum(res ** 2).item() / num_valid
    abs_rel = torch.abs(res) / labels
    abs_rel[nan_mask] = 0
    abs_rel[invalid_mask] = 0
    abs_rel = bs * torch.sum(abs_rel).item() / num_valid
    log10 = torch.abs(torch.log10(outputs) - torch.log10(labels))
    log10[nan_mask] = 0
    log10[invalid_mask] = 0
    log10 = torch.sum(log10).item() / num_valid
    ratio = torch.max(outputs / labels, labels / outputs)
    d = [bs * torch.sum((ratio <= 1.25 ** k).float()).item() / num_valid
         for k in (1, 2, 3)]
    return dict(mae=mae, mse=mse, abs_rel=abs_rel, log10=log10,
                delta1=d[0], delta2=d[1], delta3=d[2])


def test_depth_metrics_match_torch(rng):
    o = rng.uniform(0.1, 10.0, (4, 10, 12, 1)).astype(np.float32)
    l = rng.uniform(0.1, 10.0, (4, 10, 12, 1)).astype(np.float32)
    l[0, 0, 0, 0] = 0.0  # invalid pixel
    ours = jax.device_get(depth_metrics_batch(jnp.asarray(o), jnp.asarray(l)))
    theirs = _torch_metrics(torch.from_numpy(o), torch.from_numpy(l))
    for key, val in theirs.items():
        assert abs(float(ours[key]) - val) < 1e-3, key


def test_metrics_tracker_running_average(rng):
    tracker = MetricsTracker()
    o = rng.uniform(1.0, 5.0, (2, 8, 8, 1)).astype(np.float32)
    l = rng.uniform(1.0, 5.0, (2, 8, 8, 1)).astype(np.float32)
    tracker.update(jnp.asarray(o), jnp.asarray(l))
    tracker.update(jnp.asarray(o), jnp.asarray(l))
    d = tracker.to_dict()
    assert 0 <= d["delta1"] <= 1.0001
    assert d["rmse"] == pytest.approx(math.sqrt(d["mse"]))
    s = str(tracker)
    assert "ABS_REL" in s and "DELTA3" in s


def test_edge_metrics_shapes(rng):
    o = rng.uniform(0.0, 5.0, (2, 16, 16, 1)).astype(np.float32)
    l = rng.uniform(0.0, 5.0, (2, 16, 16, 1)).astype(np.float32)
    m = jax.device_get(edge_metrics_batch(jnp.asarray(o), jnp.asarray(l)))
    assert set(m) == {"edge_accuracy", "edge_precision", "edge_recall", "edge_f1"}
    # per-sample sums over the batch (divide by sample count for averages)
    assert 0 <= float(m["edge_precision"]) / 2 <= 1


def test_log10_is_the_only_batch_variant_metric(rng):
    """Bug-compatibility lock: the reference omits the batch_size factor on
    LOG10's sum alone (util.py:68 vs :57-66,70-73), so the running average
    makes LOG10 scale ~1/batch while every other metric is batch-invariant.
    The same 8 samples are tracked at batch 1 vs batch 4; this pins the
    E2E.md b1-vs-b4 parity exhibit's single discrepancy as intentional."""
    o = rng.uniform(1.0, 5.0, (8, 8, 8, 1)).astype(np.float32)
    l = rng.uniform(1.0, 5.0, (8, 8, 8, 1)).astype(np.float32)

    def run(batch):
        tracker = MetricsTracker()
        for i in range(0, 8, batch):
            tracker.update(jnp.asarray(o[i:i + batch]),
                           jnp.asarray(l[i:i + batch]))
        return tracker.to_dict()

    d1, d4 = run(1), run(4)
    variant = {k for k in d1
               if not np.isclose(d1[k], d4[k], rtol=1e-5, atol=1e-7)}
    assert variant == {"log10"}
    # and it scales inversely with batch size, exactly the missing factor
    assert d1["log10"] == pytest.approx(4 * d4["log10"], rel=1e-5)
