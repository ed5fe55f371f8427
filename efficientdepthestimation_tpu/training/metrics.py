"""Depth metrics with the reference's exact masking/weighting semantics.

The hot path (``depth_metrics_batch``) is a single jit-able reduction over
NHWC tensors returning a small pytree of per-batch sums — the TPU-native
replacement for ``MetricsTracker.update``'s many ``.item()`` device syncs
(ReSIDE/util.py:39-92, flagged as a hot-loop cost in SURVEY §3.1).

Reference quirks reproduced intentionally:
  * ``num_valid`` counts non-NaN labels (not positive ones) — util.py:50.
  * mae/mse/abs_rel/δ sums are scaled by batch_size before the running
    average; log10 is NOT (util.py:57-68).
  * δ thresholds count *all* pixels whose max-ratio passes (invalid pixels
    included; NaN comparisons are False) divided by num_valid — util.py:70-73,90-92.
  * The running ``AverageMeter`` ignores NaN/inf updates (util.py:125-134).
"""

from __future__ import annotations

import math
from typing import Callable, Union

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.ops.sobel import sobel_gradients

__all__ = [
    "depth_metrics_batch",
    "edge_metrics_batch",
    "AverageMeter",
    "LambdaMeter",
    "MetricsTracker",
    "BestMetricsTracker",
]


def depth_metrics_batch(outputs: jax.Array, labels: jax.Array) -> dict[str, jax.Array]:
    """Per-batch metric sums. outputs/labels: (N, H, W, 1) or (N, H, W)."""
    outputs = outputs.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    nan_mask = jnp.isnan(labels)
    invalid_mask = ~(labels > 0)
    num_valid = jnp.sum(~nan_mask).astype(jnp.float32)
    batch_size = jnp.asarray(labels.shape[0], jnp.float32)

    residuals = outputs - labels
    abs_res = jnp.abs(residuals)
    # NaN labels poison the plain sums exactly as in torch (kept faithfully;
    # NYU labels are never NaN in practice).
    mae = batch_size * jnp.sum(abs_res) / num_valid
    mse = batch_size * jnp.sum(jnp.square(residuals)) / num_valid

    abs_rel = abs_res / labels
    abs_rel = jnp.where(nan_mask | invalid_mask, 0.0, abs_rel)
    abs_rel = batch_size * jnp.sum(abs_rel) / num_valid

    log10 = jnp.abs(jnp.log10(outputs) - jnp.log10(labels))
    log10 = jnp.where(nan_mask | invalid_mask, 0.0, log10)
    log10 = jnp.sum(log10) / num_valid  # no batch_size factor (util.py:68)

    max_ratio = jnp.maximum(outputs / labels, labels / outputs)

    def thr(t):
        return batch_size * jnp.sum((max_ratio <= t).astype(jnp.float32)) / num_valid

    return {
        "mae": mae,
        "mse": mse,
        "abs_rel": abs_rel,
        "log10": log10,
        "delta1": thr(1.25),
        "delta2": thr(1.25 ** 2),
        "delta3": thr(1.25 ** 3),
        "batch_size": batch_size,
    }


def edge_metrics_batch(outputs: jax.Array, labels: jax.Array,
                       threshold: float = 0.25) -> dict[str, jax.Array]:
    """Sobel-magnitude edge accuracy/precision/recall/F1 (test.py:56-102)."""
    gx_l, gy_l = sobel_gradients(labels)
    gx_o, gy_o = sobel_gradients(outputs)
    edge_l = jnp.sqrt(jnp.square(gx_l) + jnp.square(gy_l))
    edge_o = jnp.sqrt(jnp.square(gx_o) + jnp.square(gy_o))
    e1 = edge_l > threshold
    e2 = edge_o > threshold
    n_pixels = labels.shape[1] * labels.shape[2]
    accuracy = jnp.sum((e1 == e2).astype(jnp.float32)) / n_pixels
    both = jnp.sum((e1 & e2).astype(jnp.float32))
    precision = both / jnp.sum(e2.astype(jnp.float32))
    recall = both / jnp.sum(e1.astype(jnp.float32))
    f1 = 2 * precision * recall / (precision + recall)
    return {"edge_accuracy": accuracy, "edge_precision": precision,
            "edge_recall": recall, "edge_f1": f1}


# ---------------------------------------------------------------------------
# Host-side running trackers (API parity with ReSIDE/util.py)
# ---------------------------------------------------------------------------


class MetricsMeter:
    @property
    def value(self):
        raise NotImplementedError

    def __str__(self):
        return str(self.value)

    def __format__(self, format_spec):
        return f"{self.value:{format_spec}}"


class AverageMeter(MetricsMeter):
    """Running average; NaN/inf updates are ignored (util.py:110-134)."""

    def __init__(self):
        self._sum = 0.0
        self._count = 0

    @property
    def value(self):
        try:
            return self._sum / self._count
        except ZeroDivisionError:
            return float("nan")

    def update(self, value, num_elements=1):
        value = float(value)
        if not math.isnan(value) and not math.isinf(value):
            self._sum += value
            self._count += num_elements


class LambdaMeter(MetricsMeter):
    """Tracks a metric through a reducer fn, e.g. min/max (util.py:137-165)."""

    def __init__(self, lambda_fn: Callable[[float, float], float]):
        self._value = float("nan")
        self.lambda_fn = lambda_fn

    @property
    def value(self):
        return self._value

    def update(self, value):
        value = float(value)
        if math.isnan(value) or math.isinf(value):
            import warnings

            warnings.warn("Invalid value encountered (NaN or +/- infinity), ignoring value.")
            return
        self._value = value if math.isnan(self._value) else self.lambda_fn(self._value, value)


class MetricsTracker:
    """Running averages over batches; feed it ``depth_metrics_batch`` outputs."""

    METRIC_KEYS = ("mae", "mse", "abs_rel", "log10", "delta1", "delta2", "delta3")

    def __init__(self):
        for key in self.METRIC_KEYS:
            setattr(self, key, AverageMeter())
        self.rmse = 0.0

    def __getitem__(self, item):
        return getattr(self, item.lower())

    def update_from_sums(self, sums: dict):
        bs = int(sums["batch_size"])
        for key in self.METRIC_KEYS:
            getattr(self, key).update(float(sums[key]), bs)
        self.rmse = math.sqrt(self.mse.value) if self.mse.value == self.mse.value else 0.0

    def update(self, outputs, labels):
        self.update_from_sums(jax.device_get(depth_metrics_batch(outputs, labels)))

    def to_dict(self):
        result = {}
        for key, metric in self.__dict__.items():
            result[key] = metric.value if isinstance(metric, AverageMeter) else metric
        return result

    def __str__(self):
        return (
            f"ABS_REL: {self.abs_rel:.3f} - MAE: {self.mae:.3f} - "
            f"MSE: {self.mse:.3f} - RMSE: {self.rmse:.3f} - LOG10: {self.log10:.3f} - "
            f"DELTA1: {self.delta1:.3f} - DELTA2: {self.delta2:.3f} - "
            f"DELTA3: {self.delta3:.3f}        "
        )


class BestMetricsTracker:
    """Best-so-far values across epochs (util.py:168-195)."""

    def __init__(self):
        self.mae = LambdaMeter(min)
        self.mse = LambdaMeter(min)
        self.rmse = LambdaMeter(min)
        self.abs_rel = LambdaMeter(min)
        self.log10 = LambdaMeter(min)
        self.delta1 = LambdaMeter(max)
        self.delta2 = LambdaMeter(max)
        self.delta3 = LambdaMeter(max)

    def __getitem__(self, item):
        return getattr(self, item)

    def update(self, metrics: MetricsTracker):
        for key in ("mae", "mse", "abs_rel", "log10", "delta1", "delta2", "delta3"):
            getattr(self, key).update(getattr(metrics, key).value)
        self.rmse.update(metrics.rmse)

    def to_dict(self):
        return {key: meter.value for key, meter in self.__dict__.items()}
