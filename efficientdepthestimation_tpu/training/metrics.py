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


def depth_metrics_batch(outputs: jax.Array, labels: jax.Array,
                        num_valid=None) -> dict[str, jax.Array]:
    """Per-batch metric sums. outputs/labels: (N, H, W, 1) or (N, H, W).

    ``num_valid`` (optional scalar, traced) marks only the first ``num_valid``
    samples of the batch as real; trailing samples (the ``pad_last``
    duplicates from ``batch_iterator``) are excluded from every sum and from
    the reported ``batch_size``, so batched evaluation of a padded tail batch
    equals evaluation at the true size — the reference's bs=1 exact eval
    (ReSIDE/test.py:26) without giving up static shapes.
    """
    outputs = outputs.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    n = labels.shape[0]
    if num_valid is None:
        sample_mask = jnp.ones((n,), bool)
    else:
        sample_mask = jnp.arange(n) < num_valid
    pix_mask = sample_mask.reshape((n,) + (1,) * (labels.ndim - 1))

    nan_mask = jnp.isnan(labels)
    invalid_mask = ~(labels > 0)
    num_valid_px = jnp.sum((~nan_mask) & pix_mask).astype(jnp.float32)
    batch_size = jnp.sum(sample_mask).astype(jnp.float32)

    residuals = outputs - labels
    # NaN labels inside *valid* samples poison the plain sums exactly as in
    # torch (kept faithfully; NYU labels are never NaN in practice); padded
    # samples are zeroed via where, not multiply, so their values never leak.
    abs_res = jnp.where(pix_mask, jnp.abs(residuals), 0.0)
    mae = batch_size * jnp.sum(abs_res) / num_valid_px
    mse = batch_size * jnp.sum(
        jnp.where(pix_mask, jnp.square(residuals), 0.0)) / num_valid_px

    abs_rel = jnp.abs(residuals) / labels
    abs_rel = jnp.where(nan_mask | invalid_mask | ~pix_mask, 0.0, abs_rel)
    abs_rel = batch_size * jnp.sum(abs_rel) / num_valid_px

    log10 = jnp.abs(jnp.log10(outputs) - jnp.log10(labels))
    log10 = jnp.where(nan_mask | invalid_mask | ~pix_mask, 0.0, log10)
    log10 = jnp.sum(log10) / num_valid_px  # no batch_size factor (util.py:68)

    max_ratio = jnp.maximum(outputs / labels, labels / outputs)

    def thr(t):
        hits = (max_ratio <= t) & pix_mask
        return batch_size * jnp.sum(hits.astype(jnp.float32)) / num_valid_px

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
                       threshold: float = 0.25,
                       num_valid=None) -> dict[str, jax.Array]:
    """Sobel-magnitude edge accuracy/precision/recall/F1 (test.py:56-102).

    Computed *per sample* then summed over the (first ``num_valid``) samples —
    exactly the reference's bs=1 accumulation loop (test.py:61-76); divide the
    sums by the total sample count on the host to recover its averages.
    """
    gx_l, gy_l = sobel_gradients(labels)
    gx_o, gy_o = sobel_gradients(outputs)
    edge_l = jnp.sqrt(jnp.square(gx_l) + jnp.square(gy_l))
    edge_o = jnp.sqrt(jnp.square(gx_o) + jnp.square(gy_o))
    e1 = edge_l > threshold
    e2 = edge_o > threshold
    n = labels.shape[0]
    axes = tuple(range(1, labels.ndim))
    n_pixels = labels.shape[1] * labels.shape[2]
    accuracy = jnp.sum((e1 == e2).astype(jnp.float32), axis=axes) / n_pixels
    both = jnp.sum((e1 & e2).astype(jnp.float32), axis=axes)
    precision = both / jnp.sum(e2.astype(jnp.float32), axis=axes)
    recall = both / jnp.sum(e1.astype(jnp.float32), axis=axes)
    f1 = 2 * precision * recall / (precision + recall)
    if num_valid is None:
        mask = jnp.ones((n,), jnp.float32)
    else:
        mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
    return {"edge_accuracy": jnp.sum(accuracy * mask),
            "edge_precision": jnp.sum(precision * mask),
            "edge_recall": jnp.sum(recall * mask),
            "edge_f1": jnp.sum(f1 * mask)}


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
