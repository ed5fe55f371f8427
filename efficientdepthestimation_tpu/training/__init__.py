"""Training & evaluation: fused losses, jit-able depth metrics, SPMD steps."""

from efficientdepthestimation_tpu.training.metrics import (
    MetricsTracker,
    BestMetricsTracker,
    AverageMeter,
    LambdaMeter,
    depth_metrics_batch,
    edge_metrics_batch,
)
from efficientdepthestimation_tpu.training.loss import depth_loss, depth_loss_terms
