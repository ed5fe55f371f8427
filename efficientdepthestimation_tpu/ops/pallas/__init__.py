"""Pallas TPU kernels for the framework's hot non-matmul ops."""

from efficientdepthestimation_tpu.ops.pallas.fused_loss import fused_depth_loss
