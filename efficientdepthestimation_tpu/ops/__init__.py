"""TPU-native numeric substrate: resampling, convolution, normalization.

All ops take NHWC activations and are jit-able with static shapes.
"""

from efficientdepthestimation_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest_torch,
    pil_resize,
    pil_resize_matrix,
    upsample_align_corners,
)
from efficientdepthestimation_tpu.ops.conv import (
    conv2d,
    depthwise_conv2d,
    max_pool,
    avg_pool_global,
    same_padding_static,
)
from efficientdepthestimation_tpu.ops.norm import batch_norm
from efficientdepthestimation_tpu.ops.sobel import sobel_gradients, SOBEL_KX, SOBEL_KY
