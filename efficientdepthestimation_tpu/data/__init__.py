"""NYU-Depth-v2 data pipeline: host datasets + on-device batched preprocessing."""

from efficientdepthestimation_tpu.data.datasets import (
    DepthPairDataset,
    VideoFrameDataset,
    batch_iterator,
)
from efficientdepthestimation_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    IMAGENET_PCA_EIGVAL,
    IMAGENET_PCA_EIGVEC,
    eval_preprocess,
    eval_preprocess_image_only,
    train_preprocess,
    demo_preprocess,
    normalize_imagenet,
)
from efficientdepthestimation_tpu.data.prefetch import device_prefetch
