"""Model zoo: encoders (ResNet / DenseNet / SENet / EfficientNet) × decoders
(Hu2018 D+MFF+R, MiDaS-style residual decoder).

All modules are flax.linen, NHWC, with submodule names chosen to mirror the
reference's torch key paths 1:1 so the ``.pth`` importer is a mechanical
rename + transpose (see checkpoints/pth_import.py).
"""

from efficientdepthestimation_tpu.models.registry import (
    build_model,
    define_model,
    model_from_checkpoint_name,
    ENCODER_SPECS,
)
