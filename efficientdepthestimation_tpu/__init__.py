"""efficientdepthestimation_tpu — TPU-native monocular depth estimation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
AnthonyDickson/EfficientDepthEstimation (see SURVEY.md): encoder×decoder depth
models (EfficientNet-B0..B7 / ResNet-18/50/101/152 / DenseNet-161 / SENet-154
encoders × Hu2018 D+MFF+R / MiDaS-style residual decoders), an NYU-Depth-v2
data pipeline, SPMD training over a TPU mesh, evaluation & benchmark harnesses,
and a ``.pth`` checkpoint importer for the reference's released weights.

Design notes
  * Activations are NHWC, conv kernels HWIO (TPU-native layouts).
  * Bilinear ``align_corners=True`` resampling is expressed as two small
    matmuls (separable interpolation matrices) so it rides the MXU.
  * Everything on the compute path is jit/pjit-able with static shapes.
  * Data parallelism = batch sharding over a ``jax.sharding.Mesh`` — the
    TPU-native replacement for the reference's ``torch.nn.DataParallel``
    (ReSIDE/train.py:93-101).
"""

__version__ = "0.1.0"

# Checkpoint-format version mirroring the reference's lasinger2019.__version__
# ('0.2.0', ReSIDE/models/lasinger2019.py:11) for self-describing MidasNet
# checkpoints.
MIDAS_CHECKPOINT_VERSION = "0.2.0"
