"""CLI entry points mirroring the reference's scripts.

Run as ``python -m efficientdepthestimation_tpu.apps.<name>``:

  train, evaluate (= ReSIDE/test.py), demo, inference, inference_benchmark,
  examples, test_nyu, depth_video, point_clouds, pcd2image.
"""

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint
