"""Host-side utilities: timing, run logging, image/COLMAP I/O, async writers."""

from efficientdepthestimation_tpu.utils.timer import Timer
from efficientdepthestimation_tpu.utils.run_logger import RunLogger
from efficientdepthestimation_tpu.utils.async_writer import (
    AsyncImageWriter,
    AsyncVideoWriter,
)
