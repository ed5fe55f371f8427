"""Native (C++) runtime components: batch image decoder + image/video encoders.

The shared libraries are built lazily with g++ on first use and cached next
to the source; bindings are ctypes (no pybind11 in this environment). Falls
back cleanly — callers check ``is_available()`` /
``encoder.is_available()`` and use the PIL/OpenCV path otherwise.
"""

from efficientdepthestimation_tpu.native.loader import (
    decode_rgb_batch,
    decode_depth16_batch,
    is_available,
    build_library,
)
from efficientdepthestimation_tpu.native import encoder
