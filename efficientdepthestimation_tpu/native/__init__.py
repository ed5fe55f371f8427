"""Native (C++) runtime components: the batch image decoder.

The shared library is built lazily with g++ on first use and cached next to
the source; bindings are ctypes (no pybind11 in this environment). Falls
back cleanly — callers check ``is_available()`` and use the PIL path
otherwise.
"""

from efficientdepthestimation_tpu.native.loader import (
    decode_rgb_batch,
    decode_depth16_batch,
    is_available,
    build_library,
)
