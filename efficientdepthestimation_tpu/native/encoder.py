"""ctypes bindings + lazy build for the C++ image/video encoders.

Write-side counterpart of :mod:`native.loader` (VERDICT r4 next-round #4:
the round-4 E2E spent ~85% of wall time in single-core host encoding while
the device idled). PNG via libpng at a caller-chosen zlib level, JPEG and
MJPEG-in-AVI via libjpeg (libjpeg-turbo SIMD where installed), batch frame
encodes on a C++ thread pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SRC = os.path.join(_SRC_DIR, "encode.cpp")
_LIB_PATH = os.path.join(_SRC_DIR, "libede_encoder.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def build_library(force: bool = False) -> str | None:
    """Compile the encoder .so (g++ -O3, links png/jpeg/z/pthread)."""
    global _build_failed
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB_PATH, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        _build_failed = True
        import warnings

        detail = getattr(exc, "stderr", "") or str(exc)
        warnings.warn(f"native encoder build failed: {detail[:500]}")
        return None
    return _LIB_PATH


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else build_library()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ede_encode_png.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ede_encode_jpeg.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.ede_write_mjpeg_avi.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ede_avi_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.ede_avi_open.restype = ctypes.c_void_p
        lib.ede_avi_append.argtypes = [ctypes.c_void_p, u8p]
        lib.ede_avi_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def encode_png(path: str, image: np.ndarray, compress_level: int = 6) -> None:
    """uint8 HW / HW3 / HW4, or uint16 HW (16-bit grayscale PNG)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native encoder unavailable")
    image = np.ascontiguousarray(image)
    bit16 = image.dtype == np.uint16
    if not bit16 and image.dtype != np.uint8:
        raise ValueError(f"unsupported dtype {image.dtype}")
    channels = 1 if image.ndim == 2 else image.shape[2]
    if bit16 and channels != 1:
        raise ValueError("16-bit PNG is grayscale-only")
    ok = lib.ede_encode_png(
        path.encode(), image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1], channels, int(bit16),
        int(compress_level))
    if not ok:
        raise IOError(f"native PNG encode failed: {path}")


def encode_jpeg(path: str, image: np.ndarray, quality: int = 90) -> None:
    """uint8 HW3 RGB or uint8 HW grayscale."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native encoder unavailable")
    image = np.ascontiguousarray(image)
    if image.dtype != np.uint8 or image.ndim not in (2, 3) \
            or (image.ndim == 3 and image.shape[2] != 3):
        raise ValueError("expected uint8 HW3 RGB or HW grayscale")
    channels = 1 if image.ndim == 2 else 3
    ok = lib.ede_encode_jpeg(
        path.encode(), image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1], int(quality), channels)
    if not ok:
        raise IOError(f"native JPEG encode failed: {path}")


def write_mjpeg_avi(path: str, frames_rgb: np.ndarray, fps: int = 24,
                    quality: int = 90, threads: int | None = None) -> None:
    """Contiguous (N, H, W, 3) uint8 RGB → one MJPEG .avi (RIFF AVI 1.0)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native encoder unavailable")
    frames_rgb = np.ascontiguousarray(frames_rgb)
    if frames_rgb.dtype != np.uint8 or frames_rgb.ndim != 4 \
            or frames_rgb.shape[3] != 3:
        raise ValueError("expected uint8 NHW3 RGB frames")
    n, h, w, _ = frames_rgb.shape
    threads = threads or min(os.cpu_count() or 1, n)
    ok = lib.ede_write_mjpeg_avi(
        path.encode(),
        frames_rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, int(fps), int(quality), int(threads))
    if not ok:
        raise IOError(f"native MJPEG/AVI encode failed: {path}")


class NativeVideoWriter:
    """Streaming MJPEG/AVI writer: open → append RGB frames → close.

    The container fields that depend on the frame count are patched at
    close, so arbitrarily long videos stream without buffering
    (depth_video's 3840×1440 hstack frames would not fit in RAM).
    """

    def __init__(self, path: str, size_wh: tuple[int, int], fps: int = 24,
                 quality: int = 90):
        lib = _load()
        if lib is None:
            raise RuntimeError("native encoder unavailable")
        self._lib = lib
        self._w, self._h = int(size_wh[0]), int(size_wh[1])
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._handle = lib.ede_avi_open(path.encode(), self._h, self._w,
                                        int(fps), int(quality))
        if not self._handle:
            raise IOError(f"native AVI open failed: {path}")

    def write(self, frame_rgb: np.ndarray) -> None:
        frame_rgb = np.ascontiguousarray(frame_rgb)
        if frame_rgb.dtype != np.uint8 \
                or frame_rgb.shape != (self._h, self._w, 3):
            raise ValueError(
                f"expected uint8 ({self._h}, {self._w}, 3) RGB frame, got "
                f"{frame_rgb.dtype} {frame_rgb.shape}")
        ok = self._lib.ede_avi_append(
            self._handle,
            frame_rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if not ok:
            raise IOError("native AVI append failed")

    def release(self) -> None:
        if self._handle:
            ok = self._lib.ede_avi_close(self._handle)
            self._handle = None
            if not ok:
                raise IOError("native AVI close failed")

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.release()
