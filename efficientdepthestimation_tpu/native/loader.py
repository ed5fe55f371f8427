"""ctypes bindings + lazy build for the C++ batch image decoder."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SRC = os.path.join(_SRC_DIR, "batch_loader.cpp")
_LIB_PATH = os.path.join(_SRC_DIR, "libede_loader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def build_library(force: bool = False) -> str | None:
    """Compile the decoder .so (g++ -O3, links png/jpeg/z/pthread)."""
    global _build_failed
    if os.path.exists(_LIB_PATH) and not force:
        if not force and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
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
        warnings.warn(f"native loader build failed: {detail[:500]}")
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
        lib.ede_decode_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.ede_decode_depth16_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _paths_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_rgb_batch(paths: list[str], height: int, width: int,
                     threads: int | None = None,
                     out: np.ndarray | None = None) -> np.ndarray:
    """Decode PNG/JPEG files → (N, H, W, 3) uint8. Raises on any failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, 3), np.uint8)
    status = (ctypes.c_int * n)()
    threads = threads or min(os.cpu_count() or 1, n)
    lib.ede_decode_rgb_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, threads, status)
    failed = [paths[i] for i in range(n) if not status[i]]
    if failed:
        raise IOError(f"native decode failed for: {failed[:3]}")
    return out


def decode_depth16_batch(paths: list[str], height: int, width: int,
                         threads: int | None = None,
                         out: np.ndarray | None = None) -> np.ndarray:
    """Decode grayscale PNGs → (N, H, W) uint16 (8-bit inputs widened)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width), np.uint16)
    status = (ctypes.c_int * n)()
    threads = threads or min(os.cpu_count() or 1, n)
    lib.ede_decode_depth16_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        height, width, threads, status)
    failed = [paths[i] for i in range(n) if not status[i]]
    if failed:
        raise IOError(f"native decode failed for: {failed[:3]}")
    return out
