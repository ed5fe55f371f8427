"""Profiling & observability: XLA traces + device memory accounting.

TPU-native replacement for the reference's CUDA instrumentation
(``torch.cuda.reset_peak_memory_stats`` / ``max_memory_cached`` etc.,
SURVEY §5): `jax.profiler` traces viewable in TensorBoard/Perfetto and
``memory_stats()`` snapshots, plus a blocked wall-clock timer for honest
async-dispatch measurements.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "device_memory_stats", "peak_device_memory", "timed_blocked"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture an XLA profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    device = device or jax.local_devices()[0]
    return device.memory_stats() or {}


def peak_device_memory(device=None) -> int:
    """Peak bytes in use on the device (0 when the backend doesn't report)."""
    return int(device_memory_stats(device).get("peak_bytes_in_use", 0))


def timed_blocked(fn, *args, warmup: int = 2, iters: int = 10, **kwargs):
    """Measure fn's steady-state wall time with block_until_ready fencing.

    Returns (seconds_per_call, last_output).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args, **kwargs))
    return (time.perf_counter() - t0) / iters, out
