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

__all__ = ["trace", "device_memory_stats", "peak_device_memory",
           "static_peak_memory", "peak_memory", "timed_blocked"]


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


def static_peak_memory(fn, *example_args) -> int:
    """Static peak-HBM estimate from the compiled executable, in bytes.

    Compiles ``fn`` as ONE program at the example arguments' shapes (inner
    jits inline under the outer trace) and sums the executable's
    ``memory_analysis()`` — temps + arguments + outputs + generated code,
    minus donated/aliased buffers counted twice. This is what XLA *reserves*,
    available on every backend at compile time — including through tunneled
    runtimes whose allocator telemetry (``memory_stats()``) is empty.
    Returns 0 when the backend exposes no analysis.

    Parity: the reference always reports peak memory
    (ReSIDE/inference_benchmark.py:111-164); a live-allocator number is
    better when present (``peak_memory`` below prefers it), but a static
    reservation beats the 0.0 the tunnel otherwise reports.
    """
    try:
        # An already-jitted fn is lowered directly (identical HLO → its
        # executable is already in the persistent compile cache); arbitrary
        # callables get wrapped, inlining any inner jits into one program.
        wrapped = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
        analysis = wrapped.lower(*example_args).compile().memory_analysis()
        if analysis is None:
            return 0
        total = (int(analysis.temp_size_in_bytes)
                 + int(analysis.argument_size_in_bytes)
                 + int(analysis.output_size_in_bytes)
                 + int(getattr(analysis, "generated_code_size_in_bytes", 0))
                 - int(getattr(analysis, "alias_size_in_bytes", 0)))
        return max(total, 0)
    except Exception:
        return 0


def peak_memory(fn=None, example_args=(), device=None) -> tuple[int, str]:
    """(peak_bytes, source) — live allocator stats when the backend reports
    them, else the compiled executable's static reservation for ``fn`` at
    ``example_args``, else (0, "unavailable"). ``source`` is one of
    "live" / "static" / "unavailable" so reports can label what they show."""
    live = peak_device_memory(device)
    if live > 0:
        return live, "live"
    if fn is not None:
        static = static_peak_memory(fn, *example_args)
        if static > 0:
            return static, "static"
    return 0, "unavailable"


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
