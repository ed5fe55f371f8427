"""Multi-host (pod-slice) runtime: process init + per-process data feeding.

TPU-native scale-out of the reference's single-process DataParallel ladder
(ReSIDE/train.py:93-101, SURVEY §2f): on a pod slice every host runs the same
program; ``jax.distributed.initialize`` wires the coordination service, the
mesh spans *all* processes' devices, and each host loads only the rows of the
global batch its addressable devices own. Global arrays are assembled with
``jax.make_array_from_process_local_data`` — XLA then all-reduces gradients
over ICI within a slice and DCN across slices, with no code changes to the
train step.

Single-process behaviour is the identity: with one process the local rows are
the whole batch, so ``distributed_batch_iterator`` degrades to
``batch_iterator`` + ``shard_batch``.
"""

from __future__ import annotations

import os
from typing import Iterator

import jax
import numpy as np

from efficientdepthestimation_tpu.parallel.mesh import data_sharding

__all__ = ["maybe_initialize_distributed", "process_local_rows",
           "make_global_batch", "distributed_batch_iterator"]

# Environment variables that indicate a multi-process launch. Cloud TPU pods
# auto-populate the JAX coordination config; the EDE_* ones allow explicit
# CPU/GPU multi-process runs (tests use them).
_DIST_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "EDE_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def maybe_initialize_distributed() -> bool:
    """Call ``jax.distributed.initialize`` when the environment indicates a
    multi-process run (pod slice or explicit coordinator). Returns True if
    the distributed runtime is active after the call.

    Explicit configuration (tests / non-TPU): set EDE_COORDINATOR_ADDRESS,
    EDE_NUM_PROCESSES and EDE_PROCESS_ID. On Cloud TPU pods the TPU metadata
    provides everything and plain ``initialize()`` suffices.
    """
    # NB: must not touch the XLA backend (jax.devices / process_count) before
    # deciding — jax.distributed.initialize only works pre-backend-creation.
    if not any(v in os.environ for v in _DIST_ENV_VARS):
        return jax.process_count() > 1
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already initialized
    kwargs = {}
    if "EDE_COORDINATOR_ADDRESS" in os.environ:
        kwargs = dict(
            coordinator_address=os.environ["EDE_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["EDE_NUM_PROCESSES"]),
            process_id=int(os.environ["EDE_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def process_local_rows(mesh, global_batch_size: int) -> np.ndarray:
    """Global-batch row indices owned by this process's addressable devices,
    in the order ``jax.make_array_from_process_local_data`` expects (ascending
    global slice start)."""
    sharding = data_sharding(mesh)
    imap = sharding.addressable_devices_indices_map((global_batch_size,))
    spans = []
    for idx in imap.values():
        sl = idx[0]
        spans.append((sl.start or 0,
                      global_batch_size if sl.stop is None else sl.stop))
    rows: list[int] = []
    for start, stop in sorted(dict.fromkeys(spans)):
        rows.extend(range(start, stop))
    return np.asarray(rows, np.int64)


def make_global_batch(local_batch: dict, mesh) -> dict:
    """Assemble per-process local arrays into globally-sharded jax.Arrays."""
    sharding = data_sharding(mesh)

    def put(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) == 0:
            return x
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return {k: put(v) for k, v in local_batch.items()}


def distributed_batch_iterator(
    dataset,
    global_batch_size: int,
    mesh,
    *,
    shuffle: bool = False,
    seed: int = 0,
    num_workers: int = 4,
    pad_last: bool = True,
    skip_batches: int = 0,
) -> Iterator[dict]:
    """Yield globally-sharded batches, each process decoding only its rows.

    The global shuffle order is seed-deterministic and identical across
    processes (every host derives the same permutation), so row ownership is
    consistent without communication — the multi-host generalization of
    ``batch_iterator``'s contract. ``num_valid`` is the true global count
    (trailing pad_last duplicates are masked downstream). ``skip_batches``
    fast-forwards past the first N global batches without decoding (exact
    mid-epoch resume; deterministic, so every process skips identically).
    """
    import concurrent.futures as cf

    indices = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(indices)
    indices = indices[skip_batches * global_batch_size:]
    local_rows = process_local_rows(mesh, global_batch_size)
    native_loader = getattr(dataset, "load_batch", None)

    with cf.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for start in range(0, len(indices), global_batch_size):
            chunk = indices[start:start + global_batch_size]
            num_valid = len(chunk)
            if len(chunk) < global_batch_size:
                if not pad_last:
                    return
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], global_batch_size - len(chunk))])
            local_chunk = chunk[local_rows]

            batch = native_loader(local_chunk) if native_loader else None
            if batch is not None:
                images, depths = batch
            else:
                samples = list(pool.map(lambda i: dataset[int(i)], local_chunk))
                images = np.stack([s[0] for s in samples])
                depths = np.stack([s[1] for s in samples])
            global_batch = make_global_batch(
                {"image": images, "depth": depths}, mesh)
            global_batch["num_valid"] = num_valid
            yield global_batch
