"""Device-mesh construction and sharding helpers.

TPU-native replacement for ``torch.nn.DataParallel`` (ReSIDE/train.py:93-101
and four other call sites, SURVEY §2f): a 1-D ``Mesh(('data',))`` over all
local devices; parameters replicated, batches sharded along ``data``.
Gradient all-reduces are compiled by XLA onto ICI — there is no hand-written
communication backend. For multi-host pods, call
``jax.distributed.initialize`` before ``create_mesh`` and the same program
scales across slices (DCN collectives inserted by the compiler).

The model axis is deliberately present-but-unused (size 1 by default): the
largest model here is ~258 MB (RN50-HU, BASELINE.md), so tensor parallelism
never pays for its collectives — but the mesh shape keeps the door open.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "data_sharding", "replicated_sharding", "shard_batch",
           "scale_batch_size", "spatial_sharding", "zero1_shardings",
           "zero1_state_shardings"]


def create_mesh(n_devices: int | None = None, model_parallel: int = 1,
                devices=None) -> Mesh:
    """1-D data mesh (optionally ×model axis) over local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding along the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activation sharding that splits image *height* across every mesh
    device (batch and width stay whole).

    Spatial parallelism for latency-bound serving: a single 640×480 frame is
    too small a batch to data-shard, but its rows aren't — with the input
    pinned to this sharding GSPMD partitions every conv spatially and
    compiles the kernel-overlap halo exchanges (collective-permute of edge
    rows) onto ICI, so one frame's FLOPs spread across the slice. Use via
    ``make_infer_fn(..., mesh=..., spatial=True)``, which applies this as a
    ``with_sharding_constraint`` inside the program — uneven row counts are
    then handled by GSPMD's shard padding (jit argument pins would demand
    divisibility)."""
    return NamedSharding(mesh, P(None, ("data", "model")))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, sharded along the data axis."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, batch
    )


def zero1_shardings(tree, mesh: Mesh, axis: str = "data"):
    """Per-leaf shardings that split a pytree across ``axis`` (ZeRO-1 style).

    Each array leaf is sharded along its *largest* dimension divisible by the
    axis size (conv kernels are HWIO, so the wide O dim is the usual pick);
    leaves with no divisible dimension, and scalars (Adam ``count``), stay
    replicated. Applied to the optimizer state this is ZeRO stage 1: every
    device stores 1/N of the Adam moments, XLA's partitioner runs the
    moment/update elementwise math on the local shard, and the weight update
    is re-gathered — identical numerics (elementwise ops are exact under any
    partitioning), N× less optimizer HBM.
    """
    n = mesh.shape[axis]

    def leaf(x):
        shape = getattr(x, "shape", ())
        dims = [i for i, d in enumerate(shape) if d % n == 0 and d > 0]
        if not dims:
            return replicated_sharding(mesh)
        best = max(dims, key=lambda i: shape[i])
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf, tree)


def zero1_state_shardings(state, mesh: Mesh, axis: str = "data"):
    """TrainState-shaped sharding pytree: params/BN/step replicated (the SPMD
    forward wants whole weights), optimizer state ZeRO-1-sharded."""
    rep = replicated_sharding(mesh)
    return state.replace(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=zero1_shardings(state.opt_state, mesh, axis),
    )


def scale_batch_size(per_device: int = 8, mesh: Mesh | None = None) -> int:
    """The reference scales batch 8→32→64 for 1→4→8 GPUs (train.py:93-101);
    the mesh generalization is per-device × data-axis size."""
    n = mesh.shape["data"] if mesh is not None else len(jax.devices())
    return per_device * n
