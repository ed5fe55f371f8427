"""SPMD parallelism over a TPU device mesh."""

from efficientdepthestimation_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    scale_batch_size,
)
