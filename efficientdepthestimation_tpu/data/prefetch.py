"""Host→device prefetching: overlap PNG decode/stacking with TPU compute.

The reference relies on DataLoader workers + implicit cudaMemcpy per batch
(loaddata.py:62). Here batches are asynchronously ``device_put`` (optionally
sharded over a mesh's data axis) one step ahead, so HBM transfers ride under
the previous step's compute.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax

__all__ = ["device_prefetch"]


def device_prefetch(iterator: Iterable, size: int = 2, sharding=None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` transfers in flight."""

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
                batch,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if hasattr(x, "shape") else x, batch
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
