"""Device prefetch: overlap host->device transfer with TPU compute.

Wraps a host batch iterator and keeps `depth` batches already transferred
(sharded over the mesh's data axis) ahead of the consumer — the standard
JAX input-pipeline pattern replacing torch's pin_memory+non_blocking copies
(reference train.py:107-122).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax
import numpy as np


def device_prefetch(iterator: Iterable, sharding=None,
                    depth: int = 2) -> Iterator:
    """Yield device-resident batches, keeping `depth` in flight.

    device_put is async: the transfer is enqueued immediately and the queue
    keeps the pipeline `depth` deep while the consumer computes.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return tuple(jax.device_put(np.asarray(b)) for b in batch)
        return tuple(jax.device_put(np.asarray(b), sharding) for b in batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
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
