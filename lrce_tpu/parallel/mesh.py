"""Device mesh + sharding helpers.

The reference's distribution story is one-process-per-GPU DDP over NCCL
(reference train.py:10-13,137-138; agent_base.py:75-76). TPU-natively that
whole layer collapses into GSPMD: build a `jax.sharding.Mesh` over the
chips, shard the global batch over the 'data' axis, replicate params, and
XLA inserts the gradient all-reduce over ICI inside the compiled train step.
Multi-host runs only add `jax.distributed.initialize()` (DCN rendezvous) —
there is no hand-written process-group management.

The mesh is built with a 'model' axis of size 1 by default so tensor-sharding
experiments can widen it without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
        arr = arr.reshape(shape)
    return Mesh(arr, tuple(axis_names))


def make_mesh_2d(data: int, model: int,
                 axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """data x model mesh for combined DP + tensor parallelism."""
    devices = np.asarray(jax.devices()[:data * model]).reshape(data, model)
    return Mesh(devices, tuple(axis_names))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    sh = batch_sharding(mesh, axis)
    return tuple(jax.device_put(np.asarray(b), sh) for b in batch)


def initialize_multihost() -> None:
    """Multi-host (DCN) rendezvous — call once at startup on multi-host pods.
    Single-host runs need nothing."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host / local run
