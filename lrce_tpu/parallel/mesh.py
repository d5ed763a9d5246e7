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


def make_mesh_3d(data: int, fsdp: int, model: int,
                 axis_names: Sequence[str] = ("data", "fsdp", "model")
                 ) -> Mesh:
    """data x fsdp x model mesh: plain DP + ZeRO/FSDP parameter sharding +
    Megatron tensor parallelism. The batch shards over data AND fsdp (see
    batch_axes); params/optimizer state shard over fsdp (+ model) per
    lrce_tpu.parallel.sharding.e2e_param_shardings."""
    devices = np.asarray(jax.devices()[:data * fsdp * model])
    return Mesh(devices.reshape(data, fsdp, model), tuple(axis_names))


def make_train_mesh(fsdp: int = 1, model: int = 1) -> Mesh:
    """Mesh for the train/eval CLIs: data x fsdp x model over all local
    devices, degrading to the plain 1-D data mesh when fsdp == model == 1."""
    n = len(jax.devices())
    if fsdp < 1 or model < 1 or n % (fsdp * model) != 0:
        raise ValueError(
            f"--fsdp {fsdp} x --tensor-parallel {model} must divide the "
            f"device count ({n})")
    data = n // (fsdp * model)
    if fsdp == 1 and model == 1:
        return make_mesh()
    if fsdp == 1:
        return make_mesh_2d(data, model)
    return make_mesh_3d(data, fsdp, model)


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the global batch shards over: 'data' plus, when present,
    'fsdp' (FSDP is extra data parallelism with sharded param storage)."""
    return tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    return NamedSharding(mesh, P(batch_axes(mesh) if axis is None else axis))


def shard_batch(mesh: Mesh, batch, axis=None):
    sh = batch_sharding(mesh, axis)
    return tuple(jax.device_put(np.asarray(b), sh) for b in batch)


_MULTIHOST_INITIALIZED = False


def initialize_multihost() -> None:
    """Multi-host (DCN) rendezvous — call once at startup on multi-host pods.

    Single-host runs need nothing and are left untouched. Multi-host intent
    is decided purely from the environment BEFORE any backend-initializing
    JAX API is called (`jax.process_count()` would initialize the local
    backend and make `jax.distributed.initialize()` impossible — the
    round-1 bug). Triggers:

    - ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES`` /
      ``JAX_PROCESS_ID``): explicit rendezvous, mirrors the reference's
      MASTER_ADDR/RANK/WORLD_SIZE contract (reference train.py:10-13).
    - ``LRCE_TPU_MULTIHOST=1``: let JAX auto-detect the cluster (TPU pod
      metadata / Slurm / GKE).

    Failures are fatal: silently degrading a pod run to N independent
    single-host runs is worse than crashing.
    """
    global _MULTIHOST_INITIALIZED
    if _MULTIHOST_INITIALIZED:
        return
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("LRCE_TPU_MULTIHOST") == "1"
    if not coord and not auto:
        return  # single-host / local run: do not touch the backend
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        raise RuntimeError(
            "Multi-host rendezvous was requested via the environment "
            f"({'JAX_COORDINATOR_ADDRESS' if coord else 'LRCE_TPU_MULTIHOST'})"
            f" but jax.distributed.initialize({kwargs}) failed. Refusing to "
            "silently fall back to single-host.") from e
    _MULTIHOST_INITIALIZED = True
