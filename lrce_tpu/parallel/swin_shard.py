"""Swin video tower under an explicit multi-chip mesh: `jax.shard_map`
over the batch axes.

Why this exists: the Swin hot path runs through Pallas (Mosaic) kernels,
and GSPMD cannot repartition a `pallas_call`'s operands — on a >1-device
mesh the partitioner either fails to lower the custom call or degrades to
replicated compute behind an activation all-gather, forfeiting
data-parallel scaling of the dominant compute (the risk documented in
lrce_tpu/parallel/sharding.py). The kernels themselves are embarrassingly
batch-parallel (their grid is over clips x window rows), so the correct
TPU-native shape is *manual* sharding: `jax.shard_map` splits the clip
batch across the mesh's batch axes and runs the whole tower — patch embed,
every fused kernel, rolls, patch merging — per shard with ZERO collectives
inside. Swin weights enter replicated (in_spec P()); shard_map's transpose
inserts the single per-leaf gradient psum over the batch axes at the
boundary, which is exactly the DDP all-reduce the reference performs over
NCCL (reference train.py:137-138, lrce/agent/agent_base.py:75-76).

ALL mesh axes become manual inside the region — including a 'model'
(tensor-parallel) axis when present. Swin weights and activations are
replicated across 'model' (lrce_tpu/parallel/sharding.py), so the only
correct partitioning over it is "run the same shards everywhere"; leaving
'model' in auto mode instead lets GSPMD re-partition Swin internals over
it, and the resulting mixed auto/manual collectives deadlock the CPU
backend's in-process rendezvous (observed: pair all-gathers racing the
boundary collective-permute on the virtual 8-device mesh). Full-manual
means ZERO collectives inside the region, on any axis.
`check_vma=False` because `pallas_call` results carry no varying
-manual-axes annotation; gradient correctness under this flag (including
no double-psum over the replicated 'model' axis) is covered by
tests/test_pallas_multichip.py against the unsharded single-device path.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lrce_tpu.parallel.mesh import batch_axes


def _batch_shards(mesh: Mesh) -> int:
    return int(math.prod(mesh.shape[a] for a in batch_axes(mesh)))


def swin_forward_sharded(params: dict, x: jnp.ndarray, cfg, *,
                         mesh: Optional[Mesh] = None,
                         deterministic: bool = True,
                         rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """swin_forward, manually sharded over the mesh's batch axes.

    x: (B', D, H, W, 3) with B' = batch * n_clips (clips fold into the
    batch axis upstream — lrce_tpu/models/e2e.py extract_video_features).
    Degrades to the plain call when there is no mesh or the batch axes have
    size 1. When B' does not divide the batch shards (possible only off the
    training path, e.g. an eval tail batch), the clip batch is zero-padded
    to the next shard multiple and the result sliced back — padding keeps
    the fused Pallas kernels under manual sharding instead of handing the
    custom calls to GSPMD, which this module exists to avoid (it replicates
    them behind an activation all-gather or fails to lower).
    """
    from lrce_tpu.models.swin3d import swin_forward

    if mesh is None:
        return swin_forward(params, x, cfg, deterministic=deterministic,
                            rng=rng)
    axes = batch_axes(mesh)
    n = _batch_shards(mesh)
    if n <= 1:
        return swin_forward(params, x, cfg, deterministic=deterministic,
                            rng=rng)
    b_in = x.shape[0]
    pad = (-b_in) % n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    batch_spec = P(axes, None, None, None, None)
    # Pin the operand's layout to the spec the shard_map consumes: without
    # the constraint GSPMD may park the folded (batch*clips) activation on a
    # different sharding (observed: a whole-mesh collective-permute feeding
    # the region on the virtual 8-device mesh) — a pure resharding pass on
    # ICI, and on XLA:CPU a deadlock hazard against concurrent sub-axis
    # collectives (see __graft_entry__._reexec_with_virtual_devices).
    from jax.sharding import NamedSharding

    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, batch_spec))

    if rng is None:
        def body(p, xs):
            return swin_forward(p, xs, cfg, deterministic=deterministic,
                                rng=None)

        out = jax.shard_map(
            body, mesh=mesh, in_specs=(P(), batch_spec),
            out_specs=batch_spec, axis_names=set(mesh.axis_names),
            check_vma=False)(params, x)
        return out[:b_in] if pad else out

    def body(p, xs, key):
        # independent per-shard randomness (drop_path draws): fold the
        # linearized shard index into the key
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        key = jax.random.fold_in(key, idx)
        return swin_forward(p, xs, cfg, deterministic=deterministic, rng=key)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), batch_spec, P()),
        out_specs=batch_spec, axis_names=set(mesh.axis_names),
        check_vma=False)(params, x, rng)
    return out[:b_in] if pad else out
