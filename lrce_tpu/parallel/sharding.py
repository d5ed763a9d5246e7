"""Parameter sharding rules: data-parallel replication + optional
Megatron-style tensor parallelism over a 'model' mesh axis.

The reference is data-parallel only (SURVEY §2.2 — DDP is its single
strategy), so TP is an *extension*: the text encoder's and fusion decoder's
big matrices shard column-/row-wise over the 'model' axis and GSPMD inserts
the all-reduces. The Swin video encoder stays replicated — its hot path runs
through Pallas kernels that operate on full windows per chip, and its weights
are comparatively small.

Column-parallel (output dim sharded): qkv / q/k/v projections, fc1.
Row-parallel (input dim sharded): attention output proj, fc2.
Everything else (embeddings, norms, biases of row-parallel layers): replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def _spec_for(path: str, ndim: int, model_axis: str) -> P:
    """PartitionSpec for one leaf. Weight layout is (in, out); stacked layers
    add a leading layer axis, so rules key off the LAST dims."""
    none_prefix = (None,) * (ndim - 1)

    def last(axis):
        return P(*(none_prefix + (axis,)))

    def second_last(axis):
        if ndim < 2:
            return P()
        return P(*((None,) * (ndim - 2) + (axis, None)))

    if "video_extractor" in path:
        return P()  # replicated: pallas window kernels need full windows

    # column-parallel weights: shard the output (last) dim
    col_w = ("self_attn/in_w", "multihead_attn/in_w", "linear1/w",
             "attention/query/w", "attention/key/w", "attention/value/w",
             "intermediate/w")
    # row-parallel weights: shard the input (second-to-last) dim
    row_w = ("self_attn/out/w", "multihead_attn/out/w", "linear2/w",
             "attention/output/w", "output/w")
    # biases of column-parallel layers follow the sharded output dim
    col_b = ("self_attn/in_b", "multihead_attn/in_b", "linear1/b",
             "attention/query/b", "attention/key/b", "attention/value/b",
             "intermediate/b")

    for pat in col_w:
        if path.endswith(pat):
            return last(model_axis)
    for pat in row_w:
        if path.endswith(pat):
            return second_last(model_axis)
    for pat in col_b:
        if path.endswith(pat):
            return last(model_axis)
    return P()


def e2e_param_shardings(params: Any, mesh: Mesh,
                        model_axis: str = "model") -> Any:
    """NamedSharding pytree for E2E params. With no 'model' axis in the mesh
    (or size-1), everything degrades to replication."""
    has_model = (model_axis in mesh.axis_names
                 and mesh.shape[model_axis] > 1)

    def leaf_sharding(path, leaf):
        if not has_model:
            return NamedSharding(mesh, P())
        spec = _spec_for(_path_str(path), leaf.ndim, model_axis)
        # Only shard dims the leaf actually divides evenly
        for axis_name, dim in zip(spec, leaf.shape):
            if axis_name is not None and dim % mesh.shape[model_axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    shardings = e2e_param_shardings(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
