"""Parameter sharding rules: data-parallel replication + optional
Megatron-style tensor parallelism over a 'model' mesh axis + optional
ZeRO/FSDP-style parameter+optimizer sharding over an 'fsdp' mesh axis.

The reference is data-parallel only (SURVEY §2.2 — DDP is its single
strategy), so TP and FSDP are *extensions*:

- TP ('model' axis): the text encoder's and fusion decoder's big matrices
  shard column-/row-wise and GSPMD inserts the all-reduces.
  Column-parallel (output dim sharded): qkv / q/k/v projections, fc1.
  Row-parallel (input dim sharded): attention output proj, fc2.
  Everything else (embeddings, norms, row-parallel biases): replicated.

- FSDP ('fsdp' axis): every remaining text/fusion leaf (params AND the
  optimizer moments that mirror them) shards its largest still-unsharded
  divisible dim across the axis; the batch ALSO shards across 'fsdp', so
  the axis acts as extra data parallelism whose parameter/optimizer
  storage is 1/axis-size per chip (ZeRO-3). GSPMD inserts the weight
  all-gathers before use and reduce-scatters the gradients.

The Swin video encoder stays replicated under both axes — its hot path runs
through Pallas kernels that operate on full windows per chip (GSPMD cannot
repartition a pallas_call's operands), and its weights are comparatively
small next to BERT + the fusion decoder.
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


def constrain_layer_tp(layer_params: Any, mesh: Mesh,
                       model_axis: str = "model") -> Any:
    """Pin one scan iteration's per-layer param slice to its TP sharding.

    Called inside the `lax.scan` bodies that fold stacked encoder/decoder
    layers (models/bert.py, models/fusion.py). Without the constraint GSPMD
    places the per-iteration `dynamic-slice` of a TP-sharded stacked weight
    on the wrong 'model' shard, and — worse — the transpose accumulates the
    per-layer gradient into the stacked buffer through pairwise
    collective-permute swaps on EVERY scan iteration (8 permutes/iter
    observed in the compiled train step on a ('data','fsdp','model') mesh).
    Those permutes are pure resharding waste on ICI, and their mixed
    participant sets (pair all-gathers racing whole-mesh permutes) are the
    exact pattern that deadlocks XLA:CPU's in-process collective rendezvous
    on the virtual test mesh. Constraining the slice to the spec its
    stacked parent already has (minus the leading layer axis) removes them
    at the source.

    Only leaves the TP rules actually shard are constrained; everything
    else (incl. fsdp-only leaves) is left to GSPMD. No-op without a >1
    'model' axis.
    """
    if (mesh is None or model_axis not in mesh.axis_names
            or mesh.shape[model_axis] <= 1):
        return layer_params
    size = mesh.shape[model_axis]

    def one(path, leaf):
        spec = _spec_for(_path_str(path), leaf.ndim, model_axis)
        full = list(spec) + [None] * (leaf.ndim - len(spec))
        if all(a is None for a in full):
            return leaf
        for i, axis_name in enumerate(full):
            if axis_name is not None and leaf.shape[i] % size != 0:
                return leaf
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, P(*full)))

    return jax.tree_util.tree_map_with_path(one, layer_params)


def e2e_param_shardings(params: Any, mesh: Mesh,
                        model_axis: str = "model",
                        fsdp_axis: str = "fsdp") -> Any:
    """NamedSharding pytree for E2E params (and, via the same call, the
    optimizer state that mirrors them). With neither a 'model' nor an 'fsdp'
    axis in the mesh (or size-1 axes), everything degrades to replication."""
    has_model = (model_axis in mesh.axis_names
                 and mesh.shape[model_axis] > 1)
    has_fsdp = (fsdp_axis in mesh.axis_names
                and mesh.shape[fsdp_axis] > 1)

    def leaf_sharding(path, leaf):
        path_s = _path_str(path)
        spec = [None] * leaf.ndim
        if has_model:
            tp = _spec_for(path_s, leaf.ndim, model_axis)
            spec = list(tp) + [None] * (leaf.ndim - len(tp))
            # Only shard dims the leaf actually divides evenly
            for i, axis_name in enumerate(spec):
                if (axis_name is not None
                        and leaf.shape[i] % mesh.shape[model_axis] != 0):
                    spec = [None] * leaf.ndim
                    break
        if (has_fsdp and "video_extractor" not in path_s
                and all(s is None for s in spec)):
            # ZeRO-style: shard the LAST divisible dim (walking backward).
            # Last-dim-first matters for embedding tables: sharding the
            # vocab/index dim leaves every gather needing the full table,
            # which GSPMD reshards via involuntary full rematerialization
            # (collective-permutes); sharding the hidden dim partitions the
            # gather cleanly. Leaves the TP rules already shard are left to
            # TP alone — their storage is split by 'model' already, and a
            # mixed fsdp+model spec on one scanned (stacked-layer) weight
            # makes GSPMD reshard the per-layer slice with collective-
            # permutes inside the scan body.
            size = mesh.shape[fsdp_axis]
            for i in reversed(range(leaf.ndim)):
                if leaf.shape[i] >= size and leaf.shape[i] % size == 0:
                    spec[i] = fsdp_axis
                    break
        if all(s is None for s in spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    shardings = e2e_param_shardings(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
