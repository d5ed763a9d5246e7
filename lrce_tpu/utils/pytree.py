"""Parameter-pytree helpers: counting, L2 regularization, path labeling."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def param_count(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """L2 norm with a zero-subgradient at 0 (torch norm backward convention);
    a plain sqrt(sum(x^2)) has a NaN gradient at exactly-zero leaves."""
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)))
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, norm, 0.0)


def l2_reg(params: Any) -> jnp.ndarray:
    """Sum of *un-squared* L2 norms over every parameter leaf.

    Matches the reference's manual regularizer Sum_p ||p||_2 (reference
    lrce/agent/agent_base.py:103-108), which is NOT classic weight decay.
    """
    leaves = jax.tree_util.tree_leaves(params)
    return sum(_safe_norm(x) for x in leaves)


def label_params(params: Any, label_fn: Callable[[str], str]) -> Any:
    """Label each leaf by its '/'-joined key path (for optax.multi_transform)."""

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(lambda p, _: label_fn(path_str(p)), params)


def tree_cast(params: Any, dtype) -> Any:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
