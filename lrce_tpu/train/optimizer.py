"""Multi-group AdamW optimizer with per-step learning rates.

Matches the reference optimizer exactly (reference
lrce/agent/agent_base.py:27-44): torch AdamW with betas (0.9, 0.999),
eps 1e-8, decoupled weight decay 0.01 (torch default), and THREE param
groups — fusion_model / text_extractor / video_extractor — each with its own
learning rate.

TPU-first design: one shared `optax.scale_by_adam` moment state over the
whole pytree; per-group learning rates arrive as a (3,)-vector *argument* to
the jitted step (no optimizer re-build when the scheduler moves), and the
group assignment is a static label pytree derived from the top-level key.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

GROUPS = ("fusion_model", "text_extractor", "video_extractor")
WEIGHT_DECAY = 0.01
BETAS = (0.9, 0.999)
EPS = 1e-8


def group_index_tree(params: Any) -> Any:
    """Label every leaf with its param-group index (0=fusion, 1=text, 2=video),
    following the reference's module split (agent_base.py:27-44)."""
    def label_subtree(subtree, idx):
        return jax.tree_util.tree_map(lambda _: idx, subtree)

    return {k: label_subtree(params[k], GROUPS.index(k)) for k in params}


def make_optimizer() -> optax.GradientTransformation:
    return optax.scale_by_adam(b1=BETAS[0], b2=BETAS[1], eps=EPS)


def apply_updates(params: Any, grads: Any, opt_state: Any,
                  adam: optax.GradientTransformation, labels: Any,
                  lrs: jnp.ndarray,
                  weight_decay: float = WEIGHT_DECAY) -> Tuple[Any, Any]:
    """One AdamW step: p <- p - lr_g * (adam(g) + wd * p)."""
    updates, opt_state = adam.update(grads, opt_state, params)

    def upd(u, p, g_idx):
        lr = lrs[g_idx]
        return (p.astype(jnp.float32)
                - lr * (u.astype(jnp.float32)
                        + weight_decay * p.astype(jnp.float32))).astype(p.dtype)

    new_params = jax.tree_util.tree_map(upd, updates, params, labels)
    return new_params, opt_state
