"""Task losses — reference-parity semantics, vectorized.

  - cross_entropy: torch CrossEntropyLoss(ignore_index=-100) semantics
    (reference lrce/agent/agent_base.py:25): mean over non-ignored samples.
  - hinge_loss: vectorized form of the reference's per-sample loop
    (reference lrce/agent/agent_mc.py:20-41):
    mean_i sum_{j != gt_i} max(out_ij - out_i,gt + margin, 0).
  - mse: per-sample squared errors (reduction='none',
    reference agent_count.py:17) — callers mean it for the loss and
    accumulate the vector for metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lrce_tpu.constants import IGNORE_INDEX


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(B, C) x (B,) -> scalar; labels == IGNORE_INDEX are excluded from the
    mean (NaN when every label is ignored, like torch)."""
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    return jnp.sum(nll * valid) / jnp.sum(valid)


def hinge_loss(out: jnp.ndarray, gt: jnp.ndarray,
               margin: float = 1.0) -> jnp.ndarray:
    """(B, M) scores x (B,) correct index -> scalar."""
    b, m = out.shape
    correct = jnp.take_along_axis(out, gt[:, None], axis=1)  # (B, 1)
    viol = jnp.maximum(out - correct + margin, 0.0)
    not_gt = jnp.arange(m)[None, :] != gt[:, None]
    return jnp.mean(jnp.sum(viol * not_gt, axis=1))


def mse(out: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-sample squared error (B,)."""
    return jnp.square(out.astype(jnp.float32) - gt.astype(jnp.float32))
