"""Positional embeddings for the LRCE fusion inputs.

Functional re-design of the reference embedding modules (reference
lrce/models/embedding.py:10-63): a learned CLS + position embedding for text,
and a 4-factor video embedding (CLS per clip, spatial position, temporal
position within clip, clip index) followed by LayerNorm(eps=1e-12) and a
flatten to (B, n_clips, T*(1+HW), D).
"""

from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp

from lrce_tpu.ops.nn import layer_norm, layer_norm_init

LN_EPS = 1e-12


def xavier_normal(rng, shape, dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.init.xavier_normal_ semantics for >=2-D tensors: fan_in =
    shape[1]*prod(shape[2:]), fan_out = shape[0]*prod(shape[2:])
    (reference lrce/models/embedding.py:4-7 initializes all embeddings this way).
    """
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)


# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------

def text_pos_embed_init(rng, seq_len: int, feature_dim: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "emb_cls": xavier_normal(k1, (1, 1, feature_dim), dtype),
        "emb_pos": xavier_normal(k2, (1, 1 + seq_len, feature_dim), dtype),
        "layer_norm": layer_norm_init(feature_dim, dtype),
    }


def text_pos_embed(params: dict, text_features: jnp.ndarray) -> jnp.ndarray:
    """(B, L, D) -> (B, 1+L, D): prepend CLS, add positions, LayerNorm."""
    batch = text_features.shape[0]
    cls = jnp.broadcast_to(params["emb_cls"].astype(text_features.dtype),
                           (batch, 1, text_features.shape[-1]))
    x = jnp.concatenate([cls, text_features], axis=1)
    x = x + params["emb_pos"].astype(x.dtype)
    return layer_norm(params["layer_norm"], x, eps=LN_EPS)


# ---------------------------------------------------------------------------
# Video
# ---------------------------------------------------------------------------

def video_pos_embed_init(rng, feature_dim: int,
                         video_feature_res: Iterable[int] = (7, 7),
                         frame_sample_size: int = 5, clip_size: int = 6,
                         dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    hw = video_feature_res[0] * video_feature_res[1]
    return {
        "emb_cls": xavier_normal(k1, (1, 1, 1, 1, feature_dim), dtype),
        "emb_pos": xavier_normal(k2, (1, 1, 1, 1 + hw, feature_dim), dtype),
        "emb_len": xavier_normal(
            k3, (1, 1, (frame_sample_size + 1) // 2, 1, feature_dim), dtype),
        "emb_clip": xavier_normal(k4, (1, clip_size, 1, 1, feature_dim), dtype),
        "layer_norm": layer_norm_init(feature_dim, dtype),
    }


def video_pos_embed(params: dict, video_features: jnp.ndarray) -> jnp.ndarray:
    """(B, n_clips, T, HW, D) -> (B, n_clips, T*(1+HW), D).

    Adds a CLS token per (clip, temporal) position, then three additive
    embeddings (spatial / temporal-within-clip / clip-index), LayerNorm,
    and flattens the temporal+token axes — same math as the reference
    (lrce/models/embedding.py:47-63) in one fused broadcast chain.
    """
    b, n_clips, t, hw, d = video_features.shape
    dt = video_features.dtype

    cls = jnp.broadcast_to(params["emb_cls"].astype(dt), (b, n_clips, t, 1, d))
    x = jnp.concatenate([cls, video_features], axis=3)  # (b, S, t, 1+hw, d)
    x = x + params["emb_pos"].astype(dt)
    x = x + params["emb_len"].astype(dt)
    x = x + params["emb_clip"].astype(dt)
    x = layer_norm(params["layer_norm"], x, eps=LN_EPS)
    return x.reshape(b, n_clips, t * (1 + hw), d)
