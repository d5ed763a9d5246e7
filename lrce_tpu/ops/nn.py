"""Functional neural-net primitives with pytree parameters.

Design notes (TPU-first):
  - Parameters live in plain nested dicts -> trivially shardable with
    jax.sharding and trivially convertible from torch state dicts.
  - Weight layout is (in_features, out_features) so the hot path is
    `x @ w` with no transposes (torch stores the transpose).
  - Matmuls force f32 accumulation via preferred_element_type so bf16
    activations keep MXU-native speed without losing the accumulator.
  - LayerNorm/softmax compute in f32 regardless of activation dtype,
    mirroring what CUDA AMP autocast does in the reference
    (reference lrce/agent/agent_oe.py:28).

Numerical parity targets:
  - gelu is the *exact* erf formulation — torch F.gelu default, used by the
    reference fusion (reference lrce/models/fusionv3.py:15), BERT, and Swin.
  - mha matches torch.nn.MultiheadAttention with packed qkv projections.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU; computed in f32 for bf16 inputs."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(orig)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32,
               init: str = "torch_linear") -> dict:
    """Initialize a dense layer.

    "torch_linear" follows torch.nn.Linear's default kaiming-uniform +
    fan-in-bound bias so random-init training behaves like the reference.
    """
    wkey, bkey = jax.random.split(rng)
    if init == "torch_linear":
        bound = 1.0 / math.sqrt(in_dim)
        k = math.sqrt(6.0 / in_dim) / math.sqrt(3.0)  # kaiming_uniform a=sqrt(5)
        # torch kaiming_uniform_(a=sqrt(5)) => U(-sqrt(3)*std, ...) with
        # std = gain/sqrt(fan_in), gain = sqrt(2/(1+5)) = 1/sqrt(3)
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -k, k)
        b = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    elif init == "trunc_normal":
        w = 0.02 * jax.random.truncated_normal(wkey, -2.0, 2.0, (in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype)
    elif init == "xavier_uniform":
        k = math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -k, k)
        b = jnp.zeros((out_dim,), dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": b}


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    w = params["w"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """LayerNorm over the last axis, f32 internal compute.

    eps defaults to 1e-12 (BERT / reference fusion, lrce/models/fusionv3.py:14);
    Swin uses torch's default 1e-5 — pass explicitly.
    """
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Multi-head attention (torch.nn.MultiheadAttention semantics)
# ---------------------------------------------------------------------------

def mha_init(rng, dim: int, num_heads: int, dtype=jnp.float32) -> dict:
    """Packed-projection MHA params, xavier-uniform like torch's default.

    Layout: in_w (dim, 3*dim) = [q|k|v] along the output axis, in_b (3*dim,),
    out {"w","b"}. torch packs in_proj_weight as (3*dim, dim); the converter
    transposes into this layout.
    """
    k1, k2 = jax.random.split(rng)
    # torch xavier_uniform_ on the (3*dim, dim) packed matrix -> fan based on
    # (3*dim + dim); replicate so random-init statistics match.
    bound = math.sqrt(6.0 / (3 * dim + dim))
    in_w = jax.random.uniform(k1, (dim, 3 * dim), dtype, -bound, bound)
    in_b = jnp.zeros((3 * dim,), dtype)
    del num_heads  # head count is passed to mha() — params stay a pure pytree
    out = dense_init(k2, dim, dim, dtype)
    out["b"] = jnp.zeros((dim,), dtype)  # torch zeroes out_proj bias
    return {"in_w": in_w, "in_b": in_b, "out": out}


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def mha(params: dict, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
        num_heads: int, *, mask: Optional[jnp.ndarray] = None,
        dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
        deterministic: bool = True) -> jnp.ndarray:
    """Multi-head attention, batch-first (B, S, D).

    mask: optional additive bias broadcastable to (B, H, Sq, Sk) or a boolean
    key-padding mask of shape (B, Sk) (True = keep).
    """
    dim = query.shape[-1]
    head_dim = dim // num_heads
    dt = query.dtype

    in_w = params["in_w"].astype(dt)
    in_b = params["in_b"].astype(jnp.float32)
    wq, wk, wv = in_w[:, :dim], in_w[:, dim:2 * dim], in_w[:, 2 * dim:]
    bq, bk, bv = in_b[:dim], in_b[dim:2 * dim], in_b[2 * dim:]

    q = (jnp.dot(query, wq, preferred_element_type=jnp.float32) + bq).astype(dt)
    k = (jnp.dot(key, wk, preferred_element_type=jnp.float32) + bk).astype(dt)
    v = (jnp.dot(value, wv, preferred_element_type=jnp.float32) + bv).astype(dt)

    q = _split_heads(q, num_heads)
    k = _split_heads(k, num_heads)
    v = _split_heads(v, num_heads)

    scale = 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            logits = jnp.where(mask[:, None, None, :], logits, neg)
        else:
            logits = logits + mask.astype(jnp.float32)

    weights = jax.nn.softmax(logits, axis=-1)
    weights = dropout(rng, weights, dropout_rate, deterministic)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dt), v,
                     preferred_element_type=jnp.float32).astype(dt)
    b, h, s, hd = ctx.shape
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
    return dense(params["out"], ctx)
