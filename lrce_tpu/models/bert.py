"""BERT-base-uncased text encoder, functional JAX.

The reference wraps HuggingFace `BertModel` and returns `last_hidden_state`
(reference lrce/feature_extractor/text.py:5-17). This is a TPU-first
re-implementation with HF-compatible numerics so pretrained/finetuned torch
weights transplant exactly:

  - 12 encoder layers stacked into one pytree and folded with `lax.scan`,
  - post-norm residuals, LayerNorm eps 1e-12, exact GELU,
  - additive attention mask (1-mask)*finfo.min like HF,
  - f32 accumulation on every matmul; activations may be bf16.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lrce_tpu.ops.nn import (
    dense,
    dense_init,
    dropout,
    gelu,
    layer_norm,
    layer_norm_init,
)

LN_EPS = 1e-12


class BertConfig(NamedTuple):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


BERT_BASE = BertConfig()


def _embed_init(rng, n: int, d: int, dtype):
    return 0.02 * jax.random.normal(rng, (n, d), dtype)


def bert_layer_init(rng, cfg: BertConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 6)
    d, ff = cfg.hidden_size, cfg.intermediate_size
    return {
        "attention": {
            "query": dense_init(ks[0], d, d, dtype, init="trunc_normal"),
            "key": dense_init(ks[1], d, d, dtype, init="trunc_normal"),
            "value": dense_init(ks[2], d, d, dtype, init="trunc_normal"),
            "output": dense_init(ks[3], d, d, dtype, init="trunc_normal"),
            "output_layer_norm": layer_norm_init(d, dtype),
        },
        "intermediate": dense_init(ks[4], d, ff, dtype, init="trunc_normal"),
        "output": dense_init(ks[5], ff, d, dtype, init="trunc_normal"),
        "output_layer_norm": layer_norm_init(d, dtype),
    }


def bert_init(rng, cfg: BertConfig = BERT_BASE, dtype=jnp.float32,
              with_pooler: bool = True) -> dict:
    ks = jax.random.split(rng, cfg.num_layers + 4)
    layers = [bert_layer_init(ks[i], cfg, dtype) for i in range(cfg.num_layers)]
    params = {
        "embeddings": {
            "word": _embed_init(ks[-4], cfg.vocab_size, cfg.hidden_size, dtype),
            "position": _embed_init(ks[-3], cfg.max_position_embeddings,
                                    cfg.hidden_size, dtype),
            "token_type": _embed_init(ks[-2], cfg.type_vocab_size,
                                      cfg.hidden_size, dtype),
            "layer_norm": layer_norm_init(cfg.hidden_size, dtype),
        },
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *layers),
    }
    if with_pooler:
        params["pooler"] = dense_init(ks[-1], cfg.hidden_size, cfg.hidden_size,
                                      dtype, init="trunc_normal")
    return params


def _self_attention(p: dict, x: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                    attn_drop: float, hidden_drop: float, deterministic: bool,
                    rng) -> jnp.ndarray:
    b, s, d = x.shape
    hd = d // num_heads
    dt = x.dtype

    def heads(t):
        return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(dense(p["query"], x))
    k = heads(dense(p["key"], x))
    v = heads(dense(p["value"], x))

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    logits = logits + bias  # (B, 1, 1, S) additive mask, f32
    weights = jax.nn.softmax(logits, axis=-1)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    weights = dropout(r1, weights, attn_drop, deterministic)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dt), v,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    out = dense(p["output"], ctx)
    out = dropout(r2, out, hidden_drop, deterministic)
    return layer_norm(p["output_layer_norm"], x + out, eps=LN_EPS)


def bert_layer(p: dict, x: jnp.ndarray, bias: jnp.ndarray,
               cfg: BertConfig = BERT_BASE, deterministic: bool = True,
               rng=None) -> jnp.ndarray:
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    x = _self_attention(p["attention"], x, bias, cfg.num_heads,
                        cfg.attention_dropout, cfg.hidden_dropout,
                        deterministic, r1)
    h = gelu(dense(p["intermediate"], x))
    h = dense(p["output"], h)
    h = dropout(r2, h, cfg.hidden_dropout, deterministic)
    return layer_norm(p["output_layer_norm"], x + h, eps=LN_EPS)


def bert_encode(params: dict, input_ids: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray] = None,
                token_type_ids: Optional[jnp.ndarray] = None,
                cfg: BertConfig = BERT_BASE, *, deterministic: bool = True,
                rng: Optional[jax.Array] = None,
                compute_dtype=jnp.float32, mesh=None) -> jnp.ndarray:
    """(B, L) token ids -> (B, L, hidden) last hidden state.

    mesh: optional Mesh with a 'model' axis — pins each scanned layer's
    param slice to its tensor-parallel sharding (parallel/sharding.py
    constrain_layer_tp), keeping the scan free of resharding permutes."""
    b, s = input_ids.shape
    emb = params["embeddings"]
    x = emb["word"][input_ids]
    x = x + emb["position"][:s][None, :, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + emb["token_type"][token_type_ids]
    x = layer_norm(emb["layer_norm"], x, eps=LN_EPS)
    r_emb, r_layers = (jax.random.split(rng) if rng is not None else (None, None))
    x = dropout(r_emb, x, cfg.hidden_dropout, deterministic)
    x = x.astype(compute_dtype)

    if attention_mask is None:
        bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    else:
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        bias = bias * jnp.finfo(jnp.float32).min

    def body(h, xs):
        layer_params, idx = xs
        if mesh is not None:
            from lrce_tpu.parallel.sharding import constrain_layer_tp
            layer_params = constrain_layer_tp(layer_params, mesh)
        lrng = None if r_layers is None else jax.random.fold_in(r_layers, idx)
        return bert_layer(layer_params, h, bias, cfg, deterministic, lrng), None

    x, _ = jax.lax.scan(body, x, (params["layers"],
                                  jnp.arange(cfg.num_layers)))
    return x


def bert_pool(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """HF pooler: tanh(dense(CLS)). Kept for checkpoint completeness."""
    return jnp.tanh(dense(params["pooler"], hidden[:, 0]))
