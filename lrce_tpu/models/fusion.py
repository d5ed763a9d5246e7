"""LRCE recurrent cross-modal fusion transformer + task heads.

TPU-first redesign of the reference fusion stack (reference
lrce/models/fusionv3.py:5-51,129-373):

  - The 12 decoder layers are *stacked* pytrees consumed by `lax.scan`,
    so XLA traces one layer body instead of twelve.
  - The temporal-scale recurrence (shared summarization token folded over
    clips) is a second `lax.scan` over the clip axis.
  - Decoder-layer semantics replicate torch.nn.TransformerDecoderLayer
    (post-norm, self-attn -> cross-attn -> FFN, GELU, LayerNorm eps 1e-12,
    batch_first) so reference checkpoints produce identical outputs.

Parity quirk preserved deliberately: `texts_attention_mask` is accepted but
never applied inside the fusion (reference lrce/models/fusionv3.py:27-51).
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp

from lrce_tpu.models.embedding import (
    text_pos_embed,
    text_pos_embed_init,
    video_pos_embed,
    video_pos_embed_init,
    xavier_normal,
)
from lrce_tpu.ops.nn import (
    dense,
    dense_init,
    dropout,
    gelu,
    layer_norm,
    layer_norm_init,
    mha,
    mha_init,
)

LN_EPS = 1e-12
NUM_LAYERS = 12
NUM_HEADS = 12
DIM_FEEDFORWARD = 3072


# ---------------------------------------------------------------------------
# Decoder layer (torch TransformerDecoderLayer semantics)
# ---------------------------------------------------------------------------

def decoder_layer_init(rng, dim: int, dff: int = DIM_FEEDFORWARD,
                       dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 4)
    return {
        "self_attn": mha_init(ks[0], dim, NUM_HEADS, dtype),
        "multihead_attn": mha_init(ks[1], dim, NUM_HEADS, dtype),
        "linear1": dense_init(ks[2], dim, dff, dtype),
        "linear2": dense_init(ks[3], dff, dim, dtype),
        "norm1": layer_norm_init(dim, dtype),
        "norm2": layer_norm_init(dim, dtype),
        "norm3": layer_norm_init(dim, dtype),
    }


def decoder_layer(params: dict, tgt: jnp.ndarray, memory: jnp.ndarray, *,
                  num_heads: int = NUM_HEADS, dropout_rate: float = 0.1,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Post-norm decoder layer: x <- LN(x + SA(x)); x <- LN(x + CA(x, mem));
    x <- LN(x + FFN(x))."""
    rngs = (jax.random.split(rng, 6) if rng is not None else [None] * 6)

    sa = mha(params["self_attn"], tgt, tgt, tgt, num_heads,
             dropout_rate=dropout_rate, rng=rngs[0], deterministic=deterministic)
    x = layer_norm(params["norm1"], tgt + dropout(rngs[1], sa, dropout_rate, deterministic),
                   eps=LN_EPS)

    ca = mha(params["multihead_attn"], x, memory, memory, num_heads,
             dropout_rate=dropout_rate, rng=rngs[2], deterministic=deterministic)
    x = layer_norm(params["norm2"], x + dropout(rngs[3], ca, dropout_rate, deterministic),
                   eps=LN_EPS)

    h = gelu(dense(params["linear1"], x))
    h = dropout(rngs[4], h, dropout_rate, deterministic)
    h = dense(params["linear2"], h)
    x = layer_norm(params["norm3"], x + dropout(rngs[5], h, dropout_rate, deterministic),
                   eps=LN_EPS)
    return x


def _stack_layers(layer_list: List[dict]) -> dict:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layer_list)


def decoder_stack(layers: dict, tgt: jnp.ndarray, memory: jnp.ndarray, *,
                  num_heads: int = NUM_HEADS, dropout_rate: float = 0.1,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None, mesh=None) -> jnp.ndarray:
    """Run the stacked 12-layer decoder via lax.scan.

    mesh: optional Mesh with a 'model' axis — pins each scanned layer's
    param slice to its TP sharding so neither the forward slice nor the
    backward grad-stacking reshard (parallel/sharding.py
    constrain_layer_tp)."""
    n = jax.tree_util.tree_leaves(layers)[0].shape[0]

    def body(x, xs):
        layer_params, idx = xs
        if mesh is not None:
            from lrce_tpu.parallel.sharding import constrain_layer_tp
            layer_params = constrain_layer_tp(layer_params, mesh)
        layer_rng = None if rng is None else jax.random.fold_in(rng, idx)
        y = decoder_layer(layer_params, x, memory, num_heads=num_heads,
                          dropout_rate=dropout_rate,
                          deterministic=deterministic, rng=layer_rng)
        return y, None

    out, _ = jax.lax.scan(body, tgt, (layers, jnp.arange(n)))
    return out


# ---------------------------------------------------------------------------
# FusionTransformer: recurrence over clips with a shared summarization token
# ---------------------------------------------------------------------------

def fusion_transformer_init(rng, feature_dim: int = 768, dtype=jnp.float32) -> dict:
    k_layer, k_tok = jax.random.split(rng)
    # torch TransformerDecoder deep-copies ONE layer num_layers times
    # (reference fusionv3.py:17), so every layer starts with identical
    # weights — replicated here for from-scratch training parity.
    layer = decoder_layer_init(k_layer, feature_dim, dtype=dtype)
    return {
        "layers": _stack_layers([layer] * NUM_LAYERS),
        "fusion_layer_norm": layer_norm_init(feature_dim, dtype),
        "summarization_token": xavier_normal(k_tok, (1, 1, feature_dim), dtype),
    }


def fusion_transformer(params: dict, video_features: jnp.ndarray,
                       text_features: jnp.ndarray,
                       texts_attention_mask: Optional[jnp.ndarray] = None, *,
                       num_heads: int = NUM_HEADS, dropout_rate: float = 0.1,
                       deterministic: bool = True,
                       rng: Optional[jax.Array] = None,
                       mesh=None) -> jnp.ndarray:
    """Fold the summarization token over clips.

    Args:
        video_features: (B, n_clips, video_seq_len, D)
        text_features: (B, text_seq_len, D)
        texts_attention_mask: accepted but unused (reference parity,
            lrce/models/fusionv3.py:27-51).
    Returns:
        (B, 1, D) summarized features.
    """
    del texts_attention_mask
    b, n_clips, _, d = video_features.shape
    token = jnp.broadcast_to(
        params["summarization_token"].astype(video_features.dtype), (b, 1, d))

    # (n_clips, B, L_v, D) for scanning the clip axis.
    vid = jnp.swapaxes(video_features, 0, 1)

    def body(token, xs):
        vid_i, idx = xs
        memory = jnp.concatenate([vid_i, text_features], axis=1)
        step_rng = None if rng is None else jax.random.fold_in(rng, idx)
        dec_rng, drop_rng = ((None, None) if step_rng is None
                             else tuple(jax.random.split(step_rng)))
        res = decoder_stack(params["layers"], token, memory,
                            num_heads=num_heads, dropout_rate=dropout_rate,
                            deterministic=deterministic, rng=dec_rng,
                            mesh=mesh)
        token = layer_norm(params["fusion_layer_norm"], token + res, eps=LN_EPS)
        token = dropout(drop_rng, token, dropout_rate, deterministic)
        return token, None

    token, _ = jax.lax.scan(body, token, (vid, jnp.arange(n_clips)))
    return token


# ---------------------------------------------------------------------------
# Task heads
# ---------------------------------------------------------------------------

def lrce_open_ended_init(rng, feature_dim: int, num_classes: int,
                         video_feature_res: Iterable[int] = (7, 7),
                         video_feature_dim: int = 768,
                         frame_sample_size: int = 5,
                         temporal_scale: List[int] = (1, 2, 3),
                         question_seq_len: int = 30,
                         dtype=jnp.float32) -> dict:
    """Open-ended head (reference lrce/models/fusionv3.py:129-198)."""
    ks = jax.random.split(rng, 5)
    params = {
        "video_pos_embed": video_pos_embed_init(
            ks[0], feature_dim, video_feature_res, frame_sample_size,
            clip_size=sum(temporal_scale), dtype=dtype),
        "question_pos_embed": text_pos_embed_init(ks[1], question_seq_len,
                                                  feature_dim, dtype),
        "fusion_transformer": fusion_transformer_init(ks[2], feature_dim, dtype),
        "final_fc": dense_init(ks[3], feature_dim, num_classes, dtype),
    }
    if video_feature_dim != feature_dim:
        params["projection_layer"] = dense_init(ks[4], video_feature_dim,
                                                feature_dim, dtype)
    return params


def _embed_and_drop(params: dict, video_features: jnp.ndarray,
                    text_features: jnp.ndarray, dropout_rate: float,
                    deterministic: bool, rng: Optional[jax.Array]):
    """Shared head preamble: project video dim, add pos embeds, dropout."""
    if "projection_layer" in params:
        video_features = dense(params["projection_layer"], video_features)
    video_features = video_pos_embed(params["video_pos_embed"], video_features)
    text_features = text_pos_embed(params["question_pos_embed"], text_features)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    video_features = dropout(r1, video_features, dropout_rate, deterministic)
    text_features = dropout(r2, text_features, dropout_rate, deterministic)
    return video_features, text_features


def lrce_open_ended(params: dict, video_features: jnp.ndarray,
                    text_features: jnp.ndarray,
                    texts_attention_mask: Optional[jnp.ndarray] = None, *,
                    dropout_rate: float = 0.1, deterministic: bool = True,
                    rng: Optional[jax.Array] = None, mesh=None) -> jnp.ndarray:
    """(B, n_clips, T, HW, video_dim) x (B, L, D) -> (B, num_classes)."""
    batch = video_features.shape[0]
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    video_features, text_features = _embed_and_drop(
        params, video_features, text_features, dropout_rate, deterministic, r1)
    summarized = fusion_transformer(
        params["fusion_transformer"], video_features, text_features,
        texts_attention_mask, dropout_rate=dropout_rate,
        deterministic=deterministic, rng=r2, mesh=mesh)
    out = dense(params["final_fc"], summarized[:, 0, :])
    return out.reshape(batch, -1)


def lrce_multiple_choice_init(rng, feature_dim: int, num_classes: int = 1,
                              video_feature_res: Iterable[int] = (7, 7),
                              video_feature_dim: int = 768,
                              frame_sample_size: int = 5,
                              temporal_scale: List[int] = (1, 2, 3),
                              qa_seq_len: int = 40, dtype=jnp.float32) -> dict:
    """MC head = OE head with final_fc(D -> 1) scored per QA pair
    (reference lrce/models/fusionv3.py:201-265)."""
    return lrce_open_ended_init(rng, feature_dim, num_classes,
                                video_feature_res, video_feature_dim,
                                frame_sample_size, temporal_scale, qa_seq_len,
                                dtype)


def lrce_multiple_choice(params: dict, video_features: jnp.ndarray,
                         text_features: jnp.ndarray,
                         texts_attention_mask: Optional[jnp.ndarray] = None, *,
                         dropout_rate: float = 0.1, deterministic: bool = True,
                         rng: Optional[jax.Array] = None,
                         mesh=None) -> jnp.ndarray:
    """video (B, S, T, HW, Dv) x text (B, total_mc, L, D) -> (B, total_mc).

    QA pairs are flattened into the batch axis and the video tokens are
    broadcast across choices — one fusion pass scores all B*total_mc pairs.
    """
    batch, total_mc = text_features.shape[0], text_features.shape[1]
    text_features = text_features.reshape((batch * total_mc,) + text_features.shape[2:])
    if texts_attention_mask is not None:
        texts_attention_mask = texts_attention_mask.reshape(
            (batch * total_mc,) + texts_attention_mask.shape[2:])

    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    video_features, text_features = _embed_and_drop(
        params, video_features, text_features, dropout_rate, deterministic, r1)

    # (B, S, L, D) -> (B*total_mc, S, L, D)
    video_features = jnp.repeat(video_features, total_mc, axis=0)
    summarized = fusion_transformer(
        params["fusion_transformer"], video_features, text_features,
        texts_attention_mask, dropout_rate=dropout_rate,
        deterministic=deterministic, rng=r2, mesh=mesh)
    out = dense(params["final_fc"], summarized[:, 0, :])
    return out.reshape(batch, total_mc)


def lrce_count_init(rng, feature_dim: int,
                    video_feature_res: Iterable[int] = (7, 7),
                    video_feature_dim: int = 768, frame_sample_size: int = 5,
                    temporal_scale: List[int] = (1, 2, 3),
                    question_seq_len: int = 30, dtype=jnp.float32) -> dict:
    """Count head: always a single output neuron
    (reference lrce/models/fusionv3.py:336-369)."""
    return lrce_open_ended_init(rng, feature_dim, 1, video_feature_res,
                                video_feature_dim, frame_sample_size,
                                temporal_scale, question_seq_len, dtype)


def lrce_count(params: dict, video_features: jnp.ndarray,
               text_features: jnp.ndarray,
               texts_attention_mask: Optional[jnp.ndarray] = None, *,
               dropout_rate: float = 0.1, deterministic: bool = True,
               rng: Optional[jax.Array] = None, mesh=None) -> jnp.ndarray:
    """Scalar repetition-count regression with ReLU: (B,)."""
    batch = video_features.shape[0]
    out = lrce_open_ended(params, video_features, text_features,
                          texts_attention_mask, dropout_rate=dropout_rate,
                          deterministic=deterministic, rng=rng, mesh=mesh)
    return jax.nn.relu(out.reshape(batch))
