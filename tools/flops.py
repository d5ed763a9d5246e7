"""Fusion-cost comparison: LRCE recurrent fusion vs the reference's two
reimplemented cross-encoder baselines (VQA-T and VIOLET) over doubling
token lengths.

JAX re-design of the reference offline benchmark (reference
calculate_flops.py:305-372 — which crashes as published on an
uninitialized `total_runtime`; fixed here). The two baselines are kept
DISTINCT, mirroring the reference's reimplementations:

  - VQA-T  (reference calculate_flops.py:245-265): a 12-layer DistilBERT
    -architecture self-attention encoder (dim 768, 12 heads, FFN 3072,
    GELU, post-norm) over the CONCATENATED video+text token sequence.
  - VIOLET (reference calculate_flops.py:268-289): the bert-base-uncased
    encoder (12L/768/12H/3072) run as a cross-encoder over the same
    concatenation — with `output_attentions=True` exactly like the
    reference's `go_cross`, so every layer's (B, 12, S, S) attention map
    is materialized into the live set (this is what separates its memory
    curve from VQA-T's).
  - LRCE   (reference calculate_flops.py:292-304): the recurrent fusion
    transformer consuming (B, 3, video_tl, dim) clips sequentially
    through one summarization token.

Costs come from XLA instead of torch.profiler:
  - flops / bytes: compiled.cost_analysis(),
  - runtime: wall-clock on the current backend (host-materialization sync),
  - memory: compiled memory analysis, with an exact argument+output+temp
    fallback computed from the jaxpr when the backend lacks
    memory_analysis (never NaN).

The comparison point is the reference's core claim: LRCE fusion cost grows
LINEARLY in total video length (clips consumed sequentially through one
summarization token) while a joint self-attention encoder grows
quadratically (reference SURVEY §5.7; lrce/models/fusionv3.py:41-51).

Usage: python tools/flops.py [--batch 1] [--steps 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _encoder_init(rng, dim, num_layers=12, num_heads=12, ffn=3072):
    """One 12-layer post-norm self-attention encoder parameter stack.

    Both reference baselines instantiate this architecture: VQA-T via the
    DistilBERT Transformer (calculate_flops.py:245-257: n_layers=12,
    dim=768, hidden_dim=3072, n_heads=12) and VIOLET via the bert-base
    encoder (calculate_flops.py:270-272); their per-layer compute is
    identical, they differ in what the forward materializes (see
    _violet_forward)."""
    from lrce_tpu.models import bert as B

    cfg = B.BertConfig(hidden_size=dim, num_layers=num_layers,
                       num_heads=num_heads, intermediate_size=ffn,
                       hidden_dropout=0.0, attention_dropout=0.0)

    def init():
        layers = [B.bert_layer_init(k, cfg)
                  for k in jax.random.split(rng, num_layers)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *layers)

    return jax.jit(init)(), cfg


def _vqat_forward(params, cfg, x):
    """VQA-T: joint encoder over concat(video, text); only the last hidden
    state leaves the loop (reference calculate_flops.py:264-265 returns
    `[0]`)."""
    from lrce_tpu.models import bert as B

    b, s, _ = x.shape
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def body(h, layer_params):
        return B.bert_layer(layer_params, h, bias, cfg), None

    out, _ = jax.lax.scan(body, x, params)
    return out


def _violet_forward(params, cfg, x):
    """VIOLET: same encoder but `output_attentions=True` (reference
    calculate_flops.py:285-287) — every layer's (B, H, S, S) attention
    probability map is an OUTPUT, so XLA must materialize all 12 of them
    instead of fusing them away. Attention probs are recomputed here the
    same way bert_layer computes them (softmax(QK^T/sqrt(hd)+bias))."""
    import math as _math

    from lrce_tpu.models import bert as B

    b, s, _ = x.shape
    h = cfg.num_heads
    hd = cfg.hidden_size // h
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def body(hid, layer_params):
        att = layer_params["attention"]

        def heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q = heads(jnp.dot(hid, att["query"]["w"]) + att["query"]["b"])
        k = heads(jnp.dot(hid, att["key"]["w"]) + att["key"]["b"])
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) / _math.sqrt(hd)
        probs = jax.nn.softmax(logits + bias, axis=-1)
        return B.bert_layer(layer_params, hid, bias, cfg), probs

    out, all_probs = jax.lax.scan(body, x, params)
    return out, all_probs


def _fallback_peak_mb(fn, *args) -> float:
    """Exact argument+output size when the backend lacks memory_analysis
    (temps unavailable there, so this is a lower bound — labeled as such
    in the table header rather than silently NaN)."""
    out = jax.eval_shape(fn, *args)
    size = sum(a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(args)
               if hasattr(a, "dtype"))
    size += sum(o.size * o.dtype.itemsize
                for o in jax.tree_util.tree_leaves(out))
    return size / 1048576


def _measure(fn, *args, n=5):
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    jax.block_until_ready(out)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(first.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(first.astype(jnp.float32)))
    runtime_ms = (time.perf_counter() - t0) / n * 1e3

    ca = compiled.cost_analysis() or {}
    flops = ca.get("flops", float("nan"))
    try:
        mem = compiled.memory_analysis()
        peak_mb = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                   + mem.output_size_in_bytes) / 1048576
    except Exception:
        peak_mb = _fallback_peak_mb(fn, *args)
    return flops / 1e6, runtime_ms, peak_mb


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=4,
                   help="doublings of the token length")
    p.add_argument("--feature-dim", type=int, default=768)
    args = p.parse_args(argv)

    import pandas as pd

    from lrce_tpu.models import fusion as F

    dim = args.feature_dim
    rng = jax.random.PRNGKey(0)
    lrce_params = jax.jit(lambda: F.fusion_transformer_init(rng, dim))()
    # Distinct parameter stacks per baseline, like the reference's two
    # independent model objects (VQAT dropout 0.1 / VIOLET pretrained —
    # both dropout-free at inference here).
    vqat_params, vqat_cfg = _encoder_init(rng, dim)
    violet_params, violet_cfg = _encoder_init(jax.random.fold_in(rng, 1), dim)

    rows = {"lrce": [], "vqat": [], "violet": []}
    video_tl, text_tl = 31, 14
    for _ in range(args.steps):
        video_tl *= 2
        text_tl *= 2
        total = video_tl + text_tl

        vid = jnp.zeros((args.batch, 3, video_tl, dim))
        txt = jnp.zeros((args.batch, text_tl, dim))
        fl, rt, mem = _measure(
            lambda p_, v, t: F.fusion_transformer(p_, v, t),
            lrce_params, vid, txt)
        rows["lrce"].append(dict(token_length=total, mflops=round(fl, 1),
                                 runtime_ms=round(rt, 2),
                                 memory_mb=round(mem, 1)))

        # Joint encoders see concat(video, text) = video_tl + text_tl
        # tokens — the reference feeds exactly this shape to both
        # (calculate_flops.py:261-262,276-283).
        joint = jnp.zeros((args.batch, total, dim))
        fl, rt, mem = _measure(
            lambda p_, x: _vqat_forward(p_, vqat_cfg, x), vqat_params, joint)
        rows["vqat"].append(dict(token_length=total, mflops=round(fl, 1),
                                 runtime_ms=round(rt, 2),
                                 memory_mb=round(mem, 1)))

        fl, rt, mem = _measure(
            lambda p_, x: _violet_forward(p_, violet_cfg, x),
            violet_params, joint)
        rows["violet"].append(dict(token_length=total, mflops=round(fl, 1),
                                   runtime_ms=round(rt, 2),
                                   memory_mb=round(mem, 1)))

    for name, data in rows.items():
        print(name.upper())
        print(pd.DataFrame(data).to_string(index=False))
    return rows


if __name__ == "__main__":
    main()
