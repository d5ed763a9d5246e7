"""Fusion-cost comparison: LRCE recurrent fusion vs full self-attention
cross-encoders (VQA-T / VIOLET style) over doubling token lengths.

JAX re-design of the reference offline benchmark (reference
calculate_flops.py:305-372 — which crashes as published on uninitialized
totals; fixed here). Costs come from XLA instead of torch.profiler:
  - flops / bytes: compiled.cost_analysis(),
  - runtime: wall-clock on the current backend (host-materialization sync),
  - memory: compiled memory analysis when available.

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


def _self_attention_encoder_init(rng, dim, num_layers=12):
    """12-layer post-norm self-attention encoder — the VIOLET/VQA-T fusion
    pattern (joint encoder over concatenated video+text tokens)."""
    from lrce_tpu.models import bert as B

    cfg = B.BertConfig(hidden_size=dim, num_layers=num_layers, num_heads=12,
                       intermediate_size=3072, hidden_dropout=0.0,
                       attention_dropout=0.0)
    def init():
        layers = [B.bert_layer_init(k, cfg)
                  for k in jax.random.split(rng, num_layers)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *layers)

    return jax.jit(init)(), cfg


def _encoder_forward(params, cfg, x):
    from lrce_tpu.models import bert as B

    b, s, _ = x.shape
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def body(h, layer_params):
        return B.bert_layer(layer_params, h, bias, cfg), None

    out, _ = jax.lax.scan(body, x, params)
    return out


def _measure(fn, *args, n=5):
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    runtime_ms = (time.perf_counter() - t0) / n * 1e3

    ca = compiled.cost_analysis() or {}
    flops = ca.get("flops", float("nan"))
    try:
        mem = compiled.memory_analysis()
        peak_mb = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                   + mem.output_size_in_bytes) / 1048576
    except Exception:
        peak_mb = float("nan")
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
    enc_params, enc_cfg = _self_attention_encoder_init(rng, dim)

    rows = {"lrce": [], "self_attention": []}
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

        # joint encoder sees ALL video tokens at once: 3 clips * video_tl
        joint = jnp.zeros((args.batch, 3 * video_tl + text_tl, dim))
        fl, rt, mem = _measure(
            lambda p_, x: _encoder_forward(p_, enc_cfg, x), enc_params, joint)
        rows["self_attention"].append(dict(token_length=total,
                                           mflops=round(fl, 1),
                                           runtime_ms=round(rt, 2),
                                           memory_mb=round(mem, 1)))

    for name, data in rows.items():
        print(name.upper())
        print(pd.DataFrame(data).to_string(index=False))
    return rows


if __name__ == "__main__":
    main()
