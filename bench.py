"""Benchmark: clips/sec/chip for the flagship forward path
(Swin-B + BERT + LRCE fusion, temporal-scale 3, bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to an estimated reference A100 forward throughput
(see BASELINE.md: the reference publishes no machine-readable numbers; the
denominator below is a documented estimate of the torch fp16 Swin-B+LRCE
forward on A100 and is kept fixed across rounds so the trend is comparable).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput (clips/sec per A100, torch AMP fp16,
# Swin-B forward dominating). Derived in BASELINE.md ("Derivation of the
# A100 denominator"): measured 97.4 GFLOPs/clip x A100 312 TFLOP/s peak at
# the 2.5-4% MFU an eager small-batch NCDHW torch pipeline sustains
# => 80-128 clips/s; fixed at 90 across rounds so trends are comparable.
A100_BASELINE_CLIPS_PER_SEC = 90.0


def main() -> None:
    from lrce_tpu.models import e2e as E

    cfg = E.E2EConfig(num_classes=1000, temporal_scale=(3,), text_seq_len=32)
    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)

    batch = 32  # 32 questions x 3 clips = 96 clips/step
    clips = jax.random.uniform(jax.random.PRNGKey(1),
                               (batch, 3, 5, 224, 224, 3), jnp.float32)
    ids = jnp.ones((batch, 32), jnp.int32)
    mask = jnp.ones((batch, 32), jnp.int32)
    types = jnp.zeros((batch, 32), jnp.int32)

    fwd = jax.jit(lambda p, c, i, m, t: E.e2e_forward(
        p, c, i, m, t, cfg, deterministic=True, compute_dtype=jnp.bfloat16))

    out = fwd(params, clips, ids, mask, types)
    assert out.shape == (batch, 1000)
    float(out.astype(jnp.float32).sum())  # full warm-up sync

    # NOTE: sync via host materialization, not block_until_ready — the axon
    # TPU tunnel has been observed to return early from block_until_ready.
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, clips, ids, mask, types)
    float(out.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n_iter

    clips_per_sec = batch * 3 / dt
    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s (Swin-B + LRCE fwd, bf16, batch 32 x 3 clips)",
        "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
