"""On-chip preflight gate: prove the SHIPPED defaults compile AND run.

Round 4 shipped a default-routed Pallas kernel that failed Mosaic's
backend compile on the real chip (scoped-vmem OOM) — invisible to every
CPU/interpret-mode test and to AOT StableHLO export, because scoped-vmem
allocation happens only in the real backend compile. This gate is the fix:
run it on the live TPU before every end-of-round snapshot (and after any
change to kernel routing or tilings), and record the line in PERF.md.

Checks, in order (fail-fast, each against the tree's DEFAULT routing):
  1. bench forward  — the exact bench.py program: flagship E2E forward,
                      bf16, batch 32 x 3 clips. Compile + run + finite.
  2. train step     — one full flagship train step (fwd+loss+bwd+AdamW)
                      at batch 16 through the real AgentOE. Compile + run
                      + finite loss.

Prints one JSON line {"preflight": "pass"|"fail", ...} and exits non-zero
on failure. Reference behavior being gated: the reference's Swin tower
runs end to end on its hardware (lrce/feature_extractor/video_swin_ori.py:
485-692 driven by train.py:137-138); ours must too, as shipped.

Usage: python tools/preflight.py [--train-batch 16] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")


def _bench_forward() -> dict:
    import jax
    import jax.numpy as jnp

    from lrce_tpu.models import e2e as E

    cfg = E.E2EConfig(num_classes=1000, temporal_scale=(3,), text_seq_len=32)
    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)
    batch = 32
    clips = jax.random.uniform(jax.random.PRNGKey(1),
                               (batch, 3, 5, 224, 224, 3), jnp.float32)
    ids = jnp.ones((batch, 32), jnp.int32)
    mask = jnp.ones((batch, 32), jnp.int32)
    types = jnp.zeros((batch, 32), jnp.int32)
    fwd = jax.jit(lambda p, c, i, m, t: E.e2e_forward(
        p, c, i, m, t, cfg, deterministic=True, compute_dtype=jnp.bfloat16))
    t0 = time.perf_counter()
    out = fwd(params, clips, ids, mask, types)
    s = float(out.astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    assert out.shape == (batch, 1000)
    import math

    assert math.isfinite(s), f"non-finite forward output (sum={s})"
    return {"compile_plus_first_s": round(dt, 1)}


def _train_step(batch: int) -> dict:
    import numpy as np

    from lrce_tpu.models import e2e as E
    from lrce_tpu.train.agent import AgentOE

    cfg = E.E2EConfig(num_classes=1000, temporal_scale=(3,), text_seq_len=32)
    import jax

    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)
    ns = argparse.Namespace(
        dataset="preflight", log_dir="/tmp/lrce_preflight", ckpt_interval=100,
        batch_size=batch, eval_per_epoch=1, epoch=1, drop_out_rate=0.1,
        lr=[5e-5] * 3, min_lr=1e-8, temporal_scale=[3],
        lr_decay_factor=0.5, lr_warm_up=0.1, lr_restart_epoch=2,
        lr_restart_mul=1, use_cosine_scheduler=True,
        reg_strength=0.0, num_workers=0, use_hinge_loss=False,
        debug_mode=True, sanity_check=False)
    agent = AgentOE(cfg, params, ns, log_enabled=False)
    rng = np.random.RandomState(0)
    host_batch = (
        rng.randint(0, 256, (batch, 3, 5, 224, 224, 3)).astype(np.uint8),
        rng.randint(0, 30522, (batch, 32)).astype(np.int32),
        np.ones((batch, 32), np.int32),
        np.zeros((batch, 32), np.int32),
        rng.randint(0, 1000, (batch,)).astype(np.int32),
    )
    t0 = time.perf_counter()
    loss, *_ = agent.step(*host_batch, is_train=True)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite train loss ({loss})"
    return {"compile_plus_first_s": round(dt, 1), "loss": round(float(loss), 4)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-batch", type=int, default=16)
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args(argv)

    import jax

    backend = jax.default_backend()
    result = {"preflight": "pass", "backend": backend, "checks": {}}
    checks = [("bench_forward", _bench_forward)]
    if not args.skip_train:
        checks.append(("train_step", lambda: _train_step(args.train_batch)))
    for name, fn in checks:
        print(f"preflight: {name} ...", file=sys.stderr, flush=True)
        try:
            result["checks"][name] = {"ok": True, **fn()}
        except Exception as e:
            tb = traceback.format_exc(limit=3)
            result["checks"][name] = {"ok": False,
                                      "error": str(e).splitlines()[-1][:400]}
            result["preflight"] = "fail"
            print(tb, file=sys.stderr)
            break  # fail fast: later checks share the broken routing
    print(json.dumps(result))
    return 0 if result["preflight"] == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
