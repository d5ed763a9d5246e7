"""Profiling CLI: trace the flagship forward (or train) step with
jax.profiler and report XLA cost analysis.

TPU-native replacement for the reference's torch.profiler usage
(reference calculate_flops.py:305-321): writes a TensorBoard-loadable trace
(--trace-dir) and prints compiled FLOPs / bytes / per-step wall time.

Usage: python tools/profile.py [--batch 8] [--train] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--train", action="store_true",
                   help="profile the full train step instead of forward")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here (NOTE: may hang on "
                        "remote-tunneled TPU backends; use on directly "
                        "attached chips)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--latency", action="store_true",
                   help="measure p50/p90 per-question latency (batch 1)")
    args = p.parse_args(argv)
    if args.latency:
        args.batch = 1

    from lrce_tpu.models import e2e as E

    import os

    from lrce_tpu.models import swin3d as S

    # honor LRCE_TPU_SWIN_REMAT like the train CLI (e2e.config_from_args)
    swin = S.SWIN_BASE._replace(
        remat=bool(os.environ.get("LRCE_TPU_SWIN_REMAT")))
    cfg = E.E2EConfig(num_classes=1000, temporal_scale=(3,), text_seq_len=32,
                      swin=swin)
    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)

    b = args.batch
    clips = jax.random.uniform(jax.random.PRNGKey(1),
                               (b, 3, 5, 224, 224, 3), jnp.float32)
    ids = jnp.ones((b, 32), jnp.int32)
    mask = jnp.ones((b, 32), jnp.int32)
    types = jnp.zeros((b, 32), jnp.int32)

    if args.train:
        import argparse as ap

        from lrce_tpu.train.agent import AgentOE

        agent_args = ap.Namespace(
            dataset="profile", log_dir="/tmp/lrce_profile", ckpt_interval=100,
            batch_size=b, eval_per_epoch=1, epoch=1, drop_out_rate=0.1,
            lr=[5e-5] * 3, min_lr=1e-8, temporal_scale=[3],
            lr_decay_factor=0.5, lr_warm_up=0.1, lr_restart_epoch=2,
            lr_restart_mul=1, use_cosine_scheduler=True, reg_strength=0.001,
            num_workers=0, use_hinge_loss=False, debug_mode=True,
            sanity_check=False)
        agent = AgentOE(cfg, params, agent_args, log_enabled=False)
        agent.lrs = [5e-5] * 3
        gt = jnp.zeros((b,), jnp.int32)
        batch = (clips, ids, mask, types, gt)

        def step():
            return agent.step(*batch, is_train=True)

        step()  # compile
        compiled = None
    else:
        fwd = jax.jit(lambda p, c, i, m, t: E.e2e_forward(
            p, c, i, m, t, cfg, deterministic=True,
            compute_dtype=jnp.bfloat16))
        compiled = fwd.lower(params, clips, ids, mask, types).compile()

        def step():
            out = compiled(params, clips, ids, mask, types)
            return float(out.astype(jnp.float32).sum())

        step()

    if compiled is not None:
        ca = compiled.cost_analysis() or {}
        print(f"compiled flops: {ca.get('flops', 0) / 1e9:.1f} GFLOP")
        print(f"bytes accessed: {ca.get('bytes accessed', 0) / 1e6:.1f} MB")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                step()
        print(f"trace written to {args.trace_dir}")

    if args.latency:
        times = []
        for _ in range(max(args.iters, 20)):
            t0 = time.perf_counter()
            step()
            times.append(time.perf_counter() - t0)
        import numpy as np

        p50, p90 = np.percentile(times, [50, 90]) * 1e3
        print(f"per-question latency: p50 {p50:.1f} ms  p90 {p90:.1f} ms "
              f"(batch 1, 3 clips, bf16)")
        return

    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters
    kind = "train" if args.train else "fwd"
    print(f"{kind} step: {dt * 1e3:.1f} ms  "
          f"({b * 3 / dt:.1f} clips/s/chip, batch {b})")


if __name__ == "__main__":
    main()
