"""Flagship train-step benchmark on the live chip.

Times the REAL jitted training step (Swin-B + BERT-base + LRCE fusion,
fwd + loss + bwd + 3-group AdamW; the same step train.py runs — reference
train loop: lrce/agent/agent_base.py:117-178) at a given per-chip batch, in
three regimes:

  device   — batch pre-placed in HBM: the pure step time the input pipeline
             must keep fed;
  wall     — per-step host->device placement of a uint8 batch (what a
             prefetch-less loop pays);
  prefetch — host batches fed through data.prefetch.device_prefetch, the
             path process_data actually runs (agent.py:237-239): transfer
             of batch N+1 overlaps step N's compute, so this should sit
             within ~10% of the device regime.

Feeds PERF.md's training table. Remat is OFF by default: since the fused
MLP backward stopped materializing the 4C hidden in HBM, no-remat fits
through batch 32 (96 clips) on 16G and is ~9% faster than remat
(PERF.md round-3 sweep). Pass --remat for larger batches (it sets
LRCE_TPU_SWIN_REMAT before model import).

Usage: python tools/train_bench.py [--batch 16] [--iters 10] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-remat", dest="remat",
                   action="store_false",
                   help="(default) explicit off switch")
    p.add_argument("--reg", type=float, default=0.0,
                   help="reg_strength (paper configs use 0.001)")
    p.add_argument("--device-only", action="store_true",
                   help="skip the wall/prefetch regimes (per-step host->"
                        "device placement is tunnel-bound on this box: "
                        "~10 MB/s makes batch-48 wall steps ~14 s each); "
                        "measure only the device + lagged regimes, the "
                        "production-representative numbers")
    args = p.parse_args(argv)

    if args.remat:
        os.environ["LRCE_TPU_SWIN_REMAT"] = "1"

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lrce_tpu.models import e2e as E
    from lrce_tpu.models import swin3d as S
    from lrce_tpu.train.agent import AgentOE

    swin = S.SWIN_BASE._replace(remat=args.remat)
    cfg = E.E2EConfig(num_classes=1000, temporal_scale=(3,), text_seq_len=32,
                      swin=swin)
    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)

    ns = argparse.Namespace(
        dataset="bench", log_dir="/tmp/lrce_train_bench", ckpt_interval=100,
        batch_size=args.batch, eval_per_epoch=1, epoch=1, drop_out_rate=0.1,
        lr=[5e-5] * 3, min_lr=1e-8, temporal_scale=[3],
        lr_decay_factor=0.5, lr_warm_up=0.1, lr_restart_epoch=2,
        lr_restart_mul=1, use_cosine_scheduler=True,
        reg_strength=args.reg, num_workers=0, use_hinge_loss=False,
        debug_mode=True, sanity_check=False)
    agent = AgentOE(cfg, params, ns, log_enabled=False)

    b = args.batch
    rng = np.random.RandomState(0)
    host_batch = (
        rng.randint(0, 256, (b, 3, 5, 224, 224, 3)).astype(np.uint8),
        rng.randint(0, 30522, (b, 32)).astype(np.int32),
        np.ones((b, 32), np.int32),
        np.zeros((b, 32), np.int32),
        rng.randint(0, 1000, (b,)).astype(np.int32),
    )

    t0 = time.perf_counter()
    loss, *_ = agent.step(*host_batch, is_train=True)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    assert np.isfinite(loss)

    wall = pref = None
    if not args.device_only:
        # wall regime: host batch placed every step
        for _ in range(2):
            agent.step(*host_batch, is_train=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            agent.step(*host_batch, is_train=True)
        wall = (time.perf_counter() - t0) / args.iters

        # prefetch regime: the real process_data input path — host batches
        # double-buffered onto the device while the previous step computes
        from lrce_tpu.data.prefetch import device_prefetch

        def feed(k):
            for _ in range(k):
                yield host_batch

        warm = device_prefetch(feed(2))
        for dev_b in warm:
            agent.step(*dev_b, is_train=True)
        t0 = time.perf_counter()
        for dev_b in device_prefetch(feed(args.iters)):
            agent.step(*dev_b, is_train=True)
        pref = (time.perf_counter() - t0) / args.iters

    # device regime: batch pre-placed once
    dev_batch = tuple(jnp.asarray(a) for a in host_batch)
    jax.block_until_ready(dev_batch)
    for _ in range(2):
        agent.step(*dev_batch, is_train=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        agent.step(*dev_batch, is_train=True)
    dev = (time.perf_counter() - t0) / args.iters

    # lagged regime: process_data's actual loop shape — metrics of step N-1
    # are read while step N computes (agent.dispatch + 1-deep pending), so
    # the device->host metric round trip overlaps compute
    pending = agent.dispatch(*dev_batch, is_train=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = agent.dispatch(*dev_batch, is_train=True)
        np.asarray(pending)
        pending = out
    np.asarray(pending)
    # the trailing read drains step iters+1; charge the loop body only
    lag = (time.perf_counter() - t0) / (args.iters + 1)

    clips = 3 * b
    print(f"batch {b} ({clips} clips), remat={args.remat}, "
          f"reg={args.reg}")
    if wall is not None:
        print(f"  wall step:     {wall * 1000:7.1f} ms  {clips / wall:7.1f} clips/s")
        print(f"  prefetch step: {pref * 1000:7.1f} ms  {clips / pref:7.1f} clips/s")
    print(f"  device step:   {dev * 1000:7.1f} ms  {clips / dev:7.1f} clips/s")
    print(f"  lagged step:   {lag * 1000:7.1f} ms  {clips / lag:7.1f} clips/s")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"  peak HBM:      {peak / 2**30:7.2f} GiB")
    except Exception:
        pass


if __name__ == "__main__":
    main()
