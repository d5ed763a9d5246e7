"""Per-stage Swin-B timing: XLA path vs fused Pallas kernels, on the live
chip. Feeds PERF.md's stage-breakdown table.

Each stage runs standalone on its true flagship intermediate shape
(48 clips = batch 16 questions x 3 temporal-scale clips), bf16, with
host-materialization sync.

Usage: python tools/stage_bench.py [--clips 48] [--iters 20] [--stage N]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=20):
    out = fn(*args)          # compile
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=48)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--stage", type=int, default=None,
                   help="bench only this stage index (0-3)")
    args = p.parse_args(argv)

    import os

    from lrce_tpu.models import swin3d as S

    cfg = S.SWIN_BASE
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: S.swin_init(k, cfg))(key)

    # flagship intermediate shapes (D=3 temporal tokens after patch embed)
    shapes = [(args.clips, 3, 56, 56, 128), (args.clips, 3, 28, 28, 256),
              (args.clips, 3, 14, 14, 512), (args.clips, 3, 7, 7, 1024)]
    stages = range(4) if args.stage is None else [args.stage]
    for si in stages:
        x = jax.random.normal(jax.random.PRNGKey(si + 1), shapes[si],
                              jnp.bfloat16)
        sp = params["stages"][si]
        depth = cfg.depths[si]
        heads = cfg.num_heads[si]

        times = {}
        for mode, env in [("pallas", {}),
                          ("xla", {"LRCE_TPU_DISABLE_PALLAS": "1"})]:
            # fresh closure per mode: jit memoizes traces by function
            # identity, so reusing one function would silently reuse the
            # first mode's lowering and ignore the env toggle
            def run(p, x, _depth=depth, _heads=heads):
                return S.swin_stage(p, x, depth=_depth, num_heads=_heads,
                                    cfg=cfg, dp_rates=[0.0] * _depth,
                                    deterministic=True, rng=None)

            for k, v in env.items():
                os.environ[k] = v
            try:
                times[mode] = time_fn(jax.jit(run), sp, x,
                                      iters=args.iters) * 1e3
            finally:
                for k in env:
                    os.environ.pop(k, None)
        print(f"stage{si} (C={shapes[si][-1]}, depth {depth}): "
              f"pallas {times['pallas']:7.2f} ms   xla {times['xla']:7.2f} ms"
              f"   ({times['xla'] / times['pallas']:.2f}x)")


if __name__ == "__main__":
    main()
