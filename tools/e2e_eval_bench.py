"""Sustained END-TO-END eval throughput: CLI-path evaluation with real
ingest (decode -> resize -> batch -> device transfer -> flagship forward),
not the device-resident synthetic batches bench.py uses.

Builds a synthetic TGIF-FrameQA dataset (same generator as
tools/sanity_curve.py), instantiates the eval agent exactly like eval.py
(reference eval.py:10-97), and times `do_evaluation` over the test split:

  pass 1 — compile + cold decode (first-epoch regime)
  pass 2 — warm frame-count cache (steady-state epoch regime)
  pass 3 — warm clip LRU (--cache-items, no decode at all)

Reports clips/s wall for each pass (1 question = temporal_scale clips), so
the headline bench.py number can be compared against what a user actually
sustains through the full ingest pipeline on this host.

Usage: python tools/e2e_eval_bench.py [--samples 256] [--batch-size 32]
       [--workers 4] [--keep-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the environment pre-imports jax via the axon site hook, so the env
    # var alone does not stick — mirror tests/conftest.py
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--videos", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--keep-dir", default=None)
    args = p.parse_args(argv)

    from tools.sanity_curve import build_dataset

    tmp = (pathlib.Path(args.keep_dir) if args.keep_dir
           else pathlib.Path(tempfile.mkdtemp(prefix="evalbench_")))
    tmp.mkdir(parents=True, exist_ok=True)
    build_dataset(tmp, args.videos, max(args.samples, 500))
    os.environ["LRCE_TPU_BERT_VOCAB"] = str(tmp / "vocab.txt")

    import jax

    from lrce_tpu import config as cfg_mod
    from lrce_tpu.data.loader import DataLoader
    from lrce_tpu.models.e2e import config_from_args, e2e_init_jit
    from lrce_tpu.parallel.mesh import make_mesh
    from lrce_tpu.train.agent import agent_factory
    from train import build_datasets

    eval_args = cfg_mod.parse_arg_eval([
        "--dataset", "tgif-frameqa", "--dataset-dir", str(tmp),
        "--batch-size", str(args.batch_size),
        "--num-workers", str(args.workers),
        "--model-path", "/dev/null",  # random init; throughput only
        "--cache-items", str(args.videos),
    ])
    (test_dataset,) = build_datasets(eval_args, splits=("test",))
    # truncate the split to --samples for a bounded pass (label_file is a
    # DataFrame for TGIF / list for Microsoft; [:n] slices rows in both)
    test_dataset.label_file = test_dataset.label_file[:args.samples]

    model_cfg = config_from_args(eval_args)
    params = e2e_init_jit(jax.random.PRNGKey(0), model_cfg)
    mesh = make_mesh()
    agent = agent_factory(eval_args.task_type)(
        model_cfg, params, eval_args, mesh=mesh, log_enabled=False,
        is_eval=True)

    loader = DataLoader(test_dataset, eval_args.batch_size,
                        num_replicas=mesh.devices.size, shuffle=False,
                        num_workers=args.workers)

    n_clips = len(test_dataset) * cfg_mod.num_clips(eval_args.temporal_scale)
    out = {"samples": len(test_dataset), "batch_size": args.batch_size,
           "workers": args.workers}
    for label in ("cold+compile", "warm-count", "warm-clip-cache"):
        t0 = time.perf_counter()
        agent.do_evaluation(loader)
        dt = time.perf_counter() - t0
        out[label] = round(n_clips / dt, 1)
        print(f"{label:16s} {n_clips / dt:8.1f} clips/s  ({dt:.1f}s)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
