"""Eval CLI — surface-compatible with the reference eval.py.

Loads a checkpoint (native or reference torch .pt via the converter) and runs
a distributed evaluation pass on the test split (reference eval.py:10-97),
including the DistributedSampler pad-to-even semantics so reported accuracy
matches the reference's multi-GPU evaluation exactly.
"""

from __future__ import annotations

import sys

import jax

from lrce_tpu import config as cfg_mod
from lrce_tpu.data.loader import DataLoader
from lrce_tpu.models.e2e import config_from_args, e2e_init_jit
from lrce_tpu.parallel.mesh import initialize_multihost, make_mesh
from lrce_tpu.train.agent import agent_factory
from lrce_tpu.utils.logging import get_logger, setup_logging

from train import build_datasets


def main(eval_args) -> None:
    initialize_multihost()
    setup_logging()
    logger = get_logger(__name__)

    logger.info("Preparing dataset")
    (test_dataset,) = build_datasets(eval_args, splits=("test",))

    logger.info("Instantiating model and evaluator agent")
    if eval_args.task_type not in ("oe", "mc", "count"):
        logger.error("Unsupported task type")
        sys.exit(-1)

    # Eval builds the model with default dropout like the reference
    # (eval.py:66-74) — inert because eval runs deterministic.
    model_cfg = config_from_args(eval_args)
    params = e2e_init_jit(jax.random.PRNGKey(0), model_cfg)

    mesh = make_mesh()
    num_devices = mesh.devices.size
    logger.info(f"Using {num_devices} TPU device(s)")

    agent_cls = agent_factory(eval_args.task_type)
    evaluator = agent_cls(model_cfg, params, eval_args, mesh=mesh,
                          log_enabled=False, is_eval=True)
    evaluator.load_checkpoint(eval_args.model_path)

    logger.info("Instantiating dataloader")
    test_dataloader = DataLoader(test_dataset, eval_args.batch_size,
                                 num_replicas=num_devices, shuffle=True,
                                 num_workers=eval_args.num_workers)

    evaluator.do_evaluation(test_dataloader)
    # returned for callers that want the numbers, not the log
    # (tools/parity_eval.py); the CLI path ignores it
    return evaluator


if __name__ == "__main__":
    main(cfg_mod.parse_arg_eval())
