"""Alias train entry kept for surface parity with the reference's
train_ddp.py (reference train_ddp.py:1-138), which differs from train.py only
in its arg module (parser.py defaults) and in validating on the *test* split.
"""

from __future__ import annotations

import sys

import jax

import parser as legacy_parser
from lrce_tpu.data.loader import DataLoader
from lrce_tpu.models.e2e import config_from_args, e2e_init_jit
from lrce_tpu.parallel.mesh import initialize_multihost, make_mesh
from lrce_tpu.pretrained import load_pretrained
from lrce_tpu.train.agent import agent_factory
from lrce_tpu.utils.logging import get_logger, setup_logging

from train import build_datasets


def main(train_args) -> None:
    initialize_multihost()
    setup_logging()
    logger = get_logger(__name__)

    logger.info("Preparing dataset")
    # validation on the test split (reference train_ddp.py:69)
    train_dataset, val_dataset = build_datasets(train_args,
                                                splits=("train", "test"))

    if train_args.task_type not in ("oe", "mc", "count"):
        logger.error("Unsupported task type")
        sys.exit(-1)

    model_cfg = config_from_args(train_args)
    params = load_pretrained(e2e_init_jit(jax.random.PRNGKey(0), model_cfg))

    mesh = make_mesh()
    num_devices = mesh.devices.size
    logger.info(f"Using {num_devices} TPU device(s)")

    trainer = agent_factory(train_args.task_type)(
        model_cfg, params, train_args, mesh=mesh,
        log_enabled=not train_args.debug_mode and not train_args.sanity_check)
    if train_args.model_path:
        trainer.load_checkpoint(train_args.model_path)

    train_dl = DataLoader(train_dataset, train_args.batch_size,
                          num_replicas=num_devices, shuffle=True,
                          num_workers=train_args.num_workers)
    val_dl = DataLoader(val_dataset, train_args.batch_size,
                        num_replicas=num_devices, shuffle=True,
                        num_workers=train_args.num_workers)

    if train_args.sanity_check:
        trainer.do_sanity_check(train_dl)
    else:
        trainer.do_training(train_dl, val_dl, train_args.eval_per_epoch)


if __name__ == "__main__":
    main(legacy_parser.parse_arg_train())
