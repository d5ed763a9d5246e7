"""Train CLI — surface-compatible with the reference train.py.

Same flags, same dataset directory layout, same per-dataset configs
(reference train.py:10-138). The reference spawns one process per GPU and
wraps the model in DDP; here a single controller builds a `Mesh` over every
local TPU chip, shards the global batch over the 'data' axis, and the jitted
train step all-reduces gradients over ICI. Global batch = --batch-size x
num_devices, matching the reference's per-GPU batch semantics.
"""

from __future__ import annotations

import pickle
import sys
import os

import jax

from lrce_tpu import config as cfg_mod
from lrce_tpu.data.datasets import E2EMicrosoftDataset, E2ETGIFDataset
from lrce_tpu.data.loader import DataLoader
from lrce_tpu.models.e2e import config_from_args, e2e_init_jit
from lrce_tpu.parallel.mesh import initialize_multihost, make_train_mesh
from lrce_tpu.pretrained import load_pretrained
from lrce_tpu.train.agent import agent_factory
from lrce_tpu.utils.logging import get_logger, setup_logging


def build_datasets(train_args, splits=("train", "val")):
    """Reference dataset-directory conventions (train.py:25-73)."""
    common = dict(
        max_text_token_len=train_args.text_seq_len,
        sanity_check=getattr(train_args, "sanity_check", False),
        frames_per_clip=train_args.frame_sample_size,
        temporal_scale=train_args.temporal_scale,
        cache_items=getattr(train_args, "cache_items", 0),
        uint8_clips=getattr(train_args, "uint8_transfer", True),
    )
    datasets = []
    if "tgif" in train_args.dataset:
        tgif_type = train_args.dataset.split("-")[-1]
        split_files = {"train": "Train", "val": "Test", "test": "Test"}
        for split in splits:
            datasets.append(E2ETGIFDataset(
                split_annotation=f"{train_args.dataset_dir}/annotations/"
                                 f"{split_files[split]}_{tgif_type}_question.csv",
                full_annotation=f"{train_args.dataset_dir}/annotations/"
                                f"Total_{tgif_type}_question.csv",
                videos_path=f"{train_args.dataset_dir}/gifs",
                task_type=train_args.task_type, **common))
    else:
        with open(os.path.join(train_args.dataset_dir,
                               "idx-video-mapping.pkl"), "rb") as f:
            video_dict = pickle.load(f)
        for split in splits:
            datasets.append(E2EMicrosoftDataset(
                train_annotation=f"{train_args.dataset_dir}/train_qa.json",
                val_annotation=f"{train_args.dataset_dir}/val_qa.json",
                test_annotation=f"{train_args.dataset_dir}/test_qa.json",
                videos_path=f"{train_args.dataset_dir}/video",
                video_dict=video_dict, split=split, **common))
    return datasets


def main(train_args) -> None:
    initialize_multihost()
    setup_logging()
    logger = get_logger(__name__)

    logger.info("Preparing dataset")
    train_dataset, val_dataset = build_datasets(train_args)

    logger.info("Instantiating model and trainer agent")
    if train_args.task_type not in ("oe", "mc", "count"):
        logger.error("Unsupported task type")
        sys.exit(-1)

    model_cfg = config_from_args(train_args)
    params = e2e_init_jit(jax.random.PRNGKey(0), model_cfg)
    params = load_pretrained(params)

    mesh = make_train_mesh(getattr(train_args, "fsdp", 1),
                           getattr(train_args, "tensor_parallel", 1))
    # the global batch shards over the data-like axes only (model-parallel
    # groups consume the same samples), so batch replicas =/= device count
    # once --tensor-parallel > 1
    num_devices = mesh.shape["data"] * mesh.shape.get("fsdp", 1)
    logger.info(f"Using {mesh.devices.size} TPU device(s), "
                f"{num_devices} batch shard(s): mesh {dict(mesh.shape)}")

    agent_cls = agent_factory(train_args.task_type)
    trainer = agent_cls(
        model_cfg, params, train_args, mesh=mesh,
        log_enabled=not train_args.debug_mode and not train_args.sanity_check)

    if train_args.model_path:
        trainer.load_checkpoint(train_args.model_path)

    logger.info("Instantiating dataloader")
    train_dataloader = DataLoader(train_dataset, train_args.batch_size,
                                  num_replicas=num_devices, shuffle=True,
                                  num_workers=train_args.num_workers)
    val_dataloader = DataLoader(val_dataset, train_args.batch_size,
                                num_replicas=num_devices, shuffle=True,
                                num_workers=train_args.num_workers)

    if train_args.sanity_check:
        logger.info("Performing sanity check, you should see a very small "
                    "error or very good metric evaluation on the end result")
        trainer.do_sanity_check(train_dataloader)
    else:
        trainer.do_training(train_dataloader, val_dataloader,
                            train_args.eval_per_epoch)


if __name__ == "__main__":
    main(cfg_mod.parse_arg_train())
