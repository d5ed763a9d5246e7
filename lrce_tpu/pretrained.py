"""Pretrained-weight loading.

The reference hard-requires the Kinetics-600 Swin-B checkpoint at
./pretrained_models/ and downloads bert-base-uncased from the HF hub
(reference lrce/models/e2e.py:11-14, lrce/feature_extractor/text.py:9).
This runtime has no network egress, so both are loaded from local files when
present and otherwise left at random init with a warning — every downstream
path (training, eval, checkpoint ingest) works either way.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from lrce_tpu.utils.logging import get_logger

SWIN_CKPT_PATHS = [
    "./pretrained_models/swin_base_patch244_window877_kinetics600_22k.pth",
]
BERT_CKPT_PATHS = [
    "./pretrained_models/bert-base-uncased.pt",
    "./pretrained_models/bert-base-uncased.bin",
    "./pretrained_models/pytorch_model.bin",
]


def _first_existing(paths) -> Optional[str]:
    for p in paths:
        if os.path.exists(p):
            return p
    return None


def load_pretrained(params: dict, swin_path: Optional[str] = None,
                    bert_path: Optional[str] = None) -> dict:
    """Overlay pretrained Swin/BERT torch weights onto an initialized E2E
    params pytree (keys: video_extractor / text_extractor)."""
    import jax

    from lrce_tpu.utils import torch_io as tio

    logger = get_logger(__name__)
    swin_path = swin_path or _first_existing(SWIN_CKPT_PATHS)
    bert_path = bert_path or _first_existing(BERT_CKPT_PATHS)

    def as_jnp(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    if swin_path:
        sd = tio.load_torch_state_dict(swin_path)
        sd = tio.strip_prefix(sd, "backbone.")
        params = {**params, "video_extractor": as_jnp(tio.convert_swin(sd))}
        logger.info(f"Loaded Swin weights from {swin_path}")
    else:
        logger.warning(
            "Swin Kinetics-600 checkpoint not found under ./pretrained_models "
            "- video encoder stays randomly initialized")

    if bert_path:
        sd = tio.load_torch_state_dict(bert_path)
        params = {**params, "text_extractor": as_jnp(tio.convert_bert(sd))}
        logger.info(f"Loaded BERT weights from {bert_path}")
    else:
        logger.warning(
            "bert-base-uncased weights not found under ./pretrained_models "
            "- text encoder stays randomly initialized")
    return params
