"""Legacy arg parser kept for surface parity with the reference's
`train_ddp.py` entry (reference parser.py:5-115): identical to
lrce_tpu.config.parse_arg_train except the default temporal scale is
[1, 2, 3] instead of [3]."""

from __future__ import annotations

from typing import Optional, Sequence

from lrce_tpu import config as _cfg


def parse_arg_train(argv: Optional[Sequence[str]] = None):
    p = _cfg._build_train_parser()
    for action in p._actions:
        if action.dest == "temporal_scale":
            action.default = [1, 2, 3]
    result = p.parse_args(argv)

    if result.use_cosine_scheduler:
        del vars(result)["patience"]
    else:
        del vars(result)["lr_restart_epoch"]
        del vars(result)["lr_restart_mul"]
        del vars(result)["lr_warm_up"]
    if not result.use_hinge_loss:
        del vars(result)["margin"]
    if result.comment == "":
        del vars(result)["comment"]

    vars(result).update(_cfg.load_model_config(result.dataset))
    if len(result.lr) == 1:
        result.lr = result.lr * 3
    if len(result.temporal_scale) < 1:
        result.temporal_scale = [3]
    return result
