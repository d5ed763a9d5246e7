"""Coverage for the ReduceLROnPlateau training branch (the reference's
non-cosine path, agent_base.py:66-73,169-170) and the count agent's
negated-metric plateau stepping (agent_count.py:107-108)."""

import numpy as np
import pytest

import jax

from lrce_tpu.models import e2e as E
from lrce_tpu.train.agent import AgentCount, AgentOE

from test_agent_training import ListLoader, make_args, synth_batch, tiny_cfg


@pytest.mark.slow
def test_plateau_training_decays_lr(tmp_path):
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    args = make_args(log_dir=str(tmp_path), epoch=4, use_cosine_scheduler=False,
                     patience=0, lr=[1e-3, 2e-3, 3e-3], lr_decay_factor=0.5)
    agent = AgentOE(cfg, params, args, log_enabled=False)
    # plateau path starts at the per-group base lrs (unlike cosine's min_lr)
    assert agent.lrs == [1e-3, 2e-3, 3e-3]

    train_dl = ListLoader([synth_batch(cfg, seed=0)])
    val_dl = ListLoader([synth_batch(cfg, seed=1)])
    agent.do_training(train_dl, val_dl, eval_per_epoch=1)
    # with patience 0 and a stagnant metric, lrs decay while keeping ratios
    assert agent.lrs[0] < 1e-3
    assert agent.lrs[1] / agent.lrs[0] == 2.0


@pytest.mark.slow
def test_count_plateau_uses_negated_mse(tmp_path):
    cfg = tiny_cfg("count", num_classes=1)
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    args = make_args(log_dir=str(tmp_path), epoch=2, use_cosine_scheduler=False,
                     patience=5)
    agent = AgentCount(cfg, params, args, log_enabled=False)
    train_dl = ListLoader([synth_batch(cfg, count=True, seed=0)])
    val_dl = ListLoader([synth_batch(cfg, count=True, seed=1)])
    agent.do_training(train_dl, val_dl, eval_per_epoch=1)
    # scheduler best tracks the NEGATED mse (mode='max' convention)
    assert agent.scheduler.best is not None
    assert agent.scheduler.best <= 0
    assert agent.best_metric_val is not None  # lower-better metric recorded
