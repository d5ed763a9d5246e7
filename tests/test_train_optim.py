"""Optimizer/schedule parity tests: multi-group AdamW vs torch AdamW over
several steps with per-group LRs; cosine-warmup-restarts shape checks."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lrce_tpu.train import optimizer as O
from lrce_tpu.train.schedule import (
    CosineWarmupRestarts,
    ReduceLROnPlateau,
    cosine_warmup_restarts_lr,
)


def test_adamw_matches_torch_multigroup():
    rng = np.random.RandomState(0)
    shapes = {"fusion_model": (4, 3), "text_extractor": (5,),
              "video_extractor": (2, 2)}
    init = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    coef = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    lrs = [1e-2, 3e-3, 5e-4]

    # torch side: 3 param groups, AdamW defaults like the reference
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in init.items()}
    topt = torch.optim.AdamW(
        [{"params": [tparams["fusion_model"]], "lr": lrs[0]},
         {"params": [tparams["text_extractor"]], "lr": lrs[1]},
         {"params": [tparams["video_extractor"]], "lr": lrs[2]}],
        lr=lrs[0], betas=(0.9, 0.999))

    # jax side
    jparams = {k: {"w": jnp.asarray(v)} for k, v in init.items()}
    labels = O.group_index_tree(jparams)
    adam = O.make_optimizer()
    opt_state = adam.init(jparams)
    jlrs = jnp.asarray(lrs)

    def loss_j(p):
        return sum(jnp.sum(p[k]["w"] * jnp.asarray(coef[k]))
                   + 0.5 * jnp.sum(p[k]["w"] ** 2) for k in shapes)

    for step in range(5):
        tloss = sum((tparams[k] * torch.from_numpy(coef[k])).sum()
                    + 0.5 * (tparams[k] ** 2).sum() for k in shapes)
        topt.zero_grad()
        tloss.backward()
        topt.step()

        grads = jax.grad(loss_j)(jparams)
        jparams, opt_state = O.apply_updates(jparams, grads, opt_state, adam,
                                             labels, jlrs)

    for k in shapes:
        np.testing.assert_allclose(np.asarray(jparams[k]["w"]),
                                   tparams[k].detach().numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_cosine_schedule_shape():
    # MSVD recipe: first_cycle=2 epochs, warmup 0.1 epoch, gamma 0.5
    kw = dict(first_cycle_steps=2, cycle_mult=1, base_max_lr=5e-5,
              min_lr=1e-8, warmup_steps=0.1, gamma=0.5)
    # warmup start at min_lr
    assert cosine_warmup_restarts_lr(0.0, **kw) == pytest.approx(1e-8)
    # peak right at warmup end
    assert cosine_warmup_restarts_lr(0.1, **kw) == pytest.approx(5e-5)
    # midpoint of first cosine ~ half amplitude
    mid = 0.1 + (2 - 0.1) / 2
    assert cosine_warmup_restarts_lr(mid, **kw) == pytest.approx(
        1e-8 + (5e-5 - 1e-8) / 2, rel=1e-6)
    # end of cycle -> min_lr
    assert cosine_warmup_restarts_lr(2.0 - 1e-9, **kw) == pytest.approx(
        1e-8, abs=1e-9)
    # second cycle warmup peak decayed by gamma
    assert cosine_warmup_restarts_lr(2.1, **kw) == pytest.approx(2.5e-5)
    # monotone decrease within cosine part
    xs = np.linspace(0.2, 1.9, 50)
    ys = [cosine_warmup_restarts_lr(float(x), **kw) for x in xs]
    assert all(a >= b for a, b in zip(ys, ys[1:]))


def test_cosine_schedule_cycle_mult():
    kw = dict(first_cycle_steps=2, cycle_mult=2, base_max_lr=1e-4,
              min_lr=0.0, warmup_steps=0.0, gamma=1.0)
    # cycle 0: [0,2); cycle 1: [2,6); cycle 2: [6,14)
    assert cosine_warmup_restarts_lr(2.0, **kw) == pytest.approx(1e-4)
    assert cosine_warmup_restarts_lr(6.0, **kw) == pytest.approx(1e-4)
    # mid of cycle 1 (len 4) -> half amplitude
    assert cosine_warmup_restarts_lr(4.0, **kw) == pytest.approx(5e-5)


def test_cosine_stateful_applies_same_lr_to_all_groups():
    sched = CosineWarmupRestarts(3, first_cycle_steps=2, max_lr=1e-4,
                                 min_lr=1e-8, warmup_steps=0.1)
    assert sched.lrs == [1e-8] * 3
    lrs = sched.step(0.1)
    assert lrs == [pytest.approx(1e-4)] * 3


def test_reduce_on_plateau_matches_torch():
    init_lrs = [1e-3, 2e-3, 3e-3]
    p = [torch.nn.Parameter(torch.zeros(1)) for _ in range(3)]
    topt = torch.optim.SGD([{"params": [p[i]], "lr": init_lrs[i]}
                            for i in range(3)], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="max", factor=0.5, patience=1, min_lr=1e-6)
    mine = ReduceLROnPlateau(init_lrs, mode="max", factor=0.5, patience=1,
                             min_lr=1e-6)

    metrics = [0.5, 0.6, 0.6, 0.6, 0.6, 0.7, 0.7, 0.7, 0.7]
    for m in metrics:
        tsched.step(m)
        mine.step(m)
        tlrs = [g["lr"] for g in topt.param_groups]
        assert mine.lrs == pytest.approx(tlrs), m


def test_zero_lr_group_is_frozen():
    """A zero-LR group must not move at all (the mechanism sanity_curve's
    --freeze-encoders relies on — only real under per-group LRs, i.e. the
    plateau path; the cosine scheduler overwrites every group with lr[0])."""
    key = jax.random.PRNGKey(0)
    params = {
        "fusion_model": {"w": jax.random.normal(key, (4, 4))},
        "text_extractor": {"w": jax.random.normal(key, (4, 4)) + 1.0},
        "video_extractor": {"w": jax.random.normal(key, (4, 4)) - 1.0},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    adam = O.make_optimizer()
    labels = O.group_index_tree(params)
    state = adam.init(params)
    lrs = jnp.asarray([1e-3, 0.0, 0.0], jnp.float32)
    new, state = O.apply_updates(params, grads, state, adam, labels, lrs)
    new, _ = O.apply_updates(new, grads, state, adam, labels, lrs)
    assert not np.allclose(np.asarray(new["fusion_model"]["w"]),
                           np.asarray(params["fusion_model"]["w"]))
    for g in ("text_extractor", "video_extractor"):
        np.testing.assert_array_equal(np.asarray(new[g]["w"]),
                                      np.asarray(params[g]["w"]))
