"""Training-runtime integration tests: overfit a tiny model on synthetic data
(the reference's --sanity-check philosophy, train.py:124-128), losses,
checkpoint round-trip, and the data-parallel mesh path."""

import argparse
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lrce_tpu.constants import IGNORE_INDEX
from lrce_tpu.models import bert as B
from lrce_tpu.models import e2e as E
from lrce_tpu.models import swin3d as S
from lrce_tpu.train import losses as L
from lrce_tpu.train.agent import AgentCount, AgentMC, AgentOE


def tiny_cfg(task="oe", num_classes=4):
    swin = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=16, depths=(2,),
                        num_heads=(2,), window_size=(2, 3, 3),
                        drop_path_rate=0.0, patch_norm=True)
    bert = B.BertConfig(vocab_size=50, hidden_size=24, num_layers=2,
                        num_heads=2, intermediate_size=48,
                        max_position_embeddings=16, type_vocab_size=2,
                        hidden_dropout=0.0, attention_dropout=0.0)
    return E.E2EConfig(feature_dim=24, num_classes=num_classes,
                       drop_out_rate=0.0, video_feature_res=(4, 4),
                       video_feature_dim=16, frame_sample_size=5,
                       temporal_scale=(1,), text_seq_len=8, task_type=task,
                       bert=bert, swin=swin)


def make_args(**over):
    d = dict(dataset="msvd-qa-oe", log_dir="/tmp/lrce_runs", ckpt_interval=100,
             batch_size=4, eval_per_epoch=1, epoch=1, drop_out_rate=0.0,
             lr=[1e-3, 1e-3, 1e-3], min_lr=1e-8, temporal_scale=[1],
             lr_decay_factor=0.5, lr_warm_up=0.1, lr_restart_epoch=2,
             lr_restart_mul=1, use_cosine_scheduler=True, reg_strength=0.0,
             num_workers=0, use_hinge_loss=False, debug_mode=True,
             sanity_check=False)
    d.update(over)
    return argparse.Namespace(**d)


class ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def synth_batch(cfg, batch=4, mc=False, count=False, seed=0):
    rng = np.random.RandomState(seed)
    s = sum(cfg.temporal_scale)
    clips = rng.rand(batch, s, 5, 16, 16, 3).astype(np.float32)
    shape = (batch, 5, cfg.text_seq_len) if mc else (batch, cfg.text_seq_len)
    ids = rng.randint(0, 50, shape)
    mask = np.ones(shape, np.int64)
    types = np.zeros(shape, np.int64)
    if count:
        gt = rng.randint(1, 10, (batch,)).astype(np.float32)
    elif mc:
        gt = rng.randint(0, 5, (batch,)).astype(np.int64)
    else:
        gt = rng.randint(0, cfg.num_classes, (batch,)).astype(np.int64)
    return (clips, ids, mask, types, gt)


def test_oe_agent_overfits_batch():
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    agent = AgentOE(cfg, params, make_args(), log_enabled=False)
    batch = synth_batch(cfg)

    first_loss, *_ = agent.step(*batch, is_train=True)
    agent.lrs = [1e-3] * 3
    for _ in range(30):
        loss, correct, total = agent.step(*batch, is_train=True)
    assert loss < first_loss * 0.5, (first_loss, loss)
    assert correct == total  # memorized


@pytest.mark.slow
def test_mid_epoch_validation_and_best_ckpt(tmp_path):
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    args = make_args(log_dir=str(tmp_path), epoch=2, eval_per_epoch=2,
                     ckpt_interval=1, debug_mode=False)
    agent = AgentOE(cfg, params, args, log_enabled=True)
    train_dl = ListLoader([synth_batch(cfg, seed=i) for i in range(4)])
    val_dl = ListLoader([synth_batch(cfg, seed=9)])
    agent.do_training(train_dl, val_dl, eval_per_epoch=2)

    import os

    weights = os.listdir(agent.args.ckpt_dir)
    assert "best.pt" in weights
    assert any(w.startswith("epoch") for w in weights)
    assert agent.best_metric_val is not None


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    agent = AgentOE(cfg, params, make_args(), log_enabled=False)
    batch = synth_batch(cfg)
    agent.step(*batch, is_train=True)

    from lrce_tpu.utils import checkpoint as C

    path = str(tmp_path / "ck.pt")
    C.save_checkpoint(path, agent.params)
    loaded = C.load_checkpoint(path)["model_state_dict"]

    before = agent._eval_step(agent.params, *agent._put_batch(batch))[0]
    agent2 = AgentOE(cfg, E.e2e_init(jax.random.PRNGKey(7), cfg), make_args(),
                     log_enabled=False)
    agent2.load_checkpoint(path)
    after = agent2._eval_step(agent2.params, *agent2._put_batch(batch))[0]
    np.testing.assert_allclose(float(before), float(after), rtol=1e-6)


@pytest.mark.slow
def test_full_state_checkpoint_resume(tmp_path):
    """--save-full-state must checkpoint optimizer + scheduler state and
    restore them on resume (TPU-side addition: the reference defined this
    path but never exercised it, agent_base.py:208-217)."""
    cfg = tiny_cfg("oe")
    args = make_args(save_full_state=True, log_dir=str(tmp_path),
                     debug_mode=False)
    agent = AgentOE(cfg, E.e2e_init(jax.random.PRNGKey(0), cfg), args,
                    log_enabled=True)
    agent.summary_writer = None  # no TB files in tmp test dir
    batch = synth_batch(cfg)
    agent.lrs = [1e-3] * 3
    for _ in range(3):
        agent.step(*batch, is_train=True)
    agent.last_loss, agent.last_metric_val = 0.5, 0.25
    agent.save_checkpoint(1, "best")
    path = str(tmp_path / "checkpoints" / "best.pt")
    import os

    if not os.path.exists(path):
        path = os.path.join(agent.args.ckpt_dir, "best.pt")

    from lrce_tpu.utils import checkpoint as C

    raw = C.load_checkpoint(path)
    assert "optimizer_state_dict" in raw
    assert "scheduler_state_dict" in raw

    agent2 = AgentOE(cfg, E.e2e_init(jax.random.PRNGKey(7), cfg), args,
                     log_enabled=False)
    agent2.load_checkpoint(path)
    leaves1 = jax.tree_util.tree_leaves(agent.opt_state)
    leaves2 = jax.tree_util.tree_leaves(agent2.opt_state)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # without the flag the checkpoint stays model-only (reference behavior)
    args_ref = make_args(log_dir=str(tmp_path / "ref"), debug_mode=False)
    agent3 = AgentOE(cfg, agent.params, args_ref, log_enabled=True)
    agent3.summary_writer = None
    agent3.last_loss, agent3.last_metric_val = 0.5, 0.25
    agent3.save_checkpoint(1, "best")
    raw3 = C.load_checkpoint(os.path.join(agent3.args.ckpt_dir, "best.pt"))
    assert "optimizer_state_dict" not in raw3


def test_count_agent_metrics():
    cfg = tiny_cfg("count", num_classes=1)
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    agent = AgentCount(cfg, params, make_args(), log_enabled=False)
    batch = synth_batch(cfg, count=True)
    loss, mse_sum, n = agent.step(*batch, is_train=False)
    assert n == 4
    assert mse_sum >= 0
    assert agent.metric_lower_better


@pytest.mark.slow
def test_mc_agent_hinge():
    cfg = tiny_cfg("mc", num_classes=1)
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    agent = AgentMC(cfg, params, make_args(use_hinge_loss=True, margin=1.0),
                    log_enabled=False)
    batch = synth_batch(cfg, mc=True)
    loss, correct, total = agent.step(*batch, is_train=True)
    assert np.isfinite(loss) and total == 4


def test_hinge_loss_matches_reference_loop():
    """Vectorized hinge == the reference's per-sample loop
    (agent_mc.py:20-41)."""
    rng = np.random.RandomState(0)
    out = rng.randn(6, 5).astype(np.float32)
    gt = rng.randint(0, 5, (6,))
    margin = 1.0

    ref_total = []
    for i in range(6):
        c = gt[i]
        vals = [max(out[i, j] - out[i, c] + margin, 0.0)
                for j in range(5) if j != c]
        ref_total.append(sum(vals))
    ref = float(np.mean(ref_total))
    got = float(L.hinge_loss(jnp.asarray(out), jnp.asarray(gt), margin))
    assert got == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_ignore_index_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, (8,))
    labels[2] = IGNORE_INDEX
    labels[5] = IGNORE_INDEX

    ref = torch.nn.CrossEntropyLoss(ignore_index=IGNORE_INDEX)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-5)


@pytest.mark.slow
def test_data_parallel_mesh_step():
    """Same batch through a 1-device and an 8-device mesh must agree."""
    from jax.sharding import Mesh

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    batch = synth_batch(cfg, batch=8)

    agent1 = AgentOE(cfg, params, make_args(), log_enabled=False)
    loss1, c1, t1 = agent1.step(*batch, is_train=False)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    agent8 = AgentOE(cfg, params, make_args(), mesh=mesh, log_enabled=False)
    loss8, c8, t8 = agent8.step(*batch, is_train=False)

    assert t1 == t8 == 8
    assert c1 == c8
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)

    # and a train step executes with sharded batch + replicated params
    loss, c, t = agent8.step(*batch, is_train=True)
    assert np.isfinite(loss)


def test_async_checkpoint_survives_donation(tmp_path):
    """The background writer must snapshot device state BEFORE the next
    donated train step invalidates the live param/opt buffers; the file on
    disk must hold exactly the state at save time, not post-step state."""
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    args = make_args(log_dir=str(tmp_path), async_checkpoint=True,
                     save_full_state=True)
    agent = AgentOE(cfg, params, args, log_enabled=True)
    batch = synth_batch(cfg)
    agent.step(*batch, is_train=True)
    at_save = jax.tree_util.tree_map(np.asarray, agent.params)

    agent.save_checkpoint(1, "async")       # background write begins
    agent.step(*batch, is_train=True)       # donates the old buffers
    agent.finish_pending_checkpoint()
    agent.finish_pending_checkpoint()       # idempotent

    from lrce_tpu.utils import checkpoint as C

    import os
    ck = C.load_checkpoint(os.path.join(agent.args.ckpt_dir, "async.pt"))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        at_save, ck["model_state_dict"])
    assert "optimizer_state_dict" in ck     # --save-full-state honored
    # and the loop state moved on: live params differ from the snapshot
    moved = jax.tree_util.tree_map(np.asarray, agent.params)
    flat_a = np.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(at_save)])
    flat_m = np.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(moved)])
    assert not np.array_equal(flat_a, flat_m)


def test_step_interval_rolling_checkpoint(tmp_path):
    """--ckpt-steps N writes a rolling weights/latest.pt every N optimizer
    steps (fault tolerance on preemptible capacity); the file is loadable
    and --save-full-state content rides along."""
    cfg = tiny_cfg("oe")
    args = make_args(log_dir=str(tmp_path), ckpt_steps=2, epoch=1,
                     async_checkpoint=True, save_full_state=True)
    agent = AgentOE(cfg, E.e2e_init(jax.random.PRNGKey(0), cfg), args,
                    log_enabled=True)
    batches = [synth_batch(cfg, seed=s) for s in range(5)]
    from collections import deque
    deque(agent.process_data(ListLoader(batches), True, 0), maxlen=0)
    agent.finish_pending_checkpoint()

    import os
    path = os.path.join(agent.args.ckpt_dir, "latest.pt")
    assert os.path.exists(path)
    from lrce_tpu.utils import checkpoint as C
    ck = C.load_checkpoint(path)
    assert "optimizer_state_dict" in ck
    agent2 = AgentOE(cfg, E.e2e_init(jax.random.PRNGKey(9), cfg), args,
                     log_enabled=False)
    agent2.load_checkpoint(path)   # structurally compatible
