"""FSDP/ZeRO-style parameter+optimizer sharding over an 'fsdp' mesh axis:
numerics must match the single-device computation, storage must actually
shard, and the batch must shard over data x fsdp.

The reference has no parameter sharding at all (DDP replicates the model
per rank, reference lrce/agent/agent_base.py:75-76) — this is a TPU-native
extension on the virtual 8-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lrce_tpu.parallel.mesh import batch_axes, make_mesh_3d
from lrce_tpu.parallel.sharding import e2e_param_shardings

from test_agent_training import ListLoader, make_args, synth_batch, tiny_cfg  # noqa: E402


def test_fsdp_rules_shard_text_and_fusion_only():
    from lrce_tpu.models import e2e as E

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh_3d(2, 2, 2)
    sh = e2e_param_shardings(params, mesh)

    # TP-owned leaves stay TP-only (mixed fsdp+model on one scanned weight
    # forces collective-permute reshards inside the scan body)
    fc1 = sh["fusion_model"]["fusion_transformer"]["layers"]["linear1"]["w"]
    assert "model" in fc1.spec and "fsdp" not in fc1.spec

    q = sh["text_extractor"]["layers"]["attention"]["query"]["w"]
    assert q.spec[-1] == "model" and "fsdp" not in q.spec

    # non-TP leaves shard over fsdp on their LAST divisible dim — the word
    # embedding shards its hidden dim (vocab-dim sharding would make every
    # gather reshard via involuntary full rematerialization)
    emb = sh["text_extractor"]["embeddings"]["word"]
    assert emb.spec[-1] == "fsdp"

    # video extractor stays fully replicated (pallas kernels need full
    # windows; GSPMD cannot repartition a pallas_call)
    vid = jax.tree_util.tree_leaves(
        sh["video_extractor"], is_leaf=lambda x: hasattr(x, "spec"))
    assert all(s.spec == P() for s in vid)

    # batch shards over both data-like axes
    assert batch_axes(mesh) == ("data", "fsdp")


def test_train_mesh_builder_and_cli_flags():
    from lrce_tpu.config import parse_arg_train
    from lrce_tpu.parallel.mesh import make_train_mesh

    args = parse_arg_train(["--dataset", "msvd-qa-oe", "--dataset-dir", "/x",
                            "--fsdp", "2", "--tensor-parallel", "2"])
    assert args.fsdp == 2 and args.tensor_parallel == 2
    # defaults stay off
    args0 = parse_arg_train(["--dataset", "msvd-qa-oe", "--dataset-dir", "/x"])
    assert args0.fsdp == 1 and args0.tensor_parallel == 1

    mesh = make_train_mesh(2, 2)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}
    assert batch_axes(mesh) == ("data", "fsdp")

    assert dict(make_train_mesh(1, 1).shape) == {"data": 8}
    assert dict(make_train_mesh(1, 2).shape) == {"data": 4, "model": 2}
    assert dict(make_train_mesh(4, 1).shape) == {"data": 2, "fsdp": 4,
                                                 "model": 1}

    with pytest.raises(ValueError):
        make_train_mesh(3, 1)  # 3 does not divide 8


def test_fsdp_no_axis_degrades_to_replication():
    from lrce_tpu.models import e2e as E
    from lrce_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)
    sh = e2e_param_shardings(params, mesh)
    leaves = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec"))
    assert all(s.spec == P() for s in leaves)
    assert batch_axes(mesh) == ("data",)


@pytest.mark.slow
def test_fsdp_numerics_and_sharded_storage():
    from lrce_tpu.models import e2e as E
    from lrce_tpu.train.agent import AgentOE

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    batch = synth_batch(cfg, batch=8)

    # each agent gets its own copy: the donated train step deletes its
    # param buffers, and device_put replication may alias shard 0
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    agent1 = AgentOE(cfg, copy(params), make_args(), log_enabled=False)
    loss1, c1, t1 = agent1.step(*batch, is_train=False)

    mesh = make_mesh_3d(2, 2, 2)
    agent_f = AgentOE(cfg, copy(params), make_args(), mesh=mesh,
                      log_enabled=False)
    loss_f, c_f, t_f = agent_f.step(*batch, is_train=False)

    assert (c1, t1) == (c_f, t_f)
    np.testing.assert_allclose(loss1, loss_f, rtol=1e-5)

    # params AND optimizer moments are stored sharded (ZeRO): one
    # addressable shard holds a strict fraction of the leaf
    w = agent_f.params["text_extractor"]["layers"]["attention"]["query"]["w"]
    assert w.addressable_shards[0].data.size < w.size
    mu = agent_f.opt_state.mu
    mu_w = mu["text_extractor"]["layers"]["attention"]["query"]["w"]
    assert mu_w.addressable_shards[0].data.size < mu_w.size

    # a train step matches the single-device step and stays sharded
    agent1.lrs = [1e-4] * 3
    agent_f.lrs = [1e-4] * 3
    tl1, _, _ = agent1.step(*batch, is_train=True)
    tlf, _, _ = agent_f.step(*batch, is_train=True)
    np.testing.assert_allclose(tl1, tlf, rtol=1e-5)

    w = agent_f.params["text_extractor"]["layers"]["attention"]["query"]["w"]
    assert w.addressable_shards[0].data.size < w.size

    # and the updated params agree with the single-device update
    w1 = np.asarray(
        agent1.params["text_extractor"]["layers"]["attention"]["query"]["w"])
    wf = np.asarray(jax.device_get(w))
    np.testing.assert_allclose(w1, wf, rtol=2e-4, atol=1e-6)
