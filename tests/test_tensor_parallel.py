"""Tensor-parallel sharding: numerics on a (data x model) mesh must equal the
single-device computation; the big text/fusion matrices must actually shard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lrce_tpu.parallel.mesh import make_mesh_2d
from lrce_tpu.parallel.sharding import e2e_param_shardings

from test_agent_training import ListLoader, make_args, synth_batch, tiny_cfg  # noqa: E402


def test_sharding_rules_hit_big_matrices():
    from lrce_tpu.models import e2e as E

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh_2d(4, 2)
    sh = e2e_param_shardings(params, mesh)

    # fusion decoder ffn: column-parallel fc1, row-parallel fc2
    fc1 = sh["fusion_model"]["fusion_transformer"]["layers"]["linear1"]["w"]
    fc2 = sh["fusion_model"]["fusion_transformer"]["layers"]["linear2"]["w"]
    assert fc1.spec == P(None, None, "model")
    assert fc2.spec == P(None, "model", None)

    # bert q/k/v column-parallel, output row-parallel
    q = sh["text_extractor"]["layers"]["attention"]["query"]["w"]
    o = sh["text_extractor"]["layers"]["attention"]["output"]["w"]
    assert q.spec == P(None, None, "model")
    assert o.spec == P(None, "model", None)

    # video extractor fully replicated (pallas kernels need full windows)
    vid_leaves = jax.tree_util.tree_leaves(
        sh["video_extractor"], is_leaf=lambda x: hasattr(x, "spec"))
    assert all(s.spec == P() for s in vid_leaves)


@pytest.mark.slow
def test_tp_numerics_match_single_device():
    from lrce_tpu.train.agent import AgentOE

    cfg = tiny_cfg("oe")
    from lrce_tpu.models import e2e as E

    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    batch = synth_batch(cfg, batch=8)

    agent1 = AgentOE(cfg, params, make_args(), log_enabled=False)
    loss1, c1, t1 = agent1.step(*batch, is_train=False)

    mesh = make_mesh_2d(4, 2)
    agent_tp = AgentOE(cfg, params, make_args(), mesh=mesh, log_enabled=False)
    loss_tp, c_tp, t_tp = agent_tp.step(*batch, is_train=False)

    assert (c1, t1) == (c_tp, t_tp)
    np.testing.assert_allclose(loss1, loss_tp, rtol=1e-5)

    # a train step on the dp x tp mesh runs and stays finite
    agent_tp.lrs = [1e-4] * 3
    loss, c, t = agent_tp.step(*batch, is_train=True)
    assert np.isfinite(loss)

    # params remain sharded after the (donated) update
    fc1 = agent_tp.params["fusion_model"]["fusion_transformer"]["layers"]["linear1"]["w"]
    assert fc1.sharding.spec == P(None, None, "model")
