"""Unit coverage for the round-2 robustness fixes:

- initialize_multihost must decide intent from env vars WITHOUT touching
  any backend-initializing JAX API, must propagate rendezvous failures
  loudly, and must leave single-host runs untouched (ADVICE round 1).
- load_checkpoint must report a corrupt native pickle as corruption, not
  fall through to a misleading torch conversion error (ADVICE round 1).
"""

import pickle

import numpy as np
import pytest

from lrce_tpu.parallel import mesh as M
from lrce_tpu.utils import checkpoint as C


@pytest.fixture(autouse=True)
def _reset_multihost_flag():
    M._MULTIHOST_INITIALIZED = False
    yield
    M._MULTIHOST_INITIALIZED = False


def test_multihost_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("LRCE_TPU_MULTIHOST", raising=False)

    def boom(**kwargs):
        raise AssertionError("initialize() must not be called single-host")

    monkeypatch.setattr(M.jax.distributed, "initialize", boom)
    M.initialize_multihost()  # no env => no backend interaction
    assert M._MULTIHOST_INITIALIZED is False


def test_multihost_explicit_env_passes_rendezvous_args(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    calls = []
    monkeypatch.setattr(M.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    M.initialize_multihost()
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]
    assert M._MULTIHOST_INITIALIZED is True
    # idempotent: second call must not re-rendezvous
    M.initialize_multihost()
    assert len(calls) == 1


def test_multihost_failure_is_loud(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")

    def boom(**kwargs):
        raise ConnectionError("coordinator unreachable")

    monkeypatch.setattr(M.jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="Refusing to silently fall back"):
        M.initialize_multihost()


_DCN_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
# The environment's site hook force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS; pin the cpu platform via config (env alone is
# not enough) BEFORE the rendezvous, like tests/conftest.py does.
import jax
jax.config.update("jax_platforms", "cpu")

from lrce_tpu.parallel.mesh import initialize_multihost
initialize_multihost()  # must run BEFORE any backend-initializing JAX API

import numpy as np
import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == int(os.environ["JAX_PROCESS_ID"])

# One real cross-process collective over the rendezvous'd cluster: build a
# global array with one shard per process and psum it inside jit — the same
# GSPMD pattern the train step's gradient all-reduce uses.
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2, devs  # 1 cpu device per process, 2 global
mesh = Mesh(np.asarray(devs), ("data",))
sharding = NamedSharding(mesh, P("data"))
local = np.array([[float(jax.process_index() + 1)]])
garr = jax.make_array_from_process_local_data(sharding, local, (2, 1))
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(garr)
# addressable on every process (replicated output)
assert float(total.addressable_data(0)) == 3.0, total
print("DCN_OK", jax.process_index(), flush=True)

# --- one REAL train step across the 2-process mesh -------------------------
# Exercises the full production loop shape over DCN: donated params/opt
# buffers, pinned out_shardings, the shard_map'd Swin tower running the
# REAL fused-kernel code (Pallas interpret mode on CPU), gradient psum
# across processes, and the single replicated metric read-back.
import argparse
from lrce_tpu.models import bert as B
from lrce_tpu.models import e2e as E
from lrce_tpu.models import swin3d as S
from lrce_tpu.train.agent import AgentOE

swin = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=16, depths=(2,),
                    num_heads=(2,), window_size=(2, 3, 3),
                    drop_path_rate=0.1, patch_norm=True,
                    pallas_interpret=True)
bertc = B.BertConfig(vocab_size=64, hidden_size=24, num_layers=2,
                     num_heads=2, intermediate_size=48,
                     max_position_embeddings=16, type_vocab_size=2)
cfg = E.E2EConfig(feature_dim=24, num_classes=7, drop_out_rate=0.1,
                  video_feature_res=(6, 6), video_feature_dim=16,
                  frame_sample_size=4, temporal_scale=(1, 2),
                  text_seq_len=8, task_type="oe", bert=bertc, swin=swin)
params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)
args = argparse.Namespace(
    dataset="dcn", log_dir="/tmp/lrce_dcn", ckpt_interval=100, batch_size=1,
    eval_per_epoch=1, epoch=1, drop_out_rate=0.1, lr=[1e-4] * 3, min_lr=1e-8,
    temporal_scale=[1, 2], lr_decay_factor=0.5, lr_warm_up=0.1,
    lr_restart_epoch=2, lr_restart_mul=1, use_cosine_scheduler=True,
    reg_strength=0.001, num_workers=0, use_hinge_loss=False, debug_mode=True,
    sanity_check=False)
agent = AgentOE(cfg, params, args, mesh=mesh, log_enabled=False,
                compute_dtype=jnp.float32)
agent.lrs = [1e-4] * 3

bsh = NamedSharding(mesh, P("data"))
rng2 = np.random.RandomState(3)
gbatch, host = [], []
host.append(rng2.rand(2, 3, 4, 24, 24, 3).astype(np.float32))
host.append(rng2.randint(0, 64, (2, 8)))
host.append(np.ones((2, 8), np.int64))
host.append(np.zeros((2, 8), np.int64))
host.append(rng2.randint(0, 7, (2,)).astype(np.int64))
pid = jax.process_index()
for h in host:
    gbatch.append(jax.make_array_from_process_local_data(
        bsh, np.ascontiguousarray(h[pid:pid + 1]), h.shape))
loss, m0, m1 = agent.step(*gbatch, is_train=True)
assert np.isfinite(loss), loss
assert m1 == 2.0, (m0, m1)  # metric denominator reduced across processes
print("DCN_TRAIN_OK", jax.process_index(), loss, flush=True)
"""


def test_dcn_rendezvous_two_processes_psum(tmp_path):
    """The multi-host path executed FOR REAL: two local processes
    rendezvous through jax.distributed.initialize over a localhost
    coordinator (the reference's MASTER_ADDR/RANK/WORLD_SIZE contract,
    reference train.py:10-13), then run a cross-process psum through
    GSPMD — the collective the production train step relies on."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = tmp_path / "dcn_child.py"
    script.write_text(_DCN_CHILD.format(repo=repo))

    procs = []
    for pid in range(2):
        env = dict(_os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # both children compile the same full train step; a shared
            # persistent cache makes warm reruns fast and halves the cold
            # cost (the second process hits the first one's entry)
            "JAX_COMPILATION_CACHE_DIR": "/tmp/lrce_test_xla_cache",
        })
        procs.append(subprocess.Popen(
            [_sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            # cold-cache compile of the full train step takes ~150 s alone
            # on the 1-core CI box; leave generous headroom for load
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DCN_OK {pid}" in out, out
        assert f"DCN_TRAIN_OK {pid}" in out, out


def _tiny_async_agent(tmp_path, **over):
    import jax

    from lrce_tpu.models import e2e as E
    from lrce_tpu.train.agent import AgentOE
    from tests.test_agent_training import make_args, tiny_cfg

    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    args = make_args(log_dir=str(tmp_path / "runs"), async_checkpoint=True,
                     save_full_state=False, **over)
    return AgentOE(cfg, params, args, log_enabled=True)


def test_async_checkpoint_writer_failure_is_loud(tmp_path):
    """Round-3 verdict weak #1: a writer-thread exception (disk full,
    permissions, bad path) must surface — a run that 'completes' having
    saved nothing is worse than a crash. The error is raised at the next
    finish_pending_checkpoint/save_checkpoint, not swallowed."""
    agent = _tiny_async_agent(tmp_path)
    blocker = tmp_path / "blocker"
    blocker.write_text("a file where a directory is expected")
    agent.args.ckpt_dir = str(blocker / "weights")  # open() cannot succeed

    agent.save_checkpoint(1, "latest")  # async: returns immediately
    with pytest.raises(RuntimeError, match="checkpoint was NOT saved"):
        agent.finish_pending_checkpoint()

    # error consumed; a save to a good directory then succeeds
    import os

    good = tmp_path / "weights"
    good.mkdir()
    agent.args.ckpt_dir = str(good)
    agent.save_checkpoint(2, "latest")
    agent.finish_pending_checkpoint()
    assert os.path.exists(str(good / "latest.pt"))


def test_async_checkpoint_failure_surfaces_on_next_save(tmp_path):
    agent = _tiny_async_agent(tmp_path)
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    agent.args.ckpt_dir = str(blocker / "weights")
    agent.save_checkpoint(1, "latest")
    with pytest.raises(RuntimeError, match="checkpoint was NOT saved"):
        agent.save_checkpoint(2, "latest")  # joins + re-raises first


def test_corrupt_native_checkpoint_reports_corruption(tmp_path):
    path = str(tmp_path / "ckpt.pt")
    good = {"model_state_dict": {"w": np.zeros((2, 2), np.float32)}}
    blob = pickle.dumps(good, protocol=4)
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])  # truncate => corrupt
    with pytest.raises(RuntimeError, match="truncated or corrupt"):
        C.load_checkpoint(path)


def test_pickle_without_model_state_dict_reports_clearly(tmp_path):
    path = str(tmp_path / "weird.pt")
    with open(path, "wb") as f:
        pickle.dump([1, 2, 3], f, protocol=4)
    with pytest.raises(RuntimeError, match="truncated or corrupt"):
        C.load_checkpoint(path)


def test_native_checkpoint_roundtrip_still_works(tmp_path):
    path = str(tmp_path / "ok.pt")
    C.save_checkpoint(path, {"w": np.arange(4, dtype=np.float32)})
    out = C.load_checkpoint(path)
    np.testing.assert_array_equal(out["model_state_dict"]["w"],
                                  np.arange(4, dtype=np.float32))


def test_legacy_torch_pickle_still_ingested(tmp_path, monkeypatch):
    """A legacy (non-zip) torch pickle has pickle magic too; it must route
    to torch ingestion, not be reported as a corrupt native checkpoint."""
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "legacy.pt")
    sd = {"dummy.weight": torch.zeros(2, 2)}
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    with open(path, "rb") as f:
        assert f.read(1) == b"\x80"  # really exercises the legacy branch
    from lrce_tpu.utils import torch_io as tio
    monkeypatch.setattr(tio, "convert_e2e", lambda d: dict(d))
    out = C.load_checkpoint(path)
    assert "dummy.weight" in out["model_state_dict"]
