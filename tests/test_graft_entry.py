"""Driver-entry coverage: dryrun_multichip executes a real dp x tp training
step on the virtual 8-device CPU mesh (the driver's multi-chip gate)."""

import importlib.util
import os

import pytest


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dryrun_multichip_8():
    _load_graft().dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    _load_graft().dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_without_conftest_env():
    """Driver-environment regression test (round-1 MULTICHIP failure).

    The driver imports __graft_entry__ on a 1-device box WITHOUT the pytest
    conftest's 8-device virtual CPU env. dryrun_multichip must self-provision
    (re-exec with JAX_PLATFORMS=cpu + xla_force_host_platform_device_count)
    rather than crash reshaping 1 device into a (4, 2) mesh.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("LRCE_TPU_DRYRUN_CHILD", None)
    # Simulate the driver box: a platform with ONE device and no
    # force_host_platform_device_count flag.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(4); "
            "print('SELF_PROVISION_OK')")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "SELF_PROVISION_OK" in proc.stdout
